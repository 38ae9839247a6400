"""Deterministic splitting / shuffling (`operators/splits.py`).

The contracts that matter for a training pipeline: re-runs and corpus
appends never move a document between splits; shuffle positions are an
exact permutation matching the declared total order even though they
are computed without a single-task global window.
"""

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.operators import splits


def _docs(spark, n=200):
    return spark.createDataFrame([Row(doc_id=i, payload=f"p{i}") for i in range(n)])


class TestAssignSplit:
    def test_percentages_and_determinism(self, spark):
        df = _docs(spark)
        a = {r.doc_id: r.split for r in splits.assign_split(df, "doc_id").collect()}
        b = {r.doc_id: r.split for r in splits.assign_split(df, "doc_id").collect()}
        assert a == b  # rerun-stable
        counts = {s: sum(1 for v in a.values() if v == s) for s in set(a.values())}
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"] + counts["test"]  # ~80/10/10

    def test_append_stability(self, spark):
        """Adding documents never reassigns an existing one."""
        small = {
            r.doc_id: r.split
            for r in splits.assign_split(_docs(spark, 100), "doc_id").collect()
        }
        big = {
            r.doc_id: r.split
            for r in splits.assign_split(_docs(spark, 200), "doc_id").collect()
        }
        assert all(big[k] == v for k, v in small.items())

    def test_seed_changes_assignment(self, spark):
        df = _docs(spark)
        a = {r.doc_id: r.split for r in splits.assign_split(df, "doc_id").collect()}
        b = {
            r.doc_id: r.split
            for r in splits.assign_split(df, "doc_id", seed="v2").collect()
        }
        assert a != b

    def test_custom_splits_and_validation(self, spark):
        df = _docs(spark, 50)
        out = splits.assign_split(df, "doc_id", splits=(("a", 50), ("b", 50)))
        assert {r.split for r in out.collect()} <= {"a", "b"}
        with pytest.raises(ValueError, match="sum to 100"):
            splits.assign_split(df, "doc_id", splits=(("a", 60), ("b", 50)))


class TestDeterministicShuffle:
    def test_exact_permutation_matches_global_window(self, spark):
        """Bucket-decomposed positions == the naive single-window rank."""
        df = _docs(spark, 300)
        got = {
            r.doc_id: r.shuffle_pos
            for r in splits.deterministic_shuffle(df, "doc_id").collect()
        }
        ref_rank = F.row_number().over(
            Window.orderBy(splits._fingerprint("doc_id", "shuffle-v1"), "doc_id")
        )
        ref = {
            r.doc_id: r.pos
            for r in df.select("doc_id", ref_rank.alias("pos")).collect()
        }
        assert got == ref
        assert sorted(got.values()) == list(range(1, 301))

    def test_bucket_count_invariance(self, spark):
        """Positions are independent of how many buckets decompose them."""
        df = _docs(spark, 120)
        one = {
            r.doc_id: r.shuffle_pos
            for r in splits.deterministic_shuffle(df, "doc_id", num_buckets=1).collect()
        }
        many = {
            r.doc_id: r.shuffle_pos
            for r in splits.deterministic_shuffle(
                df, "doc_id", num_buckets=64
            ).collect()
        }
        assert one == many

    def test_preserves_columns(self, spark):
        out = splits.deterministic_shuffle(_docs(spark, 10), "doc_id")
        assert set(out.columns) == {"doc_id", "payload", "shuffle_pos"}


class TestWeightedMixtureSample:
    def test_rates_zero_one_and_determinism(self, spark):
        from social_media_data_pipeline_spark.operators import sampling

        df = _docs(spark, 400).withColumn(
            "src", (F.col("doc_id") % 4).cast("string")
        )
        out = sampling.weighted_mixture_sample(
            df, "src", {"0": 0.0, "1": 1.0, "2": 0.5}, "doc_id", default_rate=0.25
        )
        rows = out.collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r.src, []).append(r.doc_id)
        assert "0" not in by_src  # rate 0 drops everything
        assert len(by_src["1"]) == 100  # rate 1 keeps everything
        assert 20 <= len(by_src["2"]) <= 80  # ~50 of 100
        assert 5 <= len(by_src["3"]) <= 50  # default ~25 of 100
        again = sorted(r.doc_id for r in out.collect())
        assert again == sorted(r.doc_id for r in rows)

    def test_append_stability(self, spark):
        """Growing the corpus never flips an existing row's keep draw."""
        from social_media_data_pipeline_spark.operators import sampling

        def kept(n):
            df = _docs(spark, n).withColumn("src", F.lit("s"))
            out = sampling.weighted_mixture_sample(
                df, "src", {"s": 0.5}, "doc_id"
            )
            return {r.doc_id for r in out.collect()}

        small, big = kept(100), kept(300)
        assert small == {d for d in big if d < 100}

    def test_rate_validation(self, spark):
        from social_media_data_pipeline_spark.operators import sampling

        df = _docs(spark, 10).withColumn("src", F.lit("s"))
        with pytest.raises(ValueError, match="rate"):
            sampling.weighted_mixture_sample(df, "src", {"s": 1.5}, "doc_id")
        with pytest.raises(ValueError, match="default_rate"):
            sampling.weighted_mixture_sample(
                df, "src", {"s": 0.5}, "doc_id", default_rate=-0.1
            )


class TestTemperatureMixture:
    """r7: α=0.5 temperature source balancing."""

    def _df(self, spark):
        rows = []
        for i in range(900):
            rows.append((i, "big"))
        for i in range(900, 1000):
            rows.append((i, "small"))
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_flattens_toward_small_sources(self, spark):
        from social_media_data_pipeline_spark.operators import sampling

        df = self._df(spark)
        out = sampling.temperature_mixture_sample(df, "source", "doc_id",
                                                  target_frac=0.5)
        kept = out.groupBy("source").count().collect()
        by = {r["source"]: r["count"] for r in kept}
        # α=0.5: kept_i ∝ √n_i → big:small kept ratio ≈ 3:1, far below
        # the 9:1 raw ratio; small source keep RATE must exceed big's
        assert by["small"] / 100 > by["big"] / 900
        total = sum(by.values())
        assert 0.35 < total / 1000 < 0.65  # ≈ target_frac

    def test_deterministic_and_append_stable(self, spark):
        from social_media_data_pipeline_spark.operators import sampling

        df = self._df(spark)
        a = {r["doc_id"] for r in
             sampling.temperature_mixture_sample(df, "source", "doc_id").collect()}
        b = {r["doc_id"] for r in
             sampling.temperature_mixture_sample(df, "source", "doc_id").collect()}
        assert a == b

    def test_target_one_keeps_all_uniform(self, spark):
        from social_media_data_pipeline_spark.operators import sampling

        # uniform histogram + target 1.0 → threshold 1e6 → keep all
        df = spark.createDataFrame(
            [(i, f"s{i % 4}") for i in range(400)], "doc_id long, source string"
        )
        out = sampling.temperature_mixture_sample(df, "source", "doc_id",
                                                  target_frac=1.0)
        assert out.count() == 400

    def test_bad_target_raises(self, spark):
        import pytest

        from social_media_data_pipeline_spark.operators import sampling

        df = self._df(spark)
        with pytest.raises(ValueError, match="target_frac"):
            sampling.temperature_mixture_sample(df, "source", "doc_id",
                                                target_frac=0.0)


class TestTemperatureMixtureManySources:
    def test_broadcast_path_matches_case_path_semantics(self, spark):
        """>64 sources takes the broadcast-join path; per-source keep
        decisions must be identical to the literal-CASE formula."""
        import hashlib
        import math

        from social_media_data_pipeline_spark.operators import sampling

        rows = [(i, f"s{i % 100}") for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = {r["doc_id"] for r in
               sampling.temperature_mixture_sample(df, "source", "doc_id",
                                                   target_frac=0.5).collect()}
        # python replay of the documented integer formula
        hist = {}
        for _, s in rows:
            hist[s] = hist.get(s, 0) + 1
        sv = {g: math.floor(math.sqrt(n) * 1e6 + 0.5) for g, n in hist.items()}
        big_n, big_s = sum(hist.values()), sum(sv.values())
        th = {g: min(10**6, (500_000 * big_n * sv[g]) // (big_s * n))
              for g, n in hist.items()}
        want = set()
        for i, s in rows:
            draw = int(hashlib.md5(f"temp-mix-v1:{i}".encode()).hexdigest()[:8], 16) % 10**6
            if draw < th[s]:
                want.add(i)
        assert out == want


class TestMixtureSolver:
    def test_waterfilling_caps_and_redistributes(self):
        from social_media_data_pipeline_spark.operators.sampling import (
            solve_mixture_rates,
        )

        counts = {"a": 10, "b": 1000, "c": 1000}
        targets = {"a": 500_000, "b": 250_000, "c": 250_000}
        rates = solve_mixture_rates(counts, targets, budget_rows=400)
        # a wants 200 rows but has 10 → capped at 1e6; the remaining
        # 390-row budget splits evenly between b and c (195 each)
        assert rates["a"] == 1_000_000
        assert rates["b"] == rates["c"] == (195 * 1_000_000) // 1000

    def test_no_caps_proportional(self):
        from social_media_data_pipeline_spark.operators.sampling import (
            solve_mixture_rates,
        )

        counts = {"a": 1000, "b": 1000}
        rates = solve_mixture_rates(
            counts, {"a": 750_000, "b": 250_000}, budget_rows=400
        )
        assert rates["a"] == (300 * 1_000_000) // 1000
        assert rates["b"] == (100 * 1_000_000) // 1000

    def test_zero_budget_and_missing_target(self):
        from social_media_data_pipeline_spark.operators.sampling import (
            solve_mixture_rates,
        )

        rates = solve_mixture_rates({"a": 10, "b": 5}, {"a": 1_000_000}, 0)
        assert rates == {"a": 0, "b": 0}

    def test_operator_hits_budget_roughly(self, spark):
        from social_media_data_pipeline_spark.operators import sampling

        rows = [(i, f"s{i % 4}") for i in range(2000)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = sampling.mixture_sample_to_targets(
            df, "source", "doc_id",
            {"s0": 0.4, "s1": 0.3, "s2": 0.2, "s3": 0.1}, 800,
        )
        kept = out.groupBy("source").count().collect()
        by = {r["source"]: r["count"] for r in kept}
        total = sum(by.values())
        assert 650 < total < 950           # ≈ budget
        assert by["s0"] > by["s1"] > by["s2"] > by["s3"]  # target ordering

    def test_token_budget_unit(self, spark):
        from social_media_data_pipeline_spark.operators import sampling

        # s0 rows carry 10x the tokens: under a TOKEN budget with equal
        # targets, s0's keep RATE must be ~10x lower than s1's
        rows = [(i, "s0", 100) for i in range(500)] + [
            (i + 500, "s1", 10) for i in range(500)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
        out = sampling.mixture_sample_to_targets(
            df, "source", "doc_id", {"s0": 0.5, "s1": 0.5}, 20_000,
            weight_col="n_tok",
        )
        kept = {r["source"]: r["cnt"] for r in
                out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
        # s1 caps (5k tokens < its 10k share) and its unmet share flows
        # to s0: s0's budget becomes 15k tokens → ~150 rows at 100 tok/row
        assert kept.get("s1", 0) == 500
        assert 110 < kept.get("s0", 0) < 190


class TestGroupSplit:
    """Leakage-free constructor (`splits.group_split`): cliques land
    whole in one split; singletons are their own representative; the
    straddling pairs `split_leakage` audits for cannot exist."""

    def _pairs(self, spark, edges):
        return spark.createDataFrame(
            [Row(id_a=a, id_b=b) for a, b in edges]
        )

    def test_clique_lands_in_one_split(self, spark):
        df = _docs(spark, n=100)
        # three cliques spanning ids whose per-doc hash splits differ
        edges = [(0, 1), (1, 2), (10, 11), (50, 51), (51, 52), (52, 53)]
        out = splits.group_split(df, "doc_id", self._pairs(spark, edges))
        by_id = {r.doc_id: (r.rep, r.split) for r in out.collect()}
        assert len(by_id) == 100  # every doc assigned exactly once
        for clique in ([0, 1, 2], [10, 11], [50, 51, 52, 53]):
            reps = {by_id[i][0] for i in clique}
            sides = {by_id[i][1] for i in clique}
            assert reps == {min(clique)}
            assert len(sides) == 1

    def test_singletons_are_own_rep_and_match_assign_split(self, spark):
        df = _docs(spark, n=60)
        out = splits.group_split(
            df, "doc_id", self._pairs(spark, [(1, 2)])
        ).collect()
        plain = {
            r.doc_id: r.split
            for r in splits.assign_split(df, "doc_id").collect()
        }
        for r in out:
            if r.doc_id not in (1, 2):
                assert r.rep == r.doc_id
                assert r.split == plain[r.doc_id]  # singleton == hash split

    def test_zero_leakage_by_construction(self, spark):
        """Every candidate pair's two members share a split — the
        property `split_leakage` would flag violations of."""
        df = _docs(spark, n=200)
        edges = [(i, i + 100) for i in range(0, 60)]  # 60 two-cliques
        pairs = self._pairs(spark, edges)
        out = splits.group_split(df, "doc_id", pairs)
        sa = out.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
        sb = out.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
        straddling = (
            pairs.join(sa, "id_a").join(sb, "id_b")
            .filter(F.col("sa") != F.col("sb"))
            .count()
        )
        assert straddling == 0
        # and the plain per-doc split DOES straddle some of these pairs
        # (otherwise the test proves nothing)
        plain = splits.assign_split(df, "doc_id")
        pa = plain.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
        pb = plain.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
        assert (
            pairs.join(pa, "id_a").join(pb, "id_b")
            .filter(F.col("sa") != F.col("sb"))
            .count()
            > 0
        )

    def test_append_stability_unless_cliques_merge(self, spark):
        df1 = _docs(spark, n=80)
        df2 = _docs(spark, n=120)  # superset corpus
        edges = [(3, 4), (40, 41)]
        p1 = self._pairs(spark, edges)
        a = {r.doc_id: r.split for r in splits.group_split(df1, "doc_id", p1).collect()}
        b = {r.doc_id: r.split for r in splits.group_split(df2, "doc_id", p1).collect()}
        assert all(b[i] == a[i] for i in a)  # grown corpus moves nobody
        # a NEW pair merging two cliques re-keys by the smaller rep —
        # the merged clique shares one split
        p2 = self._pairs(spark, edges + [(4, 40)])
        c = {r.doc_id: (r.rep, r.split) for r in splits.group_split(df2, "doc_id", p2).collect()}
        assert {c[i][0] for i in (3, 4, 40, 41)} == {3}
        assert len({c[i][1] for i in (3, 4, 40, 41)}) == 1


class TestTemperatureMixtureWeights:
    """Caller-supplied integer masses (fertility-corrected mixing):
    the α=0.5 thresholds follow the weights, not the doc counts."""

    def _df(self, spark):
        rows = [(i, "hi" if i < 180 else "lo") for i in range(200)]
        return spark.createDataFrame(rows, "doc_id bigint, lang string")

    def test_weights_shift_rates_vs_doc_counts(self, spark):
        from social_media_data_pipeline_spark.operators.sampling import (
            temperature_mixture_sample,
        )

        df = self._df(spark)
        by_docs = temperature_mixture_sample(df, "lang", "doc_id", 0.5)
        # token masses INVERTED vs doc counts: 'lo' docs are 45x longer
        by_mass = temperature_mixture_sample(
            df, "lang", "doc_id", 0.5, weights={"hi": 180, "lo": 8100}
        )
        d = {r["lang"]: 0 for r in by_docs.collect()}
        for r in by_docs.collect():
            d[r["lang"]] += 1
        m = {"hi": 0, "lo": 0}
        for r in by_mass.collect():
            m[r["lang"]] += 1
        # doc-count mixing keeps all of tiny 'lo'; mass mixing throttles
        # it (its token mass dominates) and keeps more of 'hi'
        assert d["lo"] == 20 and m["lo"] < 20
        assert m["hi"] > d["hi"]

    def test_same_weights_equal_counts_path(self, spark):
        from social_media_data_pipeline_spark.operators.sampling import (
            temperature_mixture_sample,
        )

        df = self._df(spark)
        a = sorted(
            r["doc_id"]
            for r in temperature_mixture_sample(df, "lang", "doc_id", 0.5).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in temperature_mixture_sample(
                df, "lang", "doc_id", 0.5, weights={"hi": 180, "lo": 20}
            ).collect()
        )
        assert a == b  # weights == counts → identical draw

    def test_bad_weights_refused(self, spark):
        from social_media_data_pipeline_spark.operators.sampling import (
            temperature_mixture_sample,
        )

        df = self._df(spark)
        with pytest.raises(ValueError, match="positive integers"):
            temperature_mixture_sample(
                df, "lang", "doc_id", 0.5, weights={"hi": 0, "lo": 20}
            )
        with pytest.raises(ValueError, match="positive integers"):
            temperature_mixture_sample(
                df, "lang", "doc_id", 0.5, weights={"hi": 1.5, "lo": 20}
            )
