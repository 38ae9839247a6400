"""Connected-components / cluster-dedup tests."""

from __future__ import annotations

import pytest

from social_media_data_pipeline_spark.functions import graph


class TestConnectedComponents:
    def test_two_components_and_chain(self, spark):
        # chain 1-2-3 and pair 10-11; singleton 99 appears via docs only
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src long, dst long"
        )
        cc = {r.node: r.component for r in graph.connected_components(edges).collect()}
        assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_dedup_clusters_with_singletons(self, spark):
        docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "doc_id long")
        pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
        out = {r.doc_id: r for r in graph.dedup_clusters(docs, pairs).collect()}
        assert out[99].component == 99 and out[99].is_canonical
        assert out[3].component == 1 and not out[3].is_canonical
        canonical = {k for k, v in out.items() if v.is_canonical}
        assert canonical == {1, 10, 99}

    def test_long_chain_converges(self, spark):
        n = 30
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "src long, dst long"
        )
        cc = graph.connected_components(edges, max_iterations=50)
        comps = {r.component for r in cc.collect()}
        assert comps == {0}


def _pagerank_reference(edges, iters=5):
    """Straight-line integer replay of the documented update rule."""
    from collections import defaultdict

    edges = sorted(set(edges))
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    nodes = sorted({n for e in edges for n in e})
    ranks = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        recv = defaultdict(int)
        for s, d in edges:
            recv[d] += (ranks[s] * 85) // (100 * deg[s])
        ranks = {n: 150_000 + recv[n] for n in nodes}
    return ranks


class TestPagerank:
    EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 6)]

    def test_matches_integer_reference(self, spark):
        from social_media_data_pipeline_spark.functions.graph import pagerank

        df = spark.createDataFrame(self.EDGES, "src bigint, dst bigint")
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank(df, iters=5, checkpoint=False).collect()
        }
        assert got == _pagerank_reference(self.EDGES, iters=5)

    def test_checkpointed_path_identical(self, spark):
        from social_media_data_pipeline_spark.functions.graph import pagerank

        df = spark.createDataFrame(self.EDGES, "src bigint, dst bigint")
        a = sorted(pagerank(df, iters=3, checkpoint=True).collect())
        b = sorted(pagerank(df, iters=3, checkpoint=False).collect())
        assert a == b

    def test_sink_accumulates_source_only_decays(self, spark):
        """Chain 1→2→3: the sink (3) must outrank the source (1), and a
        pure source settles at the teleport floor after round 1."""
        from social_media_data_pipeline_spark.functions.graph import pagerank

        df = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
        got = {
            r["node"]: r["rank_micro"]
            for r in pagerank(df, iters=5, checkpoint=False).collect()
        }
        assert got[3] > got[2] > got[1]
        assert got[1] == 150_000

    def test_duplicate_edges_collapse(self, spark):
        from social_media_data_pipeline_spark.functions.graph import pagerank

        base = spark.createDataFrame(self.EDGES, "src bigint, dst bigint")
        doubled = base.unionByName(base)
        assert sorted(pagerank(doubled, iters=2, checkpoint=False).collect()) == sorted(
            pagerank(base, iters=2, checkpoint=False).collect()
        )

    def test_oracle_sql_replays_run(self, spark):
        import duckdb

        from social_media_data_pipeline_spark.functions.graph import (
            build_pagerank_sql,
            pagerank,
        )

        df = spark.createDataFrame(self.EDGES, "src bigint, dst bigint")
        got = sorted(
            (r["node"], r["rank_micro"])
            for r in pagerank(df, iters=4, checkpoint=False).collect()
        )
        con = duckdb.connect()
        vals = ", ".join(f"({s}, {d})" for s, d in self.EDGES)
        sql = build_pagerank_sql(
            f"SELECT * FROM (VALUES {vals}) t(src, dst)", iters=4
        ) + "\nSELECT node, rank_micro FROM r4 ORDER BY node"
        assert got == [tuple(r) for r in con.execute(sql).fetchall()]


class TestPagerankDangling:
    """r7: dangling="redistribute" — textbook PageRank mass handling.
    Per-round the summed sink rank returns uniformly as the exact
    integer share (dm * 85) div (100 * n); mass conservation holds up
    to truncation loss bounded by (|E| + 2n)/0.15 micro-units."""

    def _random_sink_graph(self, seed, n_src=60, n_dst=80, m=300):
        import random

        rng = random.Random(seed)
        return list(
            {(rng.randint(0, n_src), rng.randint(0, n_dst)) for _ in range(m)}
        )

    def test_mass_conserved_on_random_sink_graphs(self, spark):
        from social_media_data_pipeline_spark.functions.graph import pagerank

        for seed in (1, 7, 23):
            edges = self._random_sink_graph(seed)
            df = spark.createDataFrame(edges, "src bigint, dst bigint")
            rows = pagerank(df, iters=5, dangling="redistribute").collect()
            n = len(rows)
            total = sum(r["rank_micro"] for r in rows)
            bound = (len(edges) + 2 * n) / 0.15
            assert abs(n * 1_000_000 - total) <= bound

    def test_drop_mode_loses_sink_mass(self, spark):
        from social_media_data_pipeline_spark.functions.graph import pagerank

        edges = self._random_sink_graph(3)
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        rows = pagerank(df, iters=5, dangling="drop").collect()
        n = len(rows)
        total = sum(r["rank_micro"] for r in rows)
        # this bipartite-ish graph has many sinks: drop undershoots by
        # far more than the redistribute truncation bound
        assert n * 1_000_000 - total > (len(edges) + 2 * n) / 0.15 * 100

    def test_redistribute_oracle_replays_run(self, spark):
        import duckdb

        from social_media_data_pipeline_spark.functions.graph import (
            build_pagerank_sql,
            pagerank,
        )

        edges = self._random_sink_graph(11, n_src=20, n_dst=30, m=80)
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = sorted(
            (r["node"], r["rank_micro"])
            for r in pagerank(df, iters=4, dangling="redistribute").collect()
        )
        vals = ", ".join(f"({s}, {d})" for s, d in edges)
        sql = build_pagerank_sql(
            f"SELECT * FROM (VALUES {vals}) t(src, dst)",
            iters=4,
            dangling="redistribute",
        ) + "\nSELECT node, rank_micro FROM r4 ORDER BY node"
        want = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
        assert got == want

    def test_observe_path_matches_agg_path(self, spark):
        from social_media_data_pipeline_spark.functions.graph import pagerank

        edges = self._random_sink_graph(5, n_src=15, n_dst=25, m=60)
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        a = sorted(
            (r["node"], r["rank_micro"])
            for r in pagerank(df, iters=3, dangling="redistribute").collect()
        )
        b = sorted(
            (r["node"], r["rank_micro"])
            for r in pagerank(
                df, iters=3, dangling="redistribute", checkpoint=False
            ).collect()
        )
        assert a == b

    def test_bad_mode_raises(self, spark):
        from social_media_data_pipeline_spark.functions.graph import pagerank

        df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
        with pytest.raises(ValueError, match="dangling"):
            pagerank(df, dangling="nope")


class TestTriangleCounts:
    def _counts(self, spark, pairs):
        df = spark.createDataFrame(pairs, "src long, dst long")
        out = graph.triangle_counts(df, checkpoint=False).collect()
        return {r["node"]: r["tri_cnt"] for r in out}

    def _brute(self, pairs):
        import itertools

        und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        nodes = sorted({n for e in und for n in e})
        counts: dict[int, int] = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if {(a, b), (a, c), (b, c)} <= und:
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
        return counts

    def test_k4_every_node_in_three(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert self._counts(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_square_has_no_triangles(self, spark):
        assert self._counts(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == {}

    def test_duplicates_reversals_self_loops_collapse(self, spark):
        tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 2), (3, 5)]
        assert self._counts(spark, tri) == {1: 1, 2: 1, 3: 1}

    def test_matches_bruteforce_on_random_graph(self, spark):
        import random

        rng = random.Random(7)
        pairs = [(rng.randrange(12), rng.randrange(12)) for _ in range(60)]
        assert self._counts(spark, pairs) == self._brute(pairs)

    def test_checkpointed_path_identical(self, spark):
        import random

        rng = random.Random(11)
        pairs = [(rng.randrange(10), rng.randrange(10)) for _ in range(40)]
        df = spark.createDataFrame(pairs, "src long, dst long")
        lazy = {
            (r["node"], r["tri_cnt"])
            for r in graph.triangle_counts(df, checkpoint=False).collect()
        }
        pinned = {
            (r["node"], r["tri_cnt"])
            for r in graph.triangle_counts(df, checkpoint=True).collect()
        }
        assert lazy == pinned


class TestKcore:
    def _core(self, spark, pairs, k, rounds=10):
        df = spark.createDataFrame(pairs, "src long, dst long")
        out = graph.kcore(df, k=k, rounds=rounds).collect()
        return {r["node"]: r["deg"] for r in out}

    def _brute(self, pairs, k):
        und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        while True:
            deg: dict[int, int] = {}
            for a, b in und:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                return deg
            und = {(a, b) for a, b in und if a not in drop and b not in drop}

    def test_triangle_with_tail_peels_tail(self, spark):
        # triangle 1-2-3 plus pendant 3-4: 2-core is the triangle
        pairs = [(1, 2), (2, 3), (3, 1), (3, 4)]
        assert self._core(spark, pairs, k=2) == {1: 2, 2: 2, 3: 2}

    def test_chain_peels_to_empty(self, spark):
        assert self._core(spark, [(1, 2), (2, 3), (3, 4)], k=2) == {}

    def test_cascading_peel_needs_multiple_rounds(self, spark):
        # path hung off a square: each round removes one more pendant
        pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (6, 7)]
        assert self._core(spark, pairs, k=2) == {1: 2, 2: 2, 3: 2, 4: 2}

    def test_matches_bruteforce_on_random_graph(self, spark):
        import random

        rng = random.Random(13)
        for trial in range(3):
            pairs = [(rng.randrange(14), rng.randrange(14)) for _ in range(50)]
            for k in (2, 3):
                assert self._core(spark, pairs, k=k) == self._brute(pairs, k)

    def test_extra_rounds_are_identity(self, spark):
        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
        assert self._core(spark, pairs, k=2, rounds=3) == self._core(
            spark, pairs, k=2, rounds=12
        )

    def test_sql_replay_matches(self, spark):
        import duckdb
        import random

        rng = random.Random(19)
        pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(60)]
        got = self._core(spark, pairs, k=2, rounds=8)
        vals = ", ".join(f"({a}, {b})" for a, b in pairs)
        sql = graph.build_kcore_sql(
            f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", k=2, rounds=8
        ) + (
            "SELECT node, COUNT(*)::BIGINT AS deg FROM ("
            "SELECT a AS node FROM e8 UNION ALL SELECT b FROM e8"
            ") GROUP BY node ORDER BY node"
        )
        oracle = {n: d for n, d in duckdb.connect().execute(sql).fetchall()}
        assert got == oracle

    def test_bad_args_raise(self, spark):
        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="k must"):
            graph.kcore(df, k=0)
        with pytest.raises(ValueError, match="rounds"):
            graph.kcore(df, k=2, rounds=0)


def _lpa_reference(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Pure-Python synchronous LPA with the same tie-break (most
    frequent neighbor label, ties to the smallest label)."""
    from collections import Counter, defaultdict

    nbrs = defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n in nbrs:
            cnt = Counter(labels[m] for m in nbrs[n])
            cnt[labels[n]] += 1  # self-vote (matches the operator)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        if new == labels:
            break
        labels = new
    return labels


class TestLabelPropagation:
    EDGES = [
        (1, 2), (2, 3), (1, 3),          # triangle A
        (5, 6), (6, 7), (5, 7),          # triangle B
        (3, 5),                          # bridge
        (10, 11),                        # isolated pair
    ]

    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df, rounds=4).collect()
        }
        assert got == _lpa_reference(self.EDGES, 4)

    def test_two_cliques_two_communities(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df, rounds=4).collect()
        }
        assert got[1] == got[2] == got[3]
        assert got[5] == got[6] == got[7]
        assert got[1] != got[5]
        assert got[10] == got[11]

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        doubled = self.EDGES + [(b, a) for a, b in self.EDGES] + [(2, 1)]
        df = spark.createDataFrame(doubled, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df, rounds=4).collect()
        }
        assert got == _lpa_reference(self.EDGES, 4)

    def test_sql_twin_replays_identically(self, spark):
        import duckdb

        values = ", ".join(f"({a}, {b})" for a, b in self.EDGES)
        sql = graph.build_lpa_sql(
            f"SELECT * FROM (VALUES {values}) AS t(src, dst)", rounds=4
        ) + "SELECT node, label FROM l4 ORDER BY node"
        oracle = dict(duckdb.connect().execute(sql).fetchall())
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df, rounds=4).collect()
        }
        assert got == {int(k): int(v) for k, v in oracle.items()}

    def test_partitioning_invariance(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        one = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df.repartition(7), rounds=3).collect()
        }
        two = {
            r["node"]: r["label"]
            for r in graph.label_propagation(df.coalesce(1), rounds=3).collect()
        }
        assert one == two

    def test_rejects_bad_rounds(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        with pytest.raises(ValueError, match="rounds"):
            graph.label_propagation(df, rounds=0)


class TestProjectBipartite:
    def test_projection_support_threshold(self, spark):
        # groups: g1={1,2,3}, g2={1,2}, g3={2,4} → support(1,2)=2,
        # (1,3)=(2,3)=1, (2,4)=1
        rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 2), (3, 4)]
        df = spark.createDataFrame(rows, "g long, item long")
        e1 = sorted(
            map(tuple, graph.project_bipartite(df, "g", "item", 1).collect())
        )
        assert e1 == [(1, 2), (1, 3), (2, 3), (2, 4)]
        e2 = sorted(
            map(tuple, graph.project_bipartite(df, "g", "item", 2).collect())
        )
        assert e2 == [(1, 2)]

    def test_rejects_bad_support(self, spark):
        df = spark.createDataFrame([(1, 1)], "g long, item long")
        with pytest.raises(ValueError, match="min_support"):
            graph.project_bipartite(df, "g", "item", 0)


class TestWeightedPagerank:
    EDGES = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 1), (4, 1, 5)]

    def test_unit_weights_equal_unweighted(self, spark):
        unw = spark.createDataFrame(
            [(a, b) for a, b, _ in self.EDGES], "src long, dst long"
        )
        w1 = spark.createDataFrame(
            [(a, b, 1) for a, b, _ in self.EDGES], "src long, dst long, w long"
        )
        got_u = {r["node"]: r["rank_micro"] for r in graph.pagerank(unw, iters=3).collect()}
        got_w = {
            r["node"]: r["rank_micro"]
            for r in graph.pagerank(w1, iters=3, weight_col="w").collect()
        }
        assert got_u == got_w

    def test_integer_reference(self, spark):
        # pure-python integer replay of the weighted update
        edges = self.EDGES
        wsum = {}
        for s, _, w in edges:
            wsum[s] = wsum.get(s, 0) + w
        nodes = sorted({n for e in edges for n in e[:2]})
        ranks = {n: 1_000_000 for n in nodes}
        for _ in range(3):
            new = {n: 150_000 for n in nodes}
            for s, d, w in edges:
                new[d] += (ranks[s] * 85 * w) // (100 * wsum[s])
            ranks = new
        df = spark.createDataFrame(self.EDGES, "src long, dst long, w long")
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.pagerank(df, iters=3, weight_col="w").collect()
        }
        assert got == ranks

    def test_duplicate_weighted_edges_sum(self, spark):
        # (1,2,3) should equal (1,2,1)+(1,2,2)
        a = spark.createDataFrame(self.EDGES, "src long, dst long, w long")
        dup = spark.createDataFrame(
            [(1, 2, 1), (1, 2, 2)] + [e for e in self.EDGES if e != (1, 2, 3)],
            "src long, dst long, w long",
        )
        ga = {r["node"]: r["rank_micro"] for r in graph.pagerank(a, iters=3, weight_col="w").collect()}
        gd = {r["node"]: r["rank_micro"] for r in graph.pagerank(dup, iters=3, weight_col="w").collect()}
        assert ga == gd

    def test_sql_twin_weighted(self, spark):
        import duckdb

        values = ", ".join(f"({a}, {b}, {w})" for a, b, w in self.EDGES)
        sql = graph.build_pagerank_sql(
            f"SELECT * FROM (VALUES {values}) AS t(src, dst, w)",
            iters=3,
            weighted=True,
        ) + "SELECT node, rank_micro FROM r3 ORDER BY node"
        oracle = dict(duckdb.connect().execute(sql).fetchall())
        df = spark.createDataFrame(self.EDGES, "src long, dst long, w long")
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.pagerank(df, iters=3, weight_col="w").collect()
        }
        assert got == {int(k): int(v) for k, v in oracle.items()}


class TestGraphInputValidation:
    """r9 (verdict #8 + ADVICE): the conventions the docstrings only
    documented are now enforced loudly, before any Spark job."""

    def test_lpa_rejects_string_node_ids(self, spark):
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        with pytest.raises(ValueError, match="numeric ids"):
            graph.label_propagation(df, rounds=2)

    def test_lpa_accepts_all_numeric_widths(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
        assert graph.label_propagation(df, rounds=2).count() == 3

    def test_weighted_pagerank_rejects_zero_sum_weights(self, spark):
        # the (1,2) weights sum to 0: Spark div would yield NULL
        # (contribution dropped) while the DuckDB oracle raises —
        # refuse up front instead of diverging
        df = spark.createDataFrame(
            [(1, 2, 2), (1, 2, -2), (2, 3, 1)], "src long, dst long, w long"
        )
        with pytest.raises(ValueError, match="must be\n?.*positive"):
            graph.pagerank(df, iters=2, weight_col="w")

    def test_weighted_pagerank_rejects_null_weight(self, spark):
        df = spark.createDataFrame(
            [(1, 2, None), (2, 3, 1)], "src long, dst long, w long"
        )
        with pytest.raises(ValueError, match="positive integers"):
            graph.pagerank(df, iters=2, weight_col="w")

    def test_triangles_and_kcore_accept_string_ids(self, spark):
        # order/join-only algorithms keep working on any orderable id
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
        )
        tri = {r["node"]: r["tri_cnt"] for r in graph.triangle_counts(df).collect()}
        assert tri == {"a": 1, "b": 1, "c": 1}
        assert graph.kcore(df, k=2).count() == 3


def _ppr_reference(edges, seeds, iters, weights=None):
    """Straight-line integer replay of the documented PPR update."""
    from collections import defaultdict

    if weights is None:
        edges = sorted(set(edges))
        weights = [1] * len(edges)
    else:
        agg = defaultdict(int)
        for (s, d), w in zip(edges, weights):
            agg[(s, d)] += w
        edges = sorted(agg)
        weights = [agg[e] for e in edges]
    wsum = defaultdict(int)
    for (s, _), w in zip(edges, weights):
        wsum[s] += w
    ranks = {n: 1_000_000 for n in seeds}
    for _ in range(iters):
        new = defaultdict(int)
        for n in seeds:
            new[n] += 150_000
        for (s, d), w in zip(edges, weights):
            if s in ranks:
                new[d] += (ranks[s] * 85 * w) // (100 * wsum[s])
        ranks = dict(new)
    return {n: r for n, r in ranks.items() if r > 0}


class TestPersonalizedPagerank:
    EDGES = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (5, 6), (6, 5)]

    def test_matches_integer_reference(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.personalized_pagerank(df, [1], iters=4).collect()
        }
        assert got == _ppr_reference(self.EDGES, [1], 4)

    def test_seed_locality(self, spark):
        # the 5-6 component is unreachable from seed 1: absent from output
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        nodes = {
            r["node"]
            for r in graph.personalized_pagerank(df, [1], iters=4).collect()
        }
        assert nodes == {1, 2, 3, 4}

    def test_seed_dataframe_and_multi_seed(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        seeds = spark.createDataFrame([(1,), (5,)], "node long")
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.personalized_pagerank(df, seeds, iters=3).collect()
        }
        assert got == _ppr_reference(self.EDGES, [1, 5], 3)

    def test_empty_seed_list_raises(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        with pytest.raises(ValueError, match="empty seed"):
            graph.personalized_pagerank(df, [], iters=2)

    def test_weighted_matches_reference_and_unit_equals_unweighted(self, spark):
        wedges = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 1)]
        dfw = spark.createDataFrame(wedges, "src long, dst long, w long")
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.personalized_pagerank(
                dfw, [1], iters=3, weight_col="w"
            ).collect()
        }
        ref = _ppr_reference(
            [(a, b) for a, b, _ in wedges], [1], 3, [w for _, _, w in wedges]
        )
        assert got == ref
        df1 = spark.createDataFrame(
            [(a, b, 1) for a, b, _ in wedges], "src long, dst long, w long"
        )
        unw = spark.createDataFrame(
            [(a, b) for a, b, _ in wedges], "src long, dst long"
        )
        gu = {
            r["node"]: r["rank_micro"]
            for r in graph.personalized_pagerank(unw, [1], iters=3).collect()
        }
        g1 = {
            r["node"]: r["rank_micro"]
            for r in graph.personalized_pagerank(
                df1, [1], iters=3, weight_col="w"
            ).collect()
        }
        assert gu == g1

    def test_sql_twin(self, spark):
        import duckdb

        values = ", ".join(f"({a}, {b})" for a, b in self.EDGES)
        sql = graph.build_ppr_sql(
            f"SELECT * FROM (VALUES {values}) AS t(src, dst)",
            "SELECT 1 AS node",
            iters=4,
        ) + "SELECT node, rank_micro FROM r4 WHERE rank_micro > 0 ORDER BY node"
        oracle = dict(duckdb.connect().execute(sql).fetchall())
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.personalized_pagerank(df, [1], iters=4).collect()
        }
        assert got == {int(k): int(v) for k, v in oracle.items()}

    def test_sql_twin_weighted(self, spark):
        import duckdb

        wedges = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 1), (2, 4, 5)]
        values = ", ".join(f"({a}, {b}, {w})" for a, b, w in wedges)
        sql = graph.build_ppr_sql(
            f"SELECT * FROM (VALUES {values}) AS t(src, dst, w)",
            "SELECT 2 AS node",
            iters=3,
            weighted=True,
        ) + "SELECT node, rank_micro FROM r3 WHERE rank_micro > 0 ORDER BY node"
        oracle = dict(duckdb.connect().execute(sql).fetchall())
        df = spark.createDataFrame(wedges, "src long, dst long, w long")
        got = {
            r["node"]: r["rank_micro"]
            for r in graph.personalized_pagerank(
                df, [2], iters=3, weight_col="w"
            ).collect()
        }
        assert got == {int(k): int(v) for k, v in oracle.items()}


def _ra_reference(edges, min_common=1, max_center_degree=None):
    """Brute-force RA/CN/Jaccard link prediction on an undirected graph."""
    from collections import defaultdict
    from itertools import combinations

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    deg = {n: len(v) for n, v in adj.items()}
    scores = defaultdict(lambda: [0, 0])
    for w, nbrs in adj.items():
        if max_center_degree is not None and deg[w] > max_center_degree:
            continue
        for n1, n2 in combinations(sorted(nbrs), 2):
            scores[(n1, n2)][0] += 1
            scores[(n1, n2)][1] += 1_000_000 // deg[w]
    out = {}
    for (n1, n2), (cn, ra) in scores.items():
        if cn < min_common or (n1, n2) in und:
            continue
        out[(n1, n2)] = (
            cn, ra, (cn * 1_000_000) // (deg[n1] + deg[n2] - cn)
        )
    return out


class TestLinkPredictRA:
    def test_square_hand_computed(self, spark):
        # 4-cycle: (1,3) and (2,4) are the predicted diagonals
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
        got = {
            (r["n1"], r["n2"]): (r["cn"], r["ra_micro"], r["jaccard_micro"])
            for r in graph.link_predict_ra(df).collect()
        }
        assert got == {
            (1, 3): (2, 1_000_000, 1_000_000),
            (2, 4): (2, 1_000_000, 1_000_000),
        }

    def test_adjacent_pairs_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
        )
        pairs = {
            (r["n1"], r["n2"]) for r in graph.link_predict_ra(df).collect()
        }
        assert (1, 2) not in pairs and (1, 3) not in pairs

    def test_matches_brute_reference(self, spark):
        import random

        rng = random.Random(7)
        edges = list({
            tuple(sorted(rng.sample(range(30), 2))) for _ in range(80)
        })
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            (r["n1"], r["n2"]): (r["cn"], r["ra_micro"], r["jaccard_micro"])
            for r in graph.link_predict_ra(df).collect()
        }
        assert got == _ra_reference(edges)

    def test_center_degree_cap(self, spark):
        # star: every candidate pair's only witness is the 5-degree hub
        star = [(0, i) for i in range(1, 6)]
        df = spark.createDataFrame(star, "src long, dst long")
        assert graph.link_predict_ra(df).count() == 10
        assert (
            graph.link_predict_ra(df, max_center_degree=4).count() == 0
        )
        # brute reference agrees under the same cap
        mixed = star + [(1, 2), (2, 3)]
        dfm = spark.createDataFrame(mixed, "src long, dst long")
        got = {
            (r["n1"], r["n2"]): (r["cn"], r["ra_micro"], r["jaccard_micro"])
            for r in graph.link_predict_ra(dfm, max_center_degree=4).collect()
        }
        assert got == _ra_reference(mixed, max_center_degree=4)

    def test_min_common_filter(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5), (5, 9)],
            "src long, dst long",
        )
        got = {
            (r["n1"], r["n2"]) for r in graph.link_predict_ra(df, min_common=2).collect()
        }
        assert got == {(1, 3), (2, 4)}

    def test_min_common_validation(self, spark):
        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="min_common"):
            graph.link_predict_ra(df, min_common=0)


class TestIncrementalComponents:
    """incremental_components(labels, batch) must equal batch CC over
    the union of all edges ever seen — the streaming dedup-cluster
    maintenance contract."""

    def _full(self, spark, edges):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {
            (r.node, r.component)
            for r in graph.connected_components(df, src="id_a", dst="id_b").collect()
        }

    def test_three_batches_equal_full_cc(self, spark):
        import random

        rng = random.Random(17)
        edges = list({
            tuple(sorted(rng.sample(range(40), 2))) for _ in range(60)
        })
        batches = [edges[0::3], edges[1::3], edges[2::3]]
        labels = None
        seen = []
        for b in batches:
            seen += b
            bdf = spark.createDataFrame(b, "id_a long, id_b long")
            labels = graph.incremental_components(labels, bdf).localCheckpoint()
            got = {(r.node, r.component) for r in labels.collect()}
            assert got == self._full(spark, seen)

    def test_merge_two_old_components(self, spark):
        b1 = spark.createDataFrame([(1, 2), (10, 11)], "id_a long, id_b long")
        labels = graph.incremental_components(None, b1)
        got1 = {(r.node, r.component) for r in labels.collect()}
        assert got1 == {(1, 1), (2, 1), (10, 10), (11, 10)}
        # bridge the two components: every member must relabel to 1
        b2 = spark.createDataFrame([(2, 11)], "id_a long, id_b long")
        labels = graph.incremental_components(labels, b2)
        got2 = {(r.node, r.component) for r in labels.collect()}
        assert got2 == {(1, 1), (2, 1), (10, 1), (11, 1)}

    def test_untouched_components_pass_through(self, spark):
        b1 = spark.createDataFrame(
            [(1, 2), (10, 11), (20, 21)], "id_a long, id_b long"
        )
        labels = graph.incremental_components(None, b1)
        b2 = spark.createDataFrame([(2, 3)], "id_a long, id_b long")
        out = graph.incremental_components(labels, b2)
        got = {(r.node, r.component) for r in out.collect()}
        assert got == {
            (1, 1), (2, 1), (3, 1),
            (10, 10), (11, 10), (20, 20), (21, 20),
        }

    def test_empty_labels_frame_equals_none(self, spark):
        b = spark.createDataFrame([(5, 6), (6, 7)], "id_a long, id_b long")
        empty = graph.incremental_components(None, b).limit(0)
        got = {
            (r.node, r.component)
            for r in graph.incremental_components(empty, b).collect()
        }
        assert got == {(5, 5), (6, 5), (7, 5)}


class TestKTruss:
    """k-truss peeling (`graph.ktruss`): clique survival, pendant
    pruning, fixpoint support witness, oracle replay identity, loud
    refusals."""

    def _edges(self, spark):
        # 4-clique (1..4) + pendant triangle (4,5,6) + tail edge (6,7)
        rows = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                (4, 5), (4, 6), (5, 6), (6, 7)]
        return spark.createDataFrame(rows, "src bigint, dst bigint")

    def test_clique_survives_pendants_peel(self, spark):
        from social_media_data_pipeline_spark.functions import graph

        out4 = {
            (r["a"], r["b"]): r["support"]
            for r in graph.ktruss(self._edges(spark), k=4).collect()
        }
        # 4-truss = the 4-clique alone; every clique edge sits in
        # exactly 2 triangles INSIDE the surviving subgraph
        assert set(out4) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
        assert set(out4.values()) == {2}
        out3 = {
            (r["a"], r["b"]): r["support"]
            for r in graph.ktruss(self._edges(spark), k=3).collect()
        }
        # 3-truss adds the pendant triangle (support 1) but never the
        # tail edge (in no triangle)
        assert set(out3) == set(out4) | {(4, 5), (4, 6), (5, 6)}
        assert out3[(4, 5)] == 1 and (6, 7) not in out3

    def test_oracle_replays_bit_for_bit(self, spark):
        import duckdb

        from social_media_data_pipeline_spark.functions import graph

        values = ("SELECT * FROM (VALUES (1,2),(1,3),(1,4),(2,3),(2,4),"
                  "(3,4),(4,5),(4,6),(5,6),(6,7)) AS t(src, dst)")
        for k in (3, 4):
            want = sorted(
                (r["a"], r["b"], r["support"])
                for r in graph.ktruss(self._edges(spark), k=k).collect()
            )
            got = duckdb.connect().execute(
                graph.build_ktruss_sql(values, k=k, rounds=6)
            ).fetchall()
            assert sorted(tuple(r) for r in got) == want

    def test_duplicated_directed_input_normalized(self, spark):
        from social_media_data_pipeline_spark.functions import graph

        dup = self._edges(spark).unionByName(
            self._edges(spark).selectExpr("dst as src", "src as dst")
        )
        a = sorted(
            (r["a"], r["b"], r["support"])
            for r in graph.ktruss(self._edges(spark), k=3).collect()
        )
        b = sorted(
            (r["a"], r["b"], r["support"])
            for r in graph.ktruss(dup, k=3).collect()
        )
        assert a == b

    def test_refusals(self, spark):
        from social_media_data_pipeline_spark.functions import graph

        with pytest.raises(ValueError, match="k must be >= 3"):
            graph.ktruss(self._edges(spark), k=2)
        with pytest.raises(ValueError, match="rounds must be >= 1"):
            graph.ktruss(self._edges(spark), k=3, rounds=0)


class TestAssociationRules:
    # baskets: g1={1,2,3}, g2={1,2}, g3={2,4}, g4={1,2} → N=4,
    # n(1)=3, n(2)=4, n(3)=1, n(4)=1; sup(1,2)=3, others 1
    ROWS = [
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2),
        (3, 2), (3, 4),
        (4, 1), (4, 2),
    ]

    def _rules(self, spark, rows, min_support=2):
        df = spark.createDataFrame(rows, "g long, item long")
        return {
            (r["antecedent"], r["consequent"]): r
            for r in graph.association_rules(df, "g", "item", min_support).collect()
        }

    def test_exact_integer_chain(self, spark):
        got = self._rules(spark, self.ROWS)
        assert set(got) == {(1, 2), (2, 1)}
        r12 = got[(1, 2)]
        # conf(1→2) = (3*1e6)//3 = 1_000_000; lift = (1e6*4)//4 = 1e6
        assert (r12["n_ab"], r12["n_a"], r12["n_b"]) == (3, 3, 4)
        assert r12["confidence_ppm"] == 1_000_000
        assert r12["lift_micro"] == 1_000_000
        r21 = got[(2, 1)]
        # conf(2→1) = (3*1e6)//4 = 750_000; lift = (750000*4)//3 = 1_000_000
        assert r21["confidence_ppm"] == 750_000
        assert r21["lift_micro"] == 1_000_000

    def test_multi_quantity_lines_count_once(self, spark):
        # duplicate (basket, item) rows must not inflate supports
        got = self._rules(spark, self.ROWS + [(1, 2), (1, 2), (2, 1)])
        assert got[(1, 2)]["n_ab"] == 3 and got[(1, 2)]["n_b"] == 4

    def test_negative_association_lift_below_one(self, spark):
        # baskets {1,2},{1,2},{1},{2}: sup=2, n(1)=n(2)=3, N=4 →
        # conf(1→2) = (2*1e6)//3 = 666_666,
        # lift = (666666*4)//3 = 888_888 < 1e6: negatively associated
        rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (4, 2)]
        got = self._rules(spark, rows, min_support=1)
        r = got[(1, 2)]
        assert r["confidence_ppm"] == 666_666
        assert r["lift_micro"] == 888_888

    def test_rejects_bad_support(self, spark):
        df = spark.createDataFrame([(1, 1)], "g long, item long")
        with pytest.raises(ValueError, match="min_support"):
            graph.association_rules(df, "g", "item", 0)
