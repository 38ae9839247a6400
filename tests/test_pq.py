"""Tests: product quantization (`functions/pq.py`) — codebook layout,
encode argmin semantics, ADC distance arithmetic vs numpy, and
approximate-NN behavior on structured data."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_data_pipeline_spark.functions import pq


def _df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


class TestPq:
    def test_codebook_shape_and_values(self, spark):
        rng = np.random.default_rng(5)
        mat = rng.standard_normal((40, 16))
        cb = pq.pq_codebook(_df(spark, mat), m=4, ksub=8)
        assert len(cb) == 4 and len(cb[0]) == 8 and len(cb[0][0]) == 4
        # CB[j][c] is subvector j of seed vector c
        assert cb[2][5] == pytest.approx(list(mat[5, 8:12]))

    def test_seed_vectors_encode_to_own_codes(self, spark):
        """Seed vector c's subvectors ARE codewords c → distance 0 →
        its code array is [c] * m."""
        rng = np.random.default_rng(6)
        mat = rng.standard_normal((30, 16))
        df = _df(spark, mat)
        cb = pq.pq_codebook(df, m=4, ksub=8)
        codes = {r["vec_id"]: r["codes"] for r in pq.pq_encode(df, cb).collect()}
        for c in range(8):
            assert codes[c] == [c] * 4

    def test_adc_matches_numpy(self, spark):
        rng = np.random.default_rng(7)
        mat = rng.standard_normal((20, 8))
        df = _df(spark, mat)
        cb = pq.pq_codebook(df, m=2, ksub=4)
        codes = {r["vec_id"]: r["codes"] for r in pq.pq_encode(df, cb).collect()}
        out = pq.pq_adc_topk(df.filter("vec_id = 17"), pq.pq_encode(df, cb), cb, k=19)
        got = {r["neighbor_id"]: r["adc_dist"] for r in out.collect()}
        q = mat[17]
        for nid, adc in got.items():
            expect = sum(
                round(float(np.sum((q[j * 4 : (j + 1) * 4] - np.array(cb[j][codes[nid][j]])) ** 2)), 6)
                for j in range(2)
            )
            assert adc == pytest.approx(round(expect, 4), abs=1e-3)

    def test_ann_on_clustered_data(self, spark):
        """Two tight clusters: every query's ADC top-1 lands in its own
        cluster — quantization preserves coarse geometry."""
        rng = np.random.default_rng(8)
        a = rng.standard_normal(16)
        b = rng.standard_normal(16) + 8.0
        mat = np.concatenate(
            [
                a + 0.01 * rng.standard_normal((20, 16)),
                b + 0.01 * rng.standard_normal((20, 16)),
            ]
        )
        df = _df(spark, mat)
        cb = pq.pq_codebook(df, m=4, ksub=16)
        top1 = pq.pq_adc_topk(df, pq.pq_encode(df, cb), cb, k=1).collect()
        assert len(top1) == 40
        for r in top1:
            assert (r["query_id"] < 20) == (r["neighbor_id"] < 20)

    def test_guards(self, spark):
        rng = np.random.default_rng(9)
        df = _df(spark, rng.standard_normal((10, 15)))
        with pytest.raises(ValueError, match="not divisible"):
            pq.pq_codebook(df, m=4, ksub=8)
        with pytest.raises(ValueError, match="seed vectors"):
            pq.pq_codebook(_df(spark, rng.standard_normal((5, 16))), m=4, ksub=8)

    def test_codes_are_compact(self, spark):
        """The compression claim: 64 doubles → 8 small ints."""
        rng = np.random.default_rng(10)
        df = _df(spark, rng.standard_normal((30, 64)))
        cb = pq.pq_codebook(df, m=8, ksub=16)
        rows = pq.pq_encode(df, cb).collect()
        for r in rows:
            assert len(r["codes"]) == 8
            assert all(0 <= c < 16 for c in r["codes"])


class TestIvfPq:
    def test_neighbors_come_from_query_cell(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from social_media_data_pipeline_spark.functions import similarity as sim

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = emb.filter("vec_id % 50 = 0")
        cb = pq.pq_codebook(emb, m=8, ksub=16)
        out = pq.ivf_pq_topk(emb.filter("vec_id < 20"), emb, cents, cb, k=5)
        cell = {
            r["vec_id"]: r["cluster"]
            for r in sim.ivf_assign(emb, cents).select("vec_id", "cluster").collect()
        }
        rows = out.collect()
        assert len(rows) > 0
        for r in rows:
            assert cell[r["query_id"]] == cell[r["neighbor_id"]]

    def test_clustered_data_top1_is_in_own_cluster(self, spark):
        rng = np.random.default_rng(12)
        a = rng.standard_normal(16)
        b = rng.standard_normal(16) + 10.0
        mat = np.concatenate(
            [
                a + 0.01 * rng.standard_normal((20, 16)),
                b + 0.01 * rng.standard_normal((20, 16)),
            ]
        )
        df = _df(spark, mat)
        cents = df.filter("vec_id in (0, 20)")
        cb = pq.pq_codebook(df, m=4, ksub=16)
        top1 = pq.ivf_pq_topk(df, df, cents, cb, k=1).collect()
        assert len(top1) == 40
        for r in top1:
            assert (r["query_id"] < 20) == (r["neighbor_id"] < 20)


class TestTrainedCodebook:
    def test_kmeans_codebook_cuts_quantization_error(self, spark):
        """Trained codewords must not lose to the id-seed codebook on
        total quantization error (sum of squared distances to the
        assigned codeword)."""
        rng = np.random.default_rng(11)
        mat = rng.standard_normal((120, 16))
        df = _df(spark, mat)
        seed_cb = pq.pq_codebook(df, m=4, ksub=8)
        trained_cb = pq.pq_codebook_kmeans(df, m=4, ksub=8, iters=4)

        def total_err(cb):
            codes = {r["vec_id"]: r["codes"] for r in pq.pq_encode(df, cb).collect()}
            err = 0.0
            for i, row in enumerate(mat):
                for j in range(4):
                    sub = row[j * 4 : (j + 1) * 4]
                    err += float(np.sum((sub - np.array(cb[j][codes[i][j]])) ** 2))
            return err

        e_seed, e_trained = total_err(seed_cb), total_err(trained_cb)
        assert e_trained < e_seed * 0.8

    def test_kmeans_codebook_oracle_chain_bit_exact(self, spark, sf_dir):
        import duckdb

        from social_media_data_pipeline_spark.io import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        cb = pq.pq_codebook_kmeans(emb, m=8, ksub=16, iters=2)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        rows = con.execute(
            pq.build_pq_kmeans_chain_sql(m=8, ksub=16, iters=2)
            + " SELECT c, j, csub FROM cw ORDER BY j, c"
        ).fetchall()
        got = {}
        for c, j, csub in rows:
            got[(j, c)] = list(csub)
        for j in range(8):
            for c in range(16):
                assert got[(j, c)] == cb[j][c], (j, c)

    def test_kmeans_codebook_shape(self, spark):
        rng = np.random.default_rng(3)
        df = _df(spark, rng.standard_normal((40, 8)))
        cb = pq.pq_codebook_kmeans(df, m=2, ksub=4, iters=1)
        assert len(cb) == 2 and len(cb[0]) == 4 and len(cb[0][0]) == 4


class TestResidualIvfPq:
    def _clustered(self, spark, per=10, dim=16):
        """4 well-separated clusters; vectors = center + small offset."""
        import numpy as np

        rng_base = np.eye(4)
        rows = []
        vid = 0
        for c in range(4):
            center = np.zeros(dim)
            center[c * 4 : c * 4 + 4] = 10.0
            for i in range(per):
                off = np.array([((vid * 31 + j * 7) % 5 - 2) * 0.1 for j in range(dim)])
                rows.append((vid, (center + off).tolist()))
                vid += 1
        return spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    def test_near_optimal_vs_exact_in_cell_l2(self, spark):
        """For same-cell pairs, residual ADC approximates the true
        ‖q−x‖² (identity: q−c − (x−c) = q−x). The approximation
        contract: the top hit matches exactly (clusters are well
        separated there) and every returned neighbor's TRUE distance is
        within a small quantization margin of the exact k-th distance —
        ADC may swap near-ties, never miss by a margin."""
        import numpy as np

        from social_media_data_pipeline_spark.functions import pq, similarity

        df = self._clustered(spark)
        centroids = similarity.select_ivf_centroids(df, k=4, corpus_size=40)
        got = pq.ivf_pq_residual_topk(
            df.filter("vec_id < 4"), df, centroids, m=4, ksub=16, iters=4, k=3
        ).collect()
        vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
        cells = {
            r["vec_id"]: r["cluster"]
            for r in similarity.ivf_assign(df, centroids).collect()
        }
        for q in range(4):
            mine = sorted(
                (r for r in got if r["query_id"] == q), key=lambda r: r["rank"]
            )
            assert len(mine) == 3
            same_cell = [v for v in vecs if v != q and cells[v] == cells[q]]
            true_d = lambda v: float(np.sum((vecs[q] - vecs[v]) ** 2))  # noqa: E731
            exact = sorted(same_cell, key=lambda v: (true_d(v), v))[:3]
            assert mine[0]["neighbor_id"] == exact[0]
            margin = 0.1  # quantization slack ≪ inter-cluster distances
            for r in mine:
                assert cells[r["neighbor_id"]] == cells[q]
                assert true_d(r["neighbor_id"]) <= true_d(exact[-1]) + margin

    def test_map_side_assign_parity_with_aggregate_argmax(self, spark):
        """r13: ivf_assign was rewritten from an n·K cross-join +
        max-struct SortAggregate to the multiprobe-style map-side
        argmax. Same rounded scores, same (max cos, min id) tie-break
        — every column must be bit-identical to the old aggregate
        formulation, replayed here inline as the reference."""
        from pyspark.sql import functions as F

        from social_media_data_pipeline_spark.functions import similarity
        from social_media_data_pipeline_spark.functions.similarity import (
            dot,
            norm,
        )

        df = self._clustered(spark)
        centroids = similarity.select_ivf_centroids(df, k=4, corpus_size=40)
        c = centroids.select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_vec"),
            norm(F.col("embedding")).alias("c_norm"),
        )
        with_norm = df.select(
            F.col("vec_id"), F.col("embedding"), norm(F.col("embedding")).alias("v_norm")
        )
        denom = F.col("v_norm") * F.col("c_norm")
        cos = F.when(
            denom > 0, dot(F.col("embedding"), F.col("c_vec")) / denom
        ).otherwise(F.lit(0.0))
        scored = with_norm.crossJoin(F.broadcast(c)).select(
            "vec_id", "embedding", "v_norm", "centroid_id",
            F.round(cos, 6).alias("c_cos"),
        )
        ref = scored.groupBy("vec_id").agg(
            F.max(
                F.struct(
                    F.col("c_cos"),
                    (-F.col("centroid_id")).alias("neg_id"),
                    F.col("embedding").alias("vec"),
                    F.col("v_norm").alias("v_norm"),
                )
            ).alias("best")
        ).select(
            "vec_id",
            F.col("best.vec").alias("embedding"),
            F.col("best.v_norm").alias("v_norm"),
            (-F.col("best.neg_id")).cast("int").alias("cluster"),
            F.col("best.c_cos").alias("c_cos"),
        )
        want = {
            r["vec_id"]: (tuple(r["embedding"]), r["v_norm"], r["cluster"], r["c_cos"])
            for r in ref.collect()
        }
        got = {
            r["vec_id"]: (tuple(r["embedding"]), r["v_norm"], r["cluster"], r["c_cos"])
            for r in similarity.ivf_assign(df, centroids).collect()
        }
        assert got == want and len(got) == 40

    def test_assign_empty_centroids_yields_no_rows(self, spark):
        from social_media_data_pipeline_spark.functions import similarity

        df = self._clustered(spark)
        empty = df.filter("vec_id < 0")
        assert similarity.ivf_assign(df, empty).count() == 0

    def test_multiprobe_widens_candidates(self, spark):
        from social_media_data_pipeline_spark.functions import pq, similarity

        df = self._clustered(spark)
        centroids = similarity.select_ivf_centroids(df, k=4, corpus_size=40)
        one = pq.ivf_pq_residual_topk(
            df.filter("vec_id < 2"), df, centroids, m=4, ksub=16, iters=2, k=3, probes=1
        )
        two = pq.ivf_pq_residual_topk(
            df.filter("vec_id < 2"), df, centroids, m=4, ksub=16, iters=2, k=3, probes=2
        )
        assert one.count() == 6 and two.count() == 6
        # 2-probe candidates are a superset → distances can only improve
        d1 = {(r["query_id"], r["rank"]): r["adc_dist"] for r in one.collect()}
        d2 = {(r["query_id"], r["rank"]): r["adc_dist"] for r in two.collect()}
        for key in d1:
            assert d2[key] <= d1[key] + 1e-9


class TestL2Normalize:
    def test_unit_norm_and_zero_passthrough(self, spark):
        import math

        from social_media_data_pipeline_spark.functions import similarity

        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 1.0])],
            "vec_id int, embedding array<double>",
        )
        rows = {
            r["vec_id"]: r["v"]
            for r in df.select(
                "vec_id", similarity.l2_normalize("embedding").alias("v")
            ).collect()
        }
        assert rows[1] == [0.6, 0.8]
        assert rows[2] == [0.0, 0.0]
        assert abs(math.hypot(*rows[3]) - 1.0) < 1e-12
