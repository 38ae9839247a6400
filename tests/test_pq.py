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
