"""Tests: distributed deterministic k-means (`functions/kmeans.py`) —
clustering quality on separable data, empty-cluster handling,
determinism across runs, exact oracle replay, and composition with the
IVF assignment path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions import kmeans, similarity


def _blobs(spark, n_per=30, centers=((10.0, 10.0), (-10.0, -10.0), (10.0, -10.0))):
    """Three well-separated 2-D blobs; deterministic offsets."""
    rows = []
    vid = 0
    for cx, cy in centers:
        for i in range(n_per):
            # deterministic jitter in [-1, 1)
            dx = ((i * 37) % 200) / 100.0 - 1.0
            dy = ((i * 73) % 200) / 100.0 - 1.0
            rows.append((vid, [cx + dx, cy + dy]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


class TestKmeansTrain:
    def test_separable_blobs_recovered(self, spark):
        df = _blobs(spark)
        model = kmeans.kmeans_train(df, k=3, iters=5)
        assert len(model) == 3
        assert sorted(n for _, n, _ in model) == [30, 30, 30]
        got = sorted(
            (round(c[0] / kmeans.MICRO), round(c[1] / kmeans.MICRO)) for _, _, c in model
        )
        assert got == [(-10, -10), (10, -10), (10, 10)]

    def test_deterministic_across_runs(self, spark):
        df = _blobs(spark).repartition(7)
        m1 = kmeans.kmeans_train(df, k=4, iters=3)
        m2 = kmeans.kmeans_train(df.repartition(3), k=4, iters=3)
        assert m1 == m2

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # two seeds land in the same blob -> one goes empty and must
        # keep its coordinates instead of producing NULL/NaN
        rows = [(i, [float(i % 2), 0.0]) for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        model = kmeans.kmeans_train(df, k=5, iters=2)
        assert all(c is not None and len(c) == 2 for _, _, c in model)
        assert sum(n for _, n, _ in model) == 10

    def test_oracle_replay_bit_exact(self, spark, sf_dir):
        from social_media_data_pipeline_spark.io import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        srows = sorted(
            (r["centroid_id"], r["j"], r["c"], r["n_members"])
            for r in kmeans.kmeans_model_df(emb, iters=3).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        drows = sorted(con.execute(kmeans.build_kmeans_oracle_sql(iters=3)).fetchall())
        assert srows == drows

    def test_iters_guard(self, spark):
        with pytest.raises(ValueError, match="iters"):
            kmeans.kmeans_train(_blobs(spark), k=2, iters=0)

    def test_driver_path_bit_matches_distributed(self, spark, sf_dir):
        # file-backed input under the byte budget takes the collected
        # numpy Lloyd path; zeroing the budget forces the distributed
        # per-round jobs — the model must be BIT-identical (ints and
        # the floor(sum/count) doubles), including final memberships
        from social_media_data_pipeline_spark.io import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        fast = kmeans.kmeans_train(emb, iters=3)
        spark.conf.set(kmeans.DRIVER_TRAIN_BYTES_CONF, "0")
        try:
            slow = kmeans.kmeans_train(emb, iters=3)
        finally:
            spark.conf.unset(kmeans.DRIVER_TRAIN_BYTES_CONF)
        assert fast == slow

    def test_driver_path_pq_codebook_bit_matches(self, spark, sf_dir):
        from social_media_data_pipeline_spark.functions import pq
        from social_media_data_pipeline_spark.io import read_table

        emb = read_table(spark, sf_dir, "embeddings")
        fast = pq.pq_codebook_kmeans(emb, m=8, ksub=16, iters=2)
        spark.conf.set(kmeans.DRIVER_TRAIN_BYTES_CONF, "0")
        try:
            slow = pq.pq_codebook_kmeans(emb, m=8, ksub=16, iters=2)
        finally:
            spark.conf.unset(kmeans.DRIVER_TRAIN_BYTES_CONF)
        assert fast == slow


class TestKmeansComposition:
    def test_centroids_feed_ivf_assign(self, spark):
        df = _blobs(spark)
        cents = kmeans.kmeans_centroids(df, k=3, iters=4)
        assigned = similarity.ivf_assign(df, cents)
        # trained cells on separable blobs = the true partition
        per_cluster = (
            assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        assert sorted(r["n"] for r in per_cluster) == [30, 30, 30]

    def test_centroid_frame_schema(self, spark):
        cents = kmeans.kmeans_centroids(_blobs(spark), k=2, iters=1)
        assert cents.columns == ["vec_id", "embedding"]
        assert cents.schema["embedding"].dataType.simpleString() == "array<double>"
