"""Train-once / search-many ANN index lifecycle (r9): persisted
manifest-committed centroids, params/fingerprint invalidation, and
bit-identity of the cache path with a fresh train."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions import ann_index, kmeans


@pytest.fixture()
def emb(spark):
    rows = [
        (i, [float((i * 7 + j * 3) % 13) for j in range(8)]) for i in range(64)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


@pytest.fixture(autouse=True)
def artifacts_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS_DIR", str(tmp_path / "arts"))
    yield str(tmp_path / "arts")


class TestIvfIndexLifecycle:
    def test_get_or_train_caches_and_matches_fresh_train(self, spark, emb):
        tag = "unit:emb"
        c1 = ann_index.ivf_centroids_for(emb, tag, k=4, iters=2)
        path = ann_index.ivf_index_path(
            tag,
            {"k": 4, "iters": 2, "id_col": "vec_id", "vec_col": "embedding"},
        )
        assert os.path.exists(os.path.join(path, "_manifest.json"))
        # second call must be a cache hit (no retrain): the meta file's
        # mtime is the cheapest train-detector
        meta = os.path.join(path, ann_index._META)
        t0 = os.path.getmtime(meta)
        c2 = ann_index.ivf_centroids_for(emb, tag, k=4, iters=2)
        assert os.path.getmtime(meta) == t0
        # cache path is bit-identical to a fresh in-process train
        fresh = kmeans.kmeans_centroids(emb, k=4, iters=2)
        as_rows = lambda df: sorted(  # noqa: E731
            (r["vec_id"], tuple(r["embedding"])) for r in df.collect()
        )
        assert as_rows(c1) == as_rows(fresh)
        assert as_rows(c2) == as_rows(fresh)

    def test_params_key_separate_artifacts(self, spark, emb):
        ann_index.ivf_centroids_for(emb, "unit:emb", k=4, iters=2)
        ann_index.ivf_centroids_for(emb, "unit:emb", k=8, iters=2)
        p4 = ann_index.ivf_index_path(
            "unit:emb",
            {"k": 4, "iters": 2, "id_col": "vec_id", "vec_col": "embedding"},
        )
        p8 = ann_index.ivf_index_path(
            "unit:emb",
            {"k": 8, "iters": 2, "id_col": "vec_id", "vec_col": "embedding"},
        )
        assert p4 != p8 and os.path.exists(p4) and os.path.exists(p8)

    def test_corpus_change_forces_retrain(self, spark, emb):
        tag = "unit:emb"
        params = {"k": 4, "iters": 2, "id_col": "vec_id",
                  "vec_col": "embedding"}
        ann_index.ivf_centroids_for(emb, tag, k=4, iters=2)
        path = ann_index.ivf_index_path(tag, params)
        gen0 = max(
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(path)
            if f.startswith("_manifest-")
        )
        # regenerated corpus (same tag, different content) → fingerprint
        # moves → retrain commits a NEW manifest generation
        emb2 = emb.withColumn(
            "embedding",
            F.transform("embedding", lambda x: x + F.lit(1.0)),
        )
        c2 = ann_index.ivf_centroids_for(emb2, tag, k=4, iters=2)
        gen1 = max(
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(path)
            if f.startswith("_manifest-")
        )
        assert gen1 == gen0 + 1
        fresh2 = kmeans.kmeans_centroids(emb2, k=4, iters=2)
        as_rows = lambda df: sorted(  # noqa: E731
            (r["vec_id"], tuple(r["embedding"])) for r in df.collect()
        )
        assert as_rows(c2) == as_rows(fresh2)

    def test_trust_cache_skips_fingerprint(self, spark, emb):
        tag = "unit:emb"
        ann_index.ivf_centroids_for(emb, tag, k=4, iters=2)
        # trust_cache returns the stale artifact without scanning the
        # (changed) corpus — the caller-owns-invalidation contract
        emb2 = emb.withColumn(
            "embedding",
            F.transform("embedding", lambda x: x + F.lit(1.0)),
        )
        stale = ann_index.ivf_centroids_for(
            emb2, tag, k=4, iters=2, trust_cache=True
        )
        fresh = kmeans.kmeans_centroids(emb, k=4, iters=2)
        as_rows = lambda df: sorted(  # noqa: E731
            (r["vec_id"], tuple(r["embedding"])) for r in df.collect()
        )
        assert as_rows(stale) == as_rows(fresh)

    def test_fingerprint_order_independent(self, spark, emb):
        f1 = ann_index.corpus_fingerprint(emb)
        f2 = ann_index.corpus_fingerprint(emb.orderBy(F.desc("vec_id")))
        assert f1 == f2 and f1["n"] == 64
