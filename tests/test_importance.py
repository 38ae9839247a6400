"""Tests: DSIR importance weighting / Gumbel resampling
(`functions/importance.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions import importance


@pytest.fixture()
def corpus(spark):
    rows = []
    # target-flavored docs repeat 'alpha beta'; off-target repeat 'zulu yankee'
    for i in range(20):
        rows.append((i, "alpha beta alpha beta gamma", "en"))
    for i in range(20, 40):
        rows.append((i, "zulu yankee zulu yankee xray", "de"))
    # mixed doc: halfway vocabulary
    rows.append((40, "alpha beta zulu yankee", "fr"))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


class TestDsirWeights:
    def test_target_like_docs_score_higher(self, corpus):
        w = importance.dsir_logweights(corpus, F.col("lang") == "en").collect()
        by_id = {r["doc_id"]: r["dsir_logw"] for r in w}
        assert by_id[0] > by_id[40] > by_id[25]
        assert len(w) == 41  # every doc scored, including target rows

    def test_n_grams_counts_uni_plus_bi(self, corpus):
        w = importance.dsir_logweights(corpus, F.col("lang") == "en")
        row = {r["doc_id"]: r["n_grams"] for r in w.collect()}[40]
        assert row == 4 + 3  # 4 unigrams + 3 bigrams

    def test_param_guards(self, corpus):
        with pytest.raises(ValueError):
            importance.dsir_logweights(corpus, F.lit(True), n_buckets=1)
        with pytest.raises(ValueError):
            importance.dsir_logweights(corpus, F.lit(True), alpha=0.0)

    def test_broadcast_ratio_join(self, corpus):
        plan = importance.dsir_logweights(
            corpus, F.col("lang") == "en"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestDsirResample:
    def test_deterministic_and_biased_toward_target(self, corpus):
        w = importance.dsir_logweights(corpus, F.col("lang") == "en")
        s1 = importance.dsir_resample(w, k=10, seed="s").collect()
        s2 = importance.dsir_resample(w, k=10, seed="s").collect()
        assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
        assert len(s1) == 10
        # weights are strongly separated -> sample should be mostly target docs
        n_target = sum(1 for r in s1 if r["doc_id"] < 20)
        assert n_target >= 8

    def test_seed_changes_draw(self, corpus):
        w = importance.dsir_logweights(corpus, F.col("lang") == "en")
        a = {r["doc_id"] for r in importance.dsir_resample(w, k=5, seed="a").collect()}
        b = {r["doc_id"] for r in importance.dsir_resample(w, k=5, seed="b").collect()}
        assert a != b  # overwhelmingly likely with 20 near-tied target docs

    def test_k_guard(self, corpus):
        w = importance.dsir_logweights(corpus, F.col("lang") == "en")
        with pytest.raises(ValueError):
            importance.dsir_resample(w, k=0)
