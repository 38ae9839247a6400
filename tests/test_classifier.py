"""Tests: trainable quality classifier (`functions/classifier.py`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions import classifier


pytestmark = pytest.mark.slow  # r13 fast-gate split: long property/replication/artifact suites run in the second lane (-m "slow or not slow")


@pytest.fixture()
def corpus(spark):
    rows = []
    for i in range(30):
        rows.append((i, "clean well formed prose sentence here", 1))
    for i in range(30, 60):
        rows.append((i, "zzz spam spam buy now zzz click", 0))
    rows.append((60, "clean prose with spam click", 1))  # mixed
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


class TestLogregTrain:
    def test_learns_separation(self, corpus):
        w = classifier.logreg_train(
            corpus, F.col("label") == 1, n_buckets=64, iters=20, lr=2.0
        )
        scores = {
            r["id"]: r["score"]
            for r in classifier.quality_scores(corpus, w, n_buckets=64).collect()
        }
        pos = [scores[i] for i in range(30)]
        neg = [scores[i] for i in range(30, 60)]
        assert min(pos) > max(neg)
        assert max(neg) < 0.5 < min(pos)
        # the mixed doc lands between the two classes
        assert max(neg) < scores[60] < min(pos)

    def test_deterministic(self, corpus):
        a = classifier.logreg_train(corpus, F.col("label") == 1, n_buckets=32, iters=5)
        b = classifier.logreg_train(corpus, F.col("label") == 1, n_buckets=32, iters=5)
        # per-weight closeness, not bit equality: the gradient is a
        # raw double sum, and under executor memory pressure a hash
        # aggregate falls back to sort-based merge, flipping the
        # partial-sum order by an ulp (observed once in a full-suite
        # run concurrent with a second Spark JVM). The library contract
        # is the 6-dp-rounded SCORE — which a 1e-9 weight wobble cannot
        # move — so bit equality here was an overstrong claim, not the
        # promised behavior.
        assert [x[0] for x in a] == [x[0] for x in b]
        for (_, wa), (_, wb) in zip(a, b):
            assert abs(wa - wb) < 1e-9

    def test_bias_only_matches_base_rate(self, spark):
        # one-word identical docs: model can only learn the base rate
        rows = [(i, "same", 1 if i < 8 else 0) for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
        w = dict(
            classifier.logreg_train(df, F.col("label") == 1, n_buckets=16, iters=50, lr=2.0)
        )
        score = classifier.quality_scores(df, sorted(w.items()), n_buckets=16).collect()[0][
            "score"
        ]
        assert abs(score - 0.8) < 0.05

    def test_guards(self, corpus):
        with pytest.raises(ValueError):
            classifier.logreg_train(corpus, F.lit(True), iters=0)
        with pytest.raises(ValueError):
            classifier.logreg_train(corpus, F.lit(True), n_buckets=1)

    def test_sampled_training_still_separates(self, corpus):
        # train on a deterministic ~half sample, score EVERY doc: the
        # linear filter still separates the classes
        w = classifier.logreg_train(
            corpus, F.col("label") == 1, n_buckets=64, iters=20, lr=2.0,
            sample_frac=0.5,
        )
        scores = {
            r["id"]: r["score"]
            for r in classifier.quality_scores(corpus, w, n_buckets=64).collect()
        }
        pos = [scores[i] for i in range(30)]
        neg = [scores[i] for i in range(30, 60)]
        assert min(pos) > max(neg)

    def test_sampled_training_deterministic_and_proper_subset(self, corpus):
        a = classifier.logreg_train(
            corpus, F.col("label") == 1, n_buckets=32, iters=3, sample_frac=0.5
        )
        b = classifier.logreg_train(
            corpus, F.col("label") == 1, n_buckets=32, iters=3, sample_frac=0.5
        )
        full = classifier.logreg_train(
            corpus, F.col("label") == 1, n_buckets=32, iters=3
        )
        assert a == b  # md5 draw: same sample, same weights, every run
        assert a != full  # the sample really is a subset, not the corpus

    def test_sample_frac_guard(self, corpus):
        with pytest.raises(ValueError, match="sample_frac"):
            classifier.logreg_train(corpus, F.lit(True), sample_frac=1.5)
