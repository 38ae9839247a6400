from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions import membership


@pytest.fixture(scope="module")
def corpus(spark):
    members = spark.range(0, 500).select(
        F.concat(F.lit("member_"), F.col("id")).alias("v")
    )
    probes = spark.range(0, 2000).select(
        F.concat(F.lit("other_"), F.col("id")).alias("v")
    )
    return members, probes


class TestBloom:
    def test_suggest_num_bits_monotone_and_word_aligned(self):
        m1 = membership.suggest_num_bits(1000, 0.01)
        m2 = membership.suggest_num_bits(1000, 0.001)
        assert m2 > m1 and m1 % 64 == 0 and m2 % 64 == 0
        with pytest.raises(ValueError):
            membership.suggest_num_bits(1000, 1.5)

    def test_no_false_negatives(self, spark, corpus):
        members, _ = corpus
        m = membership.suggest_num_bits(500, 0.01)
        bloom = membership.bloom_filter_table(members, "v", m)
        hits = (
            members.join(F.broadcast(bloom))
            .filter(membership.might_contain_expr("v", m))
            .count()
        )
        assert hits == 500  # every true member must pass

    def test_false_positive_rate_bounded(self, spark, corpus):
        members, probes = corpus
        m = membership.suggest_num_bits(500, 0.01)
        bloom = membership.bloom_filter_table(members, "v", m)
        fp = (
            probes.join(F.broadcast(bloom))
            .filter(membership.might_contain_expr("v", m))
            .count()
        )
        # target fpp 1%; allow generous slack over 2000 probes
        assert fp / 2000.0 < 0.05

    def test_exact_semi_join_equals_plain_semi_join(self, spark, corpus):
        members, probes = corpus
        big = probes.union(members.limit(100)).withColumnRenamed("v", "k")
        exact = membership.bloom_semi_join(
            big, "k", members, "v", expected_items=500
        )
        plain = big.join(
            F.broadcast(members.withColumnRenamed("v", "k")), "k", "left_semi"
        )
        assert sorted(r.k for r in exact.collect()) == sorted(
            r.k for r in plain.collect()
        )

    def test_approximate_mode_is_superset(self, spark, corpus):
        members, probes = corpus
        big = probes.union(members.limit(100)).withColumnRenamed("v", "k")
        approx = {
            r.k
            for r in membership.bloom_semi_join(
                big, "k", members, "v", expected_items=500, exact=False
            ).collect()
        }
        plain = {
            r.k
            for r in big.join(
                F.broadcast(members.withColumnRenamed("v", "k")), "k", "left_semi"
            ).collect()
        }
        assert plain <= approx

    def test_requires_sizing(self, spark, corpus):
        members, probes = corpus
        with pytest.raises(ValueError):
            membership.bloom_semi_join(probes, "v", members, "v")
