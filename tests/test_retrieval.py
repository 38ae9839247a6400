"""Tests for lexical retrieval scoring (TF-IDF / BM25)."""

from __future__ import annotations

import math

import pytest

from social_media_data_pipeline_spark.functions import retrieval


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "b b c c")], "doc_id long, text string"
    )


class TestTfidf:
    def test_hand_computed_scores(self, spark):
        out = retrieval.tfidf_topk(_corpus(spark), k=2).orderBy("doc_id", "rank")
        rows = [(r.doc_id, r.term, r.rank, r.tfidf) for r in out.collect()]
        idf = math.log(3 / 2)  # every term appears in exactly 2 of 3 docs
        exp = [
            (1, "a", 1, round(2 / 3 * idf, 6)),
            (1, "b", 2, round(1 / 3 * idf, 6)),
            # d2: a and c tie exactly -> term asc breaks it
            (2, "a", 1, round(1 / 2 * idf, 6)),
            (2, "c", 2, round(1 / 2 * idf, 6)),
            (3, "b", 1, round(2 / 4 * idf, 6)),
            (3, "c", 2, round(2 / 4 * idf, 6)),
        ]
        assert rows == exp

    def test_k_caps_terms(self, spark):
        out = retrieval.tfidf_topk(_corpus(spark), k=1)
        assert out.count() == 3
        assert {r.rank for r in out.collect()} == {1}

    def test_no_window_in_plan(self, spark):
        # top-k per doc is a sorted-slice aggregate, never a window
        plan = retrieval.tfidf_topk(_corpus(spark))._jdf.queryExecution().toString()
        assert "Window" not in plan


class TestBm25:
    def test_hand_computed_scores(self, spark):
        out = retrieval.bm25_score(_corpus(spark), ["a", "b"]).orderBy("rank")
        rows = [(r.doc_id, r.bm25, r.rank) for r in out.collect()]
        idf = math.log(1 + (3 - 2 + 0.5) / 2.5)  # df=2 for both query terms

        def term(tf, dl):
            return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))

        assert [r[0] for r in rows] == [1, 3, 2]
        assert [r[2] for r in rows] == [1, 2, 3]
        assert rows[0][1] == pytest.approx(term(2, 3) + term(1, 3), abs=1e-6)
        assert rows[1][1] == pytest.approx(term(2, 4), abs=1e-6)
        assert rows[2][1] == pytest.approx(term(1, 2), abs=1e-6)

    def test_nonmatching_docs_absent(self, spark):
        out = retrieval.bm25_score(_corpus(spark), ["zzz"])
        assert out.count() == 0

    def test_topn_is_take_ordered(self, spark):
        plan = (
            retrieval.bm25_score(_corpus(spark), ["a"], topn=2)
            ._jdf.queryExecution()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestHybridRrf:
    """r7: reciprocal-rank fusion of BM25 + cosine lists."""

    def test_rrf_weights_and_fusion(self, spark, sf_dir):
        from social_media_data_pipeline_spark.functions import retrieval

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = retrieval.hybrid_rrf_topk(
            docs, emb, ["spark", "window", "hash"], query_vec_id=7, k=10
        ).collect()
        assert len(out) == 10
        assert [r["rank"] for r in out] == list(range(1, 11))
        # fused scores are sums of 1e9 // (60 + rank) terms
        vals = [r["rrf_micro"] for r in out]
        assert vals == sorted(vals, reverse=True)
        assert all(v > 0 for v in vals)

    def test_doc_in_both_lists_sums_terms(self, spark):
        from social_media_data_pipeline_spark.functions import retrieval

        # corpus built so doc 0 is rank-1 in BOTH lists: its rrf must be
        # exactly lex + sem rank-1 terms
        docs = spark.createDataFrame(
            [(0, "alpha alpha alpha"), (1, "alpha beta"), (2, "gamma delta")],
            "doc_id long, text string",
        )
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (7, [1.0, 0.05])],
            "vec_id long, embedding array<double>",
        )
        out = {
            r["doc_id"]: r["rrf_micro"]
            for r in retrieval.hybrid_rrf_topk(
                docs, emb, ["alpha"], query_vec_id=7, k=5
            ).collect()
        }
        one = 1_000_000_000 // 61
        assert out[0] == 2 * one  # rank 1 lexically AND semantically
