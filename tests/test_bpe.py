"""Tests: distributed BPE training/encoding (`functions/bpe.py`)
cross-validated against a test-local pure-Python reference
implementation (independent of both the Spark and the DuckDB-oracle
formulations)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row

from social_media_data_pipeline_spark.functions import bpe


def py_bpe(texts, k):
    """Reference BPE: greedy argmax (freq desc, left asc, right asc),
    left-to-right non-overlapping merge application."""
    wf = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                wf[w] += 1
    words = {w: list(w) for w in wf}
    merges = []
    for rank in range(k):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (l, r), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((rank, l, r, cnt))
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            words[w] = out
    return merges, words


TEXTS = [
    "the cat sat on the mat",
    "the hat and the bat batted",
    "banana bandana banana",
    "low lower lowest newest newest",
    "aaaa aaa aa aaaa",  # the overlap case: (a,a) must merge 0-1 and 2-3
]


class TestBpeTrain:
    def test_matches_python_reference(self, spark):
        docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)])
        got = [
            (r.merge_rank, r.lhs, r.rhs, r.pair_freq)
            for r in bpe.bpe_train(docs, num_merges=12).orderBy("merge_rank").collect()
        ]
        exp, _ = py_bpe(TEXTS, 12)
        assert got == exp

    def test_overlap_fold_semantics(self, spark):
        # "aaaa" with merge (a,a): two merges (not three overlapping)
        docs = spark.createDataFrame([Row(doc_id=0, text="aaaa aaaa")])
        rows = bpe.bpe_train(docs, num_merges=2).orderBy("merge_rank").collect()
        assert (rows[0].lhs, rows[0].rhs, rows[0].pair_freq) == ("a", "a", 6)
        # round 2 operates on [aa, aa] per word -> pair (aa, aa) freq 2
        assert (rows[1].lhs, rows[1].rhs, rows[1].pair_freq) == ("aa", "aa", 2)

    def test_guard(self, spark):
        docs = spark.createDataFrame([Row(doc_id=0, text="x")])
        with pytest.raises(ValueError):
            bpe.bpe_train(docs, num_merges=0)


class TestBpeEncode:
    def test_encode_applies_merges_in_order(self, spark):
        exp_merges, exp_words = py_bpe(TEXTS, 8)
        docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)])
        out = bpe.bpe_encode(docs, [(l, r) for _, l, r, _ in exp_merges])
        got = {r.doc_id: r.bpe_tokens for r in out.collect()}
        for i, t in enumerate(TEXTS):
            exp_tokens = [s for w in t.lower().split() for s in exp_words[w]]
            assert got[i] == exp_tokens, f"doc {i}"


class TestBpeVocab:
    def test_vocab_join_equals_per_token_replay(self, spark):
        exp_merges, _ = py_bpe(TEXTS, 8)
        merges = [(l, r) for _, l, r, _ in exp_merges]
        docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)])
        vocab = {r.w: r.syms for r in bpe.bpe_vocab(docs, merges).collect()}
        enc = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(docs, merges).collect()}
        for i, t in enumerate(TEXTS):
            via_vocab = [s for w in t.lower().split() if w for s in vocab[w]]
            assert enc[i] == via_vocab, f"doc {i}"


class TestBpeEncodeCorpus:
    def test_corpus_encoder_agrees_token_for_token(self, spark):
        exp_merges, _ = py_bpe(TEXTS, 8)
        merges = [(l, r) for _, l, r, _ in exp_merges]
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
        ).repartition(3)
        per_token = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(docs, merges).collect()}
        corpus = {r.doc_id: (r.n_words, r.bpe_tokens)
                  for r in bpe.bpe_encode_corpus(docs, merges).collect()}
        assert set(corpus) == set(per_token)
        for i, t in enumerate(TEXTS):
            n_words, toks = corpus[i]
            assert toks == per_token[i], f"doc {i}"
            assert n_words == len([w for w in t.lower().split() if w])
