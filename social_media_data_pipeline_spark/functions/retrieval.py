"""Lexical retrieval scoring over document corpora: TF-IDF and BM25.

Training-data curation needs per-document salient terms (TF-IDF — topic
tagging, mixture balancing) and query-driven document ranking (BM25 —
targeted subset extraction, benchmark-adjacent retrieval audits). Both
are pure DataFrame aggregation pipelines — no Python in the executor
path — built from one tokenize→explode pass like
`functions/text.py:unigram_logprob`.

Scale shape (100 TB): the only large shuffle is the (doc, term)
term-frequency aggregation, which is map-side combinable. Document
frequencies and query-term statistics are vocab-sized (sublinear in the
corpus) and broadcast back; per-document top-k term selection uses a
sorted-slice aggregate (map-side partial collect of a vocab-bounded
list per doc), never a global window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokenize

# BM25 Okapi defaults (Robertson/Sparck Jones; public formulation)
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_term_score_expr(k1: float = BM25_K1, b: float = BM25_B):
    """The per-(doc, term) Okapi BM25 contribution over columns
    `tf`, `dl`, `df`, `n`, `dl_sum` — factored out so the full-cycle
    scorer (`bm25_score`) and the persisted-index search
    (`lexical_index.bm25_search_indexed`) build the IDENTICAL
    expression tree: same operand order, same literals, so their
    floating-point sums agree far inside the 6-dp rounding the rank
    is assigned on."""
    return (
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b)
                * F.col("dl")
                / (F.col("dl_sum").cast("double") / F.col("n"))
            )
        )
    )


def ranked_desc_topn(
    scored: DataFrame, score_col: str, id_col: str, topn: int
) -> DataFrame:
    """Window-free top-n + dense 1..n rank over (score desc, id asc):
    orderBy+limit (TakeOrderedAndProject — per-partition heaps, no
    global sort) bounds the survivors to `topn`, then ONE bounded
    collect_list + array_sort + posexplode assigns ranks — the single
    partition the 1-row agg runs on holds <= topn rows by
    construction. Shared by `bm25_score` and the persisted-index
    search path."""
    top = scored.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(topn)
    one = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col(score_col)).alias("ns"),
                    F.col(id_col).alias("id"),
                    F.col(score_col).alias("s"),
                )
            )
        ).alias("xs")
    )
    return one.select(F.posexplode("xs").alias("pos", "x")).select(
        F.col("x.id").alias(id_col),
        F.col("x.s").alias(score_col),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )


def _term_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, t, tf): one explode pass + one map-side-combinable shuffle."""
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("t"))
    return toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    tf = term count / doc length; idf = ln(N / df) (unsmoothed — every
    candidate term has df >= 1 by construction). Output
    (id, term, rank, tfidf) with rank 1..k ordered by score desc then
    term asc; tfidf rounded to 6 dp AFTER ranking per the cross-engine
    fp policy. Exact ties (same tf and df) order identically in every
    engine via the term tie-break; unequal scores derive from integer
    counts and differ by far more than one ulp.

    Plan: tf shuffle on (doc, term) → doc-length reuse of the same
    partial → vocab-sized df table broadcast back → per-doc top-k via
    sorted-slice aggregate (no window, no second doc-keyed shuffle
    beyond the groupBy).
    """
    tf = _term_freqs(df, id_col, text_col)
    doclen = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n = doclen.agg(F.count(F.lit(1)).alias("n"))  # 1 row
    dfreq_n = dfreq.crossJoin(F.broadcast(n))

    scored = (
        tf.join(doclen, id_col)
        .join(F.broadcast(dfreq_n), "t")
        .select(
            F.col(id_col),
            F.col("t"),
            (
                (F.col("tf").cast("double") / F.col("dl"))
                * F.log(F.col("n").cast("double") / F.col("df"))
            ).alias("s"),
        )
    )

    def _rank(x, y):
        # desc by score, asc by term — total order, engine-portable
        return (
            F.when(x["s"] > y["s"], F.lit(-1))
            .when(x["s"] < y["s"], F.lit(1))
            .otherwise(
                F.when(x["t"] < y["t"], F.lit(-1))
                .when(x["t"] > y["t"], F.lit(1))
                .otherwise(F.lit(0))
            )
        )

    top = (
        scored.groupBy(id_col)
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("s", "t")), _rank), 1, k
            ).alias("top")
        )
        .select(F.col(id_col), F.posexplode("top").alias("pos", "st"))
        .select(
            F.col(id_col),
            F.col("st.t").alias("term"),
            (F.col("pos") + 1).alias("rank"),
            F.round(F.col("st.s"), 6).alias("tfidf"),
        )
    )
    return top


def bm25_score(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    topn: int = 20,
) -> DataFrame:
    """Okapi BM25 top-`topn` documents for a bag-of-words query.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Output (id, bm25, rank): bm25 rounded to 6 dp, rank assigned on the
    ROUNDED score (desc) then id (asc) — rounding first makes the rank
    invariant to sub-1e-6 summation-order differences across engines.

    Plan: term frequencies are computed ONLY for the query terms (the
    isin filter runs before the explode's groupBy, so the big (doc,
    term) shuffle carries |Q| terms per doc max); document length and
    avgdl come from a separate full-count pass whose shuffle key is the
    doc id; per-query-term df/idf stats are |Q| rows, broadcast. The
    top-k cut is orderBy+limit (TakeOrderedAndProject — per-partition
    heaps, no global sort); only the <= topn surviving rows pass
    through the rank window, so the window's single partition is
    bounded by construction.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("t"))
    qtf = (
        toks.filter(F.col("t").isin(terms))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl_sum")
    )  # 1 row; avgdl = dl_sum / n is exact (integer sum) in any engine
    dfreq = qtf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))

    per_term = (
        qtf.join(doclen, id_col)
        .join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), bm25_term_score_expr(k1, b).alias("s"))
    )
    scored = per_term.groupBy(id_col).agg(F.round(F.sum("s"), 6).alias("bm25"))
    # rank WITHOUT a window: TakeOrderedAndProject bounds survivors to
    # <= topn, then one bounded array sort assigns ranks (shared tail).
    return ranked_desc_topn(scored, "bm25", id_col, topn)


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: Sequence[str],
    query_vec_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    lex_topn: int = 20,
    sem_topn: int = 20,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009, public formulation): the BM25 top-`lex_topn` list and the
    exact-cosine top-`sem_topn` list for one query (a bag of words +
    its embedding row) fuse by

        rrf(d) = Σ_lists 1 / (rrf_k + rank_list(d))

    computed in EXACT integer micro-units (1e9 div (rrf_k + rank),
    summed as int64) so the fused ranking replays bit-for-bit in the
    DuckDB oracle — the float formulation would hash-drift on
    summation order. Documents present in only one list contribute
    that list's term alone (the standard RRF contract).

    This is the production retrieval default for curation audits:
    lexical matching catches exact terminology the embedding model
    smooths over, the dense list catches paraphrases BM25 misses, and
    RRF needs no score calibration between the two scales — ranks
    only. Scale shape: both lists are top-n bounded before the fusion
    join, so fusion is a join of two ≤topn-row frames (broadcast by
    size); the expensive parts are the BM25 term aggregation and the
    one-query cosine scan, each already audited window-free /
    broadcast in their own registered queries.
    """
    from .similarity import brute_force_topk

    lex = bm25_score(
        docs, query_terms, id_col=id_col, text_col=text_col, topn=lex_topn
    ).select(
        F.col(id_col).alias("id"),
        F.expr(f"1000000000 div ({rrf_k} + rank)").alias("lex_rrf"),
    )
    queries = emb.filter(F.col(emb_id_col) == query_vec_id)
    sem = brute_force_topk(
        queries, emb, id_col=emb_id_col, vec_col=vec_col, k=sem_topn
    ).select(
        F.col("neighbor_id").alias("id"),
        F.expr(f"1000000000 div ({rrf_k} + rank)").alias("sem_rrf"),
    )
    fused = (
        lex.join(sem, "id", "full_outer")
        .select(
            F.col("id").alias(id_col),
            (
                F.coalesce(F.col("lex_rrf"), F.lit(0))
                + F.coalesce(F.col("sem_rrf"), F.lit(0))
            ).alias("rrf_micro"),
        )
    )
    top = fused.orderBy(F.desc("rrf_micro"), F.asc(id_col)).limit(k)
    one = top.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("rrf_micro")).alias("nr"),
                    F.col(id_col).alias("id"),
                    F.col("rrf_micro").alias("rrf_micro"),
                )
            )
        ).alias("xs")
    )
    return one.select(F.posexplode("xs").alias("pos", "x")).select(
        F.col("x.id").alias(id_col),
        F.col("x.rrf_micro").alias("rrf_micro"),
        (F.col("pos") + 1).cast("int").alias("rank"),
    )
