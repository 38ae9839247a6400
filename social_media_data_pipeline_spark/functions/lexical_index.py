"""Build-once / search-many lexical (BM25) index lifecycle.

The full-cycle `docs_bm25` query re-tokenizes and re-aggregates the
ENTIRE corpus on every invocation — the right shape for a differential
benchmark, the wrong lifecycle for production retrieval, where the
inverted index is built once and every query reads only its own terms'
postings (reference analog: the reference trains its DIR model once
and reuses it across runs, ImageLabeling/DIRAdapter.py:20-76 — the
same never-redo-training economics `functions/ann_index.py` gives the
ANN stack).

The persisted index is THREE tables committed under ONE root manifest
(`scale.write_table_manifest` over the union of their files — filename
prefixes distinguish them), so postings, term document-frequencies and
per-document lengths flip atomically:

    postings-*  (t, doc_id, tf, dl)   — the inverted index; dl is
                                        denormalized so a search never
                                        touches the lengths table
    dfreq-*     (t, df)               — vocab-sized
    lengths-*   (doc_id, dl)          — doc-count-sized; used by the
                                        append dup-guard and kept as
                                        the source of truth for stats

Corpus-level stats (N docs, total token count) and the corpus
fingerprint live in a per-commit meta file `_lex_meta-<gen_tag>.json`
(tag = generation + a per-writer uuid) written BEFORE the manifest
flip AND referenced IN the manifest's file list — a reader resolves
the meta through the manifest, so files+stats+fingerprint are one
atomic unit: racing writers write disjoint meta files and the CAS
decides whose meta+files become live together (a crash between meta
write and manifest flip leaves an orphan meta file and the previous
generation fully live).

Search (`bm25_search_indexed`) filters postings and dfreq to the query
terms — a pushed-down `t IN (...)` against a term-sorted parquet file,
so row-group stats skip everything else — and scores with the SAME
expression tree as the full-cycle `retrieval.bm25_score`
(`bm25_term_score_expr`), which is why the differential oracle can
REPLAY the full computation in SQL and still hash-match the persisted
path.

Incremental maintenance (`bm25_index_append`) absorbs a batch of NEW
documents at batch-proportional cost: batch postings/lengths land as
appended files, the vocab-sized dfreq table is merge-rewritten (it is
sublinear in the corpus — the ONLY rewritten piece), stats and the
(count, bit_xor) fingerprint merge incrementally, and the root
manifest CAS-flips. Unlike the frozen-model ANN append
(`ann_index.pq_codes_append`), a BM25 append changes OLD documents'
scores too (df and avgdl move) — that is correct Okapi semantics, and
it falls out for free because df/avgdl are resolved at search time,
never baked into the postings.

At 100 TB: postings are the corpus-sized piece — the build
range-buckets them by term across `postings_buckets` files written IN
PARALLEL (one writer task per bucket, each file term-sorted, so the
pushed `t IN (…)` skips row groups inside every file and file-level
min/max stats skip whole buckets; the commit mechanics are
file-count-agnostic). dfreq is vocab-sized, lengths doc-count-sized,
both tiny next to the corpus and single-file; a search reads |Q|
terms' row groups, never the corpus.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann_index import artifacts_root, corpus_fingerprint
from .retrieval import BM25_B, BM25_K1, bm25_term_score_expr, ranked_desc_topn
from .text import tokenize

_META_PREFIX = "_lex_meta-g"

_POSTINGS_SCHEMA = "t string, doc_id bigint, tf bigint, dl bigint"
_DFREQ_SCHEMA = "t string, df bigint"
_LENGTHS_SCHEMA = "doc_id bigint, dl bigint"


def lex_index_path(corpus_tag: str, params: dict) -> str:
    """Deterministic artifact directory for (corpus, tokenize params)."""
    import hashlib

    key = hashlib.md5(
        json.dumps({"corpus": corpus_tag, **params}, sort_keys=True).encode()
    ).hexdigest()[:16]
    return os.path.join(artifacts_root(), "lex_bm25", key)


def _doc_fingerprint(docs: DataFrame, id_col: str, text_col: str) -> dict:
    """(row count, order-independent content hash) over (id, text)."""
    return corpus_fingerprint(docs, id_col=id_col, vec_col=text_col)


def _stage_files(
    df: DataFrame,
    path: str,
    prefix: str,
    gen_tag: str,
    n_buckets: int = 1,
    sort_cols: Sequence[str] | None = None,
) -> list[str]:
    """Write `df` into uniquely-named `{prefix}-{gen_tag}-*.parquet`
    files under `path` (same naming discipline as
    `ann_index._commit_artifact`: the tag carries a per-writer uuid, so
    concurrent writers stage into disjoint names and os.replace can
    never clobber a committed file).

    `n_buckets` > 1 range-partitions on `sort_cols` and writes ONE
    file per bucket IN PARALLEL — the corpus-sized postings table must
    not funnel through a single writer task (a `coalesce(1)` there
    serializes the one corpus-sized job of the index lifecycle onto one
    core). Each bucket covers a disjoint range of the leading sort
    column and is sorted within, so every file keeps the term-clustered
    row groups that let a pushed `t IN (…)` skip non-matching row
    groups — file-level min/max stats additionally skip whole buckets.
    `n_buckets=1` with `sort_cols` degenerates to one globally-sorted
    file (vocab-/doc-count-sized tables stay single-file)."""
    staged = os.path.join(path, f"_staged-{prefix}-{gen_tag}")
    if sort_cols:
        out_df = df.repartitionByRange(
            max(1, int(n_buckets)), *[F.col(c) for c in sort_cols]
        ).sortWithinPartitions(*sort_cols)
    else:
        out_df = df.coalesce(1)
    out_df.write.mode("overwrite").parquet(staged)
    out = []
    for i, f in enumerate(sorted(glob.glob(os.path.join(staged, "*.parquet")))):
        dst = os.path.join(path, f"{prefix}-{gen_tag}-{i}.parquet")
        os.replace(f, dst)
        out.append(dst)
    shutil.rmtree(staged)
    return out


def _commit(
    path: str,
    live: list[str],
    meta: dict,
    expect_generation: int | None,
    gen_tag: str,
) -> str:
    """Meta-then-manifest commit. The meta file is named with the
    WRITER'S unique tag (`_lex_meta-<gen_tag>.json`, tag = generation +
    uuid — the `ann_index._commit_artifact` naming discipline) and is
    REFERENCED IN the manifest's file list, so the CAS flip binds data
    files and meta atomically: two racing writers write disjoint meta
    files, the manifest points at exactly its own writer's meta, and a
    loser's meta can never shadow the winner's stats (a
    generation-NUMBERED meta name would collide — both writers claim
    the same next generation). Returns the meta path so callers can
    un-stage it on a lost CAS. Readers never confuse the .json entry
    with a table: every table read filters by its `prefix-` basename."""
    from social_media_data_pipeline_spark import scale

    meta_path = os.path.join(path, f"{_META_PREFIX.rstrip('g')}{gen_tag}.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    try:
        scale.write_table_manifest(
            path, live + [meta_path], expect_generation=expect_generation
        )
    except Exception:
        try:
            os.remove(meta_path)  # the loser's meta is never referenced
        except OSError:
            pass
        raise
    return meta_path


def _live_meta_path(path: str) -> str | None:
    from social_media_data_pipeline_spark import scale

    live = scale.read_table_manifest(path) or []
    metas = [
        f for f in live
        if os.path.basename(f).startswith(_META_PREFIX.rstrip("g"))
    ]
    return metas[0] if metas else None


def load_index_meta(path: str) -> dict | None:
    """The live generation's meta (params, fingerprint, stats) resolved
    THROUGH the manifest — the commit point covers it — or None when no
    committed index exists at `path`."""
    mp = _live_meta_path(path)
    if mp is None or not os.path.exists(mp):
        return None
    with open(mp) as fh:
        return json.load(fh)


def _live_files(path: str, prefix: str) -> list[str]:
    from social_media_data_pipeline_spark import scale

    live = scale.read_table_manifest(path) or []
    return [f for f in live if os.path.basename(f).startswith(prefix + "-")]


def _read_part(
    spark: SparkSession, path: str, prefix: str, schema: str
) -> DataFrame:
    files = _live_files(path, prefix)
    if not files:
        raise ValueError(
            f"lexical_index: no live {prefix!r} files under {path} — "
            "the index is missing or was committed by an older layout"
        )
    return spark.read.schema(schema).parquet(*files)


def _corpus_tables(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame, dict]:
    """(postings, dfreq, lengths, stats) for a document frame — the one
    tokenize→explode pass plus map-side-combinable aggregations (the
    same shape as `retrieval._term_freqs`; cited there)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("t")
    )
    tf = toks.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    lengths = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    postings = tf.join(lengths, "doc_id").select("t", "doc_id", "tf", "dl")
    # term-clustering (range partition + sort) happens at STAGE time
    # (`_stage_files` sort_cols) so the one range exchange both
    # parallelizes the write and produces IN-skippable row groups
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    srow = lengths.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("dl_sum")
    ).collect()[0]
    stats = {"n": int(srow["n"]), "dl_sum": int(srow["dl_sum"] or 0)}
    return postings, dfreq, lengths, stats


def build_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: dict | None = None,
    postings_buckets: int = 8,
) -> None:
    """Tokenize the corpus once and COMMIT the three-table index at
    `path`. The per-generation meta lands before the manifest flip —
    the flip is the commit point; a crash earlier leaves the previous
    generation fully live (files + meta resolve together).

    `postings_buckets` parallelizes the one corpus-sized write of the
    lifecycle: postings land as that many term-range-bucketed,
    term-sorted files written concurrently (at 100 TB size this to the
    cluster's write parallelism / target file size; dfreq and lengths
    are vocab-/doc-count-sized and stay single-file)."""
    from social_media_data_pipeline_spark import scale

    os.makedirs(path, exist_ok=True)
    postings, dfreq, lengths, stats = _corpus_tables(docs, id_col, text_col)
    fp = fingerprint or _doc_fingerprint(docs, id_col, text_col)
    prev = scale._read_manifest_doc(path)
    cur_gen = prev["generation"] if prev else None
    gen_tag = f"g{(0 if cur_gen is None else cur_gen + 1)}-{uuid.uuid4().hex[:8]}"
    live = (
        _stage_files(
            postings, path, "postings", gen_tag,
            n_buckets=postings_buckets, sort_cols=("t", "doc_id"),
        )
        + _stage_files(dfreq, path, "dfreq", gen_tag)
        + _stage_files(lengths, path, "lengths", gen_tag)
    )
    meta = {
        "params": {"id_col": id_col, "text_col": text_col},
        "fingerprint": fp,
        "stats": stats,
    }
    try:
        _commit(path, live, meta, expect_generation=cur_gen, gen_tag=gen_tag)
    except Exception:
        for f in live:
            try:
                os.remove(f)
            except OSError:
                pass
        raise


def bm25_index_for(
    docs: DataFrame,
    corpus_tag: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trust_cache: bool = False,
    fingerprint: dict | None = None,
) -> str:
    """Get-or-build: return the committed index path for (corpus,
    params), building it on the first call or whenever the corpus
    fingerprint no longer matches (the table was regenerated or grew
    outside `bm25_index_append`). `trust_cache=True` skips the
    fingerprint scan for callers that own their invalidation."""
    params = {"id_col": id_col, "text_col": text_col}
    path = lex_index_path(corpus_tag, params)
    meta = load_index_meta(path)
    if meta is not None and meta.get("params") == params:
        if trust_cache:
            return path
        fp = fingerprint or _doc_fingerprint(docs, id_col, text_col)
        if meta.get("fingerprint") == fp:
            return path
        build_bm25_index(docs, path, id_col, text_col, fingerprint=fp)
        return path
    build_bm25_index(docs, path, id_col, text_col, fingerprint=fingerprint)
    return path


def bm25_search_indexed(
    spark: SparkSession,
    path: str,
    query_terms: Sequence[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
    topn: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-`topn` over the PERSISTED index — identical
    output contract to `retrieval.bm25_score` ((id, bm25, rank), 6-dp
    rounding before ranking), but the plan reads only the query terms'
    postings: `t IN (...)` pushes into both parquet scans (postings
    are term-sorted, so row-group stats skip non-matching groups), the
    |Q|-row dfreq slice broadcasts, and corpus stats come from the
    committed meta as a 1-row broadcast frame with the same integer
    types the full-cycle stats aggregate produces — the score
    expression tree is shared (`bm25_term_score_expr`), so both paths
    agree far inside the rounding."""
    meta = load_index_meta(path)
    if meta is None:
        raise ValueError(
            f"lexical_index: no committed index at {path} — build it "
            "with bm25_index_for / build_bm25_index first"
        )
    terms = [t.lower() for t in query_terms]
    postings = _read_part(spark, path, "postings", _POSTINGS_SCHEMA).filter(
        F.col("t").isin(terms)
    )
    dfreq = _read_part(spark, path, "dfreq", _DFREQ_SCHEMA).filter(
        F.col("t").isin(terms)
    )
    stats = spark.createDataFrame(
        [(meta["stats"]["n"], meta["stats"]["dl_sum"])], "n bigint, dl_sum bigint"
    )
    per_term = (
        postings.join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(stats))
        .select(F.col("doc_id").alias(id_col), bm25_term_score_expr(k1, b).alias("s"))
    )
    scored = per_term.groupBy(id_col).agg(F.round(F.sum("s"), 6).alias("bm25"))
    return ranked_desc_topn(scored, "bm25", id_col, topn)


def bm25_index_append(
    new_docs: DataFrame,
    corpus_tag: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_buckets: int = 4,
) -> None:
    """Absorb a batch of NEW documents at batch-proportional cost:
    batch postings and lengths APPEND as new files; the vocab-sized
    dfreq table is the only rewrite (old ∪ batch, df summed — vocab is
    sublinear in the corpus, so the rewrite does not grow with it);
    stats and the (count, bit_xor) fingerprint merge incrementally
    with ONE scan of the batch; the root manifest CAS-flips (a
    concurrent writer loses loudly and un-stages).

    Duplicate doc ids are refused loudly BEFORE any file lands —
    appending an already-indexed document would double its postings
    silently (the snm_pairs/negative_pairs refusal convention; the
    check joins the batch against the doc-count-sized lengths table,
    never the postings). Raises when no base index exists —
    `bm25_index_for` builds the base.

    Search-visible effect: new docs rank immediately, and OLD
    documents' scores move too (df and avgdl shift) — correct Okapi
    semantics, free here because df/avgdl resolve at search time
    instead of being baked into postings (contrast
    `ann_index.pq_codes_append`, where the frozen-model contract is
    the point)."""
    from social_media_data_pipeline_spark import scale

    params = {"id_col": id_col, "text_col": text_col}
    path = lex_index_path(corpus_tag, params)
    meta = load_index_meta(path)
    if meta is None or meta.get("params") != params:
        raise ValueError(
            f"bm25_index_append: no committed index for {corpus_tag!r} "
            f"with these params under {path} — build the base with "
            "bm25_index_for first"
        )
    spark = new_docs.sparkSession
    old_lengths = _read_part(spark, path, "lengths", _LENGTHS_SCHEMA)
    dup = (
        new_docs.select(F.col(id_col).alias("doc_id"))
        .join(old_lengths, "doc_id", "left_semi")
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"bm25_index_append: doc_id {dup[0]['doc_id']} is already "
            "indexed — appends must carry only NEW documents (a re-append "
            "would silently double its postings); use a full rebuild via "
            "build_bm25_index for corrections"
        )
    b_postings, b_dfreq, b_lengths, b_stats = _corpus_tables(
        new_docs, id_col, text_col
    )
    old_dfreq = _read_part(spark, path, "dfreq", _DFREQ_SCHEMA)
    merged_dfreq = (
        old_dfreq.unionByName(b_dfreq)
        .groupBy("t")
        .agg(F.sum("df").alias("df"))
    )
    batch_fp = _doc_fingerprint(new_docs, id_col, text_col)
    old_fp, old_stats = meta["fingerprint"], meta["stats"]
    prev = scale._read_manifest_doc(path)
    cur_gen = prev["generation"] if prev else None
    gen_tag = f"g{(0 if cur_gen is None else cur_gen + 1)}-{uuid.uuid4().hex[:8]}"
    staged = (
        _stage_files(
            b_postings, path, "postings", gen_tag,
            n_buckets=postings_buckets, sort_cols=("t", "doc_id"),
        )
        + _stage_files(b_lengths, path, "lengths", gen_tag)
        + _stage_files(merged_dfreq, path, "dfreq", gen_tag)
    )
    keep = _live_files(path, "postings") + _live_files(path, "lengths")
    new_meta = {
        "params": params,
        "fingerprint": {
            "n": old_fp["n"] + batch_fp["n"],
            "h": old_fp["h"] ^ batch_fp["h"],
        },
        "stats": {
            "n": old_stats["n"] + b_stats["n"],
            "dl_sum": old_stats["dl_sum"] + b_stats["dl_sum"],
        },
    }
    try:
        _commit(
            path, keep + staged, new_meta,
            expect_generation=cur_gen, gen_tag=gen_tag,
        )
    except Exception:
        for f in staged:
            try:
                os.remove(f)
            except OSError:
                pass
        raise
