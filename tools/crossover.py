"""Measure the REAL single-node crossover for the weak-ledger floor
class (r8 verdict Next #6).

34 of 65 headline queries are `weak` by the 2×-vs-pandas letter at
sf0.1 — every one a fixed-Spark-overhead floor at 10⁴–10⁵-row local
scale with a measured flat/sub-linear growth exponent and a CLAIMED
("when the corpus stops fitting one process") but never MEASURED
crossover. This tool measures it: replicate the sf0.1 input N× with
DISJOINT key shifts (copies never interact — group count scales, group
size stays constant, which is the realistic growth direction for
per-source dashboards and per-copy graphs), then time the pandas
baseline and the Spark operator on the SAME replicated parquet until
pandas crosses Spark or the factor cap is hit.

One representative per floor family (r8 verdict's ask):
  * quantile single-scan  — events_winsorized     (pandas 0.06×@1×)
  * decay aggregate       — events_decayed        (pandas 0.12×@1×)
  * graph iterative       — pagerank_weighted     (pandas 0.11×@1×)

Protocol notes:
  * run on an IDLE box, factors strictly sequential (concurrent Spark
    sessions inflate timings ~15% — SCALING r8 lesson);
  * pandas reads the same parquet scratch files (pyarrow), Spark reads
    them cold per factor; both sides materialize fully (pandas builds
    the result frame, Spark writes format("noop"));
  * the pagerank family times the WHOLE pandas baseline (edge build +
    5 integer rounds) against the WHOLE Spark run — both sides start
    from the replicated lineitem, same as the registered query.

Usage:
    python tools/crossover.py [family ...]   # default: all three
    SMDP_CROSS_FACTORS="1,8,32,64" overrides the factor ladder.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from social_media_data_pipeline_spark import io as eio  # noqa: E402
from social_media_data_pipeline_spark.session import get_spark  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(BASE_SF), ".crossover_scratch")
FACTORS = [
    int(x)
    for x in os.environ.get("SMDP_CROSS_FACTORS", "1,8,32,64,128").split(",")
]


def _timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


# ---------------------------------------------------------------- events


def replicate_events(spark, factor: int, path: str) -> None:
    ev = eio.read_table(spark, BASE_SF, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    n_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
    parts = []
    for k in range(factor):
        parts.append(
            ev.select(
                (F.col("user_id") + F.lit(k * n_user)).alias("user_id"),
                # per-copy event_type suffix: group COUNT scales ×N,
                # per-group size constant (new sources, same volume each)
                F.concat(F.col("event_type"), F.lit(f"_{k}")).alias(
                    "event_type"
                ),
                "ts",
                "value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(path)


def spark_winsorized(spark, path: str) -> None:
    from social_media_data_pipeline_spark.operators import aggregates

    ev = spark.read.parquet(path)
    w = aggregates.winsorize(ev, "value", 0.01, 0.99, group_cols=("event_type",))
    micro = F.round(F.col("value_w") * 1e6).cast("bigint")
    (
        w.groupBy("event_type")
        .agg(
            F.round(F.min("__q_lo"), 6).alias("q_lo"),
            F.round(F.max("__q_hi"), 6).alias("q_hi"),
            F.sum((F.col("value") < F.col("__q_lo")).cast("long")).alias("n_low"),
            F.sum((F.col("value") > F.col("__q_hi")).cast("long")).alias("n_high"),
            F.sum(micro).alias("sum_w_micro"),
            F.count(F.lit(1)).alias("n"),
        )
        .write.mode("overwrite")
        .format("noop")
        .save()
    )


def pandas_winsorized(path: str) -> pd.DataFrame:
    ev = pd.read_parquet(path, columns=["event_type", "value"])
    out = []
    for et, g in ev.groupby("event_type"):
        lo = g["value"].quantile(0.01, interpolation="linear")
        hi = g["value"].quantile(0.99, interpolation="linear")
        w = g["value"].clip(lo, hi)
        out.append(
            (et, round(lo, 6), round(hi, 6),
             int((g["value"] < lo).sum()), int((g["value"] > hi).sum()),
             int((w * 1e6).round().sum()), len(g))
        )
    return pd.DataFrame(
        out,
        columns=["event_type", "q_lo", "q_hi", "n_low", "n_high",
                 "sum_w_micro", "n"],
    )


def spark_decayed(spark, path: str) -> None:
    from social_media_data_pipeline_spark.operators import aggregates

    ev = spark.read.parquet(path)
    aggregates.decayed_sum(
        ev, "ts", "value", as_of="2024-02-01", half_life_days=7,
        group_cols=("user_id", "event_type"),
    ).write.mode("overwrite").format("noop").save()


def pandas_decayed(path: str) -> pd.DataFrame:
    ev = pd.read_parquet(path)
    days = (pd.Timestamp("2024-02-01") - ev["ts"].dt.normalize()).dt.days
    ev = ev[days >= 0].assign(__d=days[days >= 0] // 7)
    ev["__m"] = (ev["value"] * (0.5 ** ev["__d"]) * 1e6).round().astype("int64")
    return (
        ev.groupby(["user_id", "event_type"])
        .agg(decayed_micro=("__m", "sum"), n=("__m", "count"))
        .reset_index()
    )


# -------------------------------------------------------------- pagerank


def replicate_lineitem(spark, factor: int, path: str) -> None:
    li = eio.read_table(spark, BASE_SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    n_ord = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    n_part = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    parts = []
    for k in range(factor):
        # disjoint order AND part shifts: N independent co-purchase
        # graphs — community structure replicates, never cross-links
        parts.append(
            li.select(
                (F.col("l_orderkey") + F.lit(k * n_ord)).alias("l_orderkey"),
                (F.col("l_partkey") + F.lit(k * n_part)).alias("l_partkey"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(path)


def _copurchase_edges_spark(spark, path: str):
    li = spark.read.parquet(path)
    pairs = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("pa"),
            F.col("y.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= 2)
    )
    return pairs.selectExpr("pa AS src", "pb AS dst", "sup AS w").unionByName(
        pairs.selectExpr("pb AS src", "pa AS dst", "sup AS w")
    )


def spark_pagerank_weighted(spark, path: str) -> None:
    from social_media_data_pipeline_spark.functions import graph

    edges = _copurchase_edges_spark(spark, path)
    graph.pagerank(edges, iters=5, weight_col="w").write.mode(
        "overwrite"
    ).format("noop").save()


def pandas_pagerank_weighted(path: str) -> pd.DataFrame:
    li = pd.read_parquet(path)
    e = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    e = e[e["l_partkey_a"] < e["l_partkey_b"]]
    sup = e.groupby(["l_partkey_a", "l_partkey_b"]).size()
    und = sup[sup >= 2]
    edges = []
    for (a, b), w in und.items():
        edges.append((a, b, int(w)))
        edges.append((b, a, int(w)))
    wsum: dict = {}
    for s, _, w in edges:
        wsum[s] = wsum.get(s, 0) + w
    nodes = sorted({n for s, d, _ in edges for n in (s, d)})
    ranks = {n: 1_000_000 for n in nodes}
    for _ in range(5):
        new = {n: 150_000 for n in nodes}
        for s, d, w in edges:
            new[d] += (ranks[s] * 85 * w) // (100 * wsum[s])
        ranks = new
    return pd.DataFrame(sorted(ranks.items()), columns=["node", "rank_micro"])


def spark_triangles(spark, path: str) -> None:
    from social_media_data_pipeline_spark.functions import graph

    li = spark.read.parquet(path)
    edges = graph.project_bipartite(
        li, "l_orderkey", "l_partkey", min_support=2
    )
    graph.triangle_counts(edges).write.mode("overwrite").format("noop").save()


def pandas_triangles(path: str) -> pd.DataFrame:
    # the cell-validated reference_shootout baseline (vectorized
    # numpy orientation), reading the replicated scratch parquet
    import numpy as np

    li = pd.read_parquet(path)
    e = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    e = e[e["l_partkey_a"] < e["l_partkey_b"]]
    sup = e.groupby(["l_partkey_a", "l_partkey_b"]).size()
    und = sup[sup >= 2].reset_index()[["l_partkey_a", "l_partkey_b"]]
    und.columns = ["a", "b"]
    deg = pd.concat([und["a"], und["b"]]).value_counts()
    da = deg.loc[und["a"]].to_numpy()
    db = deg.loc[und["b"]].to_numpy()
    a = und["a"].to_numpy()
    b = und["b"].to_numpy()
    afirst = (da < db) | ((da == db) & (a < b))
    ore = pd.DataFrame(
        {
            "u": np.where(afirst, a, b),
            "v": np.where(afirst, b, a),
            "dv": np.where(afirst, db, da),
        }
    )
    wed = ore.merge(ore, on="u", suffixes=("1", "2"))
    wed = wed[
        (wed["dv1"] < wed["dv2"])
        | ((wed["dv1"] == wed["dv2"]) & (wed["v1"] < wed["v2"]))
    ]
    tri = wed.merge(
        ore.rename(columns={"u": "v1", "v": "v2"})[["v1", "v2"]],
        on=["v1", "v2"],
    )
    nodes = pd.concat([tri["u"], tri["v1"], tri["v2"]])
    return (
        nodes.value_counts()
        .rename("tri_cnt")
        .rename_axis("node")
        .reset_index()
        .sort_values("node")
        .reset_index(drop=True)
    )




# ------------------------------------------------------------- documents


def replicate_documents(spark, factor: int, path: str) -> None:
    """N disjoint corpus copies: doc_id shifted AND every word salted
    with the copy index — corpus tokens scale ×N (the scan cost both
    engines pay) and the vocabulary scales ×N too (the per-merge /
    per-shingle state), while copies never near-dup or share merges
    ACROSS copies beyond coincidental symbol pairs. This is the
    realistic growth direction for corpus trainers: more data brings
    more vocabulary (Heaps' law), not more repeats of one word."""
    docs = eio.read_table(spark, BASE_SF, "documents").select("doc_id", "text")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for k in range(factor):
        toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
        salted = F.array_join(
            F.transform(toks, lambda t: F.concat(t, F.lit(str(k)))), " "
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * n_doc)).alias("doc_id"),
                salted.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(path)


def spark_bpe80(spark, path: str) -> None:
    from social_media_data_pipeline_spark.functions import bpe

    docs = spark.read.parquet(path)
    # production head sizing (the defaults cover the vocabulary; the
    # REGISTERED query's head_words=24 truncation exists to exercise
    # the multi-round certification path on the 31-word toy vocab, and
    # under ×N vocabulary growth it would measure the recollection
    # pathology, not the family)
    bpe.bpe_train_batched(docs, num_merges=80).write.mode(
        "overwrite"
    ).format("noop").save()


def pandas_bpe80(path: str) -> pd.DataFrame:
    # the reference_shootout sequential trainer, reading the scratch
    from collections import Counter

    docs = pd.read_parquet(path)
    wf: Counter = Counter()
    for t in docs["text"]:
        for w in str(t or "").lower().strip().split():
            if w:
                wf[w] += 1
    words = {w: list(w) for w in wf}
    merges = []
    for rank in range(80):
        pc: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (l, r), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((rank, l, r, cnt))
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            words[w] = out
    return pd.DataFrame(
        merges, columns=["merge_rank", "lhs", "rhs", "pair_freq"]
    )


def spark_setsim_prefix(spark, path: str) -> None:
    from social_media_data_pipeline_spark.functions import sketches

    docs = spark.read.parquet(path)
    sketches.ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", shingle_k=3, threshold=0.6
    ).write.mode("overwrite").format("noop").save()


def pandas_setsim_prefix(path: str) -> pd.DataFrame:
    # single-node inverted-index exact Jaccard (the standard pandas
    # formulation: explode shingles, self-merge on shingle, pair
    # group-count, length-sum join) — same 3-word shingles, same
    # normalize+distinct semantics as functions.text.shingles
    import re as _re

    docs = pd.read_parquet(path)
    rows = []
    sizes = {}
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        toks = [w for w in _re.sub(r"\s+", " ", str(t or "").lower().strip()).split(" ") if w]
        if len(toks) >= 3:
            sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        sizes[doc_id] = len(sh)
        rows.extend((doc_id, s) for s in sh)
    inv = pd.DataFrame(rows, columns=["doc", "shingle"])
    m = inv.merge(inv, on="shingle", suffixes=("_a", "_b"))
    m = m[m["doc_a"] < m["doc_b"]]
    common = m.groupby(["doc_a", "doc_b"]).size().rename("common").reset_index()
    sz = pd.Series(sizes)
    na = sz.loc[common["doc_a"]].to_numpy()
    nb = sz.loc[common["doc_b"]].to_numpy()
    j = (common["common"] / (na + nb - common["common"])).round(6)
    out = common.assign(jaccard=j)
    return out[out["jaccard"] >= 0.6][["doc_a", "doc_b", "jaccard"]]




def spark_entity_resolution(spark, path: str) -> None:
    from social_media_data_pipeline_spark.operators.dedup import (
        entity_resolution_clusters,
    )

    docs = spark.read.parquet(path)
    entity_resolution_clusters(docs).write.mode("overwrite").format(
        "noop"
    ).save()


def pandas_entity_resolution(path: str) -> pd.DataFrame:
    # the cell-validated reference_shootout baseline, reading the
    # replicated scratch parquet
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "rs", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "reference_shootout.py")
    )
    rs = _ilu.module_from_spec(spec)
    spec.loader.exec_module(rs)
    docs = pd.read_parquet(path)
    jp = {(a, b) for a, b, _ in
          rs._pandas_jaccard_pairs(rs._pandas_shingle_sets(docs), 0.6)}
    import re as _re

    def norm_key(t):
        return _re.sub(r"\s+", " ", str(t or "").lower().strip())[:32]

    keyed = sorted(
        ((norm_key(t), d) for d, t in zip(docs["doc_id"], docs["text"]))
    )

    def lev(a, b):
        if a == b:
            return 0
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    sp = set()
    for i in range(len(keyed)):
        for j in range(i + 1, min(i + 5, len(keyed))):
            if lev(keyed[i][0], keyed[j][0]) <= 4:
                a, b = keyed[i][1], keyed[j][1]
                sp.add((min(a, b), max(a, b)))
    parent = {d: d for d in docs["doc_id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in jp | sp:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(d, find(d), d == find(d)) for d in docs["doc_id"]]
    return pd.DataFrame(
        rows, columns=["doc_id", "component", "is_canonical"]
    )


FAMILIES = {
    "winsorized": (replicate_events, spark_winsorized, pandas_winsorized,
                   "events"),
    "decayed": (replicate_events, spark_decayed, pandas_decayed, "events"),
    "pagerank_weighted": (replicate_lineitem, spark_pagerank_weighted,
                          pandas_pagerank_weighted, "lineitem"),
    # graph pair-join family: the full co-purchase cycle (projection +
    # degree-ordered triangle counting) both sides, same as the
    # registered query and its 0.20x shootout cell
    "triangles": (replicate_lineitem, spark_triangles, pandas_triangles,
                  "lineitem"),
    # BPE/recollection family: corpus tokens AND vocabulary both ×N —
    # pandas pays a single-threaded python token loop to build the
    # word-frequency table plus 80 eager merge passes over the vocab;
    # Spark aggregates the word table distributed and certifies merge
    # batches per round
    "bpe80": (replicate_documents, spark_bpe80, pandas_bpe80, "documents"),
    # candidate-join dedup family: the lossless prefix-filter join vs
    # the pandas inverted-index exact join on the same salted corpus
    "setsim_prefix": (replicate_documents, spark_setsim_prefix,
                      pandas_setsim_prefix, "documents"),
    # the r10 ER flagship: dual-channel candidates + verify +
    # incremental CC vs the cell-validated single-node union-find
    "entity_resolution": (replicate_documents, spark_entity_resolution,
                          pandas_entity_resolution, "documents"),
}


def main() -> int:
    wanted = sys.argv[1:] or list(FAMILIES)
    spark = get_spark(
        "crossover",
        extra_conf={
            "spark.driver.memory": os.environ.get("SMDP_SCALE_MEM", "24g")
        },
    )
    print(f"{'family':20} {'N':>4} {'rows':>10} {'pandas_s':>9} "
          f"{'spark_s':>8} {'ratio':>7}")
    for fam in wanted:
        rep, sfn, pfn, table = FAMILIES[fam]
        crossed = None
        for n in FACTORS:
            path = os.path.join(SCRATCH, f"{fam}_{n}")
            rep(spark, n, path)
            rows = spark.read.parquet(path).count()
            # Spark first (warms nothing pandas uses), then pandas
            t_spark, _ = _timed(lambda: sfn(spark, path))
            t_pandas, _ = _timed(lambda: pfn(path))
            ratio = t_pandas / t_spark if t_spark > 0 else float("inf")
            print(f"{fam:20} {n:>4} {rows:>10} {t_pandas:>9.2f} "
                  f"{t_spark:>8.2f} {ratio:>6.2f}x", flush=True)
            shutil.rmtree(path, ignore_errors=True)
            if ratio >= 1.0 and crossed is None:
                crossed = n
                break
        print(f"{fam}: crossover at " +
              (f"N={crossed}" if crossed else f">N={FACTORS[-1]} (not reached)"),
              flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
