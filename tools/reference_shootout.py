"""Single-node throughput shootout vs the reference's execution model.

The reference engine is eager pandas on one process (SURVEY.md §6 — it
publishes no benchmark numbers, so the honest comparison is: same
queries, same machine, same data; reference-style pandas implementation
vs this engine's Spark plans). Run:

    python tools/reference_shootout.py [sf_dir]

Prints per-query seconds for pandas (reference-style: full-file read +
eager chained operations, as `Preprocessor.run` / `plotting.py` do) and
Spark steady-state, plus the ratio.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd


def pandas_pricing_summary(sf_dir: str) -> pd.DataFrame:
    # reference style: read everything, eager groupby (pandas semantics
    # mirror plotting.py:50-67 group_and_aggregate chains)
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li[li["l_shipdate"] <= pd.Timestamp("1998-09-02")]
    li["disc_price"] = li["l_extendedprice"] * (1 - li["l_discount"])
    g = li.groupby(["l_returnflag", "l_linestatus"]).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "count"),
    )
    return g.reset_index().sort_values(["l_returnflag", "l_linestatus"])


def pandas_token_frequency(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs["text"].fillna("").str.lower().str.strip().str.split()
    counts = toks.explode().value_counts()
    return counts.head(50).reset_index()


def pandas_dedup_first_wins(sf_dir: str) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li.sort_values(["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"])
    return li.drop_duplicates(subset=["l_orderkey"], keep="first")[
        ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"]
    ]


def pandas_sample_per_year(sf_dir: str) -> pd.DataFrame:
    import hashlib

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    orders["order_year"] = orders["o_orderdate"].dt.year
    orders["h"] = orders["o_orderkey"].map(
        lambda k: hashlib.md5(f"42|{k}".encode()).hexdigest()
    )
    orders = orders.sort_values(["order_year", "h", "o_orderkey"])
    return orders.groupby("order_year").head(100)[
        ["order_year", "o_orderkey", "o_totalprice"]
    ]


def pandas_region_revenue(sf_dir: str) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    m = m.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m = m.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    m = m.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    m["order_year"] = m["o_orderdate"].dt.year
    return (
        m.groupby(["r_name", "order_year"])
        .agg(revenue=("rev", "sum"), n_items=("rev", "count"))
        .reset_index()
    )


def _pandas_norm(docs: pd.DataFrame) -> pd.Series:
    return (
        docs["text"]
        .fillna("")
        .str.lower()
        .str.strip()
        .str.replace(r"\s+", " ", regex=True)
    )


def pandas_docs_segment_dedup(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for doc_id, t in zip(docs["doc_id"], _pandas_norm(docs)):
        toks = t.split(" ")
        for p in range((len(toks) + 7) // 8):
            rows.append((doc_id, p, " ".join(toks[p * 8 : (p + 1) * 8])))
    seg = pd.DataFrame(rows, columns=["doc_id", "pos", "seg"])
    kept = seg.sort_values(["doc_id", "pos"]).drop_duplicates(
        subset=["seg"], keep="first"
    )
    return (
        kept.groupby("doc_id")
        .agg(clean_text=("seg", " ".join), n_kept=("seg", "count"))
        .reset_index()
    )


def pandas_docs_duplicate_spans(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for doc_id, t in zip(docs["doc_id"], _pandas_norm(docs)):
        toks = t.split(" ")
        for p in range(max(0, len(toks) - 7)):
            rows.append((doc_id, p, " ".join(toks[p : p + 8])))
    w = pd.DataFrame(rows, columns=["doc_id", "pos", "h"])
    nd = w.groupby("h")["doc_id"].nunique()
    m = w[w["h"].isin(set(nd[nd >= 2].index))].sort_values(["doc_id", "pos"])
    m = m.assign(grp=m["pos"] - m.groupby("doc_id").cumcount())
    spans = (
        m.groupby(["doc_id", "grp"])
        .agg(span_start=("pos", "min"), span_end=("pos", "max"), n_windows=("pos", "count"))
        .reset_index(drop=False)
    )
    spans["span_end"] += 7
    return spans.drop(columns=["grp"])


def pandas_docs_dsir_weights(sf_dir: str) -> pd.DataFrame:
    # eager single-process DSIR: hashed (uni+bi)gram buckets via md5,
    # smoothed target/raw log-ratio summed per doc
    import hashlib
    import math
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    B, alpha = 1024, 0.5

    def buckets(text):
        toks = str(text or "").lower().strip().split()
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B for g in grams
        ]

    doc_buckets = [buckets(t) for t in docs["text"]]
    is_target = (docs["lang"] == "en").tolist()
    r_cnt, t_cnt = Counter(), Counter()
    for bs, tgt in zip(doc_buckets, is_target):
        for b in bs:
            r_cnt[b] += 1
            if tgt:
                t_cnt[b] += 1
    R, T = sum(r_cnt.values()), sum(t_cnt.values())
    lam = {
        b: math.log(t_cnt[b] + alpha)
        - math.log(T + alpha * B)
        - math.log(r_cnt[b] + alpha)
        + math.log(R + alpha * B)
        for b in r_cnt
    }
    return pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "n_grams": [len(bs) for bs in doc_buckets],
            "dsir_logw": [round(sum(lam[b] for b in bs), 4) for bs in doc_buckets],
        }
    )


def pandas_docs_bigram_logprob(sf_dir: str) -> pd.DataFrame:
    import math
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok_lists = [str(t or "").lower().strip().split() for t in docs["text"]]
    big, ctx, uni = Counter(), Counter(), Counter()
    for toks in tok_lists:
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    N, V = sum(uni.values()), len(uni)
    out = []
    for doc_id, toks in zip(docs["doc_id"], tok_lists):
        trans = list(zip(toks, toks[1:]))
        if not trans:
            continue
        lp = [
            math.log(
                0.7 * big[(a, b)] / ctx[a]
                + (1.0 - 0.7) * (uni[b] + 0.5) / (N + 0.5 * V)
            )
            for a, b in trans
        ]
        out.append((doc_id, len(trans), round(sum(lp) / len(lp), 4)))
    return pd.DataFrame(out, columns=["doc_id", "n_transitions", "bigram_logprob"])


def pandas_docs_chunks(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    chunk, step = 24, 16
    rows = []
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        toks = str(t or "").lower().strip().split()
        n = len(toks)
        n_chunks = 1 + max(0, -(-(n - chunk) // step)) if n > chunk else 1
        for i in range(n_chunks):
            ctoks = toks[i * step : i * step + chunk]
            rows.append((doc_id, i, i * step, len(ctoks), " ".join(ctoks)))
    return pd.DataFrame(
        rows, columns=["id", "chunk_id", "token_start", "n_tokens", "chunk_text"]
    )


def pandas_docs_bpe_merges(sf_dir: str) -> pd.DataFrame:
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    wf = Counter()
    for t in docs["text"]:
        for w in str(t or "").lower().strip().split():
            if w:
                wf[w] += 1
    words = {w: list(w) for w in wf}
    merges = []
    for rank in range(20):
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
    return pd.DataFrame(merges, columns=["merge_rank", "lhs", "rhs", "pair_freq"])


def pandas_docs_bpe_merges_80(sf_dir: str) -> pd.DataFrame:
    # same sequential trainer, 80 merges (the r8 registered config; the
    # pandas side has no head/cutoff machinery to mirror — it is the
    # reference-style eager loop either way)
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    wf = Counter()
    for t in docs["text"]:
        for w in str(t or "").lower().strip().split():
            if w:
                wf[w] += 1
    words = {w: list(w) for w in wf}
    merges = []
    for rank in range(80):
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
    return pd.DataFrame(merges, columns=["merge_rank", "lhs", "rhs", "pair_freq"])


def pandas_docs_dup_window_frac(sf_dir: str) -> pd.DataFrame:
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_doc: dict = {}
    hash_docs: Counter = Counter()
    win_counts: dict = {}
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        toks = str(t or "").lower().strip().split()
        if len(toks) < 8:
            continue
        wins = Counter(
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        )
        win_counts[doc_id] = wins
        for h in wins:
            hash_docs[h] += 1
    rows = []
    for doc_id, wins in win_counts.items():
        total = sum(wins.values())
        dup = sum(n for h, n in wins.items() if hash_docs[h] >= 2)
        rows.append((doc_id, total, dup, round(dup / total, 6)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_windows", "n_dup_windows", "dup_frac"]
    ).sort_values("doc_id")


def pandas_embedding_semdedup(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    seed = ids % 50 == 0
    C, cid = V[seed], ids[seed]

    def _n(M):
        return np.sqrt((M * M).sum(axis=1))

    S = np.round((V @ C.T) / np.maximum(np.outer(_n(V), _n(C)), 1e-300), 6)
    best = S.argmax(axis=1)  # first max = lowest centroid id on ties
    cluster, c_cos = cid[best], S[np.arange(len(ids)), best]
    keep = np.ones(len(ids), dtype=bool)
    for cl in np.unique(cluster):
        m = np.where(cluster == cl)[0]
        sub = V[m]
        P = np.round((sub @ sub.T) / np.maximum(np.outer(_n(sub), _n(sub)), 1e-300), 6)
        for a_i, a in enumerate(m):
            for b_i, b in enumerate(m):
                if a == b or P[a_i, b_i] < 0.3:
                    continue
                if (c_cos[b], ids[b]) < (c_cos[a], ids[a]):
                    keep[a] = False
                    break
    return pd.DataFrame(
        {"vec_id": ids[keep], "cluster": cluster[keep], "c_cos": c_cos[keep]}
    )


def pandas_events_kmv_distinct(sf_dir: str) -> pd.DataFrame:
    import hashlib

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = []
    for et, g in ev.groupby("event_type"):
        hs = sorted(
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            for u in g["user_id"].unique()
        )
        if len(hs) < 64:
            est = float(len(hs))
        else:
            est = round(63.0 * float(1 << 60) / hs[63], 4)
        out.append((et, g["user_id"].nunique(), est))
    return pd.DataFrame(out, columns=["event_type", "exact_distinct", "distinct_est"])


def pandas_embedding_pq_topk(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    m, ksub = 8, 16
    dsub = V.shape[1] // m
    CB = V[ids < ksub].reshape(ksub, m, dsub).transpose(1, 0, 2)  # (m, ksub, dsub)
    codes = np.empty((len(ids), m), dtype=np.int64)
    for j in range(m):
        sub = V[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - CB[j][None, :, :]) ** 2).sum(axis=2).round(6)
        codes[:, j] = d.argmin(axis=1)
    rows = []
    for qi in np.where(ids < 5)[0]:
        terms = np.zeros(len(ids))
        for j in range(m):
            qsub = V[qi, j * dsub : (j + 1) * dsub]
            dt = ((qsub[None, :] - CB[j]) ** 2).sum(axis=1).round(6)
            terms += dt[codes[:, j]]
        adc = terms.round(4)
        mask = ids != ids[qi]
        order = np.lexsort((ids[mask], adc[mask]))[:5]
        nid, nadc = ids[mask][order], adc[mask][order]
        rows += [
            (ids[qi], nid[r], nadc[r], r + 1) for r in range(len(order))
        ]
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "adc_dist", "rank"])


def pandas_graph_pagerank(sf_dir: str) -> pd.DataFrame:
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    e = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    e = (
        pd.DataFrame(
            {"src": e["o_custkey"], "dst": 1_000_000_000 + e["l_suppkey"]}
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )
    deg = e.groupby("src").size()
    nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique())
    ranks = pd.Series(1_000_000, index=nodes, dtype="int64")
    for _ in range(5):
        contrib = (ranks.loc[e["src"]].to_numpy() * 85) // (
            100 * deg.loc[e["src"]].to_numpy()
        )
        recv = pd.Series(contrib, index=e["dst"].to_numpy()).groupby(level=0).sum()
        ranks = pd.Series(150_000, index=nodes, dtype="int64").add(
            recv, fill_value=0
        ).astype("int64")
    return (
        ranks.rename("rank_micro").rename_axis("node").reset_index().sort_values("node")
    )


def pandas_events_zorder_key(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_id", "ts", "user_id"]]
    day = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days.to_numpy()
    u = ev["user_id"].to_numpy().astype(np.int64) & 0xFFFF
    d = day.astype(np.int64) & 0xFFFF
    z = np.zeros(len(ev), dtype=np.int64)
    for b in range(16):
        z |= (((u >> b) & 1) << (2 * b)) | (((d >> b) & 1) << (2 * b + 1))
    out = pd.DataFrame(
        {"event_id": ev["event_id"], "user_id": ev["user_id"], "day": day, "zkey": z}
    )
    return out.sort_values("event_id")


def pandas_events_hll_distinct(sf_dir: str) -> pd.DataFrame:
    import hashlib
    import math

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "user_id"]]
    alpha_c = (0.7213 / (1 + 1.079 / 256)) * 256 * 256 * float(1 << 54)
    corr = [round(256 * math.log(256 / v), 4) for v in range(1, 257)]
    rows = []
    for et, g in ev.groupby("event_type"):
        regs = [0] * 256
        for u in g["user_id"].unique():
            h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            w = h // 256
            rho = 53 if w == 0 else 53 - w.bit_length()
            b = h % 256
            regs[b] = max(regs[b], rho)
        ssum = sum(1 << (54 - r) for r in regs)
        v = regs.count(0)
        raw = alpha_c / ssum
        est = round(corr[v - 1], 4) if (raw <= 640 and v > 0) else round(raw, 4)
        rows.append((et, est, g["user_id"].nunique()))
    return pd.DataFrame(rows, columns=["event_type", "distinct_est", "n_exact"])


def pandas_events_kmv_overlap(sf_dir: str) -> pd.DataFrame:
    import hashlib

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "user_id"]]
    sk, users = {}, {}
    for et, g in ev.groupby("event_type"):
        us = set(g["user_id"])
        users[et] = us
        sk[et] = sorted(
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) for u in us
        )[:64]
    rows = []
    types = sorted(sk)
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            u = sorted(set(sk[a]) | set(sk[b]))[:64]
            nu = len(u)
            theta = u[-1]
            shared = len([h for h in set(sk[a]) & set(sk[b]) if h <= theta])
            jacc = round(shared / nu, 6)
            if nu < 64:
                inter = float(shared)
            else:
                inter = round((shared / nu) * (63.0 * float(1 << 60) / u[63]), 4)
            rows.append((a, b, jacc, inter, len(users[a] & users[b])))
    return pd.DataFrame(
        rows, columns=["a", "b", "jaccard_est", "intersect_est", "n_exact"]
    )


def pandas_docs_training_shards(sf_dir: str) -> pd.DataFrame:
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "n_chars"]]
    docs = docs.assign(
        toks=docs["n_chars"].floordiv(4).clip(lower=1),
        skey=[
            int(hashlib.md5(f"shards-v1:{d}".encode()).hexdigest()[:8], 16)
            for d in docs["doc_id"]
        ],
    ).sort_values(["skey", "doc_id"])
    start = docs["toks"].cumsum() - docs["toks"]
    docs = docs.assign(shard=start // 2000)
    return docs[["doc_id", "shard"]].sort_values("doc_id")




def pandas_graph_pagerank_dangling(sf_dir: str) -> pd.DataFrame:
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    e = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    e = (
        pd.DataFrame(
            {"src": e["o_custkey"], "dst": 1_000_000_000 + e["l_suppkey"]}
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )
    deg = e.groupby("src").size()
    nodes = pd.Index(pd.concat([e["src"], e["dst"]]).unique())
    dangling = nodes.difference(pd.Index(deg.index))
    n = len(nodes)
    ranks = pd.Series(1_000_000, index=nodes, dtype="int64")
    for _ in range(5):
        dm = int(ranks.loc[dangling].sum())
        share = (dm * 85) // (100 * n)
        contrib = (ranks.loc[e["src"]].to_numpy() * 85) // (
            100 * deg.loc[e["src"]].to_numpy()
        )
        recv = pd.Series(contrib, index=e["dst"].to_numpy()).groupby(level=0).sum()
        ranks = pd.Series(150_000 + share, index=nodes, dtype="int64").add(
            recv, fill_value=0
        ).astype("int64")
    return (
        ranks.rename("rank_micro").rename_axis("node").reset_index().sort_values("node")
    )


def pandas_embedding_ivf_topk_multiprobe(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(X, axis=1)
    cmask = ids % 50 == 0
    cid, C, cn = ids[cmask], X[cmask], norms[cmask]
    sims = (X @ C.T) / np.maximum(norms[:, None] * cn[None, :], 1e-300)
    sims = np.round(sims, 6)
    order = np.lexsort((cid[None, :].repeat(len(ids), 0), -sims), axis=1)
    corpus_cell = cid[order[:, 0]]
    rows = []
    for qi in np.where(ids < 20)[0]:
        probes = cid[order[qi, :4]]
        cand = np.where(np.isin(corpus_cell, probes) & (ids != ids[qi]))[0]
        cos = np.round(
            (X[cand] @ X[qi])
            / np.maximum(norms[cand] * norms[qi], 1e-300),
            6,
        )
        top = np.lexsort((ids[cand], -cos))[:5]
        rows += [
            (ids[qi], ids[cand][top[r]], cos[top[r]], r + 1)
            for r in range(len(top))
        ]
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos", "rank"])


def pandas_docs_hybrid_rrf(sf_dir: str) -> pd.DataFrame:
    import math

    import numpy as np

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    toks = docs.assign(
        t=docs["text"].fillna("").str.lower().str.strip().str.split()
    )
    terms = ["spark", "window", "hash"]
    dl = toks["t"].str.len()
    n = len(docs)
    avgdl = dl.sum() / n
    scores = pd.Series(0.0, index=docs.index)
    for term in terms:
        tf = toks["t"].apply(lambda ws: sum(1 for w in ws if w == term))
        dfreq = int((tf > 0).sum())
        idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
        scores += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    bm = pd.DataFrame({"doc_id": docs["doc_id"], "bm25": scores.round(6)})
    bm = bm.sort_values(["bm25", "doc_id"], ascending=[False, True]).head(20)
    bm["lex_rrf"] = [1_000_000_000 // (60 + r) for r in range(1, len(bm) + 1)]

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(X, axis=1)
    qi = np.where(ids == 7)[0][0]
    cos = np.round((X @ X[qi]) / np.maximum(norms * norms[qi], 1e-300), 6)
    mask = ids != 7
    top = np.lexsort((ids[mask], -cos[mask]))[:20]
    sem = pd.DataFrame(
        {
            "doc_id": ids[mask][top],
            "sem_rrf": [1_000_000_000 // (60 + r) for r in range(1, len(top) + 1)],
        }
    )
    fused = bm[["doc_id", "lex_rrf"]].merge(sem, on="doc_id", how="outer").fillna(0)
    fused["rrf_micro"] = (fused["lex_rrf"] + fused["sem_rrf"]).astype("int64")
    fused = fused.sort_values(["rrf_micro", "doc_id"], ascending=[False, True]).head(10)
    fused["rank"] = range(1, len(fused) + 1)
    return fused[["doc_id", "rrf_micro", "rank"]]


def pandas_docs_temperature_mixture(sf_dir: str) -> pd.DataFrame:
    import hashlib
    import math

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "source"]]
    hist = docs.groupby("source").size()
    s = {g: math.floor(math.sqrt(n) * 1_000_000.0 + 0.5) for g, n in hist.items()}
    big_n, big_s = int(hist.sum()), sum(s.values())
    th = {
        g: min(1_000_000, (500_000 * big_n * s[g]) // (big_s * int(hist[g])))
        for g in hist.index
    }
    draw = docs["doc_id"].map(
        lambda i: int(hashlib.md5(f"temp-mix-v1:{i}".encode()).hexdigest()[:8], 16)
        % 1_000_000
    )
    keep = draw < docs["source"].map(th)
    return docs[keep].sort_values("doc_id")



def pandas_docs_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]

    def norm_toks(t):
        return [w for w in (t or "").lower().strip().split() if w]

    def shingle_set(t):
        ws = norm_toks(t)
        if len(ws) >= 3:
            return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        return {" ".join(ws)}

    def sig(sh):
        mins = []
        for i in range(16):
            j, off = divmod(i, 4)
            mins.append(
                min(
                    hashlib.md5(f"{j}|{x}".encode()).hexdigest()[off * 8 : off * 8 + 8]
                    for x in sh
                )
            )
        return mins

    def bands(sg):
        return [
            hashlib.md5("|".join(sg[b * 4 : b * 4 + 4]).encode()).hexdigest()
            for b in range(4)
        ]

    new = docs[docs["doc_id"] % 5 == 0]
    hist = docs[docs["doc_id"] % 5 != 0]
    hist_bands = {}
    hist_sh = {}
    for _, r in hist.iterrows():
        sh = shingle_set(r["text"])
        hist_sh[r["doc_id"]] = sh
        for bi, bh in enumerate(bands(sig(sh))):
            hist_bands.setdefault((bi, bh), set()).add(r["doc_id"])
    rows = []
    for _, r in new.iterrows():
        sh = shingle_set(r["text"])
        cands = set()
        for bi, bh in enumerate(bands(sig(sh))):
            cands |= hist_bands.get((bi, bh), set())
        best = None
        for h in cands:
            hs = hist_sh[h]
            j = round(len(sh & hs) / len(sh | hs), 6)
            if j >= 0.2 and (best is None or (j, -h) > (best[1], -best[0])):
                best = (h, j)
        if best:
            rows.append((r["doc_id"], best[0], best[1]))
    return pd.DataFrame(rows, columns=["doc_id", "dup_of", "jaccard"]).sort_values("doc_id")


def pandas_docs_gopher_rules(sf_dir: str) -> pd.DataFrame:
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    rows = []
    for _, r in docs.iterrows():
        t = r["text"] or ""
        ws = [w for w in t.lower().strip().split() if w]
        wc = len(ws)
        mean = round(sum(len(w) for w in ws) / wc, 6) if wc else 0.0
        nsym = len(re.findall(r"#|\.\.\.|…", t))
        sym = round(nsym / wc, 6) if wc else 0.0
        alpha = round(sum(1 for w in ws if re.search("[a-z]", w)) / wc, 6) if wc else 0.0
        nstop = len(set(ws) & stops)
        passes = (
            50 <= wc <= 100000
            and 3.0 <= mean <= 10.0
            and sym <= 0.1
            and alpha >= 0.8
            and nstop >= 2
        )
        rows.append((r["doc_id"], wc, mean, alpha, nstop, passes))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "word_count", "mean_word_len", "alpha_frac",
                 "n_stop_words", "passes"],
    ).sort_values("doc_id")


def pandas_docs_curation_report(sf_dir: str) -> pd.DataFrame:
    import hashlib
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "source", "text"]]
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    recs = []
    for _, r in docs.iterrows():
        t = r["text"] or ""
        ws = [w for w in t.lower().strip().split() if w]
        wc = len(ws)
        mean = round(sum(len(w) for w in ws) / wc, 6) if wc else 0.0
        nsym = len(re.findall(r"#|\.\.\.|…", t))
        sym = round(nsym / wc, 6) if wc else 0.0
        alpha = round(sum(1 for w in ws if re.search("[a-z]", w)) / wc, 6) if wc else 0.0
        nstop = len(set(ws) & stops)
        gpass = (
            50 <= wc <= 100000 and 3.0 <= mean <= 10.0 and sym <= 0.1
            and alpha >= 0.8 and nstop >= 2
        )
        nows = len(re.sub(r"\s+", "", t))
        q = round(
            min(len(t) / 500.0, 1.0) * 0.5
            + (1.0 if 3 <= nows / max(wc, 1) <= 10 else 0.5) * 0.3
            + (1 - (len(t) - len(re.sub(r"[^\w\s]", "", t))) / max(len(t), 1)) * 0.2,
            6,
        )
        h = hashlib.md5(t.lower().strip().encode()).hexdigest()
        recs.append((r["source"], h, int(gpass), q, wc))
    df = pd.DataFrame(recs, columns=["source", "h", "gp", "q", "t"])
    out = df.groupby("source").agg(
        n_docs=("h", "size"),
        n_exact_dups=("h", lambda x: len(x) - x.nunique()),
        n_gopher_pass=("gp", "sum"),
        mean_quality=("q", lambda x: round(x.mean(), 6)),
        total_tokens=("t", "sum"),
    ).reset_index()
    return out.sort_values("source")


def pandas_graph_triangles(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
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
        ore.rename(columns={"u": "v1", "v": "v2"})[["v1", "v2"]], on=["v1", "v2"]
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


def pandas_graph_kcore(sf_dir: str) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    e = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    e = e[e["l_partkey_a"] < e["l_partkey_b"]]
    sup = e.groupby(["l_partkey_a", "l_partkey_b"]).size()
    und = sup[sup >= 2].reset_index()[["l_partkey_a", "l_partkey_b"]]
    und.columns = ["a", "b"]
    while True:
        deg = pd.concat([und["a"], und["b"]]).value_counts()
        keep = set(deg[deg >= 2].index)
        nxt = und[und["a"].isin(keep) & und["b"].isin(keep)]
        if len(nxt) == len(und):
            break
        und = nxt
    out = (
        pd.concat([und["a"], und["b"]])
        .value_counts()
        .rename("deg")
        .rename_axis("node")
        .reset_index()
        .sort_values("node")
        .reset_index(drop=True)
    )
    return out


def pandas_orders_join_size_est(sf_dir: str) -> pd.DataFrame:
    import hashlib

    def keep(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) < (1 << 60) // 8

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")[["o_orderkey"]]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey"]]
    sa = orders[orders["o_orderkey"].map(keep)].groupby("o_orderkey").size()
    sb = li[li["l_orderkey"].map(keep)].groupby("l_orderkey").size()
    joined = pd.concat([sa.rename("na"), sb.rename("nb")], axis=1, join="inner")
    exact = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey").shape[0]
    return pd.DataFrame(
        {
            "sampled_keys": [len(joined)],
            "est_pairs": [int((joined["na"] * joined["nb"]).sum()) * 8],
            "exact_pairs": [exact],
        }
    )


def pandas_events_salted_join(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_id", "user_id", "value"]]
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    out = ev.merge(cust, left_on="user_id", right_on="c_custkey")
    return (
        out.rename(columns={"c_mktsegment": "segment"})[
            ["event_id", "user_id", "segment", "value"]
        ]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def pandas_docs_pack_bfd(sf_dir: str) -> pd.DataFrame:
    import bisect
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "n_chars"]]
    docs["n_tokens"] = (docs["n_chars"] // 4).clip(lower=1)
    docs["shard"] = [
        int(hashlib.md5(f"bestfit-v1|{i}".encode()).hexdigest()[:15], 16) % 4
        for i in docs["doc_id"]
    ]
    B = 512
    out = []
    for shard, grp in docs.groupby("shard"):
        grp = grp.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        open_bins: list[tuple[int, int]] = []
        nb = 0
        for i, t in zip(grp["doc_id"], grp["n_tokens"]):
            t = int(t)
            if t > B:
                out.append((i, t, shard, nb, True))
                nb += 1
                continue
            j = bisect.bisect_left(open_bins, (t, -1))
            if j < len(open_bins):
                rem, b = open_bins.pop(j)
                if rem - t > 0:
                    bisect.insort(open_bins, (rem - t, b))
            else:
                b = nb
                nb += 1
                if B - t > 0:
                    bisect.insort(open_bins, (B - t, b))
            out.append((i, t, shard, b, False))
    return (
        pd.DataFrame(out, columns=["doc_id", "n_tokens", "shard", "bin_id", "oversize"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def pandas_docs_pack_bfd_stats(sf_dir: str) -> pd.DataFrame:
    packed = pandas_docs_pack_bfd(sf_dir)
    B = 512
    rows = []
    for shard, g in packed.groupby("shard"):
        ok = g[~g["oversize"]]
        bins_used = ok["bin_id"].nunique()
        packed_tokens = int(ok["n_tokens"].sum())
        waste = round(1.0 - packed_tokens / (bins_used * float(B)), 6) if bins_used else 0.0
        rows.append(
            (shard, len(g), int(g["n_tokens"].sum()), bins_used,
             int(g["oversize"].sum()), packed_tokens, waste)
        )
    return pd.DataFrame(
        rows,
        columns=["shard", "n_docs", "total_tokens", "bins_used",
                 "n_oversize", "packed_tokens", "waste_frac"],
    ).sort_values("shard").reset_index(drop=True)


def pandas_graph_lpa(sf_dir: str) -> pd.DataFrame:
    from collections import Counter, defaultdict

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    e = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    e = e[e["l_partkey_a"] < e["l_partkey_b"]]
    sup = e.groupby(["l_partkey_a", "l_partkey_b"]).size()
    und = sup[sup >= 2].index.tolist()
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    labels = {n: n for n in nbrs}
    for _ in range(4):
        new = {}
        for n in nbrs:
            cnt = Counter(labels[m] for m in nbrs[n])
            cnt[labels[n]] += 1  # self-vote
            new[n] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        if new == labels:
            break
        labels = new
    return (
        pd.DataFrame(sorted(labels.items()), columns=["node", "label"])
        .reset_index(drop=True)
    )


def pandas_events_winsorized(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "value"]]
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
    ).sort_values("event_type").reset_index(drop=True)


def pandas_events_robust_anomalies(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_type", "value"]]
    out = []
    for et, g in ev.groupby("event_type"):
        med = g["value"].quantile(0.5, interpolation="linear")
        mad = (g["value"] - med).abs().quantile(0.5, interpolation="linear")
        n_anom = int(((g["value"] - med).abs() > 3.5 * 1.4826 * mad).sum())
        out.append((et, round(med, 6), round(mad, 6), n_anom, len(g)))
    return pd.DataFrame(
        out, columns=["event_type", "med", "mad", "n_anom", "n"]
    ).sort_values("event_type").reset_index(drop=True)


def pandas_events_decayed_engagement(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["user_id", "event_type", "ts", "value"]]
    days = (pd.Timestamp("2024-02-01") - ev["ts"].dt.normalize()).dt.days
    ev = ev[days >= 0].assign(__d=days[days >= 0] // 7)
    ev["__m"] = (ev["value"] * (0.5 ** ev["__d"]) * 1e6).round().astype("int64")
    out = (
        ev.groupby(["user_id", "event_type"])
        .agg(decayed_micro=("__m", "sum"), n=("__m", "count"))
        .reset_index()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    return out


def pandas_graph_pagerank_weighted(sf_dir: str) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    e = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    e = e[e["l_partkey_a"] < e["l_partkey_b"]]
    sup = e.groupby(["l_partkey_a", "l_partkey_b"]).size()
    und = sup[sup >= 2]
    edges = []
    for (a, b), w in und.items():
        edges.append((a, b, int(w)))
        edges.append((b, a, int(w)))
    wsum = {}
    for s, _, w in edges:
        wsum[s] = wsum.get(s, 0) + w
    nodes = sorted({n for s, d, _ in edges for n in (s, d)})
    ranks = {n: 1_000_000 for n in nodes}
    for _ in range(5):
        new = {n: 150_000 for n in nodes}
        for s, d, w in edges:
            new[d] += (ranks[s] * 85 * w) // (100 * wsum[s])
        ranks = new
    return pd.DataFrame(
        sorted(ranks.items()), columns=["node", "rank_micro"]
    ).reset_index(drop=True)


def pandas_docs_ccnet_buckets(sf_dir: str) -> pd.DataFrame:
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    scores = pandas_docs_bigram_logprob(sf_dir)
    sl = scores.merge(docs[["doc_id", "lang"]], on="doc_id")
    sl["lm_score_q"] = (sl["bigram_logprob"] * 10000).round().astype("int64")
    out = []
    for lang, grp in sl.groupby("lang"):
        n = len(grp)
        cnt = Counter(grp["lm_score_q"])
        cum, t_head, t_mid = 0, None, None
        for v in sorted(cnt, reverse=True):
            cum += cnt[v]
            if t_head is None and cum >= (n + 2) // 3:
                t_head = v
            if t_mid is None and cum >= (2 * n + 2) // 3:
                t_mid = v
        for doc_id, q in zip(grp["doc_id"], grp["lm_score_q"]):
            b = "head" if q >= t_head else ("middle" if q >= t_mid else "tail")
            out.append((doc_id, lang, q, b))
    return (
        pd.DataFrame(out, columns=["doc_id", "lang", "lm_score_q", "bucket"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def pandas_docs_contamination_frac(sf_dir: str) -> pd.DataFrame:
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bkt = docs["doc_id"].map(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 20
    )
    norm = _pandas_norm(docs)
    grams = {}
    for doc_id, b, t in zip(docs["doc_id"], bkt, norm):
        toks = t.split(" ") if t else []
        ws = {
            hashlib.md5(" ".join(toks[i : i + 8]).encode()).hexdigest()
            for i in range(len(toks) - 7)
        }
        if ws:
            grams[doc_id] = (b, ws)
    ev = set()
    for b, ws in grams.values():
        if b == 0:
            ev |= ws
    out = []
    for doc_id, (b, ws) in grams.items():
        if b == 0:
            continue
        hit = len(ws & ev)
        out.append((doc_id, len(ws), hit, round(hit / len(ws), 6)))
    return (
        pd.DataFrame(
            out, columns=["doc_id", "n_grams", "n_hit", "contamination_frac"]
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def pandas_docs_oov_rate(sf_dir: str) -> pd.DataFrame:
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = [str(t or "").lower().strip().split() for t in docs["text"]]
    uni = Counter()
    for ts in toks:
        uni.update(ts if ts else [""])
    vocab = {
        t for t, _n in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    }
    per = {}
    for src_name, ts in zip(docs["source"], toks):
        cnt = per.setdefault(src_name, Counter())
        cnt.update(ts if ts else [""])
    out = []
    for g in sorted(per):
        cnt = per[g]
        n_tok = sum(cnt.values())
        n_oov = sum(c for t, c in cnt.items() if t not in vocab)
        n_typ = len(cnt)
        n_oov_t = sum(1 for t in cnt if t not in vocab)
        out.append((g, n_tok, n_oov, round(n_oov / n_tok, 6), n_typ, n_oov_t))
    return pd.DataFrame(
        out,
        columns=[
            "source", "n_tokens", "n_oov_tokens", "oov_rate",
            "n_types", "n_oov_types",
        ],
    )


def pandas_docs_decontaminate_spans(sf_dir: str) -> pd.DataFrame:
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bkt = docs["doc_id"].map(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 20
    )
    norm = _pandas_norm(docs)
    k = 4
    ev = set()
    train = []
    for doc_id, b, t in zip(docs["doc_id"], bkt, norm):
        toks = t.split(" ") if t else []
        ws = [
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
            for i in range(len(toks) - (k - 1))
        ]
        if not ws:
            continue
        if b == 0:
            ev.update(ws)
        else:
            train.append((doc_id, ws))
    out = []
    for doc_id, ws in train:
        run_start, prev = None, None
        for pos, h in enumerate(ws):
            if h in ev:
                if run_start is None:
                    run_start = pos
                prev = pos
            elif run_start is not None:
                out.append((doc_id, run_start, prev + k - 1, prev - run_start + 1))
                run_start, prev = None, None
        if run_start is not None:
            out.append((doc_id, run_start, prev + k - 1, prev - run_start + 1))
    return (
        pd.DataFrame(
            out, columns=["doc_id", "span_start", "span_end", "n_windows"]
        )
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )




def pandas_minhash_band_plan(sf_dir: str) -> pd.DataFrame:
    from social_media_data_pipeline_spark.functions.sketches import (
        lsh_band_plan_rows,
    )

    rows = lsh_band_plan_rows()
    out = []
    for b, r, i, imp, ch in rows:
        t = i / 20.0
        p = round(1.0 - (1.0 - t ** r) ** b, 6)
        out.append((b, r, round(t, 6), p, round(imp, 6), ch))
    return pd.DataFrame(
        out,
        columns=["bands", "rows_per_band", "t", "p_detect",
                 "implied_threshold", "chosen"],
    ).sort_values(["bands", "t"]).reset_index(drop=True)


def pandas_events_drift_scores(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    ev["bin"] = (ev["value"] // 10.0).astype("int64")
    counts = (
        ev.groupby(["event_type", "day", "bin"]).size().rename("c")
        .reset_index()
    )
    out = []
    for et, g in counts.groupby("event_type"):
        base: dict = {}
        n_base = 0
        for day, gd in g.groupby("day"):
            n_day = int(gd["c"].sum())
            if n_base > 0:
                present = sum(
                    abs(int(c) * n_base - base.get(b, 0) * n_day)
                    for b, c in zip(gd["bin"], gd["c"])
                )
                b_present = sum(base.get(b, 0) for b in gd["bin"])
                num = present + (n_base - b_present) * n_day
                out.append((et, day, n_day, n_base,
                            round(num / (n_day * n_base), 6)))
            for b, c in zip(gd["bin"], gd["c"]):
                base[b] = base.get(b, 0) + int(c)
            n_base += n_day
    return pd.DataFrame(
        out, columns=["event_type", "day", "n_day", "n_base", "l1_drift"]
    )


def _pandas_shingle_sets(docs: pd.DataFrame, k: int = 3) -> dict:
    import re as _re

    out = {}
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        toks = [w for w in _re.sub(r"\s+", " ",
                str(t or "").lower().strip()).split(" ") if w]
        if len(toks) >= k:
            out[doc_id] = {
                " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
            }
        else:
            out[doc_id] = {" ".join(toks)}
    return out


def _pandas_jaccard_pairs(sets: dict, threshold: float) -> list:
    inv: dict = {}
    for d, sh in sets.items():
        for s in sh:
            inv.setdefault(s, []).append(d)
    from collections import Counter

    common: Counter = Counter()
    for docs_list in inv.values():
        docs_list.sort()
        for i in range(len(docs_list)):
            for j in range(i + 1, len(docs_list)):
                common[(docs_list[i], docs_list[j])] += 1
    pairs = []
    for (a, b), c in common.items():
        j = round(c / (len(sets[a]) + len(sets[b]) - c), 6)
        if j >= threshold:
            pairs.append((a, b, j))
    return pairs


def pandas_docs_split_leakage(sf_dir: str) -> pd.DataFrame:
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = _pandas_jaccard_pairs(_pandas_shingle_sets(docs), 0.6)

    def split_of(doc_id):
        b = int(hashlib.md5(f"split-v1:{doc_id}".encode()).hexdigest()[:8],
                16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    out = []
    for a, b, j in pairs:
        sa, sb = split_of(a), split_of(b)
        if (sa == "train") != (sb == "train"):
            if sa == "train":
                out.append((a, b, sb, j))
            else:
                out.append((b, a, sa, j))
    return pd.DataFrame(
        out, columns=["train_id", "holdout_id", "holdout_split", "jaccard"]
    ).sort_values(["train_id", "holdout_id"]).reset_index(drop=True)


def pandas_docs_entity_resolution(sf_dir: str) -> pd.DataFrame:
    import re as _re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    jp = {(a, b) for a, b, _ in
          _pandas_jaccard_pairs(_pandas_shingle_sets(docs), 0.6)}

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
    ).sort_values("doc_id").reset_index(drop=True)


def pandas_docs_token_fertility(sf_dir: str) -> pd.DataFrame:
    # sequential trainer (the shared bpe baseline) + eager encode
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    wf: Counter = Counter()
    doc_words = {}
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        ws = [w for w in str(t or "").lower().strip().split() if w]
        doc_words[doc_id] = ws
        for w in ws:
            wf[w] += 1
    words = {w: list(w) for w in wf}
    for rank in range(20):
        pc: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (l, r), _ = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        for w, syms in words.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            words[w] = out
    lang_of = dict(zip(docs["doc_id"], docs["lang"]))
    agg: dict = {}
    for doc_id, ws in doc_words.items():
        if not ws:
            continue
        lang = lang_of[doc_id]
        d = agg.setdefault(lang, [0, 0, 0])
        d[0] += 1
        d[1] += len(ws)
        d[2] += sum(len(words[w]) for w in ws)
    rows = [
        (lang, d[0], d[1], d[2], round(d[2] / d[1], 6))
        for lang, d in sorted(agg.items())
    ]
    return pd.DataFrame(
        rows,
        columns=["lang", "n_docs", "n_words", "n_bpe_tokens", "fertility"],
    )


PANDAS_IMPLS = {
    "pricing_summary": pandas_pricing_summary,
    "region_revenue": pandas_region_revenue,
    "token_frequency": pandas_token_frequency,
    "dedup_first_wins": pandas_dedup_first_wins,
    "sample_per_year": pandas_sample_per_year,
    "docs_segment_dedup": pandas_docs_segment_dedup,
    "docs_duplicate_spans": pandas_docs_duplicate_spans,
    "docs_dsir_weights": pandas_docs_dsir_weights,
    "docs_bigram_logprob": pandas_docs_bigram_logprob,
    "docs_chunks": pandas_docs_chunks,
    "docs_bpe_merges": pandas_docs_bpe_merges,
    "embedding_semdedup": pandas_embedding_semdedup,
    "events_kmv_distinct": pandas_events_kmv_distinct,
    "embedding_pq_topk": pandas_embedding_pq_topk,
    "graph_pagerank": pandas_graph_pagerank,
    "events_zorder_key": pandas_events_zorder_key,
    "events_hll_distinct": pandas_events_hll_distinct,
    "events_kmv_overlap": pandas_events_kmv_overlap,
    "docs_training_shards": pandas_docs_training_shards,
    "graph_pagerank_dangling": pandas_graph_pagerank_dangling,
    "embedding_ivf_topk_multiprobe": pandas_embedding_ivf_topk_multiprobe,
    "docs_hybrid_rrf": pandas_docs_hybrid_rrf,
    "docs_temperature_mixture": pandas_docs_temperature_mixture,
    "docs_incremental_dedup": pandas_docs_incremental_dedup,
    "docs_gopher_rules": pandas_docs_gopher_rules,
    "docs_curation_report": pandas_docs_curation_report,
    "docs_bpe_merges_80": pandas_docs_bpe_merges_80,
    "docs_dup_window_frac": pandas_docs_dup_window_frac,
    "graph_triangles": pandas_graph_triangles,
    "graph_kcore": pandas_graph_kcore,
    "docs_ccnet_buckets": pandas_docs_ccnet_buckets,
    "docs_contamination_frac": pandas_docs_contamination_frac,
    "docs_oov_rate": pandas_docs_oov_rate,
    "docs_decontaminate_spans": pandas_docs_decontaminate_spans,
    "docs_pack_bfd": pandas_docs_pack_bfd,
    "events_salted_join": pandas_events_salted_join,
    "orders_join_size_est": pandas_orders_join_size_est,
    "docs_pack_bfd_stats": pandas_docs_pack_bfd_stats,
    "graph_lpa": pandas_graph_lpa,
    "events_winsorized": pandas_events_winsorized,
    "events_robust_anomalies": pandas_events_robust_anomalies,
    "events_decayed_engagement": pandas_events_decayed_engagement,
    "graph_pagerank_weighted": pandas_graph_pagerank_weighted,
    "minhash_band_plan": pandas_minhash_band_plan,
    "events_drift_scores": pandas_events_drift_scores,
    "docs_split_leakage": pandas_docs_split_leakage,
    "docs_entity_resolution": pandas_docs_entity_resolution,
    "docs_token_fertility": pandas_docs_token_fertility,
}

#: queries whose Spark side runs jobs during plan construction — the
#: honest Spark number is a full construct+write cycle
ITERATIVE_IMPLS = {"docs_entity_resolution", "docs_token_fertility", "graph_kcore", "graph_lpa", "graph_pagerank_weighted", "docs_bpe_merges", "docs_bpe_merges_80", "embedding_pq_topk", "graph_pagerank", "graph_pagerank_dangling", "docs_temperature_mixture", "docs_incremental_dedup", "graph_triangles", "docs_ccnet_buckets"}


def main() -> None:
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = {q for q in os.environ.get("SHOOTOUT_ONLY", "").split(",") if q}
    import __spark_entry__ as entry_mod
    from social_media_data_pipeline_spark.session import get_spark

    spark = get_spark("shootout")
    qs = entry_mod.queries()
    print(f"{'query':20} {'pandas_s':>9} {'spark_s':>8} {'ratio':>7}")
    for name, pfn in PANDAS_IMPLS.items():
        if only and name not in only:
            continue
        t0 = time.time()
        pfn(sf_dir)
        t_pandas = time.time() - t0
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # warm codegen
        t0 = time.time()
        if name in ITERATIVE_IMPLS:
            df2 = qs[name](spark, sf_dir)
            df2.write.mode("overwrite").format("noop").save()
        else:
            df.write.mode("overwrite").format("noop").save()
        t_spark = time.time() - t0
        ratio = t_pandas / t_spark if t_spark > 0 else float("inf")
        print(f"{name:20} {t_pandas:>9.3f} {t_spark:>8.3f} {ratio:>6.2f}x")


if __name__ == "__main__":
    main()
