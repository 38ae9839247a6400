"""Distributed connected components — near-dup cluster resolution.

After candidate generation (MinHash-LSH / SimHash / Jaccard pairs), the
dedup pipeline needs CLUSTERS: every document labeled with its
component, so one canonical survivor per cluster can be kept. This is
iterative min-label propagation (the DataFrame form of the map-reduce
CC algorithms): each round every node takes the min label in its
neighborhood; converges in O(graph diameter) rounds — near-dup clusters
are shallow (pairs share bands), so a handful of rounds in practice.

Scale shape: each round is one shuffle keyed by node id; lineage is cut
per round (localCheckpoint) so plans don't grow; convergence is an
`observe` metric folded into the SAME action that materializes the
round's checkpoint — one Spark job per round, never a collect of labels
and no second convergence-count job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, component) for every node in `edges`; component = min node
    id reachable from the node (deterministic labeling)."""
    raw = edges.selectExpr(f"{src} as a", f"{dst} as b")
    if checkpoint:
        # edges usually arrive as a LAZY candidate-generation pipeline
        # (MinHash-LSH banding, simhash blocking, ...). Materialize the
        # (small) pair list BEFORE symmetrizing: the union of a lazy
        # plan with its own swap executes the whole candidate pipeline
        # TWICE (exchange reuse does not span the union's two scans),
        # which measured as the dominant cost of the whole CC query
        # (~6 s of a 9.5 s construct at sf0.1). Checkpoint first, then
        # the union/distinct runs over the materialized rows.
        raw = raw.localCheckpoint(eager=True)
    sym = raw.unionByName(raw.selectExpr("b as a", "a as b")).distinct()
    if checkpoint:
        # also pin the symmetrized list: it joins into EVERY round's job.
        # A b-keyed persist pin (pin_stats(sym, key="b")) was A/B-measured
        # in r13 and REJECTED: +0.6 s per cycle (dedup_clusters 2.30 →
        # 2.93 median) — the b-keyed exchange + cache build never pays
        # back because every round broadcasts the (small) labels side,
        # leaving sym's partitioning unused. Revisit only where labels
        # grow past broadcast size.
        sym = sym.localCheckpoint(eager=True)
    # seed component = min(node, min neighbor) — exactly what round 0's
    # propagate would compute from the identity labeling, but as ONE
    # aggregate instead of a join + aggregate; depth-1 clusters (the
    # common near-dup case) then converge with a single confirming round
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__nbr_min"))
        .select(
            "node", F.least(F.col("node"), F.col("__nbr_min")).alias("component")
        )
    )
    for i in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("a", "node")
        )
        # `prev` rides along so the convergence delta needs no re-join
        # against the previous round's labels
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("component").alias("prev"),
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: component ← label(component); halves label-chain
        # depth each round → O(log diameter) total iterations
        parents = stepped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_component")
        )
        jumped = (
            stepped.join(parents, stepped.component == parents.p_node, "left")
            .select(
                "node",
                "prev",
                F.least(
                    F.col("component"), F.coalesce(F.col("p_component"), F.col("component"))
                ).alias("component"),
            )
        )
        delta_metric = F.sum(
            F.when(F.col("component") != F.col("prev"), 1).otherwise(0)
        ).alias("delta")
        if checkpoint:
            # the delta is an observe metric collected BY the checkpoint's
            # own materialization — one job does propagate+jump+converge
            obs = Observation(f"cc_round_{i}")
            observed = jumped.observe(obs, delta_metric).select("node", "component")
            labels = observed.localCheckpoint(eager=True)
            delta = obs.get["delta"]
        else:
            # no materializing action without checkpointing — pay one
            # aggregate job (still never a label collect)
            delta = jumped.agg(delta_metric).collect()[0]["delta"]
            labels = jumped.select("node", "component")
        if not delta:
            break
    if checkpoint:
        # hand consumers a STATS-BEARING final labeling: the per-round
        # checkpoints (kept above — the loop needs lineage truncation)
        # leave `labels` an UnknownPartitioning RDD scan with default
        # stats, so every consumer join (docs ⨝ labels in
        # dedup_clusters and friends) planned a two-sided
        # Exchange+Sort sort-merge join even when labels is tiny.
        # Persisting the final scan costs one count job over already-
        # materialized rows and lets the planner read the true size —
        # broadcast when small, sort-merge when corpus-sized.
        from social_media_data_pipeline_spark.io import pin_stats

        labels = pin_stats(labels)
    return labels


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Full cluster-dedup resolution: (doc_id, component, is_canonical).

    Docs with no near-dup edge form singleton components. Canonical =
    min id in the component (same deterministic survivor rule as
    `dedup.dedup_exact_content`).
    """
    cc = connected_components(pairs, src="id_a", dst="id_b")
    out = docs.select(F.col(id_col)).join(
        cc.withColumnRenamed("node", id_col), id_col, "left"
    )
    out = out.withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    return out.withColumn("is_canonical", F.col(id_col) == F.col("component"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    checkpoint: bool = True,
    dangling: str = "drop",
    weight_col: str | None = None,
) -> DataFrame:
    """Bounded-round PageRank over a directed edge list → (node,
    rank_micro).

    Arithmetic is EXACT integer micro-units (rank 1.0 ≡ 1_000_000, the
    `functions/kmeans.py` convention): each round a node receives
        150_000 + Σ_{u→v} (rank(u) * 85) div (100 * outdeg(u))
    — the damping-0.85 update with per-node teleport mass (the
    "R(v) = (1-d) + d·Σ R(u)/deg(u)" n-scaled formulation). Integer
    div/sum are associative and order-independent, so the whole run
    replays bit-for-bit in ANSI SQL (`build_pagerank_sql`) — the
    property the float formulation can never give a differential
    oracle.

    `dangling`: "drop" (the lean simplification — sink mass leaves the
    system, ranks undershoot n·1e6 on graphs with sinks) or
    "redistribute" (textbook PageRank: each round the summed rank of
    out-degree-0 nodes is added back uniformly,
    `(dangling_sum * 85) div (100 * n)` per node, so total mass stays
    ≈ n·1e6 up to integer-truncation loss bounded by (|E|+2n)/0.15
    micro-units — the mass-conservation property test pins this).
    The per-round dangling sum is an `observe` metric collected by the
    checkpoint's own materialization (the `connected_components` delta
    pattern): no extra job, 1 scalar to the driver per round.

    Scale shape: the edge list (the 100 TB side) is deduped, hash-
    partitioned by `src` and pinned ONCE (localCheckpoint); every round
    then joins the K-row rank table against the SAME pre-partitioned
    edges and partially aggregates contributions by `dst` — per round
    exactly one shuffle of (edge-count) contribution rows plus the
    rank-table co-partition, lineage cut per round so plans stay flat
    (the `connected_components` pattern above).
    """
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"dangling must be 'drop' or 'redistribute': {dangling!r}")
    if weight_col is None:
        e = edges.selectExpr(f"{src} AS src", f"{dst} AS dst").distinct()
    else:
        # weighted: duplicate (src, dst) rows collapse by SUMMING their
        # integer weights; contribution becomes rank*85*w div (100*W(u))
        # — still exact integer arithmetic, still order-independent.
        # Overflow bound: rank_micro * 85 * w must stay < 2^63, i.e.
        # w * rank < 1.08e17 micro — support-count weights on graphs up
        # to ~1e9 nodes clear it; renormalize weights if yours do not.
        e = (
            edges.selectExpr(
                f"{src} AS src", f"{dst} AS dst",
                f"CAST({weight_col} AS BIGINT) AS __w",
            )
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
        )
    if checkpoint:
        e = e.repartition("src").localCheckpoint(eager=True)
    if weight_col is None:
        deg = e.groupBy("src").agg(F.count("*").alias("__d"))
    else:
        # the integer-exact contract requires positive weights: a src
        # whose weights sum to 0 gives __d=0, where Spark's `div`
        # yields NULL (contribution silently dropped) but the DuckDB
        # oracle's `//` raises — enforce loudly instead of diverging.
        # Checked on the collapsed (src, dst) sums, which is exactly
        # what feeds the divisor; short-circuits on the first hit.
        _require_positive_weights(e, "pagerank")
        deg = e.groupBy("src").agg(F.sum("__w").alias("__d"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
    redistribute = dangling == "redistribute"
    if redistribute:
        # (node, __dang) rides through every round so the next round's
        # dangling sum is an observe metric, never a second aggregate
        nodes = nodes.join(
            deg.select(F.col("src").alias("node"), F.lit(False).alias("__out")),
            "node",
            "left",
        ).select("node", F.coalesce(F.col("__out"), F.lit(True)).alias("__dang"))
        if checkpoint:
            nodes = nodes.localCheckpoint(eager=True)
        counts = nodes.agg(
            F.count("*").alias("n"),
            F.sum(F.col("__dang").cast("bigint")).alias("nd"),
        ).collect()[0]
        n_nodes, n_dang = int(counts["n"]), int(counts["nd"] or 0)
        dang_sum = 1_000_000 * n_dang  # round-0 ranks are uniform
    ranks = nodes.select("node", F.lit(1_000_000).cast("bigint").alias("rank_micro"))
    dang_metric = F.sum(
        F.when(F.col("__dang"), F.col("rank_micro")).otherwise(F.lit(0))
    ).alias("dang_sum")
    for i in range(iters):
        contribs = (
            e.join(deg, "src")
            .join(ranks.select(F.col("node").alias("src"), "rank_micro"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    "(rank_micro * 85 * __w) div (100 * __d)"
                    if weight_col is not None
                    else "(rank_micro * 85) div (100 * __d)"
                ).alias("__c"),
            )
        )
        share = (
            F.lit((dang_sum * 85) // (100 * n_nodes)) if redistribute else F.lit(0)
        )
        ranks = (
            nodes.join(contribs.groupBy("node").agg(F.sum("__c").alias("__s")),
                       "node", "left")
            .select(
                *nodes.columns,
                (F.lit(150_000) + share + F.coalesce(F.col("__s"), F.lit(0)))
                .cast("bigint")
                .alias("rank_micro"),
            )
        )
        if redistribute and i + 1 < iters:
            if checkpoint:
                obs = Observation(f"pr_dang_{i}")
                ranks = ranks.observe(obs, dang_metric)
                ranks = ranks.localCheckpoint(eager=True)
                dang_sum = int(obs.get["dang_sum"] or 0)
            else:
                dang_sum = int(
                    ranks.agg(dang_metric).collect()[0]["dang_sum"] or 0
                )
        elif checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank_micro")


def build_pagerank_sql(
    edges_cte: str, iters: int = 5, dangling: str = "drop", weighted: bool = False
) -> str:
    """Generated DuckDB WITH-chain replaying `pagerank` exactly:
    `edges_cte` is the body of an `e(src, dst)` CTE (rows must be
    distinct); output (node, rank_micro) matches bit-for-bit because
    both sides use the same integer micro-unit update. With
    `dangling="redistribute"` each round adds a `d{r}` CTE (the summed
    rank of out-degree-0 nodes) and folds the uniform integer share
    `(dm * 85) // (100 * n)` into the update — the same Python-int
    arithmetic the Spark loop applies from its observe scalar."""
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"dangling must be 'drop' or 'redistribute': {dangling!r}")
    redistribute = dangling == "redistribute"
    deg_expr = "SUM(w)" if weighted else "COUNT(*)"
    parts = [
        f"""WITH e AS MATERIALIZED ({edges_cte}
), deg AS MATERIALIZED (
    SELECT src, {deg_expr} AS d FROM e GROUP BY src
), nodes AS MATERIALIZED (
    SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
    )
), nc AS MATERIALIZED (
    SELECT COUNT(*) AS n FROM nodes
), r0 AS MATERIALIZED (
    SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes
)"""
    ]
    for r in range(iters):
        share = "0"
        if redistribute:
            parts.append(
                f""", d{r} AS MATERIALIZED (
    SELECT COALESCE(SUM(r.rank_micro), 0) AS dm
    FROM r{r} r LEFT JOIN deg ON deg.src = r.node
    WHERE deg.src IS NULL
)"""
            )
            share = f"(SELECT (d{r}.dm * 85) // (100 * nc.n) FROM d{r}, nc)"
        parts.append(
            f""", r{r + 1} AS MATERIALIZED (
    SELECT n.node,
           CAST(150000 + {share}
                + COALESCE(SUM((r.rank_micro * 85{" * e.w" if weighted else ""}) // (100 * deg.d)), 0)
                AS BIGINT) AS rank_micro
    FROM nodes n
    LEFT JOIN e ON e.dst = n.node
    LEFT JOIN deg ON deg.src = e.src
    LEFT JOIN r{r} r ON r.node = e.src
    GROUP BY n.node
)"""
        )
    return "".join(parts)


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    given as a (possibly directed / duplicated) edge list → (node,
    tri_cnt), only nodes in ≥ 1 triangle.

    Algorithm: degree-ordered orientation (Schank–Wagner; the
    MapReduce formulation is Suri & Vassilvitskii, WWW 2011 "Counting
    triangles and the curse of the last reducer"). Each undirected
    edge is oriented from its lower endpoint to its higher endpoint
    under the total order (degree, node-id); wedges are generated only
    at each edge's LOWER endpoint and closed with a hash-equi join
    against the oriented edge set.

    Why this is the 100 TB shape: orientation bounds every node's
    out-degree by O(√m) on ANY graph (a node of degree d > √2m has all
    its wedges charged to its — necessarily lower-degree — neighbors),
    so the wedge join fans out Σ outdeg² ≤ O(m^1.5) TOTAL and the
    celebrity-node skew that kills the naive u-keyed wedge join ("the
    curse of the last reducer") cannot concentrate on one task. All
    three joins are hash-equi (wedge: on the low endpoint; close: on
    the (v, w) pair); counts are exact integers, so the whole plan
    replays bit-for-bit in ANSI SQL — see the `graph_triangles`
    oracle.

    `checkpoint=True` pins the deduped undirected edge set and the
    oriented edge set (localCheckpoint): both are consumed by 2–3
    downstream branches and AQE drops cross-branch ReusedExchange on
    self-joins (the r7 survey), so without the pin the upstream edge
    construction would be recomputed per branch.
    """
    a0, b0 = F.col(src), F.col(dst)
    und = (
        edges.select(
            F.least(a0, b0).alias("a"), F.greatest(a0, b0).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if checkpoint:
        und = und.localCheckpoint(eager=True)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        und.join(deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    if checkpoint:
        oriented = oriented.localCheckpoint(eager=True)
    e1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1")
    )
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2")
    )
    wedges = e1.join(e2, "u").filter(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    return (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 10,
) -> DataFrame:
    """k-core of an undirected graph by bounded-round peeling →
    (node, deg): the maximal subgraph in which every node has degree
    ≥ k, with `deg` the node's degree INSIDE that subgraph (its
    coreness witness). The classic crawl/interaction-graph curation
    primitive (Seidman 1983 "Network structure and minimum degree"):
    spam rings and boilerplate clusters live in dense cores, stray
    one-off links peel away.

    Peeling is monotone and idempotent: each round deletes every edge
    with an endpoint of current degree < k; once no edge is deleted
    the subgraph is the exact k-core and further rounds are no-ops.
    `rounds` is therefore a REPLAY bound, not an approximation knob —
    any `rounds` ≥ the convergence round returns the exact core, and
    the generated DuckDB oracle (`build_kcore_sql`) replays the same
    fixed number of rounds bit-for-bit (extra rounds are identity on
    both sides, so Spark's early stop never diverges from the
    oracle's full unroll).

    Scale shape (100 TB): per round one degree aggregation (partial
    map-side combine on each endpoint) + two semi joins back to the
    edge list — all hash-equi, no window, no collect of anything but
    the observe scalar. The edge set shrinks monotonically, so round
    cost is non-increasing; the per-round lineage cut is UNCONDITIONAL
    (no `checkpoint=False` escape hatch, unlike `pagerank`): the
    degree table is recomputed FROM the current edge set each round,
    so an uncut plan references the previous round ~5× and grows
    exponentially — 10 lazy rounds OOM the driver at analysis time on
    a 4-edge graph (measured). The edge-count observe metric rides the
    checkpoint materialization (no extra job) and stops the loop as
    soon as a round deletes nothing.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    a0, b0 = F.col(src), F.col(dst)
    live = (
        edges.select(F.least(a0, b0).alias("a"), F.greatest(a0, b0).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_m: int | None = None
    for i in range(rounds):
        deg = (
            live.select(F.col("a").alias("node"))
            .unionByName(live.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("__d"))
        )
        keep = deg.filter(F.col("__d") >= k)
        nxt = live.join(
            keep.select(F.col("node").alias("a")), "a", "leftsemi"
        ).join(keep.select(F.col("node").alias("b")), "b", "leftsemi")
        obs = Observation(f"kcore_round_{i}")
        live = nxt.observe(obs, F.count(F.lit(1)).alias("m")).localCheckpoint(
            eager=True
        )
        m = int(obs.get["m"] or 0)
        if m == prev_m:
            break  # fixpoint: the oracle's remaining rounds are no-ops
        prev_m = m
    return (
        live.select(F.col("a").alias("node"))
        .unionByName(live.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )


def build_kcore_sql(edges_cte: str, k: int, rounds: int = 10) -> str:
    """DuckDB WITH-chain replaying `kcore` round-for-round: `edges_cte`
    must yield a directed/duplicated edge list (src, dst); the chain
    dedups to undirected (a < b) and unrolls `rounds` peel rounds.
    Returns the chain up to `e{rounds}`; append a final SELECT, e.g.
    ``SELECT node, COUNT(*)::BIGINT AS deg FROM (SELECT a AS node FROM
    e10 UNION ALL SELECT b FROM e10) GROUP BY node ORDER BY node``.
    """
    # every e{i} is referenced ~5x by round i+1 (degree union twice, the
    # FROM once, both IN subqueries once each); DuckDB inlines CTEs by
    # default, so an unhinted chain expands ~5^rounds in the planner —
    # measured: 8 unhinted rounds on a 60-edge VALUES graph ran the
    # planner to tens of GB. MATERIALIZED pins each round to one
    # evaluation (the mixture-solver oracle convention).
    parts = [
        f"WITH raw AS ({edges_cte}),",
        "e0 AS MATERIALIZED (",
        "    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b",
        "    FROM raw WHERE src <> dst",
        ")",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f""", d{i} AS MATERIALIZED (
    SELECT node FROM (
        SELECT a AS node FROM e{p} UNION ALL SELECT b FROM e{p}
    ) GROUP BY node HAVING COUNT(*) >= {k}
), e{i} AS MATERIALIZED (
    SELECT a, b FROM e{p}
    WHERE a IN (SELECT node FROM d{i}) AND b IN (SELECT node FROM d{i})
)""")
    return "\n".join(parts) + "\n"


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Synchronous label-propagation communities → (node, label)
    (Raghavan et al. 2007, derandomized): every node starts as its own
    label; each round it adopts the most frequent label among its
    neighbors AND itself, ties to the SMALLEST label — no randomness
    anywhere, so the result is a pure function of (graph, rounds) and
    the generated DuckDB oracle (`build_lpa_sql`) replays it
    bit-for-bit. The self-vote is the standard synchronous-LPA
    stabilization: without it an isolated edge 2-cycles forever (each
    endpoint adopts the other's label every round — measured on the
    test graph); with it, ties settle on the smallest label and true
    fixpoints exist. The near-linear community primitive for
    interaction/co-purchase graphs: link farms and engagement rings
    collapse onto one label within a few rounds.

    Even with self-votes, `rounds` is NOT a convergence-insensitive
    replay bound in general, so the registered configuration fixes
    `rounds` and the oracle unrolls exactly that many; the early stop
    below fires only on a TRUE fixpoint (zero labels changed), where
    extra oracle rounds are provably identity.

    Scale shape (100 TB): per round one (node, label) partial-count
    aggregate over the symmetric edge list + one argmax aggregate
    (max(struct(count, −label)) — no window) + a hash join back to
    labels; per-round lineage cut UNCONDITIONAL (the kcore lesson —
    labels feed the next round ~3×, an uncut chain grows
    exponentially). Node ids must be numeric (the −label tie-break;
    the graph family convention).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    # the −label tie-break REQUIRES numeric node ids: on strings it
    # either raises mid-job (ANSI) or — legacy mode — nulls out and
    # silently breaks tie determinism. Enforce the convention up front
    # (the sampling._reject_null_groups pattern: loud, before any job).
    # triangle_counts/kcore/pagerank use only order/join semantics and
    # accept any orderable id type.
    from pyspark.sql.types import NumericType

    for c in (src, dst):
        t = edges.schema[c].dataType
        if not isinstance(t, NumericType):
            raise ValueError(
                f"label_propagation: node-id column {c!r} is "
                f"{t.simpleString()}, but the smallest-label tie-break "
                "needs numeric ids — hash or dictionary-encode string "
                "ids first (e.g. xxhash64), the graph family convention"
            )
    a0, b0 = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a0, b0).alias("a"), F.greatest(a0, b0).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    nbr_pairs = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    # self-vote: every node also counts its own current label
    sym = nbr_pairs.unionByName(
        nbr_pairs.select("node").distinct().withColumn("nbr", F.col("node"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select("node").distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)
    for i in range(rounds):
        msg = sym.join(
            labels.select(F.col("node").alias("nbr"), "label"), "nbr"
        ).select("node", "label")
        counts = msg.groupBy("node", "label").agg(F.count(F.lit(1)).alias("__c"))
        new = (
            counts.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("__c"), (-F.col("label")).alias("__nl"))
                ).alias("best")
            )
            .select("node", (-F.col("best.__nl")).alias("label"))
        )
        obs = Observation(f"lpa_round_{i}")
        joined = new.join(
            labels.select("node", F.col("label").alias("__old")), "node"
        )
        labels = (
            joined.observe(
                obs,
                F.sum((F.col("label") != F.col("__old")).cast("long")).alias("chg"),
            )
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
        if int(obs.get["chg"] or 0) == 0:
            break  # true fixpoint: remaining oracle rounds are identity
    return labels


def build_lpa_sql(edges_cte: str, rounds: int = 4) -> str:
    """DuckDB WITH-chain replaying `label_propagation` round-for-round
    (same MATERIALIZED hints as `build_kcore_sql` — each round is
    referenced multiply and an unhinted chain explodes in the
    planner). Returns the chain up to `l{rounds}`; append a final
    SELECT, e.g. ``SELECT node, label FROM l4 ORDER BY node``.
    """
    parts = [
        f"WITH raw AS ({edges_cte}),",
        "e0 AS MATERIALIZED (",
        "    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b",
        "    FROM raw WHERE src <> dst",
        "),",
        "nbrp AS (",
        "    SELECT a AS node, b AS nbr FROM e0",
        "    UNION ALL SELECT b AS node, a AS nbr FROM e0",
        "),",
        "sym AS MATERIALIZED (",
        "    SELECT node, nbr FROM nbrp",
        "    UNION ALL SELECT DISTINCT node, node AS nbr FROM nbrp",
        "),",
        "l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM sym)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f""", l{i} AS MATERIALIZED (
    SELECT node, label FROM (
        SELECT s.node, l.label, COUNT(*) AS c
        FROM sym s JOIN l{p} l ON s.nbr = l.node
        GROUP BY s.node, l.label
    ) QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) = 1
)""")
    return "\n".join(parts) + "\n"


def project_bipartite(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 1,
    keep_support: bool = False,
) -> DataFrame:
    """Bipartite → item-item projection: two items are adjacent when
    they co-occur in ≥ `min_support` groups (orders → co-purchase,
    users → co-engagement, documents → co-citation). Returns an
    undirected edge list (src < dst) with support-thresholded edges —
    the standard market-basket graph construction feeding
    `triangle_counts` / `kcore` / `label_propagation` / `pagerank`.

    Scale shape: one self-equi-join on the group key (the group's
    item fan-out is the quadratic knob — a group with g items emits
    g²/2 pairs, so cap or skip pathological groups upstream), then a
    (src, dst) partial-count aggregate; `min_support` prunes the long
    noise tail BEFORE any graph algorithm sees it (support 1 vs 2 on
    the sf0.1 co-purchase graph: 41M wedges vs 69 — measured in the
    triangles study).
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    from social_media_data_pipeline_spark.io import spread_small_input

    # widen an unsplittable single-file input before the self-join
    # (guide §2.5): hash-repartitioning on the join key IS the join's
    # exchange, so this adds no shuffle — it moves the exchange below
    # the scan so the 1-task scan stops serializing the wedge fan-out
    # (measured 2.8 → 1.3 s at sf0.1; identity on wide inputs)
    x = spread_small_input(
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("pa")),
        key="__g",
    )
    y = spread_small_input(
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("pb")),
        key="__g",
    )
    return (
        x.join(y, "__g")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= min_support)
        .select(
            F.col("pa").alias("src"),
            F.col("pb").alias("dst"),
            *([F.col("sup")] if keep_support else []),
        )
    )


def association_rules(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Market-basket association rules (Agrawal–Srikant 1994) over the
    2-itemsets `project_bipartite` mines: for each directed rule
    a → b with pair support ≥ `min_support`, the exact basket counts
    and integer-exact confidence and lift.

    Emission is a DETERMINISTIC integer chain (cross-engine,
    cross-partitioning bit-exact — no IEEE divide on the surface):

        confidence_ppm = (n_ab · 10⁶) div n_a           (≤ 10⁶)
        lift_micro     = (confidence_ppm · N) div n_b    (N = baskets)

    i.e. lift with two floors; the floor bias is < 1 ppm of confidence
    and < 1/n_b micro of lift — a spec'd convention, not a float
    approximation. Overflow: confidence_ppm ≤ 1e6, so the lift product
    stays in int64 for N < 9.2e12 baskets.

    Scale shape: input is deduped to distinct (group, item) first
    (multi-quantity baskets count once); pair supports come from the
    `project_bipartite` self-equi-join (per-basket fan-out is the
    quadratic knob — cap pathological baskets upstream); per-item
    basket counts join back hash-equi on the item key; the 1-row
    basket total rides a broadcast. Everything after the threshold is
    rule-table-sized. The deduped base is consumed by three branches
    (both self-join sides + item counts) and is deliberately NOT
    pinned here — a one-shot rule mine at 100 TB should stage the
    distinct (basket, item) table once (`io.write_stage_output`) and
    call this on the staged scan, collapsing the replays to one.
    """
    base = (
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("__i"))
        .distinct()
    )
    pairs = project_bipartite(base, "__g", "__i", min_support, keep_support=True)
    item_n = base.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    # basket total from the RAW input (any row implies membership):
    # equivalent to counting base's distinct groups, without replaying
    # the (group, item) dedup a fourth time
    n_groups = df.agg(
        F.count_distinct(F.col(group_col)).alias("__N")
    )
    directed = pairs.select(
        F.col("src").alias("antecedent"), F.col("dst").alias("consequent"), "sup"
    ).unionByName(
        pairs.select(
            F.col("dst").alias("antecedent"), F.col("src").alias("consequent"), "sup"
        )
    )
    return (
        directed.join(
            item_n.withColumnRenamed("__i", "antecedent").withColumnRenamed(
                "__n", "n_a"
            ),
            "antecedent",
        )
        .join(
            item_n.withColumnRenamed("__i", "consequent").withColumnRenamed(
                "__n", "n_b"
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_groups))
        .select(
            "antecedent",
            "consequent",
            F.col("sup").alias("n_ab"),
            "n_a",
            "n_b",
            F.expr("(sup * 1000000) div n_a").alias("confidence_ppm"),
            F.expr("(((sup * 1000000) div n_a) * __N) div n_b").alias("lift_micro"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    weight_col: str | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Bounded-round personalized PageRank (random walk with restart
    to a SEED set) → (node, rank_micro), touched nodes only. The
    related-item / crawl-prioritization primitive (Haveliwala 2002
    "Topic-sensitive PageRank"; Jeh–Widom 2003): rank mass starts at
    the seeds and every round teleports back only to them, so scores
    measure proximity TO THE SEEDS, not global centrality.

    Seed-scaled exact integer micro-units (the `pagerank` convention):
    r0 = 1_000_000 per seed, 0 elsewhere; each round
        r[v] = (v ∈ S ? 150_000 : 0)
             + Σ_{u→v} (r[u] * 85 * w) div (100 * W(u))
    — the same associative, order-independent integer update, so the
    whole run replays bit-for-bit in the generated DuckDB WITH-chain
    (`build_ppr_sql`). Dangling mass drops (the lean `pagerank`
    default): for retrieval, walk mass leaving through sinks simply
    stops voting. Output keeps rank_micro > 0 rows — exactly the
    ≤ iters-hop neighborhood of the seeds, which is the point: on a
    100 TB graph the result is seed-local, not |V|-sized.

    `seeds` is a 1-column DataFrame of node ids or a Python list.
    Scale shape identical to `pagerank`: edges deduped (weighted:
    duplicate edges collapse by summing), hash-partitioned by src and
    pinned once; per round one contribution shuffle + partial-agg by
    dst, lineage cut per round. The rank frame shrinks to the touched
    set instead of |V|, so seed-local walks on huge graphs join a
    SMALL rank table against the pre-partitioned edge list every
    round — broadcast-able when the neighborhood is.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    spark = edges.sparkSession
    if not isinstance(seeds, DataFrame):
        seeds = list(seeds)
        if not seeds:
            raise ValueError("personalized_pagerank: empty seed set")
        seeds = spark.createDataFrame(
            [(s,) for s in seeds], [edges.select(src).columns[0]]
        )
    seed_df = seeds.select(
        F.col(seeds.columns[0]).alias("node")
    ).distinct()
    if weight_col is None:
        e = edges.selectExpr(f"{src} AS src", f"{dst} AS dst").distinct()
        e = e.withColumn("__w", F.lit(1).cast("bigint"))
    else:
        e = (
            edges.selectExpr(
                f"{src} AS src", f"{dst} AS dst",
                f"CAST({weight_col} AS BIGINT) AS __w",
            )
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
        )
    if checkpoint:
        e = e.repartition("src").localCheckpoint(eager=True)
        seed_df = seed_df.localCheckpoint(eager=True)
    if weight_col is not None:
        # guard AFTER the pin (the `pagerank` ordering): probing the
        # un-checkpointed view re-executed the whole upstream edge
        # derivation (e.g. the co-purchase wedge join) once for the
        # probe and again for the checkpoint — measured 2.6 s doubled
        # at sf0.1. On the pinned table the probe is a bounded scan.
        _require_positive_weights(e, "personalized_pagerank")
    deg = e.groupBy("src").agg(F.sum("__w").alias("__d"))
    ranks = seed_df.select(
        "node", F.lit(1_000_000).cast("bigint").alias("rank_micro")
    )
    for _ in range(iters):
        contribs = (
            e.join(deg, "src")
            .join(ranks.select(F.col("node").alias("src"), "rank_micro"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank_micro * 85 * __w) div (100 * __d)").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            seed_df.select("node", F.lit(150_000).cast("bigint").alias("__t"))
            .join(contribs, "node", "full")
            .select(
                "node",
                (F.coalesce(F.col("__t"), F.lit(0))
                 + F.coalesce(F.col("__s"), F.lit(0)))
                .cast("bigint")
                .alias("rank_micro"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.filter(F.col("rank_micro") > 0)


def _require_positive_weights(e: DataFrame, op: str) -> None:
    """Shared weighted-graph contract: collapsed (src, dst) weight sums
    must be positive integers — a 0/NULL sum makes the contribution
    divisor 0, where Spark's `div` yields NULL (silently dropped) but
    the DuckDB oracle's `//` raises. Short-circuits on the first hit."""
    bad = (
        e.filter(F.col("__w").isNull() | (F.col("__w") <= 0)).limit(1).collect()
    )
    if bad:
        r = bad[0]
        raise ValueError(
            f"{op}: summed weight for edge ({r['src']!r} -> {r['dst']!r}) "
            f"is {r['__w']} — weights must be positive integers "
            "(NULL/zero/negative sums make the divisor 0 and silently "
            "drop contributions); filter or shift weights before calling"
        )


def build_ppr_sql(
    edges_cte: str,
    seeds_cte: str,
    iters: int = 5,
    weighted: bool = False,
) -> str:
    """DuckDB WITH-chain replaying `personalized_pagerank` exactly:
    `edges_cte` yields (src, dst[, w]) rows (distinct if unweighted —
    the chain collapses duplicate weighted edges by summing, same as
    the operator), `seeds_cte` yields (node). Append a final SELECT,
    e.g. ``SELECT node, rank_micro FROM r5 WHERE rank_micro > 0 ORDER
    BY node``."""
    w_expr = "SUM(w)" if weighted else "COUNT(*)"
    c_w = " * e.w" if weighted else ""
    e_body = (
        f"SELECT src, dst, SUM(w) AS w FROM ({edges_cte}) GROUP BY src, dst"
        if weighted
        else f"SELECT DISTINCT src, dst FROM ({edges_cte})"
    )
    parts = [
        f"""WITH e AS MATERIALIZED ({e_body}
), deg AS MATERIALIZED (
    SELECT src, {w_expr} AS d FROM e GROUP BY src
), seeds AS MATERIALIZED (
    SELECT DISTINCT node FROM ({seeds_cte})
), r0 AS MATERIALIZED (
    SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM seeds
)"""
    ]
    for r in range(iters):
        parts.append(
            f""", c{r + 1} AS MATERIALIZED (
    SELECT e.dst AS node,
           SUM((r.rank_micro * 85{c_w}) // (100 * deg.d)) AS s
    FROM e JOIN deg ON deg.src = e.src
           JOIN r{r} r ON r.node = e.src
    GROUP BY e.dst
), r{r + 1} AS MATERIALIZED (
    SELECT COALESCE(s.node, c.node) AS node,
           CAST(COALESCE(s.t, 0) + COALESCE(c.s, 0) AS BIGINT) AS rank_micro
    FROM (SELECT node, 150000 AS t FROM seeds) s
    FULL JOIN c{r + 1} c ON c.node = s.node
)"""
        )
    return "".join(parts)


def link_predict_ra(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-overlap link prediction over an undirected graph →
    (n1, n2, cn, ra_micro, jaccard_micro) for NON-adjacent node pairs
    sharing ≥ `min_common` neighbors, n1 < n2:

    - `cn` — common-neighbor count (Newman 2001);
    - `ra_micro` — resource-allocation index Σ_w 1/deg(w) over common
      neighbors w (Zhou–Lü–Zhang 2009, EPJ B 71), the consistently
      strongest local predictor in their benchmark; summed as exact
      integer micro-units (1_000_000 div deg(w) per term — integer
      div, order-independent, replays bit-for-bit in SQL);
    - `jaccard_micro` — (cn * 1_000_000) div (deg(n1)+deg(n2)-cn).

    The recommender / related-content primitive: predicted co-purchase
    edges, crawl frontier expansion, near-dup cluster stitching.

    Scale shape: one wedge self-join keyed by the CENTER node w (each
    common neighbor generates the candidate pair), then a (n1, n2)
    partial-count aggregate and a broadcast-able degree join; the
    existing-edge exclusion is an anti join on the pair key. The wedge
    join's output is inherently Σ_w deg(w)² — a celebrity center emits
    deg² candidate pairs, and NO join strategy can bound an output
    (the lsh_pairs lesson). `max_center_degree` is the structural cure
    and is ALSO the metric's own logic: RA damps every center by
    1/deg(w), so a 10⁵-degree hub contributes ~0 signal per pair while
    costing deg² rows — capping it drops noise, not evidence (the
    Zhou–Lü–Zhang rationale for why RA beats raw common-neighbors).
    Unlike the doc-freq-pruned Jaccard join, the cap changes reported
    scores for pairs whose ONLY witnesses are super-hubs — document
    the cap with the result when you set it.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    a0, b0 = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a0, b0).alias("a"), F.greatest(a0, b0).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = und.selectExpr("a AS w", "b AS n").unionByName(
        und.selectExpr("b AS w", "a AS n")
    )
    deg = sym.groupBy(F.col("w").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    centers = sym.join(deg.select(F.col("node").alias("w"), "d"), "w")
    if max_center_degree is not None:
        centers = centers.filter(F.col("d") <= max_center_degree)
    wedges = (
        centers.selectExpr("w", "d", "n AS n1")
        .join(centers.selectExpr("w", "n AS n2"), "w")
        .filter(F.col("n1") < F.col("n2"))
    )
    scored = (
        wedges.groupBy("n1", "n2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum(F.expr("1000000 div d")).cast("bigint").alias("ra_micro"),
        )
        .filter(F.col("cn") >= min_common)
    )
    non_adj = scored.join(
        und.selectExpr("a AS n1", "b AS n2"), ["n1", "n2"], "left_anti"
    )
    return (
        non_adj.join(deg.selectExpr("node AS n1", "d AS __d1"), "n1")
        .join(deg.selectExpr("node AS n2", "d AS __d2"), "n2")
        .select(
            "n1",
            "n2",
            "cn",
            "ra_micro",
            F.expr("(cn * 1000000) div (__d1 + __d2 - cn)")
            .cast("bigint")
            .alias("jaccard_micro"),
        )
    )


def incremental_components(
    labels: DataFrame | None,
    new_pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Merge one batch of new edges into an existing (node, component)
    labeling → the updated labeling, EXACTLY equal to
    `connected_components` over the union of every edge ever seen —
    the streaming/incremental completion of the dedup-cluster story:
    `incremental_dedup_against_store` flags near-dup PAIRS per
    micro-batch; this maintains the CLUSTERS those pairs imply without
    ever recomputing history.

    Why it is exact: an existing labeling is a union-find forest
    compressed to depth 1, so the star edges (node → component) are
    connectivity-equivalent to all historic edges; CC over (affected
    stars ∪ new edges) therefore reproduces CC over (history ∪ batch)
    on the affected part, and the min-id label of a merged component
    is min(old component ids ∪ new node ids) = the global min — the
    same label batch CC would assign (the property the differential
    oracle checks end-to-end).

    Per-batch cost is proportional to the AFFECTED subgraph, not the
    corpus: components untouched by the batch pass through as rows
    (one anti join); touched components contribute only their star
    edges to the CC, which runs on |affected| + |batch| edges. At
    100 TB the label store is node-count-sized and partitioned by
    component; a batch touching k components reads k stars — the
    incremental-dedup band-store economics, applied to clustering.

    `labels` is None (or empty) on first use — the batch CC alone.
    Nodes appear in the output once they appear in any edge;
    singletons are the caller's join (the `dedup_clusters` contract).
    """
    e = new_pairs.selectExpr(f"{src} AS a", f"{dst} AS b")
    if labels is None:
        return connected_components(e, src="a", dst="b",
                                    max_iterations=max_iterations)
    touched = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    affected_comps = (
        labels.join(touched, "node", "leftsemi").select("component").distinct()
    )
    affected = labels.join(affected_comps, "component", "leftsemi")
    untouched = labels.join(affected_comps, "component", "left_anti")
    stars = affected.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("a"), F.col("component").alias("b")
    )
    sub = connected_components(
        stars.unionByName(e), src="a", dst="b", max_iterations=max_iterations
    )
    # nodes of affected components that had NO star edge (singleton
    # label rows whose node == component and no new edge) are still in
    # `affected`; CC over stars∪e covers every node with ≥1 edge —
    # re-attach edgeless affected rows that CC did not see
    leftover = affected.join(sub, "node", "left_anti").select(
        "node", "component"
    )
    return untouched.unionByName(sub.select("node", "component")).unionByName(
        leftover
    )


def _edge_supports(und: DataFrame) -> DataFrame:
    """Per-edge triangle support over a PINNED undirected (a < b)
    distinct edge set → (a, b, support). The degree-ordered
    Schank–Wagner enumeration of `triangle_counts` (cited there —
    wedge fan-out bounded O(√m) per node, every join hash-equi), with
    each triangle charged back to its THREE undirected edges instead
    of its three nodes."""
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        und.join(deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)
    e1 = oriented.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2"))
    wedges = e1.join(e2, "u").filter(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    pair = lambda x, y: F.struct(  # noqa: E731
        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
    )
    return (
        tri.select(
            F.explode(
                F.array(
                    pair(F.col("u"), F.col("v1")),
                    pair(F.col("u"), F.col("v2")),
                    pair(F.col("v1"), F.col("v2")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def ktruss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 10,
) -> DataFrame:
    """k-truss of an undirected graph by bounded-round peeling →
    (a, b, support): the maximal subgraph in which every EDGE sits in
    ≥ k−2 triangles, with `support` the edge's triangle count INSIDE
    that subgraph (Cohen 2008 "Trusses: cohesive subgraphs for social
    network analysis"). The edge-grain sibling of `kcore` — strictly
    stronger cohesion (every k-truss edge is in the (k−1)-core), the
    spam-ring/boilerplate-clique extractor that survives hub noise a
    degree threshold cannot: a celebrity node inflates degrees but not
    mutual triangles.

    Same replay contract as `kcore`: peeling is monotone and
    idempotent, so `rounds` is a REPLAY bound, not an approximation —
    Spark early-stops at the fixpoint (edge-count observe metric) and
    the generated DuckDB oracle (`build_ktruss_sql`) unrolls the full
    `rounds`, with the extra rounds identity on both sides. The final
    support witness is recomputed ON the surviving subgraph, so both
    engines report fixpoint supports.

    Scale shape (100 TB): per round one degree-ordered triangle
    enumeration (wedge fan-out O(√m) per node — the Suri–
    Vassilvitskii bound; all joins hash-equi) + one support aggregate
    + one IN-semi peel; the edge set shrinks monotonically and the
    per-round lineage cut is unconditional (the kcore lesson — an
    uncut chain references the previous round ~6× per round)."""
    if k < 3:
        raise ValueError(
            f"k must be >= 3 for a k-truss (k=2 is the whole graph), got {k}"
        )
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    a0, b0 = F.col(src), F.col(dst)
    live = (
        edges.select(F.least(a0, b0).alias("a"), F.greatest(a0, b0).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_m: int | None = None
    for i in range(rounds):
        sup = _edge_supports(live)
        nxt = live.join(
            sup.filter(F.col("support") >= k - 2), ["a", "b"], "leftsemi"
        )
        obs = Observation(f"ktruss_round_{i}")
        live = nxt.observe(obs, F.count(F.lit(1)).alias("m")).localCheckpoint(
            eager=True
        )
        m = int(obs.get["m"] or 0)
        if m == prev_m:
            break  # fixpoint: the oracle's remaining rounds are no-ops
        prev_m = m
    final_sup = _edge_supports(live)
    return live.join(final_sup, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce(F.col("support"), F.lit(0)).cast("bigint").alias("support"),
    )


def build_ktruss_sql(edges_cte: str, k: int, rounds: int = 10) -> str:
    """DuckDB WITH-chain replaying `ktruss` round-for-round:
    `edges_cte` must yield a directed/duplicated (src, dst) list; the
    chain dedups to undirected (a < b) and unrolls `rounds` peel
    rounds, each one triangle-support pass (the `graph_triangles`
    oracle chain per round) + the ≥ k−2 edge filter, then recomputes
    the support witness on the final edge set. Every CTE is
    MATERIALIZED (the `build_kcore_sql` lesson: unhinted chains expand
    ~5^rounds in the planner). Returns a COMPLETE query ending in
    ``SELECT a, b, support ... ORDER BY a, b``."""

    def support_block(tag: str, src_cte: str) -> str:
        return f""", deg{tag} AS MATERIALIZED (
    SELECT node, COUNT(*)::BIGINT AS d FROM (
        SELECT a AS node FROM {src_cte} UNION ALL SELECT b FROM {src_cte}
    ) GROUP BY node
), ore{tag} AS MATERIALIZED (
    SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                THEN u.a ELSE u.b END AS u,
           CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                THEN u.b ELSE u.a END AS v,
           CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
                THEN db.d ELSE da.d END AS dv
    FROM {src_cte} u
    JOIN deg{tag} da ON da.node = u.a
    JOIN deg{tag} db ON db.node = u.b
), tri{tag} AS MATERIALIZED (
    SELECT w.u, w.v1, w.v2 FROM (
        SELECT e1.u, e1.v AS v1, e2.v AS v2
        FROM ore{tag} e1 JOIN ore{tag} e2 ON e1.u = e2.u
        WHERE e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v)
    ) w JOIN ore{tag} c ON c.u = w.v1 AND c.v = w.v2
), sup{tag} AS MATERIALIZED (
    SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b, COUNT(*)::BIGINT AS c
    FROM (
        SELECT u AS x, v1 AS y FROM tri{tag}
        UNION ALL SELECT u, v2 FROM tri{tag}
        UNION ALL SELECT v1, v2 FROM tri{tag}
    ) GROUP BY 1, 2
)"""

    parts = [
        f"WITH raw AS ({edges_cte}),",
        "e0 AS MATERIALIZED (",
        "    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b",
        "    FROM raw WHERE src <> dst",
        ")",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(support_block(str(i), f"e{p}"))
        parts.append(f""", e{i} AS MATERIALIZED (
    SELECT e.a, e.b FROM e{p} e
    JOIN sup{i} s ON s.a = e.a AND s.b = e.b AND s.c >= {k - 2}
)""")
    parts.append(support_block("f", f"e{rounds}"))
    parts.append(f"""
SELECT e.a, e.b, COALESCE(s.c, 0)::BIGINT AS support
FROM e{rounds} e LEFT JOIN supf s USING (a, b)
ORDER BY a, b""")
    return "\n".join(parts)
