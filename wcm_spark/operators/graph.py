"""Link-graph analytics operators: PageRank, components, degrees.

The reference engine stops at extraction — it emits the link edges
(Mojo.pm:125-159) but never aggregates them into graph-level signals.
At 100 TB those signals are exactly what a crawl corpus is FOR: PageRank
as a crawl-priority / quality prior, connected components for site
clustering, degree stats for spam/hub detection. These operators take
any (src, dst) edge DataFrame — the engine's scrape output, or any edge
table — and run fixed-iteration algorithms built purely from joins and
hash aggregates.

Determinism across engines (the driver compares value hashes against a
DuckDB oracle): floating-point PageRank sums depend on partition order,
so ranks are kept in integer MICRO-units (BIGINT) and every per-node
update is integer arithmetic — `rank div outdeg` contributions,
`150000 + (85 * sum) div 100` damping. Integer sums commute, so any
shuffle order yields bit-identical ranks. Component labels use string
`min()`, also order-independent.

100 TB shape per iteration: one shuffle join of ranks (node-sized)
against edges on src, one hash aggregate on dst, one left join back to
the node set — no windows, no driver collects, no broadcast of
node-sized state. The edge frame is reused every iteration: callers
should `.persist()` it (the registry queries do). For hundreds of
iterations, re-materialize `ranks` every ~10 iterations
(`localCheckpoint`) to truncate plan lineage; the fixed small iteration
counts here keep the whole loop a single Catalyst plan instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "connected_components", "degrees", "hits", "triangles"]

#: PageRank damping in percent and the per-node base in micro-units:
#: rank' = BASE_MICRO + (DAMP_PCT * sum(contribs)) div 100, with the
#: conventional d=0.85 and per-node base (1-d) = 0.15 in the
#: unnormalized (total mass ~= N) formulation.
DAMP_PCT = 85
BASE_MICRO = 150_000
INIT_MICRO = 1_000_000


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    node_col: str = "url",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration integerized PageRank → (url, rank_micro BIGINT).

    Unnormalized variant: every node starts at 1.0 (10^6 micro) and
    keeps a constant 0.15 base, so total mass stays ~N and ranks are
    comparable across graph sizes. Dangling-node mass is dropped (the
    standard sink-loss simplification) — identical on the SQL-oracle
    side. All arithmetic is integral, so results are independent of
    partitioning and join order.
    """
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    ed = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).join(deg.select(F.col(src).alias("__src"), "__outdeg"), "__src")
    node_urls = nodes.select(F.col(node_col).alias("url"))
    ranks = node_urls.select(
        "url", F.lit(INIT_MICRO).cast("long").alias("rank_micro")
    )
    for _ in range(iters):
        contrib = ed.join(ranks, ed["__src"] == ranks["url"]).select(
            F.col("__dst").alias("url"),
            F.expr("rank_micro div __outdeg").alias("__c"),
        )
        sums = contrib.groupBy("url").agg(F.sum("__c").alias("__s"))
        ranks = node_urls.join(sums, "url", "left").select(
            "url",
            (
                F.lit(BASE_MICRO)
                + F.expr(
                    f"({DAMP_PCT} * coalesce(__s, CAST(0 AS BIGINT))) div 100"
                )
            ).cast("long").alias("rank_micro"),
        )
    return ranks


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 8,
    node_col: str = "url",
    src: str = "src",
    dst: str = "dst",
    shuffle_width: int | None = None,
) -> DataFrame:
    """Fixed-iteration min-label propagation → (url, component).

    Treats the edge set as undirected; each iteration every node takes
    the min of its own label and its neighbors' labels, so after k
    iterations labels have propagated k hops — ``iters`` must cover the
    largest component's diameter for true components (the fixture tests
    assert convergence by comparing against iters+2). String min is
    order-independent, so the result is partition-deterministic.

    Each hop is TWO shuffles (the neighbor join, then one min-aggregate
    over neighbor messages unioned with the node's own label) — the
    earlier own-side left join is folded into the aggregate, which
    computes the identical per-hop minimum.

    ``shuffle_width``: when the caller KNOWS the node/edge frames are
    small (a checkpointed candidate set, not a 100 TB graph), a narrow
    width avoids paying 32 scheduler tasks per tiny shuffle, six hops
    deep. Because ``spark.sql.shuffle.partitions`` binds at each
    action's planning, the narrow width uses EAGER per-hop checkpoints
    executed under the temporary conf (restored after); the default
    (None) keeps the session width and lazy one-action evaluation —
    the right shape at real graph scale.
    """
    spark = nodes.sparkSession
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    lbl = nodes.select(
        F.col(node_col).alias("url"), F.col(node_col).alias("component")
    )
    prev_width = None
    if shuffle_width is not None:
        prev_width = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_width))
        und = und.localCheckpoint(eager=True)
    try:
        for _ in range(iters):
            msgs = und.join(lbl, und["b"] == lbl["url"]).select(
                F.col("a").alias("url"), "component"
            )
            lbl = (
                lbl.union(msgs)
                .groupBy("url")
                .agg(F.min("component").alias("component"))
            )
            # lbl feeds the NEXT iteration twice (neighbor side + own
            # side): without truncation the plan doubles per hop —
            # 2^iters re-evaluations of the base scan (measured 58s ->
            # 4s at 1.5k nodes / 8 hops). Lazy checkpoint: computed once
            # inside the final action, no extra driver jobs. Narrow-width
            # mode checkpoints eagerly so every hop executes while the
            # temporary width is bound.
            lbl = lbl.localCheckpoint(eager=shuffle_width is not None)
    finally:
        if prev_width is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_width)
    return lbl


def degrees(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "url",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node (url, out_deg, in_deg) over the distinct edge set — two
    hash aggregates and two node-sized left joins. Duplicate (src, dst)
    rows in the input count once, matching the docstring's contract (the
    distinct is a map-side-combinable aggregate, not an extra shuffle of
    note at edge scale)."""
    dedup = edges.select(src, dst).distinct()
    out_d = dedup.groupBy(F.col(src).alias("url")).agg(
        F.count(F.lit(1)).alias("__o")
    )
    in_d = dedup.groupBy(F.col(dst).alias("url")).agg(
        F.count(F.lit(1)).alias("__i")
    )
    return (
        nodes.select(F.col(node_col).alias("url"))
        .join(out_d, "url", "left")
        .join(in_d, "url", "left")
        .select(
            "url",
            F.coalesce("__o", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("__i", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    node_col: str = "url",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration integerized HITS → (url, auth_micro, hub_micro).

    Kleinberg's hubs-and-authorities over the directed edge set: each
    iteration updates authorities from the CURRENT hubs (sum over
    in-edges), then hubs from the NEW authorities (sum over out-edges).
    Normalization is L-infinity — divide by the iteration's max — kept
    in integer micro-units: ``(raw * 10^6) div max(raw)``. Max and sum
    are partition-order-independent, so like :func:`pagerank` the result
    is bit-identical under any shuffle order (the driver value-hash
    compare requires it; L2 normalization would need a sqrt and break
    integrality). The max itself is a ONE-ROW aggregate crossed back in
    — a scalar broadcast, the same shape the registry's corpus-stats
    queries pin (never a node×node pairing).

    100 TB shape per half-iteration: one shuffle join of node-sized
    scores against edges + one hash aggregate + the scalar rescale —
    edges are never self-joined. Intermediate ``raw * 10^6`` fits BIGINT
    while N * 10^12 < 9.2e18, i.e. up to ~9M nodes per component at the
    default unit; trim ``unit`` for larger graphs (scores are relative).
    """
    ed = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    node_urls = nodes.select(F.col(node_col).alias("url"))
    unit = F.lit(INIT_MICRO).cast("long")
    hub = node_urls.select("url", unit.alias("hub_micro"))
    auth = None
    for _ in range(iters):
        a_raw = (
            ed.join(hub, ed["__src"] == hub["url"])
            .groupBy(F.col("__dst").alias("url"))
            .agg(F.sum("hub_micro").alias("__raw"))
        )
        a_max = a_raw.agg(
            F.greatest(F.max("__raw"), F.lit(1)).alias("__mx")
        )
        auth = (
            node_urls.join(a_raw, "url", "left")
            .crossJoin(F.broadcast(a_max))
            .select(
                "url",
                F.expr(
                    f"(coalesce(__raw, CAST(0 AS BIGINT)) * {INIT_MICRO}) div __mx"
                ).cast("long").alias("auth_micro"),
            )
        )
        h_raw = (
            ed.join(auth, ed["__dst"] == auth["url"])
            .groupBy(F.col("__src").alias("url"))
            .agg(F.sum("auth_micro").alias("__raw"))
        )
        h_max = h_raw.agg(
            F.greatest(F.max("__raw"), F.lit(1)).alias("__mx")
        )
        hub = (
            node_urls.join(h_raw, "url", "left")
            .crossJoin(F.broadcast(h_max))
            .select(
                "url",
                F.expr(
                    f"(coalesce(__raw, CAST(0 AS BIGINT)) * {INIT_MICRO}) div __mx"
                ).cast("long").alias("hub_micro"),
            )
        )
        # both frames feed the next iteration twice (join side + the
        # node-sized left join): truncate lineage like components does
        auth = auth.localCheckpoint(eager=False)
        hub = hub.localCheckpoint(eager=False)
    return auth.join(hub, "url").select("url", "auth_micro", "hub_micro")


def triangles(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "url",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts → (url, triangles BIGINT).

    Link-farm / spam-structure signal: organic link neighborhoods close
    triangles, farms are near-bipartite (few). Direction is ignored —
    edges canonicalize to a < b (string order) and dedupe, so a
    reciprocal pair counts once. Enumeration is the standard ordered
    wedge join: wedges (a < b < c) from two equi-joins on the canonical
    edge list, closed against the edge list itself; each closed triangle
    then credits all three corners (posexplode → hash aggregate).

    100 TB shape: two shuffle equi-joins bounded by the wedge count
    (sum of deg^2 over the canonical orientation — the a < b ordering
    is exactly the classic high-degree-vertex mitigation) and one
    aggregate; never a cartesian. For power-law webgraphs the wedge
    frame is the cost driver — at that scale feed a degree-capped or
    sampled edge subset (the signal survives capping; the operator
    takes any edge frame).
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    ab = canon.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    bc = canon.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    wedges = ab.join(bc, "tb")  # ta < tb < tc by construction
    closed = wedges.join(
        canon,
        (wedges["ta"] == canon["a"]) & (wedges["tc"] == canon["b"]),
    ).select("ta", "tb", "tc")
    corners = closed.select(
        F.explode(F.array("ta", "tb", "tc")).alias("url")
    )
    counts = corners.groupBy("url").agg(
        F.count(F.lit(1)).alias("__t")
    )
    return (
        nodes.select(F.col(node_col).alias("url"))
        .join(counts, "url", "left")
        .select(
            "url", F.coalesce("__t", F.lit(0)).cast("long").alias("triangles")
        )
    )
