"""Iterative graph algorithms over the materialized nodes/edges tables.

PageRank as iterative DataFrame joins (the GraphFrames-free form):
deterministic fixed-iteration power method with localCheckpoint per
round (same lineage-cutting discipline as connected components).

Two PageRank forms: the float power method (:func:`pagerank`, textbook
semantics, rows-only checkable — float sums are summation-order
dependent) and the integer fixed-point form (:func:`pagerank_fixed`)
whose fixed-round recurrence a DuckDB oracle unrolls into chained CTEs
and matches bit-exactly — the driver checks that one value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bfs_distances(edges: DataFrame, source: str,
                  max_iter: int = 50) -> DataFrame:
    """Unweighted shortest-hop distances from ``source`` over the
    UNDIRECTED edge set — frontier-expansion BFS as iterative joins
    (the GraphFrames-free form), ``localCheckpoint`` per level.

    Unlike PageRank this iterative algorithm IS exactly
    SQL-expressible (bounded recursive CTE), so the driver checks it
    against a DuckDB oracle value-for-value — the stronger check for
    an iterative operator.

    Returns (node, dist) for REACHABLE nodes only (dist 0 = source).
    Each level is one join + anti-join against the settled set; at
    scale the frontier is partitioned on node and the settled set
    stays partitioned alike, so levels are single-shuffle.
    """
    spark = edges.sparkSession
    # r06: partition the symmetrized edge list by src ONCE (guide
    # §2.4) — every level joins the frontier against it on src, so
    # only the (small) frontier side is exchanged per level instead of
    # re-shuffling the whole edge list each round.
    sym = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .where(F.col("src") != F.col("dst"))
           .repartition("src").dropDuplicates().localCheckpoint())
    dist = spark.createDataFrame([(source, 0)], "node string, dist int")
    frontier = dist
    for level in range(1, max_iter + 1):
        nxt = (frontier.join(sym, frontier["node"] == sym["src"])
               .select(F.col("dst").alias("node"))
               .dropDuplicates()
               .join(dist, "node", "left_anti")
               .withColumn("dist", F.lit(level).cast("int"))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint()
        frontier = nxt
    return dist


def pagerank_fixed(edges: DataFrame, damping_pct: int = 85,
                   n_iter: int = 5, scale: int = 10**12) -> DataFrame:
    """Integer fixed-point PageRank — the ORACLE-EXACT variant.

    Same power-method recurrence as :func:`pagerank`, but every
    quantity is a non-negative BIGINT in units of 1/scale and every
    division is an integer floor-division:

        r0        = scale // n
        contrib_u = sum over in-edges of (rank_u * w) // out_w
        dang_u    = sum of rank_u over dangling nodes
        rank_u'   = base_u + (damping_pct * (contrib_u + dang_u // n)) // 100
        base_u    = (((100 - damping_pct) * scale) // 100) // n

    Integer addition is associative, so the result is independent of
    partitioning/summation order — a DuckDB oracle that unrolls the
    fixed n_iter rounds as chained CTEs reproduces it bit-exactly
    (floats would drift by summation order).  Max magnitude is
    scale * max_weight ≈ 1e12 * 1e6, far inside int64.

    Values differ from the float variant by O(n_terms / scale)
    truncation — ~1e-9 per rank at the default scale.
    """
    spark = edges.sparkSession
    # r06 partitioning-reuse (guide §2.4): e and out_w clustered on
    # src, nodes/ranks/contribs on the node id — the per-round joins
    # and the out-weight aggregate then reuse these partitionings and
    # each round pays exactly ONE exchange (the contribution groupBy).
    e = edges.select("src", "dst",
                     (F.col("weight") if "weight" in edges.columns
                      else F.lit(1)).cast("long").alias("w")) \
        .repartition("src").localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .repartition("node").dropDuplicates()).localCheckpoint()
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "node string, rank_u long, rank_micro6 long")

    out_w = e.groupBy("src").agg(
        F.sum("w").cast("long").alias("out_w")).localCheckpoint()
    base_u = (((100 - damping_pct) * scale) // 100) // n
    ranks = nodes.withColumn("rank_u", F.lit(scale // n).cast("long"))
    for _ in range(n_iter):
        contribs = (e.join(out_w, "src")
                    .join(ranks.withColumnRenamed("node", "src"), "src")
                    .select("dst",
                            F.expr("(rank_u * w) DIV out_w").alias("c"))
                    .groupBy("dst")
                    .agg(F.sum("c").cast("long").alias("in_u")))
        dang = (ranks.join(out_w.withColumnRenamed("src", "node"),
                           "node", "left_anti")
                .agg(F.coalesce(F.sum("rank_u"), F.lit(0))
                     .cast("long").alias("dang")))
        ranks = (nodes.join(contribs.withColumnRenamed("dst", "node"),
                            "node", "left")
                 .crossJoin(dang)  # 1-row frame: stays fully lazy/distributed
                 .select("node",
                         (F.lit(base_u).cast("long")
                          + F.expr(f"({damping_pct} * (coalesce(in_u, "
                                   f"CAST(0 AS BIGINT)) + (dang DIV {n})))"
                                   f" DIV 100"))
                         .cast("long").alias("rank_u"))
                 ).localCheckpoint()
    return ranks.select(
        "node", "rank_u",
        F.expr("rank_u DIV 1000000").cast("long").alias("rank_micro6"))


def ppr_fixed(edges: DataFrame, source: str, damping_pct: int = 85,
              n_iter: int = 5, scale: int = 10**12) -> DataFrame:
    """Personalized PageRank / random-walk-with-restart from ``source``
    — the related-entity ranking primitive (a 2-hop neighborhood query
    with principled weighting).  Same integer fixed-point discipline
    as :func:`pagerank_fixed`, so a DuckDB oracle that unrolls the
    fixed rounds matches bit-exactly:

        r0_u      = scale if u == source else 0
        contrib_u = sum over in-edges of (rank_v * w) // out_w
        dang      = sum of rank over dangling nodes  (returned to seed)
        rank_u'   = restart_u + (damping_pct * (contrib_u + seed_dang_u)) // 100
        restart_u = ((100 - damping_pct) * scale) // 100  for the seed, else 0

    All mass flows back to the seed (standard RWR), so ranks decay
    with hop distance from it.  Scale shape is identical to
    pagerank_fixed: per round one join + one aggregate, the dangling
    scalar stays a lazy 1-row crossJoin — no driver syncs.
    """
    spark = edges.sparkSession
    # r06 partitioning-reuse (guide §2.4): e and out_w clustered on
    # src, nodes/ranks/contribs on the node id — the per-round joins
    # and the out-weight aggregate then reuse these partitionings and
    # each round pays exactly ONE exchange (the contribution groupBy).
    e = edges.select("src", "dst",
                     (F.col("weight") if "weight" in edges.columns
                      else F.lit(1)).cast("long").alias("w")) \
        .repartition("src").localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .repartition("node").dropDuplicates()).localCheckpoint()
    if nodes.isEmpty():
        return spark.createDataFrame([], "node string, rank_u long, rank_micro6 long")

    out_w = e.groupBy("src").agg(
        F.sum("w").cast("long").alias("out_w")).localCheckpoint()
    restart = ((100 - damping_pct) * scale) // 100
    zero = F.lit(0).cast("long")
    ranks = nodes.withColumn(
        "rank_u", F.when(F.col("node") == source, F.lit(scale))
        .otherwise(zero).cast("long"))
    for _ in range(n_iter):
        contribs = (e.join(out_w, "src")
                    .join(ranks.withColumnRenamed("node", "src"), "src")
                    .select("dst",
                            F.expr("(rank_u * w) DIV out_w").alias("c"))
                    .groupBy("dst")
                    .agg(F.sum("c").cast("long").alias("in_u")))
        dang = (ranks.join(out_w.withColumnRenamed("src", "node"),
                           "node", "left_anti")
                .agg(F.coalesce(F.sum("rank_u"), F.lit(0))
                     .cast("long").alias("dang")))
        ranks = (nodes.join(contribs.withColumnRenamed("dst", "node"),
                            "node", "left")
                 .crossJoin(dang)  # 1-row frame: stays fully lazy
                 .withColumn("_m", F.coalesce(F.col("in_u"), zero)
                             + F.when(F.col("node") == source,
                                      F.col("dang")).otherwise(zero))
                 .select("node",
                         (F.when(F.col("node") == source,
                                 F.lit(restart)).otherwise(zero).cast("long")
                          + F.expr(f"({damping_pct} * _m) DIV 100")
                          .cast("long")).alias("rank_u"))
                 ).localCheckpoint()
    return ranks.select(
        "node", "rank_u",
        F.expr("rank_u DIV 1000000").cast("long").alias("rank_micro6"))


def pagerank(edges: DataFrame, damping: float = 0.85,
             n_iter: int = 10) -> DataFrame:
    """edges (src, dst[, weight]) directed -> (node, rank_micro6, rank).

    Weighted out-degree normalization; dangling mass redistributed
    uniformly each round (standard formulation).  Fixed iteration count
    keeps the computation deterministic and resume-friendly.

    The dangling-mass scalar stays a lazy 1-row frame joined in via
    crossJoin — same shape as :func:`pagerank_fixed` — so no iteration
    syncs to the driver (an N-round job used to pay N collect round
    trips; at cluster scale each is a full-stage barrier).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst",
                     (F.col("weight") if "weight" in edges.columns
                      else F.lit(1)).cast("double").alias("w"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .dropDuplicates()).localCheckpoint()
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame(
            [], "node string, rank_micro6 long, rank double")

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e_norm = e.join(out_w, "src").withColumn(
        "share", F.col("w") / F.col("out_w")).select("src", "dst", "share")
    e_norm = e_norm.localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contribs = (e_norm.join(ranks.withColumnRenamed("node", "src"), "src")
                    .select("dst", (F.col("rank") * F.col("share")).alias("c"))
                    .groupBy("dst").agg(F.sum("c").alias("in_rank")))
        # dangling nodes (no out-edges) leak rank; redistribute uniformly
        dangling = (ranks.join(out_w.withColumnRenamed("src", "node"),
                               "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d")))
        ranks = (nodes.join(contribs.withColumnRenamed("dst", "node"),
                            "node", "left")
                 .crossJoin(dangling)  # 1-row frame: stays fully lazy
                 .select("node",
                         (F.lit(base)
                          + F.lit(damping) * (F.coalesce(F.col("in_rank"), F.lit(0.0))
                                              + F.col("d") / F.lit(float(n))))
                         .alias("rank"))
                 ).localCheckpoint()
    return ranks.select(
        "node", F.floor(F.col("rank") * 1000000).cast("long").alias("rank_micro6"),
        "rank")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph —
    the standard cohesion signal for entity-graph quality (a
    canonicalization that merges unrelated entities collapses
    triangle structure).

    Classic two-join formulation on ordered edges (a<b<c): each
    triangle is enumerated exactly once, then credited to its three
    corners.  Both joins are equi-joins on node ids; no enumeration
    of open wedges ever leaves the join.  Output: (node,
    n_triangles) for nodes in >= 1 triangle.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (e1.join(e2, "y").join(e3, ["x", "z"])
           .select("x", "y", "z"))
    corners = tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
    return (corners.groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))


def update_components(assign: DataFrame, new_edges: DataFrame,
                      new_nodes: DataFrame | None = None,
                      max_iter: int = 25) -> DataFrame:
    """INCREMENTAL connected-components maintenance — canonicalization
    under a live crawl: fold a batch of NEW edges into an existing
    (node, component) assignment without re-running CC over the full
    edge set.

    Correctness reduction: the old assignment is itself a spanning
    certificate of the old connectivity — encode each (node,
    component) row as an edge node—component, union the NEW edges,
    and run the same large-star/small-star CC on that.  The label
    edges are a STAR per old component (diameter 2), so convergence
    needs O(log of the merged-component count) rounds over an input
    of |nodes| + |new_edges| rows — independent of how many original
    edges built the assignment (at 10^12 docs the original edge set
    dwarfs the node set; never touching it is the point).  Component
    ids stay the lexicographic min node id, so unmerged components
    keep their id and downstream references stay valid.

    ``new_nodes``: optional (node) frame for isolated new nodes.
    Returns the full updated (node, component) assignment.
    """
    from .linking import connected_components

    label_edges = assign.select(F.col("node").alias("src"),
                                F.col("component").alias("dst"))
    edges = label_edges.unionByName(
        new_edges.select("src", "dst")).dropDuplicates()
    nodes = (assign.select("node")
             .union(new_edges.select(F.col("src").alias("node")))
             .union(new_edges.select(F.col("dst").alias("node"))))
    if new_nodes is not None:
        nodes = nodes.union(new_nodes.select("node"))
    return connected_components(edges, nodes.dropDuplicates(),
                                max_iter=max_iter)


def label_propagation(edges: DataFrame, nodes: DataFrame,
                      n_rounds: int = 5) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (the
    GraphFrames-free form of its labelPropagation): every node starts
    as its own label; each round, a node adopts the most frequent
    label among its neighbors, ties broken by the lexicographically
    smallest label — a fully deterministic variant of LPA (classic
    async LPA is run-order dependent; sync + stable tie-break makes
    the result a pure function of the graph, so it is testable against
    a serial replica and, rounds unrolled, oracle-expressible).

    Fixed ``n_rounds`` rather than convergence detection: sync LPA can
    2-cycle on bipartite-ish regions, so a fixpoint test may never
    fire; bounded rounds are the standard remedy (GraphFrames' maxIter
    contract) and keep the plan a fixed-depth chain of joins.

    ``edges``: (src, dst) undirected (either order); ``nodes``: (node)
    including isolated ones (they keep their own label).
    Returns (node, label) — communities are equal-label groups.

    Scale: per round, one shuffle to count (node, label) frequencies
    over the symmetrized edge list and one per-node window to pick the
    winner; localCheckpoint per round cuts lineage like the other
    iterative operators.
    """
    # Canonicalize orientation BEFORE symmetrizing: the contract says
    # "(src, dst) undirected (either order)", so an edge supplied in
    # both orientations must count as ONE neighbor relation, exactly
    # like the oracle's SQL UNION (which dedups across orientations).
    #
    # r06: sym is partitioned by dst ONCE and checkpointed (it was
    # recomputed from `edges` every round before), label frames stay
    # partitioned on the node id, and the per-node winner is a
    # min(struct) aggregate instead of a row_number window — same
    # winner (max n, tie -> lexicographically smallest label), but
    # with map-side partial aggregation and no per-round sort.
    und = (edges.select(F.least("src", "dst").alias("src"),
                        F.greatest("src", "dst").alias("dst"))
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = (und.union(und.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
           .repartition("dst").localCheckpoint())
    base = nodes.select("node").repartition("node").localCheckpoint()
    labels = base.withColumn("label", F.col("node"))
    for _ in range(n_rounds):
        nbr = (sym.join(labels.withColumnRenamed("node", "dst"), "dst")
               .select(F.col("src").alias("node"), "label"))
        freq = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("n"))
        winner = (freq.groupBy("node")
                  .agg(F.min(F.struct((-F.col("n")).alias("_nn"),
                                      F.col("label").alias("label")))
                       .alias("_w"))
                  .select("node", F.col("_w.label").alias("label")))
        labels = (base.join(winner, "node", "left")
                  .withColumn("label", F.coalesce("label", "node"))
                  .localCheckpoint())
    return labels.select("node", "label")


def k_core(edges: DataFrame, nodes: DataFrame, k: int = 2,
           n_rounds: "int | None" = None,
           max_iter: int = 50) -> DataFrame:
    """k-core membership: iteratively PEEL nodes whose degree among
    surviving nodes is < k until no node is removed — the classic
    dense-subgraph filter (Seidman '83; Batagelj-Zaversnik is the
    serial form) a KG pipeline uses to separate well-supported entity
    neighborhoods from crawl noise before expensive downstream steps.

    Deterministic (a pure function of the graph: the peel set per
    round is exactly {alive nodes with alive-degree < k}, no
    ordering), so it is testable against a serial replica and, rounds
    unrolled, oracle-expressible — ``n_rounds`` runs EXACTLY that many
    peels with no driver-side convergence sync (the fixed-depth chain
    the pagerank_fixed/lpa oracles use; extra rounds past convergence
    are no-ops since peeling a stable set removes nothing), while
    ``n_rounds=None`` iterates to the fixpoint with a 1-row count
    check per round (the connected_components pattern).

    ``edges``: (src, dst) undirected (either order, self-loops
    ignored); ``nodes``: (node) incl. isolated ones.
    Returns (node, in_core int) for every input node.

    Scale: per round one equi-join of the symmetrized edge list
    against the alive set (shrinks monotonically), one degree
    aggregate, localCheckpoint to cut lineage; rounds needed =
    longest peel cascade, typically << diameter.
    """
    und = (edges.select(F.least("src", "dst").alias("src"),
                        F.greatest("src", "dst").alias("dst"))
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    # r06: cluster sym on dst once — the alive-filter join on dst then
    # reuses it every peel round, leaving one exchange per round (the
    # degree aggregate's re-cluster by src; guide §2.4).
    sym = (und.union(und.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
           .repartition("dst").localCheckpoint())
    all_nodes = nodes.select("node").repartition("node") \
        .dropDuplicates().localCheckpoint()
    alive = all_nodes
    n_alive = None if n_rounds is not None else alive.count()
    rounds = n_rounds if n_rounds is not None else max_iter
    for _ in range(rounds):
        deg = (sym.join(alive.withColumnRenamed("node", "dst"), "dst")
               .join(alive.withColumnRenamed("node", "src"), "src")
               .groupBy("src")
               .agg(F.count(F.lit(1)).alias("_deg")))
        alive = (deg.where(F.col("_deg") >= k)
                 .select(F.col("src").alias("node"))
                 .localCheckpoint())
        if n_rounds is None:
            n_keep = alive.count()
            if n_keep == n_alive:
                break
            n_alive = n_keep
    return (all_nodes
            .join(alive.withColumn("in_core", F.lit(1)), "node", "left")
            .select("node", F.coalesce("in_core", F.lit(0))
                    .cast("int").alias("in_core")))


def k_truss(edges: DataFrame, k: int = 3,
            n_rounds: "int | None" = None,
            max_iter: int = 30) -> DataFrame:
    """k-truss edge peel over the undirected simple graph — the
    edge-level cohesion filter one notch stronger than k-core: an
    edge survives iff it participates in >= k-2 triangles whose other
    two edges also survive.  KG hygiene use: k-truss(3+) keeps only
    relation edges corroborated by a closed co-occurrence triangle,
    cutting promiscuous hub links that degree-based peels (k-core)
    cannot see.

    Each round re-counts per-edge support via the same two-equi-join
    ordered triangle enumeration as :func:`triangle_counts` restricted
    to alive edges (a<b<c, each triangle once, credited to its three
    edges), then drops alive edges with support < k-2.  ``n_rounds``
    fixes the peel depth (rounds past convergence are no-ops — the
    unrolled DuckDB oracle's form); ``None`` iterates to fixpoint
    with a bounded per-round count() sync.

    Scale: per round two equi-joins on node ids over the (shrinking)
    alive edge set plus one aggregate — no open-wedge enumeration
    leaves the joins; localCheckpoint cuts lineage.  Output: every
    input canonical edge as (src, dst, in_truss 0/1).
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    alive = und
    n_alive = None if n_rounds is not None else alive.count()
    rounds = n_rounds if n_rounds is not None else max_iter
    for _ in range(rounds):
        e1 = alive.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = alive.select(F.col("a").alias("y"), F.col("b").alias("z"))
        e3 = alive.select(F.col("a").alias("x"), F.col("b").alias("z"))
        tri = e1.join(e2, "y").join(e3, ["x", "z"]).select("x", "y", "z")
        sup = (tri.select(F.explode(F.array(
            F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
            F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
            F.struct(F.col("x").alias("a"), F.col("z").alias("b"))))
            .alias("e"))
            .select("e.a", "e.b")
            .groupBy("a", "b").agg(F.count(F.lit(1)).alias("_sup")))
        alive = (alive.join(sup, ["a", "b"])
                 .where(F.col("_sup") >= k - 2)
                 .select("a", "b").localCheckpoint())
        if n_rounds is None:
            n_keep = alive.count()
            if n_keep == n_alive:
                break
            n_alive = n_keep
    return (und.join(alive.withColumn("in_truss", F.lit(1)),
                     ["a", "b"], "left")
            .select(F.col("a").alias("src"), F.col("b").alias("dst"),
                    F.coalesce("in_truss", F.lit(0))
                    .cast("int").alias("in_truss")))


def random_walks(edges: DataFrame, nodes: DataFrame,
                 walk_len: int = 4,
                 walks_per_node: int = 2) -> DataFrame:
    """DeepWalk-style walk corpus over the entity graph — the
    embedding-training precursor (Perozzi et al., KDD'14): for every
    node, ``walks_per_node`` truncated walks of up to ``walk_len``
    steps.  The next hop is DETERMINISTIC — the neighbor minimizing
    md5(start:walk:step:neighbor) — so the walk table is reproducible
    across engines, partitionings, and reruns (the md5 argmin IS the
    per-(walk, step) uniform draw; no RNG state).

    Scale: step t is one equi-join of the current frontier (<=
    |nodes| * walks_per_node rows) against the symmetrized edge list
    on the current node, then a per-(start, walk) argmin — walk
    state never exceeds one row per active walk, and the edge list is
    never materialized per-walk.  Dead-end walks stop early (their
    later-step rows are simply absent).  Output: (start, walk, step,
    node) with step 0 = the start node itself.
    """
    # r06: sym is clustered on src once (each step joins the walk
    # frontier on it — only the frontier is exchanged per step), and
    # the per-(start, walk) argmin is a min(struct) AGGREGATE instead
    # of a row_number window: identical winner (lexicographic min over
    # (_h, dst)), but partial aggregation collapses the deg-fanout
    # map-side, so the per-step exchange carries ~one row per active
    # walk instead of one per (walk, neighbor) — and no sort.
    und = (edges.select(F.least("src", "dst").alias("src"),
                        F.greatest("src", "dst").alias("dst"))
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = (und.union(und.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
           .repartition("src").localCheckpoint())
    cur = (nodes.select(F.col("node").alias("start"))
           .dropDuplicates()
           .select("start", F.explode(F.sequence(
               F.lit(0), F.lit(walks_per_node - 1))).alias("walk"))
           .select("start", F.col("walk").cast("int").alias("walk"),
                   F.lit(0).alias("step"),
                   F.col("start").alias("node")))
    out = cur
    for t in range(1, walk_len + 1):
        hop = (cur.select("start", "walk", "node")
               .join(sym, cur["node"] == sym["src"])
               .select("start", "walk", "dst",
                       F.md5(F.concat_ws(
                           ":", "start", "walk", F.lit(t), "dst"))
                       .alias("_h")))
        cur = (hop.groupBy("start", "walk")
               .agg(F.min(F.struct(F.col("_h").alias("_h"),
                                   F.col("dst").alias("dst")))
                    .alias("_w"))
               .select("start", "walk", F.lit(t).alias("step"),
                       F.col("_w.dst").alias("node"))
               .localCheckpoint())
        out = out.unionByName(cur)
    return out.select("start", "walk",
                      F.col("step").cast("int").alias("step"), "node")


def link_prediction(edges: DataFrame,
                    max_deg: "int | None" = None) -> DataFrame:
    """Link-prediction scores for every NON-edge 2-hop pair — the KG
    completion primitive (reference's graph is static,
    `utils.py:148-236` only renders it; predicting missing relation
    edges is the construction-pipeline extension): rank candidate
    entity pairs that share neighbors but have no edge yet.

    Scores per candidate pair (src < dst, not an existing edge,
    >= 1 common neighbor):
    - ``cn``             common-neighbor count,
    - ``jaccard_micro6`` floor(1e6 * cn / (deg(src)+deg(dst)-cn)) —
      integer-scaled neighborhood Jaccard (floor division both
      engines, all values non-negative, so cross-engine exact).

    Plan: symmetrize once; candidate pairs come from the wedge
    self-join (two equi-joins on the shared-neighbor id — the
    triangle_counts join shape), one (pair) aggregate, one anti-join
    against the existing edge set, two broadcast-sized degree joins.
    Never all-pairs.  At web scale the wedge join is quadratic in the
    max degree, so ``max_deg`` (when set) drops super-hub pivot
    nodes from candidate GENERATION — the standard cap (hubs connect
    everything; wedges through them carry no signal) — while degrees
    and existing-edge filtering stay exact.
    """
    und = (edges.select(F.least("src", "dst").alias("src"),
                        F.greatest("src", "dst").alias("dst"))
           .where(F.col("src") != F.col("dst")).dropDuplicates()
           .localCheckpoint())
    sym = und.union(und.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    pivot = sym.select(F.col("src").alias("n"), F.col("dst").alias("a"))
    if max_deg is not None:
        keep = deg.where(F.col("deg") <= max_deg).select(
            F.col("node").alias("n"))
        pivot = pivot.join(keep, "n")
    wedges = (pivot.join(pivot.select(F.col("n"),
                                      F.col("a").alias("b")), "n")
              .where(F.col("a") < F.col("b")))
    cand = (wedges.groupBy(F.col("a").alias("src"),
                           F.col("b").alias("dst"))
            .agg(F.count(F.lit(1)).cast("long").alias("cn"))
            .join(und, ["src", "dst"], "left_anti"))
    da = deg.select(F.col("node").alias("src"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("dst"), F.col("deg").alias("_db"))
    return (cand.join(da, "src").join(db, "dst")
            .select("src", "dst", "cn",
                    # integer DIV keeps the score in the BIGINT domain
                    # (never a float): exact cross-engine vs DuckDB //
                    F.expr("(cn * 1000000) DIV (_da + _db - cn)")
                    .cast("long").alias("jaccard_micro6")))


def walk_centrality(walks: DataFrame) -> DataFrame:
    """Walk-visit centrality — the deterministic approximate
    centrality the DeepWalk corpus gives for free: how often each
    node is VISITED across all truncated walks (visit frequency
    approximates the degree-biased stationary distribution the walks
    sample; nodes bridging many walks score high).  Input is
    :func:`random_walks` output (start, walk, step, node); output
    (node, n_visits, n_walks_through, n_starts) where
    n_walks_through counts distinct (start, walk) passages and
    n_starts the step-0 rows (walks the node itself launched).

    Plan: two hash-aggregates over the walk table (the distinct
    passage count pre-aggregates per (node, start, walk) — both
    map-side combinable, keyed shuffles only."""
    visits = (walks.groupBy("node")
              .agg(F.count(F.lit(1)).cast("long").alias("n_visits"),
                   F.sum(F.when(F.col("step") == 0, 1).otherwise(0))
                   .cast("long").alias("n_starts")))
    through = (walks.select("node", "start", "walk").dropDuplicates()
               .groupBy("node")
               .agg(F.count(F.lit(1)).cast("long")
                    .alias("n_walks_through")))
    return (visits.join(through, "node")
            .select("node", "n_visits", "n_walks_through", "n_starts"))


def degree_distribution(edges: DataFrame) -> DataFrame:
    """Degree distribution of an undirected graph — the standard KG
    health metric (power-law tail = hub formation, mass at degree 1 =
    fragmentation): (degree, n_nodes) from (src, dst) edges supplied
    in either orientation.  Canonical-orient + dedup first (the
    round-4 LPA fix), symmetrize, one degree aggregate, one
    distribution aggregate — two keyed shuffles total, each
    map-side combinable; isolated nodes are absent by construction
    (degree >= 1), callers union a zero bucket if they track them."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    sym = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node")))
    deg = sym.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node — the per-node refinement
    of :func:`triangle_counts` (Watts-Strogatz): what fraction of a
    node's neighbor pairs are themselves connected.  A canonical merge
    that fuses unrelated entities shows up as hub nodes with near-zero
    coefficient, so this is the node-level alarm the global triangle
    count cannot localize.

    Output (node, degree, n_triangles, cc_micro6) for nodes with
    degree >= 2 (the coefficient is undefined below that);
    cc_micro6 = floor(2e6 * n_triangles / (degree * (degree - 1))),
    exact integer arithmetic, cross-engine deterministic.

    Plan: the ordered-edge triangle enumeration (equi-joins only) plus
    one degree aggregate, stitched with a single left equi-join on
    node — no wedge enumeration leaves a join, no new shuffle class
    over :func:`triangle_counts`."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    sym = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node")))
    deg = sym.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("degree"))
    tri = triangle_counts(und.select(F.col("a").alias("src"),
                                     F.col("b").alias("dst")))
    return (deg.where(F.col("degree") >= 2)
            .join(tri, "node", "left")
            .select("node", "degree",
                    F.coalesce(F.col("n_triangles"), F.lit(0))
                    .cast("long").alias("n_triangles"),
                    F.expr("CAST(2000000 * coalesce(n_triangles, 0) DIV "
                           "(degree * (degree - 1)) AS BIGINT)")
                    .alias("cc_micro6")))


def hits_fixed(edges: DataFrame, n_iter: int = 5,
               scale: int = 10**6) -> DataFrame:
    """Integer fixed-point HITS (Kleinberg hubs & authorities) over
    the directed KG edge table — the companion centrality to
    :func:`pagerank_fixed`: a subject that points at many
    well-attested object entities is a hub; an object entity cited by
    many good hubs is an authority.

    Same oracle-exact discipline as ``pagerank_fixed``: every score is
    a non-negative BIGINT in units of 1/scale, sums are integer (so
    partition/summation order can't drift the result), and the
    per-round normalization divides by the round MAX with floor —

        hub_0    = scale everywhere
        auth_i   = (sum over in-edges of hub_{i-1}) * scale // max
        hub_i    = (sum over out-edges of auth_i)   * scale // max

    Overflow bound: a round sum is <= scale * max_degree and the
    normalization multiplies by scale before dividing, so the biggest
    intermediate is scale^2 * max_degree = 1e12 * max_degree — int64-
    safe to ~9e6 in-degree at the default scale (document-entity KG
    degrees; raise via salted pre-aggregation before going past that).

    Plan: per round, two equi-joins of the edge list against a
    node-score table plus two 1-row MAX aggregates kept lazy as
    crossJoins (the pagerank dangling-mass device) — no driver sync
    inside the loop; ``localCheckpoint`` per round caps lineage."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").dropDuplicates().localCheckpoint()
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .dropDuplicates()).localCheckpoint()
    if nodes.isEmpty():
        return spark.createDataFrame(
            [], "node string, auth_u long, hub_u long")
    hub = nodes.withColumn("hub_u", F.lit(scale).cast("long"))
    auth = nodes.withColumn("auth_u", F.lit(0).cast("long"))
    for _ in range(n_iter):
        a_raw = (e.join(hub.withColumnRenamed("node", "src"), "src")
                 .groupBy("dst")
                 .agg(F.sum("hub_u").cast("long").alias("raw")))
        a_all = (nodes.join(a_raw.withColumnRenamed("dst", "node"),
                            "node", "left")
                 .select("node", F.coalesce("raw", F.lit(0))
                         .cast("long").alias("raw")))
        a_mx = a_all.agg(F.max("raw").alias("mx"))
        auth = (a_all.crossJoin(a_mx)  # 1-row frame: stays lazy
                .select("node",
                        F.expr(f"CAST((raw * {scale}) DIV mx AS BIGINT)")
                        .alias("auth_u"))).localCheckpoint()
        h_raw = (e.join(auth.withColumnRenamed("node", "dst"), "dst")
                 .groupBy("src")
                 .agg(F.sum("auth_u").cast("long").alias("raw")))
        h_all = (nodes.join(h_raw.withColumnRenamed("src", "node"),
                            "node", "left")
                 .select("node", F.coalesce("raw", F.lit(0))
                         .cast("long").alias("raw")))
        h_mx = h_all.agg(F.max("raw").alias("mx"))
        hub = (h_all.crossJoin(h_mx)
               .select("node",
                       F.expr(f"CAST((raw * {scale}) DIV mx AS BIGINT)")
                       .alias("hub_u"))).localCheckpoint()
    return (auth.join(hub, "node")
            .select("node", "auth_u", "hub_u"))


def wl_labels(edges: DataFrame, nodes: DataFrame,
              n_rounds: int = 3) -> DataFrame:
    """Weisfeiler-Lehman label refinement — every node's structural-
    role fingerprint after ``n_rounds`` of neighborhood hashing
    (Shervashidze et al., JMLR 2011; the WL-kernel relabeling), plus
    the population of its role class.  Two nodes get the same final
    label iff WL cannot distinguish their rooted neighborhoods — the
    cheap structural-equivalence sketch used for graph dedup, role
    discovery, and isomorphism pre-filtering.

        lbl_0 = str(degree)
        lbl_i = md5(lbl_{i-1} || '|' || sorted ','-join of
                    neighbors' lbl_{i-1})

    Deterministic and oracle-exact: the sorted join makes the relabel
    independent of partitioning, and md5 hex agrees across engines.
    Plan per round: one equi-join of the symmetric edge list against
    the label table + one sorted-list aggregate — state per node is
    its neighbor-label list, bounded by degree; ``localCheckpoint``
    per round caps lineage.  Output (node, wl_label, n_role)."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    sym = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .union(und.select(F.col("b").alias("src"),
                             F.col("a").alias("dst")))).localCheckpoint()
    deg = sym.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    lbl = (nodes.join(deg.withColumnRenamed("src", "node"),
                      "node", "left")
           .select("node", F.coalesce("deg", F.lit(0))
                   .cast("string").alias("lbl"))).localCheckpoint()
    for _ in range(n_rounds):
        nbs = (sym.join(lbl.withColumnRenamed("node", "dst"), "dst")
               .groupBy("src")
               .agg(F.array_join(F.array_sort(F.collect_list("lbl")),
                                 ",").alias("nbs")))
        lbl = (lbl.join(nbs.withColumnRenamed("src", "node"),
                        "node", "left")
               .select("node",
                       F.md5(F.concat(F.col("lbl"), F.lit("|"),
                                      F.coalesce("nbs", F.lit(""))))
                       .alias("lbl"))).localCheckpoint()
    hist = lbl.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("n_role"))
    return (lbl.join(hist, "lbl")
            .select("node", F.col("lbl").alias("wl_label"), "n_role"))


def bellman_ford_fixed(edges: DataFrame, source: str,
                       n_rounds: int = 5) -> DataFrame:
    """Weighted shortest paths by fixed-round min-plus relaxation
    (Bellman-Ford) — the weighted companion to :func:`bfs_levels`:
    hop count treats a 1-document co-mention like a 1000-document one;
    here stronger edges are cheaper, cost = 1e6 DIV weight, so the
    distance ranks entities by evidence-weighted proximity.

    All-integer min-plus algebra (sums and MINs of BIGINTs), so the
    result is partition-order independent and a DuckDB oracle that
    unrolls the rounds matches bit-exactly.  After k rounds the
    distances are exact for all shortest paths of <= k edges — the
    bounded-horizon contract, same as ppr_fixed's fixed rounds.

    Plan per round: one edge-list equi-join against the current
    distance table + one MIN aggregate; localCheckpoint caps lineage.
    Output: (node, dist_cost) for nodes reached within ``n_rounds``
    edges."""
    inf = 1 << 60
    e = (edges.select("src", "dst",
                      (F.col("weight") if "weight" in edges.columns
                       else F.lit(1)).cast("long").alias("w"))
         .groupBy("src", "dst")
         .agg(F.sum("w").cast("long").alias("w"))
         .select("src", "dst",
                 F.expr("CAST(1000000 DIV w AS BIGINT)").alias("cost"))
         .localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .dropDuplicates()).localCheckpoint()
    dist = nodes.withColumn(
        "d", F.when(F.col("node") == source, F.lit(0))
        .otherwise(F.lit(inf)).cast("long"))
    for _ in range(n_rounds):
        relax = (e.join(dist.withColumnRenamed("node", "src"), "src")
                 .where(F.col("d") < inf)
                 .select(F.col("dst").alias("node"),
                         (F.col("d") + F.col("cost")).alias("nd"))
                 .groupBy("node")
                 .agg(F.min("nd").cast("long").alias("nd")))
        dist = (dist.join(relax, "node", "left")
                .select("node",
                        F.least(F.col("d"),
                                F.coalesce("nd", F.lit(inf)))
                        .cast("long").alias("d"))).localCheckpoint()
    return (dist.where(F.col("d") < inf)
            .select("node", F.col("d").alias("dist_cost")))


def degree_assortativity_stats(edges: DataFrame) -> DataFrame:
    """Degree-assortativity SUFFICIENT STATISTICS — the exact-integer
    form of Newman's degree correlation: over every undirected edge
    (counted once per orientation, the standard convention), the six
    sums Pearson's r needs on the endpoint-degree pairs (x, y):

        n, sx, sy, sxy, sxx, syy       (all BIGINT, exact)

    Emitting the sums instead of r keeps the operator value-exact
    across engines (r itself needs a sqrt); any client computes
    r = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2)) from
    the one output row.  Plan: one degree aggregate, two equi-joins to
    attach endpoint degrees, one global 1-row sum — the classic
    two-pass distributed moment computation, no driver loops.

    Numeric envelope: sxy/sxx sum deg_a * deg_b per edge row —
    int64-safe while n_edges * max_deg^2 <= 9.2e18 (e.g. 1e10 edges
    at max degree 3e4).  Past that, compute the moments per partition
    into DECIMAL(38,0) or subtract per-group means first; Spark ANSI
    mode raises on overflow rather than wrapping silently."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
        .union(und.select(F.col("b").alias("src"),
                          F.col("a").alias("dst")))
    deg = sym.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    pairs = (sym
             .join(deg.select(F.col("src"), F.col("deg").alias("x")),
                   "src")
             .join(deg.select(F.col("src").alias("dst"),
                              F.col("deg").alias("y")), "dst"))
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
        F.sum(F.expr("y * y")).cast("long").alias("syy"))


def community_stats(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Community-quality report over a node partition (e.g. the LPA
    labels): per community, its size, internal-edge count, cut-edge
    count, volume, and CONDUCTANCE — cut / min(vol, 2m - vol), the
    standard "is this community real or an artifact" score a
    canonicalization pipeline gates merges on (low conductance = the
    cluster is denser inside than at its boundary).

    Conductance is an exact integer ratio (cut * 1e6 DIV min(vol,
    2m - vol), both operands non-negative BIGINTs), so the DuckDB
    oracle matches bit-exactly; communities whose denominator is 0
    (isolated nodes, or one community owning every edge endpoint)
    keep their row with a NULL conductance — sizes and edge counts
    are still meaningful there, only the ratio is undefined.

    Plan: two equi-joins to attach endpoint labels, three grouped
    counts, and ONE 1-row total-edge aggregate kept lazy as a
    crossJoin (the pagerank dangling-mass device) — every other
    shuffle is on the community key."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    lab = labels.select("node", "label")
    e2 = (und.join(lab.select(F.col("node").alias("a"),
                              F.col("label").alias("la")), "a")
          .join(lab.select(F.col("node").alias("b"),
                           F.col("label").alias("lb")), "b"))
    e_in = (e2.where(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("label"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_internal")))
    cut_sides = (e2.where(F.col("la") != F.col("lb"))
                 .select(F.col("la").alias("label"))
                 .unionAll(e2.where(F.col("la") != F.col("lb"))
                           .select(F.col("lb").alias("label"))))
    cut = cut_sides.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_cut"))
    sym = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node")))
    deg = sym.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    per_lab = (lab.join(deg, "node", "left")
               .groupBy("label")
               .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                    F.coalesce(F.sum("deg"), F.lit(0)).cast("long")
                    .alias("vol")))
    m_tot = und.agg(F.count(F.lit(1)).cast("long").alias("m2")) \
        .select((F.col("m2") * 2).alias("two_m"))
    return (per_lab
            .join(e_in, "label", "left")
            .join(cut, "label", "left")
            .crossJoin(m_tot)  # 1-row frame: stays lazy/distributed
            .select("label", "n_nodes",
                    F.coalesce("n_internal", F.lit(0)).cast("long")
                    .alias("n_internal"),
                    F.coalesce("n_cut", F.lit(0)).cast("long")
                    .alias("n_cut"),
                    "vol", "two_m")
            .select("label", "n_nodes", "n_internal", "n_cut", "vol",
                    F.expr("CAST(CASE WHEN least(vol, two_m - vol) > 0"
                           " THEN n_cut * 1000000"
                           " DIV least(vol, two_m - vol)"
                           " ELSE NULL END AS BIGINT)")
                    .alias("cond_micro6")))


def partition_agreement(labels_a: DataFrame,
                        labels_b: DataFrame) -> DataFrame:
    """Pair-level agreement between two node partitions — the Rand-
    index decomposition every clustering evaluation starts from,
    computed WITHOUT enumerating pairs: with contingency cells
    n_{ij} = |cluster_i(A) ∩ cluster_j(B)| and C2(n) = n*(n-1)/2,

        pairs_both = Σ_ij C2(n_ij)        same cluster in A AND B
        pairs_a    = Σ_i  C2(n_i·)        same cluster in A
        pairs_b    = Σ_j  C2(n_·j)        same cluster in B
        precision  = pairs_both / pairs_a   (A's merges confirmed by B)
        recall     = pairs_both / pairs_b   (B's pairs found by A)

    All counts are exact BIGINTs (n*(n-1) is always even, so the DIV 2
    is exact) and the ratios floor to micro6 — value-exact cross-
    engine.  Used here to score the LPA communities against the
    connected components of the same graph (CC = the connectivity
    ground truth; LPA refines it, so recall < 1 measures how much LPA
    splits components).

    Plan: one equi-join on node, three grouped sums — no pair
    enumeration anywhere, so a 10^9-node partition costs three
    aggregates."""
    j = (labels_a.select("node", F.col("label").alias("_la"))
         .join(labels_b.select("node", F.col("label").alias("_lb")),
               "node"))
    cells = j.groupBy("_la", "_lb").agg(
        F.count(F.lit(1)).cast("long").alias("n"))

    def c2(col):
        return F.sum(F.expr(f"({col} * ({col} - 1)) DIV 2")) \
            .cast("long")

    both = cells.agg(F.sum(F.lit(0) + F.col("n")).cast("long")
                     .alias("n_nodes"),
                     c2("n").alias("pairs_both"))
    pa = (cells.groupBy("_la").agg(F.sum("n").cast("long").alias("n"))
          .agg(c2("n").alias("pairs_a")))
    pb = (cells.groupBy("_lb").agg(F.sum("n").cast("long").alias("n"))
          .agg(c2("n").alias("pairs_b")))
    return (both.crossJoin(pa).crossJoin(pb)  # three 1-row frames
            .select("n_nodes", "pairs_both", "pairs_a", "pairs_b",
                    F.expr("CAST(CASE WHEN pairs_a > 0 THEN"
                           " pairs_both * 1000000 DIV pairs_a"
                           " ELSE NULL END AS BIGINT)")
                    .alias("precision_micro6"),
                    F.expr("CAST(CASE WHEN pairs_b > 0 THEN"
                           " pairs_both * 1000000 DIV pairs_b"
                           " ELSE NULL END AS BIGINT)")
                    .alias("recall_micro6")))


def typed_wedges(edges: DataFrame, types: DataFrame,
                 max_degree: int = 1000) -> DataFrame:
    """Typed 2-hop connectivity profile (metapath counts): how many
    open wedges x—mid—z exist per (endpoint-type, middle-type,
    endpoint-type) triple — the schema-level answer to "which entity
    types BRIDGE which", the connectivity companion to the
    schema_graph edge summary.

    Hub exclusion is the skew guard: a node of degree d centers d^2/2
    wedges, so nodes above ``max_degree`` are dropped from the MIDDLE
    role first (the standard wedge-sampling discipline) — the output
    then costs Σ min(deg, cap)^2 instead of Σ deg^2.  Endpoint types
    are canonicalized with least/greatest so each unordered wedge
    counts once.

    ``types``: (node, major_type) — the entity_type_election output
    lifted to whatever node ids the edges use."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
        .union(und.select(F.col("b").alias("src"),
                          F.col("a").alias("dst")))
    deg = sym.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    ok_mid = deg.where(F.col("deg") <= max_degree).select(
        F.col("src").alias("mid"))
    left = sym.select(F.col("dst").alias("mid"), F.col("src").alias("x"))
    right = sym.select(F.col("src").alias("mid"),
                       F.col("dst").alias("z"))
    w = (left.join(ok_mid, "mid")
         .join(right, "mid")
         .where(F.col("x") < F.col("z")))
    t = types.select("node", "major_type")
    return (w.join(t.select(F.col("node").alias("x"),
                            F.col("major_type").alias("tx")), "x")
            .join(t.select(F.col("node").alias("mid"),
                           F.col("major_type").alias("tm")), "mid")
            .join(t.select(F.col("node").alias("z"),
                           F.col("major_type").alias("tz")), "z")
            .groupBy(F.least("tx", "tz").alias("type_a"),
                     F.col("tm").alias("type_mid"),
                     F.greatest("tx", "tz").alias("type_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_wedges")))


def chain_patterns(edges: DataFrame, hub_cap: int = 1000) -> DataFrame:
    """Directed 2-hop property-path profile over the KG edge table —
    the SPARQL path-query planner's statistics: for every predicate
    pair (p1, p2), how many x -p1-> mid -p2-> z chains exist, through
    how many distinct mid nodes, reaching how many distinct (x, z)
    endpoint pairs.  This is what a query optimizer consults before
    executing ``?x p1/p2 ?z`` and what schema discovery reads to learn
    which predicates COMPOSE (generalizing the reference's fixed
    drug->attribute two-level schema, ehr.py:239-258, to arbitrary
    chains).

    Hub cap = the wedge-sampling skew guard (same discipline as
    typed_wedges): a mid node of in-degree a and out-degree b centers
    a*b chains, so nodes above ``hub_cap`` on EITHER side are excluded
    from the middle role, bounding the join fanout at Σ min(in,cap) *
    min(out,cap) instead of Σ in*out.  Both degree tables and the
    chain join itself are plain equi-joins on the mid key — no
    all-pairs product anywhere.

    ``edges``: (subj_node, pred, obj_node[, weight]) — the
    materialize_edges output (one row per distinct typed edge)."""
    e = edges.select("subj_node", "pred", "obj_node")
    ind = (e.groupBy(F.col("obj_node").alias("mid"))
           .agg(F.countDistinct("subj_node").alias("_in")))
    outd = (e.groupBy(F.col("subj_node").alias("mid"))
            .agg(F.countDistinct("obj_node").alias("_out")))
    mids = (ind.join(outd, "mid")
            .where((F.col("_in") <= hub_cap)
                   & (F.col("_out") <= hub_cap))
            .select("mid"))
    left = e.select(F.col("subj_node").alias("x"),
                    F.col("pred").alias("pred_a"),
                    F.col("obj_node").alias("mid"))
    right = e.select(F.col("subj_node").alias("mid2"),
                     F.col("pred").alias("pred_b"),
                     F.col("obj_node").alias("z"))
    return (left.join(mids, "mid")
            .join(right, F.col("mid") == F.col("mid2"))
            .groupBy("pred_a", "pred_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_chains"),
                 F.countDistinct("x", "z").cast("long").alias("n_paths"),
                 F.countDistinct("mid").cast("long").alias("n_mids")))


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """EXACT integer Newman modularity decomposition over a node
    partition (e.g. the LPA labels): per community c, the scaled
    contribution  q4m2 = 4·m·L_c − D_c²,  where m is the undirected
    edge count, L_c the community's internal edges and D_c its degree
    volume.  Newman's Q = Σ_c (L_c/m − (D_c/2m)²) = Σ_c q4m2 / (4m²),
    so the decomposition is Q scaled by the EXACT rational 4m² — no
    float and no signed integer division ever materializes (signed
    floor-vs-truncate is the one device Spark and DuckDB disagree
    on), which is what makes the oracle bit-exact.  The caller
    recovers Q (or ΔQ for a proposed merge) by one driver-side
    division.

    int64 envelope: |q4m2| ≤ 4m², so the column is exact for graphs
    up to m ≈ 1.5·10⁹ edges; beyond that, run the decomposition per
    connected component (m is then the component's edge count), which
    is also the numerically meaningful unit for merge gating.

    Output: (label, n_nodes, n_internal, vol, m, q4m2).  Plan: the
    same shape as community_stats — two label equi-joins, grouped
    counts, and the 1-row edge total kept lazy as a crossJoin (the
    pagerank dangling-mass device)."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    lab = labels.select("node", "label")
    e2 = (und.join(lab.select(F.col("node").alias("a"),
                              F.col("label").alias("la")), "a")
          .join(lab.select(F.col("node").alias("b"),
                           F.col("label").alias("lb")), "b"))
    e_in = (e2.where(F.col("la") == F.col("lb"))
            .groupBy(F.col("la").alias("label"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_internal")))
    sym = und.select(F.col("a").alias("node")).unionAll(
        und.select(F.col("b").alias("node")))
    deg = sym.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    per_lab = (lab.join(deg, "node", "left")
               .groupBy("label")
               .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                    F.coalesce(F.sum("deg"), F.lit(0)).cast("long")
                    .alias("vol")))
    m_tot = und.agg(F.count(F.lit(1)).cast("long").alias("m"))
    return (per_lab.join(e_in, "label", "left")
            .crossJoin(m_tot)  # 1-row frame: stays lazy
            .select("label", "n_nodes",
                    F.coalesce("n_internal", F.lit(0)).cast("long")
                    .alias("n_internal"),
                    "vol", "m",
                    (F.lit(4) * F.col("m")
                     * F.coalesce("n_internal", F.lit(0))
                     - F.col("vol") * F.col("vol"))
                    .cast("long").alias("q4m2")))


def _min_reach_labels(nodes: DataFrame, edges: DataFrame,
                      max_rounds: int = 64) -> DataFrame:
    """Fixpoint of the joint min-label recurrences over a directed
    edge set: f(u) = min id u can REACH (relaxed along out-edges),
    b(u) = min id that REACHES u (relaxed along in-edges).  Both are
    computed in the SAME round-loop so each round costs two keyed
    aggregates + one node-keyed join and ONE convergence check.

    Rounds needed = directed diameter of the graph; each round
    localCheckpoints to cut lineage.  Returns (node, f, b).
    """
    lbl = nodes.select("node",
                       F.col("node").alias("f"),
                       F.col("node").alias("b")).localCheckpoint()
    for _ in range(max_rounds):
        nf = (edges.join(lbl.select(F.col("node").alias("dst"),
                                    F.col("f").alias("df")), "dst")
              .groupBy(F.col("src").alias("node"))
              .agg(F.min("df").alias("nf")))
        nb = (edges.join(lbl.select(F.col("node").alias("src"),
                                    F.col("b").alias("sb")), "src")
              .groupBy(F.col("dst").alias("node"))
              .agg(F.min("sb").alias("nb")))
        new = (lbl.join(nf, "node", "left").join(nb, "node", "left")
               .select("node",
                       F.least("f", F.coalesce("nf", "f")).alias("f"),
                       F.least("b", F.coalesce("nb", "b")).alias("b"))
               ).localCheckpoint()
        changed = (new.join(lbl.select("node",
                                       F.col("f").alias("of"),
                                       F.col("b").alias("ob")), "node")
                   .where((F.col("f") != F.col("of"))
                          | (F.col("b") != F.col("ob")))
                   .limit(1).count())
        lbl = new
        if changed == 0:
            return lbl
    raise RuntimeError("min-reach fixpoint did not converge within "
                       f"{max_rounds} rounds")


def strongly_connected_components(edges: DataFrame, nodes: DataFrame,
                                  max_peels: int = 30,
                                  max_rounds: int = 64) -> DataFrame:
    """Strongly connected components of a DIRECTED graph by
    forward-backward min-label peeling (the DataFrame rendition of
    the FW-BW-Trim family — Fleischer et al., divide-and-conquer SCC,
    as used by every Pregel-style SCC since).

    Per peel: compute f(u) = min id u reaches and b(u) = min id
    reaching u (one joint fixpoint, see _min_reach_labels).  Within
    one SCC the reachability sets — hence f and b — are constant, and
    f(u) = b(u) = m certifies u is in SCC(m) (u reaches m AND m
    reaches u).  All such nodes peel off with scc_id = f; the rest
    (f != b) go another round on the induced subgraph.  Every peel
    removes at least the SCC containing the smallest remaining id, so
    the loop terminates in <= #SCC peels — on real web-shaped graphs
    the first peel removes the giant core plus every singleton whose
    min-reach loops back, leaving a short tail.

    ``edges``: (src, dst) directed.  ``nodes``: (node) including
    isolated ids (they peel immediately as singletons).
    Returns (node, scc_id), scc_id = lexicographic min member id.

    Scale: everything is equi-joins + keyed min-aggregates over
    node-sized frames; the edge set is filtered to the remaining
    nodes by two semi-joins per peel and localCheckpointed, so late
    peels run on shrinking inputs.
    """
    cur_edges = (edges.select("src", "dst")
                 .where(F.col("src") != F.col("dst"))
                 .dropDuplicates().localCheckpoint())
    remaining = nodes.select("node").dropDuplicates().localCheckpoint()
    out: DataFrame | None = None
    for _ in range(max_peels):
        if remaining.isEmpty():
            break
        fb = _min_reach_labels(remaining, cur_edges, max_rounds)
        done = (fb.where(F.col("f") == F.col("b"))
                .select("node", F.col("f").alias("scc_id"))
                .localCheckpoint())
        out = done if out is None else out.unionByName(done).localCheckpoint()
        remaining = (fb.where(F.col("f") != F.col("b"))
                     .select("node").localCheckpoint())
        cur_edges = (cur_edges
                     .join(remaining.select(F.col("node").alias("src")),
                           "src", "semi")
                     .join(remaining.select(F.col("node").alias("dst")),
                           "dst", "semi")
                     .select("src", "dst").localCheckpoint())
    else:
        if not remaining.isEmpty():
            raise RuntimeError(
                f"SCC peeling did not finish within {max_peels} peels")
    assert out is not None
    return out


def bowtie_structure(edges: DataFrame, scc: DataFrame,
                     max_rounds: int = 64) -> DataFrame:
    """Bowtie decomposition of a directed graph relative to its giant
    SCC (Broder et al., "Graph structure in the Web", WWW 2000):
    CORE = the largest SCC (ties -> smallest scc_id), IN = nodes that
    reach the core but are not in it, OUT = nodes the core reaches,
    OTHER = tendrils/tubes/disconnected.

    The core id is a 1-row bounded collect (argmax over the SCC-size
    table — component-count-sized, never corpus-sized).  IN and OUT
    are two flag-propagation fixpoints seeded at the core membership
    (frontier BFS along reversed / forward edges); each round is one
    equi-join + dedup + an emptiness check on the new frontier.

    ``scc``: (node, scc_id) as returned by
    strongly_connected_components over the SAME edge set.
    Returns (node, bowtie_class, scc_id).
    """
    sizes = (scc.groupBy("scc_id")
             .agg(F.count(F.lit(1)).alias("n")))
    core_id = (sizes.orderBy(F.col("n").desc(), F.col("scc_id").asc())
               .limit(1).collect()[0]["scc_id"])  # bounded: 1 row
    core = (scc.where(F.col("scc_id") == F.lit(core_id))
            .select("node").localCheckpoint())
    dedges = (edges.select("src", "dst")
              .where(F.col("src") != F.col("dst"))
              .dropDuplicates().localCheckpoint())

    def _reach(seed: DataFrame, srccol: str, dstcol: str) -> DataFrame:
        """All nodes with a directed path to/from the seed set,
        following edges dstcol -> srccol per round (frontier BFS)."""
        seen = seed.localCheckpoint()
        frontier = seen
        for _ in range(max_rounds):
            nxt = (dedges.join(frontier.select(
                       F.col("node").alias(dstcol)), dstcol)
                   .select(F.col(srccol).alias("node"))
                   .dropDuplicates()
                   .join(seen, "node", "anti").localCheckpoint())
            if nxt.isEmpty():
                return seen
            seen = seen.unionByName(nxt).localCheckpoint()
            frontier = nxt
        raise RuntimeError("bowtie reachability did not converge "
                           f"within {max_rounds} rounds")

    reaches_core = _reach(core, "src", "dst")   # follow edges backward
    core_reaches = _reach(core, "dst", "src")   # follow edges forward
    return (scc
            .join(core.select("node", F.lit(1).alias("_core")),
                  "node", "left")
            .join(reaches_core.select("node", F.lit(1).alias("_in")),
                  "node", "left")
            .join(core_reaches.select("node", F.lit(1).alias("_out")),
                  "node", "left")
            .select("node",
                    F.when(F.col("_core") == 1, F.lit("CORE"))
                    .when(F.col("_in") == 1, F.lit("IN"))
                    .when(F.col("_out") == 1, F.lit("OUT"))
                    .otherwise(F.lit("OTHER")).alias("bowtie_class"),
                    "scc_id"))


def luby_mis(edges: DataFrame, nodes: DataFrame,
             n_rounds: int = 6) -> DataFrame:
    """Maximal independent set by Luby's algorithm (Luby, SIAM J.
    Comput. 1986) — THE textbook O(log n)-round distributed symmetry
    breaker, here in its derandomized md5-priority form so the result
    is deterministic across engines, partitionings, and reruns.

    Per round r over the still-ACTIVE subgraph: every node draws the
    priority ``conv(substr(md5('mis:' || r || ':' || node), 1, 6), 16,
    10)`` and joins the MIS iff its (priority, node) tuple is strictly
    smaller than every active neighbor's (ties broken by node id, so
    the winner set is always well-defined).  Winners and their
    neighbors then retire; the rest stay active for round r+1.  Two
    adjacent nodes can never both win a round (strict tuples), so the
    output is independent by construction; every excluded node retires
    with a selected neighbor, so the set is maximal over everything
    decided.  Fixed ``n_rounds`` like the other unrolled-oracle
    iteratives (kcore/ktruss/LPA): Luby halves the active edge count
    per round in expectation, so 6 rounds decide everything at any
    tested scale — still-undecided nodes are reported, never guessed.

    Input: ``edges (src, dst)`` undirected with src < dst (distinct),
    ``nodes (node)``.  Output: (node, in_mis, decided_round) where
    in_mis 1 = selected, 0 = excluded by a neighbor, -1 = undecided
    after n_rounds (decided_round 0).  Isolated nodes win round 1.

    Scale: per round one shuffle to take each active node's min
    neighbor tuple (partial-aggregable min) and one anti-join to
    retire — no collect, no global sort; localCheckpoint per round
    cuts the iterative lineage exactly like pagerank/cc.
    """
    und = (edges.select("src", "dst")
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = und.union(und.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
    sym = sym.localCheckpoint()
    active = nodes.select("node").dropDuplicates().localCheckpoint()
    decided = None
    for r in range(1, n_rounds + 1):
        prio = active.select(
            "node",
            F.conv(F.substring(F.md5(F.concat_ws(
                ":", F.lit("mis"), F.lit(str(r)), F.col("node"))),
                1, 6), 16, 10).cast("long").alias("prio"))
        # each active node's minimum active-neighbor (prio, node) tuple
        nbr_min = (sym.join(prio.withColumnRenamed("node", "dst")
                            .withColumnRenamed("prio", "nprio"), "dst")
                   .groupBy(F.col("src").alias("node"))
                   .agg(F.min(F.struct(F.col("nprio").alias("p"),
                                       F.col("dst").alias("n")))
                        .alias("m")))
        winners = (prio.join(nbr_min, "node", "left")
                   .where(F.col("m").isNull()
                          | (F.struct(F.col("prio").alias("p"),
                                      F.col("node").alias("n"))
                             < F.col("m")))
                   .select("node").localCheckpoint())
        excluded = (sym.join(winners.withColumnRenamed("node", "src"),
                             "src")
                    .select(F.col("dst").alias("node")).dropDuplicates()
                    .join(active, "node", "semi").localCheckpoint())
        batch = (winners.select("node", F.lit(1).alias("in_mis"),
                                F.lit(r).cast("long")
                                .alias("decided_round"))
                 .unionByName(excluded.select(
                     "node", F.lit(0).alias("in_mis"),
                     F.lit(r).cast("long").alias("decided_round"))))
        decided = batch if decided is None else \
            decided.unionByName(batch)
        decided = decided.localCheckpoint()
        active = (active.join(winners, "node", "anti")
                  .join(excluded, "node", "anti").localCheckpoint())
        if active.isEmpty():
            break
    return decided.unionByName(
        active.select("node", F.lit(-1).alias("in_mis"),
                      F.lit(0).cast("long").alias("decided_round")))


def katz_index(edges: DataFrame, nodes: DataFrame,
               depth: int = 3) -> DataFrame:
    """Katz centrality, truncated to walks of length <= ``depth``
    with attenuation beta = 1/8, as EXACT integers: katz_x512 =
    sum_l beta^l * walks_l(node) scaled by 8**depth, i.e. 64*w1 +
    8*w2 + w3 for depth 3, where walks_l(node) counts length-l walks
    ending at node over the undirected (symmetrized, deduped) graph.

    Walk counts — not path counts — so the recurrence is the pure
    matrix-power column sum w_{l+1}(n) = sum_{m ~ n} w_l(m), one
    keyed aggregate per level: no pair enumeration, no explosion.
    Isolated nodes score 0.  Output: (node, w1, w2, w3, katz_x512),
    all BIGINT, bit-exact across engines (integer sums only).
    """
    und = (edges.select("src", "dst")
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = (und.union(und.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
           .localCheckpoint())
    w = sym.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("w1"))
    levels = [w]
    for i in range(2, depth + 1):
        prev = levels[-1].withColumnRenamed("node", "src") \
            .withColumnRenamed(f"w{i - 1}", "_wp")
        nxt = (sym.join(prev, "src")
               .groupBy(F.col("dst").alias("node"))
               .agg(F.sum("_wp").cast("long").alias(f"w{i}")))
        levels.append(nxt)
    out = nodes.select("node")
    for lv in levels:
        out = out.join(lv, "node", "left")
    out = out.fillna(0, [f"w{i}" for i in range(1, depth + 1)])
    scale = 8 ** depth
    katz = sum((F.col(f"w{i}") * F.lit(scale // (8 ** i))
                for i in range(1, depth + 1)), F.lit(0))
    return out.select("node",
                      *[F.col(f"w{i}") for i in range(1, depth + 1)],
                      katz.cast("long").alias("katz_x512"))


def butterfly_counts(incidence: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-entity butterfly (bipartite 4-cycle) counts over the
    doc-entity incidence — the bipartite analogue of triangle
    counting and the standard density diagnostic for blocking keys:
    a butterfly is two entities sharing two documents, so entities
    with huge butterfly counts sit in near-duplicate doc groups and
    make blocking-based ER quadratic.

    Exact, via the wedge identity: for each entity pair sharing d
    docs the pair contributes C(d, 2) butterflies — one keyed
    aggregate over the doc-grouped self-join, never motif
    enumeration.  d*(d-1) is always even, so // 2 is exact integer.

    Input: ``incidence (doc_id, canonical_id)`` (deduped inside),
    ``nodes (node)``.  Output: (node, n_copartners, n_butterflies),
    BIGINT, 0 for entities sharing no document with anyone.

    Scale: the self-join is keyed by doc_id, so the fanout cap is the
    max distinct-entity count of a single document (bounded by doc
    length), not the corpus; everything after is map-side-combinable
    sums.
    """
    inc = (incidence.select("doc_id", "canonical_id")
           .dropDuplicates())
    pair = (inc.alias("a")
            .join(inc.alias("b"),
                  (F.col("a.doc_id") == F.col("b.doc_id"))
                  & (F.col("a.canonical_id") < F.col("b.canonical_id")))
            .groupBy(F.col("a.canonical_id").alias("x"),
                     F.col("b.canonical_id").alias("y"))
            .agg(F.count(F.lit(1)).cast("long").alias("d")))
    per = (pair.select(F.col("x").alias("node"), "d")
           .unionByName(pair.select(F.col("y").alias("node"), "d"))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("n_copartners"),
                F.sum(F.expr("d * (d - 1) div 2")).cast("long")
                .alias("n_butterflies")))
    return (nodes.select("node").join(per, "node", "left")
            .fillna(0, ["n_copartners", "n_butterflies"]))


def cocitation_coupling(edges: DataFrame) -> DataFrame:
    """Co-citation (Small '73) and bibliographic coupling (Kessler
    '63) over a directed graph — the two classic second-order
    similarity signals of citation/web-link analysis, here over the
    narrative-precedence entity graph: co-citation counts common
    IN-neighbors (entities preceded by the same third entity),
    coupling counts common OUT-neighbors.

    Output: (node_a, node_b, n_cocite, n_coupling) with node_a <
    node_b, one row per pair where either count is positive.

    Scale: both are single equi-self-joins keyed on the shared
    endpoint (the classic friends-of-friends wedge join) + one keyed
    count — fanout is bounded per hub by its degree, and the final
    full-outer merge joins two already-aggregated pair tables.
    """
    e = edges.select("src", "dst").dropDuplicates()
    co = (e.alias("a").join(
            e.alias("b"),
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.dst") < F.col("b.dst")))
          .groupBy(F.col("a.dst").alias("node_a"),
                   F.col("b.dst").alias("node_b"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_cocite")))
    bc = (e.alias("a").join(
            e.alias("b"),
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")))
          .groupBy(F.col("a.src").alias("node_a"),
                   F.col("b.src").alias("node_b"))
          .agg(F.count(F.lit(1)).cast("long").alias("n_coupling")))
    return (co.join(bc, ["node_a", "node_b"], "full")
            .fillna(0, ["n_cocite", "n_coupling"]))


def boruvka_msf(edges: DataFrame, nodes: DataFrame,
                n_rounds: int = 6) -> DataFrame:
    """Minimum spanning forest by Boruvka's algorithm — the ONLY
    classic MST algorithm that is natively parallel (Kruskal and Prim
    are inherently sequential), and the engine of single-linkage
    clustering at scale: each round EVERY component picks its
    cheapest outgoing edge simultaneously, the picked edges merge
    components (hash-min contraction), and the component count at
    least halves, so ceil(log2(largest component)) rounds finish.

    Determinism: edges are totally ordered by (cost, src, dst) —
    lexicographic tie-breaking is the standard "distinct weights"
    perturbation under which Boruvka's output is THE unique MSF, so
    the result is engine- and partitioning-independent.

    Input: ``edges (src, dst, cost)`` with src < dst (distinct pairs,
    BIGINT cost), ``nodes (node)``.  Output: (subj_a, subj_b, cost,
    round) — the forest edges and the round that picked them.

    Scale: per round, one double equi-join to component-label the
    edge endpoints, one per-component min (map-side combinable
    struct-min), and a contraction CC that runs on the COMPONENT
    graph (<= one edge per component — vanishingly small after round
    one); localCheckpoint per round cuts lineage.  No collect, no
    global sort.
    """
    from .linking import connected_components

    e = (edges.select("src", "dst", F.col("cost").cast("long")
                      .alias("cost"))
         .dropDuplicates(["src", "dst"]).localCheckpoint())
    lab = nodes.select("node", F.col("node").alias("comp")) \
        .localCheckpoint()
    forest = None
    for r in range(1, n_rounds + 1):
        ce = (e.join(lab.select(F.col("node").alias("src"),
                                F.col("comp").alias("ca")), "src")
              .join(lab.select(F.col("node").alias("dst"),
                               F.col("comp").alias("cb")), "dst")
              .where(F.col("ca") != F.col("cb")).localCheckpoint())
        if ce.isEmpty():
            break
        both = (ce.select(F.col("ca").alias("comp"), "cost", "src",
                          "dst", "ca", "cb")
                .unionByName(ce.select(F.col("cb").alias("comp"),
                                       "cost", "src", "dst", "ca",
                                       "cb")))
        chosen = (both.groupBy("comp")
                  .agg(F.min(F.struct("cost", "src", "dst", "ca",
                                      "cb")).alias("m"))
                  .select(F.col("m.cost").alias("cost"),
                          F.col("m.src").alias("src"),
                          F.col("m.dst").alias("dst"),
                          F.col("m.ca").alias("ca"),
                          F.col("m.cb").alias("cb"))
                  .dropDuplicates(["src", "dst"]).localCheckpoint())
        batch = chosen.select(F.col("src").alias("subj_a"),
                              F.col("dst").alias("subj_b"), "cost",
                              F.lit(r).cast("long").alias("round"))
        forest = batch if forest is None else forest.unionByName(batch)
        forest = forest.localCheckpoint()
        cgraph = chosen.select(F.col("ca").alias("src"),
                               F.col("cb").alias("dst"))
        comps = lab.select(F.col("comp").alias("node")).dropDuplicates()
        relabel = connected_components(cgraph, comps).withColumnRenamed(
            "node", "comp").withColumnRenamed("component", "newc")
        lab = (lab.join(relabel, "comp", "left")
               .select("node", F.coalesce("newc", "comp").alias("comp"))
               .localCheckpoint())
    if forest is None:
        return nodes.sparkSession.createDataFrame(
            [], "subj_a string, subj_b string, cost long, round long")
    return forest


def hyperball_nf(edges: DataFrame, nodes: DataFrame,
                 depth: int = 3) -> DataFrame:
    """HyperBall (Boldi & Vigna, 2013) — the neighborhood-function
    algorithm behind the "four degrees of separation" measurements:
    every node keeps a 16-register HyperLogLog counter of its ball
    B(node, d), and one round of register max-merge over neighbors
    advances every ball from radius d to d+1 simultaneously.  State
    is <= 16 rows per node FOREVER, so the per-round cost never grows
    with ball size — the only way neighborhood functions are
    computable on web-scale graphs.

    Deterministic integer protocol: registers use the repo's shared
    md5-hex decomposition (functions/sketches: register = first
    nibble, rho = 1 + leading zero bits of the next 12 nibbles); the
    raw estimator is emitted as integers by clamping rho at 20 and
    scaling by 2^20 — s_x2p20 = sum_j 2^(20 - min(rho_j, 20)) (absent
    register => 2^20), est_milli = (673 * 256 * 2^20) // s_x2p20
    (alpha_16 = 0.673 exactly, m^2 = 256).  The clamp discards only
    2^-20-size terms (far below the sketch's ~26% stderr at m=16)
    and keeps every quantity in int64; no small-range correction —
    the RAW estimator, same on both engines.

    Output: (node, dist, s_x2p20, est_milli) for dist 0..depth;
    s_x2p20 is non-increasing (registers only grow), so est_milli is
    a non-decreasing ball-size estimate per node.

    Scale: per round ONE keyed shuffle (neighbor register union +
    (node, register) max-aggregate, map-side combinable) over at
    most 16 * |V| rows; localCheckpoint per round.
    """
    from ..functions.sketches import _nibble_value

    und = (edges.select("src", "dst")
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = (und.union(und.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
           .localCheckpoint())
    h = F.md5(F.col("node").cast("string"))
    tail = "substring(_h, 2, 12)"
    z = F.expr(f"trim(LEADING '0' FROM {tail})")
    first = F.expr("instr('0123456789abcdef', "
                   f"substring(trim(LEADING '0' FROM {tail}), 1, 1)) - 1")
    zero_bits = (F.when(first >= 8, F.lit(0))
                 .when(first >= 4, F.lit(1))
                 .when(first >= 2, F.lit(2)).otherwise(F.lit(3)))
    rho = (F.when(F.length(z) == 0, F.lit(49))
           .otherwise((F.lit(12) - F.length(z)) * 4 + zero_bits + 1))
    state = (nodes.select("node", h.alias("_h"))
             .select("node",
                     _nibble_value("_h", 1, 1).cast("int")
                     .alias("register"),
                     rho.cast("int").alias("rho"))
             .localCheckpoint())

    def _estimate(st: DataFrame, d: int) -> DataFrame:
        term = F.expr("shiftleft(1, 20 - least(rho, 20))")
        return (st.groupBy("node")
                .agg((F.lit(16 * (1 << 20))
                      - F.sum(F.lit(1 << 20) - term)).cast("long")
                     .alias("s_x2p20"))
                .select("node", F.lit(d).cast("long").alias("dist"),
                        "s_x2p20",
                        F.floor(F.lit(673 * 256 * (1 << 20))
                                / F.col("s_x2p20")).cast("long")
                        .alias("est_milli")))

    out = _estimate(state, 0)
    for d in range(1, depth + 1):
        nb = (sym.join(state.withColumnRenamed("node", "src"), "src")
              .select(F.col("dst").alias("node"), "register", "rho"))
        state = (state.unionByName(nb)
                 .groupBy("node", "register")
                 .agg(F.max("rho").cast("int").alias("rho"))
                 .localCheckpoint())
        out = out.unionByName(_estimate(state, d))
    return out


def simrank_pairs(edges: DataFrame, n_rounds: int = 3,
                  c_num: int = 4, c_den: int = 5) -> DataFrame:
    """SimRank (Jeh & Widom, KDD'02) — "two objects are similar if
    they are referenced by similar objects" — over a DIRECTED edge
    set, fixed rounds, exact integer fixed-point: scores live in
    micro6 ints, each round floors ONCE per pair, decay C = c_num /
    c_den (default 4/5), s(x, x) = 1e6 pinned.

    Round recurrence for a pair {a, b}: s_k = (c_num * (sum of
    s_{k-1} over ordered in-neighbor pairs (i -> a, j -> b), i != j,
    plus 1e6 per COMMON in-neighbor)) // (c_den * indeg(a) *
    indeg(b)).  Zero-score pairs are never materialized, so the state
    is the sparse nonzero-pair table (seeded by the common-in-
    neighbor pairs — exactly the co-citation support).

    Output: (node_a, node_b, simrank_micro6) for nonzero pairs,
    node_a < node_b.

    Scale: the diagonal seed is the co-citation wedge join (keyed on
    the shared in-neighbor); each propagation round joins the sparse
    score table through the edge list twice (keyed equi-joins) — the
    fanout is score-pairs x out-degree^2, the price SimRank always
    pays, bounded here by the nonzero sparsity the integer floor
    enforces (tiny scores round to 0 and leave the state).
    """
    e = edges.select("src", "dst").dropDuplicates().localCheckpoint()
    ind = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("ind"))
    diag = (e.alias("x").join(
                e.alias("y"),
                (F.col("x.src") == F.col("y.src"))
                & (F.col("x.dst") < F.col("y.dst")))
            .groupBy(F.col("x.dst").alias("a"),
                     F.col("y.dst").alias("b"))
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .localCheckpoint())

    def _score(pairs: DataFrame) -> DataFrame:
        return (pairs
                .join(ind.select(F.col("node").alias("a"),
                                 F.col("ind").alias("_ia")), "a")
                .join(ind.select(F.col("node").alias("b"),
                                 F.col("ind").alias("_ib")), "b")
                .select("a", "b",
                        F.floor((F.lit(c_num)
                                 * (F.coalesce("v", F.lit(0))
                                    + F.coalesce("c", F.lit(0))
                                    * F.lit(1000000)))
                                / (F.lit(c_den) * F.col("_ia")
                                   * F.col("_ib"))).cast("long")
                        .alias("s"))
                .where(F.col("s") > 0))

    s = _score(diag.withColumn("v", F.lit(None).cast("long")))
    s = s.localCheckpoint()
    for _ in range(2, n_rounds + 1):
        sym = s.unionByName(s.select(F.col("b").alias("a"),
                                     F.col("a").alias("b"), "s"))
        nd = (sym.join(e.select(F.col("src").alias("a"),
                                F.col("dst").alias("_da")), "a")
              .join(e.select(F.col("src").alias("b"),
                             F.col("dst").alias("_db")), "b")
              .where(F.col("_da") < F.col("_db"))
              .groupBy(F.col("_da").alias("a"), F.col("_db").alias("b"))
              .agg(F.sum("s").cast("long").alias("v")))
        pairs = (nd.join(diag, ["a", "b"], "full")
                 .select("a", "b", "v", "c"))
        s = _score(pairs).localCheckpoint()
    return s.select(F.col("a").alias("node_a"),
                    F.col("b").alias("node_b"),
                    F.col("s").alias("simrank_micro6"))


def edge_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support + the LOCAL BRIDGE flag
    (Granovetter's weak ties; Easley-Kleinberg ch. 3): an edge's
    support is its common-neighbor count, and an edge in NO triangle
    (support 0) is a local bridge — removing it lengthens its
    endpoints' distance beyond 2, so these are the ties that carry
    novel information between co-mention communities and the first
    candidates for spurious-merge audits.

    Input: ``edges (src, dst)`` undirected, src < dst distinct.
    Output: (src, dst, support, is_local_bridge) — every input edge,
    BIGINT support, INT flag.

    Scale: the common-neighbor count is the standard wedge equi-join
    (edge x symmetrized adjacency on the shared endpoint), the same
    bounded-fanout shape as triangle counting — never all-pairs.
    """
    e = (edges.select("src", "dst")
         .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = e.union(e.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst")))
    cn = (e.join(sym.select(F.col("src").alias("src"),
                            F.col("dst").alias("_w")), "src")
          .join(sym.select(F.col("src").alias("dst"),
                           F.col("dst").alias("_w")), ["dst", "_w"])
          .groupBy("src", "dst")
          .agg(F.count(F.lit(1)).cast("long").alias("support")))
    return (e.join(cn, ["src", "dst"], "left")
            .select("src", "dst",
                    F.coalesce("support", F.lit(0)).cast("long")
                    .alias("support"))
            .withColumn("is_local_bridge",
                        F.when(F.col("support") == 0, F.lit(1))
                        .otherwise(F.lit(0)).cast("int")))


def orbit_counts(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """3-node graphlet orbit counts per node (Przulj's orbits 0-3):
    orbit0 = degree, orbit1 = end of an INDUCED 2-path, orbit2 =
    center of an induced 2-path, orbit3 = triangle membership — the
    structural-role signature vector that graphlet-kernel similarity
    and role discovery build on.

    Closed-form from three keyed aggregates (no graphlet
    enumeration): with deg(n), t(n) = triangles at n, and s(n) =
    sum of deg(m) over neighbors m:
      orbit1 = s - deg - 2t   (2-paths from n minus triangle closures)
      orbit2 = C(deg, 2) - t  (wedges at n minus closed ones)

    Output: (node, deg, orbit1, orbit2, n_triangles), all BIGINT,
    zeros for isolated nodes.
    """
    und = (edges.select("src", "dst")
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = und.union(und.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    s = (sym.join(deg.withColumnRenamed("node", "dst")
                  .withColumnRenamed("deg", "_dm"), "dst")
         .groupBy(F.col("src").alias("node"))
         .agg(F.sum("_dm").cast("long").alias("_s")))
    tri = triangle_counts(und).select(
        "node", F.col("n_triangles").cast("long").alias("n_triangles"))
    out = (nodes.select("node")
           .join(deg, "node", "left").join(s, "node", "left")
           .join(tri, "node", "left")
           .fillna(0, ["deg", "_s", "n_triangles"]))
    return out.select(
        "node", "deg",
        (F.col("_s") - F.col("deg") - 2 * F.col("n_triangles"))
        .cast("long").alias("orbit1"),
        (F.expr("deg * (deg - 1) div 2") - F.col("n_triangles"))
        .cast("long").alias("orbit2"),
        "n_triangles")


def type_mixing(edges: DataFrame, types: DataFrame) -> DataFrame:
    """Categorical mixing matrix (Newman's assortative-mixing tables)
    of the co-mention graph by elected entity type: edge counts per
    unordered endpoint-type pair plus each pair's share of all typed
    edges — the categorical companion to degree_assortativity, and
    the first look at whether cross-type edges (the relation-bearing
    ones) dominate within-type lexical echoes.

    Input: ``edges (src, dst)`` undirected src < dst distinct,
    ``types (canonical_id, major_type)``.  Output: (type_a, type_b,
    n_edges, share_micro6) with type_a <= type_b; edges with an
    untyped endpoint are dropped (inner joins).

    Scale: two broadcast-joinable type lookups (the type table is
    one row per entity but the MATRIX is |types|^2 — the aggregate
    is map-side combinable to that tiny state) and one global count
    folded in by a window over the handful of matrix rows.
    """
    from pyspark.sql import Window

    t = types.select("canonical_id", "major_type")
    j = (edges
         .join(t.select(F.col("canonical_id").alias("src"),
                        F.col("major_type").alias("_ta")), "src")
         .join(t.select(F.col("canonical_id").alias("dst"),
                        F.col("major_type").alias("_tb")), "dst")
         .select(F.least("_ta", "_tb").alias("type_a"),
                 F.greatest("_ta", "_tb").alias("type_b")))
    cnt = j.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"))
    w = Window.partitionBy()
    return (cnt.withColumn("_tot", F.sum("n_edges").over(w))
            .select("type_a", "type_b", "n_edges",
                    F.floor(F.col("n_edges") * F.lit(1000000)
                            / F.col("_tot")).cast("long")
                    .alias("share_micro6")))


def ic_spread(edges: DataFrame, nodes: DataFrame, p_pct: int = 35,
              max_rounds: int = 25) -> DataFrame:
    """Deterministic independent-cascade influence spread (Kempe,
    Kleinberg & Tardos, KDD'03, live-edge form): an undirected edge
    {u, v} is LIVE iff hex6(md5('ic:' || min || ':' || max)) % 100 <
    p_pct — the md5 coin every engine flips identically — and the
    cascade from the seed (the lexicographically smallest node, the
    repo's standard seed rule) is exactly BFS over live edges.

    Output: (node, activated_round) for ACTIVATED nodes only (seed =
    round 0) — the influence set and its activation wavefront.

    Scale: one filter to materialize live edges, then frontier BFS
    with localCheckpoint per level (the bfs_distances discipline);
    the md5 coin means no RNG state is ever shared across executors.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    coin = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit("ic"), F.col("a"), F.col("b"))), 1, 6), 16, 10) \
        .cast("long") % 100
    live = und.where(coin < F.lit(p_pct)).localCheckpoint()
    sym = live.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
        .union(live.select(F.col("b").alias("src"),
                           F.col("a").alias("dst")))
    seed = nodes.agg(F.min("node").alias("node"))
    seen = seed.select("node", F.lit(0).cast("long")
                       .alias("activated_round")).localCheckpoint()
    frontier = seen.select("node")
    for r in range(1, max_rounds + 1):
        nxt = (sym.join(frontier.withColumnRenamed("node", "src"),
                        "src")
               .select(F.col("dst").alias("node")).dropDuplicates()
               .join(seen.select("node"), "node", "anti")
               .localCheckpoint())
        if nxt.isEmpty():
            break
        seen = seen.unionByName(
            nxt.select("node", F.lit(r).cast("long")
                       .alias("activated_round"))).localCheckpoint()
        frontier = nxt
    return seen


def core_numbers(edges: DataFrame, nodes: DataFrame,
                 n_rounds: int = 8) -> DataFrame:
    """Full k-core decomposition (coreness per node) by H-INDEX
    ITERATION (Montresor et al., "Distributed k-core decomposition";
    Lu et al., Nature Comm. 2016): start every node at its degree,
    then repeatedly replace each node's value with the H-index of
    its neighbors' values (the largest h with >= h neighbors at
    >= h).  The sequence is monotonically non-increasing and
    converges to the exact coreness — the generalization of the
    kcore_nodes membership test to ALL k at once.

    Deterministic: the H-index is order-invariant (ties in the
    neighbor sort cannot change max(min(rank, value))), so fixed
    rounds unroll into an exact DuckDB oracle; the pytest checks the
    fixpoint against serial peeling, the textbook definition.

    Output: (node, coreness) BIGINT, isolated nodes 0.

    Scale: per round ONE keyed join (neighbor values) + one
    per-node window (rank by value) + one max-aggregate —
    neighborhood-bounded state, localCheckpoint per round; at
    n_rounds = 8 the value is exact on any graph whose coreness
    stabilizes in 8 sweeps (typical for small-world graphs;
    convergence is asserted, never assumed, by the peeling test).
    """
    from pyspark.sql import Window

    und = (edges.select("src", "dst")
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = (und.union(und.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
           .localCheckpoint())
    c = (sym.groupBy(F.col("src").alias("node"))
         .agg(F.count(F.lit(1)).cast("long").alias("c"))
         .localCheckpoint())
    w = Window.partitionBy("node").orderBy(F.desc("cn"), F.asc("dst"))
    for _ in range(n_rounds):
        nbr = (sym.join(c.select(F.col("node").alias("dst"),
                                 F.col("c").alias("cn")), "dst")
               .select(F.col("src").alias("node"), "dst", "cn"))
        c = (nbr.withColumn("rk", F.row_number().over(w).cast("long"))
             .groupBy("node")
             .agg(F.max(F.least(F.col("rk"), F.col("cn")))
                  .cast("long").alias("c"))
             .localCheckpoint())
    return (nodes.select("node").join(c, "node", "left")
            .select("node", F.coalesce("c", F.lit(0)).cast("long")
                    .alias("coreness")))


def landmark_centrality(edges: DataFrame, nodes: DataFrame,
                        n_landmarks: int = 4,
                        max_iter: int = 25) -> DataFrame:
    """Landmark-based closeness + harmonic centrality (Potamias et
    al., CIKM 2009): run ONE multi-source BFS from a small
    deterministic landmark set (top-``n_landmarks`` by degree, node
    id as tie-break), then score every node by its distances TO the
    landmarks — the scalable stand-in for exact closeness, whose
    all-pairs BFS is quadratic and off the table at corpus scale.

    Integer devices (bit-exact vs a DuckDB oracle that unrolls the
    same BFS as a recursive CTE):

        n_lm             = landmarks reaching the node (d > 0)
        sum_dist         = sum of those distances
        harmonic_micro6  = sum of 1000000 DIV d
        closeness_micro6 = (1000000 * n_lm) DIV sum_dist   (0 if unreached)

    Scale: the frontier is keyed (lm, node) — n_landmarks * |V| state
    upper bound, one equi-join + anti-join per level, localCheckpoint
    per level, early exit on empty frontier.  Landmark count is a
    constant, so cost is n_landmarks BFS sweeps fused into one job.
    """
    spark = edges.sparkSession
    und = (edges.select("src", "dst")
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = (und.union(und.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
           .localCheckpoint())
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg"))
    # bounded driver collect: n_landmarks rows (constant), the same
    # cap class as graph_bfs / graph_distances' 1-row seed pick
    lms = [r["node"] for r in deg.orderBy(F.desc("deg"), F.asc("node"))
           .limit(n_landmarks).collect()]
    dist = spark.createDataFrame([(lm, lm, 0) for lm in lms],
                                 "lm string, node string, dist int")
    frontier = dist
    for level in range(1, max_iter + 1):
        nxt = (frontier.join(sym, frontier["node"] == sym["src"])
               .select("lm", F.col("dst").alias("node"))
               .dropDuplicates()
               .join(dist.select("lm", "node"), ["lm", "node"],
                     "left_anti")
               .withColumn("dist", F.lit(level).cast("int"))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint()
        frontier = nxt
    scored = (dist.where(F.col("dist") > 0)
              .groupBy("node")
              .agg(F.count(F.lit(1)).cast("int").alias("n_lm"),
                   F.sum("dist").cast("long").alias("sum_dist"),
                   F.sum(F.expr("1000000 DIV dist")).cast("long")
                   .alias("harmonic_micro6")))
    return (nodes.select("node").join(scored, "node", "left")
            .select("node",
                    F.coalesce("n_lm", F.lit(0)).cast("int").alias("n_lm"),
                    F.coalesce("sum_dist", F.lit(0)).cast("long")
                    .alias("sum_dist"),
                    F.coalesce("harmonic_micro6", F.lit(0)).cast("long")
                    .alias("harmonic_micro6"),
                    F.expr("CASE WHEN coalesce(sum_dist, 0) > 0 THEN "
                           "(1000000 * CAST(n_lm AS BIGINT)) DIV sum_dist "
                           "ELSE 0 END").cast("long")
                    .alias("closeness_micro6")))


def jp_coloring(edges: DataFrame, nodes: DataFrame,
                n_rounds: int = 8) -> DataFrame:
    """Greedy distributed graph coloring by the Jones-Plassmann
    algorithm (Jones & Plassmann, SIAM J. Sci. Comput. 1993) — the
    textbook parallel scheduling primitive: a proper coloring IS a
    conflict-free execution schedule (all nodes of one color update
    concurrently), here for entity-merge batches over the co-mention
    graph.  Derandomized with the static md5-hex6 priority
    ``conv(substr(md5('jp:' || node), 1, 6), 16, 10)`` so the coloring
    is deterministic across engines, partitionings, and reruns.

    Per round over the still-UNCOLORED subgraph: a node colors itself
    iff its (priority, node) tuple is strictly smaller than every
    uncolored neighbor's, taking the mex (smallest color >= 0 absent
    from its already-colored neighborhood).  Within-round winners form
    an independent set (strict tuples), so simultaneous assignment is
    safe; colors assigned in round r are provably <= r-1, so the
    palette grows at most one per round.  Fixed ``n_rounds`` like the
    other unrolled-oracle iteratives (kcore/ktruss/LPA/MIS) —
    still-uncolored nodes after n_rounds are reported with color -1,
    never guessed.

    Input: ``edges (src, dst)`` undirected (src < dst, distinct),
    ``nodes (node)``.  Output: (node, color, decided_round); isolated
    nodes take color 0 in round 1.

    Scale: per round one min-neighbor-tuple shuffle (partial-
    aggregable), one colored-neighbor collect_set bounded by degree,
    and one anti-join to retire; mex is an in-row fold over the
    sorted neighbor palette (size <= round index).  No collect, no
    global sort; localCheckpoint per round cuts the lineage."""
    und = (edges.select("src", "dst")
           .where(F.col("src") != F.col("dst")).dropDuplicates())
    sym = und.union(und.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
    sym = sym.localCheckpoint()
    active = (nodes.select("node").dropDuplicates()
              .select("node",
                      F.conv(F.substring(F.md5(
                          F.concat(F.lit("jp:"), F.col("node"))),
                          1, 6), 16, 10).cast("long").alias("prio"))
              .localCheckpoint())
    colored = None
    for r in range(1, n_rounds + 1):
        nbr_min = (sym.join(active.withColumnRenamed("node", "dst")
                            .withColumnRenamed("prio", "nprio"), "dst")
                   .groupBy(F.col("src").alias("node"))
                   .agg(F.min(F.struct(F.col("nprio").alias("p"),
                                       F.col("dst").alias("n")))
                        .alias("m")))
        winners = (active.join(nbr_min, "node", "left")
                   .where(F.col("m").isNull()
                          | (F.struct(F.col("prio").alias("p"),
                                      F.col("node").alias("n"))
                             < F.col("m")))
                   .select("node").localCheckpoint())
        if colored is None:
            newly = winners.select(
                "node", F.lit(0).cast("long").alias("color"))
        else:
            palette = (sym
                       .join(winners.withColumnRenamed("node", "src"),
                             "src")
                       .join(colored.select(
                           F.col("node").alias("dst"), "color"),
                           "dst")
                       .groupBy(F.col("src").alias("node"))
                       .agg(F.array_sort(F.collect_set("color"))
                            .alias("cs")))
            mex = F.aggregate(
                "cs", F.lit(0).cast("long"),
                lambda acc, c: F.when(c == acc, acc + 1)
                .otherwise(acc))
            newly = (winners.join(palette, "node", "left")
                     .select("node",
                             F.when(F.col("cs").isNull(),
                                    F.lit(0).cast("long"))
                             .otherwise(mex).alias("color")))
        newly = newly.withColumn(
            "decided_round", F.lit(r).cast("long")).localCheckpoint()
        colored = newly if colored is None else \
            colored.unionByName(newly).localCheckpoint()
        active = active.join(winners, "node", "anti").localCheckpoint()
        if active.isEmpty():
            break
    return colored.unionByName(
        active.select("node", F.lit(-1).cast("long").alias("color"),
                      F.lit(0).cast("long").alias("decided_round")))


def dag_layers(edges: DataFrame, scc: DataFrame,
               n_rounds: int = 10) -> DataFrame:
    """Critical-path layering of the SCC condensation — the parallel
    schedule a precedence graph actually implies: condense each
    strongly connected component to one node (the condensation is a
    DAG by construction), then level(C) = length of the longest
    prerequisite chain ending at C.  Components on the same level
    have no path between them and can be processed concurrently; the
    max level is the schedule's critical-path depth.

    Levels by fixed-round max-plus propagation (the pagerank_fixed
    discipline): level_r = max(level_{r-1}, 1 + max over incoming
    edges of the source's level_{r-1}) — after r rounds level equals
    the longest path using <= r edges, so any n_rounds >= the DAG
    depth is exact, and the oracle replays the SAME r rounds
    bit-for-bit either way.

    Input: directed ``edges (src, dst, ...)``, ``scc (node, scc_id)``
    covering every endpoint.  Output: (scc_id, n_nodes, level,
    indeg, outdeg) — one row per condensed component, degrees over
    the condensation.

    Scale: condensation is two keyed label joins + a distinct; each
    round is one grouped max + one keyed left join, localCheckpoint
    per round; no collect, no global sort."""
    sa = scc.select(F.col("node").alias("src"),
                    F.col("scc_id").alias("a"))
    sb = scc.select(F.col("node").alias("dst"),
                    F.col("scc_id").alias("b"))
    e = (edges.select("src", "dst").join(sa, "src").join(sb, "dst")
         .where(F.col("a") != F.col("b"))
         .select("a", "b").dropDuplicates().localCheckpoint())
    comps = (scc.groupBy("scc_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
             .localCheckpoint())
    lvl = comps.select("scc_id", F.lit(0).cast("long").alias("level"))
    for _ in range(n_rounds):
        upd = (e.join(lvl.select(F.col("scc_id").alias("a"),
                                 F.col("level").alias("la")), "a")
               .groupBy(F.col("b").alias("scc_id"))
               .agg((F.max("la") + 1).cast("long").alias("cand")))
        lvl = (lvl.join(upd, "scc_id", "left")
               .select("scc_id",
                       F.greatest("level",
                                  F.coalesce("cand",
                                             F.lit(0).cast("long")))
                       .cast("long").alias("level"))
               .localCheckpoint())
    indeg = e.groupBy(F.col("b").alias("scc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("indeg"))
    outdeg = e.groupBy(F.col("a").alias("scc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg"))
    return (comps.join(lvl, "scc_id")
            .join(indeg, "scc_id", "left")
            .join(outdeg, "scc_id", "left")
            .select("scc_id", "n_nodes", "level",
                    F.coalesce("indeg", F.lit(0)).cast("long")
                    .alias("indeg"),
                    F.coalesce("outdeg", F.lit(0)).cast("long")
                    .alias("outdeg")))


def dominant_matching(edges: DataFrame, n_rounds: int = 6) -> DataFrame:
    """Weighted maximal matching by locally-dominant edges (Preis,
    STACS'99; Manne & Bisseling's parallel rendition) — the textbook
    distributed 1/2-approximation to maximum weight matching, the
    pairing primitive behind coarsening (multilevel partitioners) and
    one-to-one entity merge scheduling.

    Per round over the live subgraph: an edge is matched iff its key
    ``(weight, src, dst)`` is the MAX incident key at BOTH endpoints
    (a strict total order — weights tie-break by endpoint names — so
    the dominant set is well-defined and deterministic cross-engine).
    Matched endpoints retire with all their edges.  The globally
    heaviest live edge is always locally dominant, so every round
    matches >= 1 edge; fixed ``n_rounds`` like the other unrolled-
    oracle iteratives — edges still live after n_rounds stay
    unmatched (a valid matching, maximal over everything processed).

    Input: ``edges (src, dst, weight)`` undirected, src < dst,
    distinct, integer weight.  Output: (src, dst, weight,
    matched_round).

    Scale: per round one endpoint-exploded grouped max (partial-
    aggregable) + two keyed joins + two anti-joins; localCheckpoint
    per round; no collect beyond the bounded isEmpty probe."""
    live = (edges.select("src", "dst",
                         F.col("weight").cast("long").alias("weight"))
            .localCheckpoint())
    matched = None
    for r in range(1, n_rounds + 1):
        if live.isEmpty():
            break
        withk = live.withColumn(
            "k", F.struct(F.col("weight").alias("w"),
                          F.col("src").alias("a"),
                          F.col("dst").alias("b")))
        inc = (withk.select(F.col("src").alias("node"), "k")
               .union(withk.select(F.col("dst").alias("node"), "k")))
        best = inc.groupBy("node").agg(F.max("k").alias("bk"))
        m = (withk
             .join(best.select(F.col("node").alias("src"),
                               F.col("bk").alias("_bs")), "src")
             .join(best.select(F.col("node").alias("dst"),
                               F.col("bk").alias("_bd")), "dst")
             .where((F.col("k") == F.col("_bs"))
                    & (F.col("k") == F.col("_bd")))
             .select("src", "dst", "weight").localCheckpoint())
        mn = (m.select(F.col("src").alias("node"))
              .union(m.select(F.col("dst").alias("node")))
              .dropDuplicates().localCheckpoint())
        batch = m.withColumn("matched_round",
                             F.lit(r).cast("long"))
        matched = batch if matched is None else \
            matched.unionByName(batch).localCheckpoint()
        live = (live.join(mn.withColumnRenamed("node", "src"),
                          "src", "anti")
                .join(mn.withColumnRenamed("node", "dst"),
                      "dst", "anti").localCheckpoint())
    if matched is None:
        return (edges.select("src", "dst",
                             F.col("weight").cast("long")
                             .alias("weight"))
                .where(F.lit(False))
                .withColumn("matched_round",
                            F.lit(0).cast("long")))
    return matched


def single_linkage_clusters(edges: DataFrame, nodes: DataFrame,
                            cut_cost: int,
                            n_rounds: int = 6) -> DataFrame:
    """Single-linkage clustering at a distance threshold — the
    classic identity that makes hierarchical clustering tractable at
    scale: single-linkage clusters at distance <= T are EXACTLY the
    connected components of the minimum spanning forest restricted to
    edges of cost <= T (cutting the dendrogram == cutting the MSF),
    so one :func:`boruvka_msf` pass + one CC pass serves EVERY
    threshold without touching the quadratic similarity graph again.

    Input: ``edges (src, dst, cost)`` as boruvka_msf takes them,
    ``nodes (node)``, integer ``cut_cost`` (cost = 1e6 -
    jac_micro6 in the driver composition, so cut_cost = 1e6 - minimum
    similarity).  Output: (node, cluster_id, cluster_size) —
    cluster_id is the component's lexicographic-min node, singletons
    included.

    Scale: boruvka_msf's log-round contraction + the large/small-star
    CC on the FOREST (<= n-1 edges, not the similarity graph)."""
    from .linking import connected_components

    msf = boruvka_msf(edges, nodes, n_rounds)
    kept = (msf.where(F.col("cost") <= cut_cost)
            .select(F.col("subj_a").alias("src"),
                    F.col("subj_b").alias("dst")))
    cc = connected_components(kept,
                              nodes.select("node").dropDuplicates())
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return (cc.join(sizes, "component")
            .select("node", F.col("component").alias("cluster_id"),
                    "cluster_size"))


def densest_subgraph(edges: DataFrame, nodes: DataFrame,
                     eps_num: int = 11, eps_den: int = 10,
                     max_rounds: int = 8) -> DataFrame:
    """Densest-subgraph 2(1+eps)-approximation by greedy parallel
    peeling (Charikar '00 objective, Bahmani/Kumar/Vassilvitskii
    VLDB'12 distributed rule): each round removes EVERY node whose
    degree is <= 2(1+eps)·E/N, and the answer is the surviving node
    set of the round with the highest density E/N seen along the
    way.  eps = eps_num/eps_den - 1 (defaults give eps = 0.1, so
    O(log n) rounds).

    All comparisons are integer cross-multiplications
    (deg·N·eps_den > 2·eps_num·E) and density is floor-scaled
    micro6, so the peel sequence is bit-deterministic and the DuckDB
    oracle unrolls it round-for-round.  Ties on density keep the
    EARLIEST round.

    Output: one row per node of the winning subgraph — (node, round,
    n_nodes, n_edges, density_micro6), the summary constant across
    rows.

    Scale: each round is one degree aggregate + two semi-joins, with
    localCheckpoint cutting lineage; the per-round N/E counts are
    1-row driver aggregates (bounded by max_rounds, same device as
    bfs_distances' frontier check).  No all-pairs product anywhere;
    at 100 TB the peel touches each edge O(log n) times total."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates())
    cur_n = nodes.select("node").dropDuplicates().localCheckpoint()
    cur_e = und.localCheckpoint()
    best = None  # (density, round, node_df, n, e)
    for r in range(max_rounds):
        n = cur_n.count()          # bounded driver sync, <= max_rounds
        if n == 0:
            break
        e = cur_e.count()
        dens = e * 10**6 // n
        if best is None or dens > best[0]:
            best = (dens, r, cur_n, n, e)
        deg = (cur_e.select(F.col("a").alias("node"))
               .unionByName(cur_e.select(F.col("b").alias("node")))
               .groupBy("node")
               .agg(F.count(F.lit(1)).cast("long").alias("deg")))
        keep = (cur_n.join(deg, "node")
                .where(F.col("deg") * n * eps_den > 2 * eps_num * e)
                .select("node"))
        cur_n = keep.localCheckpoint()
        cur_e = (cur_e
                 .join(cur_n.withColumnRenamed("node", "a"), "a")
                 .join(cur_n.withColumnRenamed("node", "b"), "b")
                 .select("a", "b").localCheckpoint())
    dens, r, nd, n, e = best
    return nd.select(
        "node", F.lit(r).cast("int").alias("round"),
        F.lit(n).cast("long").alias("n_nodes"),
        F.lit(e).cast("long").alias("n_edges"),
        F.lit(dens).cast("long").alias("density_micro6"))


def hub_robustness(edges: DataFrame, k: int = 3) -> DataFrame:
    """Targeted-attack robustness probe: how much of the graph's
    largest connected component survives removing the top-k degree
    hubs (the scale-free-network fragility test, Albert/Jeong/
    Barabasi '00 — a KG whose connectivity hangs on three hub
    entities is one bad merge away from shattering).

    ``edges``: directed or undirected pairs (src, dst); self-loops
    dropped, orientation canonicalized and deduped (one neighbor
    relation per pair).  Hubs are the k highest distinct-neighbor
    degrees, ties broken by node ascending (a distributed
    orderBy.limit top-k, never a global window).

    Output rows (phase, node, size):
      phase='hub'    -> the removed hubs, size = degree;
      phase='before' -> every component of the full graph, node =
                        min-member id, size = member count;
      phase='after'  -> same for the hub-removed graph.

    Scale: component ids come from the min-label fixpoint
    (_min_reach_labels) over the symmetrized edge set — diameter
    rounds of keyed aggregates on the bounded canonical-entity
    graph, localCheckpoint per round; the before/after passes are
    two independent runs of the same machinery."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b"))
           .dropDuplicates().localCheckpoint())
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = und.select(F.col("a").alias("node")).unionByName(
        und.select(F.col("b").alias("node"))).dropDuplicates()
    deg = (sym.groupBy(F.col("a").alias("node"))
           .agg(F.countDistinct("b").cast("long").alias("size")))
    hubs = (deg.orderBy(F.col("size").desc(), F.col("node").asc())
            .limit(k).localCheckpoint())

    def comps(nd, ed, phase):
        sym_se = ed.select(F.col("a").alias("src"),
                           F.col("b").alias("dst"))
        sym_se = sym_se.unionByName(
            sym_se.select(F.col("dst").alias("src"),
                          F.col("src").alias("dst")))
        lbl = _min_reach_labels(nd, sym_se)
        return (lbl.groupBy(F.col("f").alias("node"))
                .agg(F.count(F.lit(1)).cast("long").alias("size"))
                .select(F.lit(phase).alias("phase"), "node", "size"))

    h = hubs.select(F.col("node").alias("hub"))
    nodes_after = nodes.join(
        F.broadcast(h).withColumnRenamed("hub", "node"),
        "node", "left_anti")
    und_after = (und.join(F.broadcast(h).withColumnRenamed("hub", "a"),
                          "a", "left_anti")
                 .join(F.broadcast(h).withColumnRenamed("hub", "b"),
                       "b", "left_anti").select("a", "b"))
    return (hubs.select(F.lit("hub").alias("phase"), "node", "size")
            .unionByName(comps(nodes, und, "before"))
            .unionByName(comps(nodes_after, und_after, "after")))


def partition_replication(edges: DataFrame, rows: int = 3,
                          cols: int = 3) -> DataFrame:
    """Graph-partitioning audit: for the SAME partition count P =
    rows*cols, measure 1D hash-by-src (edge-cut, what a plain
    ``repartition(src)`` gives you) against the 2D grid vertex-cut
    (GraphX EdgePartition2D): per strategy, edge balance and vertex
    replication factor — the two numbers that decide shuffle volume
    and mirror-state memory for every iterative graph job at cluster
    scale.  1D keeps each vertex's OUT-edges on one partition but
    lets a hub's in-edges land everywhere (replication up to P); the
    grid bounds every vertex's replication by rows + cols - 1 at the
    cost of splitting out-edges.

    Hash = first 4 hex nibbles of md5(node id) — cross-engine exact
    (the feat_u16 device), uniform enough for an audit.

    Output: one row per strategy (strategy, n_partitions, n_edges,
    max_part_edges, balance_micro6 = 1e6 * max * P / E, n_nodes,
    replicas, replication_micro6 = 1e6 * replicas / V).

    Scale shape: two corpus passes (one per strategy), each a hash
    aggregate to P-row balance + a distinct (partition, node) pair
    aggregate; the final composition crossJoins 1-row frames only.
    """
    P = rows * cols

    def h(c: str):
        return F.conv(F.substring(F.md5(F.col(c)), 1, 4), 16, 10) \
            .cast("long")

    def stats(e: DataFrame, label: str) -> DataFrame:
        parts = e.groupBy("part").agg(
            F.count(F.lit(1)).cast("long").alias("c"))
        bal = parts.agg(F.sum("c").cast("long").alias("n_edges"),
                        F.max("c").cast("long").alias("max_part_edges"))
        rep = (e.select("part", F.col("src").alias("node"))
               .unionByName(e.select("part", F.col("dst").alias("node")))
               .dropDuplicates()
               .groupBy("node").agg(F.count(F.lit(1)).alias("k"))
               .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                    F.sum("k").cast("long").alias("replicas")))
        return (bal.crossJoin(rep)  # two 1-row frames
                .select(F.lit(label).alias("strategy"),
                        F.lit(P).cast("int").alias("n_partitions"),
                        "n_edges", "max_part_edges",
                        F.expr(f"(1000000 * max_part_edges * {P})"
                               " div n_edges").cast("long")
                        .alias("balance_micro6"),
                        "n_nodes", "replicas",
                        F.expr("(1000000 * replicas) div n_nodes")
                        .cast("long").alias("replication_micro6")))

    e1 = edges.select((h("src") % P).cast("int").alias("part"),
                      "src", "dst")
    e2 = edges.select(((h("src") % rows) * cols + (h("dst") % cols))
                      .cast("int").alias("part"), "src", "dst")
    return stats(e1, "hash_1d_src").unionByName(stats(e2, "grid_2d"))


def salsa_scores(edges: DataFrame) -> DataFrame:
    """SALSA authority scores (Lempel & Moran '00) via the stationary
    CLOSED FORM instead of power iteration: the authority-side random
    walk (back along one link, forward along another) has stationary
    mass proportional to in-degree WITHIN each connected component of
    the authority chain, and the component-weighted convention gives
    every irreducible component equal total mass 1/k — so
    score(a) = (1/k) * in_deg(a) / in_w(C_a), computed exactly as
    salsa_nano = (1e9 * in_deg) div (n_components * comp_in_w).  No
    iteration, no convergence tolerance, bit-exact.

    Authority-chain components are computed over the BIPARTITE star
    graph (hub marker 'h::src' — authority node 'a::dst') rather than
    the co-citation pair expansion: a hub with out-degree d would
    emit d(d-1)/2 co-citation pairs (the classic quadratic blowup on
    skewed webgraphs); the bipartite form stays LINEAR in edges and
    yields identical authority components.  'a::' sorts before
    'h::', so every component's min-label is an authority marker and
    strips cleanly.

    Output: (node, in_deg, component, comp_in_w, n_components,
    salsa_nano), one row per authority (node with in-degree >= 1).

    Scale shape: one in-degree aggregate, log-round CC over the
    bipartite edges (the Kiveris et al. path), a component-sized
    aggregate, and a 1-row n_components scalar crossJoin.
    """
    from .linking import connected_components

    ine = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("in_deg"))
    be = (edges.select(
        F.concat(F.lit("h::"), F.col("src")).alias("src"),
        F.concat(F.lit("a::"), F.col("dst")).alias("dst"))
        .dropDuplicates())
    bnodes = (be.select(F.col("src").alias("node"))
              .unionByName(be.select(F.col("dst").alias("node")))
              .dropDuplicates())
    comp = connected_components(be, bnodes)
    auth = ine.join(
        comp.where(F.col("node").startswith("a::"))
            .select(F.expr("substring(node, 4)").alias("node"),
                    F.expr("substring(component, 4)")
                    .alias("component")), "node")
    cw = auth.groupBy("component").agg(
        F.sum("in_deg").cast("long").alias("comp_in_w"))
    kct = cw.agg(F.count(F.lit(1)).cast("long").alias("n_components"))
    return (auth.join(cw, "component").crossJoin(kct)  # 1-row scalar
            .select("node", "in_deg", "component", "comp_in_w",
                    "n_components",
                    F.expr("(1000000000 * in_deg)"
                           " div (n_components * comp_in_w)")
                    .cast("long").alias("salsa_nano")))


def bipartite_check(edges: DataFrame, n_rounds: int = 8) -> DataFrame:
    """Two-colorability census per connected component: color every
    node by the parity of its shortest distance from the component's
    min-label node, then count edges whose endpoints share a parity —
    each such edge certifies an odd cycle, so n_violations = 0 iff
    the component is bipartite.  The KG read: a co-mention community
    that 2-colors cleanly is two non-interacting entity layers (e.g.
    attribute vs subject vocabularies); odd edges measure how far the
    community is from that structure.

    Propagation is ``n_rounds`` synchronous rounds of per-node
    min(struct(comp, dist)) — lexicographic, so the smallest
    reachable label wins and, within it, the SHORTEST distance (a
    longer path's larger dist always loses the struct min; after r
    rounds every node within r hops of its component min holds the
    exact BFS depth).  Both engines truncate identically at
    ``n_rounds`` hops; edges whose endpoints disagree on comp under
    truncation are excluded by the comp-equality join (none exist
    once n_rounds >= the max eccentricity of component min nodes —
    pinned by the convergence test).

    Output: (component, n_nodes, n_edges, n_violations,
    is_bipartite).

    Scale shape: the Kiveris-style log-round alternative exists for
    labels, but parity needs DISTANCES, so rounds are O(diameter) —
    each round one equi-join + one aggregate, localCheckpoint to cut
    lineage; web community diameters are small (6-degrees), and
    n_rounds caps the worst case explicitly.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    sym = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(und.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"))))
    state = (sym.select(F.col("src").alias("node")).dropDuplicates()
             .select("node", F.col("node").alias("comp"),
                     F.lit(0).cast("int").alias("dist"))
             .localCheckpoint())
    for _ in range(n_rounds):
        cand = (state.join(sym, state["node"] == sym["src"])
                .select(F.col("dst").alias("node"), F.col("comp"),
                        (F.col("dist") + 1).cast("int").alias("dist")))
        state = (state.unionByName(cand)
                 .groupBy("node")
                 .agg(F.min(F.struct("comp", "dist")).alias("_s"))
                 .select("node", F.col("_s.comp").alias("comp"),
                         F.col("_s.dist").alias("dist"))
                 .localCheckpoint())
    sa = state.select(F.col("node").alias("a"),
                      F.col("comp").alias("comp"),
                      F.col("dist").alias("_da"))
    sb = state.select(F.col("node").alias("b"),
                      F.col("comp").alias("_cb"),
                      F.col("dist").alias("_db"))
    ev = (und.join(sa, "a").join(sb, "b")
          .where(F.col("comp") == F.col("_cb"))
          .groupBy("comp").agg(
              F.count(F.lit(1)).cast("long").alias("n_edges"),
              F.sum(((F.col("_da") + F.col("_db")) % 2 == 0)
                    .cast("int")).cast("long").alias("n_violations")))
    nn = state.groupBy("comp").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (nn.join(ev, "comp")
            .select(F.col("comp").alias("component"), "n_nodes",
                    "n_edges", "n_violations",
                    (F.col("n_violations") == 0).cast("int")
                    .alias("is_bipartite")))


def graph_eccentricity(edges: DataFrame, n_rounds: int = 8) -> DataFrame:
    """Exact per-node eccentricity with the component-level
    radius/diameter attached — the ground-truth audit for the
    approximate distance machinery (hyperball's effective diameter,
    landmark closeness): ecc(v) = max over reachable u of d(v, u),
    radius = min ecc (the center), diameter = max ecc.

    Computed as a bounded BFS closure: pair states (src, node, dist)
    grow one hop per round, keeping min dist per pair — after r
    rounds every pair within r hops is exact (same argument as
    bipartite_check's struct-min).  ``n_rounds`` must cover the true
    diameter; the convergence pytest pins that on the driver graph.

    THE SCALE CONTRACT: pair states are O(V^2) — this is the exact
    SMALL-GRAPH audit (entity communities, schema graphs), while
    hyperball (registered) is the production path for corpus-scale
    graphs; the same split as suffix-array vs windowed-exact dedup.

    Output: (node, n_reached, ecc, radius, diameter, is_center),
    radius/diameter computed within the node's component.

    Every round is one equi-join + one aggregate, localCheckpoint to
    cut lineage.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    sym = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(und.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"))))
    nodes = sym.select(F.col("src").alias("node")).dropDuplicates()
    state = nodes.select(
        F.col("node").alias("s"), F.col("node").alias("node"),
        F.lit(0).cast("int").alias("dist")).localCheckpoint()
    for _ in range(n_rounds):
        cand = (state.join(sym, state["node"] == sym["src"])
                .select("s", F.col("dst").alias("node"),
                        (F.col("dist") + 1).cast("int").alias("dist")))
        state = (state.unionByName(cand)
                 .groupBy("s", "node")
                 .agg(F.min("dist").cast("int").alias("dist"))
                 .localCheckpoint())
    from pyspark.sql import Window

    ecc = state.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.max("dist").cast("int").alias("ecc"),
        F.min("node").alias("_comp"))  # min reachable id = component
    w = Window.partitionBy("_comp")
    return (ecc.withColumn("radius", F.min("ecc").over(w).cast("int"))
            .withColumn("diameter", F.max("ecc").over(w).cast("int"))
            .select(F.col("s").alias("node"), "n_reached", "ecc",
                    "radius", "diameter",
                    (F.col("ecc") == F.col("radius")).cast("int")
                    .alias("is_center")))


def rich_club(edges: DataFrame, ks=(1, 2, 4, 8)) -> DataFrame:
    """Rich-club coefficient phi(k) = E_k / (N_k * (N_k - 1) / 2) —
    do the high-degree nodes preferentially connect to EACH OTHER?
    (Colizza et al. '06; hub-collusion vs hub-and-spoke is the
    difference between a navigable core and a fragile star.)  For
    each threshold k: the nodes of degree > k, the edges with both
    endpoints in that club, and the exact density micro6.

    Output: (k, n_rich, e_rich, possible_pairs, phi_micro6) — rows
    where the club has >= 2 members.

    Scale shape: one degree aggregate, per-k membership is a
    broadcast-sized semi-join of the edge list against the club
    (the club shrinks as k grows); the k fan-out is a literal
    explode on the bounded degree table.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    deg = (und.select(F.col("a").alias("node"))
           .unionByName(und.select(F.col("b").alias("node")))
           .groupBy("node")
           .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    fan = deg.select(
        "node", "deg",
        F.explode(F.array(*[F.lit(k) for k in ks])).alias("k"))
    club = fan.where(F.col("deg") > F.col("k")).select("k", "node")
    nk = club.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_rich"))
    ca = club.select("k", F.col("node").alias("a"))
    cb = club.select("k", F.col("node").alias("b"))
    ek = (und.join(ca, "a").join(cb, ["k", "b"])
          .groupBy("k").agg(F.count(F.lit(1)).cast("long")
                            .alias("e_rich")))
    return (nk.join(ek, "k", "left").fillna(0, ["e_rich"])
            .where(F.col("n_rich") >= 2)
            .select(F.col("k").cast("int"), "n_rich",
                    F.col("e_rich").cast("long"),
                    F.expr("(n_rich * (n_rich - 1)) div 2")
                    .cast("long").alias("possible_pairs"),
                    F.expr("(2000000 * e_rich)"
                           " div (n_rich * (n_rich - 1))")
                    .cast("long").alias("phi_micro6")))


def harmonic_centrality(edges: DataFrame, n_rounds: int = 8) -> DataFrame:
    """Exact harmonic centrality per node: sum over other reachable
    nodes of floor(1e6 / d(u, v)) — the disconnected-safe variant of
    closeness (Boldi-Vigna's preferred centrality, here in its
    integer-exact per-term-floor form so both engines compute the
    IDENTICAL number with no rational-sum denominators), plus the raw
    closeness pieces (n_reached_others, dist_sum) for downstream
    ratios.

    Same bounded BFS-closure device as graph_eccentricity (min-dist
    pair states, one equi-join + aggregate per round, localCheckpoint
    to cut lineage); ``n_rounds`` must cover the true diameter —
    pinned by the convergence pytest on the driver graph.

    THE SCALE CONTRACT: pair states are O(V^2) — the exact
    small-graph audit path (entity communities, schema graphs);
    hyperball / landmark_centrality are the registered approximate
    production paths for corpus-scale graphs.

    Output: (node, n_reached_others, dist_sum, harmonic_floor6).
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    sym = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(und.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"))))
    nodes = sym.select(F.col("src").alias("node")).dropDuplicates()
    state = nodes.select(
        F.col("node").alias("s"), F.col("node").alias("node"),
        F.lit(0).cast("int").alias("dist")).localCheckpoint()
    for _ in range(n_rounds):
        cand = (state.join(sym, state["node"] == sym["src"])
                .select("s", F.col("dst").alias("node"),
                        (F.col("dist") + 1).cast("int").alias("dist")))
        state = (state.unionByName(cand)
                 .groupBy("s", "node")
                 .agg(F.min("dist").cast("int").alias("dist"))
                 .localCheckpoint())
    return (state.where(F.col("dist") > 0)
            .groupBy("s")
            .agg(F.count(F.lit(1)).cast("long")
                 .alias("n_reached_others"),
                 F.sum("dist").cast("long").alias("dist_sum"),
                 F.sum(F.expr("1000000 div dist")).cast("long")
                 .alias("harmonic_floor6"))
            .select(F.col("s").alias("node"), "n_reached_others",
                    "dist_sum", "harmonic_floor6"))


def dag_path_counts(edges: DataFrame, scc: DataFrame,
                    n_rounds: int = 10) -> DataFrame:
    """Exact root-to-node path COUNTS over the SCC condensation —
    the provenance-fanout statistic dag_layers' critical path does
    not give: how many distinct prerequisite chains reach each
    component?  A node with a long level but ONE path is a fragile
    pipeline; many paths = redundant derivations (and a
    combinatorially expensive node to re-verify).

    P(C) = [C is a root] + sum over condensation edges (S, C) of
    P(S) — the path-polynomial semiring evaluated by fixed-round
    propagation (the dag_layers discipline): after r rounds P counts
    every path of <= r edges, so any n_rounds >= DAG depth is exact;
    the DuckDB oracle instead ENUMERATES paths with a UNION ALL
    recursion and counts rows — two different evaluation orders of
    the same semiring, equal only if both are exactly right.

    Input: directed ``edges (src, dst, ...)``, ``scc (node,
    scc_id)``.  Output: (scc_id, n_nodes, is_root, is_sink,
    n_paths).  Counts are BIGINT; at web scale run on the condensed
    (bounded) schema/precedence graph, never the raw corpus graph —
    path counts grow combinatorially by design.

    Scale: condensation = two keyed label joins + distinct; each
    round one grouped sum + one keyed left join, localCheckpoint per
    round."""
    sa = scc.select(F.col("node").alias("src"),
                    F.col("scc_id").alias("a"))
    sb = scc.select(F.col("node").alias("dst"),
                    F.col("scc_id").alias("b"))
    e = (edges.select("src", "dst").join(sa, "src").join(sb, "dst")
         .where(F.col("a") != F.col("b"))
         .select("a", "b").dropDuplicates().localCheckpoint())
    comps = (scc.groupBy("scc_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
             .localCheckpoint())
    heads = e.select(F.col("b").alias("scc_id")).dropDuplicates()
    tails = e.select(F.col("a").alias("scc_id")).dropDuplicates()
    flagged = (comps
               .join(heads.withColumn("_h", F.lit(1)), "scc_id",
                     "left")
               .join(tails.withColumn("_t", F.lit(1)), "scc_id",
                     "left")
               .select("scc_id", "n_nodes",
                       F.when(F.col("_h").isNull(), 1).otherwise(0)
                       .cast("int").alias("is_root"),
                       F.when(F.col("_t").isNull(), 1).otherwise(0)
                       .cast("int").alias("is_sink"))
               .localCheckpoint())
    p = flagged.select("scc_id",
                       F.col("is_root").cast("long").alias("n_paths"))
    for _ in range(n_rounds):
        upd = (e.join(p.select(F.col("scc_id").alias("a"),
                               F.col("n_paths").alias("pa")), "a")
               .groupBy(F.col("b").alias("scc_id"))
               .agg(F.sum("pa").cast("long").alias("inc")))
        p = (flagged.select("scc_id", "is_root")
             .join(upd, "scc_id", "left")
             .select("scc_id",
                     (F.col("is_root")
                      + F.coalesce(F.col("inc"), F.lit(0)))
                     .cast("long").alias("n_paths"))
             .localCheckpoint())
    return (flagged.join(p, "scc_id")
            .select("scc_id", "n_nodes", "is_root", "is_sink",
                    "n_paths"))


def eulerian_census(edges: DataFrame, n_rounds: int = 8) -> DataFrame:
    """Eulerian-feasibility census per connected component — the
    classic degree-parity read on the co-mention graph: a component
    has an Euler CIRCUIT iff every node has even degree, an Euler
    TRAIL iff exactly two nodes are odd (the route-inspection /
    graph-traversal planning primitive).

    Degrees are simple-graph degrees (undirected dedup), components
    are the min-reachable-id labels from the same bounded BFS
    closure as graph_eccentricity / bipartite_check (n_rounds must
    cover the diameter; pinned by their convergence tests).

    Output: (component, n_nodes, n_edges, n_odd_nodes,
    has_circuit, has_trail).

    Scale: the closure is the exact small-graph audit path (O(V^2)
    pair states); degrees and the final roll-up are one keyed
    aggregate each.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    sym = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(und.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"))))
    state = (sym.select(F.col("src").alias("s"))
             .dropDuplicates()
             .select("s", F.col("s").alias("node"))
             .localCheckpoint())
    for _ in range(n_rounds):
        cand = (state.join(sym, state["node"] == sym["src"])
                .select("s", F.col("dst").alias("node")))
        state = (state.unionByName(cand)
                 .dropDuplicates(["s", "node"]).localCheckpoint())
    comp = state.groupBy("s").agg(F.min("node").alias("component"))
    deg = (sym.groupBy(F.col("src").alias("s"))
           .agg(F.count(F.lit(1)).alias("_deg")))
    nodes = (comp.join(deg, "s")
             .groupBy("component")
             .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                  F.sum((F.col("_deg") % 2).cast("int")).cast("long")
                  .alias("n_odd_nodes")))
    ecnt = (und.join(comp.withColumnRenamed("s", "a"), "a")
            .groupBy("component")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    return (nodes.join(ecnt, "component")
            .select("component", "n_nodes", "n_edges", "n_odd_nodes",
                    (F.col("n_odd_nodes") == 0).cast("int")
                    .alias("has_circuit"),
                    (F.col("n_odd_nodes") == 2).cast("int")
                    .alias("has_trail")))


def pagerank_delta(edges: DataFrame, n_iter: int = 5) -> DataFrame:
    """PageRank convergence audit: the exact L1 / max movement of
    the integer fixed-point ranks between iterations ``n_iter - 1``
    and ``n_iter`` — the number that justifies (or indicts) the
    registered 5-round budget: if one more power-method round still
    moves 1% of the mass, 5 rounds was not convergence.

    Pure reuse of :func:`pagerank_fixed` at both depths (identical
    recurrence, so the delta is bit-exact too); the oracle reuses
    the SAME unrolled CTE chain and simply reads pr4 and pr5.

    Output: one row (n_nodes, l1_delta_u, max_delta_u,
    l1_share_micro6 = floor(1e6 * L1 / total final mass)).

    Scale: two fixed-round rank computations over the bounded
    canonical KG graph + one keyed join.
    """
    a = pagerank_fixed(edges, n_iter=n_iter - 1).select(
        "node", F.col("rank_u").alias("_ra"))
    b = pagerank_fixed(edges, n_iter=n_iter).select(
        "node", F.col("rank_u").alias("_rb"))
    return (a.join(b, "node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                 F.sum(F.abs(F.col("_ra") - F.col("_rb")))
                 .cast("long").alias("l1_delta_u"),
                 F.max(F.abs(F.col("_ra") - F.col("_rb")))
                 .cast("long").alias("max_delta_u"),
                 F.expr("(1000000 * sum(abs(_ra - _rb)))"
                        " div sum(_rb)").cast("long")
                 .alias("l1_share_micro6")))


def stress_centrality(edges: DataFrame, n_rounds: int = 8) -> DataFrame:
    """Exact stress centrality per node: the number of shortest
    paths (over all unordered node pairs s < t, s != v != t) that
    pass THROUGH v — Shimbel's integer precursor of betweenness.
    Betweenness divides each pair's contribution by sigma_st, which
    makes it an irrational sum; stress keeps the raw geodesic count,
    so the audit stays value-exact across engines while ranking
    nearly the same brokers.  Uses Brandes' counting identity
    without the dependency pass: sigma_st(v) = sigma_sv * sigma_vt
    when d(s,v) + d(v,t) = d(s,t), else 0.

    Three stages, each oracle-checkable:
    1. all-pairs min-dist via the bounded BFS-closure device of
       graph_eccentricity/harmonic_centrality (n_rounds must cover
       the diameter — pinned by the convergence pytest);
    2. geodesic counts sigma(s, v) by LEVEL-SYNCHRONOUS recurrence:
       sigma at distance d = sum of sigma over in-neighbors at
       distance d-1 (one join + one keyed aggregate per level —
       counts walks on the shortest-path DAG only, so no
       enumeration blowup);
    3. stress(v) = sum over s < t of sigma_sv * sigma_vt
       [d_sv + d_vt = d_st] — two equi-joins on the pair table plus
       one aggregate.

    THE SCALE CONTRACT (same as harmonic_centrality): pair states
    are O(V^2) and stage 3 touches O(V^3) triples — the exact
    small-graph audit path for entity communities / schema graphs;
    landmark_centrality and hyperball are the registered
    approximate production paths for corpus-scale graphs.

    Output: (node, stress, n_geodesic_pairs) for every node of the
    undirected simple graph; nodes on no geodesic report 0.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    sym = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionByName(und.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"))))
    nodes = sym.select(F.col("src").alias("node")).dropDuplicates()
    state = nodes.select(
        F.col("node").alias("s"), F.col("node").alias("node"),
        F.lit(0).cast("int").alias("dist")).localCheckpoint()
    for _ in range(n_rounds):
        cand = (state.join(sym, state["node"] == sym["src"])
                .select("s", F.col("dst").alias("node"),
                        (F.col("dist") + 1).cast("int").alias("dist")))
        state = (state.unionByName(cand)
                 .groupBy("s", "node")
                 .agg(F.min("dist").cast("int").alias("dist"))
                 .localCheckpoint())
    dists = state
    cur = (dists.where(F.col("dist") == 0)
           .select("s", "node", F.lit(1).cast("long").alias("sigma"))
           .localCheckpoint())
    sig = cur
    for d in range(1, n_rounds + 1):
        lvl = (dists.where(F.col("dist") == d)
               .select(F.col("s").alias("_ls"),
                       F.col("node").alias("_lv")))
        cur = (cur.join(sym, cur["node"] == sym["src"])
               .select("s", F.col("dst").alias("node"), "sigma")
               .join(lvl, (F.col("node") == F.col("_lv"))
                     & (F.col("s") == F.col("_ls")))
               .groupBy(F.col("s"), F.col("node"))
               .agg(F.sum("sigma").cast("long").alias("sigma"))
               .localCheckpoint())
        sig = sig.unionByName(cur)
    p1 = sig.select(F.col("s").alias("_s"), F.col("node").alias("_v"),
                    F.col("sigma").alias("_sig1"))
    p1 = p1.join(dists.select(F.col("s").alias("_s"),
                              F.col("node").alias("_v"),
                              F.col("dist").alias("_d1")),
                 ["_s", "_v"])
    p2 = sig.select(F.col("s").alias("_v"), F.col("node").alias("_t"),
                    F.col("sigma").alias("_sig2"))
    p2 = p2.join(dists.select(F.col("s").alias("_v"),
                              F.col("node").alias("_t"),
                              F.col("dist").alias("_d2")),
                 ["_v", "_t"])
    p3 = dists.select(F.col("s").alias("_s"), F.col("node").alias("_t"),
                      F.col("dist").alias("_d3"))
    through = (p1.join(p2, "_v")
               .join(p3, ["_s", "_t"])
               .where((F.col("_s") < F.col("_t"))
                      & (F.col("_v") != F.col("_s"))
                      & (F.col("_v") != F.col("_t"))
                      & (F.col("_d1") + F.col("_d2") == F.col("_d3")))
               .groupBy(F.col("_v").alias("node"))
               .agg(F.sum(F.col("_sig1") * F.col("_sig2"))
                    .cast("long").alias("stress"),
                    F.count(F.lit(1)).cast("long")
                    .alias("n_geodesic_pairs")))
    return (nodes.join(through, "node", "left")
            .select("node",
                    F.coalesce("stress", F.lit(0)).cast("long")
                    .alias("stress"),
                    F.coalesce("n_geodesic_pairs", F.lit(0))
                    .cast("long").alias("n_geodesic_pairs")))


def resource_allocation(edges: DataFrame,
                        max_deg: "int | None" = None) -> DataFrame:
    """Resource-allocation link-prediction index (Zhou/Lu/Zhang
    2009) for every NON-edge 2-hop pair — the degree-weighted
    upgrade of :func:`link_prediction`'s raw common-neighbor count:
    each shared neighbor z contributes 1/deg(z), so a wedge through
    a rare entity is worth more than one through a hub that
    co-occurs with everything.  RA is the top local index in the
    Zhou et al. benchmarks and, unlike its log-weighted sibling
    Adamic-Adar, is exactly computable in integers: each wedge
    contributes the per-term floor 1e6 div deg(z) (the
    harmonic_centrality device), so the score is cross-engine
    bit-exact.

    Output: (src, dst, cn, ra_micro6) for every candidate pair
    (src < dst, no existing edge, >= 1 common neighbor).

    Scale shape: identical to link_prediction — symmetrize once,
    one wedge self-join pivoting on the shared neighbor (its degree
    joined in BEFORE the pair aggregate, so the per-term floor
    happens wedge-side), one (pair) aggregate, one anti-join, with
    the same ``max_deg`` hub cap on candidate generation.
    """
    und = (edges.select(F.least("src", "dst").alias("src"),
                        F.greatest("src", "dst").alias("dst"))
           .where(F.col("src") != F.col("dst")).dropDuplicates()
           .localCheckpoint())
    sym = und.union(und.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    pivot = sym.select(F.col("src").alias("n"), F.col("dst").alias("a"))
    if max_deg is not None:
        keep = deg.where(F.col("deg") <= max_deg).select(
            F.col("node").alias("n"))
        pivot = pivot.join(keep, "n")
    pivot = pivot.join(deg.withColumnRenamed("node", "n"), "n")
    wedges = (pivot.join(pivot.select("n", F.col("a").alias("b")), "n")
              .where(F.col("a") < F.col("b")))
    return (wedges
            .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
            .agg(F.count(F.lit(1)).cast("long").alias("cn"),
                 F.sum(F.expr("1000000 div deg")).cast("long")
                 .alias("ra_micro6"))
            .join(und, ["src", "dst"], "left_anti")
            .select("src", "dst", "cn", "ra_micro6"))


def clustering_coeffs(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node + the graph's global
    transitivity ratio — the cohesion DENSITY read that
    triangle_counts' raw counts only hint at: a hub with 50
    triangles over 1000 possible neighbor pairs (cc = 0.1) is a
    looser entity than a 5-triangle node whose neighborhood is a
    clique (cc = 1.0), and a canonicalization that merges unrelated
    entities shows up as exactly that dilution.

    Per node: cc_micro6 = 1e6 * 2*T_v div (d_v * (d_v - 1)) (0 for
    degree <= 1).  Global transitivity (repeated per row, the
    1-row lazy crossJoin device): trans_micro6 = 1e6 * 3*triangles
    div wedges, wedges = sum_v d_v*(d_v-1)/2 — the closed-vs-open
    wedge ratio, NOT the cc average (both are emitted by design:
    their gap is the classic hub-dominance signal).

    Output: (node, degree, n_triangles, cc_micro6, n_nodes,
    trans_micro6).

    Scale shape: triangle_counts' two ordered equi-joins + one
    degree aggregate; the wedge total is a 1-row aggregate over
    the degree table.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    sym = und.union(und.select(F.col("b").alias("a"),
                               F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree"))
    tri = triangle_counts(und.select(F.col("a").alias("src"),
                                     F.col("b").alias("dst")))
    per = (deg.join(tri, "node", "left")
           .select("node", "degree",
                   F.coalesce(F.col("n_triangles"), F.lit(0))
                   .cast("long").alias("n_triangles"))
           .withColumn("cc_micro6",
                       F.expr("CAST(CASE WHEN degree > 1 THEN"
                              " (1000000 * 2 * n_triangles)"
                              " DIV (degree * (degree - 1))"
                              " ELSE 0 END AS BIGINT)")))
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("CAST(CASE WHEN SUM(degree * (degree - 1)) > 0 THEN"
               " (CAST(1000000 AS DECIMAL(38,0)) * SUM(n_triangles))"
               " div (SUM(degree * (degree - 1)) DIV 2)"
               " ELSE 0 END AS BIGINT)").alias("trans_micro6"))
    return (per.crossJoin(F.broadcast(tot))  # 1-row scalar
            .select("node", "degree", "n_triangles", "cc_micro6",
                    "n_nodes", "trans_micro6"))


def eigen_centrality(edges: DataFrame, n_iter: int = 5,
                     scale: int = 10**6) -> DataFrame:
    """Eigenvector centrality by integer fixed-point power
    iteration — the classic "important because connected to
    important" score that completes the centrality family:
    pagerank adds teleport damping, katz adds per-step attenuation,
    THIS is the undamped spectral original (the dominant
    eigenvector of the adjacency matrix), and the per-round
    max-ratio doubles as a spectral-radius estimate.

    Quantized (the pagerank_fixed / embedding_pca discipline):
    start uniform at scale, each round v'(u) = sum over neighbors
    of v(w) (integer), renormalize v'' = v' * scale div max(v')
    (truncating division, identical cross-engine), emit the final
    vector plus lambda_milli3 = 1000 * max(v') div scale from the
    LAST round — on a converged vector that ratio IS the spectral
    radius estimate.

    Output per node: (node, degree, cent_u, lambda_milli3).

    Scale shape: symmetrize once; each round is ONE neighbor
    equi-join + one node aggregate, localCheckpoint per round; the
    per-round max is a 1-row lazy broadcast crossJoin.
    """
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b")).dropDuplicates()
           .localCheckpoint())
    sym = und.union(und.select(F.col("b").alias("a"),
                               F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")) \
        .localCheckpoint()
    v = deg.select("node", F.lit(scale).cast("long").alias("_v"))
    lam = None
    for _ in range(n_iter):
        nxt = (sym.join(v.withColumnRenamed("node", "b")
                        .withColumnRenamed("_v", "_vb"), "b")
               .groupBy(F.col("a").alias("node"))
               .agg(F.sum("_vb").cast("long").alias("_raw")))
        mx = nxt.agg(F.max("_raw").alias("_mx"))
        lam = mx  # the last round's max raw value
        v = (deg.select("node")
             .join(nxt, "node", "left")
             .crossJoin(F.broadcast(mx))  # 1-row scalar
             .select("node",
                     F.expr(f"CASE WHEN _mx > 0 THEN"
                            f" CAST((coalesce(_raw, 0) * {scale})"
                            " div _mx AS BIGINT)"
                            " ELSE CAST(0 AS BIGINT) END")
                     .alias("_v"))
             .localCheckpoint())
    lam_row = lam.select(
        F.expr(f"CAST(1000 * _mx DIV {scale} AS BIGINT)")
        .alias("lambda_milli3"))
    return (deg.join(v, "node")
            .crossJoin(F.broadcast(lam_row))  # 1-row scalar
            .select("node", "degree",
                    F.col("_v").cast("long").alias("cent_u"),
                    "lambda_milli3"))
