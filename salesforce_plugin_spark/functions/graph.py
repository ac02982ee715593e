"""Iterative graph analytics: fixed-iteration exact-integer PageRank.

Complements ``dedup.connected_components`` (the other iterative graph op)
with a *weighted-importance* primitive — the standard tool for ranking
entities in a co-occurrence graph (supplier↔part, doc↔domain, user↔item)
when curating or sampling training data.

Floating PageRank can never sit under a cross-engine differential gate:
each iteration SUMS neighbor contributions in aggregation-tree order,
which differs between engines in the last ulp and *compounds* per
iteration. Here every quantity is a scaled BIGINT and every division is
an integer floor divide, so each iteration — and therefore the whole
fixed-iteration run — is bit-reproducible anywhere (the property that
also makes checkpoint/resume deterministic on a cluster):

- ``r_0 = scale div N``;
- contribution of node u: ``r_k(u) div deg(u)``;
- ``r_{k+1}(v) = (dd-dm)*(scale div N) div dd
                + dm * sum(contributions into v) div dd``
  with damping ``dm/dd`` (default 85/100).

The floor quantization loses < 1 unit per divide (≤ 1e-12 of total mass
per edge at the default scale) — documented, deterministic, and
irrelevant to ranking use.

Scale shape per iteration: one equi-join of ranks onto the edge list's
source side (ranks and degrees are node-sized; the join shuffles edge
rows on src), one partial-combined sum keyed on dst, one node-sized left
join. A fixed iteration count keeps the whole run ONE lazy plan — no
driver loop state, no checkpoint needed at these depths (for tens of
iterations, insert localCheckpoint like connected_components does).
"""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: Fraction = Fraction(85, 100),
    scale: int = 10**12,
    symmetrize: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over ``edges``; nodes are everything
    appearing as an endpoint. With ``symmetrize`` each edge counts in
    both directions (the undirected form). Returns
    ``(id long, rank_scaled long, rank double)`` with
    ``rank = rank_scaled / scale`` (one double divide).

    With ``weight_col`` (a non-negative INTEGER edge weight —
    co-occurrence counts, quantities), mass splits proportionally:
    contribution along (u, v) is ``r(u)·w(u,v) div W(u)`` with W(u) the
    node's outgoing weight sum — computed in exact DECIMAL(38,0) via
    the exactmath floor identity (``r·w`` wraps BIGINT long before
    corpus-scale weights do). Parallel weighted edges pre-aggregate;
    the unweighted path is bit-identical to before.
    """
    from salesforce_plugin_spark.functions.exactmath import dcast, dfloor

    if iterations < 1:
        raise ValueError("pagerank_fixed requires at least one iteration")
    dm, dd = damping.numerator, damping.denominator
    if weight_col is None:
        e = edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        ).distinct()
        if symmetrize:
            e = e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
    else:
        e = edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
            F.col(weight_col).cast("long").alias("__w"),
        )
        if symmetrize:
            e = e.unionByName(
                e.select(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    "__w",
                )
            )
        e = e.groupBy("src", "dst").agg(F.sum("__w").alias("__w"))
        # nodes are taken from the UNFILTERED endpoint set below, but
        # zero-weight edges must not reach the flow computation: a node
        # with only zero-weight out-edges would make W(u) = 0 and the
        # renormalizing divide a DIVIDE_BY_ZERO under ANSI. Dropping
        # them is also the right semantics — a zero-weight edge carries
        # no mass (the node keeps its teleport share).
        nodes_pre = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        e = e.filter(F.col("__w") > 0)
    # endpoints from BOTH sides: in the directed form a sink-only node
    # still owns rank (it just contributes nothing — its outflow term
    # never joins); in the symmetrized form the union is a no-op
    nodes = (
        nodes_pre
        if weight_col is not None
        else (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    )
    if weight_col is None:
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("__deg")
        )
    else:
        deg = e.groupBy(F.col("src").alias("id")).agg(
            F.sum("__w").cast("long").alias("__deg")
        )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("__n"))

    # r0 and the teleport base, as node-sized frames carrying the scalars
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "id", F.expr(f"{scale}L div __n").alias("__r"), "__n"
    )
    for _ in range(iterations):
        contrib = (
            # deg and ranks are node-sized: deliberately un-hinted, so AQE
            # broadcasts them at bench scale and degrades to shuffle joins
            # when the node set outgrows the threshold (same posture as
            # the TPC-H fact sides)
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                (
                    F.expr("__r div __deg")
                    if weight_col is None
                    else F.expr(
                        dfloor(
                            dcast("__r") + " * " + dcast("__w"),
                            dcast("__deg"),
                        )
                    )
                ).alias("__c"),
            )
            .groupBy("id")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            ranks.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.expr(f"(({dd - dm}) * ({scale}L div __n)) div {dd}")
                    + F.expr(
                        f"({dm} * coalesce(__in, 0L)) div {dd}"
                    )
                ).alias("__r"),
                "__n",
            )
        )
    return ranks.select(
        "id",
        F.col("__r").alias("rank_scaled"),
        (F.col("__r").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts — the local clustering primitive used to
    find tightly-knit duplicate/community structure in co-occurrence
    graphs (complements pagerank's importance and connected_components'
    reachability).

    The input is an UNDIRECTED edge list in any orientation; it is
    canonicalized to ``a < b`` and deduplicated, then DEGREE-ORIENTED:
    each edge points from its lower-(degree, id) endpoint to the higher
    (a strict total order, so the oriented graph is a DAG and every
    triangle has exactly ONE node with two out-edges). Enumeration is
    out-wedge generation at that node (self-equijoin on the source,
    ``v < w`` making each wedge unordered-once) closed by an equijoin
    back into the canonical edge set — each triangle found exactly once,
    no cartesian anywhere. Degree orientation is the load-bearing scale
    property (Latapy 2008): out-degrees are capped at ~sqrt(m), so wedge
    work is O(m^1.5) even on heavy-tailed graphs where a hub's
    id-oriented wedges would be O(deg²) — the 10x fact-scale probe
    (which densifies the co-purchase graph over a fixed catalog) is
    exactly such a regime.

    Output (scalar-only): ``(node, n_triangles long)`` for nodes in at
    least one triangle.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    directed = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    d2 = directed.select(F.col("u"), F.col("v").alias("w"))
    wedges = directed.join(d2, "u").filter(F.col("v") < F.col("w"))
    tri = wedges.join(
        e, (F.col("v") == F.col("a")) & (F.col("w") == F.col("b"))
    ).select("u", "v", "w")
    corners = tri.select(
        F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def label_propagation_fixed(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
    iterations: int = 2,
    symmetrize: bool = True,
) -> DataFrame:
    """Fixed-iteration label propagation — community detection /
    semi-supervised label spreading over a similarity graph (the
    standard step between a near-dup edge list and "assign every doc
    its cluster's label"). Each round every node adopts the MAJORITY
    label among its neighbors, ties broken by the SMALLEST label —
    a total, deterministic election (count desc, label asc), so unlike
    textbook random-order LPA the whole run is bit-reproducible across
    engines and partitionings (the q_pagerank/q_kmeans discipline for
    iterative algorithms: determinism is what makes checkpointed resume
    sound). Nodes with no neighbor keep their label. A fixed iteration
    count keeps the run ONE lazy plan — no driver loop state.

    Scale shape per round: one edge-sized equi-join of current labels
    onto the source side, one partial-combined (dst, label) count, one
    max_by election per node (exchange carries one row per (node,
    neighbor-label), then one per node), one node-sized left join for
    the keep-own-label fallback. Label frames are node-sized and
    deliberately un-hinted (AQE broadcasts while small).

    Output: ``(id long, label long)`` after ``iterations`` rounds.
    """
    if iterations < 1:
        raise ValueError("label_propagation_fixed requires >= 1 iteration")
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).distinct()
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    cur = labels.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(label_col).cast("long").alias("__lab"),
    )
    for _ in range(iterations):
        votes = (
            e.join(
                cur.select(
                    F.col("id").alias("src"), F.col("__lab").alias("__nl")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"), "__nl")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        elected = votes.groupBy("id").agg(
            F.max_by(
                F.col("__nl"), F.struct(F.col("__c"), -F.col("__nl"))
            ).alias("__win")
        )
        cur = cur.join(elected, "id", "left").select(
            "id", F.coalesce(F.col("__win"), F.col("__lab")).alias("__lab")
        )
    return cur.select("id", F.col("__lab").alias("label"))


def neighbor_agg(
    edges: DataFrame,
    features: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    feature_col: str = "f",
    hops: int = 1,
    symmetrize: bool = True,
) -> DataFrame:
    """Neighborhood feature aggregation — the message-passing /
    GraphSAGE-preprocessing primitive: for every node, the count and
    exact-integer SUM of its neighbors' feature values, optionally
    aggregated again over the result for a second hop (``hops=2``
    sums 1-hop aggregates over neighbors — walk-counted semantics, the
    standard untrimmed form: a 2-path through two neighbors counts per
    path, exactly what repeated sparse-matrix multiplication A·(A·f)
    computes). Features must be integer (the pre-quantization
    contract), so every hop is an exact BIGINT fold — deterministic
    across engines and safe to checkpoint between hops at scale.

    Plan per hop: one edge-sized equi-join of current node values onto
    the source side + one partial-combined sum keyed on dst — the
    PageRank iteration shape with feature payloads instead of rank.
    Isolated nodes keep count 0 / sum 0 (left join, not dropped).

    Output: (id, n_neighbors, f_sum) for hops=1;
    (id, n_neighbors, f_sum, n_2hop, f_sum_2hop) for hops=2.
    """
    if hops not in (1, 2):
        raise ValueError("neighbor_agg supports hops = 1 or 2")
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).distinct()
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    base = features.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(feature_col).cast("long").alias("__f"),
    )

    def one_hop(vals: DataFrame, val_col: str, n_out: str, s_out: str):
        agg = (
            e.join(
                vals.select(
                    F.col("id").alias("src"), F.col(val_col).alias("__v")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.count(F.lit(1)).cast("long").alias(n_out),
                F.sum("__v").alias(s_out),
            )
        )
        return (
            base.select("id")
            .join(agg, "id", "left")
            .select(
                "id",
                F.coalesce(F.col(n_out), F.lit(0).cast("long")).alias(n_out),
                F.coalesce(F.col(s_out), F.lit(0).cast("long")).alias(s_out),
            )
        )

    h1 = one_hop(base, "__f", "n_neighbors", "f_sum")
    if hops == 1:
        return h1
    h2 = one_hop(h1, "f_sum", "n_2hop", "f_sum_2hop")
    return h1.join(h2, "id")


def degree_distribution(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree histogram of an undirected graph — the first profiling
    query run on any co-occurrence/link graph before choosing join
    strategies (a heavy tail here is the evidence that motivates
    degree-orientation in ``triangle_counts`` and salting/AQE-skew
    handling in the joins that consume the edge list).

    Edges are canonicalized (``a < b``, distinct) so parallel edges and
    orientation don't inflate degrees. Output (scalar-only):
    ``(degree long, n_nodes long)`` — one row per distinct degree value,
    bounded by the max degree, after two partial-combined aggregates
    (node-sized then degree-sized exchange). Nothing here exceeds
    node cardinality, so the same plan profiles a 100 TB edge list.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


def kcore_fixed(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peeling: iteratively delete nodes of degree
    < ``k`` (and their edges) until the subgraph where every node has
    degree ≥ ``k`` remains — the standard dense-substructure extractor
    (spam/bot rings, core communities, dup clusters worth verifying
    first) over co-occurrence graphs.

    Peeling is inherently iterative but fully DETERMINISTIC — each round
    is a pure function of the previous edge set (no ordering, no RNG) —
    so a fixed-round unrolling sits naturally under the cross-engine
    differential gate, the same discipline as ``pagerank_fixed`` /
    ``kmeans`` chaining. Each round: one node-sized degree aggregate +
    two semi-joins filtering the edge set; the whole run is ONE lazy
    plan (for depths past ~10 insert localCheckpoint lineage cuts like
    ``connected_components``). ``rounds`` must be chosen ≥ the peel
    depth of the graph; callers can assert convergence by checking
    ``degree >= k`` for every output row (a converged peel's survivors
    all satisfy the core property; unit tests pin a known fixpoint).

    Output (scalar-only): ``(node long, degree long)`` — survivors after
    ``rounds`` peels with their degree in the surviving subgraph.
    """
    if k < 1 or rounds < 1:
        raise ValueError("kcore_fixed requires k >= 1 and rounds >= 1")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e = e.join(
            keep.select(F.col("node").alias("a")), "a", "left_semi"
        ).join(keep.select(F.col("node").alias("b")), "b", "left_semi")
        # each round references the previous edge set three times (two
        # degree projections + the filter base); without a lineage cut
        # the logical plan TRIPLES per round and a deep peel blows up
        # the driver — same remedy as connected_components (on a real
        # cluster point spark.sparkContext.setCheckpointDir at reliable
        # storage and prefer checkpoint() for executor-loss safety).
        e = e.localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return deg


def khop_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Fixed-``k`` BFS from a seed set over the undirected graph:
    every node within ``k`` hops, labeled with its EXACT hop distance —
    the blast-radius / influence-frontier query (which parts does this
    supplier outage touch; which users sit within 2 hops of a flagged
    account). Deterministic (set algebra only), so the unrolled rounds
    replay as chained CTEs — the kcore/pagerank iterative discipline.

    Per round: one frontier⋈edges equijoin (frontier-sized build side,
    un-hinted), a distinct, and an anti-join against the reached set;
    per-round ``localCheckpoint(eager=False)`` cuts lineage (reached is
    referenced by both the anti-join and the union — the kcore_fixed
    plan-growth lesson). Frontier work is bounded by the k-hop
    neighborhood, never the full graph, until the frontier saturates.

    Output (scalar-only): ``(node long, hops int)`` — hops = 0 for
    seeds, minimal hop count otherwise; nodes beyond ``k`` hops are
    absent.
    """
    if k < 1:
        raise ValueError("khop_reachability requires k >= 1")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    reached = seeds.select(
        F.col(id_col).alias("node"), F.lit(0).cast("int").alias("hops")
    ).distinct()
    frontier = reached.select("node")
    for i in range(1, k + 1):
        nxt = (
            frontier.join(und, frontier["node"] == und["a"])
            .select(F.col("b").alias("node"))
            .distinct()
        )
        new = nxt.join(reached.select("node"), "node", "left_anti").select(
            "node", F.lit(i).cast("int").alias("hops")
        )
        reached = reached.unionByName(new).localCheckpoint(eager=False)
        frontier = new.select("node").localCheckpoint(eager=False)
    return reached


def hits_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    quant: int = 10**6,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg): hub scores for source-side
    nodes, authority scores for destination-side nodes of a DIRECTED
    graph — the bipartite-importance companion to ``pagerank_fixed``
    (which ranks by random-walk mass; HITS separates "points at good
    things" from "is pointed at by good things" — supplier↔part,
    query↔document, user↔item).

    Exactness discipline: float HITS renormalizes by an L2 norm every
    round (sqrt + divide — engine-ambiguous and compounding). Here the
    renormalization is the gram_power_iterations integer form:
    ``x' = x·quant div max(x)`` — all scores non-negative, so Spark's
    truncating div and a floor div agree — making every round, and the
    whole run, bit-reproducible cross-engine (checkpoint/resume-sound).

    Per round: two edge equijoins + two partial-combined sums (one per
    direction), two 1-row max aggregates broadcast back. Node-sized
    sides un-hinted (AQE broadcast at bench scale, shuffle past
    threshold).

    Output (scalar-only): ``(id long, side string ('hub'|'auth'),
    score long)`` — scores in [0, quant] after the final
    renormalization.
    """
    if iterations < 1:
        raise ValueError("hits_fixed requires at least one iteration")
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).distinct()
    hubs = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.lit(quant).cast("long").alias("h"))
    )

    def renorm(df, col):
        # the pre-renorm sum is bounded by in-degree * quant; the * quant
        # here would wrap BIGINT past in-degree ~9.2e6, so the product
        # runs in DECIMAL(38,0) with the exact-multiple floor identity
        # (a - a % b) / b (Spark's div mis-handles decimal operands);
        # the RESULT is <= quant, so the long cast is always safe
        mx = df.agg(F.max(col).alias("__mx"))
        num = f"(CAST({col} AS DECIMAL(38,0)) * {quant})"
        den = "CAST(__mx AS DECIMAL(38,0))"
        return df.crossJoin(F.broadcast(mx)).select(
            "id",
            F.expr(
                f"CAST(({num} - {num} % {den}) / {den} AS BIGINT)"
            ).alias(col),
        )

    auths = None
    for _ in range(iterations):
        auths = renorm(
            e.join(hubs.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("a")),
            "a",
        )
        hubs = renorm(
            e.join(auths.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("h")),
            "h",
        )
    return hubs.select(
        "id", F.lit("hub").alias("side"), F.col("h").alias("score")
    ).unionByName(
        auths.select(
            "id", F.lit("auth").alias("side"), F.col("a").alias("score")
        )
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Mean neighbor degree per degree class (the k_nn(k) curve) — the
    degree-mixing profile that says whether hubs attach to hubs
    (assortative, social graphs) or to leaves (disassortative,
    web/biology): the shape decides how skew handling and sampling
    generalize from one graph to another. Exact integers:
    ``knn_x1000 = Σ neighbor-degree · 1000 div (k · n_k)`` via the
    exactmath decimal identity (degree products of corpus-scale counts
    overflow longs).

    Shape: canonical edges → node degrees (one bounded aggregate) →
    each edge contributes its endpoint-degree pair in both directions
    (edge-sized join, no blowup) → one degree-class-bounded aggregate.

    Output (scalar-only): ``(degree long, n_nodes long,
    knn_x1000 long)``.
    """
    from salesforce_plugin_spark.functions.exactmath import dcast, dfloor

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    both = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nbr = (
        both.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("__da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("__db")), "b")
        .groupBy(F.col("__da").alias("degree"))
        .agg(
            F.countDistinct("a").cast("long").alias("n_nodes"),
            # neighbor-degree sums are the quadratic term: DECIMAL(38,0)
            # BEFORE the sum, not after (the docstring's own rationale)
            F.sum(F.col("__db").cast("decimal(38,0)")).alias("__snd"),
        )
    )
    return nbr.select(
        "degree",
        "n_nodes",
        F.expr(
            dfloor(
                dcast("__snd") + " * 1000",
                dcast("degree") + " * " + dcast("n_nodes"),
            )
        ).alias("knn_x1000"),
    )


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity decomposition of a community assignment —
    the evaluation pairing for community detection
    (``label_propagation_fixed``), the way ``ann_recall`` evaluates the
    IVF index: an unevaluated clustering is a guess. Emitted as EXACT
    integers per community: ``q_num = 4·m·e_in − d_c²`` with the shared
    denominator ``4m²`` carried alongside, so
    ``Q = Σ q_num / (4m²)`` — no float enters the gate and partial
    sums are engine-exact (quadratics in DECIMAL(38,0), the exactmath
    discipline; a long surface that exceeds 2⁶³ fails LOUDLY under
    Spark's default ANSI mode — never silent garbage).

    Shape: canonical edge set (m from a 1-row broadcast), node degrees,
    one label join per edge side for e_in, one community-bounded final
    aggregate.

    Output (scalar-only): ``(label, n_nodes long, degree_sum long,
    e_in long, m long, q_num long)``.
    """
    from salesforce_plugin_spark.functions.exactmath import dcast

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    m1 = e.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("__deg"))
    )
    comm = communities.select(
        F.col(id_col).alias("node"), F.col(label_col).alias("label")
    )
    per_comm = (
        comm.join(deg, "node", "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.coalesce(F.sum("__deg"), F.lit(0))
            .cast("long")
            .alias("degree_sum"),
        )
    )
    la = comm.select(F.col("node").alias("a"), F.col("label").alias("__la"))
    lb = comm.select(F.col("node").alias("b"), F.col("label").alias("__lb"))
    e_in = (
        e.join(la, "a")
        .join(lb, "b")
        .filter(F.col("__la") == F.col("__lb"))
        .groupBy(F.col("__la").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_in"))
    )
    return (
        per_comm.join(e_in, "label", "left")
        .crossJoin(F.broadcast(m1))
        .select(
            "label",
            "n_nodes",
            "degree_sum",
            F.coalesce(F.col("e_in"), F.lit(0)).cast("long").alias("e_in"),
            F.col("__m").alias("m"),
            F.expr(
                "CAST(4 * " + dcast("__m")
                + " * " + dcast("coalesce(e_in, 0)")
                + " - " + dcast("degree_sum")
                + " * " + dcast("degree_sum")
                + " AS BIGINT)"
            ).alias("q_num"),
        )
    )


def ppr_fixed(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: Fraction = Fraction(85, 100),
    scale: int = 10**12,
    symmetrize: bool = True,
) -> DataFrame:
    """Fixed-iteration PERSONALIZED PageRank: the teleport mass restarts
    at the ``seeds`` node set instead of uniformly — rank becomes
    "importance relative to the seeds", the neighborhood-expansion
    primitive behind related-item discovery, seed-set expansion for
    data curation (grow a labeled pool along the co-occurrence graph),
    and local community scoring. Reduces to :func:`pagerank_fixed` when
    seeds = all nodes.

    Same exact-integer discipline: r₀ = ``scale div |S|`` on seeds (0
    elsewhere), each iteration ``r = (1−d)·(scale div |S|)·[seed] +
    d·Σ inflow`` with integer floor divides throughout — every
    iteration bit-reproducible, the oracle chains identical CTEs.

    Scale shape matches pagerank_fixed: per iteration one edge⨝rank
    join, one partial-combined inflow sum on dst, one node-sized left
    join; the seed flag is a node-sized broadcast-able join.

    Output (scalar-only): ``(id long, rank_scaled long, rank double)``.
    """
    if iterations < 1:
        raise ValueError("ppr_fixed requires at least one iteration")
    dm, dd = damping.numerator, damping.denominator
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).distinct()
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("__deg")
    )
    s = seeds.select(F.col(seeds.columns[0]).cast("long").alias("id")).distinct()
    n_seeds = s.agg(F.count(F.lit(1)).alias("__ns"))
    flagged = nodes.join(
        s.withColumn("__seed", F.lit(1)), "id", "left"
    ).select("id", F.coalesce(F.col("__seed"), F.lit(0)).alias("__seed"))
    ranks = flagged.crossJoin(F.broadcast(n_seeds)).select(
        "id",
        "__seed",
        "__ns",
        F.expr(f"CASE WHEN __seed = 1 THEN {scale}L div __ns ELSE 0L END")
        .alias("__r"),
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("__r div __deg").alias("__c"),
            )
            .groupBy("id")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            ranks.select("id", "__seed", "__ns")
            .join(contrib, "id", "left")
            .select(
                "id",
                "__seed",
                "__ns",
                (
                    F.expr(
                        f"CASE WHEN __seed = 1 THEN "
                        f"(({dd - dm}) * ({scale}L div __ns)) div {dd} "
                        f"ELSE 0L END"
                    )
                    + F.expr(f"({dm} * coalesce(__in, 0L)) div {dd}")
                ).alias("__r"),
            )
        )
    return ranks.select(
        "id",
        F.col("__r").alias("rank_scaled"),
        (F.col("__r").cast("double") / F.lit(float(scale))).alias("rank"),
    )


def deterministic_walks(
    edges: DataFrame,
    seeds: DataFrame,
    steps: int = 4,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """DeepWalk/node2vec-style walk sampling with a DETERMINISTIC
    "random" successor: from each seed, ``steps`` hops over the
    undirected graph, each hop choosing the neighbor minimizing
    ``(md5(step:cur:neighbor), neighbor)`` — an unbiased-looking but
    fully replayable hash order (the md5 split/sample discipline
    applied to graph walk sampling, which real pipelines feed to
    skip-gram embedding training; RNG walks could never sit under a
    cross-engine hash gate). Dead ends terminate the walk (no
    emission past them).

    Per step: one frontier⋈edges equijoin + a per-walk ``min_by``
    aggregate — frontier is |walks| rows, so cost is |walks|·avg-degree
    per step, never graph-global; steps unroll into ONE lazy plan with
    per-step ``localCheckpoint(eager=False)`` lineage cuts (the
    khop/kcore discipline). Output (scalar-only): ``(walk_id long,
    step int, node long)`` with step 0 = the seed itself.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    cur = seeds.select(
        F.col(id_col).alias("walk_id"),
        F.col(id_col).alias("node"),
        F.lit(0).cast("int").alias("step"),
    ).distinct()
    out = cur
    for i in range(1, steps + 1):
        hop_hash = F.md5(
            F.concat_ws(
                ":",
                F.lit(str(i)),
                F.col("node").cast("string"),
                F.col("b").cast("string"),
            )
        )
        nxt = (
            cur.join(und, cur["node"] == und["a"])
            .select(
                "walk_id",
                F.col("b").alias("__cand"),
                hop_hash.alias("__h"),
            )
            .groupBy("walk_id")
            .agg(
                F.min_by(
                    F.col("__cand"), F.struct(F.col("__h"), F.col("__cand"))
                ).alias("node")
            )
            .select(
                "walk_id", "node", F.lit(i).cast("int").alias("step")
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(nxt)
        cur = nxt
    return out.select("walk_id", "step", "node")


def link_prediction(
    edges: DataFrame,
    hub_col: str,
    node_col: str,
    min_common: int = 2,
) -> DataFrame:
    """Common-neighbor link prediction over a bipartite hub↔node graph
    (baskets↔items, suppliers↔parts, users↔docs): for every node pair
    sharing ≥ ``min_common`` hubs, the three classic scores —

        common       exact shared-hub count
        jaccard_ppm  common·10⁶ div (deg_a + deg_b − common)
        aa_milli     Σ_hubs 1000 div bits(hub_degree)   (integer
                     Adamic-Adar: ⌊log₂⌋+1 via length(bin(·))
                     replaces ln, so big promiscuous hubs still count
                     less and the score stays under the hash gate —
                     and bits(1) = 1 removes ln's deg-1 singularity)

    — the recommendation-edge ranker and the dedup-candidate
    prioritizer (pairs with high hub overlap are merge candidates
    before any expensive pairwise compare runs).

    Plan: ONE distinct (hub, node) pass; the pair space is the
    q_copurchase self-equijoin on the hub key (a < b halves it;
    per-hub cost C(degree, 2), bounded by real hub sizes — cap
    upstream for pathological hubs); hub degrees and node degrees are
    two bounded aggregates joined back by broadcast at dimension
    scale. Output (scalar-only): ``(node_a, node_b, common long,
    jaccard_ppm long, aa_milli long)``.
    """
    b = edges.select(
        F.col(hub_col).alias("__hub"), F.col(node_col).alias("__n")
    ).distinct()
    hub_deg = b.groupBy("__hub").agg(
        F.count(F.lit(1)).alias("__hdeg")
    )
    node_deg = b.groupBy(F.col("__n").alias("__nd")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    a = b.select(F.col("__hub"), F.col("__n").alias("node_a"))
    c = b.select(F.col("__hub"), F.col("__n").alias("node_b"))
    pair_hub = (
        a.join(c, "__hub")
        .filter(F.col("node_a") < F.col("node_b"))
        .join(hub_deg, "__hub")
    )
    aa_term = F.expr(
        "1000 div length(bin(__hdeg))"
    )
    scored = pair_hub.groupBy("node_a", "node_b").agg(
        F.count(F.lit(1)).cast("long").alias("common"),
        F.sum(aa_term).cast("long").alias("aa_milli"),
    ).filter(F.col("common") >= min_common)
    return (
        scored.join(
            F.broadcast(node_deg.withColumnRenamed("__deg", "__deg_a")),
            F.col("node_a") == F.col("__nd"),
        )
        .drop("__nd")
        .join(
            F.broadcast(node_deg.withColumnRenamed("__deg", "__deg_b")),
            F.col("node_b") == F.col("__nd"),
        )
        .drop("__nd")
        .select(
            "node_a",
            "node_b",
            "common",
            F.expr(
                "CAST((common * 1000000)"
                " div (__deg_a + __deg_b - common) AS BIGINT)"
            ).alias("jaccard_ppm"),
            "aa_milli",
        )
    )


def sssp_fixed(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    id_col: str = "id",
) -> DataFrame:
    """Fixed-round single-source (multi-seed) shortest paths over the
    undirected weighted graph — Bellman-Ford with the delta-relaxation
    optimization: round ``i`` relaxes only edges out of nodes whose
    distance changed in round ``i-1`` (relaxing an unchanged node
    re-derives candidates that already lost a min, so the result after
    ``rounds`` rounds is exactly the classic all-edge Bellman-Ford
    distance restricted to paths of ≤ ``rounds`` edges). Weights are
    BIGINT, so every distance is an exact integer and the run is
    bit-reproducible — the khop/kcore/pagerank fixed-iteration
    discipline, letting the unrolled rounds replay as chained CTEs
    under the differential gate. (Reference scope: the reference
    engine has no graph operators; this extends the curation surface
    the way deps-graph / citation-graph distance queries need.)

    Per round: one changed⋈edges equijoin (frontier-sized stream
    side), a min-combine keyed on dst, a node-sized min-merge with the
    running distances, and an improvement filter; per-round
    ``localCheckpoint(eager=False)`` cuts lineage (the kcore_fixed
    plan-growth lesson). Work per round is bounded by the improved
    frontier, never the full graph — on a cluster this is the
    standard Pregel-style SSSP schedule expressed as DataFrame ops.

    Output: ``(node long, dist long)`` — dist 0 for seeds, exact
    minimal path weight over ≤ ``rounds`` edges otherwise; nodes not
    reachable within ``rounds`` hops are absent. Negative weights are
    rejected (min-combine semantics assume monotone relaxation).
    """
    if rounds < 1:
        raise ValueError("sssp_fixed requires rounds >= 1")
    w_checked = F.when(
        F.col(weight_col).isNull() | (F.col(weight_col) < 0),
        F.raise_error(
            F.lit("sssp_fixed: NULL or negative edge weight (min-plus"
                  " relaxation requires non-negative weights; a NULL"
                  " weight would silently drop the relaxation as"
                  " dist+NULL=NULL loses every min)")
        ).cast("long"),
    ).otherwise(F.col(weight_col).cast("long"))
    e = (
        edges.select(
            F.col(src).alias("a"),
            F.col(dst).alias("b"),
            w_checked.alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
    )
    und = (
        e.unionByName(
            e.select(
                F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
            )
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    dist = seeds.select(
        F.col(id_col).alias("node"), F.lit(0).cast("long").alias("dist")
    ).distinct()
    changed = dist
    for _ in range(rounds):
        cand = (
            changed.join(und, changed["node"] == und["a"])
            .groupBy(F.col("b").alias("node"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        changed = (
            merged.join(
                dist.select(
                    "node", F.col("dist").alias("__old")
                ),
                "node",
                "left",
            )
            .filter(
                F.col("__old").isNull() | (F.col("dist") < F.col("__old"))
            )
            .select("node", "dist")
            .localCheckpoint(eager=False)
        )
        dist = merged.localCheckpoint(eager=False)
    return dist


def louvain_step(
    edges: DataFrame,
    communities: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """One deterministic SYNCHRONOUS pass of the Louvain local-moving
    heuristic (Blondel et al. 2008): every node evaluates moving into
    each neighboring community and takes the modularity-gain argmax,
    all from the SAME input assignment (no sequential sweep — a
    sequential visit order is inherently single-threaded and
    engine-specific; the synchronous variant is the one a distributed
    engine can honestly run, and one pass from singletons is the
    classic first sweep). ``communities=None`` starts from singletons
    (each node its own community).

    The gain comparison is EXACT: moving i into C changes Q by
    ``(k_{i,C} − k_i·Σ_C / 2m) / m`` (γ=1), so candidates are ranked by
    the cross-multiplied integer score ``2m·k_{i,C} − k_i·Σ_C`` in
    DECIMAL(38,0) (quadratic in degree sums — the modularity/exactmath
    discipline), with Σ_C excluding i's own degree when C is i's
    current community, and ties broken by smallest community label.
    Staying put scores ``2m·k_{i,own} − k_i·Σ_own\\{i}`` under the same
    formula, so "no improving move" falls out of the argmax instead of
    being a special case. Everything is integer → bit-reproducible →
    the whole pass replays as one SQL statement under the gate.

    Shape: canonical undirected edge set, node degrees, per-community
    degree sums (community-bounded), one edge-sized exchange for
    ``k_{i,C}`` (groupBy node+neighbor community), a node-partitioned
    window argmax. No step is quadratic in the graph.

    Output (scalar-only): ``(node, old_label, new_label, moved
    boolean)`` — feed ``new_label`` back in for the next pass, stop
    when no row moves (or after a fixed pass budget, the
    fixed-iteration discipline).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    m1 = e.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    bt = e.select(
        F.col("a").alias("i"), F.col("b").alias("j")
    ).unionByName(e.select(F.col("b").alias("i"), F.col("a").alias("j")))
    deg = bt.groupBy(F.col("i").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("__k")
    )
    if communities is None:
        # Singleton-init specialization (the classic first sweep): with
        # label(x) = x every community join is an IDENTITY, so the
        # generic path below would shuffle the edge-sized k_{i,C} table
        # through a join + two groupBys only to map j → j. Directly:
        # k_{i,C=j} is exactly 1 because ``bt`` carries each undirected
        # edge once per orientation (distinct canonical pairs), Σ_C for
        # C = {j} is j's degree, and i's own community is {i} with
        # Σ_own\{i} = 0 — so the stay-put candidate scores EXACTLY 0
        # and needs no union row at all: score each oriented edge, take
        # the per-node max with the same (score desc, label asc)
        # comparator as a struct max (map-side partial aggregation, no
        # edge-sized window sort), and compare the winner against the
        # (0, i) own candidate in a final projection. Same score
        # expression over the same exact integers → bit-identical
        # argmax. (In fact the own candidate can never win from
        # singletons — all k_i·k_j ≥ 2m over i's k_i neighbors would
        # force Σ_{j∈N(i)} k_j ≥ 2m > 2m − k_i, a contradiction — but
        # the comparison is kept so the tiebreak semantics are the
        # generic path's, not a proof's.)
        from salesforce_plugin_spark.functions.exactmath import dcast

        # Argmax without a window OR a struct-max (struct aggregates
        # fall back to SortAggregate — measured slower than the window):
        # for fixed i the score 2m·1 − k_i·k_j is STRICTLY decreasing
        # in k_j, so (score desc, c asc) ≡ (k_j asc, j asc), which
        # packs into ONE hash-aggregatable DECIMAL(38,0) key
        # k_j·2^64 + (j + 2^63). min(pk) and min(k_j) agree on the
        # winner (k_j is pk's leading field), so the label unpacks by
        # exact decimal subtraction — no decimal division, no rounding.
        # Bounds: k_j ≤ |E| and the product k_j·2^64 stays inside
        # DECIMAL(38,0) for any graph with < 5.4e18 edges.
        shift = "CAST(18446744073709551616 AS DECIMAL(38,0))"  # 2^64
        off = "CAST(9223372036854775808 AS DECIMAL(20,0))"  # 2^63
        packed = bt.join(
            deg.select(F.col("node").alias("j"), F.col("__k").alias("__kj")),
            "j",
        ).select(
            "i",
            F.expr(
                "CAST(__kj AS DECIMAL(38,0)) * " + shift
                + " + (CAST(j AS DECIMAL(20,0)) + " + off + ")"
            ).alias("__pk"),
            "__kj",
        )
        best = (
            packed.groupBy("i")
            .agg(
                F.min("__pk").alias("__pk"),
                F.min("__kj").alias("__sig_adj"),
            )
            .join(deg.select(F.col("node").alias("i"), "__k"), "i")
            .crossJoin(F.broadcast(m1))
            .withColumn("__kic", F.lit(1).cast("long"))
            .withColumn(
                "__score",
                F.expr(
                    "2 * " + dcast("__m") + " * " + dcast("__kic")
                    + " - " + dcast("__k") + " * " + dcast("__sig_adj")
                ),
            )
            .withColumn(
                "__c",
                F.expr(
                    "CAST(__pk - CAST(__sig_adj AS DECIMAL(38,0)) * "
                    + shift + " - " + off + " AS BIGINT)"
                ),
            )
        )
        zero = F.lit(0).cast("decimal(38,0)")
        take = (F.col("__score") > zero) | (
            (F.col("__score") == zero) & (F.col("__c") < F.col("i"))
        )
        return best.select(
            F.col("i").alias("node"),
            F.col("i").alias("old_label"),
            F.when(take, F.col("__c")).otherwise(F.col("i")).alias(
                "new_label"
            ),
            # neighbors are never self (a != b), so taking one IS a move
            take.alias("moved"),
        )
    else:
        comm = communities.select(
            F.col(id_col).alias("node"), F.col(label_col).alias("label")
        )
        sig = (
            comm.join(deg, "node", "left")
            .groupBy("label")
            .agg(
                F.coalesce(F.sum("__k"), F.lit(0)).cast("long").alias("__sig")
            )
        )
        # k_{i,C}: edges from i into each neighboring community C
        k_ic = (
            bt.join(
                comm.select(
                    F.col("node").alias("j"), F.col("label").alias("c")
                ),
                "j",
            )
            .groupBy("i", "c")
            .agg(F.count(F.lit(1)).cast("long").alias("__kic"))
        )
        own = comm.select(
            F.col("node").alias("i"),
            F.col("label").alias("c"),
            F.lit(0).cast("long").alias("__kic"),
        )
        cands = (
            k_ic.unionByName(own)
            .groupBy("i", "c")
            .agg(F.max("__kic").alias("__kic"))
        )
        scored = cands.join(
            comm.select(
                F.col("node").alias("i"), F.col("label").alias("__own")
            ),
            "i",
        )
    from salesforce_plugin_spark.functions.exactmath import dcast

    scored = (
        scored
        .join(F.broadcast(sig.withColumnRenamed("label", "c")), "c")
        # left + coalesce 0: a user-supplied assignment may contain
        # edge-less nodes — they must surface (staying put, score 0),
        # not silently vanish through an inner degree join
        .join(deg.select(F.col("node").alias("i"), "__k"), "i", "left")
        .withColumn("__k", F.coalesce(F.col("__k"), F.lit(0).cast("long")))
        .crossJoin(F.broadcast(m1))
        .withColumn(
            "__sig_adj",
            F.when(
                F.col("c") == F.col("__own"), F.col("__sig") - F.col("__k")
            ).otherwise(F.col("__sig")),
        )
        .withColumn(
            "__score",
            F.expr(
                "2 * " + dcast("__m") + " * " + dcast("__kic")
                + " - " + dcast("__k") + " * " + dcast("__sig_adj")
            ),
        )
    )
    w = Window.partitionBy("i").orderBy(
        F.col("__score").desc(), F.col("c").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("i").alias("node"),
            F.col("__own").alias("old_label"),
            F.col("c").alias("new_label"),
            (F.col("c") != F.col("__own")).alias("moved"),
        )
    )
