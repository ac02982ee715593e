"""Graph suite over the events edge list: pagerank/HITS/k-core/k-hop/label propagation/modularity/triangles.

Split from the single-file conformance registry in round 6; byte-identical
query builders and oracle SQL. The ordered public registry lives in
``salesforce_plugin_spark.conformance`` (the package __init__).
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import *  # noqa: F401,F403


def q_pagerank(spark, sf_dir):
    """Iterative graph analytics under the gate (functions/graph.py):
    3-iteration exact-integer PageRank over the supplier↔part
    co-occurrence graph from lineitem (2.1k nodes, ~52k distinct edges
    at sf0.01; suppliers namespaced +10^6). Scaled-BIGINT ranks +
    integer floor divides make every iteration bit-reproducible — float
    PageRank compounds last-ulp aggregation-order drift per iteration
    and could never hash-match. The whole run is ONE lazy plan: per
    iteration an edge-src join, a partial-combined inflow sum on dst,
    and a node-sized left join; the oracle chains three identical
    CTEs."""
    from salesforce_plugin_spark.functions.graph import pagerank_fixed

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    return pagerank_fixed(edges, iterations=3)


def q_triangles(spark, sf_dir):
    """Graph analytics (functions/graph.py triangle_counts): per-node
    triangle counts over the support-≥2 co-purchase graph — composing
    q_copurchase's edge builder with the ordered two-join triangle
    enumeration (a<b ⋈ b<c ⋈ a<c; each triangle found exactly once, no
    cartesian; wedge-bounded). The docstring's degree-orientation note
    is the heavy-tail refinement at real scale. 61 triangles / their
    corner nodes at sf0.01."""
    from salesforce_plugin_spark.functions.graph import triangle_counts
    from salesforce_plugin_spark.operators.analytics import copurchase_pairs

    li = load_table(spark, sf_dir, "lineitem")
    edges = copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)
    return triangle_counts(
        edges.select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    )


def q_power_step(spark, sf_dir):
    """Distributed linear algebra under the gate (functions/vector.py
    gram_power_step): one power-iteration step g = Xᵀ(Xv₀) against the
    corpus Gram matrix — the PCA/spectral primitive — with vectors and
    v₀ quantized to scaled longs (the kmeans_assign round-half-away
    idiom) so every product and BIGINT sum is exact and the step is
    bit-reproducible cross-engine (deterministic eigensolver
    checkpoint/resume at scale). One corpus scan: a codegen array-fold
    for s_i = ⟨x_i, v₀⟩, then ONE dims-bounded partial-combined
    exchange. v₀ = the vec_id-0 embedding, broadcast."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    v0 = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("v0"))
    return V.gram_power_step(e, "vec_id", "embedding", v0, quant=1000)


def q_power_converged(spark, sf_dir):
    """Chained power iterations (functions/vector.py
    gram_power_iterations): two g = Xᵀ(Xv) steps with an INTEGER
    renormalization between them — sign-safe floor division
    sign(g)·(|g|·quant div max|g|), both operands non-negative so
    truncating (Spark div) and flooring (DuckDB //) engines agree —
    proving the eigensolver trajectory is bit-reproducible across an
    iteration boundary (checkpoint/resume determinism for a distributed
    PCA), complementing single-step q_power_step exactly as
    q_kmeans_converged complements q_kmeans_assign. Per step: one corpus
    scan + one dims-bounded exchange; the renormalized vector is rebuilt
    via a dims-bounded collect_list, never a driver round-trip."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    v0 = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("v0"))
    return V.gram_power_iterations(
        e, "vec_id", "embedding", v0, iterations=2, quant=1000
    )


def q_pca_project(spark, sf_dir):
    """Spectral curation signal (functions/vector.py pca_project): every
    embedding's component along the power-iteration principal direction
    plus its off-axis residual in the cross-multiplied Cauchy-Schwarz
    form |x|²|p|² − ⟨x,p⟩² — exact integers, no division/sqrt at any
    boundary. Completes the eigensolver family: q_power_step (one
    step) → q_power_converged (chained) → this (the USE of the
    eigenvector). Oracle extends the converged replay with the second
    renormalization and the projection scan."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    v0 = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("v0"))
    return V.pca_project(
        e, "vec_id", "embedding", v0, iterations=2, quant=1000
    )


def q_neighbor_agg(spark, sf_dir):
    """GNN-preprocessing primitive (functions/graph.py neighbor_agg):
    2-hop neighborhood count + exact-integer feature sums over the
    supplier-part co-occurrence graph (q_pagerank's edges), feature =
    part size (suppliers carry 0) — the A·(A·f) walk-counted
    message-passing shape, each hop one edge join + one
    partial-combined sum. Isolated-node zeros preserved by the
    node-sized left join."""
    from salesforce_plugin_spark.functions.graph import neighbor_agg

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    feats = nodes.join(
        p.select(F.col("p_partkey").alias("id"), F.col("p_size")),
        "id",
        "left",
    ).select("id", F.coalesce(F.col("p_size"), F.lit(0)).alias("f"))
    return neighbor_agg(edges, feats, hops=2)


def q_label_prop(spark, sf_dir):
    """Community detection under the gate (functions/graph.py
    label_propagation_fixed): 2 rounds of majority-label propagation
    with the deterministic (count desc, label asc) election over the
    supplier-part co-occurrence graph (q_pagerank's edges), seeded with
    id % 5 — textbook LPA is random-order and could never hash-gate;
    the total election order makes every round bit-reproducible, the
    same discipline as q_pagerank/q_kmeans_converged. The oracle chains
    two identical vote/elect CTE rounds."""
    from salesforce_plugin_spark.functions.graph import label_propagation_fixed

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = nodes.select("id", (F.col("id") % 5).alias("label"))
    return label_propagation_fixed(edges, labels, iterations=2)


def q_degree_dist(spark, sf_dir):
    """Graph profiling (functions/graph.py degree_distribution): the
    degree histogram of the supplier-part co-occurrence graph — the
    first query run on any edge list, whose heavy tail motivates
    degree-orientation (q_triangles) and skew handling. Two bounded
    partial-combined aggregates; nothing exceeds node cardinality."""
    from salesforce_plugin_spark.functions.graph import degree_distribution

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    return degree_distribution(edges)


def q_kcore(spark, sf_dir):
    """Dense-substructure extraction (functions/graph.py kcore_fixed):
    3 fixed peeling rounds at k=33 over the supplier-part graph reach
    the (verified) fixpoint — 232 survivors at sf0.01. Peeling is
    deterministic (pure function of the edge set), so the unrolled
    rounds replay as chained CTEs — the pagerank/kmeans iterative-
    determinism discipline; unit tests pin a cascading peel on a path
    graph where one round is provably not enough."""
    from salesforce_plugin_spark.functions.graph import kcore_fixed

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    return kcore_fixed(edges, k=33, rounds=3)


def q_khop(spark, sf_dir):
    """Blast-radius query (functions/graph.py khop_reachability): every
    node within 3 hops of the 5 lowest part ids on the supplier-part
    graph, labeled with exact hop distance — fixed-round BFS (set
    algebra only, deterministic), per-round lineage cuts (the
    kcore_fixed plan-growth lesson), chained-CTE oracle."""
    from salesforce_plugin_spark.functions.graph import khop_reachability

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    seeds = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 5)
        .select(F.col("p_partkey").alias("id"))
    )
    return khop_reachability(edges, seeds, k=3)


def q_hits(spark, sf_dir):
    """Bipartite importance (functions/graph.py hits_fixed):
    2-iteration exact-integer HITS over the directed supplier→part
    graph — hub and authority scores with the gram_power integer
    renormalization (x·10⁶ div max, non-negative so truncate == floor
    cross-engine) instead of the engine-ambiguous L2 norm; every round
    bit-reproducible, oracle = chained CTEs."""
    from salesforce_plugin_spark.functions.graph import hits_fixed

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    return hits_fixed(edges, iterations=2)


def q_wpagerank(spark, sf_dir):
    """Weighted PageRank (functions/graph.py pagerank_fixed with
    weight_col): mass splits proportionally to edge weights (lineitem
    quantity sums per supplier-part edge) — contribution r·w div W(u)
    in exact DECIMAL(38,0) (r·w wraps BIGINT long before corpus-scale
    weights). 2 iterations; the unweighted entry (q_pagerank) is
    untouched."""
    from salesforce_plugin_spark.functions.graph import pagerank_fixed

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.groupBy(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    return pagerank_fixed(edges, iterations=2, weight_col="w")


def q_sssp(spark, sf_dir):
    """Weighted shortest paths (functions/graph.py sssp_fixed): exact
    BIGINT Bellman-Ford distances from the 5 lowest part ids over the
    quantity-weighted supplier-part graph, 3 relaxation rounds with the
    delta-frontier optimization — the khop blast-radius query upgraded
    to COST (cheapest supply path, not fewest hops). Deterministic
    (integer min-plus algebra only), so the unrolled rounds replay as
    chained CTEs."""
    from salesforce_plugin_spark.functions.graph import sssp_fixed

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.groupBy(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    seeds = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 5)
        .select(F.col("p_partkey").alias("id"))
    )
    return sssp_fixed(edges, seeds, rounds=3)


def q_louvain_step(spark, sf_dir):
    """Community detection, first Louvain sweep (functions/graph.py
    louvain_step): every node takes the exact-integer modularity-gain
    argmax over its neighboring communities from singleton init — the
    synchronous deterministic variant a distributed engine can honestly
    run (a sequential visit order is single-threaded and
    engine-specific). Cross-multiplied DECIMAL(38,0) scores, smallest-
    label tiebreaks; the whole pass replays as one SQL window argmax.
    Companion to q_modularity (which evaluates what this optimizes) and
    q_label_prop (the degree-blind alternative)."""
    from salesforce_plugin_spark.functions.graph import louvain_step

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    return louvain_step(edges)


def q_component_sizes(spark, sf_dir):
    """Near-dup profiling (functions/dedup.py component_size_histogram):
    the size distribution of the LSH candidate-graph components — the
    companion of q_dup_size_dist (exact clusters): near-clique pairs vs
    sprawling chains decides propagation vs star and predicts removal
    mass (n_docs − n_components per size). Composes the identical
    q_dedup_components pipeline; the oracle extends its recursive
    closure with the histogram."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    banded = D.portable_bands(
        D.minhash_signatures_portable(d, "doc_id", "text", 8, 3),
        "doc_id", 8, 4,
    )
    a, b = banded.alias("a"), banded.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    comp = D.connected_components(
        d.select("doc_id"), edges, id_col="doc_id"
    )
    return D.component_size_histogram(comp, "component_id")


def q_assortativity(spark, sf_dir):
    """Graph mixing profile (functions/graph.py degree_assortativity):
    mean neighbor degree per degree class (k_nn(k)) over the
    supplier-part graph — hubs-to-hubs vs hubs-to-leaves, the shape
    that decides how skew handling generalizes. Exact integer
    knn_x1000 via the exactmath decimal identity; one degree-bounded
    final aggregate."""
    from salesforce_plugin_spark.functions.graph import degree_assortativity

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    return degree_assortativity(edges)


def q_modularity(spark, sf_dir):
    """Community-quality evaluation (functions/graph.py modularity):
    Newman modularity of the q_label_prop communities decomposed into
    exact per-community integers (q_num = 4·m·e_in − d_c², shared
    denominator 4m² carried alongside) — the evaluation pairing for
    community detection; quadratics in DECIMAL(38,0). The oracle
    chains the label-propagation CTEs into the modularity
    aggregation."""
    from salesforce_plugin_spark.functions.graph import (
        label_propagation_fixed,
        modularity,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    labels = nodes.select("id", (F.col("id") % 5).alias("label"))
    comm = label_propagation_fixed(edges, labels, iterations=2)
    return modularity(edges, comm)



ORACLES: dict[str, str] = {}

ORACLES["q_pagerank"] = """
    WITH edges AS (
        SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst
        FROM lineitem
    ), sym AS (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst, src FROM edges
    ), nodes AS (
        SELECT DISTINCT src AS id FROM sym
    ), deg AS (
        SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY 1
    ), params AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
    ), r0 AS (
        SELECT id, 1000000000000 // p.n AS r FROM nodes, params p
    ), i1 AS (
        SELECT n.id,
               (15 * (1000000000000 // p.n)) // 100
               + CAST((85 * coalesce(inflow.s, 0)) // 100 AS BIGINT) AS r
        FROM nodes n
        CROSS JOIN params p
        LEFT JOIN (
            SELECT s.dst AS id, sum(r.r // d.deg) AS s
            FROM sym s
            JOIN r0 r ON r.id = s.src
            JOIN deg d ON d.id = s.src
            GROUP BY s.dst
        ) inflow ON inflow.id = n.id
    ), i2 AS (
        SELECT n.id,
               (15 * (1000000000000 // p.n)) // 100
               + CAST((85 * coalesce(inflow.s, 0)) // 100 AS BIGINT) AS r
        FROM nodes n
        CROSS JOIN params p
        LEFT JOIN (
            SELECT s.dst AS id, sum(r.r // d.deg) AS s
            FROM sym s
            JOIN i1 r ON r.id = s.src
            JOIN deg d ON d.id = s.src
            GROUP BY s.dst
        ) inflow ON inflow.id = n.id
    ), i3 AS (
        SELECT n.id,
               (15 * (1000000000000 // p.n)) // 100
               + CAST((85 * coalesce(inflow.s, 0)) // 100 AS BIGINT) AS r
        FROM nodes n
        CROSS JOIN params p
        LEFT JOIN (
            SELECT s.dst AS id, sum(r.r // d.deg) AS s
            FROM sym s
            JOIN i2 r ON r.id = s.src
            JOIN deg d ON d.id = s.src
            GROUP BY s.dst
        ) inflow ON inflow.id = n.id
    )
    SELECT id,
           CAST(r AS BIGINT) AS rank_scaled,
           CAST(CAST(r AS BIGINT) AS DOUBLE) / 1000000000000.0 AS rank
    FROM i3
"""

# Ordered two-join triangle enumeration over the support->=2 graph.
ORACLES["q_triangles"] = """
    WITH b AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ), p AS (
        SELECT a.it AS ia, c.it AS ib
        FROM b a JOIN b c USING (bk)
        WHERE a.it < c.it
    ), e AS (
        SELECT ia AS a, ib AS b FROM p GROUP BY 1, 2 HAVING count(*) >= 2
    ), tri AS (
        SELECT ab.a, ab.b, bc.b AS c
        FROM e ab
        JOIN e bc ON bc.a = ab.b
        JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
    ), corners AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
"""

# Gram power step: same scaled-long quantization, exact integer sums.
ORACLES["q_power_step"] = """
    WITH v0 AS (
        SELECT list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                        AS BIGINT)) AS v
        FROM embeddings WHERE vec_id = 0
    ), xq AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                        AS BIGINT)) AS x
        FROM embeddings
    ), ex AS (
        SELECT vec_id, x, unnest(generate_series(1, len(x))) AS i FROM xq
    ), prod AS (
        SELECT e.vec_id, CAST(e.i AS INT) AS dim, e.x[e.i] AS xd,
               e.x[e.i] * v0.v[e.i] AS pv
        FROM ex e, v0
    ), sv AS (
        SELECT vec_id, sum(pv) AS si FROM prod GROUP BY vec_id
    ), terms AS (
        SELECT p.dim, p.xd * sv.si AS t
        FROM prod p JOIN sv USING (vec_id)
    )
    SELECT dim, CAST(sum(t) AS BIGINT) AS gv
    FROM terms GROUP BY dim
"""

# Two chained Gram power steps; the between-step renormalization is a
# sign-safe floor division so truncate-div and floor-div engines agree.
ORACLES["q_power_converged"] = """
    WITH v0 AS (
        SELECT list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                        AS BIGINT)) AS v
        FROM embeddings WHERE vec_id = 0
    ), xq AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                        AS BIGINT)) AS x
        FROM embeddings
    ), ex AS (
        SELECT vec_id, x, unnest(generate_series(1, len(x))) AS i FROM xq
    ), prod1 AS (
        SELECT e.vec_id, CAST(e.i AS INT) AS dim, e.x[e.i] AS xd,
               e.x[e.i] * v0.v[e.i] AS pv
        FROM ex e, v0
    ), s1 AS (
        SELECT vec_id, sum(pv) AS si FROM prod1 GROUP BY vec_id
    ), g1 AS (
        SELECT p.dim, sum(p.xd * s1.si) AS gv
        FROM prod1 p JOIN s1 USING (vec_id) GROUP BY p.dim
    ), gmax AS (
        SELECT max(abs(gv)) AS m FROM g1
    ), v1 AS (
        SELECT dim,
               CAST((CASE WHEN gv < 0 THEN -1 ELSE 1 END)
                    * ((abs(gv) * 1000) // m) AS BIGINT) AS vq
        FROM g1, gmax
    ), prod2 AS (
        SELECT e.vec_id, CAST(e.i AS INT) AS dim, e.x[e.i] AS xd,
               e.x[e.i] * v1.vq AS pv
        FROM ex e JOIN v1 ON v1.dim = e.i
    ), s2 AS (
        SELECT vec_id, sum(pv) AS si FROM prod2 GROUP BY vec_id
    ), g2 AS (
        SELECT p.dim, CAST(sum(p.xd * s2.si) AS BIGINT) AS gv
        FROM prod2 p JOIN s2 USING (vec_id) GROUP BY p.dim
    )
    SELECT g2.dim, v1.vq, g2.gv FROM g2 JOIN v1 USING (dim)
"""

# Power-converged replay + second renormalization + projection scan;
# residual kept as the cross-multiplied Cauchy-Schwarz numerator.
ORACLES["q_pca_project"] = """
    WITH v0 AS (
        SELECT list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                        AS BIGINT)) AS v
        FROM embeddings WHERE vec_id = 0
    ), xq AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                        AS BIGINT)) AS x
        FROM embeddings
    ), ex AS (
        SELECT vec_id, x, unnest(generate_series(1, len(x))) AS i FROM xq
    ), prod1 AS (
        SELECT e.vec_id, CAST(e.i AS INT) AS dim, e.x[e.i] AS xd,
               e.x[e.i] * v0.v[e.i] AS pv
        FROM ex e, v0
    ), s1 AS (
        SELECT vec_id, sum(pv) AS si FROM prod1 GROUP BY vec_id
    ), g1 AS (
        SELECT p.dim, sum(p.xd * s1.si) AS gv
        FROM prod1 p JOIN s1 USING (vec_id) GROUP BY p.dim
    ), gmax AS (
        SELECT max(abs(gv)) AS m FROM g1
    ), v1 AS (
        SELECT dim,
               CAST((CASE WHEN gv < 0 THEN -1 ELSE 1 END)
                    * ((abs(gv) * 1000) // m) AS BIGINT) AS vq
        FROM g1, gmax
    ), prod2 AS (
        SELECT e.vec_id, CAST(e.i AS INT) AS dim, e.x[e.i] AS xd,
               e.x[e.i] * v1.vq AS pv
        FROM ex e JOIN v1 ON v1.dim = e.i
    ), s2 AS (
        SELECT vec_id, sum(pv) AS si FROM prod2 GROUP BY vec_id
    ), g2 AS (
        SELECT p.dim, CAST(sum(p.xd * s2.si) AS BIGINT) AS gv
        FROM prod2 p JOIN s2 USING (vec_id) GROUP BY p.dim
    ), g2max AS (
        SELECT max(abs(gv)) AS m FROM g2
    ), pvec AS (
        SELECT dim,
               CAST((CASE WHEN gv < 0 THEN -1 ELSE 1 END)
                    * ((abs(gv) * 1000) // m) AS BIGINT) AS pq
        FROM g2, g2max
    ), prod3 AS (
        SELECT e.vec_id, e.x[e.i] AS xd, pvec.pq
        FROM ex e JOIN pvec ON pvec.dim = e.i
    ), per AS (
        SELECT vec_id,
               CAST(sum(xd * pq) AS BIGINT) AS dot,
               sum(CAST(xd AS HUGEINT) * xd) AS x2,
               sum(CAST(pq AS HUGEINT) * pq) AS p2
        FROM prod3 GROUP BY 1
    )
    SELECT vec_id, dot AS proj,
           CAST(x2 * p2 - CAST(dot AS HUGEINT) * dot AS BIGINT) AS res_num
    FROM per
"""

ORACLES["q_label_prop"] = """
    WITH re AS (
        SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst
        FROM lineitem
    ), e AS (
        SELECT src, dst FROM re UNION SELECT dst, src FROM re
    ), l0 AS (
        SELECT DISTINCT src AS id, src % 5 AS lab FROM e
    ), v1 AS (
        SELECT e.dst AS id, l.lab, count(*) AS c
        FROM e JOIN l0 l ON e.src = l.id GROUP BY 1, 2
    ), w1 AS (
        SELECT id, lab FROM (
            SELECT id, lab, row_number() OVER (
                PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
            FROM v1
        ) WHERE rn = 1
    ), l1 AS (
        SELECT l0.id, COALESCE(w1.lab, l0.lab) AS lab
        FROM l0 LEFT JOIN w1 ON l0.id = w1.id
    ), v2 AS (
        SELECT e.dst AS id, l.lab, count(*) AS c
        FROM e JOIN l1 l ON e.src = l.id GROUP BY 1, 2
    ), w2 AS (
        SELECT id, lab FROM (
            SELECT id, lab, row_number() OVER (
                PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
            FROM v2
        ) WHERE rn = 1
    )
    SELECT l1.id, COALESCE(w2.lab, l1.lab) AS label
    FROM l1 LEFT JOIN w2 ON l1.id = w2.id
"""

ORACLES["q_neighbor_agg"] = """
    WITH re AS (
        SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst
        FROM lineitem
    ), e AS (
        SELECT src, dst FROM re UNION SELECT dst, src FROM re
    ), nodes AS (
        SELECT DISTINCT src AS id FROM e
    ), feats AS (
        SELECT n.id,
               CAST(COALESCE(p.p_size, 0) AS BIGINT) AS f
        FROM nodes n LEFT JOIN part p ON n.id = p.p_partkey
    ), h1a AS (
        SELECT e.dst AS id, count(*) AS n_neighbors, sum(fe.f) AS f_sum
        FROM e JOIN feats fe ON e.src = fe.id GROUP BY 1
    ), h1 AS (
        SELECT n.id,
               CAST(COALESCE(h.n_neighbors, 0) AS BIGINT) AS n_neighbors,
               CAST(COALESCE(h.f_sum, 0) AS BIGINT) AS f_sum
        FROM nodes n LEFT JOIN h1a h ON n.id = h.id
    ), h2a AS (
        SELECT e.dst AS id, count(*) AS n_2hop, sum(h1.f_sum) AS f_sum_2hop
        FROM e JOIN h1 ON e.src = h1.id GROUP BY 1
    ), h2 AS (
        SELECT n.id,
               CAST(COALESCE(h.n_2hop, 0) AS BIGINT) AS n_2hop,
               CAST(COALESCE(h.f_sum_2hop, 0) AS BIGINT) AS f_sum_2hop
        FROM nodes n LEFT JOIN h2a h ON n.id = h.id
    )
    SELECT h1.id, h1.n_neighbors, h1.f_sum, h2.n_2hop, h2.f_sum_2hop
    FROM h1 JOIN h2 ON h1.id = h2.id
"""

ORACLES["q_degree_dist"] = """
    WITH e AS (
        SELECT DISTINCT least(l_partkey, l_suppkey + 1000000) AS a,
               greatest(l_partkey, l_suppkey + 1000000) AS b
        FROM lineitem
        WHERE l_partkey <> l_suppkey + 1000000
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY 1
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1
"""

ORACLES["q_kcore"] = _kcore_oracle()

ORACLES["q_khop"] = _khop_oracle()

ORACLES["q_hits"] = _hits_oracle()

ORACLES["q_wpagerank"] = _wpagerank_oracle()

ORACLES["q_louvain_step"] = """
    WITH ed AS (
        SELECT DISTINCT least(l_suppkey + 1000000, l_partkey) AS a,
               greatest(l_suppkey + 1000000, l_partkey) AS b
        FROM lineitem WHERE l_partkey <> l_suppkey + 1000000
    ), m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM ed),
    bt AS (SELECT a AS i, b AS j FROM ed UNION ALL SELECT b, a FROM ed),
    deg AS (
        SELECT i AS node, CAST(count(*) AS BIGINT) AS k FROM bt GROUP BY 1
    ), cand AS (
        SELECT bt.i, bt.j AS c,
               2 * m.m * 1 - CAST(di.k AS HUGEINT) * dj.k AS score
        FROM bt
        CROSS JOIN m
        JOIN deg di ON di.node = bt.i
        JOIN deg dj ON dj.node = bt.j
    ), allc AS (
        SELECT i, c, score FROM cand
        UNION ALL
        SELECT node AS i, node AS c, CAST(0 AS HUGEINT) AS score FROM deg
    ), best AS (
        SELECT i, c FROM (
            SELECT i, c, row_number() OVER (
                PARTITION BY i ORDER BY score DESC, c ASC) AS rn
            FROM allc) WHERE rn = 1
    )
    SELECT i AS node, CAST(i AS BIGINT) AS old_label,
           CAST(c AS BIGINT) AS new_label, c <> i AS moved
    FROM best
"""

ORACLES["q_sssp"] = _sssp_oracle()

ORACLES["q_assortativity"] = """
    WITH e AS (
        SELECT DISTINCT least(l_partkey, l_suppkey + 1000000) AS a,
               greatest(l_partkey, l_suppkey + 1000000) AS b
        FROM lineitem WHERE l_partkey <> l_suppkey + 1000000
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY 1
    ), bt AS (
        SELECT a, b FROM e UNION ALL SELECT b, a FROM e
    ), j AS (
        SELECT da.deg AS degree, bt.a AS node, db.deg AS nd
        FROM bt
        JOIN deg da ON da.node = bt.a
        JOIN deg db ON db.node = bt.b
    )
    SELECT degree, CAST(count(DISTINCT node) AS BIGINT) AS n_nodes,
           CAST((CAST(sum(nd) AS HUGEINT) * 1000)
                // (CAST(degree AS HUGEINT) * count(DISTINCT node))
               AS BIGINT) AS knn_x1000
    FROM j GROUP BY degree
"""

ORACLES["q_modularity"] = """
    WITH re AS (
        SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst
        FROM lineitem
    ), e AS (
        SELECT src, dst FROM re UNION SELECT dst, src FROM re
    ), l0 AS (
        SELECT DISTINCT src AS id, src % 5 AS lab FROM e
    ), v1 AS (
        SELECT e.dst AS id, l.lab, count(*) AS c
        FROM e JOIN l0 l ON e.src = l.id GROUP BY 1, 2
    ), w1 AS (
        SELECT id, lab FROM (
            SELECT id, lab, row_number() OVER (
                PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
            FROM v1
        ) WHERE rn = 1
    ), l1 AS (
        SELECT l0.id, COALESCE(w1.lab, l0.lab) AS lab
        FROM l0 LEFT JOIN w1 ON l0.id = w1.id
    ), v2 AS (
        SELECT e.dst AS id, l.lab, count(*) AS c
        FROM e JOIN l1 l ON e.src = l.id GROUP BY 1, 2
    ), w2 AS (
        SELECT id, lab FROM (
            SELECT id, lab, row_number() OVER (
                PARTITION BY id ORDER BY c DESC, lab ASC) AS rn
            FROM v2
        ) WHERE rn = 1
    ), comm AS (
        SELECT l1.id AS node, COALESCE(w2.lab, l1.lab) AS label
        FROM l1 LEFT JOIN w2 ON l1.id = w2.id
    ), ce AS (
        SELECT DISTINCT least(l_partkey, l_suppkey + 1000000) AS a,
               greatest(l_partkey, l_suppkey + 1000000) AS b
        FROM lineitem WHERE l_partkey <> l_suppkey + 1000000
    ), mm AS (
        SELECT CAST(count(*) AS BIGINT) AS m FROM ce
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
        GROUP BY 1
    ), per AS (
        SELECT c.label, CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(COALESCE(sum(d.deg), 0) AS BIGINT) AS degree_sum
        FROM comm c LEFT JOIN deg d ON d.node = c.node
        GROUP BY 1
    ), ein AS (
        SELECT la.label, CAST(count(*) AS BIGINT) AS e_in
        FROM ce
        JOIN comm la ON la.node = ce.a
        JOIN comm lb ON lb.node = ce.b
        WHERE la.label = lb.label
        GROUP BY 1
    )
    SELECT per.label, per.n_nodes, per.degree_sum,
           CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in,
           mm.m,
           CAST(4 * CAST(mm.m AS HUGEINT) * COALESCE(ein.e_in, 0)
                - CAST(per.degree_sum AS HUGEINT) * per.degree_sum
               AS BIGINT) AS q_num
    FROM per LEFT JOIN ein USING (label), mm
"""



def q_ppr(spark, sf_dir):
    """Personalized PageRank (functions/graph.py ppr_fixed): teleport
    restarts at the 5 lowest-id suppliers instead of uniformly — the
    seed-set expansion / related-item primitive, 3 exact-integer
    iterations over the supplier↔part graph (q_pagerank's edges). Same
    per-iteration shape (edge⨝rank join, partial-combined inflow,
    node-sized left join); oracle chains identical CTEs with the
    seeded restart vector."""
    from salesforce_plugin_spark.functions.graph import ppr_fixed

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .select((F.col("s_suppkey") + 1000000).alias("id"))
        .orderBy("id")
        .limit(5)
    )
    return ppr_fixed(edges, seeds, iterations=3)


def _ppr_oracle(iterations: int = 3, scale: int = 10**12) -> str:
    parts = [
        "WITH de AS (\n"
        "    SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst\n"
        "    FROM lineitem),\n"
        "e AS (SELECT src, dst FROM de UNION ALL SELECT dst, src FROM de),\n"
        "nodes AS (SELECT DISTINCT src AS id FROM e\n"
        "          UNION SELECT DISTINCT dst FROM e),\n"
        "deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d\n"
        "        FROM e GROUP BY 1),\n"
        "seeds AS (SELECT s_suppkey + 1000000 AS id FROM supplier\n"
        "          ORDER BY id LIMIT 5),\n"
        "ns AS (SELECT count(*) AS n FROM seeds),\n"
        "flagged AS (SELECT n0.id,\n"
        "    CASE WHEN s.id IS NOT NULL THEN 1 ELSE 0 END AS seed\n"
        "    FROM nodes n0 LEFT JOIN seeds s ON s.id = n0.id),\n"
        f"r0 AS (SELECT id, seed,\n"
        f"    CASE WHEN seed = 1 THEN CAST({scale} // ns.n AS BIGINT)\n"
        f"         ELSE 0 END AS r\n"
        "    FROM flagged, ns)"
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS id,\n"
            f"   CAST(sum(r.r // d.d) AS BIGINT) AS infl\n"
            f"   FROM e JOIN {prev} r ON r.id = e.src\n"
            f"   JOIN deg d ON d.id = e.src GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT f.id, f.seed,\n"
            f"   CAST(CASE WHEN f.seed = 1 THEN\n"
            f"            (15 * ({scale} // ns.n)) // 100 ELSE 0 END\n"
            f"        + (85 * COALESCE(c{i}.infl, 0)) // 100 AS BIGINT)\n"
            f"            AS r\n"
            f"   FROM flagged f LEFT JOIN c{i} ON c{i}.id = f.id, ns)"
        )
        prev = f"r{i}"
    return (
        ",\n".join(parts)
        + f"\nSELECT id, r AS rank_scaled,"
        + f" CAST(r AS DOUBLE) / {float(scale)} AS rank FROM {prev}"
    )


ORACLES["q_ppr"] = _ppr_oracle()


def q_random_walk(spark, sf_dir):
    """Walk sampling for graph-embedding training (functions/graph.py
    deterministic_walks): 4-step walks from the 5 lowest part ids over
    the supplier↔part graph, each hop the neighbor minimizing
    (md5(step:cur:cand), cand) — DeepWalk's sampler with the RNG
    replaced by the md5 hash order so the sampled corpus sits under
    the cross-engine gate (the q_training_corpus split discipline
    applied to graph sampling). Per step one frontier⋈edges join +
    a per-walk min_by; cost |walks|·degree per step, never
    graph-global."""
    from salesforce_plugin_spark.functions.graph import deterministic_walks

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + 1000000).alias("src"),
        F.col("l_partkey").alias("dst"),
    )
    seeds = (
        li.select(F.col("l_partkey").alias("id"))
        .distinct()
        .orderBy("id")
        .limit(5)
    )
    return deterministic_walks(edges, seeds, steps=4)


def _walk_oracle(steps: int = 4) -> str:
    ctes = ["""
    e0 AS (
        SELECT DISTINCT l_suppkey + 1000000 AS a, l_partkey AS b
        FROM lineitem WHERE l_suppkey + 1000000 != l_partkey
    ), und AS (
        SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0
    ), seeds AS (
        SELECT DISTINCT l_partkey AS id FROM lineitem ORDER BY 1 LIMIT 5
    ), w0 AS (
        SELECT id AS walk_id, id AS node FROM seeds
    )"""]
    sel = ["SELECT walk_id, 0 AS step, node FROM w0"]
    for i in range(1, steps + 1):
        ctes.append(f"""
    w{i} AS (
        SELECT walk_id, b AS node FROM (
            SELECT w.walk_id, u.b,
                   row_number() OVER (
                       PARTITION BY w.walk_id
                       ORDER BY md5('{i}:' || CAST(w.node AS VARCHAR)
                                    || ':' || CAST(u.b AS VARCHAR)),
                                u.b) AS rn
            FROM w{i - 1} w JOIN und u ON u.a = w.node
        ) WHERE rn = 1
    )""")
        sel.append(f"SELECT walk_id, {i} AS step, node FROM w{i}")
    return (
        "\n    WITH " + ",".join(c.strip() for c in ctes)
        + "\n    SELECT walk_id, CAST(step AS INT) AS step, node FROM ("
        + " UNION ALL ".join(sel)
        + ")"
    )


ORACLES["q_random_walk"] = _walk_oracle()


def q_link_predict(spark, sf_dir):
    """Link prediction (functions/graph.py link_prediction): exact
    common-neighbor count, Jaccard ppm, and INTEGER Adamic-Adar
    (⌊log₂⌋+1 hub damping via the shared bin() bit-length idiom — no
    float ln on the gate surface, no deg-1 singularity) for every part
    pair sharing ≥ 3 orders — the recommendation-edge ranker and the
    dedup-candidate prioritizer on the q_copurchase pair space (one
    hub-key self-equijoin; degrees attach by broadcast)."""
    from salesforce_plugin_spark.functions.graph import link_prediction

    li = load_table(spark, sf_dir, "lineitem")
    return link_prediction(li, "l_orderkey", "l_partkey", min_common=3)


ORACLES["q_link_predict"] = """
    WITH b AS (
        SELECT DISTINCT l_orderkey AS hub, l_partkey AS n FROM lineitem
    ), hdeg AS (
        SELECT hub, count(*) AS hd FROM b GROUP BY 1
    ), ndeg AS (
        SELECT n, count(*) AS nd FROM b GROUP BY 1
    ), pair_hub AS (
        SELECT a.n AS node_a, c.n AS node_b, h.hd
        FROM b a JOIN b c ON a.hub = c.hub AND a.n < c.n
        JOIN hdeg h ON h.hub = a.hub
    ), scored AS (
        SELECT node_a, node_b,
               CAST(count(*) AS BIGINT) AS common,
               CAST(sum(1000 // length(bin(hd))) AS BIGINT) AS aa_milli
        FROM pair_hub GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT s.node_a, s.node_b, s.common,
           CAST((s.common * 1000000) // (da.nd + db.nd - s.common)
                AS BIGINT) AS jaccard_ppm,
           s.aa_milli
    FROM scored s
    JOIN ndeg da ON da.n = s.node_a
    JOIN ndeg db ON db.n = s.node_b
"""
