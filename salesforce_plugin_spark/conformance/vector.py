"""F3 similarity search: brute/batch/IVF top-k, k-means family, random projection, recall eval, centroid similarity.

Split from the single-file conformance registry in round 6; byte-identical
query builders and oracle SQL. The ordered public registry lives in
``salesforce_plugin_spark.conformance`` (the package __init__).
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# F3: similarity search
# ---------------------------------------------------------------------------

def q_embed_topk(spark, sf_dir):
    """F3: brute-force cosine top-k against the vec_id=0 query vector —
    one scan, broadcast query, k-row TakeOrderedAndProject."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    return V.cosine_topk(e, "vec_id", "embedding", q, k=10)


def q_embed_batch_topk(spark, sf_dir):
    """F3: batched brute-force ANN — 5 query vectors answered in one
    corpus scan (broadcast query batch, in-codegen similarities, per-query
    window top-5). Self-matches stay in (sim = 1.0, deterministic)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return V.cosine_topk_batch(e, "vec_id", "embedding", q, k=5)


def q_cosine_pairs(spark, sf_dir):
    """F2 (embedding near-dup): all pairs with cosine ≥ 0.5, ids ordered.

    At fixture scale the join is the raw a<b cross form so the oracle can
    mirror it exactly; the scale path blocks both sides on sign_bucket
    (embedding_cosine_pairs(block_col=...)) turning it into an equijoin."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return D.embedding_cosine_pairs(e, "vec_id", "embedding", threshold=0.5)


def q_jaccard_pairs(spark, sf_dir):
    """F2: exact n-gram Jaccard over pairs sharing ≥1 shingle (the verifier
    stage of a near-dedup pipeline) — integer intersection/union counts
    with one rounded double divide, mirrored shingle-for-shingle by the
    DuckDB oracle. ``prune=None`` = the exhaustive form the SQL oracle can
    express; the production default is LSH-pruned (prune="lsh"), pinned
    equal to this form on the fixture by tests/test_dedup.py."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=5, threshold=0.5, prune=None
    )


def q_embed_bucket(spark, sf_dir):
    """F3 scale path: LSH sign-bucket assignment (the partitioner for
    bucketed ANN search — deterministic, engine-portable)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        V.sign_bucket(F.col("embedding"), bits=8).cast("long").alias("bucket"),
    )


def q_kmeans_converged(spark, sf_dir):
    """F3 (clustering, multi-iteration): TWO chained Lloyd iterations —
    assign → integer-exact centroid update → REassign against the
    updated centroids — summarized per final cluster. The end-to-end
    chain is the reproducibility claim q_kmeans_step makes, actually
    exercised across an iteration boundary: because both stages quantize
    identically (assign at 1e3, centroids at 1e6 + round-6 means), the
    second assignment's integer distances — and so the whole trajectory
    — are bit-equal in any engine, the property that lets a 100 TB
    k-means checkpoint/resume deterministically mid-run. Per iteration:
    one broadcast of k (re)built centroids, one min(struct) reduce; the
    rebuild collect_list is bounded by dims per cluster."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("centroid")
    )
    a1 = V.kmeans_assign(e, seeds).select("vec_id", "cluster")
    cent1 = V.centroids_long(e.join(a1, "vec_id"), "cluster", "embedding")
    seeds2 = cent1.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "centroid"))),
            lambda s: s["centroid"],
        ).alias("centroid")
    )
    a2 = V.kmeans_assign(e, seeds2)
    return (
        a2.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("dist2").alias("sum_dist2"),
        )
        .select(F.col("cluster").cast("long").alias("cluster"), "n_vecs", "sum_dist2")
    )


def q_dimension_stats(spark, sf_dir):
    """Embedding drift profile (functions/vector.py dimension_stats):
    exact quantized per-dimension moments (n, sum, sum-of-squares,
    floor mean, n^2-scaled variance numerator) — the monitoring table
    compared across corpora/model versions to localize which dimensions
    moved. One posexplode + one dims-bounded exchange; every number is
    an exact BIGINT."""
    from salesforce_plugin_spark.functions.vector import dimension_stats

    e = load_table(spark, sf_dir, "embeddings")
    return oracle_cross_check(
        dimension_stats(e, "embedding", quant=1_000_000),
        "q_dimension_stats",
        sf_dir,
    )


def q_kmeans_margin(spark, sf_dir):
    """Clustering-confidence diagnostic (functions/vector.py
    kmeans_margin): per vector the best and second-best exact-integer
    squared distances to the 8 deterministic seeds and their margin —
    the boundary-vector detector SemDeDup-style pipelines use to pick
    re-verify candidates. Bit-agrees with q_kmeans_assign's winner;
    oracle extends the same assign CTEs with the rn = 2 row."""
    from salesforce_plugin_spark.functions.vector import kmeans_margin

    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    return kmeans_margin(e, seeds)


def q_gram_matrix(spark, sf_dir):
    """Distributed Gram + covariance matrix (functions/vector.py
    gram_matrix, method='arrow'): the whitening/PCA primitive as the
    upper-triangle (i, j, n, s, cov_num) long form, every product and
    sum an exact BIGINT over JVM-quantized components — the Arrow
    partial-Gram path (numpy Qᵀ·Q per batch, d(d+1)/2 rows out per
    batch regardless of batch size) proven against the oracle's
    unnest² replay; integer associativity makes it bit-identical to
    the pure-JVM explode form (unit-pinned)."""
    from salesforce_plugin_spark.functions.vector import gram_matrix

    e = load_table(spark, sf_dir, "embeddings")
    return gram_matrix(e, "embedding", quant=1000, method="arrow")


def q_centroid_sim(spark, sf_dir):
    """Class-confusability matrix (functions/vector.py
    centroid_similarity): pairwise cosine between per-label centroid
    SUM vectors (the mean's n cancels in cosine, so exact-BIGINT sums
    of JVM-quantized components stand in directly); dot/norms exact
    integers, and the cosine surfaces as EXACT integer ppm via a
    corrected integer square root (round-6: the last float left the
    gate surface). Everything past one (label, dim) exchange is
    bounded by labels² × dims."""
    from salesforce_plugin_spark.functions.vector import centroid_similarity

    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return centroid_similarity(e, "label", "embedding", scale=10_000)


def q_rand_proj(spark, sf_dir):
    """Dimensionality reduction (functions/vector.py random_projection):
    Johnson–Lindenstrauss ±1 signed projection 64 → 8 dims with the
    sign matrix a pure function of (seed, j, d) (md5 parity — no RNG
    state, resume/reshard-identical) and components quantized to scaled
    longs JVM-side, so every output component is an exact BIGINT. Pure
    codegen zip_with/aggregate folds — no shuffle, no join; the oracle
    embeds the same generated sign matrix as a VALUES table."""
    from salesforce_plugin_spark.functions.vector import random_projection

    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return random_projection(
        e, "vec_id", "embedding", n_components=8, dims=64, quant=1000
    )


def q_ann_recall(spark, sf_dir):
    """ANN quality evaluation (functions/vector.py ann_recall):
    recall@10 and reciprocal rank of the deterministic IVF search
    (8-seed codebook, nprobe=3) against exact brute force for a
    10-query batch — the measurement that picks nprobe/nlist before an
    index ships. Both sides rank by rounded cosine with id tiebreaks
    (total orders), so even the approximate side's misses replay
    cross-engine."""
    e = load_table(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        V.as_double(F.col("embedding")).alias("c_vec"),
    )
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        V.as_double(F.col("embedding")).alias("q_vec"),
    )
    return V.ann_recall(
        e, "vec_id", "embedding", seeds, queries, k=10, nprobe=3
    )



def q_ndcg(spark, sf_dir):
    """Graded ranking eval (functions/vector.py ann_ndcg): NDCG@10 of
    the deterministic IVF search vs exact brute force for the 10-query
    batch — the stricter companion to q_ann_recall (recall treats a hit
    at rank 10 like rank 1; NDCG discounts it by the pinned integer
    log2 table, ndcg_discounts — no transcendentals in either engine).
    Same ivf_eval_lists scaffolding, so the two evals share their list
    construction and their cross-engine total orders."""
    from salesforce_plugin_spark.functions.vector import ann_ndcg

    e = load_table(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        V.as_double(F.col("embedding")).alias("c_vec"),
    )
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        V.as_double(F.col("embedding")).alias("q_vec"),
    )
    return ann_ndcg(
        e, "vec_id", "embedding", seeds, queries, k=10, nprobe=3
    )


def q_mutual_nn(spark, sf_dir):
    """High-precision matching (functions/vector.py mutual_nn): pairs
    that are EACH OTHER'S top-1 cosine neighbor within their label
    block — the entity-alignment / dedup-verification primitive
    (one-directional top-1 is asymmetric noise; mutuality is the cheap
    strong filter). Block equijoin bounds candidates (never cartesian);
    both directions rank under total orders, so the mutual set replays
    cross-engine."""
    from salesforce_plugin_spark.functions.vector import mutual_nn

    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return mutual_nn(e, "vec_id", "embedding", "label")


def q_cluster_cohesion(spark, sf_dir):
    """Clustering evaluation (vector.kmeans_assign composed): per-cluster
    exact-integer cohesion — n, floor-mean and max of the assignment's
    squared distances — the pairing that evaluates q_kmeans_assign the
    way q_ann_recall evaluates the IVF index (an unevaluated clustering
    is a guess). All BIGINT; one cluster-bounded aggregate."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    from salesforce_plugin_spark.functions.exactmath import dcast, dfloor

    assigned = V.kmeans_assign(e, seeds)
    # dist2 sums are quadratic — DECIMAL(38,0) like every sibling site
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            dfloor("sum(" + dcast("dist2") + ")", dcast("count(*)"))
        ).alias("mean_dist2"),
        F.max("dist2").cast("long").alias("max_dist2"),
    )



ORACLES: dict[str, str] = {}

ORACLES["q_embed_topk"] = """
        SELECT e.vec_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        ORDER BY sim DESC, e.vec_id LIMIT 10
    """

ORACLES["q_embed_batch_topk"] = """
        SELECT q_id, vec_id, sim FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])), 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.embedding AS DOUBLE[])), 6) DESC,
                                e.vec_id) AS rn
            FROM embeddings e,
                 (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
        ) WHERE rn <= 5
    """

ORACLES["q_jaccard_pairs"] = r"""
        WITH toked AS (
            SELECT doc_id,
                   list_transform(regexp_split_to_array(trim(text), '\s+'),
                                  x -> lower(x)) AS t
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(t, s, s + 4), ' ') AS shingle
            FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 4)) AS s
                FROM toked WHERE len(t) >= 5
            )
        ), sizes AS (
            SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_int
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b,
               round(CAST(n_int AS DOUBLE)
                     / (sa.n_sh + sb.n_sh - n_int), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(CAST(n_int AS DOUBLE)
                    / (sa.n_sh + sb.n_sh - n_int), 6) >= 0.5
    """

ORACLES["q_embed_bucket"] = """
        SELECT vec_id, CAST(
            (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) +
            (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) +
            (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) +
            (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) +
            (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END) +
            (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END) +
            (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END) +
            (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings
    """

ORACLES["q_cosine_pairs"] = """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.5
    """

ORACLES["q_kmeans_converged"] = _KMEANS_ASSIGN_CTES + """
    , assign1 AS (SELECT vec_id, cluster FROM ranked WHERE rn = 1)
    , ex AS (
        SELECT a.cluster, g.i - 1 AS dim,
               CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS q
        FROM embeddings e JOIN assign1 a USING (vec_id)
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(1, len(e.embedding))) AS i
        ) g
    ), cent1 AS (
        SELECT cluster, dim,
               round(sum(q) / (1000000.0 * count(*)), 6) AS c
        FROM ex GROUP BY cluster, dim
    ), comp2 AS (
        SELECT vec_id, cluster,
               CAST(round(dv) AS BIGINT) AS p
        FROM (
            SELECT e.vec_id, c.cluster,
                   (CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.c)
                       * 1000 AS dv
            FROM embeddings e CROSS JOIN cent1 c
        )
    ), dists2 AS (
        SELECT vec_id, cluster, sum(p * p) AS dist2
        FROM comp2 GROUP BY vec_id, cluster
    ), ranked2 AS (
        SELECT vec_id, cluster, dist2,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY dist2, cluster
               ) AS rn
        FROM dists2
    ), assign2 AS (
        SELECT vec_id, cluster, dist2 FROM ranked2 WHERE rn = 1
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(dist2) AS BIGINT) AS sum_dist2
    FROM assign2 GROUP BY cluster
"""

ORACLES["q_dimension_stats"] = """
    WITH ex AS (
        SELECT CAST(i - 1 AS INTEGER) AS dim,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS q
        FROM (
            SELECT embedding,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings
        )
    )
    SELECT dim,
           count(*) AS n,
           CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(sum(q * q) AS BIGINT) AS sumsq_q,
           CAST(CASE WHEN sum(q) >= 0 THEN sum(q) // count(*)
                     ELSE -((-sum(q)) // count(*)) END AS BIGINT) AS mean_q,
           CAST(count(*) * sum(q * q) - sum(q) * sum(q) AS BIGINT)
               AS var_num
    FROM ex GROUP BY dim
"""

ORACLES["q_gram_matrix"] = """
    WITH ex AS (
        SELECT vec_id, CAST(i - 1 AS INTEGER) AS d,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000.0) AS BIGINT)
                   AS q
        FROM (
            SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings
        )
    ), g AS (
        SELECT a.d AS i, b.d AS j, count(*) AS n, sum(a.q * b.q) AS s
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.d >= a.d
        GROUP BY 1, 2
    ), t AS (
        SELECT d, sum(q) AS tq FROM ex GROUP BY d
    )
    SELECT g.i, g.j, g.n, CAST(g.s AS BIGINT) AS s,
           CAST(g.n * g.s - ti.tq * tj.tq AS BIGINT) AS cov_num
    FROM g
    JOIN t ti ON g.i = ti.d
    JOIN t tj ON g.j = tj.d
"""

ORACLES["q_kmeans_margin"] = _KMEANS_ASSIGN_CTES + """
    , w AS (
        SELECT vec_id, cluster, dist2 FROM ranked WHERE rn = 1
    ), s2 AS (
        SELECT vec_id, dist2 AS dist2_second FROM ranked WHERE rn = 2
    )
    SELECT w.vec_id, w.cluster,
           CAST(w.dist2 AS BIGINT) AS dist2,
           CAST(s2.dist2_second AS BIGINT) AS dist2_second,
           CAST(s2.dist2_second - w.dist2 AS BIGINT) AS margin
    FROM w LEFT JOIN s2 ON w.vec_id = s2.vec_id
"""

ORACLES["q_centroid_sim"] = """
    WITH comp AS (
        SELECT label, g.i - 1 AS dim,
               CAST(round(CAST(embedding[g.i] AS DOUBLE) * 10000)
                    AS BIGINT) AS qv
        FROM embeddings e CROSS JOIN LATERAL (
            SELECT unnest(generate_series(1, len(e.embedding))) AS i
        ) g
    ), sums AS (
        SELECT label, dim, CAST(sum(qv) AS BIGINT) AS s
        FROM comp GROUP BY 1, 2
    ), norms AS (
        SELECT label, CAST(sum(s * s) AS BIGINT) AS norm2
        FROM sums GROUP BY 1
    ), dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(sum(a.s * b.s) AS BIGINT) AS dot
        FROM sums a JOIN sums b ON a.dim = b.dim AND a.label < b.label
        GROUP BY 1, 2
    ), joined AS (
        SELECT d.label_a, d.label_b, d.dot,
               na.norm2 AS norm2_a, nb.norm2 AS norm2_b,
               CAST(na.norm2 AS HUGEINT) * CAST(nb.norm2 AS HUGEINT) AS p
        FROM dots d
        JOIN norms na ON na.label = d.label_a
        JOIN norms nb ON nb.label = d.label_b
    ), seeded AS (
        -- exact integer sqrt: double sqrt seeds, +-2 CASE corrects
        -- (the centroid_similarity discipline: no float on the surface)
        SELECT *, CAST(floor(sqrt(CAST(p AS DOUBLE))) AS HUGEINT) AS y0
        FROM joined
    ), rooted AS (
        SELECT *, CASE WHEN (y0+2)*(y0+2) <= p THEN y0+2
                       WHEN (y0+1)*(y0+1) <= p THEN y0+1
                       WHEN y0*y0 <= p THEN y0
                       WHEN (y0-1)*(y0-1) <= p THEN y0-1
                       ELSE y0-2 END AS y
        FROM seeded
    )
    SELECT label_a, label_b, dot, norm2_a, norm2_b,
           CASE WHEN p = 0 THEN NULL
                WHEN dot < 0 THEN
                    -CAST((CAST(abs(dot) AS HUGEINT) * 1000000) // y
                          AS BIGINT)
                ELSE CAST((CAST(dot AS HUGEINT) * 1000000) // y AS BIGINT)
           END AS cos_ppm
    FROM rooted
"""

ORACLES["q_rand_proj"] = _rand_proj_oracle()

ORACLES["q_ann_recall"] = """
    WITH seeds AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS c_vec
        FROM embeddings WHERE vec_id < 8
    ), q AS (
        SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
        FROM embeddings WHERE vec_id < 10
    ), exact AS (
        SELECT q_id, vec_id, exact_rank FROM (
            SELECT q.q_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.q_vec), 6) DESC,
                                e.vec_id) AS exact_rank
            FROM embeddings e, q
        ) WHERE exact_rank <= 10
    ), assigned AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, s.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), s.c_vec), 6) DESC,
                                s.centroid_id) AS rn
            FROM embeddings e, seeds s
        ) WHERE rn = 1
    ), probe AS (
        SELECT q_id, centroid_id FROM (
            SELECT q.q_id, s.centroid_id,
                   row_number() OVER (
                       PARTITION BY q.q_id
                       ORDER BY round(list_cosine_similarity(
                           s.c_vec, q.q_vec), 6) DESC,
                                s.centroid_id) AS pr
            FROM seeds s, q
        ) WHERE pr <= 3
    ), ann AS (
        SELECT q_id, vec_id, ann_rank FROM (
            SELECT p.q_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY p.q_id
                       ORDER BY round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.q_vec), 6) DESC,
                                e.vec_id) AS ann_rank
            FROM embeddings e
            JOIN assigned a ON a.vec_id = e.vec_id
            JOIN probe p ON p.centroid_id = a.centroid_id
            JOIN q ON q.q_id = p.q_id
        ) WHERE ann_rank <= 10
    ), hits AS (
        SELECT e.q_id, e.exact_rank, a.ann_rank
        FROM exact e
        JOIN ann a ON a.q_id = e.q_id AND a.vec_id = e.vec_id
    ), per AS (
        SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits,
               min(CASE WHEN exact_rank = 1 THEN ann_rank END) AS t1
        FROM hits GROUP BY 1
    ), ex_n AS (
        SELECT q_id, CAST(count(*) AS BIGINT) AS n_exact
        FROM exact GROUP BY 1
    )
    SELECT e.q_id,
           CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(p.n_hits, 0) * 1000000 // e.n_exact AS BIGINT)
               AS recall_ppm,
           CAST(COALESCE(1000 // p.t1, 0) AS BIGINT) AS rr_x1000
    FROM ex_n e LEFT JOIN per p USING (q_id)
"""

ORACLES["q_ndcg"] = _ndcg_oracle()

ORACLES["q_mutual_nn"] = """
    WITH cnts AS (
        SELECT label, count(*) AS cnt FROM embeddings GROUP BY 1
    ), blocked AS (
        SELECT e.vec_id, e.embedding,
               e.label || '#' || CAST(
                   ((CASE WHEN len(embedding) > 0 AND embedding[1] >= 0 THEN 1 ELSE 0 END) + (CASE WHEN len(embedding) > 1 AND embedding[2] >= 0 THEN 2 ELSE 0 END) + (CASE WHEN len(embedding) > 2 AND embedding[3] >= 0 THEN 4 ELSE 0 END) + (CASE WHEN len(embedding) > 3 AND embedding[4] >= 0 THEN 8 ELSE 0 END) + (CASE WHEN len(embedding) > 4 AND embedding[5] >= 0 THEN 16 ELSE 0 END) + (CASE WHEN len(embedding) > 5 AND embedding[6] >= 0 THEN 32 ELSE 0 END) + (CASE WHEN len(embedding) > 6 AND embedding[7] >= 0 THEN 64 ELSE 0 END) + (CASE WHEN len(embedding) > 7 AND embedding[8] >= 0 THEN 128 ELSE 0 END) + (CASE WHEN len(embedding) > 8 AND embedding[9] >= 0 THEN 256 ELSE 0 END) + (CASE WHEN len(embedding) > 9 AND embedding[10] >= 0 THEN 512 ELSE 0 END) + (CASE WHEN len(embedding) > 10 AND embedding[11] >= 0 THEN 1024 ELSE 0 END) + (CASE WHEN len(embedding) > 11 AND embedding[12] >= 0 THEN 2048 ELSE 0 END) + (CASE WHEN len(embedding) > 12 AND embedding[13] >= 0 THEN 4096 ELSE 0 END) + (CASE WHEN len(embedding) > 13 AND embedding[14] >= 0 THEN 8192 ELSE 0 END) + (CASE WHEN len(embedding) > 14 AND embedding[15] >= 0 THEN 16384 ELSE 0 END) + (CASE WHEN len(embedding) > 15 AND embedding[16] >= 0 THEN 32768 ELSE 0 END))
                   % (CAST(1 AS BIGINT) << least(16,
                       length(bin(greatest(1, c.cnt // 64))) - 1))
                   AS VARCHAR) AS blk
        FROM embeddings e JOIN cnts c ON c.label = e.label
    ), pairs AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb,
               round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 6) AS sim
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.vec_id <> b.vec_id
    ), top1 AS (
        SELECT ida, idb, sim FROM (
            SELECT ida, idb, sim,
                   row_number() OVER (
                       PARTITION BY ida ORDER BY sim DESC, idb ASC) AS rn
            FROM pairs
        ) WHERE rn = 1
    )
    SELECT t1.ida AS id_a, t1.idb AS id_b, t1.sim
    FROM top1 t1 JOIN top1 t2
      ON t1.idb = t2.ida AND t2.idb = t1.ida
    WHERE t1.ida < t1.idb
"""

ORACLES["q_cluster_cohesion"] = _KMEANS_ASSIGN_CTES + """
    SELECT cluster, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(dist2) // count(*) AS BIGINT) AS mean_dist2,
           CAST(max(dist2) AS BIGINT) AS max_dist2
    FROM ranked WHERE rn = 1
    GROUP BY cluster
"""



def q_mmr(spark, sf_dir):
    """Maximal Marginal Relevance selection (functions/vector.py
    mmr_select, Carbonell & Goldstein SIGIR'98): the diversity-aware
    top-5 against the vec-0 query over a TakeOrderedAndProject top-20
    recall pool — exact-integer throughout (λ = 7/10; relevance and
    pairwise similarity are the corrected-isqrt cosine ppm shared with
    q_centroid_sim). The k greedy rounds unroll as anti-join →
    max-sim aggregate → 1-row top-1, all bounded by pool²; the pool
    and pair matrix are localCheckpoint'ed so rounds never rescan the
    corpus. Oracle replays the pool, the pair matrix, and all 5
    rounds verbatim (unrolled CTEs, HUGEINT isqrt chain)."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    return V.mmr_select(e, "vec_id", "embedding", q, k=5, pool_n=20)


def _mmr_cos_ctes(name: str, src: str, keep: str) -> str:
    """CTE chain appending exact-integer cos ppm (seed + ±2 correction,
    HUGEINT) to ``src`` which carries (dot, na, nb); keeps ``keep``."""
    return f"""
    {name}_p AS (
        SELECT *, na * nb AS p FROM {src}
    ), {name}_seed AS (
        SELECT *, CAST(floor(sqrt(CAST(p AS DOUBLE))) AS HUGEINT) AS y0
        FROM {name}_p
    ), {name}_root AS (
        SELECT *, CASE WHEN (y0+2)*(y0+2) <= p THEN y0+2
                       WHEN (y0+1)*(y0+1) <= p THEN y0+1
                       WHEN y0*y0 <= p THEN y0
                       WHEN (y0-1)*(y0-1) <= p THEN y0-1
                       ELSE y0-2 END AS y
        FROM {name}_seed
    ), {name} AS (
        SELECT {keep},
               CASE WHEN p = 0 THEN NULL
                    WHEN dot < 0 THEN
                        -CAST((CAST(abs(dot) AS HUGEINT) * 1000000) // y
                              AS BIGINT)
                    ELSE CAST((CAST(dot AS HUGEINT) * 1000000) // y
                              AS BIGINT)
               END AS cos_ppm
        FROM {name}_root
    )"""


def _mmr_oracle(k: int = 5, pool_n: int = 20,
                lam_num: int = 7, lam_den: int = 10) -> str:
    pen = lam_den - lam_num
    rounds = []
    prev_sel = "sel1"
    union = ["SELECT vec_id, pick, rel_ppm, mmr_scaled FROM sel1"]
    for r in range(2, k + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{i}" for i in range(1, r)
        )
        rounds.append(f"""
    r{r}_rem AS (
        SELECT * FROM pool
        WHERE vec_id NOT IN ({sel_union})
    ), r{r}_ms AS (
        SELECT pr.id_a AS vec_id, max(pr.cos_ppm) AS ms
        FROM pairs pr
        WHERE pr.id_b IN ({sel_union})
        GROUP BY 1
    ), sel{r} AS (
        SELECT t.vec_id, {r} AS pick, t.rel_ppm,
               CAST({lam_num} * t.rel_ppm - {pen} * m.ms AS BIGINT)
                   AS mmr_scaled
        FROM r{r}_rem t JOIN r{r}_ms m USING (vec_id)
        ORDER BY mmr_scaled DESC, t.vec_id
        LIMIT 1
    )""")
        union.append(f"SELECT vec_id, pick, rel_ppm, mmr_scaled FROM sel{r}")
        prev_sel = f"sel{r}"
    rel_cos = _mmr_cos_ctes("rel", "rel_base", "vec_id, q")
    pair_cos = _mmr_cos_ctes("pairs", "pair_base", "id_a, id_b")
    return f"""
    WITH qv AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS q
        FROM embeddings
    ), qq AS (
        SELECT q AS qj FROM qv WHERE vec_id = 0
    ), rel_base AS (
        SELECT v.vec_id, v.q,
               CAST(list_dot_product(CAST(v.q AS DOUBLE[]),
                                     CAST(w.qj AS DOUBLE[])) AS HUGEINT)
                   AS dot,
               CAST(list_dot_product(CAST(v.q AS DOUBLE[]),
                                     CAST(v.q AS DOUBLE[])) AS HUGEINT)
                   AS na,
               CAST(list_dot_product(CAST(w.qj AS DOUBLE[]),
                                     CAST(w.qj AS DOUBLE[])) AS HUGEINT)
                   AS nb
        FROM qv v CROSS JOIN qq w
    ), {rel_cos.strip()}, pool AS (
        SELECT vec_id, q, cos_ppm AS rel_ppm FROM (
            SELECT *, row_number() OVER (
                ORDER BY cos_ppm DESC, vec_id) AS rn
            FROM rel
        ) WHERE rn <= {pool_n}
    ), pair_base AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(list_dot_product(CAST(a.q AS DOUBLE[]),
                                     CAST(b.q AS DOUBLE[])) AS HUGEINT)
                   AS dot,
               CAST(list_dot_product(CAST(a.q AS DOUBLE[]),
                                     CAST(a.q AS DOUBLE[])) AS HUGEINT)
                   AS na,
               CAST(list_dot_product(CAST(b.q AS DOUBLE[]),
                                     CAST(b.q AS DOUBLE[])) AS HUGEINT)
                   AS nb
        FROM pool a JOIN pool b ON a.vec_id != b.vec_id
    ), {pair_cos.strip()}, sel1 AS (
        SELECT vec_id, 1 AS pick, rel_ppm,
               CAST({lam_num} * rel_ppm AS BIGINT) AS mmr_scaled
        FROM pool ORDER BY rel_ppm DESC, vec_id LIMIT 1
    ),{",".join(rounds)}
    {" UNION ALL ".join(union)}
"""


ORACLES["q_mmr"] = _mmr_oracle()


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining (functions/vector.py hard_negatives): per
    label's min-id anchor, the 5 nearest DIFFERENT-label vectors by
    the exact corrected-isqrt cosine — the contrastive-training
    negative miner and instance-level class-confusion diagnostic
    (q_centroid_sim's centroid view sharpened to instances). Anchors
    are one min_by aggregate broadcast against one corpus scan; the
    per-anchor window prunes to k before anything wide moves."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return V.hard_negatives(e, "vec_id", "embedding", "label", k=5)


def _hard_neg_oracle(k: int = 5) -> str:
    cos = _mmr_cos_ctes("sc", "pair_base", "q_label, vec_id, label")
    return f"""
    WITH qv AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS q
        FROM embeddings
    ), anchors AS (
        SELECT label AS q_label, min(vec_id) AS avid
        FROM qv GROUP BY 1
    ), aq AS (
        SELECT a.q_label, v.q AS qa
        FROM anchors a JOIN qv v ON v.vec_id = a.avid
    ), pair_base AS (
        SELECT a.q_label, v.vec_id, v.label,
               CAST(list_dot_product(CAST(v.q AS DOUBLE[]),
                                     CAST(a.qa AS DOUBLE[])) AS HUGEINT)
                   AS dot,
               CAST(list_dot_product(CAST(v.q AS DOUBLE[]),
                                     CAST(v.q AS DOUBLE[])) AS HUGEINT)
                   AS na,
               CAST(list_dot_product(CAST(a.qa AS DOUBLE[]),
                                     CAST(a.qa AS DOUBLE[])) AS HUGEINT)
                   AS nb
        FROM qv v CROSS JOIN aq a
        WHERE v.label != a.q_label
    ), {cos.strip()}
    SELECT q_label, vec_id, label, cos_ppm, CAST(rn AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_label ORDER BY cos_ppm DESC, vec_id) AS rn
        FROM sc
    ) WHERE rn <= {k}
"""


ORACLES["q_hard_negatives"] = _hard_neg_oracle()


def q_knn_classify(spark, sf_dir):
    """Embedding-space label prediction (functions/vector.py
    knn_classify): deterministic arithmetic holdout (vec_id % 10 == 0),
    5-NN majority vote under the exact corrected-isqrt cosine, tie
    broken (votes desc, label asc) — the geometry-carries-labels eval
    that closes the F3 loop (q_ann_recall grades retrieval; this grades
    the label structure semantic dedup / clustering lean on). Queries
    are the 50 lowest holdout ids — BOUNDED, so the pair stage stays
    linear in the corpus at any scale — broadcast against ONE
    reference scan; the vote is a k-bounded aggregate after the
    per-query window prunes to k."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return V.knn_classify(
        e, "vec_id", "embedding", "label", k=5, max_queries=50
    )


def _knn_oracle(k: int = 5, mq: int = 50) -> str:
    cos = _mmr_cos_ctes("sc", "pair_base", "qid, qlbl, vec_id, label")
    return f"""
    WITH qv AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS q
        FROM embeddings
    ), queries AS (
        SELECT vec_id AS qid, label AS qlbl, q AS qq
        FROM qv WHERE vec_id % 10 = 0
        ORDER BY vec_id LIMIT {mq}
    ), train AS (
        SELECT * FROM qv WHERE vec_id % 10 != 0
    ), pair_base AS (
        SELECT qu.qid, qu.qlbl, t.vec_id, t.label,
               CAST(list_dot_product(CAST(t.q AS DOUBLE[]),
                                     CAST(qu.qq AS DOUBLE[])) AS HUGEINT)
                   AS dot,
               CAST(list_dot_product(CAST(t.q AS DOUBLE[]),
                                     CAST(t.q AS DOUBLE[])) AS HUGEINT)
                   AS na,
               CAST(list_dot_product(CAST(qu.qq AS DOUBLE[]),
                                     CAST(qu.qq AS DOUBLE[])) AS HUGEINT)
                   AS nb
        FROM train t CROSS JOIN queries qu
    ), {cos.strip()}, topk AS (
        SELECT qid, qlbl, label
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY cos_ppm DESC, vec_id) AS rn
            FROM sc
        ) WHERE rn <= {k}
    ), votes AS (
        SELECT qid, qlbl, label, count(*) AS n_votes
        FROM topk GROUP BY 1, 2, 3
    )
    SELECT qid AS vec_id, qlbl AS label,
           label AS pred_label,
           CAST(CASE WHEN qlbl = label THEN 1 ELSE 0 END AS INT) AS correct
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY n_votes DESC, label ASC) AS vr
        FROM votes
    ) WHERE vr = 1
"""


ORACLES["q_knn_classify"] = _knn_oracle()


def q_quant_error(spark, sf_dir):
    """int8-quantization fidelity eval (functions/vector.py
    quant_error_eval): exact-integer cosine of int8-compressed vs
    reference-quantized vectors over the deterministic consecutive-id
    pair sample, signed ppm error — the measured-error harness for the
    4× scan-volume int8 storage decision (the q_ann_recall discipline
    applied to the compression knob; an error distribution here sizes
    the re-rank budget of two-stage retrieval). Linear in the corpus
    (id-adjacency join, no pair blowup)."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return V.quant_error_eval(e, "vec_id", "embedding")


def _quant_err_oracle() -> str:
    cref = _mmr_cos_ctes("cref", "pr", "id_a, id_b")
    cq = _mmr_cos_ctes("cq", "pq", "id_a, id_b")
    return f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS r,
               CASE WHEN list_max(list_transform(embedding,
                             x -> abs(CAST(x AS DOUBLE)))) > 0
                    THEN list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE)
                             * (127.0 / list_max(list_transform(embedding,
                                    y -> abs(CAST(y AS DOUBLE)))))) AS BIGINT))
                    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT))
               END AS q8
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.r AS ra, b.r AS rb, a.q8 AS qa, b.q8 AS qb
        FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
    ), pr AS (
        SELECT id_a, id_b,
               CAST(list_dot_product(CAST(ra AS DOUBLE[]),
                                     CAST(rb AS DOUBLE[])) AS HUGEINT) AS dot,
               CAST(list_dot_product(CAST(ra AS DOUBLE[]),
                                     CAST(ra AS DOUBLE[])) AS HUGEINT) AS na,
               CAST(list_dot_product(CAST(rb AS DOUBLE[]),
                                     CAST(rb AS DOUBLE[])) AS HUGEINT) AS nb
        FROM pairs
    ), pq AS (
        SELECT id_a, id_b,
               CAST(list_dot_product(CAST(qa AS DOUBLE[]),
                                     CAST(qb AS DOUBLE[])) AS HUGEINT) AS dot,
               CAST(list_dot_product(CAST(qa AS DOUBLE[]),
                                     CAST(qa AS DOUBLE[])) AS HUGEINT) AS na,
               CAST(list_dot_product(CAST(qb AS DOUBLE[]),
                                     CAST(qb AS DOUBLE[])) AS HUGEINT) AS nb
        FROM pairs
    ), {cref.strip()}, {cq.strip()}
    SELECT r.id_a, r.id_b,
           r.cos_ppm AS cos_ref_ppm,
           q.cos_ppm AS cos_int8_ppm,
           CAST(q.cos_ppm - r.cos_ppm AS BIGINT) AS err_ppm
    FROM cref r JOIN cq q USING (id_a, id_b)
"""


ORACLES["q_quant_error"] = _quant_err_oracle()


def q_knn_confusion(spark, sf_dir):
    """Class-confusion matrix of the k-NN eval (functions/vector.py
    knn_classify aggregated to (label, pred_label, n)) — the artifact a
    curation pipeline actually consumes from the geometry eval: which
    label pairs the embedding space conflates (the instance-level
    complement of q_centroid_sim's centroid-cosine confusion, and the
    quantity that decides whether label-blocked semantic dedup is safe
    for a given pair of classes). Same bounded-eval-set plan as
    q_knn_classify plus one k·|queries|-bounded aggregate."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    preds = V.knn_classify(
        e, "vec_id", "embedding", "label", k=5, max_queries=50
    )
    return preds.groupBy("label", "pred_label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


ORACLES["q_knn_confusion"] = (
    "\n    SELECT label, pred_label, CAST(count(*) AS BIGINT) AS n"
    "\n    FROM (" + _knn_oracle() + ") GROUP BY 1, 2\n"
)


def q_dbscan_roles(spark, sf_dir):
    """Density triage (functions/vector.py dbscan_roles): DBSCAN's
    core/border/noise classification over the embedding column —
    ε-neighborhoods (exact corrected-isqrt cosine ≥ 0.2) evaluated
    within ADAPTIVE sign-LSH buckets (bits = msb(count div 8) derived
    IN-PLAN — the mutual_nn discipline; the first cut's fixed 6 bits
    probed 36× at 10× data because a fixed bucket count saturates),
    min_pts=4. The outlier/cluster-seed triage before density-aware
    sampling; cores + ε-edges feed connected-components for full
    DBSCAN cluster ids."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return V.dbscan_roles(
        e, "vec_id", "embedding", eps_ppm=200000, min_pts=4
    )


def _dbscan_oracle(
    eps_ppm: int = 200000,
    min_pts: int = 4,
    target_bucket: int = 8,
    sign_bits: int = 16,
) -> str:
    mask_terms = " + ".join(
        f"(CASE WHEN len(embedding) > {i}"
        f" AND CAST(embedding[{i + 1}] AS DOUBLE) >= 0"
        f" THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(sign_bits)
    )
    cos = _mmr_cos_ctes("sc", "pair_base", "ida, idb")
    return f"""
    WITH cnt AS (
        SELECT least({sign_bits},
                     length(bin(greatest(1,
                         count(*) // {target_bucket}))) - 1) AS bits
        FROM embeddings
    ), qv AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS q,
               ({mask_terms})
                   % (CAST(1 AS BIGINT) << (SELECT bits FROM cnt)) AS bkt
        FROM embeddings
    ), pair_base AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb,
               CAST(list_dot_product(CAST(a.q AS DOUBLE[]),
                                     CAST(b.q AS DOUBLE[])) AS HUGEINT)
                   AS dot,
               CAST(list_dot_product(CAST(a.q AS DOUBLE[]),
                                     CAST(a.q AS DOUBLE[])) AS HUGEINT)
                   AS na,
               CAST(list_dot_product(CAST(b.q AS DOUBLE[]),
                                     CAST(b.q AS DOUBLE[])) AS HUGEINT)
                   AS nb
        FROM qv a JOIN qv b ON a.bkt = b.bkt AND a.vec_id != b.vec_id
    ), {cos.strip()}, close AS (
        SELECT ida, idb FROM sc WHERE cos_ppm >= {eps_ppm}
    ), neigh AS (
        SELECT ida AS vec_id, count(*) AS n_eps FROM close GROUP BY 1
    ), flagged AS (
        SELECT v.vec_id,
               coalesce(n.n_eps, 0) AS n_eps,
               CASE WHEN coalesce(n.n_eps, 0) + 1 >= {min_pts}
                    THEN 1 ELSE 0 END AS is_core
        FROM qv v LEFT JOIN neigh n USING (vec_id)
    ), near_core AS (
        SELECT DISTINCT c.ida AS vec_id
        FROM close c JOIN flagged f ON f.vec_id = c.idb AND f.is_core = 1
    )
    SELECT f.vec_id,
           CAST(f.n_eps + 1 AS BIGINT) AS n_neighbors,
           CASE WHEN f.is_core = 1 THEN 'core'
                WHEN nc.vec_id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role
    FROM flagged f LEFT JOIN near_core nc ON nc.vec_id = f.vec_id
"""


ORACLES["q_dbscan_roles"] = _dbscan_oracle()


def q_dbscan_clusters(spark, sf_dir):
    """Full DBSCAN (functions/vector.py dbscan_clusters): the
    q_dbscan_roles triage completed to cluster ids — ε-connected
    cores collapse via the existing connected-components operator
    (CC runs on the CORE subgraph only, orders of magnitude smaller
    than the corpus), borders attach to the min cluster among their
    ε-cores (total order), noise stays NULL — density-aware
    clustering with no k to pick and outliers excluded by
    construction. Same adaptive blocking + exact-cosine pair stage as
    q_dbscan_roles; recursive-CTE oracle (the q_dedup_components
    discipline) replays the closure."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return V.dbscan_clusters(
        e, "vec_id", "embedding", eps_ppm=200000, min_pts=4
    )


def _dbscan_clusters_oracle(
    eps_ppm: int = 200000,
    min_pts: int = 4,
    target_bucket: int = 8,
    sign_bits: int = 16,
) -> str:
    base = _dbscan_oracle(eps_ppm, min_pts, target_bucket, sign_bits)
    head = base[: base.index("    SELECT f.vec_id,")]
    head = head.replace("    WITH cnt AS (", "    WITH RECURSIVE cnt AS (")
    return (
        head
        + """, core_edges AS (
        SELECT c.ida AS src, c.idb AS dst
        FROM close c
        JOIN flagged fa ON fa.vec_id = c.ida AND fa.is_core = 1
        JOIN flagged fb ON fb.vec_id = c.idb AND fb.is_core = 1
    ), reach AS (
        SELECT vec_id AS id, vec_id AS r
        FROM flagged WHERE is_core = 1
        UNION
        SELECT reach.id, e.dst FROM reach JOIN core_edges e
          ON reach.r = e.src
    ), cc AS (
        SELECT id AS core_id, min(r) AS cluster FROM reach GROUP BY id
    ), border_attach AS (
        SELECT c.ida AS vec_id, min(cc.cluster) AS border_cluster
        FROM close c JOIN cc ON cc.core_id = c.idb
        GROUP BY 1
    )
    SELECT f.vec_id,
           CASE WHEN f.is_core = 1 THEN 'core'
                WHEN ba.border_cluster IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(CASE WHEN f.is_core = 1 THEN cc.cluster
                     ELSE ba.border_cluster END AS BIGINT) AS cluster
    FROM flagged f
    LEFT JOIN cc ON cc.core_id = f.vec_id
    LEFT JOIN border_attach ba ON ba.vec_id = f.vec_id
"""
    )


ORACLES["q_dbscan_clusters"] = _dbscan_clusters_oracle()


_HIER_LADDER = [260000, 220000, 180000]
_HIER_MIN_PTS = 3


def q_dbscan_hierarchy(spark, sf_dir):
    """HDBSCAN-style density hierarchy (functions/vector.py
    dbscan_hierarchy, round 7): the DBSCAN dendrogram sampled at a
    pinned ε ladder — each level an exact DBSCAN labeling over the
    SAME materialized ε-close pairs (computed once at the loosest
    threshold, lineage-cut), with loosening ε only adding edges/cores
    so tight clusters provably refine loose ones. At the fixture's
    ladder the three levels carry ~36/52/38 core clusters — a real
    dendrogram, not a degenerate one. Long output (id, level,
    eps_ppm, role, cluster); per-level recursive-CTE closure in the
    oracle."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return V.dbscan_hierarchy(
        e, "vec_id", "embedding", _HIER_LADDER, min_pts=_HIER_MIN_PTS
    )


def q_dbscan_tree(spark, sf_dir):
    """The condensed merge tree over q_dbscan_hierarchy's labels
    (functions/vector.py dbscan_tree): per consecutive-level pair,
    which tight CORE cluster feeds which looser cluster and with how
    many core members — HDBSCAN's condensed-tree read-out at ladder
    resolution. Refinement guarantees each row is a tree edge (no
    child splits across parents); the oracle recomputes the hierarchy
    and the same core-side join."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    h = V.dbscan_hierarchy(
        e, "vec_id", "embedding", _HIER_LADDER, min_pts=_HIER_MIN_PTS
    )
    return V.dbscan_tree(h, "vec_id")


def _dbscan_hierarchy_oracle(
    ladder: list[int] = tuple(_HIER_LADDER),
    min_pts: int = _HIER_MIN_PTS,
    target_bucket: int = 8,
    sign_bits: int = 16,
) -> str:
    """Per-level replication of the q_dbscan_clusters closure over one
    shared pair stage: head CTEs (qv/pair_base/exact-cos) come from
    _dbscan_oracle at the loosest ε, then each ladder level gets its
    own close/flagged/core_edges/reach/cc/border CTE family and the
    final SELECT unions the per-level labelings."""
    lad = sorted({int(e) for e in ladder}, reverse=True)
    base = _dbscan_oracle(lad[-1], min_pts, target_bucket, sign_bits)
    head = base[: base.index(", close AS (")]
    head = head.replace("    WITH cnt AS (", "    WITH RECURSIVE cnt AS (")
    parts, selects = [head], []
    for lvl, eps in enumerate(lad):
        parts.append(f""", close{lvl} AS (
        SELECT ida, idb FROM sc WHERE cos_ppm >= {eps}
    ), neigh{lvl} AS (
        SELECT ida AS vec_id, count(*) AS n_eps FROM close{lvl} GROUP BY 1
    ), flagged{lvl} AS (
        SELECT v.vec_id,
               CASE WHEN coalesce(n.n_eps, 0) + 1 >= {min_pts}
                    THEN 1 ELSE 0 END AS is_core
        FROM qv v LEFT JOIN neigh{lvl} n USING (vec_id)
    ), core_edges{lvl} AS (
        SELECT c.ida AS src, c.idb AS dst
        FROM close{lvl} c
        JOIN flagged{lvl} fa ON fa.vec_id = c.ida AND fa.is_core = 1
        JOIN flagged{lvl} fb ON fb.vec_id = c.idb AND fb.is_core = 1
    ), reach{lvl} AS (
        SELECT vec_id AS id, vec_id AS r
        FROM flagged{lvl} WHERE is_core = 1
        UNION
        SELECT reach{lvl}.id, e.dst FROM reach{lvl} JOIN core_edges{lvl} e
          ON reach{lvl}.r = e.src
    ), cc{lvl} AS (
        SELECT id AS core_id, min(r) AS cluster FROM reach{lvl} GROUP BY id
    ), border{lvl} AS (
        SELECT c.ida AS vec_id, min(cc{lvl}.cluster) AS border_cluster
        FROM close{lvl} c JOIN cc{lvl} ON cc{lvl}.core_id = c.idb
        GROUP BY 1
    )""")
        selects.append(f"""
    SELECT f.vec_id, CAST({lvl} AS INT) AS level,
           CAST({eps} AS INT) AS eps_ppm,
           CASE WHEN f.is_core = 1 THEN 'core'
                WHEN ba.border_cluster IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           CAST(CASE WHEN f.is_core = 1 THEN cc{lvl}.cluster
                     ELSE ba.border_cluster END AS BIGINT) AS cluster
    FROM flagged{lvl} f
    LEFT JOIN cc{lvl} ON cc{lvl}.core_id = f.vec_id
    LEFT JOIN border{lvl} ba ON ba.vec_id = f.vec_id""")
    return "".join(parts) + " UNION ALL ".join(selects)


ORACLES["q_dbscan_hierarchy"] = _dbscan_hierarchy_oracle()
ORACLES["q_dbscan_tree"] = (
    "WITH h AS ("
    + _dbscan_hierarchy_oracle()
    + """)
    SELECT CAST(c.level AS INT) AS level,
           c.cluster AS child_cluster,
           p.cluster AS parent_cluster,
           CAST(count(*) AS BIGINT) AS n_members
    FROM h c
    JOIN h p ON p.vec_id = c.vec_id AND p.level = c.level + 1
    WHERE c.role = 'core'
    GROUP BY 1, 2, 3
"""
)
