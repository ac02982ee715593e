"""Sketch/streaming-summary operators: CM/KMV/HLL-shape, quantile/histogram sketches, heavy hitters.

Split from the single-file conformance registry in round 6; byte-identical
query builders and oracle SQL. The ordered public registry lives in
``salesforce_plugin_spark.conformance`` (the package __init__).
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import *  # noqa: F401,F403


def q_kmv_distinct(spark, sf_dir):
    """Distributed cardinality sketch: per-event-type KMV distinct-user
    estimate (functions/sketch.py) joined against the exact count so the
    result exhibits the estimator's error. KMV is the sketch that can sit
    under a cross-engine differential gate: md5-derived hashes, a
    k-smallest election, and an integer floor divide are all
    bit-reproducible in DuckDB, unlike HLL register layouts
    (approx_count_distinct stays the non-gated prod fast path)."""
    from salesforce_plugin_spark.functions.sketch import kmv_distinct

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid"), "user_id"
    )
    sk = kmv_distinct(e, "uid", k=64, group_cols=["event_type"])
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return sk.join(exact, "event_type")


def q_kmv_setops(spark, sf_dir):
    """KMV set-operation estimates (functions/sketch.py kmv_set_ops,
    Beyer et al. SIGMOD'07): click-users vs purchase-users union /
    intersection / Jaccard from one merged 64-minimum-values sketch,
    joined against the exact union and intersection so the estimator's
    error is visible in the gated result. The audience-overlap question
    every event warehouse asks, answered with sketch state bounded at k
    hashes per side regardless of corpus size — and every stage (md5
    hash, flag merge, k-smallest election, integer floor divides)
    replayable bit-for-bit by the DuckDB oracle."""
    from salesforce_plugin_spark.functions.sketch import kmv_set_ops

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid"), "user_id"
    )
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    sk = kmv_set_ops(clicks, purchases, "uid", k=64)
    both = clicks.select("user_id").intersect(purchases.select("user_id"))
    exact = (
        clicks.select("user_id")
        .union(purchases.select("user_id"))
        .agg(F.countDistinct("user_id").alias("exact_union"))
        .crossJoin(both.agg(F.countDistinct("user_id").alias("exact_inter")))
    )
    return sk.crossJoin(F.broadcast(exact))


def q_quantile_sketch(spark, sf_dir):
    """Distributed quantile sketching: single-pass equi-width-histogram
    quantiles (functions/sketch.py binned_quantiles) over events.value —
    the deterministic, engine-replayable alternative to GK/t-digest
    (whose merge order is nondeterministic) and to rank interpolation
    (whose tie/interp arithmetic differs between engines; the exact form
    is gated separately by q_agg_percentile). lo/hi/n_bins chosen so the
    bin width is an exact binary double (0.5), making every estimate
    arithmetic bit-identical cross-engine. One map-side-combined
    exchange on the bin id; nothing downstream scales with data."""
    from salesforce_plugin_spark.functions.sketch import binned_quantiles

    e = load_table(spark, sf_dir, "events")
    return binned_quantiles(
        e, "value", qs=[0.5, 0.9, 0.99], lo=0.0, hi=500.0, n_bins=1000
    )


def q_heavy_hitters(spark, sf_dir):
    """Sketch family: count-min point-frequency estimates
    (functions/sketch.py cm_sketch/cm_estimate) — the mergeable
    frequency summary that replaces a full group-by when only heavy
    hitters matter at 100 TB (grid is depth×width counters; union of
    sketches = grid sum). Gated beside the EXACT per-user counts so the
    one-sided overestimate is visible: est_n >= exact_n always, equality
    whenever none of the user's 4 rows collides. md5-family bucket
    hashes make the grid bit-replayable in DuckDB. Plan: one
    partial-combined exchange bounded by depth·width for the sketch;
    the probe side joins the BROADCAST grid and never shuffles wide."""
    from salesforce_plugin_spark.functions.sketch import cm_estimate, cm_sketch

    ev = parallelized(load_table(spark, sf_dir, "events"))
    sk = cm_sketch(ev, "user_id", width=256, depth=4)
    est = cm_estimate(sk, ev, "user_id", width=256, depth=4)
    exact = ev.groupBy(F.col("user_id").alias("value")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    return (
        est.join(exact, "value")
        .select(
            F.col("value").alias("user_id"),
            "est_n",
            "exact_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
        )
    )


def q_join_size_est(spark, sf_dir):
    """Join-size estimation (functions/sketch.py kmv_join_size) — the
    join-planning statistic that decides broadcast-vs-shuffle or flags a
    runaway join at 100 TB BEFORE running it: |A ⋈ B| = Σ_key fA·fB,
    estimated from ONE merged count-carrying KMV sketch (uniform
    distinct-key sample → (D_union div n_kept)·Σ_kept fA·fB, all
    integer). A = lineitem on l_partkey, B = the returned-lines subset —
    multi-row frequencies on BOTH sides so the frequency product does
    real work. Gated beside the exact Σ fA·fB (one group-by each side +
    an equijoin sum) so the estimator error is visible. Each side
    reduces to (hash, count) in one partial-combined exchange; the
    election and everything after is k-bounded."""
    from salesforce_plugin_spark.functions.sketch import kmv_join_size

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("pk"),
        F.col("l_partkey"),
        F.col("l_returnflag"),
    )
    a = li
    b = li.filter(F.col("l_returnflag") == "R")
    est = kmv_join_size(a, b, "pk", k=128)
    ca = a.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("__ca"))
    cb = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("__cb"))
    exact = (
        ca.join(cb, "l_partkey")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("exact_join"))
    )
    return est.crossJoin(F.broadcast(exact))


def q_feature_bins(spark, sf_dir):
    """Equi-depth feature discretization (functions/sketch.py
    quantile_bins): learn quartile cut points with the deterministic
    histogram-quantile sketch (one bounded exchange) and label every
    event with its bucket — the two-pass 100 TB discretizer shape
    (pass 1 reduces to ≤ n_bins rows; pass 2 is a broadcast of the
    3-row cut table + map-heavy labeling). Bin width 0.5 is an exact
    binary double, so every cut point and comparison is bit-identical
    cross-engine."""
    from salesforce_plugin_spark.functions.sketch import quantile_bins

    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    return quantile_bins(e, "value", n_bins_out=4, lo=0.0, hi=500.0, n_bins=1000)


def q_bloom_prune(spark, sf_dir):
    """Engine-portable Bloom semi-join pruning (functions/sketch.py
    bloom_build/bloom_prune): a selective build side (high-value orders)
    reduces to a ≤4096-row bit-position set; the fact side is pruned by
    3 broadcast left-semi joins — all map-side, ZERO fact exchange —
    before any real join runs. The gate makes the one-sided contract
    visible per return flag: n_pass (survived bloom), n_true (actually
    in the build set — never undercounted), n_false_pos (the bounded
    leak the downstream join removes). The portable analog of Spark's
    runtime bloom pushdown, for when the filter must be built once and
    replayed across stages or engines."""
    from salesforce_plugin_spark.functions.sketch import bloom_build, bloom_prune

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey").distinct()
    bloom = bloom_build(build, "o_orderkey", n_bits=4096, n_hashes=3)
    pruned = bloom_prune(
        li.select("l_orderkey", "l_returnflag"), "l_orderkey", bloom, 4096, 3
    )
    build_keys = build.select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("__m")
    )
    return (
        pruned.join(F.broadcast(build_keys), "l_orderkey", "left")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_pass"),
            F.sum(F.coalesce(F.col("__m"), F.lit(0))).cast("long").alias("n_true"),
            (F.count("*") - F.sum(F.coalesce(F.col("__m"), F.lit(0))))
            .cast("long")
            .alias("n_false_pos"),
        )
    )


def q_grouped_quantiles(spark, sf_dir):
    """Per-group quantile sketching (functions/sketch.py
    binned_quantiles with group_cols): p50/p90 of events.value per
    event_type from ONE histogram pass — the grouped form of
    q_quantile_sketch. The cumulative window and quantile election
    partition by group, so the exchange is bounded by
    |event types| x n_bins rows, never the event count; bin width 0.5
    is an exact binary double so estimates are bit-identical
    cross-engine."""
    from salesforce_plugin_spark.functions.sketch import binned_quantiles

    e = load_table(spark, sf_dir, "events")
    return binned_quantiles(
        e,
        "value",
        qs=[0.5, 0.9],
        lo=0.0,
        hi=500.0,
        n_bins=1000,
        group_cols=["event_type"],
    )


def q_percentile_normalize(spark, sf_dir):
    """Percentile-rank normalization (functions/sketch.py
    percentile_normalize): every event's value replaced by its corpus
    percentile in ppm — the scale/outlier-robust feature transform —
    WITHOUT the global sort exact ranking needs: pass 1 is a bounded
    cumulative histogram (bin width 0.5, exact binary), pass 2 a
    broadcast join back on the bin id; the data side never shuffles.
    Ties within a bin share a rank, making the result deterministic
    under any row order; the ppm is an integer floor."""
    from salesforce_plugin_spark.functions.sketch import percentile_normalize

    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    return percentile_normalize(e, "value", lo=0.0, hi=500.0, n_bins=1000)


def q_iqr_outliers(spark, sf_dir):
    """Tukey-fence robust outliers (functions/sketch.py iqr_outliers):
    quartiles from the deterministic histogram sketch (bin width 1.0,
    exact binary), fences Q1/Q3 -+ 3*(Q3-Q1)/2, one broadcast 1-row
    join + map-side filter. The fixture seeds deterministic corruption
    (event_id % 97 == 0 gets +5000) so the fence provably fires on the
    ~1% damaged tail while the quartiles, being rank statistics, ignore
    it — the masking resistance mean/sigma fences lack."""
    from salesforce_plugin_spark.functions.sketch import iqr_outliers

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        (
            F.col("value")
            + F.when(F.col("event_id") % 97 == 0, F.lit(5000.0)).otherwise(
                F.lit(0.0)
            )
        ).alias("value_adj"),
    )
    return iqr_outliers(e, "value_adj", lo=0.0, hi=8192.0, n_bins=8192)


def q_distribution_drift(spark, sf_dir):
    """Distribution-drift detection (functions/sketch.py
    histogram_tvd): total variation distance between click and view
    event-value distributions over a shared 1000-bin histogram —
    integer common-denominator arithmetic end to end (the
    deterministic, empty-bin-safe alternative to PSI/KL, whose log
    never hash-gates). One row out: corpus sizes, exact numerator,
    tvd_ppm, and the worst-diverging bin for localization."""
    from salesforce_plugin_spark.functions.sketch import histogram_tvd

    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click")
    b = e.filter(F.col("event_type") == "view")
    return histogram_tvd(a, b, "value", lo=0.0, hi=500.0, n_bins=1000)


def q_ks_test(spark, sf_dir):
    """Two-sample drift test (functions/sketch.py ks_statistic): exact
    Kolmogorov-Smirnov D between click and view value distributions —
    the unbinned companion to q_distribution_drift's TVD (no bin
    choice; supremum of the CDF gap over observed values). Cumulative
    counts ride the distributed prefix sum (operators/partitioning.py
    global_cumsum), the gap is cross-multiplied |C₁n₂ − C₂n₁|, and the
    supremum location is one TakeOrderedAndProject."""
    from salesforce_plugin_spark.functions.sketch import ks_statistic

    e = load_table(spark, sf_dir, "events")
    a = e.filter(
        (F.col("event_type") == "click") & F.col("value").isNotNull()
    )
    b = e.filter(
        (F.col("event_type") == "view") & F.col("value").isNotNull()
    )
    return ks_statistic(a, b, "value", quant=1000)


def q_winsorize(spark, sf_dir):
    """Heavy-tail taming (functions/sketch.py winsorize): clamp
    events.value at sketch-learned p05/p95 fences — deterministic
    single-pass quantiles (exact-binary width 512/1024) + a 1-row
    broadcast + map-side clamp; the KEEP-at-fence complement of
    iqr_outliers' flagging. Gate aggregates per event_type so the clamp
    mass is visible; cents re-quantization keeps the surface integer."""
    from salesforce_plugin_spark.functions.sketch import winsorize

    e = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    w = winsorize(e, "value", lo=0.0, hi=512.0, q_low=0.05, q_high=0.95)
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("clamped").cast("long").alias("n_clamped"),
        F.sum(F.round(F.col("winsorized") * 100).cast("long")).alias(
            "sum_cents"
        ),
    )


def q_rolling_quantiles(spark, sf_dir):
    """Observability workhorse (functions/sketch.py rolling_quantiles):
    trailing-7-day p50/p95 per event type — rolling quantiles have no
    exact sliding form (not subtractable) and t-digests are merge-order
    nondeterministic; the additive day-level histogram (width 2.0 exact
    binary) + day-explode merge + upper-edge election replays
    cross-engine. Exchanges bounded by keys × days × bins, never event
    volume."""
    from salesforce_plugin_spark.functions.sketch import rolling_quantiles

    e = load_table(spark, sf_dir, "events")
    return rolling_quantiles(
        e, "event_type", "ts", "value", [0.5, 0.95],
        lo=0.0, hi=512.0, n_bins=256, window_days=7,
    )



ORACLES: dict[str, str] = {}

ORACLES["q_kmv_distinct"] = """
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS hh
        FROM events
    ), ranked AS (
        SELECT event_type, hh,
               row_number() OVER (PARTITION BY event_type ORDER BY hh) AS rn
        FROM h
    ), agg AS (
        SELECT event_type, CAST(count(*) AS INT) AS n_kept,
               max(hh) AS kth_hash
        FROM ranked WHERE rn <= 64 GROUP BY event_type
    ), exact AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT a.event_type, 64 AS k, a.n_kept, a.kth_hash,
           CASE WHEN a.n_kept < 64 THEN CAST(a.n_kept AS BIGINT)
                ELSE 270582939648 // a.kth_hash END AS est_distinct,
           e.exact_distinct
    FROM agg a JOIN exact e USING (event_type)
"""

ORACLES["q_quantile_sketch"] = """
    WITH binned AS (
        SELECT least(999, greatest(0,
                   CAST(floor(value / 0.5) AS BIGINT))) AS bin
        FROM events WHERE value IS NOT NULL
    ), counts AS (
        SELECT bin, count(*) AS cnt FROM binned GROUP BY bin
    ), cum AS (
        SELECT bin, cnt,
               sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               sum(cnt) OVER () AS n
        FROM counts
    ), qs AS (
        SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                       CAST(0.99 AS DOUBLE)]) AS q
    )
    SELECT q,
           CAST(min(bin) AS INT) AS bin,
           CAST(0.0 AS DOUBLE) + (min(bin) + 1) * CAST(0.5 AS DOUBLE) AS est,
           CAST(max(n) AS BIGINT) AS n_total
    FROM cum, qs
    WHERE c >= ceil(q * n)
    GROUP BY q
"""

ORACLES["q_kmv_setops"] = """
    WITH u AS (
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS hh,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ina,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS inb
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1
    ), ranked AS (
        SELECT hh, ina, inb, row_number() OVER (ORDER BY hh) AS rn FROM u
    ), kept AS (
        SELECT * FROM ranked WHERE rn <= 64
    ), agg AS (
        SELECT CAST(count(*) AS INT) AS n_kept, max(hh) AS kth_hash,
               CAST(sum(ina * inb) AS BIGINT) AS n_both
        FROM kept
    ), est AS (
        SELECT n_kept, kth_hash, n_both,
               CASE WHEN n_kept < 64 THEN CAST(n_kept AS BIGINT)
                    ELSE 270582939648 // kth_hash END AS union_est
        FROM agg
    ), by_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY user_id
    ), exact AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_union,
               CAST(sum(c * p) AS BIGINT) AS exact_inter
        FROM by_user
    )
    SELECT 64 AS k, n_kept, kth_hash, n_both, union_est,
           (n_both * union_est) // n_kept AS inter_est,
           (1000 * n_both) // n_kept AS jaccard_permille,
           exact_union, exact_inter
    FROM est CROSS JOIN exact
"""

# Count-min grid + probes replayed with the same md5 bucket family.
ORACLES["q_heavy_hitters"] = r"""
    WITH sk AS (
        SELECT i,
               CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                                        || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 256 AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT user_id, unnest(generate_series(0, 3)) AS i FROM events)
        GROUP BY 1, 2
    ), cand AS (
        SELECT DISTINCT user_id FROM events
    ), probes AS (
        SELECT user_id, i,
               CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                                        || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 256 AS bucket
        FROM (SELECT user_id, unnest(generate_series(0, 3)) AS i FROM cand)
    ), est AS (
        SELECT p.user_id, min(coalesce(sk.n, 0)) AS est_n
        FROM probes p
        LEFT JOIN sk ON sk.i = p.i AND sk.bucket = p.bucket
        GROUP BY 1
    ), exact AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n
        FROM events GROUP BY 1
    )
    SELECT est.user_id, est.est_n, exact.exact_n,
           est.est_n - exact.exact_n AS overcount
    FROM est JOIN exact USING (user_id)
"""

# Merged count-carrying KMV sketch replayed hash-for-hash; exact side
# is the plain frequency-product sum.
ORACLES["q_join_size_est"] = """
    WITH ha AS (
        SELECT CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS ca
        FROM lineitem GROUP BY 1
    ), hb AS (
        SELECT CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS cb
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    ), merged AS (
        SELECT coalesce(ha.h, hb.h) AS h,
               coalesce(ha.ca, 0) AS ca,
               coalesce(hb.cb, 0) AS cb
        FROM ha FULL JOIN hb ON ha.h = hb.h
    ), kept AS (
        SELECT h, ca, cb FROM (
            SELECT h, ca, cb, row_number() OVER (ORDER BY h) AS rn FROM merged
        ) WHERE rn <= 128
    ), agg AS (
        SELECT CAST(count(*) AS INT) AS n_kept,
               max(h) AS kth_hash,
               CAST(sum(ca * cb) AS BIGINT) AS sum_ff
        FROM kept
    ), est AS (
        SELECT 128 AS k, n_kept, kth_hash, sum_ff,
               CAST(CASE WHEN n_kept < 128 THEN n_kept
                         ELSE (127 * 4294967296) // kth_hash END
                    AS BIGINT) AS union_est
        FROM agg
    ), fa AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS ca
        FROM lineitem GROUP BY 1
    ), fb AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS cb
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    ), ex AS (
        SELECT CAST(sum(fa.ca * fb.cb) AS BIGINT) AS exact_join
        FROM fa JOIN fb USING (l_partkey)
    )
    SELECT est.k, est.n_kept, est.kth_hash, est.sum_ff, est.union_est,
           (est.union_est // est.n_kept) * est.sum_ff AS join_est,
           ex.exact_join
    FROM est, ex
"""

# Quartile cuts from the histogram sketch, then per-row bucket labels.
ORACLES["q_feature_bins"] = """
    WITH binned AS (
        SELECT least(999, greatest(0,
                   CAST(floor(value / 0.5) AS BIGINT))) AS bin
        FROM events WHERE value IS NOT NULL
    ), counts AS (
        SELECT bin, count(*) AS cnt FROM binned GROUP BY bin
    ), cum AS (
        SELECT bin, cnt,
               sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               sum(cnt) OVER () AS n
        FROM counts
    ), qs AS (
        SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                       CAST(0.75 AS DOUBLE)]) AS q
    ), cuts AS (
        SELECT CAST(0.0 AS DOUBLE) + (min(bin) + 1) * CAST(0.5 AS DOUBLE)
                   AS cut
        FROM cum, qs
        WHERE c >= ceil(q * n)
        GROUP BY q
    )
    SELECT e.event_id, e.value,
           CAST(sum(CASE WHEN e.value >= c.cut THEN 1 ELSE 0 END) AS INT)
               AS bin
    FROM events e CROSS JOIN cuts c
    GROUP BY e.event_id, e.value
"""

ORACLES["q_bloom_prune"] = """
    WITH build AS (
        SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 400000
    ), bloom AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' || i),
                                    1, 8)) AS BIGINT) % 4096 AS pos
        FROM build CROSS JOIN (SELECT unnest(['0', '1', '2']) AS i)
    ), probe AS (
        SELECT l_orderkey, l_returnflag,
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':0'),
                                    1, 8)) AS BIGINT) % 4096 AS p0,
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':1'),
                                    1, 8)) AS BIGINT) % 4096 AS p1,
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':2'),
                                    1, 8)) AS BIGINT) % 4096 AS p2
        FROM lineitem
    ), passed AS (
        SELECT l_orderkey, l_returnflag FROM probe
        WHERE p0 IN (SELECT pos FROM bloom)
          AND p1 IN (SELECT pos FROM bloom)
          AND p2 IN (SELECT pos FROM bloom)
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM build)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(count(*) - sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM build)
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM passed GROUP BY l_returnflag
"""

ORACLES["q_grouped_quantiles"] = """
    WITH binned AS (
        SELECT event_type,
               least(999, greatest(0,
                   CAST(floor(value / 0.5) AS BIGINT))) AS bin
        FROM events WHERE value IS NOT NULL
    ), counts AS (
        SELECT event_type, bin, count(*) AS cnt
        FROM binned GROUP BY event_type, bin
    ), cum AS (
        SELECT event_type, bin, cnt,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM counts
    ), qs AS (
        SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q
    )
    SELECT event_type, q,
           CAST(min(bin) AS INT) AS bin,
           CAST(0.0 AS DOUBLE) + (min(bin) + 1) * CAST(0.5 AS DOUBLE) AS est,
           CAST(max(n) AS BIGINT) AS n_total
    FROM cum, qs
    WHERE c >= ceil(q * n)
    GROUP BY event_type, q
"""

ORACLES["q_percentile_normalize"] = """
    WITH binned AS (
        SELECT event_id, value,
               least(999, greatest(0,
                   CAST(floor(value / 0.5) AS BIGINT))) AS bin
        FROM events WHERE value IS NOT NULL
    ), counts AS (
        SELECT bin, count(*) AS cnt FROM binned GROUP BY bin
    ), hist AS (
        SELECT bin,
               CAST(1000000 * sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               // (sum(cnt) OVER ()) AS BIGINT) AS pct_ppm
        FROM counts
    )
    SELECT b.event_id, b.value, h.pct_ppm
    FROM binned b JOIN hist h USING (bin)
"""

ORACLES["q_iqr_outliers"] = """
    WITH adj AS (
        SELECT event_id,
               value + CASE WHEN event_id % 97 = 0 THEN 5000.0 ELSE 0.0 END
                   AS value_adj
        FROM events WHERE value IS NOT NULL
    ), binned AS (
        SELECT least(8191, greatest(0,
                   CAST(floor(value_adj / 1.0) AS BIGINT))) AS bin
        FROM adj
    ), counts AS (
        SELECT bin, count(*) AS cnt FROM binned GROUP BY bin
    ), cum AS (
        SELECT bin,
               sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               sum(cnt) OVER () AS n
        FROM counts
    ), quart AS (
        SELECT
            (SELECT CAST(0.0 AS DOUBLE) + (min(bin) + 1) * 1.0 FROM cum
             WHERE c >= ceil(0.25 * n)) AS q1,
            (SELECT CAST(0.0 AS DOUBLE) + (min(bin) + 1) * 1.0 FROM cum
             WHERE c >= ceil(0.75 * n)) AS q3
    ), fences AS (
        SELECT q1 - (3 * (q3 - q1)) / 2 AS lo_fence,
               q3 + (3 * (q3 - q1)) / 2 AS hi_fence
        FROM quart
    )
    SELECT a.event_id, a.value_adj, f.lo_fence, f.hi_fence
    FROM adj a CROSS JOIN fences f
    WHERE a.value_adj < f.lo_fence OR a.value_adj > f.hi_fence
"""

ORACLES["q_distribution_drift"] = """
    WITH ha AS (
        SELECT least(999, greatest(0, CAST(floor(value / 0.5) AS BIGINT)))
                   AS bin, count(*) AS ca
        FROM events WHERE event_type = 'click' AND value IS NOT NULL
        GROUP BY 1
    ), hb AS (
        SELECT least(999, greatest(0, CAST(floor(value / 0.5) AS BIGINT)))
                   AS bin, count(*) AS cb
        FROM events WHERE event_type = 'view' AND value IS NOT NULL
        GROUP BY 1
    ), j AS (
        SELECT COALESCE(ha.bin, hb.bin) AS bin,
               COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin
    ), t AS (
        SELECT sum(ca) AS na, sum(cb) AS nb FROM j
    ), d AS (
        SELECT j.bin, abs(j.ca * t.nb - j.cb * t.na) AS absdiff, t.na, t.nb
        FROM j CROSS JOIN t
    ), worst AS (
        SELECT bin FROM d ORDER BY absdiff DESC, bin ASC LIMIT 1
    )
    SELECT CAST(max(d.na) AS BIGINT) AS n_a,
           CAST(max(d.nb) AS BIGINT) AS n_b,
           CAST(sum(d.absdiff) AS BIGINT) AS sum_absdiff,
           CAST(sum(d.absdiff) * 500000 // (max(d.na) * max(d.nb))
                AS BIGINT) AS tvd_ppm,
           CAST(max(w.bin) AS INT) AS worst_bin,
           CAST(max(d.absdiff) AS BIGINT) AS worst_absdiff
    FROM d CROSS JOIN worst w
"""

ORACLES["q_ks_test"] = """
    WITH qa AS (
        SELECT CAST(round(value * 1000) AS BIGINT) AS qv,
               1 AS ca, 0 AS cb
        FROM events WHERE event_type = 'click' AND value IS NOT NULL
    ), qb AS (
        SELECT CAST(round(value * 1000) AS BIGINT) AS qv,
               0 AS ca, 1 AS cb
        FROM events WHERE event_type = 'view' AND value IS NOT NULL
    ), g AS (
        SELECT qv, CAST(sum(ca) AS BIGINT) AS ca,
               CAST(sum(cb) AS BIGINT) AS cb
        FROM (SELECT * FROM qa UNION ALL SELECT * FROM qb)
        GROUP BY qv
    ), n AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n1,
               CAST(sum(cb) AS BIGINT) AS n2
        FROM g
    ), cum AS (
        SELECT qv,
               CAST(sum(ca) OVER (ORDER BY qv) AS BIGINT) AS c1,
               CAST(sum(cb) OVER (ORDER BY qv) AS BIGINT) AS c2
        FROM g
    ), gap AS (
        SELECT cum.qv,
               abs(CAST(cum.c1 AS HUGEINT) * n.n2
                   - CAST(cum.c2 AS HUGEINT) * n.n1) AS d,
               n.n1, n.n2
        FROM cum, n
    )
    SELECT n1, n2, CAST(d AS BIGINT) AS d_num,
           CAST(d * 1000000 // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)
               AS d_ppm,
           qv AS at_qv
    FROM gap ORDER BY d DESC, qv ASC LIMIT 1
"""

ORACLES["q_winsorize"] = """
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ), binned AS (
        SELECT least(1023, greatest(0,
                   CAST(floor((value - 0.0) / 0.5) AS BIGINT))) AS bin,
               count(*) AS cnt
        FROM v GROUP BY 1
    ), cum AS (
        SELECT bin,
               sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c,
               sum(cnt) OVER () AS n
        FROM binned
    ), fence AS (
        SELECT
            (SELECT 0.0 + 0.5 * (min(bin) + 1) FROM cum
              WHERE c >= ceil(0.05 * n)) AS flo,
            (SELECT 0.0 + 0.5 * (min(bin) + 1) FROM cum
              WHERE c >= ceil(0.95 * n)) AS fhi
    ), w AS (
        SELECT event_type, value,
               least(greatest(value, f.flo), f.fhi) AS wz
        FROM v CROSS JOIN fence f
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN value <> wz THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped,
           CAST(sum(CAST(round(wz * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM w GROUP BY 1
"""

ORACLES["q_rolling_quantiles"] = """
    WITH daily AS (
        SELECT event_type AS key, CAST(ts AS DATE) AS d,
               CAST(least(255, greatest(0,
                   CAST(floor((value - 0.0) / 2.0) AS BIGINT))) AS INT)
                   AS bin,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2, 3
    ), served AS (
        SELECT key, bin, cnt, d + CAST(g.i AS INT) AS day
        FROM daily CROSS JOIN LATERAL (
            SELECT unnest(generate_series(0, 6)) AS i
        ) g
    ), wnd AS (
        SELECT key, day, bin, sum(cnt) AS cnt
        FROM served GROUP BY 1, 2, 3
    ), cum AS (
        SELECT key, day, bin, cnt,
               sum(cnt) OVER (PARTITION BY key, day ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS c,
               sum(cnt) OVER (PARTITION BY key, day) AS n
        FROM wnd
    ), qv(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.95 AS DOUBLE)))
    SELECT key, day, q,
           CAST(0.0 + 2.0 * (min(bin) + 1) AS DOUBLE) AS est,
           CAST(max(n) AS BIGINT) AS n_total
    FROM cum JOIN qv ON c >= ceil(q * n)
    GROUP BY 1, 2, 3
"""



def q_cm_error(spark, sf_dir):
    """Count-min accuracy eval (functions/sketch.py cm_error_eval): a
    deliberately tight 64x2 grid over user_id forces real collisions,
    and every distinct user surfaces (true, estimate, overcount >= 0)
    — the measured-error sizing companion to q_heavy_hitters' serving
    path (the q_minhash_error discipline applied to CM). Oracle
    replays the md5 bucket family, the grid, and the min-probe."""
    from salesforce_plugin_spark.functions.sketch import cm_error_eval

    e = load_table(spark, sf_dir, "events")
    return cm_error_eval(e, "user_id", width=64, depth=2)

ORACLES["q_cm_error"] = """
    WITH sk AS (
        SELECT i,
               CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                                        || CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 64 AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT user_id, unnest(generate_series(0, 1)) AS i FROM events)
        GROUP BY 1, 2
    ), exact AS (
        SELECT user_id AS value, CAST(count(*) AS BIGINT) AS true_n
        FROM events GROUP BY 1
    ), probes AS (
        SELECT value, i,
               CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                                        || CAST(value AS VARCHAR)), 1, 8))
                    AS BIGINT) % 64 AS bucket
        FROM (SELECT value, unnest(generate_series(0, 1)) AS i
              FROM (SELECT DISTINCT value FROM exact))
    ), est AS (
        SELECT p.value, CAST(min(coalesce(sk.n, 0)) AS BIGINT) AS est_n
        FROM probes p
        LEFT JOIN sk ON sk.i = p.i AND sk.bucket = p.bucket
        GROUP BY 1
    )
    SELECT e.value, e.true_n, s.est_n,
           CAST(s.est_n - e.true_n AS BIGINT) AS overcount
    FROM exact e JOIN est s USING (value)
"""


def q_hll(spark, sf_dir):
    """Portable-HLL cardinality eval (functions/sketch.py
    hll_error_eval): per event_type, the m=64 register HLL estimate of
    distinct users vs the exact count, with signed error — the
    cardinality complement to q_cm_error / q_minhash_error (every
    sketch in the library ships with its own measured-error harness).
    The registers are md5-derived and the estimator is pure integer
    (linear-counting correction included via the pinned 64-entry
    LN64_TABLE_PPM), so the whole artifact sits under the hash gate.
    Register state is ≤ 64 rows per group regardless of input size —
    the property that makes the sketch the 100 TB answer while the
    exact side stays affordable only at eval scale."""
    from salesforce_plugin_spark.functions.sketch import hll_error_eval

    ev = load_table(spark, sf_dir, "events")
    return hll_error_eval(ev, "event_type", "user_id")


def _hll_oracle() -> str:
    from salesforce_plugin_spark.functions.sketch import LN64_TABLE_PPM

    tab = "[" + ", ".join(str(x) for x in LN64_TABLE_PPM) + "]"
    return f"""
    WITH h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM events
    ), regs AS (
        SELECT event_type, hv % 64 AS bucket,
               max(CASE WHEN hv // 64 = 0 THEN 55
                        ELSE 55 - length(bin(hv // 64)) END) AS m_j
        FROM h GROUP BY 1, 2
    ), grp AS (
        SELECT event_type,
               SUM(CAST((CAST(1 AS BIGINT) << (55 - m_j)) AS HUGEINT) * 512)
                   AS s_present,
               count(*) AS n_regs
        FROM regs GROUP BY 1
    ), est0 AS (
        SELECT event_type,
               CAST(2905456640 AS HUGEINT) * 36028797018963968 * 512
                 // ((s_present
                      + CAST(64 - n_regs AS HUGEINT)
                        * 36028797018963968 * 512) * 1000000) AS raw,
               64 - n_regs AS v
        FROM grp
    ), est AS (
        SELECT event_type,
               CAST(CASE WHEN v > 0 AND raw <= 160
                    THEN (64 * list_extract({tab}, CAST(v AS INT)))
                         // 1000000
                    ELSE raw END AS BIGINT) AS est_distinct
        FROM est0
    ), exact AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS true_distinct
        FROM events GROUP BY 1
    )
    SELECT e.event_type, e.true_distinct, s.est_distinct,
           CAST(s.est_distinct - e.true_distinct AS BIGINT) AS err
    FROM exact e JOIN est s USING (event_type)
"""


ORACLES["q_hll"] = _hll_oracle()


def q_quantile_error(spark, sf_dir):
    """Quantile-sketch accuracy eval (functions/sketch.py
    quantile_error_eval): the binned p50/p90/p99 estimate vs the EXACT
    ceil-rank order statistic, both in integer millis, signed error —
    the q_cm_error / q_hll / q_minhash_error discipline applied to the
    quantile sketch, so n_bins is sized from measured error instead of
    the one-bin-width worst case. The exact side is one global
    rank pass — the cost the histogram avoids at 100 TB, affordable
    here because this is the eval."""
    from salesforce_plugin_spark.functions.sketch import quantile_error_eval

    e = load_table(spark, sf_dir, "events")
    return quantile_error_eval(
        e, "value", [0.5, 0.9, 0.99], 0.0, 500.0, 1000
    )


ORACLES["q_quantile_error"] = """
    WITH binned AS (
        SELECT least(999, greatest(0,
                   CAST(floor(value / 0.5) AS BIGINT))) AS bin
        FROM events WHERE value IS NOT NULL
    ), counts AS (
        SELECT bin, count(*) AS cnt FROM binned GROUP BY bin
    ), cum AS (
        SELECT bin, cnt,
               sum(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               sum(cnt) OVER () AS n
        FROM counts
    ), qs AS (
        SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                       CAST(0.99 AS DOUBLE)]) AS q
    ), est AS (
        SELECT q,
               CAST(round((CAST(0.0 AS DOUBLE)
                    + (min(bin) + 1) * CAST(0.5 AS DOUBLE)) * 1000)
                    AS BIGINT) AS est_milli
        FROM cum, qs
        WHERE c >= ceil(q * n)
        GROUP BY q
    ), vals AS (
        SELECT CAST(round(CAST(value AS DOUBLE) * 1000) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ), ranked AS (
        SELECT v, row_number() OVER (ORDER BY v) AS rk,
               count(*) OVER () AS n
        FROM vals
    ), exact AS (
        SELECT q, v AS true_milli
        FROM ranked JOIN qs ON rk = CAST(ceil(q * n) AS BIGINT)
    )
    SELECT e.q, e.est_milli, x.true_milli,
           CAST(e.est_milli - x.true_milli AS BIGINT) AS err_milli
    FROM est e JOIN exact x USING (q)
"""
