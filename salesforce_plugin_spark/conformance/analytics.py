"""Time-series / statistical analytics: sessions, funnels, retention, CUSUM, Fano, lead-lag, seasonality.

Split from the single-file conformance registry in round 6; byte-identical
query builders and oracle SQL. The ordered public registry lives in
``salesforce_plugin_spark.conformance`` (the package __init__).
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import *  # noqa: F401,F403


def q_user_growth(spark, sf_dir):
    """Daily acquisition curve: first-activity day per user → new-user
    counts per day → running cumulative total. The growth-accounting
    companion to q_retention (same first-activity primitive). Scale
    shape: one exchange on user_id for the min-day aggregate (map-side
    partial), one day-level aggregate, and the cumulative window runs
    over the day-bounded aggregate — ≤ days rows, like
    binned_quantiles' cumsum, never the event log."""
    from salesforce_plugin_spark.operators.analytics import user_growth

    e = load_table(spark, sf_dir, "events")
    return user_growth(e, "user_id", "ts")


def q_anomaly_zscore(spark, sf_dir):
    """Exact-arithmetic outlier flagging: a z-score gate (|x-μ| > 3σ per
    event_type) decided ENTIRELY in integers — values quantized to scaled
    longs, and the threshold test cross-multiplied to
    ``(n·x - s)² > 9·(n·Σx² - s²)`` so no engine ever divides or takes a
    square root at the decision boundary (a float z-score's last ulp
    could flip a borderline row in one engine and not the other; this is
    the same no-transcendentals discipline as bigram_fluency /
    gopher_quality). Bounds: exact while n·Σq² < 2^63 — at larger scale
    lower the quantization. Plan: one map-side-combined stats aggregate
    (≤ |event_type| rows), runtime-broadcast back over one scan."""
    from salesforce_plugin_spark.operators.analytics import zscore_outliers

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    # |z| > 3/2: the fixture's values are uniform (|z| caps at √3 ≈
    # 1.73), so 1.5σ is the operating point that genuinely fires (~8%)
    return zscore_outliers(
        e, "value", ["event_type"], k_num=3, k_den=2
    ).select("event_id", "event_type", "value", "is_anomaly")


def q_funnel(spark, sf_dir):
    """Event-sequence analytics: ordered funnel view → click → purchase
    per user (operators/analytics.py). Stage k's time is the earliest
    qualifying event at-or-after stage k-1 (conditional min, so a user
    whose clicks all precede their first view surfaces with NULL rather
    than vanishing). Every exchange is keyed on user_id — one hash
    partitioning reused down the whole chain."""
    from salesforce_plugin_spark.operators.analytics import funnel

    e = load_table(spark, sf_dir, "events")
    f_ = funnel(e, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    return f_.select(
        "user_id",
        F.unix_micros(F.col("t_view")).alias("t_view_us"),
        F.unix_micros(F.col("t_click")).alias("t_click_us"),
        F.unix_micros(F.col("t_purchase")).alias("t_purchase_us"),
        "depth",
    )


def q_retention(spark, sf_dir):
    """Cohort retention: users bucketed by first-activity day, exact
    distinct-user counts per (cohort, day-offset) cell
    (operators/analytics.py). First-activity and the activity join share
    the user_id partitioning; the final aggregate is bounded by
    cohorts × offsets, never event volume."""
    from salesforce_plugin_spark.operators.analytics import cohort_retention

    e = load_table(spark, sf_dir, "events")
    r = cohort_retention(e, "user_id", "ts", period="day")
    return r.select(
        F.date_format(F.col("cohort"), "yyyy-MM-dd").alias("cohort_day"),
        "period_offset",
        "n_users",
    )


def q_session_paths(spark, sf_dir):
    """Behavioral sequence analytics (operators/analytics.py
    session_transitions): event-type transition counts WITHIN 10-minute-
    gap sessions — the session boundary resets the lag, so a pair
    spanning two sessions never counts (the distinction a naive per-user
    lag gets wrong). Sessionization is the lag+cumsum construction with
    an exact integer-micros gap test; the final aggregate is bounded by
    |event types|²."""
    from salesforce_plugin_spark.operators.analytics import session_transitions

    e = load_table(spark, sf_dir, "events")
    return session_transitions(
        e, "user_id", "ts", "event_type", gap_minutes=10,
        tiebreak_cols=["event_id"],
    )


def q_itemcf(spark, sf_dir):
    """Item-item collaborative filtering (operators/analytics.py
    item_similarity): each part's top-5 co-purchase neighbors by EXACT
    binary-cosine c_ij/√(c_i·c_j) — support from the q_copurchase pair
    space, norms are basket counts, the score rides the shared
    corrected-isqrt cosine (with_exact_cos_ppm), top-k under a total
    order. The "bought X also bought Y" recommender as pure DataFrame
    ops."""
    from salesforce_plugin_spark.operators.analytics import item_similarity

    li = load_table(spark, sf_dir, "lineitem")
    return item_similarity(
        li, "l_orderkey", "l_partkey", min_support=2, top_k=5
    )


def q_copurchase(spark, sf_dir):
    """Market-basket mining (operators/analytics.py copurchase_pairs):
    support counts for unordered part pairs co-occurring in an order —
    the Apriori support-counting core, and the edge-builder for
    co-occurrence graphs. One distinct pass on (basket, item), one
    co-partitioned self-equijoin on the basket key with a < b halving
    the pair space, one partial-combined pair count; per-basket cost is
    C(basket_size, 2) (≤ C(13,2) in these fixtures). 3445 pairs reach
    support ≥ 2 at sf0.01."""
    from salesforce_plugin_spark.operators.analytics import copurchase_pairs

    li = load_table(spark, sf_dir, "lineitem")
    return copurchase_pairs(li, "l_orderkey", "l_partkey", min_support=2)


def q_resample_ffill(spark, sf_dir):
    """Time-series regularization (operators/timeseries.py
    resample_daily_ffill): each user's irregular event stream lands on a
    daily calendar spine from first to last activity — missing days
    become explicit rows (n_obs = 0) carrying the last observation
    forward. The per-day election is deterministic ((ts, event_id)
    order); observations are quantized to scaled longs BEFORE the
    election so the filled value is exact cross-engine. Spine explode is
    calendar-bounded per key, never event-bounded; the day aggregate
    runs before the spine join so the fill window sees key×days rows."""
    from salesforce_plugin_spark.operators.timeseries import resample_daily_ffill

    ev = load_table(spark, sf_dir, "events")
    return resample_daily_ffill(
        ev,
        "user_id",
        "ts",
        F.round(F.col("value") * 1000, 0),
        order_cols=["event_id"],
    )


def q_rolling_metrics(spark, sf_dir):
    """Trailing 7-day rolling metrics (operators/timeseries.py
    rolling_daily_metrics): day-level pre-aggregation first (exact
    BIGINT sums of scaled-long values), then ONE epoch-day range window
    — window state is day rows, not events, and both keyed stages share
    the user partitioning."""
    from salesforce_plugin_spark.operators.timeseries import (
        rolling_daily_metrics,
    )

    ev = load_table(spark, sf_dir, "events")
    return rolling_daily_metrics(
        ev, "user_id", "ts", F.round(F.col("value") * 1000, 0), window_days=7
    )


def q_key_skew(spark, sf_dir):
    """Key-distribution profiling (operators/analytics.py key_skew): the
    10 hottest events.user_id values with exact counts, parts-per-
    million share, and an integer hotness-vs-uniform ratio — the
    measurement a 100 TB shuffle plan runs BEFORE choosing salting /
    AQE skew splits / broadcast. One map-side-combined key aggregate, a
    broadcast 1-row stat join, a top-n election; integer floor divides
    keep it engine-replayable."""
    from salesforce_plugin_spark.operators.analytics import key_skew

    e = load_table(spark, sf_dir, "events")
    return oracle_cross_check(
        key_skew(e, "user_id", top_n=10), "q_key_skew", sf_dir
    )


def q_class_balance(spark, sf_dir):
    """Label-distribution sensing (operators/analytics.py
    class_balance): per-(lang, source) counts, ppm shares, and the
    exact-integer Gini impurity — the imbalance measurement before
    choosing mixture weights. Rational in the counts (no log/float), so
    it hash-gates; one bounded label aggregate + a 1-row broadcast."""
    from salesforce_plugin_spark.operators.analytics import class_balance

    d = load_table(spark, sf_dir, "documents").select(
        F.concat_ws("/", "lang", "source").alias("cell")
    )
    return class_balance(d, "cell")


def q_date_dimension(spark, sf_dir):
    """Conformed calendar dimension (operators/timeseries.py
    date_dimension): one row per day of 2023-2024 with calendar + ISO +
    fiscal attributes (fiscal-year start month 4, the same Salesforce
    convention as the SOQL FISCAL_* functions) — generated by one
    sequence() explode with no source scan, sized to broadcast against
    any fact. Every attribute is integer date arithmetic, replayed
    exactly by the oracle's generate_series."""
    from salesforce_plugin_spark.operators.timeseries import date_dimension

    return date_dimension(
        spark, "2023-01-01", "2024-12-31", fiscal_start_month=4
    )


def q_debounce(spark, sf_dir):
    """Burst suppression (operators/timeseries.py debounce): per-user
    events within 10 minutes of the previous event collapse to the
    burst's first row — time-proximity dedup for at-least-once
    delivery, one exchange + lag window + map-side filter. Exact
    integer-microsecond boundary; event_id tiebreak."""
    from salesforce_plugin_spark.operators.timeseries import debounce

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    out = debounce(e, ["user_id"], "ts", 600, tiebreak_cols=["event_id"])
    return out.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )


def q_throttle(spark, sf_dir):
    """Hot-key rate limiting (operators/timeseries.py
    throttle_per_window): at most 3 earliest events per user per day —
    the ingest-shaping guard against bot keys skewing every downstream
    shuffle. Exact integer tumbling-window assignment; one key
    exchange; event_id tiebreak."""
    from salesforce_plugin_spark.operators.timeseries import throttle_per_window

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    out = throttle_per_window(
        e, ["user_id"], "ts", 86_400, 3, tiebreak_cols=["event_id"]
    )
    return out.select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))


def q_disorder(spark, sf_dir):
    """Event-time disorder audit (operators/timeseries.py
    disorder_stats): per user, how far event time runs backwards when
    events are replayed in event_id (arrival) order — n_regressions
    and the max lateness in exact integer micros, i.e. the watermark
    delay that would have captured everything. One key exchange +
    a running-max window."""
    from salesforce_plugin_spark.operators.timeseries import disorder_stats

    e = load_table(spark, sf_dir, "events")
    return disorder_stats(e, ["user_id"], "event_id", "ts")


def q_contribution(spark, sf_dir):
    """Metric-change decomposition (operators/analytics.py
    contribution_analysis): which order priorities drove the 1995 →
    1996 revenue change — per-segment cents in both years, signed
    delta, and exact-integer share of the total move in ppm (negative
    when a segment moved against the total). One conditional-sum
    aggregate + a 1-row total broadcast."""
    from salesforce_plugin_spark.operators.analytics import contribution_analysis

    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return contribution_analysis(
        o, "yr", ["o_orderpriority"], "cents", 1995, 1996
    )


def q_attribution(spark, sf_dir):
    """Linear multi-touch attribution (operators/analytics.py
    linear_attribution): each purchase's credit split equally in exact
    integer ppm across the user's clicks/views in the preceding 24h,
    remainder to the last touch so credit sums to exactly 10^6 per
    conversion. One user equi-join + integer-microsecond window filter
    + one count window."""
    from salesforce_plugin_spark.operators.analytics import linear_attribution

    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase")
    touch = e.filter(F.col("event_type").isin("click", "view"))
    return linear_attribution(
        conv, touch, "user_id", "event_id", "event_id", "ts", "ts", 86_400
    )


def q_activity_bitmap(spark, sf_dir):
    """Engagement-feature bitmaps (operators/analytics.py
    activity_bitmap): per user, a 30-day activity bitmap anchored at
    the fixtures' last event day (bit i = active i days before
    2024-01-30), its popcount, and days-since-last via an integer
    trailing-zero count — the churn/recency feature block as ONE
    map-side-combined bit_or aggregate, no collection types, exact
    integers end to end."""
    from salesforce_plugin_spark.operators.analytics import activity_bitmap

    e = load_table(spark, sf_dir, "events")
    return activity_bitmap(e, ["user_id"], "ts", "2024-01-30", n_days=30)


def q_attribution_first(spark, sf_dir):
    """First-touch attribution (linear_attribution model='first_touch'):
    the oldest in-window touch takes the full 10^6 credit, other
    in-window touches report 0 so the touch set stays auditable — the
    same single-join single-window plan as the linear model with only
    the credit expression switched."""
    from salesforce_plugin_spark.operators.analytics import linear_attribution

    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase")
    touch = e.filter(F.col("event_type").isin("click", "view"))
    return linear_attribution(
        conv, touch, "user_id", "event_id", "event_id", "ts", "ts",
        86_400, model="first_touch",
    )


def q_attribution_last(spark, sf_dir):
    """Last-touch attribution (linear_attribution model='last_touch'):
    the newest in-window touch takes the full 10^6 credit — completes
    the three standard credit models on the one shared plan (the oracle
    differs from q_attribution_first only in the rn condition, exactly
    as the Spark side differs only in the credit expression)."""
    from salesforce_plugin_spark.operators.analytics import linear_attribution

    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase")
    touch = e.filter(F.col("event_type").isin("click", "view"))
    return linear_attribution(
        conv, touch, "user_id", "event_id", "event_id", "ts", "ts",
        86_400, model="last_touch",
    )


def q_decayed_score(spark, sf_dir):
    """Recency-weighted engagement (operators/analytics.py
    decayed_score): per user, event values (cents) weighted by exact
    power-of-two step decay — bit shifts, one BIGINT sum, one bounded
    exchange; the float e^-lambda form compounds rounding per event and
    could never hash-gate. Anchor 2024-01-30, 30-day horizon, 2-day
    half-life."""
    from salesforce_plugin_spark.operators.analytics import decayed_score

    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("value").isNotNull()).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    return decayed_score(
        base, ["user_id"], "ts", "v", "2024-01-30",
        horizon_days=30, half_life_days=2,
    )


def q_rolling_wau(spark, sf_dir):
    """Exact trailing-7-day distinct users per day (operators/
    analytics.py rolling_distinct): the rolling-DISTINCT range windows
    cannot express and HLL only estimates — collapse to distinct
    (user, day) FIRST, explode each into its <= 7 report days, dedup,
    count. Three exchanges all bounded by users x days, never event
    volume."""
    from salesforce_plugin_spark.operators.analytics import rolling_distinct

    e = load_table(spark, sf_dir, "events")
    return rolling_distinct(e, "user_id", "ts", window_days=7)


def q_trajectories(spark, sf_dir):
    """Behavioral sequence extraction (operators/analytics.py
    session_trajectories): every 10-minute-gap session serialized to
    its ordered event-type trajectory string — the event-log →
    training-text step. Collection types live only INSIDE the plan
    (array_sort over a session-bounded collect_list, the D9 child-
    nesting contract); event_id tiebreaks make the order total. The
    oracle is string_agg(... ORDER BY us, event_id) over the identical
    lag+cumsum sessionization."""
    from salesforce_plugin_spark.operators.analytics import (
        session_trajectories,
    )

    e = load_table(spark, sf_dir, "events")
    return session_trajectories(
        e, "user_id", "ts", "event_type", gap_minutes=10,
        tiebreak_cols=["event_id"],
    )


def q_weighted_median(spark, sf_dir):
    """Exact weighted median (operators/analytics.py weighted_median):
    per return flag, the median extended price in cents weighted by
    quantity — weights collapse onto distinct (group, value) rows
    before the cumulative window (a hot repeated value costs one row),
    2*cum >= total decided in integers. The exact complement of the
    sketch quantiles."""
    from salesforce_plugin_spark.operators.analytics import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return weighted_median(base, ["l_returnflag"], "price_cents", "qty")


def q_bootstrap(spark, sf_dir):
    """Deterministic Poisson bootstrap (operators/analytics.py
    poisson_bootstrap): 16 resampling replicates of the mean event
    value, each row's per-replicate weight a pure integer function of
    (event_id, b) — portable 32-bit hash vs the fixed scaled-CDF
    literals (POISSON1_THRESHOLDS) — so the distributed bootstrap is
    bit-reproducible with no RNG state and no global resample. Exact
    BIGINT (n_eff, sum_w, sum_wy) per replicate; the CI percentiles
    are float work downstream."""
    from salesforce_plugin_spark.operators.analytics import poisson_bootstrap

    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("value").isNotNull()).select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    )
    return poisson_bootstrap(base, "event_id", "y", replicates=16)


def q_changepoint(spark, sf_dir):
    """Offline changepoint detection (operators/timeseries.py
    changepoint_binary): per event type, the binary-segmentation split
    of the daily-count series maximizing the two-mean SSE reduction —
    the batch companion to q_cusum's online alarm (find WHERE the level
    shifted, after the fact). Exact-rational gain on the common
    denominator n·n_L·n_R in DECIMAL(38,0), floor-scaled once; argmax
    ties break to the earliest split, so the winner replays
    cross-engine."""
    from salesforce_plugin_spark.operators.timeseries import (
        changepoint_binary,
    )

    e = load_table(spark, sf_dir, "events")
    return changepoint_binary(e, ["event_type"], "ts")


def q_cusum(spark, sf_dir):
    """Per-user CUSUM drift alarms (operators/timeseries.py
    cusum_alarms): the sequential clamp recursion S_t = max(0, S_{t-1}
    + x_t - target - slack) rewritten as cumsum-minus-running-min —
    ONE user exchange + one in-partition sort feeding both running
    aggregates, exact integers (value in cents) end to end. event_id
    tiebreaks make the window order total so tied (ts, value) rows
    cannot produce engine-ambiguous intermediate sums."""
    from salesforce_plugin_spark.operators.timeseries import cusum_alarms

    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("value").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    return oracle_cross_check(cusum_alarms(
        base,
        ["user_id"],
        "ts",
        "v",
        target=5000,
        slack=500,
        threshold=50000,
        tiebreak_cols=["event_id"],
    ), "q_cusum", sf_dir)


def q_user_features(spark, sf_dir):
    """Feature-store assembly capstone: one row per user joining the
    engagement bitmap block (activity_bitmap), the exact-integer value
    trend (group_trend), activity counts, and the first-seen cohort day
    — the churn-model feature table, EVERY stage keyed on user_id so
    the four aggregates and the three joins share one hash
    partitioning (no re-exchange between stages; AQE broadcasts the
    bounded sides at bench scale). Mirrors the curation/star-load/
    quality-gate capstone discipline for the ML-features surface."""
    from salesforce_plugin_spark.operators.analytics import (
        activity_bitmap,
        group_trend,
    )

    e = load_table(spark, sf_dir, "events")
    bm = activity_bitmap(e, ["user_id"], "ts", "2024-01-30", n_days=30)
    base = e.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "x"
        ),
        F.round(F.col("value") * 1000, 0).cast("long").alias("y"),
    )
    tr = group_trend(base, ["user_id"], "x", "y").select(
        "user_id", "slope_num", "den"
    )
    counts = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("long").alias("n_purchases"),
        F.min(F.to_date("ts")).alias("first_day"),
    )
    return (
        counts.join(bm, "user_id", "left")
        .join(tr, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "first_day",
            "bitmap",
            "n_active_days",
            "days_since_last",
            "slope_num",
            "den",
        )
    )


def q_rank_corr(spark, sf_dir):
    """Tie-correct Spearman correlation (operators/analytics.py
    rank_correlation): per user, does value drift with time —
    Pearson over doubled average ranks (exact integers even under the
    heavy day-level ties), num/dx/dy exact BIGINTs, rho the one
    surface float. One user exchange feeds both rank windows."""
    from salesforce_plugin_spark.operators.analytics import rank_correlation

    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "x"
        ),
        F.round(F.col("value") * 1000, 0).cast("long").alias("y"),
    )
    return rank_correlation(base, ["user_id"], "x", "y")


def q_trend(spark, sf_dir):
    """Per-segment OLS trend (operators/analytics.py group_trend): each
    user's value-vs-day fitted line as exact integer rationals
    (slope_num, icept_num, den) over the five BIGINT sufficient
    statistics — one map-side-combined exchange bounded by |users|; no
    divide enters the gate. x = day index from 2024-01-01, y = value
    quantized to thousandths (the zscore_outliers pre-quantization
    contract)."""
    from salesforce_plugin_spark.operators.analytics import group_trend

    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "x"
        ),
        F.round(F.col("value") * 1000, 0).cast("long").alias("y"),
    )
    return group_trend(base, ["user_id"], "x", "y")


def q_target_encoding(spark, sf_dir):
    """Categorical feature encoding (operators/analytics.py
    target_encoding): smoothed + leave-one-out target-mean encoding of
    event_type against cent-quantized values, every step an exact
    BIGINT sum or integer floor divide — the high-cardinality encoder
    (one-hot explodes) in engine-reproducible form. One group aggregate
    + a 1-row broadcast prior + one dimension-sized join-back."""
    from salesforce_plugin_spark.operators.analytics import target_encoding

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return target_encoding(
        e, "event_type", "cents", smoothing=20, scale=10_000
    ).select("event_id", "event_type", "y", "enc", "enc_loo")


def q_markov(spark, sf_dir):
    """First-order Markov behavior model (operators/analytics.py
    transition_probabilities): q_session_paths' session-scoped
    transition counts normalized to integer-ppm conditional
    probabilities P(next|prev) with a total-order rank per source state
    — the next-event-prediction table. The normalizer window runs over
    the |types|^2-bounded count table, not the event log."""
    from salesforce_plugin_spark.operators.analytics import (
        transition_probabilities,
    )

    e = load_table(spark, sf_dir, "events")
    return transition_probabilities(
        e, "user_id", "ts", "event_type", gap_minutes=10,
        tiebreak_cols=["event_id"],
    )


def q_interarrival(spark, sf_dir):
    """Streaming capacity / watermark measurement (operators/
    timeseries.py interarrival_stats): per-user inter-arrival gap stats
    in exact integer micros — n/min/max/floor-mean plus max-to-mean
    burstiness — the forward-time companion of q_disorder. One user
    exchange feeds the lag window and the aggregate."""
    from salesforce_plugin_spark.operators.timeseries import (
        interarrival_stats,
    )

    e = load_table(spark, sf_dir, "events")
    return interarrival_stats(
        e, ["user_id"], "ts", tiebreak_cols=["event_id"]
    )


def q_minmax_scale(spark, sf_dir):
    """Feature scaling (operators/analytics.py minmax_scale): per-type
    min-max normalization of cent-quantized values to exact integer ppm
    — no float at the boundary (complements percentile_normalize's rank
    scaling and winsorize's clamping). One |groups|-row aggregate +
    un-hinted join-back."""
    from salesforce_plugin_spark.operators.analytics import minmax_scale

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return minmax_scale(e, "event_type", "cents").select(
        "event_id", "event_type", "y", "scaled_ppm"
    )


def q_funnel_latency(spark, sf_dir):
    """Time-to-convert (operators/analytics.py funnel_latency): per
    adjacent funnel transition, converted-user count + EXACT median
    latency in integer micros — funnel() composed with the
    weighted_median election, so the whole summary hash-gates. Output
    is |stages−1| rows."""
    from salesforce_plugin_spark.operators.analytics import funnel_latency

    e = load_table(spark, sf_dir, "events")
    return funnel_latency(
        e, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


def q_mad_outliers(spark, sf_dir):
    """Robust outliers (operators/analytics.py mad_outliers): flag
    |y − median| · k_den > k_num · MAD per event type over
    cent-quantized values — the 50%-breakdown-point complement of
    q_anomaly_zscore (mean/σ masks under contamination) and
    q_iqr_outliers (sketch fences; this is EXACT). Both medians are
    the integer 2·cum ≥ total election; the threshold is a
    cross-multiplication — no divide, no float."""
    from salesforce_plugin_spark.operators.analytics import mad_outliers

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return mad_outliers(e, "event_type", "cents", k_num=3, k_den=1).select(
        "event_id", "event_type", "y", "med", "mad", "is_outlier"
    )


def q_rank_movers(spark, sf_dir):
    """Top-movers report (operators/analytics.py rank_movers): each
    user's revenue rank in the first half of January vs the rest, with
    the signed position delta — POSITION change robust to overall
    growth (complementing q_contribution's metric decomposition).
    Total-ordered ranks; single-period users carry NULLs."""
    from salesforce_plugin_spark.operators.analytics import rank_movers

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "A"
        )
        .otherwise("B")
        .alias("half"),
    )
    return rank_movers(e, "user_id", "cents", "half", "A", "B")


def q_leadlag(spark, sf_dir):
    """Lead-lag diagnostic (operators/analytics.py
    leadlag_correlation): exact BIGINT dot products of the view and
    purchase daily-count series at lags −3..3 — which metric leads
    which, ranked exactly (Pearson normalization is presentation, kept
    outside the gate). Everything after the daily collapse is bounded
    by days × lags."""
    from salesforce_plugin_spark.operators.analytics import (
        leadlag_correlation,
    )

    e = load_table(spark, sf_dir, "events")
    return leadlag_correlation(e, "ts", "event_type", "view", "purchase", 3)


def q_fano(spark, sf_dir):
    """Burstiness sensing (operators/analytics.py fano_factor):
    variance-to-mean of daily event counts per user as the exact
    integer (n·Σc² − total²)·1000 div (n·total) — ≈1000 Poisson-like,
    ≫1000 bursty; the overdispersion companion of q_interarrival's
    max-to-mean ratio. Quadratics in DECIMAL(38,0)."""
    from salesforce_plugin_spark.operators.analytics import fano_factor

    e = load_table(spark, sf_dir, "events")
    return fano_factor(e, ["user_id"], "ts")


def q_dow_profile(spark, sf_dir):
    """Seasonality sensing (operators/timeseries.py dow_profile):
    per-event-type day-of-week counts + exact integer-ppm shares
    (ISO 1=Monday..7=Sunday normalized explicitly — weekday numbering
    is a classic cross-engine trap). (key, dow)-bounded aggregate."""
    from salesforce_plugin_spark.operators.timeseries import dow_profile

    e = load_table(spark, sf_dir, "events")
    return dow_profile(e, ["event_type"], "ts")


def q_coverage_gaps(spark, sf_dir):
    """Feed-completeness audit (operators/timeseries.py coverage_gaps):
    per-user active days, span, and missing days inside the span — the
    detector whose repair is q_resample_ffill (a feed that silently
    skipped days poisons every rolling window downstream). One
    (key, day)-distinct aggregate."""
    from salesforce_plugin_spark.operators.timeseries import coverage_gaps

    e = load_table(spark, sf_dir, "events")
    return coverage_gaps(e, ["user_id"], "ts")


def q_seasonal_anomaly(spark, sf_dir):
    """Seasonality-aware anomaly days (operators/timeseries.py
    seasonal_anomaly_days): each (type, day) count vs the type's
    SAME-WEEKDAY baseline — quiet Sundays never false-alarm against
    Monday averages — spike/dip via cross-multiplied integer ratio
    thresholds (3/2 and 1/2), no divide/float at the boundary.
    Composes q_dow_profile's structure with the zscore discipline."""
    from salesforce_plugin_spark.operators.timeseries import (
        seasonal_anomaly_days,
    )

    e = load_table(spark, sf_dir, "events")
    return seasonal_anomaly_days(e, ["event_type"], "ts")



ORACLES: dict[str, str] = {}

ORACLES["q_funnel"] = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT s1.user_id, s1.t1,
               min(e.ts) FILTER (WHERE e.ts >= s1.t1) AS t2
        FROM s1
        LEFT JOIN events e
          ON e.user_id = s1.user_id AND e.event_type = 'click'
        GROUP BY s1.user_id, s1.t1
    ), s3 AS (
        SELECT s2.user_id, s2.t1, s2.t2,
               min(e.ts) FILTER (WHERE e.ts >= s2.t2) AS t3
        FROM s2
        LEFT JOIN events e
          ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        GROUP BY s2.user_id, s2.t1, s2.t2
    )
    SELECT user_id,
           epoch_us(t1) AS t_view_us,
           epoch_us(t2) AS t_click_us,
           epoch_us(t3) AS t_purchase_us,
           CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
                + (t3 IS NOT NULL)::INT AS INT) AS depth
    FROM s3
"""

ORACLES["q_retention"] = """
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS p
        FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort, a.p) AS INT) AS period_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM firsts f JOIN active a USING (user_id)
    GROUP BY 1, 2
"""

ORACLES["q_session_paths"] = """
    WITH ord AS (
        SELECT user_id, event_id, event_type, ts,
               lag(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, event_id, event_type, ts,
               sum(CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 600000000
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM ord
    ), tr AS (
        SELECT event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id, sid ORDER BY ts, event_id
               ) AS prev_type
        FROM sess
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM tr WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
"""

ORACLES["q_user_growth"] = """
    WITH f AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1
    ), nu AS (
        SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY day
    ), act AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        FROM events GROUP BY 1
    ), d AS (
        SELECT act.day, act.active_users,
               CAST(coalesce(nu.new_users, 0) AS BIGINT) AS new_users
        FROM act LEFT JOIN nu USING (day)
    )
    SELECT day, active_users, new_users,
           CAST(sum(new_users) OVER (
               ORDER BY day ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_users
    FROM d
"""

ORACLES["q_anomaly_zscore"] = """
    WITH q AS (
        SELECT event_id, event_type, value,
               CAST(round(value * 100) AS BIGINT) AS qv
        FROM events
    ), st AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(qv) AS HUGEINT) AS s,
               sum(CAST(qv AS HUGEINT) * qv) AS q2
        FROM q GROUP BY event_type
    )
    SELECT q.event_id, q.event_type, q.value,
           (2 * (st.n * q.qv - st.s)) * (2 * (st.n * q.qv - st.s))
               > 9 * (st.n * st.q2 - st.s * st.s) AS is_anomaly
    FROM q JOIN st USING (event_type)
"""

# Basket self-join support counts, replayed verbatim.
ORACLES["q_itemcf"] = """
    WITH b AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ), counts AS (
        SELECT it AS item, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1
    ), p AS (
        SELECT a.it AS item_a, c.it AS item_b
        FROM b a JOIN b c USING (bk)
        WHERE a.it < c.it
    ), sup AS (
        SELECT item_a, item_b, CAST(count(*) AS BIGINT) AS support
        FROM p GROUP BY 1, 2 HAVING count(*) >= 2
    ), bothdir AS (
        SELECT item_a AS item, item_b AS neighbor, support FROM sup
        UNION ALL
        SELECT item_b, item_a, support FROM sup
    ), j AS (
        SELECT bd.item, bd.neighbor, bd.support,
               CAST(ca.c AS HUGEINT) * cb.c AS p2
        FROM bothdir bd
        JOIN counts ca ON ca.item = bd.item
        JOIN counts cb ON cb.item = bd.neighbor
    ), seeded AS (
        SELECT *, CAST(floor(sqrt(CAST(p2 AS DOUBLE))) AS HUGEINT) AS y0
        FROM j
    ), rooted AS (
        SELECT *, CASE WHEN (y0+2)*(y0+2) <= p2 THEN y0+2
                       WHEN (y0+1)*(y0+1) <= p2 THEN y0+1
                       WHEN y0*y0 <= p2 THEN y0
                       WHEN (y0-1)*(y0-1) <= p2 THEN y0-1
                       ELSE y0-2 END AS y
        FROM seeded
    ), scored AS (
        SELECT item, neighbor, support,
               CASE WHEN p2 = 0 THEN NULL
                    ELSE CAST((CAST(support AS HUGEINT) * 1000000) // y
                              AS BIGINT) END AS cos_ppm
        FROM rooted
    ), ranked AS (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY item
                   ORDER BY cos_ppm DESC, neighbor ASC) AS INT) AS "rank"
        FROM scored
    )
    SELECT item, neighbor, support, cos_ppm, "rank"
    FROM ranked WHERE "rank" <= 5
"""

ORACLES["q_copurchase"] = """
    WITH b AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ), p AS (
        SELECT a.it AS item_a, c.it AS item_b
        FROM b a JOIN b c USING (bk)
        WHERE a.it < c.it
    )
    SELECT item_a, item_b, CAST(count(*) AS BIGINT) AS support
    FROM p GROUP BY 1, 2 HAVING count(*) >= 2
"""

# Calendar spine + forward fill, replayed with the same election.
ORACLES["q_resample_ffill"] = """
    WITH obs AS (
        SELECT user_id AS k, CAST(ts AS DATE) AS d, ts, event_id,
               CAST(round(value * 1000) AS BIGINT) AS v
        FROM events
    ), daily AS (
        SELECT k, d, CAST(count(*) AS BIGINT) AS n_obs,
               max(CASE WHEN rn = 1 THEN v END) AS last_v
        FROM (
            SELECT k, d, v,
                   row_number() OVER (PARTITION BY k, d
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM obs
        ) GROUP BY k, d
    ), bounds AS (
        SELECT k, min(d) AS lo, max(d) AS hi FROM obs GROUP BY k
    ), spine AS (
        SELECT k, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                              CAST(hi AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    )
    SELECT s.k AS user_id, strftime(s.d, '%Y-%m-%d') AS day,
           CAST(coalesce(daily.n_obs, 0) AS BIGINT) AS n_obs,
           last_value(daily.last_v IGNORE NULLS) OVER (
               PARTITION BY s.k ORDER BY s.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled
    FROM spine s LEFT JOIN daily ON daily.k = s.k AND daily.d = s.d
"""

# Day pre-aggregate + epoch-day range window, exact BIGINT sums.
ORACLES["q_rolling_metrics"] = """
    WITH daily AS (
        SELECT user_id AS k,
               CAST(epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP))
                    // 86400000000 AS BIGINT) AS ed,
               CAST(count(*) AS BIGINT) AS day_n,
               CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                   AS day_sum
        FROM events GROUP BY 1, 2
    )
    SELECT k AS user_id,
           strftime(CAST(make_timestamp(ed * 86400000000) AS DATE),
                    '%Y-%m-%d') AS day,
           day_n, day_sum,
           CAST(sum(day_n) OVER w AS BIGINT) AS roll_n,
           CAST(sum(day_sum) OVER w AS BIGINT) AS roll_sum
    FROM daily
    WINDOW w AS (PARTITION BY k ORDER BY ed
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""

ORACLES["q_key_skew"] = """
    WITH counts AS (
        SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
        FROM events GROUP BY 1
    ), stats AS (
        SELECT sum(n) AS total, count(*) AS nd FROM counts
    ), ranked AS (
        SELECT key, n,
               row_number() OVER (ORDER BY n DESC, key) AS rnk
        FROM counts
    )
    SELECT r.key, r.n, CAST(r.rnk AS INT) AS rnk,
           CAST(r.n * 1000000 // s.total AS BIGINT) AS share_ppm,
           CAST(r.n * s.nd * 1000 // s.total AS BIGINT) AS hot_x1000
    FROM ranked r CROSS JOIN stats s
    WHERE r.rnk <= 10
"""

ORACLES["q_class_balance"] = """
    WITH counts AS (
        SELECT concat_ws('/', lang, source) AS label, count(*) AS n
        FROM documents GROUP BY 1
    ), stats AS (
        SELECT sum(n) AS total, sum(n * n) AS sq FROM counts
    )
    SELECT c.label, c.n,
           CAST(c.n * 1000000 // s.total AS BIGINT) AS share_ppm,
           CAST((s.total * s.total - s.sq) * 1000000
                // (s.total * s.total) AS BIGINT) AS gini_ppm
    FROM counts c CROSS JOIN stats s
"""

ORACLES["q_date_dimension"] = """
    SELECT CAST(d AS DATE) AS d,
           CAST(year(d) AS INT) AS yr,
           CAST(month(d) AS INT) AS mon,
           CAST(day(d) AS INT) AS dom,
           CAST(dayofyear(d) AS INT) AS doy,
           CAST(isodow(d) AS INT) AS dow_iso,
           CAST(weekofyear(d) AS INT) AS wk_iso,
           CAST(quarter(d) AS INT) AS qtr,
           CAST(CASE WHEN isodow(d) IN (6, 7) THEN 1 ELSE 0 END AS INT)
               AS is_weekend,
           CAST(year(d) + CASE WHEN month(d) >= 4 THEN 1 ELSE 0 END AS INT)
               AS fiscal_yr,
           CAST((((month(d) - 4 + 12) % 12 + 1) - 1) // 3 + 1 AS INT)
               AS fiscal_qtr,
           CAST((month(d) - 4 + 12) % 12 + 1 AS INT) AS fiscal_mon
    FROM generate_series(DATE '2023-01-01', DATE '2024-12-31',
                         INTERVAL 1 DAY) AS t(d)
"""

ORACLES["q_debounce"] = """
    WITH lagged AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_us
        FROM events
    )
    SELECT event_id, user_id, ts_us, event_type
    FROM lagged
    WHERE prev_us IS NULL OR ts_us - prev_us > 600000000
"""

ORACLES["q_throttle"] = """
    WITH ranked AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               row_number() OVER (
                   PARTITION BY user_id, epoch_us(ts) // 86400000000
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    SELECT event_id, user_id, ts_us FROM ranked WHERE rn <= 3
"""

ORACLES["q_disorder"] = """
    WITH lagged AS (
        SELECT user_id, epoch_us(ts) AS us,
               max(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS run_max
        FROM events
    ), scored AS (
        SELECT user_id,
               CASE WHEN run_max > us THEN run_max - us ELSE 0 END AS late
        FROM lagged
    )
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_regressions,
           CAST(max(late) AS BIGINT) AS max_lateness_us
    FROM scored GROUP BY user_id
"""

ORACLES["q_contribution"] = """
    WITH seg AS (
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN year(o_orderdate) = 1995
                             THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS m_a,
               CAST(sum(CASE WHEN year(o_orderdate) = 1996
                             THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS m_b
        FROM orders
        WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY o_orderpriority
    ), tot AS (
        SELECT sum(m_b - m_a) AS total FROM seg
    )
    SELECT s.o_orderpriority, s.m_a, s.m_b, s.m_b - s.m_a AS delta,
           CASE WHEN t.total <> 0
                THEN CAST(CASE WHEN ((s.m_b - s.m_a < 0) = (t.total < 0))
                               THEN abs(s.m_b - s.m_a) * 1000000
                                    // abs(t.total)
                               ELSE -(abs(s.m_b - s.m_a) * 1000000
                                      // abs(t.total)) END
                          AS BIGINT) END AS share_ppm
    FROM seg s CROSS JOIN tot t
"""

ORACLES["q_attribution"] = """
    WITH conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS cus
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT user_id, event_id AS touch_id, epoch_us(ts) AS tus
        FROM events WHERE event_type IN ('click', 'view')
    ), j AS (
        SELECT c.conv_id, t.touch_id, t.tus,
               count(*) OVER (PARTITION BY c.conv_id) AS n_touches,
               row_number() OVER (
                   PARTITION BY c.conv_id
                   ORDER BY t.tus DESC, t.touch_id DESC
               ) AS rn
        FROM conv c JOIN touch t
          ON t.user_id = c.user_id
         AND t.tus <= c.cus
         AND t.tus > c.cus - 86400000000
    )
    SELECT conv_id, touch_id,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(CASE WHEN rn = 1
                     THEN 1000000 - (1000000 // n_touches) * (n_touches - 1)
                     ELSE 1000000 // n_touches END AS BIGINT) AS credit_ppm
    FROM j
"""

ORACLES["q_activity_bitmap"] = """
    WITH masked AS (
        SELECT user_id,
               CASE WHEN datediff('day', CAST(ts AS DATE), DATE '2024-01-30')
                         BETWEEN 0 AND 29
                    THEN CAST(1 AS BIGINT) << datediff('day', CAST(ts AS DATE),
                                                       DATE '2024-01-30')
                    ELSE CAST(0 AS BIGINT) END AS mask
        FROM events
    ), agg AS (
        SELECT user_id, bit_or(mask) AS bitmap FROM masked GROUP BY user_id
    )
    SELECT user_id, bitmap,
           CAST(bit_count(bitmap) AS INT) AS n_active_days,
           CASE WHEN bitmap <> 0
                THEN CAST(bit_count((bitmap & -bitmap) - 1) AS INT)
           END AS days_since_last
    FROM agg
"""

ORACLES["q_attribution_first"] = """
    WITH conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS cus
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT user_id, event_id AS touch_id, epoch_us(ts) AS tus
        FROM events WHERE event_type IN ('click', 'view')
    ), j AS (
        SELECT c.conv_id, t.touch_id,
               count(*) OVER (PARTITION BY c.conv_id) AS n_touches,
               row_number() OVER (
                   PARTITION BY c.conv_id
                   ORDER BY t.tus DESC, t.touch_id DESC
               ) AS rn
        FROM conv c JOIN touch t
          ON t.user_id = c.user_id
         AND t.tus <= c.cus
         AND t.tus > c.cus - 86400000000
    )
    SELECT conv_id, touch_id,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(CASE WHEN rn = n_touches THEN 1000000 ELSE 0 END AS BIGINT)
               AS credit_ppm
    FROM j
"""

ORACLES["q_attribution_last"] = """
    WITH conv AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS cus
        FROM events WHERE event_type = 'purchase'
    ), touch AS (
        SELECT user_id, event_id AS touch_id, epoch_us(ts) AS tus
        FROM events WHERE event_type IN ('click', 'view')
    ), j AS (
        SELECT c.conv_id, t.touch_id,
               count(*) OVER (PARTITION BY c.conv_id) AS n_touches,
               row_number() OVER (
                   PARTITION BY c.conv_id
                   ORDER BY t.tus DESC, t.touch_id DESC
               ) AS rn
        FROM conv c JOIN touch t
          ON t.user_id = c.user_id
         AND t.tus <= c.cus
         AND t.tus > c.cus - 86400000000
    )
    SELECT conv_id, touch_id,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(CASE WHEN rn = 1 THEN 1000000 ELSE 0 END AS BIGINT)
               AS credit_ppm
    FROM j
"""

ORACLES["q_trend"] = """
    WITH b AS (
        SELECT user_id,
               CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x,
               CAST(round(value * 1000) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
               AS slope_num,
           CAST(sum(y) * sum(x * x) - sum(x) * sum(x * y) AS BIGINT)
               AS icept_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS den
    FROM b GROUP BY user_id
"""

ORACLES["q_rank_corr"] = """
    WITH b AS (
        SELECT user_id,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(round(value * 1000) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ), r AS (
        SELECT user_id,
               CAST(2 * rank() OVER (PARTITION BY user_id ORDER BY x)
                    + count(*) OVER (PARTITION BY user_id, x) - 1
                    AS BIGINT) AS rx,
               CAST(2 * rank() OVER (PARTITION BY user_id ORDER BY y)
                    + count(*) OVER (PARTITION BY user_id, y) - 1
                    AS BIGINT) AS ry
        FROM b
    ), a AS (
        SELECT user_id, count(*) AS n,
               sum(rx) AS sx, sum(ry) AS sy,
               sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
               sum(rx * ry) AS sxy
        FROM r GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS dx,
           CAST(n * syy - sy * sy AS BIGINT) AS dy,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE) /
                           sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                * CAST(n * syy - sy * sy AS DOUBLE)), 6)
           END AS rho
    FROM a
"""

ORACLES["q_user_features"] = """
    WITH masked AS (
        SELECT user_id,
               CASE WHEN datediff('day', CAST(ts AS DATE), DATE '2024-01-30')
                         BETWEEN 0 AND 29
                    THEN CAST(1 AS BIGINT) << datediff('day',
                         CAST(ts AS DATE), DATE '2024-01-30')
                    ELSE CAST(0 AS BIGINT) END AS mask
        FROM events
    ), bm AS (
        SELECT user_id, bit_or(mask) AS bitmap FROM masked GROUP BY user_id
    ), bmx AS (
        SELECT user_id, bitmap,
               CAST(bit_count(bitmap) AS INT) AS n_active_days,
               CASE WHEN bitmap <> 0
                    THEN CAST(bit_count((bitmap & -bitmap) - 1) AS INT)
               END AS days_since_last
        FROM bm
    ), tb AS (
        SELECT user_id,
               CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x,
               CAST(round(value * 1000) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ), tr AS (
        SELECT user_id,
               CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
                   AS slope_num,
               CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
                   AS den
        FROM tb GROUP BY user_id
    ), c AS (
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    )
    SELECT c.user_id, c.n_events, c.n_purchases, c.first_day,
           bmx.bitmap, bmx.n_active_days, bmx.days_since_last,
           tr.slope_num, tr.den
    FROM c
    LEFT JOIN bmx ON c.user_id = bmx.user_id
    LEFT JOIN tr ON c.user_id = tr.user_id
"""

ORACLES["q_changepoint"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), cur AS (
        SELECT event_type, d,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY d) AS BIGINT) AS t,
               CAST(sum(c) OVER (
                   PARTITION BY event_type ORDER BY d) AS BIGINT) AS sl
        FROM daily
    ), tot AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS total
        FROM daily GROUP BY 1
    ), cand AS (
        SELECT c.event_type, c.d, c.t, c.sl, t.n, t.total,
               CAST(((CAST(t.n AS HUGEINT)
                       * (CAST(c.sl AS HUGEINT) * c.sl * (t.n - c.t)
                          + CAST(t.total - c.sl AS HUGEINT)
                            * (t.total - c.sl) * c.t)
                     - CAST(t.total AS HUGEINT) * t.total
                       * c.t * (t.n - c.t)) * 1000)
                    // (CAST(t.n AS HUGEINT) * c.t * (t.n - c.t))
                   AS BIGINT) AS gain
        FROM cur c JOIN tot t USING (event_type)
        WHERE c.t < t.n
    ), best AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type
                ORDER BY gain DESC, t ASC) AS rn
            FROM cand) WHERE rn = 1
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS split_day,
           t AS n_left, n - t AS n_right,
           CAST(CAST(sl AS HUGEINT) * 1000 // t AS BIGINT)
               AS mean_left_milli,
           CAST(CAST(total - sl AS HUGEINT) * 1000 // (n - t) AS BIGINT)
               AS mean_right_milli,
           gain AS gain_milli
    FROM best
"""

ORACLES["q_cusum"] = """
    WITH b AS (
        SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ), c AS (
        SELECT user_id, ts, event_id, v,
               sum(v - 5500) OVER (
                   PARTITION BY user_id ORDER BY ts, v, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM b
    ), s AS (
        SELECT user_id, ts, event_id, v,
               cum - least(CAST(0 AS BIGINT), min(cum) OVER (
                   PARTITION BY user_id ORDER BY ts, v, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )) AS cusum
        FROM c
    )
    SELECT user_id, ts, v, event_id, CAST(cusum AS BIGINT) AS cusum,
           cusum > 50000 AS alarm FROM s
"""

ORACLES["q_bootstrap"] = """
    WITH base AS (
        SELECT event_id, CAST(round(value * 100) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ), rep AS (
        SELECT event_id, y, unnest(generate_series(0, 15)) AS r
        FROM base
    ), h AS (
        SELECT r, y,
               CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                    || CAST(r AS VARCHAR)), 1, 8)) AS BIGINT) AS u
        FROM rep
    ), w AS (
        SELECT r, y,
               CAST(CASE WHEN u < 1580030168 THEN 0
                    WHEN u < 3160060337 THEN 1
                    WHEN u < 3950075421 THEN 2
                    WHEN u < 4213413783 THEN 3
                    WHEN u < 4279248373 THEN 4
                    WHEN u < 4292415291 THEN 5
                    WHEN u < 4294609777 THEN 6
                    WHEN u < 4294923276 THEN 7
                    WHEN u < 4294962463 THEN 8
                    WHEN u < 4294966817 THEN 9
                    ELSE 10 END AS BIGINT) AS w
        FROM h
    )
    SELECT CAST(r AS INT) AS b,
           CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_eff,
           CAST(sum(w) AS BIGINT) AS sum_w,
           CAST(sum(w * y) AS BIGINT) AS sum_wy
    FROM w GROUP BY 1
"""

ORACLES["q_weighted_median"] = """
    WITH agg AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem
        GROUP BY 1, 2
    ), cum AS (
        SELECT l_returnflag, v,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
               sum(w) OVER (PARTITION BY l_returnflag) AS tot
        FROM agg
    ), med AS (
        SELECT l_returnflag,
               CAST(min(v) AS BIGINT) AS median,
               CAST(min(tot) AS BIGINT) AS total_w
        FROM cum WHERE 2 * c >= tot GROUP BY 1
    ), nd AS (
        SELECT l_returnflag, count(*) AS n_distinct FROM agg GROUP BY 1
    )
    SELECT med.l_returnflag, med.median, med.total_w, nd.n_distinct
    FROM med JOIN nd ON med.l_returnflag = nd.l_returnflag
"""

ORACLES["q_trajectories"] = """
    WITH b AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        FROM events
    ), l AS (
        SELECT *,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 600000000
                    THEN 1 ELSE 0 END AS ns
        FROM b WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), s AS (
        SELECT *,
               sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM l
    )
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(min(us) AS BIGINT) AS start_us,
           CAST(max(us) AS BIGINT) AS end_us,
           string_agg(event_type, '>' ORDER BY us, event_id) AS trajectory
    FROM s GROUP BY 1, 2
"""

ORACLES["q_rolling_wau"] = """
    WITH kd AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), ex AS (
        SELECT DISTINCT user_id,
               d + CAST(g.i AS INT) AS day
        FROM kd CROSS JOIN LATERAL (
            SELECT unnest(generate_series(0, 6)) AS i
        ) g
    )
    SELECT day, count(*) AS n_distinct FROM ex GROUP BY day
"""

ORACLES["q_decayed_score"] = """
    WITH b AS (
        SELECT user_id,
               datediff('day', CAST(ts AS DATE), DATE '2024-01-30') AS age,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id,
           CAST(sum(CASE WHEN age BETWEEN 0 AND 29 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN age BETWEEN 0 AND 29
                    THEN (CAST(1 AS BIGINT) << CAST((30 - age - 1) // 2
                         AS INT)) * v
                    ELSE 0 END) AS BIGINT) AS score
    FROM b GROUP BY user_id
"""

ORACLES["q_target_encoding"] = """
    WITH r AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ), g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(y) AS BIGINT) AS sg
        FROM r GROUP BY 1
    ), p AS (
        SELECT (sum(y) * 10000) // count(*) AS prior_q FROM r
    )
    SELECT r.event_id, r.event_type, r.y,
           CAST((g.sg * 10000 + 20 * p.prior_q) // (g.ng + 20)
                AS BIGINT) AS enc,
           CASE WHEN g.ng > 1 THEN
               CAST(((g.sg - r.y) * 10000 + 20 * p.prior_q)
                    // (g.ng - 1 + 20) AS BIGINT)
           END AS enc_loo
    FROM r JOIN g USING (event_type) CROSS JOIN p
"""

ORACLES["q_markov"] = """
    WITH ord AS (
        SELECT user_id, event_id, event_type, ts,
               lag(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, event_id, event_type, ts,
               sum(CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts) > 600000000
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM ord
    ), tr AS (
        SELECT event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id, sid ORDER BY ts, event_id
               ) AS prev_type
        FROM sess
    ), cnt AS (
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM tr WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST((n * 1000000)
                // (sum(n) OVER (PARTITION BY prev_type)) AS BIGINT)
               AS prob_ppm,
           CAST(row_number() OVER (
                   PARTITION BY prev_type ORDER BY n DESC, next_type ASC)
               AS INT) AS rank
    FROM cnt
"""

ORACLES["q_interarrival"] = """
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_us,
           CAST(max(gap) AS BIGINT) AS max_us,
           CAST(sum(gap) // count(*) AS BIGINT) AS mean_us,
           CASE WHEN sum(gap) // count(*) > 0 THEN
               CAST((max(gap) * 1000) // (sum(gap) // count(*)) AS BIGINT)
           END AS burst_x1000
    FROM g WHERE gap IS NOT NULL GROUP BY 1
"""

ORACLES["q_minmax_scale"] = """
    WITH r AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ), g AS (
        SELECT event_type, min(y) AS mn, max(y) AS mx
        FROM r GROUP BY 1
    )
    SELECT r.event_id, r.event_type, r.y,
           CASE WHEN g.mx > g.mn THEN
               CAST(((r.y - g.mn) * 1000000) // (g.mx - g.mn) AS BIGINT)
           END AS scaled_ppm
    FROM r JOIN g USING (event_type)
"""

ORACLES["q_funnel_latency"] = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT s1.user_id, s1.t1,
               min(e.ts) FILTER (WHERE e.ts >= s1.t1) AS t2
        FROM s1
        LEFT JOIN events e
          ON e.user_id = s1.user_id AND e.event_type = 'click'
        GROUP BY s1.user_id, s1.t1
    ), s3 AS (
        SELECT s2.user_id, s2.t1, s2.t2,
               min(e.ts) FILTER (WHERE e.ts >= s2.t2) AS t3
        FROM s2
        LEFT JOIN events e
          ON e.user_id = s2.user_id AND e.event_type = 'purchase'
        GROUP BY s2.user_id, s2.t1, s2.t2
    ), lats AS (
        SELECT 'view>click' AS transition,
               epoch_us(t2) - epoch_us(t1) AS latency_us
        FROM s3 WHERE t2 IS NOT NULL
        UNION ALL
        SELECT 'click>purchase',
               epoch_us(t3) - epoch_us(t2)
        FROM s3 WHERE t3 IS NOT NULL
    ), dv AS (
        SELECT transition, latency_us,
               CAST(count(*) AS BIGINT) AS w
        FROM lats GROUP BY 1, 2
    ), cum AS (
        SELECT transition, latency_us, w,
               sum(w) OVER (PARTITION BY transition ORDER BY latency_us
                            ROWS UNBOUNDED PRECEDING) AS c,
               sum(w) OVER (PARTITION BY transition) AS total
        FROM dv
    ), med AS (
        SELECT transition,
               CAST(max(total) AS BIGINT) AS n_converted,
               CAST(min(CASE WHEN 2 * c >= total THEN latency_us END)
                    AS BIGINT) AS median_us
        FROM cum GROUP BY 1
    ), spine(transition) AS (
        VALUES ('view>click'), ('click>purchase')
    )
    SELECT spine.transition,
           CAST(COALESCE(med.n_converted, 0) AS BIGINT) AS n_converted,
           med.median_us
    FROM spine LEFT JOIN med USING (transition)
"""

ORACLES["q_mad_outliers"] = """
    WITH r AS (
        SELECT event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events WHERE value IS NOT NULL
    ), agg AS (
        SELECT event_type, y AS v, CAST(count(*) AS BIGINT) AS w
        FROM r GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, v,
               sum(w) OVER (PARTITION BY event_type ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS c,
               sum(w) OVER (PARTITION BY event_type) AS tot
        FROM agg
    ), med AS (
        SELECT event_type, CAST(min(v) AS BIGINT) AS med
        FROM cum WHERE 2 * c >= tot GROUP BY 1
    ), d AS (
        SELECT r.event_id, r.event_type, r.y, med.med,
               abs(r.y - med.med) AS dv
        FROM r JOIN med USING (event_type)
    ), dagg AS (
        SELECT event_type, dv AS v, CAST(count(*) AS BIGINT) AS w
        FROM d GROUP BY 1, 2
    ), dcum AS (
        SELECT event_type, v,
               sum(w) OVER (PARTITION BY event_type ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS c,
               sum(w) OVER (PARTITION BY event_type) AS tot
        FROM dagg
    ), mad AS (
        SELECT event_type, CAST(min(v) AS BIGINT) AS mad
        FROM dcum WHERE 2 * c >= tot GROUP BY 1
    )
    SELECT d.event_id, d.event_type, d.y, d.med, mad.mad,
           CAST(CASE WHEN d.dv * 1 > 3 * mad.mad THEN 1 ELSE 0 END
                AS INT) AS is_outlier
    FROM d JOIN mad USING (event_type)
"""

ORACLES["q_rank_movers"] = """
    WITH base AS (
        SELECT user_id AS key,
               CAST(round(value * 100) AS BIGINT) AS m,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'A'
                    ELSE 'B' END AS half
        FROM events WHERE value IS NOT NULL
    ), a AS (
        SELECT key, CAST(sum(m) AS BIGINT) AS total_a,
               CAST(row_number() OVER (ORDER BY sum(m) DESC, key ASC)
                    AS INT) AS rank_a
        FROM base WHERE half = 'A' GROUP BY key
    ), b AS (
        SELECT key, CAST(sum(m) AS BIGINT) AS total_b,
               CAST(row_number() OVER (ORDER BY sum(m) DESC, key ASC)
                    AS INT) AS rank_b
        FROM base WHERE half = 'B' GROUP BY key
    )
    SELECT COALESCE(a.key, b.key) AS key,
           a.total_a, a.rank_a, b.total_b, b.rank_b,
           CAST(a.rank_a - b.rank_b AS INT) AS delta
    FROM a FULL OUTER JOIN b ON a.key = b.key
"""

ORACLES["q_autocorr"] = """
    WITH daily AS (
        SELECT event_type AS t, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), lags(lag) AS (
        VALUES (0), (1), (2), (3)
    )
    SELECT a.t AS event_type, CAST(lag AS INT) AS lag,
           CAST(sum(a.n * b.n) AS BIGINT) AS dot,
           CAST(count(*) AS BIGINT) AS n_days
    FROM daily a CROSS JOIN lags
    JOIN daily b ON b.t = a.t AND a.day + CAST(lag AS INT) = b.day
    GROUP BY 1, 2
"""

ORACLES["q_leadlag"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type AS t,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE event_type IN ('view', 'purchase')
        GROUP BY 1, 2
    ), a AS (
        SELECT day, n AS na FROM daily WHERE t = 'view'
    ), b AS (
        SELECT day AS bday, n AS nb FROM daily WHERE t = 'purchase'
    ), lags(lag) AS (
        VALUES (-3), (-2), (-1), (0), (1), (2), (3)
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(sum(na * nb) AS BIGINT) AS dot,
           CAST(count(*) AS BIGINT) AS n_days
    FROM a CROSS JOIN lags
    JOIN b ON a.day + CAST(lag AS INT) = b.bday
    GROUP BY 1
"""

ORACLES["q_fano"] = """
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS BIGINT) AS total,
               sum(CAST(c AS HUGEINT) * c) AS sq
        FROM daily GROUP BY 1
    )
    SELECT user_id, n_days, total,
           CAST(((CAST(n_days AS HUGEINT) * sq
                  - CAST(total AS HUGEINT) * total) * 1000)
                // (CAST(n_days AS HUGEINT) * total) AS BIGINT)
               AS fano_x1000
    FROM stats
"""

ORACLES["q_dow_profile"] = """
    WITH c AS (
        SELECT event_type, CAST(isodow(ts) AS INT) AS dow,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, dow, n,
           CAST((CAST(n AS HUGEINT) * 1000000)
                // sum(n) OVER (PARTITION BY event_type) AS BIGINT)
               AS share_ppm
    FROM c
"""

ORACLES["q_coverage_gaps"] = """
    WITH kd AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_active_days,
           min(d) AS first_day,
           max(d) AS last_day,
           CAST(max(d) - min(d) + 1 AS BIGINT) AS span_days,
           CAST(max(d) - min(d) + 1 - count(*) AS BIGINT) AS n_missing
    FROM kd GROUP BY 1
"""

ORACLES["q_seasonal_anomaly"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), tagged AS (
        SELECT event_type, day, n, CAST(isodow(day) AS INT) AS dow
        FROM daily
    ), base AS (
        SELECT event_type, dow,
               CAST(count(*) AS BIGINT) AS n_dow_days,
               CAST(sum(n) AS BIGINT) AS dow_total
        FROM tagged GROUP BY 1, 2
    )
    SELECT t.event_type, t.day, t.n, t.dow, b.n_dow_days, b.dow_total,
           CAST(CAST(t.n AS HUGEINT) * b.n_dow_days * 2
                > 3 * CAST(b.dow_total AS HUGEINT) AS INT) AS spike,
           CAST(CAST(t.n AS HUGEINT) * b.n_dow_days * 2
                < 1 * CAST(b.dow_total AS HUGEINT) AS INT) AS dip
    FROM tagged t
    JOIN base b ON b.event_type = t.event_type AND b.dow = t.dow
"""



def q_theil_sen(spark, sf_dir):
    """Theil–Sen robust trend (operators/analytics.py theil_sen_trend):
    per event type, the exact lower median of all pairwise daily-count
    slopes — the outlier-resistant drift detector complementing
    q_trend's OLS line. Slopes quantize once to integer ppm (trunc
    toward zero — identical in both engines), the median is the
    element at (n+1) div 2 under the total order (slope, da, db); the
    pairwise stage is bounded by days² per key, never the event log."""
    from salesforce_plugin_spark.operators.analytics import theil_sen_trend

    e = load_table(spark, sf_dir, "events")
    return theil_sen_trend(e, "event_type", "ts")

ORACLES["q_theil_sen"] = """
    WITH daily AS (
        SELECT event_type AS k,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.k, a.d AS da, b.d AS db,
               CASE WHEN b.c >= a.c
                    THEN ((b.c - a.c) * 1000000) // (b.d - a.d)
                    ELSE -(((a.c - b.c) * 1000000) // (b.d - a.d))
               END AS s
        FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d
    ), ranked AS (
        SELECT k, s,
               row_number() OVER (PARTITION BY k ORDER BY s, da, db) AS rn,
               count(*) OVER (PARTITION BY k) AS n
        FROM pairs
    ), nd AS (
        SELECT k, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
    )
    SELECT r.k AS event_type, nd.n_days,
           CAST(r.n AS BIGINT) AS n_pairs,
           CAST(r.s AS BIGINT) AS slope_ppm
    FROM ranked r JOIN nd ON nd.k = r.k
    WHERE r.rn = (r.n + 1) // 2
"""


def q_assoc_rules(spark, sf_dir):
    """Association-rule mining (operators/analytics.py assoc_rules):
    both directed rules per frequent part pair with exact integer
    confidence and lift in ppm — the Apriori rule step on top of
    q_copurchase's support counts (which stay the only quadratic-ish
    stage; the rule arithmetic is two dimension-scale broadcast joins
    and a 1-row N attach). The quadratic supp·N·10⁶ products run in
    DECIMAL(38,0) — at corpus scale they pass 2^63 long before 100 TB
    does. support >= 3 is the fixture-calibrated frequent floor."""
    from salesforce_plugin_spark.operators.analytics import assoc_rules

    li = load_table(spark, sf_dir, "lineitem")
    return assoc_rules(li, "l_orderkey", "l_partkey", min_support=3)


ORACLES["q_assoc_rules"] = """
    WITH b AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ), pairs AS (
        SELECT a.it AS item_a, c.it AS item_b,
               CAST(count(*) AS BIGINT) AS support
        FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
        GROUP BY 1, 2 HAVING count(*) >= 3
    ), isupp AS (
        SELECT it, CAST(count(*) AS BIGINT) AS supp FROM b GROUP BY 1
    ), nb AS (
        SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM b
    ), directed AS (
        SELECT item_a AS antecedent, item_b AS consequent, support
        FROM pairs
        UNION ALL
        SELECT item_b AS antecedent, item_a AS consequent, support
        FROM pairs
    )
    SELECT d.antecedent, d.consequent, d.support,
           CAST((CAST(d.support AS HUGEINT) * 1000000)
                // sa.supp AS BIGINT) AS conf_ppm,
           CAST((CAST(d.support AS HUGEINT) * nb.n * 1000000)
                // (CAST(sa.supp AS HUGEINT) * sb.supp) AS BIGINT)
               AS lift_ppm
    FROM directed d
    JOIN isupp sa ON sa.it = d.antecedent
    JOIN isupp sb ON sb.it = d.consequent
    CROSS JOIN nb
"""


def q_wilson(spark, sf_dir):
    """Small-sample-honest source quality ranking
    (operators/analytics.py wilson_quality): per-source pass rate of a
    token-count gate WITH the exact-integer Wilson 95% lower bound —
    the ranking statistic that stops a 3/3 source outranking a
    900/1000 one before sources are weighted into a training mix. z
    and z² are pinned ppm constants; the sqrt term runs through the
    corrected isqrt on a squared-by-construction denominator, so the
    bound replays bit-for-bit (each floor < 1 ppm; cross-checked
    against float Wilson in unit tests). One partial-combined
    aggregate; per-group scalar arithmetic after."""
    from salesforce_plugin_spark.functions.text import token_count
    from salesforce_plugin_spark.operators.analytics import wilson_quality

    d = load_table(spark, sf_dir, "documents")
    return wilson_quality(
        d, ["source"], (token_count("text") >= 30).cast("int")
    )


ORACLES["q_wilson"] = r"""
    WITH agg AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN length(regexp_split_to_array(
                                 trim(text), '\s+')) >= 30
                        THEN 1 ELSE 0 END) AS BIGINT) AS s
        FROM documents GROUP BY 1
    ), x AS (
        SELECT *,
               (CAST(s AS HUGEINT) * (n - s) * 4000000
                + CAST(3841600 AS HUGEINT) * n) * 1000000 * n AS xv
        FROM agg
    ), seeded AS (
        SELECT *, CAST(floor(sqrt(CAST(xv AS DOUBLE))) AS HUGEINT) AS y0
        FROM x
    ), rooted AS (
        SELECT *, CASE WHEN (y0+2)*(y0+2) <= xv THEN y0+2
                       WHEN (y0+1)*(y0+1) <= xv THEN y0+1
                       WHEN y0*y0 <= xv THEN y0
                       WHEN (y0-1)*(y0-1) <= xv THEN y0-1
                       ELSE y0-2 END AS r
        FROM seeded
    ), terms AS (
        SELECT source, n, s,
               (CAST(s AS HUGEINT) * 2000000 + 3841600) // (CAST(n AS HUGEINT) * 2)
                   AS a_ppm,
               (CAST(1960000 AS HUGEINT) * r)
                   // (CAST(n AS HUGEINT) * n * 2000000) AS b_ppm
        FROM rooted
    )
    SELECT source, n, s,
           CAST((CAST(s AS HUGEINT) * 1000000) // n AS BIGINT) AS rate_ppm,
           CAST(greatest(
               ((a_ppm - b_ppm) * CAST(n AS HUGEINT) * 1000000)
                   // (CAST(n AS HUGEINT) * 1000000 + 3841600),
               0) AS BIGINT) AS wilson_lb_ppm
    FROM terms
"""


def q_abtest(spark, sf_dir):
    """Two-proportion z-test (operators/analytics.py ab_test_z): per
    event_type, arm = user_id parity (a deterministic assignment —
    never RNG, or the artifact can't replay), success = value ≥ 50;
    exact-integer signed milli-z via the corrected isqrt on a
    squared-by-construction denominator (the wilson_quality
    discipline) and the |z| ≥ 1.96 verdict — the experiment read-out
    as a hash-gateable artifact (null-hypothesis arms here, so the
    gate also pins that z stays honest when nothing is going on)."""
    from salesforce_plugin_spark.operators.analytics import ab_test_z

    ev = load_table(spark, sf_dir, "events")
    return ab_test_z(
        ev,
        F.col("user_id") % 2,
        F.col("value") >= 50,
        group_cols=["event_type"],
    )


ORACLES["q_abtest"] = """
    WITH agg AS (
        SELECT event_type,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN user_id % 2 = 0 AND value >= 50
                        THEN 1 ELSE 0 END) AS BIGINT) AS s1,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(sum(CASE WHEN user_id % 2 = 1 AND value >= 50
                        THEN 1 ELSE 0 END) AS BIGINT) AS s2
        FROM events GROUP BY 1
    ), t AS (
        SELECT *,
               CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1 AS d,
               CAST(n1 AS HUGEINT) * n2 * (s1 + s2)
                   * (n1 + n2 - s1 - s2) AS m
        FROM agg
    ), seeded AS (
        SELECT *, CAST(n1 + n2 AS HUGEINT) * m AS nm FROM t
    ), rooted AS (
        SELECT *,
               CAST(floor(sqrt(CAST(nm AS DOUBLE))) AS HUGEINT) AS y0
        FROM seeded
    ), pinned AS (
        SELECT *, CASE WHEN (y0+2)*(y0+2) <= nm THEN y0+2
                       WHEN (y0+1)*(y0+1) <= nm THEN y0+1
                       WHEN y0*y0 <= nm THEN y0
                       WHEN (y0-1)*(y0-1) <= nm THEN y0-1
                       ELSE y0-2 END AS r
        FROM rooted
    ), z AS (
        SELECT event_type, n1, s1, n2, s2,
               CASE WHEN m = 0 THEN NULL
                    ELSE CAST((CASE WHEN d < 0 THEN -1 ELSE 1 END)
                         * ((abs(d) * 1000 * r) // m) AS BIGINT)
               END AS z_milli,
               CAST((CAST(s1 AS HUGEINT) * 1000000) // n1 AS BIGINT)
                   AS p1_ppm,
               CAST((CAST(s2 AS HUGEINT) * 1000000) // n2 AS BIGINT)
                   AS p2_ppm,
               -- truncation toward zero (the dfloor contract), not //'s
               -- floor: sign applied to the absolute quotient
               CAST((CASE WHEN CAST(s1 AS HUGEINT) * n2
                               < CAST(s2 AS HUGEINT) * n1
                          THEN -1 ELSE 1 END)
                    * ((abs(CAST(s1 AS HUGEINT) * n2
                            - CAST(s2 AS HUGEINT) * n1) * 1000000)
                       // (CAST(n1 AS HUGEINT) * n2)) AS BIGINT)
                   AS diff_ppm
        FROM pinned
    )
    SELECT event_type, n1, s1, n2, s2, p1_ppm, p2_ppm, diff_ppm, z_milli,
           CAST(CASE WHEN abs(z_milli) >= 1960 THEN 1 ELSE 0 END AS INT)
               AS significant
    FROM z
"""


def q_calibration(spark, sf_dir):
    """Reliability curve (operators/analytics.py calibration_bins):
    events.value (integer milli) binned into 10 fixed-width cells
    against the purchase outcome — per bin the exact mean score and
    observed rate, the artifact that decides whether a score can gate
    at a threshold (here value carries no purchase signal, so the
    gate also pins the honest flat curve). Fixed integer bin edges —
    stable meanings across runs, one map-side expression, and integer
    `div` binning because a double-divide + int cast TRUNCATES in
    Spark but ROUNDS in DuckDB at bin edges."""
    from salesforce_plugin_spark.operators.analytics import calibration_bins

    ev = load_table(spark, sf_dir, "events")
    return calibration_bins(
        ev,
        F.round(F.col("value") * 1000, 0).cast("long"),
        F.col("event_type") == "purchase",
        lo=0,
        hi=500000,
        n_bins=10,
    )


ORACLES["q_calibration"] = """
    WITH binned AS (
        SELECT CAST(least(9, greatest(0,
                   ((CAST(round(value * 1000) AS BIGINT) - 0) * 10)
                       // 500000)) AS INT) AS bin,
               CAST(round(value * 1000) AS BIGINT) AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ok
        FROM events
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST((sum(CAST(score AS HUGEINT)) * 1000) // count(*) AS BIGINT)
               AS mean_score_milli,
           CAST((CAST(sum(ok) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
               AS rate_ppm
    FROM binned GROUP BY 1
"""


def q_autocorr(spark, sf_dir):
    """Per-type persistence/seasonality probe (operators/analytics.py
    autocorrelation_daily): the exact daily-count self-dot Σ c(d)·c(d+k)
    for lags 0..3 per event type — q_leadlag's machinery turned inward,
    with lag 0 the raw energy a reader normalizes against. Everything
    after the daily collapse is days × types × lags bounded."""
    from salesforce_plugin_spark.operators.analytics import (
        autocorrelation_daily,
    )

    e = load_table(spark, sf_dir, "events")
    return autocorrelation_daily(e, "event_type", "ts", max_lag=3)


def q_monitoring_capstone(spark, sf_dir):
    """Observability capstone: the production monitoring pass a data
    platform runs per ingestion cycle, composing three independently
    gated checks into ONE tall (chk, metric, value) readout — the
    anomaly count from the exact z-gate (q_anomaly_zscore), the
    click-vs-view KS drift (q_ks_test), and the strongest level-shift
    evidence across event types (q_changepoint's max gain). Each stage
    is oracle-gated on its own elsewhere; the composition is gated
    here (the oracle textually embeds the three stage oracles as
    subqueries — one WITH per check, UNION ALL). The capstone
    discipline of q_curation_capstone applied to the monitoring
    family."""
    from salesforce_plugin_spark.conformance import QUERIES

    z = (
        QUERIES["q_anomaly_zscore"](spark, sf_dir)
        .filter(F.col("is_anomaly"))
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .select(
            F.lit("zscore").alias("chk"),
            F.lit("n_anomalies").alias("metric"),
            "value",
        )
    )
    ks = QUERIES["q_ks_test"](spark, sf_dir).select(
        F.lit("ks").alias("chk"),
        F.lit("d_ppm").alias("metric"),
        F.col("d_ppm").alias("value"),
    )
    cp = (
        QUERIES["q_changepoint"](spark, sf_dir)
        .agg(F.max("gain_milli").cast("long").alias("value"))
        .select(
            F.lit("changepoint").alias("chk"),
            F.lit("max_gain_milli").alias("metric"),
            "value",
        )
    )
    return z.unionByName(ks).unionByName(cp)
