"""Event-sequence analytics: funnel conversion and cohort retention.

The reference ships raw event extracts into a warehouse and leaves the
analytics to SQL; these are the two queries every such event table ends
up feeding, expressed as Spark plans that scale with the event volume:

- **funnel**: per user, the earliest time each ordered stage was reached
  (stage k counts only at-or-after stage k-1). Built as a chain of
  min-aggregates and left joins, ALL keyed on the user column — every
  exchange reuses the same hash partitioning, and each stage's input is
  pre-filtered to that stage's event type so the join sides shrink
  monotonically down the funnel. No windows over the full event set,
  no cartesian, no state.
- **cohort_retention**: users bucketed by their first-activity period,
  counted per (cohort, offset) cell. First-activity is a min-aggregate
  on user; the join back to activity rows is on the same key; the final
  aggregate is bounded by cohorts × offsets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from salesforce_plugin_spark.functions.exactmath import D38, dcast, dfloor


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    within: str | None = None,
) -> DataFrame:
    """Ordered-funnel times: one row per user who reached stage 1, with
    ``t_<stage>`` (earliest qualifying event time) per stage — NULL once
    the user drops out — and ``depth``, the number of stages reached.

    Stage k qualifies only at-or-after the user's stage-(k-1) time, so a
    purchase before any view does not count as funnel progress. With
    ``within`` (an INTERVAL string like ``'7 days'``) each transition
    must additionally happen within that horizon of the previous stage —
    the standard conversion-window semantics.
    """
    if not stages:
        raise ValueError("funnel requires at least one stage")

    out = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{stages[0]}"))
    )
    prev = f"t_{stages[0]}"
    for stage in stages[1:]:
        nxt = (
            events.filter(F.col(type_col) == stage)
            .select(user_col, F.col(ts_col).alias("__ts"))
        )
        # conditional min, not filter-then-min: a user whose stage-k events
        # all precede stage k-1 must surface with NULL, not vanish
        cond = F.col("__ts") >= F.col(prev)
        if within is not None:
            cond = cond & (
                F.col("__ts") <= F.col(prev) + F.expr(f"INTERVAL {within}")
            )
        qual = F.when(cond, F.col("__ts"))
        out = (
            out.join(nxt, user_col, "left")
            .groupBy(*out.columns)
            .agg(F.min(qual).alias(f"t_{stage}"))
        )
        prev = f"t_{stage}"

    depth = sum(
        (F.col(f"t_{s}").isNotNull().cast("int") for s in stages), F.lit(0)
    )
    return out.withColumn("depth", depth)


def session_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    gap_minutes: int = 10,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Behavioral sequence mining: count event-type transitions WITHIN
    sessions (inactivity gap > ``gap_minutes`` starts a new session, the
    same semantics as ``session_window``). A cross-session pair never
    counts — the session boundary resets the lag.

    Plan: sessionize with the lag+cumsum window construction (one
    exchange on the user key), lag the type within (user, session) (a
    second exchange on the session key), then one small aggregate
    bounded by |event types|². The gap comparison is integer micros so
    the boundary is exact in any engine.
    """
    tiebreak = tiebreak_cols or []
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w_user = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w_user)
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_us)
    ).cast("int")
    cum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = events.withColumn("__sid", F.sum(new_sess).over(cum))
    w_sess = Window.partitionBy(user_col, "__sid").orderBy(*order)
    tr = sess.withColumn("__prev", F.lag(F.col(type_col)).over(w_sess))
    return (
        tr.filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention counts: ``(cohort, period_offset, n_users)``.

    ``cohort`` is the truncated period of the user's first event;
    ``period_offset`` counts periods between cohort and each active
    period (0 = the cohort period itself). ``n_users`` is exact.
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohort = F.date_trunc(period, F.col("__first_ts")).cast("date")
    active = events.select(
        user_col, F.date_trunc(period, F.col(ts_col)).cast("date").alias("__p")
    ).distinct()
    per_days = {"week": 7, "day": 1}
    if period not in per_days:
        raise ValueError(f"unsupported retention period: {period!r}")
    offset = (
        F.datediff(F.col("__p"), F.col("__cohort")) / per_days[period]
    ).cast("int")
    return (
        first.withColumn("__cohort", cohort)
        .join(active, user_col)
        .select(F.col("__cohort"), offset.alias("__offset"), F.col(user_col))
        .groupBy("__cohort", "__offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
        .withColumnRenamed("__cohort", "cohort")
        .withColumnRenamed("__offset", "period_offset")
    )


def user_growth(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Daily growth accounting: per calendar day, distinct active users,
    first-ever-seen (new) users, and the running cumulative user count —
    the acquisition-curve companion to :func:`cohort_retention` (same
    first-activity primitive).

    Scale shape: one exchange on the user key for the min-day aggregate
    (map-side partial), one day-level distinct aggregate, and the
    cumulative window runs over the day-bounded result — ≤ |days| rows,
    never the event log. Returns ``(day date, active_users, new_users,
    cum_users)``.
    """
    first = df.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("day")
    )
    new_users = first.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    active = df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.countDistinct(user_col).cast("long").alias("active_users")
    )
    daily = active.join(new_users, "day", "left").select(
        "day",
        "active_users",
        F.coalesce(F.col("new_users"), F.lit(0)).cast("long").alias(
            "new_users"
        ),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.withColumn(
        "cum_users", F.sum("new_users").over(w).cast("long")
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k_num: int = 3,
    k_den: int = 1,
    quant: int = 100,
) -> DataFrame:
    """Per-group z-score outlier flag, decided ENTIRELY in integers:
    values quantize to scaled longs (``round(v * quant)``) and the
    ``|x - μ| > (k_num/k_den)·σ`` test cross-multiplies to

        (k_den · (n·q - s))²  >  k_num² · (n·Σq² - s²)

    so no engine divides or square-roots at the decision boundary — a
    float z-score's last ulp could flip a borderline row in one engine
    and not another (the same no-transcendentals discipline as
    ``gopher_quality`` / ``bigram_fluency``). The quantization
    (≤ 0.5/quant per value) is the documented price of cross-engine
    exactness. The deciding comparison is quadratic in the group's row
    count (``dev² ~ (n·q)²`` overflowed BIGINT at the 10× probe's 200k
    rows/group), so sums and the comparison run in exact integer-valued
    DECIMAL(38,0) — 128-bit headroom (HUGEINT on the oracle side), exact
    while intermediates stay under 10^38; only the boolean leaves the
    operator, so the scalar-only output discipline is untouched.

    Plan shape: one map-side-combined stats aggregate (≤ |groups| rows)
    joined back un-hinted over one scan (AQE runtime-broadcasts small
    stats; genuinely huge group sets degrade to a shuffle join instead
    of OOM). Adds an ``is_anomaly`` boolean to the input rows.
    """
    d38 = "decimal(38,0)"
    q = F.round(F.col(value_col) * quant, 0).cast("long")
    tagged = df.withColumn("__q", q)
    qd = F.col("__q").cast(d38)
    stats = tagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(d38).alias("__n"),
        F.sum(qd).alias("__s"),
        F.sum(qd * qd).alias("__q2"),
    )
    dev = F.lit(k_den).cast(d38) * (
        F.col("__n") * F.col("__q").cast(d38) - F.col("__s")
    )
    var_n2 = F.col("__n") * F.col("__q2") - F.col("__s") * F.col("__s")
    return (
        tagged.join(stats, group_cols)
        .withColumn(
            "is_anomaly",
            dev * dev > F.lit(k_num * k_num).cast(d38) * var_n2,
        )
        .drop("__q", "__n", "__s", "__q2")
    )


def zscore_from_stats(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    stats: DataFrame,
    n_col: str = "n",
    s_col: str = "s",
    q2_col: str = "q2",
    k_num: int = 3,
    k_den: int = 1,
    quant: int = 100,
) -> DataFrame:
    """:func:`zscore_outliers` with the per-group moment state INJECTED
    instead of computed — ``stats`` carries exact BIGINT ``(n, Σq,
    Σq²)`` per group (e.g. maintained live by the streaming additive-sums
    fold, or loaded from a monitoring table), and the rows of ``df`` are
    flagged against it with the identical cross-multiplied integer
    comparison ``(k_den·(n·q − s))² > k_num²·(n·Σq² − s²)`` in
    DECIMAL(38,0). Because the injected sums are exact integers, the
    flags are bit-identical to the one-shot batch computation over the
    same rows — the property the q_stream_zscore equivalence face gates.

    The stats side is ≤ |groups| rows and explicitly broadcast; the scan
    side is untouched. Caller contract: ``stats`` was accumulated with
    the same ``quant``, and BIGINT Σq² holds while
    ``n·(quant·max|v|)² < 2^63`` — beyond that, lower ``quant`` (the
    batch operator's DECIMAL path has no such bound).
    """
    d38 = "decimal(38,0)"
    q = F.round(F.col(value_col) * quant, 0).cast("long")
    tagged = df.withColumn("__q", q)
    st = stats.select(
        *group_cols,
        F.col(n_col).cast(d38).alias("__n"),
        F.col(s_col).cast(d38).alias("__s"),
        F.col(q2_col).cast(d38).alias("__q2"),
    )
    dev = F.lit(k_den).cast(d38) * (
        F.col("__n") * F.col("__q").cast(d38) - F.col("__s")
    )
    var_n2 = F.col("__n") * F.col("__q2") - F.col("__s") * F.col("__s")
    # left join: a row whose group is MISSING from the injected stats
    # surfaces with is_anomaly NULL (visibly unscoreable) instead of
    # silently vanishing through an inner join
    return (
        tagged.join(F.broadcast(st), group_cols, "left")
        .withColumn(
            "is_anomaly",
            F.when(
                F.col("__n").isNull(), F.lit(None).cast("boolean")
            ).otherwise(
                dev * dev > F.lit(k_num * k_num).cast(d38) * var_n2
            ),
        )
        .drop("__q", "__n", "__s", "__q2")
    )


def copurchase_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Frequent item-pair mining (the support-counting core of Apriori /
    market-basket analysis): count how many baskets contain each
    unordered item pair, keep pairs with support >= ``min_support``.

    Plan: distinct (basket, item) first — multiplicity inside one basket
    must not inflate support — then ONE self-equijoin on the basket key
    (both sides shuffle-partitioned on it, co-located) with ``a < b``
    halving the pair space, then a partial-combined count keyed on the
    pair. Per-basket cost is C(basket_size, 2): bounded by real basket
    sizes, never by the catalog. At 100 TB the guard that matters is a
    basket-size cap (a pathological million-item basket would explode
    quadratically) — apply a ``HAVING count <= cap`` on the distinct
    step upstream if the domain allows such baskets.

    Output (scalar-only): ``(item_a, item_b, support long)`` with
    ``item_a < item_b``.
    """
    b = df.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    a = b.select(F.col("__bk"), F.col("__it").alias("item_a"))
    c = b.select(F.col("__bk"), F.col("__it").alias("item_b"))
    pairs = a.join(c, "__bk").filter(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def key_skew(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Key-distribution profile for shuffle planning: the ``top_n``
    hottest values of ``key_col`` with exact counts and integer skew
    statistics — the measurement step before choosing a join strategy at
    scale (a key holding >> 1/distinct of the rows is the one that makes
    a shuffle partition straggle; the fix is salting or an AQE skew
    split, but first you have to SEE it).

    Per hot key (deterministic order: count desc, key asc):
      - ``n``          exact row count (long)
      - ``rnk``        1-based hotness rank (int)
      - ``share_ppm``  n * 10^6 div total_rows (long, parts-per-million)
      - ``hot_x1000``  n * n_distinct * 1000 div total_rows (long):
                       1000 = exactly the mean key frequency; 50000 =
                       this key is 50x hotter than uniform.

    Integer floor divisions only — engine-replayable. Plan: ONE
    map-side-combined exchange on the key (the same aggregate any
    profiler must pay), a single-row global stat aggregate broadcast
    back, and a top-n election over the counts (TakeOrderedAndProject-
    sized). Nothing scales past the distinct-key count.
    """
    if top_n < 1:
        raise ValueError("key_skew requires top_n >= 1")
    counts = (
        df.groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count("*").alias("n"))
    )
    stats = counts.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__distinct")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("key"))
    top = counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= top_n
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "n",
        F.col("rnk").cast("int").alias("rnk"),
        F.expr(dfloor(dcast("n") + " * 1000000", dcast("__total"))).alias(
            "share_ppm"
        ),
        F.expr(
            dfloor(
                dcast("n") + " * " + dcast("__distinct") + " * 1000",
                dcast("__total"),
            )
        ).alias("hot_x1000"),
    )


def class_balance(df: DataFrame, label_col: str) -> DataFrame:
    """Label-distribution report for dataset curation: one row per label
    with its exact count, parts-per-million share, and the corpus-level
    Gini impurity repeated on every row (scalar-only contract) —
    the class-imbalance measurement a training-mixture job runs before
    choosing per-source sampling weights (:func:`~salesforce_plugin_spark
    .operators.pipeline.weighted_sample` is the actuator; this is the
    sensor).

    Gini impurity ``1 - Σ pᵢ²`` is computed as the exact integer
    ``(total² - Σ nᵢ²) * 10^6 div total²`` — rational in the counts, no
    float at any step (entropy would need ``log`` and could never
    hash-gate). 0 = single class, → 10^6·(1-1/k) for k balanced
    classes. Exact while ``total² < 2^63`` (~3·10^9 rows; past that,
    pre-divide counts by a common scale).

    Plan: one map-side-combined label aggregate (≤ |labels| rows), a
    1-row stat aggregate broadcast back. Nothing scales past the label
    cardinality.
    """
    counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n")
    )
    return class_balance_from_counts(counts)


def class_balance_from_counts(counts: DataFrame) -> DataFrame:
    """:func:`class_balance` from a pre-aggregated ``(label, n)``
    table — the entry point for additive label-count state (the
    streaming face folds per-batch counts and feeds the sum here;
    rollup-maintained label counts compose the same way).

    The squared-total arithmetic runs in exact DECIMAL(38,0) (the
    zscore_outliers discipline: ``total^2 * 10^6`` wraps BIGINT past
    ~3 * 10^6 rows, far below this library's scale); floor division is
    the exact-multiple identity ``(a - a % b) / b`` because Spark's
    ``div`` mis-handles decimal operands. Exact while intermediates
    stay under 10^38 (total < ~3 * 10^15 rows).
    """
    d38 = "decimal(38,0)"
    nd = F.col("n").cast(d38)
    stats = counts.agg(
        F.sum(nd).alias("__total"),
        F.sum(nd * nd).alias("__sq"),
    )
    share = (
        "CAST((CAST(n AS DECIMAL(38,0)) * 1000000"
        " - CAST(n AS DECIMAL(38,0)) * 1000000 % __total)"
        " / __total AS BIGINT)"
    )
    gnum = "((__total * __total - __sq) * 1000000)"
    gden = "(__total * __total)"
    gini = f"CAST(({gnum} - {gnum} % {gden}) / {gden} AS BIGINT)"
    return counts.crossJoin(F.broadcast(stats)).select(
        "label",
        F.col("n").cast("long").alias("n"),
        F.expr(share).alias("share_ppm"),
        F.expr(gini).alias("gini_ppm"),
    )


def contribution_analysis(
    df: DataFrame,
    period_col: str,
    group_cols: list[str],
    measure_col: str,
    period_a,
    period_b,
) -> DataFrame:
    """Metric-change decomposition ("why did revenue move?"): per
    segment, the measure in period A and period B, the signed delta,
    and the segment's share of the TOTAL change in ppm — the first
    question asked of any week-over-week dashboard move, answered as
    one bounded aggregate instead of ad-hoc queries per segment.

    ``measure_col`` must be an exact integer measure (cents, counts,
    scaled longs). ``share_ppm = delta * 10^6 div total_delta`` is an
    exact signed integer division (both Spark and DuckDB truncate
    toward zero — verified under the gate); segments moving AGAINST the
    total show negative shares, and shares sum to ~10^6 up to
    truncation. NULL share when the total change is exactly zero.

    Plan: one filter to the two periods (partition-prunable when
    ``period_col`` is the partition key), one map-side-combined group
    aggregate with conditional sums, a 1-row total broadcast back.
    """
    in_a = F.col(period_col) == period_a
    in_b = F.col(period_col) == period_b
    seg = (
        df.filter(in_a | in_b)
        .groupBy(*group_cols)
        .agg(
            F.sum(F.when(in_a, F.col(measure_col)).otherwise(0))
            .cast("long")
            .alias("m_a"),
            F.sum(F.when(in_b, F.col(measure_col)).otherwise(0))
            .cast("long")
            .alias("m_b"),
        )
        .withColumn("delta", F.col("m_b") - F.col("m_a"))
    )
    total = seg.agg(F.sum("delta").alias("__total"))
    return seg.crossJoin(F.broadcast(total)).select(
        *group_cols,
        "m_a",
        "m_b",
        "delta",
        F.when(
            F.col("__total") != 0,
            F.expr(dfloor(dcast("delta") + " * 1000000", dcast("__total"))),
        ).alias("share_ppm"),
    )


def linear_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str,
    conv_id_col: str,
    touch_id_col: str,
    conv_ts_col: str,
    touch_ts_col: str,
    window_seconds: int,
    model: str = "linear",
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's credit splits
    EQUALLY across the same user's touches in the lookback window
    (touch at-or-before the conversion, within ``window_seconds`` —
    half-open: a touch EXACTLY window_seconds earlier is out) —
    the model marketing pipelines start from. ``model`` switches the
    credit expression on the SAME plan: ``"linear"`` (equal split),
    ``"last_touch"`` / ``"first_touch"`` (all credit to the newest /
    oldest in-window touch, the other rows reporting 0 so the touch
    set stays visible).

    Credit is exact integer ppm: every touch gets
    ``10^6 div n_touches`` and the LAST touch absorbs the remainder,
    so each attributed conversion's credit sums to exactly 10^6 —
    downstream channel rollups stay integers with no drift.
    Conversions with no in-window touch emit nothing (report them via
    an anti-join when "unattributed" needs a row).

    Plan: one equi-join on the user + an exact integer-microsecond
    window filter (per-user fan-out is touches×conversions per user —
    fine for human-scale keys; throttle_per_window or the bucketed
    range join is the guard for bot keys), then one count window per
    conversion. Output: (conv_id, touch_id, n_touches, credit_ppm).
    """
    if window_seconds <= 0:
        raise ValueError("linear_attribution requires window_seconds > 0")
    if model not in ("linear", "first_touch", "last_touch"):
        raise ValueError("model must be linear | first_touch | last_touch")
    c = conversions.select(
        F.col(user_col).alias("__u"),
        F.col(conv_id_col).alias("conv_id"),
        F.unix_micros(F.col(conv_ts_col)).alias("__cus"),
    )
    t = touches.select(
        F.col(user_col).alias("__u"),
        F.col(touch_id_col).alias("touch_id"),
        F.unix_micros(F.col(touch_ts_col)).alias("__tus"),
    )
    joined = c.join(t, "__u").filter(
        (F.col("__tus") <= F.col("__cus"))
        & (F.col("__tus") > F.col("__cus") - window_seconds * 1_000_000)
    )
    w = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy(
        F.col("__tus").desc(), F.col("touch_id").desc()
    )
    base = F.expr("1000000 div n_touches")
    if model == "linear":
        credit = (
            F.when(
                F.col("__rn") == 1,
                F.lit(1_000_000) - base * (F.col("n_touches") - 1),
            )
            .otherwise(base)
        )
    elif model == "last_touch":
        credit = F.when(F.col("__rn") == 1, F.lit(1_000_000)).otherwise(
            F.lit(0)
        )
    else:  # first_touch
        credit = F.when(
            F.col("__rn") == F.col("n_touches"), F.lit(1_000_000)
        ).otherwise(F.lit(0))
    return (
        joined.withColumn("n_touches", F.count("*").over(w))
        .withColumn("__rn", F.row_number().over(wr))
        .select(
            "conv_id",
            "touch_id",
            F.col("n_touches").cast("long").alias("n_touches"),
            credit.cast("long").alias("credit_ppm"),
        )
    )


def activity_bitmap(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    anchor_date: str,
    n_days: int = 64,
) -> DataFrame:
    """Engagement features as one BIGINT per key: a ``n_days``-day
    activity bitmap — bit ``i`` set iff the key has any event
    ``i`` days before ``anchor_date`` (bit 0 = the anchor day) — plus
    ``n_active_days`` (its popcount) and ``days_since_last``. The
    standard churn/recency feature block computed exactly, in ONE
    map-side-combined aggregate (``bit_or`` of single-bit masks), with
    the bitmap itself engine-replayable integer arithmetic (no HLL, no
    collection types; windows over 64 days = one BIGINT, wider windows
    = one column per 64-day block).

    Events outside the window contribute nothing. ``n_days`` ≤ 64
    (one BIGINT); raise by calling per block and joining.
    """
    if not 1 <= n_days <= 64:
        raise ValueError("activity_bitmap requires 1 <= n_days <= 64")
    offset = F.datediff(F.lit(anchor_date).cast("date"), F.to_date(F.col(ts_col)))
    in_win = (offset >= 0) & (offset < n_days)
    # shiftleft needs a literal count in the Python API; build the mask
    # with integer exponentiation instead: 2^offset as a codegen pow on
    # exact doubles would drift — use shiftleft via expr (column count OK
    # in SQL) to stay in integer land
    mask = F.when(
        in_win, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__off AS INT))")
    ).otherwise(F.lit(0).cast("long"))
    out = (
        df.withColumn("__off", offset)
        .withColumn("__mask", mask)
        .groupBy(*key_cols)
        .agg(F.bit_or("__mask").alias("bitmap"))
    )
    return out.select(
        *key_cols,
        "bitmap",
        F.bit_count("bitmap").cast("int").alias("n_active_days"),
        F.when(
            F.col("bitmap") != 0,
            # trailing-zero count as pure integer arithmetic (log2 on
            # doubles is not guaranteed exact cross-engine):
            # tz = popcount(lowest_set_bit - 1)
            F.expr("CAST(bit_count((bitmap & -bitmap) - 1) AS INT)"),
        ).alias("days_since_last"),
    )


def group_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group OLS trend line with EXACT integer numerators — "is this
    metric drifting, per segment?" answered reproducibly at any scale.
    ``x_col`` and ``y_col`` must already be integer columns (epoch-day
    index, quantized metric — same pre-quantization contract as
    :func:`zscore_outliers`); the five sufficient statistics
    (n, Σx, Σy, Σx², Σxy) are exact BIGINT sums in ONE
    map-side-combined aggregate, and the fitted line is returned as
    integer rationals over the common denominator:

        slope     = slope_num / den,  slope_num = n·Σxy − Σx·Σy
        intercept = icept_num / den,  icept_num = Σy·Σx² − Σx·Σxy
        den       = n·Σx² − (Σx)²

    (den = 0 ⟺ all x equal — the fit is undefined and the rationals
    surface it as a zero denominator rather than a NaN). No divide
    enters the result, so rollups/comparisons downstream stay exact;
    divide once in float at the consumer. Overflow bound: |icept_num| ≤
    n·max|y|·max(x)² — at day-index x ≤ 10⁴ and |y| ≤ 10⁹ exact to
    n ≈ 10⁶ rows per group; rescale x (e.g. week index) for longer
    horizons.

    Plan: ONE exchange bounded by |groups|; everything else is
    map-side. Output: (groups..., n, sx, sy, sxx, sxy, slope_num,
    icept_num, den).
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = (
        df.select(*group_cols, x.alias("__x"), y.alias("__y"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("sx"),
            F.sum("__y").alias("sy"),
            F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
            F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        )
    )
    return agg.select(
        *group_cols,
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "slope_num"
        ),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).alias(
            "icept_num"
        ),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    )


def rank_correlation(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation, tie-correct (Pearson over
    AVERAGE ranks — the textbook ``1 − 6Σd²/...`` shortcut is only valid
    without ties, so it is not used). The monotonic-association sensor
    ("does value drift with time?", "do these two metrics co-move per
    segment?") that complements :func:`group_trend`'s linear fit.

    Doubled average ranks are exact INTEGERS (``2·avg = 2·min_rank +
    ties − 1``), so the five sufficient statistics and the correlation
    numerator/denominators are exact BIGINTs — reproducible across
    engines and partitionings; ``rho = num / sqrt(dx·dy)`` (round 6) is
    the one surface float, NULL when either variable is constant
    (undefined, not NaN). Overflow: |num| ≤ 4n⁴ per group — exact to
    n ≈ 3·10⁴ rows per group; beyond that, rank against bounded
    histogram cut points (:func:`~salesforce_plugin_spark.functions
    .sketch.percentile_normalize`) instead of exact windows.

    Plan: ONE exchange on the group keys feeds both rank windows (same
    partitioning, two in-partition sorts), then one bounded aggregate.
    Per-group ranking sorts within the group's partition — the exact
    contract every exact-rank statistic shares (see sample_per_group).

    Output: (groups..., n, num, dx, dy, rho).
    """
    gx = [F.col(c) for c in group_cols]
    wx = Window.partitionBy(*gx).orderBy(F.col(x_col))
    wy = Window.partitionBy(*gx).orderBy(F.col(y_col))
    cx = Window.partitionBy(*gx, F.col(x_col))
    cy = Window.partitionBy(*gx, F.col(y_col))
    r2x = (
        2 * F.rank().over(wx) + F.count(F.lit(1)).over(cx) - 1
    ).cast("long")
    r2y = (
        2 * F.rank().over(wy) + F.count(F.lit(1)).over(cy) - 1
    ).cast("long")
    ranked = df.select(
        *group_cols, r2x.alias("__rx"), r2y.alias("__ry")
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__rx").alias("__sx"),
        F.sum("__ry").alias("__sy"),
        F.sum(F.col("__rx") * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry") * F.col("__ry")).alias("__syy"),
        F.sum(F.col("__rx") * F.col("__ry")).alias("__sxy"),
    )
    num = F.col("n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = F.col("n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = F.col("n") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return agg.select(
        *group_cols,
        "n",
        num.alias("num"),
        dx.alias("dx"),
        dy.alias("dy"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                num.cast("double")
                / F.sqrt(dx.cast("double") * dy.cast("double")),
                6,
            ),
        ).alias("rho"),
    )


#: Poisson(1) CDF thresholds scaled to 2^32, k = 0..9: a 32-bit uniform
#: hash u maps to weight k iff u < T[k] first holds (P(X > 9) < 1e-7 is
#: truncated into k = 9). LITERALS, not computed at import: libm exp()
#: may differ in the last ulp across platforms, and the oracle must use
#: the byte-identical constants. Derived once from cum_k = Σ e^-1/j!.
POISSON1_THRESHOLDS: tuple[int, ...] = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
    4294962463,
    4294966817,
)


def poisson_bootstrap(
    df: DataFrame,
    id_col: str,
    value_col: str,
    replicates: int = 32,
) -> DataFrame:
    """Deterministic Poisson bootstrap — confidence intervals for a mean
    at any scale WITHOUT global resampling: replicate ``b`` weights each
    row by a Poisson(1) draw (the standard streaming/distributed
    approximation of multinomial resampling — at large n they coincide),
    and the draw is a PURE integer function of (id, b): the row's
    portable 32-bit hash compared against the fixed scaled-CDF
    thresholds (POISSON1_THRESHOLDS). No RNG state, no collect —
    re-runs, engines, partitionings, and appended shards all agree on
    every weight, the :func:`~salesforce_plugin_spark.operators.pipeline
    .weighted_sample` reproducibility discipline applied to resampling.

    ``value_col`` must be integer (pre-quantize — the group_trend
    contract), so each replicate's (n_eff, sum_w, sum_wy) are exact
    BIGINTs; form mean_b = sum_wy/sum_w and the percentile CI in float
    downstream. Plan: one ``replicates``-way explode (the documented
    cost — B passes of map work, typically over an already-reduced
    metric table) into ONE partial-combined exchange bounded by B rows.

    Output: (b int, n_eff long, sum_w long, sum_wy long) — n_eff counts
    rows with non-zero weight.
    """
    if replicates < 1:
        raise ValueError("poisson_bootstrap requires replicates >= 1")
    from salesforce_plugin_spark.functions.dedup import portable_hash32

    rep = df.select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_col).cast("long").alias("__y"),
        F.explode(
            F.sequence(F.lit(0), F.lit(replicates - 1))
        ).alias("b"),
    )
    u = portable_hash32(
        F.concat_ws(":", F.col("__id"), F.col("b").cast("string"))
    )
    w = F.lit(len(POISSON1_THRESHOLDS)).cast("long")
    for k in reversed(range(len(POISSON1_THRESHOLDS))):
        w = F.when(u < POISSON1_THRESHOLDS[k], F.lit(k).cast("long")).otherwise(w)
    return (
        rep.withColumn("__w", w)
        .groupBy(F.col("b").cast("int").alias("b"))
        .agg(
            F.sum(F.when(F.col("__w") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_eff"),
            F.sum("__w").alias("sum_w"),
            F.sum(F.col("__w") * F.col("__y")).alias("sum_wy"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact per-group weighted median over INTEGER values/weights (the
    pre-quantization contract): the smallest value whose cumulative
    weight reaches half the group total — ``2·cum ≥ total`` decided in
    integers, so no midpoint float and no engine ambiguity. The robust
    central-tendency complement to the approximate histogram-sketch
    quantiles (:func:`~salesforce_plugin_spark.functions.sketch
    .binned_quantiles`): exact, but pays a per-group sort over
    DISTINCT values.

    Plan: weights first collapse onto distinct (group, value) rows
    (ONE map-side-combined exchange — the cumulative window then runs
    over distinct values, not raw rows, so a hot repeated value costs
    one row), then a per-group cumsum + one min-election aggregate.
    Output: (groups..., median long, total_w long, n_distinct long).
    """
    agg = (
        df.groupBy(*group_cols, F.col(value_col).alias("__v"))
        .agg(F.sum(F.col(weight_col).cast("long")).alias("__w"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    cum = agg.select(
        *group_cols,
        "__v",
        F.sum("__w").over(w).alias("__cum"),
        F.sum("__w").over(wt).alias("__tot"),
    )
    return (
        cum.filter(2 * F.col("__cum") >= F.col("__tot"))
        .groupBy(*group_cols)
        .agg(
            F.min("__v").cast("long").alias("median"),
            F.first("__tot").alias("total_w"),
        )
        .join(
            agg.groupBy(*group_cols).agg(
                F.count(F.lit(1)).alias("n_distinct")
            ),
            group_cols,
        )
    )


def session_trajectories(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    gap_minutes: int = 10,
    tiebreak_cols: list[str] | None = None,
    sep: str = ">",
) -> DataFrame:
    """Serialize each session into its ordered event-type trajectory
    string (``view>click>purchase``) — the event-log → training-text
    step behavioral-sequence models consume (and the per-session
    rollup :func:`session_transitions` counts pairwise). Sessionization
    is the same lag+cumsum construction with exact integer-microsecond
    gaps; the trajectory is built by sorting each session's
    (ts, tiebreaks, type) structs inside the aggregate —
    ``array_sort`` over a ``collect_list`` bounded by the session
    length (the D9 child-nesting contract: collection types live only
    INSIDE the plan; the output column is a string), so the result is
    deterministic whatever the partitioning, provided the order is
    total per session (pass ``tiebreak_cols`` when (ts) can repeat —
    the cusum_alarms discipline).

    Plan: one exchange on the user key (sessionize), one on
    (user, session) for the aggregate. Output: (user, session_id,
    n_events, start_us, end_us, trajectory string).
    """
    tiebreak = tiebreak_cols or []
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w_user = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w_user)
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts) > gap_us)
    ).cast("int")
    cum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = events.withColumn("__sid", F.sum(new_sess).over(cum))
    item = F.struct(
        F.unix_micros(F.col(ts_col)).alias("us"),
        *[F.col(c).alias(f"tb{i}") for i, c in enumerate(tiebreak)],
        F.col(type_col).alias("t"),
    )
    return (
        sess.groupBy(
            F.col(user_col),
            F.col("__sid").cast("long").alias("session_id"),
        )
        .agg(F.collect_list(item).alias("__items"))
        .select(
            user_col,
            "session_id",
            F.size("__items").cast("long").alias("n_events"),
            F.element_at(F.array_sort("__items"), 1)["us"].alias("start_us"),
            F.element_at(F.array_sort("__items"), -1)["us"].alias("end_us"),
            F.array_join(
                F.transform(F.array_sort("__items"), lambda x: x["t"]),
                sep,
            ).alias("trajectory"),
        )
    )


def rolling_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """EXACT trailing-``window_days`` distinct keys per day (rolling
    WAU/MAU) — the rolling-DISTINCT aggregate ordinary range windows
    cannot express (distinct is not subtractable, so no sliding state
    works; HLL unions estimate it, this computes it). Shape: collapse
    to distinct (key, active-day) rows FIRST (the exchange is bounded
    by keys × days regardless of event volume), explode each into the
    ≤ ``window_days`` report days it covers, dedup (key, report-day) —
    a key active twice in one window counts once — and count per
    report day. Three bounded exchanges; the explode factor is exactly
    ``window_days`` over the already-collapsed day table, never over
    raw events. Report days run through last-active + window − 1 (the
    trailing window after the final event is a real answer).

    Output: (day date, n_distinct long).
    """
    if window_days < 1:
        raise ValueError("rolling_distinct requires window_days >= 1")
    kd = df.select(
        F.col(key_col).alias("__k"), F.to_date(F.col(ts_col)).alias("__d")
    ).distinct()
    exploded = kd.select(
        "__k",
        F.explode(
            F.sequence(
                F.col("__d"),
                F.date_add(F.col("__d"), window_days - 1),
            )
        ).alias("day"),
    ).distinct()
    return (
        exploded.groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    )


def decayed_score(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    anchor_date: str,
    horizon_days: int = 30,
    half_life_days: int = 1,
) -> DataFrame:
    """Recency-weighted engagement score with EXACT decay: each event's
    integer value is weighted by ``2^((horizon − age) div half_life)``
    — halving per ``half_life_days`` of age in STEPS, implemented as a
    bit shift so the whole score is one exact BIGINT sum (the float
    ``e^{-λ·age}`` form compounds rounding per event and can never
    hash-gate; step decay is the engine-portable formulation, and at
    daily granularity the two rank keys identically). Events older
    than ``horizon_days`` (or after the anchor) contribute zero.
    Downstream, ``score / 2^(horizon div half_life)`` is the
    anchor-day-normalized float.

    Plan: one codegen projection + ONE map-side-combined aggregate
    bounded by |keys|. Overflow: |score| ≤ Σv · 2^(horizon div
    half_life) — at horizon 30/half-life 1 that is v-sum · 2³⁰;
    keep ``horizon div half_life ≤ 40`` for |v| sums up to ~4·10⁵
    (enforced).

    Output: (keys..., n_events, score).
    """
    steps = horizon_days // half_life_days
    if steps < 1 or steps > 40:
        raise ValueError("decayed_score requires 1 <= horizon/half_life <= 40")
    age = F.datediff(
        F.lit(anchor_date).cast("date"), F.to_date(F.col(ts_col))
    )
    in_win = (age >= 0) & (age < horizon_days)
    w = F.when(
        in_win,
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(({horizon_days} - __age - 1) div {half_life_days} AS INT))"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        df.withColumn("__age", age)
        .groupBy(*key_cols)
        .agg(
            F.sum(F.when(in_win, 1).otherwise(0)).cast("long").alias(
                "n_events"
            ),
            F.sum(w * F.col(value_col).cast("long")).alias("score"),
        )
    )


def target_encoding(
    df: DataFrame,
    group_col: str,
    target_long,
    smoothing: int = 20,
    scale: int = 10_000,
) -> DataFrame:
    """Smoothed + leave-one-out target (mean) encoding, exact to the
    integer unit — the categorical-feature encoder for high-cardinality
    keys where one-hot explodes. ``target_long`` must already be an
    integer-quantized target (cents, ppm, 0/1 labels).

    Both encodings are computed as scaled-integer floor divisions over
    exact BIGINT sufficient statistics, so results are bit-identical in
    any engine (no float mean enters):

    - global prior (quantized once): ``prior_q = (Σy·scale) div n``;
    - smoothed:  ``enc = (S_g·scale + m·prior_q) div (n_g + m)``;
    - leave-one-out per row (the leakage-safe train-time form — the
      row's own target is excluded so the feature can't memorize it):
      ``enc_loo = ((S_g − y_i)·scale + m·prior_q) div (n_g − 1 + m)``.

    Plan: one map-side-combined group aggregate (|groups| rows), one
    1-row global aggregate broadcast back, one join of group stats onto
    the rows (dimension-sized build side, un-hinted — AQE broadcasts it
    while small, degrades to shuffle past threshold). Overflow bound:
    ``S_g·scale`` must stay under 2^63 — at scale=10^4 that holds to
    ~10^15 in Σ|y| per group, far past 100 TB corpora of cent-quantized
    targets.

    Output: one row per input row — ``(row id cols…, group, y long,
    enc long, enc_loo long)``; ``enc_loo`` is NULL for singleton groups
    (n_g = 1: there is nothing to encode from).

    Targets must be NON-NEGATIVE: every numerator here is then ≥ 0, so
    Spark's truncating ``div`` and a floor ``//`` agree (the
    sign-safe-floor-division discipline of gram_power_iterations).
    Shift signed targets by a constant before encoding.
    """
    y = (target_long if not isinstance(target_long, str) else F.col(target_long)).cast(
        "long"
    )
    rows = df.select(
        "*", y.alias("__y")
    ).filter(F.col("__y").isNotNull())
    gstats = rows.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("__ng"),
        F.sum("__y").cast("long").alias("__sg"),
    )
    glob = rows.agg(
        F.expr(f"sum(__y) * {scale} div count(*)")
        .cast("long")
        .alias("__prior_q")
    )
    joined = rows.join(gstats, group_col).crossJoin(F.broadcast(glob))
    enc = F.expr(
        f"(__sg * {scale} + {smoothing} * __prior_q) div (__ng + {smoothing})"
    ).cast("long")
    enc_loo = F.when(
        F.col("__ng") > 1,
        F.expr(
            f"((__sg - __y) * {scale} + {smoothing} * __prior_q)"
            f" div (__ng - 1 + {smoothing})"
        ).cast("long"),
    )
    return joined.select(
        *[c for c in df.columns],
        F.col("__y").alias("y"),
        enc.alias("enc"),
        enc_loo.alias("enc_loo"),
    )


def transition_probabilities(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    gap_minutes: int = 10,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov model of within-session behavior: the
    session-scoped transition counts of :func:`session_transitions`
    normalized to integer-ppm conditional probabilities
    ``P(next | prev)`` with a dense rank per source state — the
    next-event-prediction table (recommenders, UX funnels, prefetch
    heuristics) in engine-portable form.

    The normalizer is a window sum over the |types|²-bounded count
    table, so everything after the underlying sessionization is
    negligible at any scale; ``prob_ppm = n·10⁶ div Σ_next n`` is one
    integer floor divide (probabilities sum to ≤ 10⁶ with the remainder
    lost to flooring — deterministic, documented).

    Output (scalar-only): ``(prev_type, next_type, n long,
    prob_ppm long, rank int)``, rank by (n desc, next_type asc) — a
    total order, so ranks are engine-stable.
    """
    tr = session_transitions(
        events, user_col, ts_col, type_col, gap_minutes, tiebreak_cols
    )
    w = Window.partitionBy("prev_type")
    total = F.sum("n").over(w)
    rank = F.row_number().over(
        w.orderBy(F.col("n").desc(), F.col("next_type").asc())
    )
    return tr.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n") * F.lit(1_000_000)).alias("__num"),
        total.alias("__den"),
        rank.cast("int").alias("rank"),
    ).select(
        "prev_type",
        "next_type",
        "n",
        F.expr("__num div __den").cast("long").alias("prob_ppm"),
        "rank",
    )


def minmax_scale(
    df: DataFrame,
    group_col: str,
    value_long,
) -> DataFrame:
    """Per-group min-max normalization to exact integer ppm:
    ``scaled_ppm = (x − min)·10⁶ div (max − min)`` over an
    integer-quantized value — the feature-scaling step (complementing
    :func:`~salesforce_plugin_spark.functions.sketch.percentile_normalize`'s
    rank scaling and ``winsorize``'s clamping) with no float at the
    boundary, so every scaled value is bit-identical cross-engine.

    One map-side-combined group aggregate (|groups| rows) joined back
    un-hinted (AQE broadcasts while small). Degenerate groups
    (max = min) surface ``scaled_ppm`` NULL rather than a divide error.
    Output: input rows + ``(y long, scaled_ppm long)``.
    """
    y = (
        F.col(value_long) if isinstance(value_long, str) else value_long
    ).cast("long")
    rows = df.select("*", y.alias("__y")).filter(F.col("__y").isNotNull())
    stats = rows.groupBy(group_col).agg(
        F.min("__y").alias("__mn"), F.max("__y").alias("__mx")
    )
    return (
        rows.join(stats, group_col)
        .select(
            *df.columns,
            F.col("__y").alias("y"),
            F.when(
                F.col("__mx") > F.col("__mn"),
                F.expr("((__y - __mn) * 1000000) div (__mx - __mn)"),
            )
            .cast("long")
            .alias("scaled_ppm"),
        )
    )


def funnel_latency(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    within: str | None = None,
) -> DataFrame:
    """Time-to-convert summary per funnel transition: for each adjacent
    stage pair, how many users converted and the EXACT median latency —
    the question "how long does view → purchase take" that funnel depth
    counts alone don't answer. Composes :func:`funnel` (earliest
    qualifying stage times per user) with :func:`weighted_median`
    (exact integer-microsecond election), so every number sits under
    the hash gate.

    Plan: the funnel's user-keyed aggregates, one map-side projection
    to (transition, latency_us), then the median's distinct-value
    collapse — output is |stages − 1| rows.

    Output (scalar-only): ``(transition string, n_converted long,
    median_us long)``, transition = 'stage1>stage2'.
    """
    if len(stages) < 2:
        raise ValueError("funnel_latency requires at least two stages")
    f = funnel(events, user_col, ts_col, type_col, stages, within)
    pairs = []
    for a, b in zip(stages, stages[1:]):
        lat = F.unix_micros(F.col(f"t_{b}")) - F.unix_micros(
            F.col(f"t_{a}")
        )
        pairs.append(
            f.filter(F.col(f"t_{b}").isNotNull()).select(
                F.lit(f"{a}>{b}").alias("transition"),
                lat.alias("latency_us"),
            )
        )
    lats = pairs[0]
    for p in pairs[1:]:
        lats = lats.unionByName(p)
    med = weighted_median(
        lats.withColumn("__w", F.lit(1).cast("long")),
        ["transition"],
        "latency_us",
        "__w",
    )
    # spine keeps zero-converter transitions visible (n_converted = 0,
    # NULL median): the drop-off signal is the point of the report
    spine = events.sparkSession.createDataFrame(
        [(f"{a}>{b}",) for a, b in zip(stages, stages[1:])],
        "transition string",
    )
    return spine.join(med, "transition", "left").select(
        "transition",
        F.coalesce(F.col("total_w"), F.lit(0))
        .cast("long")
        .alias("n_converted"),
        F.col("median").cast("long").alias("median_us"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_long,
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """Median/MAD robust outliers: flag rows where
    ``|y − median| · k_den > k_num · MAD`` with MAD = median(|y −
    median|) — the robust-statistics complement of
    :func:`zscore_outliers` (mean/σ masks under heavy contamination;
    median/MAD has a 50% breakdown point) and of ``iqr_outliers``
    (quartile fences from the approximate sketch; this is EXACT).
    Both medians use the lower-median 2·cum ≥ total integer election
    (:func:`weighted_median`'s contract), and the threshold is a
    cross-multiplication — no divide, no float, fully hash-gateable.

    Plan: two distinct-value collapses + cumulative windows (each
    bounded by distinct values per group, the weighted_median shape)
    and two |groups|-sized join-backs (un-hinted). Output: one row per
    input row — ``(input cols…, y long, med long, mad long,
    is_outlier int)``; MAD = 0 (over half the group at the median)
    flags every off-median row, the documented degenerate case.
    """
    y = (
        F.col(value_long) if isinstance(value_long, str) else value_long
    ).cast("long")
    rows = df.select("*", y.alias("__y")).filter(F.col("__y").isNotNull())
    med = weighted_median(
        rows.withColumn("__w", F.lit(1).cast("long")),
        [group_col],
        "__y",
        "__w",
    ).select(group_col, F.col("median").alias("med"))
    with_med = rows.join(med, group_col)
    dev = with_med.withColumn(
        "__d", F.abs(F.col("__y") - F.col("med"))
    )
    mad = weighted_median(
        dev.withColumn("__w", F.lit(1).cast("long")),
        [group_col],
        "__d",
        "__w",
    ).select(group_col, F.col("median").alias("mad"))
    return (
        dev.join(mad, group_col)
        .select(
            *df.columns,
            F.col("__y").alias("y"),
            "med",
            "mad",
            (
                F.col("__d") * F.lit(k_den) > F.lit(k_num) * F.col("mad")
            )
            .cast("int")
            .alias("is_outlier"),
        )
    )


def rank_movers(
    df: DataFrame,
    key_col: str,
    metric_long,
    period_col: str,
    period_a,
    period_b,
) -> DataFrame:
    """Period-over-period rank movement: each key's rank by total
    metric in period A vs period B and the signed delta — the "top
    movers" report (which customers/segments surged or collapsed)
    complementing :func:`contribution_analysis` (which decomposes the
    METRIC change; this tracks POSITION change, robust to overall
    growth). Ranks are total-ordered (metric desc, key asc) so the
    report is engine-stable; keys active in only one period carry NULL
    for the missing rank and delta.

    One (period, key) partial-combined aggregate, two bounded rank
    windows, one full-outer key join. Output: ``(key, total_a long,
    rank_a int, total_b long, rank_b int, delta int)`` where delta =
    rank_a − rank_b (positive = improved).
    """
    m = (
        F.col(metric_long) if isinstance(metric_long, str) else metric_long
    ).cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(period_col).alias("__p"),
        m.alias("__m"),
    ).filter(F.col("__m").isNotNull())

    def side(period, total_name, rank_name):
        agg = (
            base.filter(F.col("__p") == period)
            .groupBy("key")
            .agg(F.sum("__m").cast("long").alias(total_name))
        )
        w = Window.orderBy(F.col(total_name).desc(), F.col("key").asc())
        return agg.withColumn(
            rank_name, F.row_number().over(w).cast("int")
        )

    a = side(period_a, "total_a", "rank_a")
    b = side(period_b, "total_b", "rank_b")
    return a.join(b, "key", "full_outer").select(
        "key",
        "total_a",
        "rank_a",
        "total_b",
        "rank_b",
        (F.col("rank_a") - F.col("rank_b")).cast("int").alias("delta"),
    )


def leadlag_correlation(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    type_a: str,
    type_b: str,
    max_lag: int = 3,
) -> DataFrame:
    """Lead-lag association between two event types' daily-count
    series: for each lag k ∈ [−max_lag, max_lag], the exact BIGINT dot
    product Σ_d cA(d)·cB(d+k) and the overlapping-day count — the
    which-metric-leads-which diagnostic (do signups precede purchases
    by ~2 days?). The raw integer dot product ranks lags exactly;
    Pearson normalization (a float) is the caller's presentation
    choice, deliberately outside the gate (the ranking is what the
    answer is).

    Two day-bounded count aggregates, a (2·max_lag+1)-row lag spine
    broadcast against one of them, one day-keyed equijoin — everything
    after the daily collapse is bounded by days × lags.

    Output (scalar-only): ``(lag int, dot long, n_days long)``.
    """
    if max_lag < 0:
        raise ValueError("leadlag_correlation requires max_lag >= 0")
    daily = (
        df.filter(F.col(type_col).isin(type_a, type_b))
        .groupBy(
            F.to_date(F.col(ts_col)).alias("day"),
            F.col(type_col).alias("__t"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    a = daily.filter(F.col("__t") == type_a).select(
        "day", F.col("n").alias("na")
    )
    b = daily.filter(F.col("__t") == type_b).select(
        F.col("day").alias("bday"), F.col("n").alias("nb")
    )
    lags = df.sparkSession.createDataFrame(
        [(int(k),) for k in range(-max_lag, max_lag + 1)], "lag int"
    )
    return (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("date_add(day, lag) = bday"))
        .groupBy("lag")
        .agg(
            # na·nb in DECIMAL(38,0): two hot types at ~3·10⁹
            # events/day overflow the raw BIGINT product (the same
            # class fano_from_daily already routes through decimal);
            # the final BIGINT cast fails loudly under ANSI if the
            # summed dot itself ever exceeds 2^63
            F.sum(
                F.col("na").cast("decimal(38,0)")
                * F.col("nb").cast("decimal(38,0)")
            )
            .cast("long")
            .alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )


def fano_factor(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Burstiness by the Fano factor (variance-to-mean ratio of daily
    event counts) per key, as an exact integer:
    ``fano_x1000 = (n·Σc² − total²)·1000 div (n·total)`` over the
    day-level counts — ≈1000 for Poisson-like arrivals, ≫1000 for
    bursty ones (the overdispersion sensor beside
    :func:`~salesforce_plugin_spark.operators.timeseries
    .interarrival_stats`'s max-to-mean burst ratio). Quadratic terms
    run in exact DECIMAL(38,0) (the exactmath discipline).

    Two bounded aggregates: events → (key, day) counts → per-key
    sufficient statistics. Output: ``(key…, n_days long, total long,
    fano_x1000 long)``; single-day keys have zero variance by
    construction (fano 0), keys with no events are absent.
    """
    daily = df.groupBy(
        *key_cols, F.to_date(F.col(ts_col)).alias("__d")
    ).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    return fano_from_daily(daily, key_cols)


def fano_from_daily(daily: DataFrame, key_cols: list[str]) -> DataFrame:
    """:func:`fano_factor` from a pre-aggregated ``(key…, __d date,
    __c long)`` daily-count table — the entry point for additive
    daily-count state (the streaming face folds per-batch counts and
    feeds the sum here)."""
    d38 = "decimal(38,0)"
    stats = daily.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__c").cast("long").alias("total"),
        F.sum(F.col("__c").cast(d38) * F.col("__c").cast(d38)).alias("__sq"),
    )
    num = (
        dcast("n_days") + " * __sq"
        + " - " + dcast("total") + " * " + dcast("total")
    )
    den = dcast("n_days") + " * " + dcast("total")
    return stats.select(
        *key_cols,
        "n_days",
        "total",
        F.expr(dfloor(f"({num}) * 1000", den)).alias("fano_x1000"),
    )


def theil_sen_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Theil–Sen robust trend of each key's daily-count series: the
    exact LOWER MEDIAN of all pairwise slopes (cb − ca)/(db − da) — the
    outlier-resistant complement of :func:`group_trend`'s OLS line
    (one corrupted day moves OLS arbitrarily; Theil–Sen tolerates ~29%
    gross errors, the standard robust drift detector for event-volume
    monitoring).

    Exactness: slopes are quantized once to ``slope_ppm = (cb − ca)·10⁶
    div (db − da)`` (integer truncation toward zero — identical in both
    engines), and the median is the element at position ``(n+1) div 2``
    under the TOTAL order (slope_ppm, da, db) — no float, no averaging
    of middle elements, engine-reproducible by construction.

    Scale shape: the day collapse is one partial-combined exchange;
    the pairwise-slope stage is a per-key self-join over the DAY table
    (days²/2 per key — bounded by the observation window, e.g. a year
    is ~66k pairs/key, never corpus-sized); the median window
    partitions by key over those pairs.

    Output (scalar-only): ``(key, n_days long, n_pairs long,
    slope_ppm long)`` — keys with a single day yield no pairs and are
    omitted (no slope is defined).
    """
    daily = (
        df.groupBy(
            F.col(key_col).alias("__k"),
            F.datediff(
                F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
            ).alias("__d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    return theil_sen_from_daily(daily, key_col)


def theil_sen_from_daily(daily: DataFrame, key_col: str) -> DataFrame:
    """:func:`theil_sen_trend` from a pre-aggregated ``(__k, __d, __c)``
    daily-count table — the entry point for additive count state
    (streaming face: daily counts are per-group row counts, so the
    generic additive fold maintains them and this reduction must equal
    the one-shot batch trend)."""
    a = daily.select(
        "__k", F.col("__d").alias("__da"), F.col("__c").alias("__ca")
    )
    b = daily.select(
        F.col("__k").alias("__kb"),
        F.col("__d").alias("__db"),
        F.col("__c").alias("__cb"),
    )
    pairs = a.join(
        b, (F.col("__k") == F.col("__kb")) & (F.col("__da") < F.col("__db"))
    ).select(
        "__k",
        "__da",
        "__db",
        F.expr("(__cb - __ca) * 1000000 div (__db - __da)").alias("__s"),
    )
    w = Window.partitionBy("__k").orderBy("__s", "__da", "__db")
    ranked = pairs.select(
        "__k",
        "__s",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("__k")).alias("__n"),
    )
    n_days = daily.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    med = ranked.filter(
        F.col("__rn") == F.expr("(__n + 1) div 2")
    ).select(
        "__k",
        F.col("__n").cast("long").alias("n_pairs"),
        F.col("__s").cast("long").alias("slope_ppm"),
    )
    return med.join(n_days, "__k").select(
        F.col("__k").alias(key_col), "n_days", "n_pairs", "slope_ppm"
    )


def assoc_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Association rules over the frequent pairs (the Apriori rule step
    on top of :func:`copurchase_pairs`' support counts): for every
    surviving unordered pair, BOTH directed rules ``A → B`` with exact
    integer confidence and lift in ppm —

        conf_ppm = supp(A,B)·10⁶ div supp(A)
        lift_ppm = supp(A,B)·N·10⁶ div (supp(A)·supp(B))

    where ``N`` is the basket count. lift > 10⁶ means the pair
    co-occurs more than independence predicts — the signal that ranks
    recommendation edges and correlated-feature candidates. All
    quadratic products run in DECIMAL(38,0) (supp·N·10⁶ at corpus
    scale is far past 2^63 — the exactmath discipline).

    Plan: pair supports from copurchase_pairs (one self-equijoin), item
    supports from one distinct aggregate, N from a 1-row aggregate
    broadcast by crossJoin; the two item-support attachments are
    broadcastable joins at dimension scale and hash joins otherwise.
    Output (scalar-only): ``(antecedent, consequent, support long,
    conf_ppm long, lift_ppm long)``.
    """
    pairs = copurchase_pairs(df, basket_col, item_col, min_support)
    b = df.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    item_supp = b.groupBy(F.col("__it").alias("__item")).agg(
        F.count(F.lit(1)).alias("__supp")
    )
    n_baskets = b.select(
        F.count_distinct(F.col("__bk")).alias("__n")
    )
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "support",
        )
    )
    out = (
        directed.join(
            F.broadcast(item_supp.withColumnRenamed("__supp", "__supp_a")),
            F.col("antecedent") == F.col("__item"),
        )
        .drop("__item")
        .join(
            F.broadcast(item_supp.withColumnRenamed("__supp", "__supp_b")),
            F.col("consequent") == F.col("__item"),
        )
        .drop("__item")
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        "antecedent",
        "consequent",
        F.col("support").cast("long").alias("support"),
        F.expr(
            dfloor(f"{dcast('support')} * 1000000", dcast("__supp_a"))
        ).alias("conf_ppm"),
        F.expr(
            dfloor(
                f"{dcast('support')} * {dcast('__n')} * 1000000",
                f"{dcast('__supp_a')} * {dcast('__supp_b')}",
            )
        ).alias("lift_ppm"),
    )


def wilson_quality(
    df: DataFrame,
    group_cols: list[str],
    success: Column,
    z_ppm: int = 1960000,
    z2_ppm: int = 3841600,
) -> DataFrame:
    """Per-group success rate with the EXACT-INTEGER Wilson score lower
    bound (95% default) — the small-sample-honest quality ranking: a
    source with 3/3 passing docs must NOT outrank one with 900/1000,
    which the raw rate does and the Wilson lower bound does not (the
    classic ranking fix, Agresti–Coull family). Used to rank sources /
    shards / annotators by a boolean quality gate before weighting
    them into a training mix.

    All arithmetic is DECIMAL(38,0) rationals + the corrected-isqrt
    (z and z² enter as pinned ppm constants; the sqrt term
    √((p̂(1−p̂) + z²/4n)/n) becomes isqrt((4s(n−s)·10⁶ + z²ppm·n)·10⁶·n)
    div (2n²·10⁶) — denominator squared by construction), so the bound
    replays bit-for-bit cross-engine; each floor loses < 1 ppm. The
    binding limit is NOT DECIMAL38 capacity but the corrected-isqrt
    seed (exactmath.isqrt_case): its ±2 CASE pins the double sqrt seed
    only for arguments < 2^104, i.e. n³·10¹² < 2^104 → n ≤ 2.7·10⁶
    rows per group — enforced loudly in-plan (mirroring
    ab_from_counts' documented N·M bound); beyond that, pre-aggregate
    per shard and combine Wilson inputs, not bounds.

    One partial-combined aggregate; everything after is per-group
    scalar arithmetic. Output (scalar-only): ``(*group_cols, n long,
    s long, rate_ppm long, wilson_lb_ppm long)``.
    """
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(success.cast("long")).cast("long").alias("s"),
    )
    return wilson_from_counts(agg, group_cols, z_ppm, z2_ppm)


def wilson_from_counts(
    agg: DataFrame,
    group_cols: list[str],
    z_ppm: int = 1960000,
    z2_ppm: int = 3841600,
) -> DataFrame:
    """:func:`wilson_quality` from a pre-aggregated ``(group, n, s)``
    table — the entry point for additive count state (streaming face:
    trial and success counts are additive, so the generic fold
    maintains them and this reduction must equal the one-shot batch
    bound). Enforces the isqrt-seed validity bound n ≤ 2.7·10⁶ per
    group (the ±2 seed-correction CASE is exact only for arguments
    < 2^104, and the radicand is ≈ n³·10¹²) — beyond it the
    bit-exact cross-engine replay guarantee would silently degrade,
    so it raises instead."""
    from salesforce_plugin_spark.functions.exactmath import isqrt_case

    agg = agg.withColumn(
        "n",
        F.when(
            F.col("n") > 2_700_000,
            F.raise_error(
                F.lit(
                    "wilson_from_counts: n > 2.7e6 exceeds the exact isqrt "
                    "seed bound (radicand n^3*10^12 >= 2^104); pre-aggregate "
                    "per shard and combine counts before scoring"
                )
            ).cast("long"),
        ).otherwise(F.col("n").cast("long")),
    )
    x = (
        f"{dcast('s')} * {dcast('n - s')} * 4000000"
        f" + {dcast(str(z2_ppm))} * {dcast('n')}"
    )
    scored = (
        agg.withColumn("__x", F.expr(f"({x}) * 1000000 * {dcast('n')}"))
        .withColumn(
            "__y0",
            F.expr("CAST(FLOOR(SQRT(CAST(__x AS DOUBLE))) AS decimal(38,0))"),
        )
        .withColumn("__r", F.expr(isqrt_case("__x", "__y0")))
        .withColumn(
            "__a_ppm",
            F.expr(
                dfloor(
                    f"{dcast('s')} * 2000000 + {dcast(str(z2_ppm))}",
                    f"{dcast('n')} * 2",
                )
            ),
        )
        .withColumn(
            "__b_ppm",
            F.expr(
                dfloor(
                    f"{dcast(str(z_ppm))} * __r",
                    f"{dcast('n')} * {dcast('n')} * 2000000",
                )
            ),
        )
    )
    lb = dfloor(
        f"({dcast('__a_ppm')} - {dcast('__b_ppm')}) * {dcast('n')} * 1000000",
        f"{dcast('n')} * 1000000 + {dcast(str(z2_ppm))}",
    )
    return scored.select(
        *group_cols,
        "n",
        "s",
        F.expr(dfloor(f"{dcast('s')} * 1000000", dcast("n"))).alias(
            "rate_ppm"
        ),
        F.greatest(F.expr(lb), F.lit(0).cast("long")).alias("wilson_lb_ppm"),
    )


def ab_test_z(
    df: DataFrame,
    arm: Column,
    success: Column,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-proportion z-test in EXACT integer arithmetic — the
    experiment read-out (did arm B really lift the success rate?) as a
    replayable artifact: with d = s1·n2 − s2·n1, pooled S = s1+s2,
    N = n1+n2, M = n1·n2·S·(N−S),

        z = d·√(N/M)  ⇒  z_milli = sign(d)·(1000·|d|·isqrt(N·M)) div M

    (√(N/M) = √(N·M)/M — the denominator squared by construction, the
    wilson_quality discipline), so both engines surface the identical
    signed milli-z and the same significance verdict at |z| ≥ 1.96.
    Degenerate pools (S = 0 or S = N: no variance) surface NULL z.
    Valid while N·M < 2^104 (isqrt seed bound: ~10⁶ rows per
    comparison; beyond that pre-aggregate counts per shard first —
    they are additive).

    ``arm`` must be a deterministic 0/1 assignment (id parity, hash
    bucket — never RNG, or the artifact can't replay). One
    partial-combined aggregate, scalar arithmetic after. Output
    (scalar-only): ``(*group_cols, n1, s1, n2, s2 long, p1_ppm,
    p2_ppm, diff_ppm long, z_milli long, significant int)``.
    """
    groups = group_cols or []
    agg = df.groupBy(*groups).agg(
        F.sum(F.when(arm == 0, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when((arm == 0) & success.cast("boolean"), 1).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when((arm == 1) & success.cast("boolean"), 1).otherwise(0))
        .cast("long")
        .alias("s2"),
    )
    return ab_from_counts(agg, groups)


def ab_from_counts(agg: DataFrame, group_cols: list[str]) -> DataFrame:
    """:func:`ab_test_z` from a pre-aggregated ``(group, n1, s1, n2,
    s2)`` table — the entry point for additive count state (streaming
    face: arm trial/success counts are additive, so the generic fold
    maintains them and this reduction must equal the one-shot batch
    read-out — the live-experiment monitor)."""
    from salesforce_plugin_spark.functions.exactmath import isqrt_case

    groups = group_cols
    scored = (
        agg.withColumn(
            "__d", F.expr(f"{dcast('s1')} * {dcast('n2')} - {dcast('s2')} * {dcast('n1')}")
        )
        .withColumn(
            "__m",
            F.expr(
                f"{dcast('n1')} * {dcast('n2')} * {dcast('s1 + s2')}"
                f" * {dcast('n1 + n2 - s1 - s2')}"
            ),
        )
        .withColumn("__nm", F.expr(f"{dcast('n1 + n2')} * __m"))
        .withColumn(
            "__y0",
            F.expr("CAST(FLOOR(SQRT(CAST(__nm AS DOUBLE))) AS decimal(38,0))"),
        )
        .withColumn("__r", F.expr(isqrt_case("__nm", "__y0")))
        .withColumn(
            "__z",
            F.when(
                F.expr("__m = 0"), F.lit(None).cast("long")
            ).otherwise(
                F.expr("CASE WHEN __d < 0 THEN -1 ELSE 1 END").cast("long")
                * F.expr(dfloor("ABS(__d) * 1000 * __r", "__m"))
            ),
        )
    )
    return scored.select(
        *groups,
        "n1",
        "s1",
        "n2",
        "s2",
        F.expr(dfloor(f"{dcast('s1')} * 1000000", dcast("n1"))).alias("p1_ppm"),
        F.expr(dfloor(f"{dcast('s2')} * 1000000", dcast("n2"))).alias("p2_ppm"),
        F.expr(
            dfloor(
                f"({dcast('s1')} * {dcast('n2')} - {dcast('s2')} * {dcast('n1')})"
                " * 1000000",
                f"{dcast('n1')} * {dcast('n2')}",
            )
        ).alias("diff_ppm"),
        F.col("__z").alias("z_milli"),
        F.when(F.abs(F.col("__z")) >= 1960, 1).otherwise(0).cast("int").alias(
            "significant"
        ),
    )


def calibration_bins(
    df: DataFrame,
    score: Column,
    outcome: Column,
    lo: int,
    hi: int,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability curve of an integer score against a boolean outcome
    — the eval that decides whether a cheap quality score can gate a
    corpus at a given threshold: per fixed-width score bin, the exact
    observed outcome rate next to the bin's mean score (a calibrated
    scorer tracks the diagonal; a miscalibrated one gates garbage in
    or gold out). Fixed-width integer bins, NOT percentile bins — a
    decile binning needs a global sort and its cut points drift with
    the corpus, while fixed edges are one map-side expression and
    comparable across runs (the binned_quantiles tradeoff, chosen the
    other way because calibration WANTS stable bin meanings).

    All-integer surface: mean score in milli (exact DECIMAL sum, one
    floor divide), rate in ppm. Out-of-range scores clamp to the edge
    bins (visible as mass, never dropped). One partial-combined
    aggregate bounded by n_bins. Output (scalar-only): ``(bin int,
    n long, mean_score_milli long, rate_ppm long)``.
    """
    if hi <= lo:
        raise ValueError("calibration_bins requires hi > lo")
    width = hi - lo
    # integer `div`, not a double divide + int cast: Spark's double→int
    # cast truncates while DuckDB's ROUNDS, so a float path would
    # diverge at bin edges; clamping makes the negative-numerator
    # trunc-vs-floor question moot (everything below lo lands in bin 0)
    binned = df.select(
        score.cast("long").alias("__score"),
        outcome.cast("int").alias("__ok"),
    ).withColumn(
        "bin",
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.expr(
                    f"CAST(((__score - {lo}) * {n_bins})"
                    f" div {width} AS INT)"
                ),
            ),
        ),
    )
    agg = (
        binned
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("__score").cast(D38)).alias("__sum_score"),
            F.sum("__ok").cast("long").alias("__s"),
        )
    )
    return agg.select(
        "bin",
        "n",
        F.expr(dfloor(f"{dcast('__sum_score')} * 1000", dcast("n"))).alias(
            "mean_score_milli"
        ),
        F.expr(dfloor(f"{dcast('__s')} * 1000000", dcast("n"))).alias(
            "rate_ppm"
        ),
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    top_k: int = 5,
) -> DataFrame:
    """Item-item collaborative filtering over binary co-occurrence
    (Sarwar et al. 2001, the classic "customers who bought X also
    bought Y" recommender): each item's vector over baskets is binary,
    so ``cos(i, j) = c_ij / √(c_i·c_j)`` with c_ij from
    :func:`copurchase_pairs` and c_i the item's basket count — and the
    whole score is EXACT via the shared corrected-isqrt cosine
    (``vector.with_exact_cos_ppm``: dot = support, squared norms = the
    basket counts). Each item keeps its ``top_k`` neighbors by
    (cos_ppm desc, neighbor asc) — the total order that replays
    cross-engine.

    Shape: the copurchase pair space (basket-bounded, min_support
    floor) mirrored once for both directions, item counts broadcast,
    one item-partitioned window for top-k. No stage touches the raw
    basket×basket space.

    Output (scalar-only): ``(item, neighbor, support long, cos_ppm
    long, rank int)``.
    """
    b = df.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    counts = b.groupBy(F.col("__it").alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pairs = copurchase_pairs(df, basket_col, item_col, min_support)
    return item_similarity_from_counts(pairs, counts, top_k=top_k)


def item_similarity_from_counts(
    pairs: DataFrame,
    counts: DataFrame,
    min_support: int | None = None,
    top_k: int = 5,
) -> DataFrame:
    """:func:`item_similarity` from pre-aggregated ``(item_a, item_b,
    support)`` pair counts and ``(item, c)`` basket counts — the entry
    point for additive co-occurrence state. Streaming contract: both
    inputs are additive ONLY under basket-complete batch slices (a
    basket split across two batches loses its cross-batch pairs — the
    slicing key must be the basket id, not arbitrary rows), and the
    ``min_support`` floor must be applied HERE on merged totals, never
    per batch (a pair at support 1+1 across two batches is support 2).
    """
    from salesforce_plugin_spark.functions.vector import with_exact_cos_ppm

    if min_support is not None:
        pairs = pairs.filter(F.col("support") >= min_support)
    both = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("neighbor"),
        "support",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("neighbor"),
            "support",
        )
    )
    d38 = "decimal(38,0)"
    joined = (
        both.join(
            F.broadcast(counts.withColumnRenamed("c", "__ca")), "item"
        )
        .join(
            F.broadcast(
                counts.select(
                    F.col("item").alias("neighbor"),
                    F.col("c").alias("__cb"),
                )
            ),
            "neighbor",
        )
        .withColumn("__dot", F.col("support").cast(d38))
        .withColumn("__na", F.col("__ca").cast(d38))
        .withColumn("__nb", F.col("__cb").cast(d38))
    )
    scored = with_exact_cos_ppm(joined, "__dot", "__na", "__nb")
    w = Window.partitionBy("item").orderBy(
        F.col("cos_ppm").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_k)
        .select("item", "neighbor", "support", "cos_ppm", "rank")
    )


def autocorrelation_daily(
    df: DataFrame,
    type_col: str,
    ts_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-type daily-count self-association: for every event type and
    lag k ∈ [0, max_lag], the exact BIGINT dot Σ_d c(d)·c(d+k) and the
    overlapping-day count — :func:`leadlag_correlation`'s machinery
    turned inward (does the series persist day over day? does k=7 spike
    — weekly seasonality?). Lag 0 is the raw energy Σc², the natural
    normalizer: a reader ranks lags by dot/n_days against it, and that
    (float) presentation stays outside the gate exactly as in the
    cross-type operator.

    One daily collapse (day × type bounded), a (max_lag+1)-row spine
    broadcast, one self-equijoin on (type, day+k) — everything after
    the collapse is bounded by days × types × lags.

    Output (scalar-only): type col + ``(lag int, dot long, n_days
    long)``.
    """
    if max_lag < 0:
        raise ValueError("autocorrelation_daily requires max_lag >= 0")
    daily = df.groupBy(
        F.col(type_col).alias("__t"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return autocorr_from_daily(daily, type_col, max_lag)


def autocorr_from_daily(
    daily: DataFrame, type_col: str, max_lag: int = 3
) -> DataFrame:
    """:func:`autocorrelation_daily` from a pre-aggregated ``(__t, day,
    n)`` daily-count table — the additive-daily-state entry point (the
    changepoint_from_daily precedent; the streaming face feeds the
    summed fold here)."""
    df = daily
    lags = df.sparkSession.createDataFrame(
        [(int(k),) for k in range(0, max_lag + 1)], "lag int"
    )
    b = daily.select(
        F.col("__t").alias("__tb"),
        F.col("day").alias("bday"),
        F.col("n").alias("nb"),
    )
    return (
        daily.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("__t") == F.col("__tb"))
            & F.expr("date_add(day, lag) = bday"),
        )
        .groupBy(F.col("__t").alias(type_col), "lag")
        .agg(
            F.sum(
                F.col("n").cast("decimal(38,0)")
                * F.col("nb").cast("decimal(38,0)")
            )
            .cast("long")
            .alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )
