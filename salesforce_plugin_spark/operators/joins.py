"""Custom join operators Spark's API lacks natively (SURVEY §4 "custom
operators" rubric): as-of join and bucketed range join, built as
compositions of existing DataFrame ops — no UDFs, no mapPartitions.

As-of join (the time-series enrichment primitive): for each left row,
attach the latest right row with ``right.time <= left.time`` per key.
Implemented with the union-and-carry-forward construction: tag both
inputs, sort each key partition by (time, side), and carry the last seen
right row forward with an ``ignorenulls`` window ``last``. One shuffle on
the key, one intra-partition sort — the same shape a dedicated
time-series engine uses, and it scales with the shuffle, not with pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list[str],
    tolerance: str | None = None,
    right_suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join, matched on the ``by`` keys. ``direction="backward"``
    (default): latest right row at-or-before each left row's
    ``time_col`` — the feature-lookup shape. ``direction="forward"``:
    earliest right row at-or-after — the next-event/label-lookahead
    shape. ``direction="nearest"``: whichever of the two is closer in
    time, ties going backward (full pandas ``merge_asof`` parity; two
    passes of the same plan, still join-free). Unmatched left rows get
    nulls. ``tolerance`` (an INTERVAL string like '2 hours') bounds
    staleness (backward) / lookahead (forward).

    Both directions share ONE plan shape: union both sides, one
    exchange + sort per ``by`` key, a running last-non-null window —
    no join node at all, so there is nothing to skew (`PLANS.md
    q_asof_join`); forward simply sorts time descending.

    Output columns: all of ``left``'s, plus each right non-key column
    suffixed with ``right_suffix`` (including the right row's time).
    """
    if direction == "nearest":
        # closest match in either direction; ties (equal |Δt|) go backward.
        # Two single-exchange passes + a struct comparison — still no join.
        b = asof_join(left, right, time_col, by, tolerance, "__b", "backward")
        f = asof_join(b, right, time_col, by, tolerance, "__f", "forward")
        bt = F.col(f"{time_col}__b")
        ft = F.col(f"{time_col}__f")
        lt = F.col(time_col)
        use_b = F.when(ft.isNull(), F.lit(True)).otherwise(
            bt.isNotNull() & ((lt - bt) <= (ft - lt))
        )
        r_val_cols_n = [c for c in right.columns if c not in by]
        return f.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(use_b, F.col(f"{c}__b"))
                .otherwise(F.col(f"{c}__f"))
                .alias(f"{c}{right_suffix}")
                for c in r_val_cols_n
            ],
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'"
        )
    r_val_cols = [c for c in right.columns if c not in by]
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    r_struct = F.struct(*[F.col(c) for c in r_val_cols]).alias("__r")
    l_type = left.select(l_struct).schema["__l"].dataType
    r_type = right.select(r_struct).schema["__r"].dataType

    tagged_l = left.select(
        *[F.col(c) for c in by],
        F.col(time_col).alias("__t"),
        l_struct,
        F.lit(None).cast(r_type).alias("__r"),
        F.lit(1).alias("__side"),
    )
    tagged_r = right.select(
        *[F.col(c) for c in by],
        F.col(time_col).alias("__t"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct,
        F.lit(0).alias("__side"),
    )
    # right rows sort before left rows at equal timestamps → "at or
    # before" (backward) / "at or after" (forward, time descending)
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(t_order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    combined = tagged_l.unionByName(tagged_r).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = combined.filter(F.col("__side") == 1)
    if tolerance is not None:
        if direction == "backward":
            fresh = F.col("__match").getField(time_col) >= (
                F.col("__t") - F.expr(f"INTERVAL {tolerance}")
            )
        else:
            fresh = F.col("__match").getField(time_col) <= (
                F.col("__t") + F.expr(f"INTERVAL {tolerance}")
            )
        out = out.withColumn(
            "__match", F.when(fresh, F.col("__match")).otherwise(F.lit(None))
        )
    return out.select(
        *[F.col("__l").getField(c).alias(c) for c in left.columns],
        *[
            F.col("__match").getField(c).alias(f"{c}{right_suffix}")
            for c in r_val_cols
        ],
    )


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join without a cartesian: both sides are exploded
    onto fixed-width buckets (epoch-second units), joined on (bucket, keys)
    as a plain equi-join, then exact-filtered. Reducer load is bounded by
    rows-per-bucket, never |points|×|intervals|.

    Intervals longer than ``bucket_width`` replicate once per covered
    bucket — pick the width near the median interval length.
    """
    keys = extra_keys or []
    p = points.withColumn(
        "__bucket", (F.unix_seconds(F.col(point_col)) / bucket_width).cast("long")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_seconds(F.col(start_col)) / bucket_width).cast("long"),
                (F.unix_seconds(F.col(end_col)) / bucket_width).cast("long"),
            )
        ),
    )
    joined = p.join(i, ["__bucket", *keys])
    return joined.filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    ).drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Interval×interval overlap join without a cartesian (the general
    form of :func:`range_join_bucketed`, whose points are zero-width
    intervals): both sides explode onto fixed-width epoch-second buckets,
    equi-join on (bucket, keys), then exact-filter the closed-interval
    overlap predicate ``l_start <= r_end AND r_start <= l_end``.

    A pair of long intervals can share MANY buckets; emitting the pair
    once per shared bucket and ``distinct``-ing after would re-shuffle
    the entire join output. Instead each surviving pair is kept only in
    the bucket containing the overlap's start (``greatest(l_start,
    r_start)``) — a post-join scalar predicate, so every pair appears
    exactly once with NO dedup exchange.
    """
    keys = extra_keys or []

    def bucketed(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    (F.unix_seconds(F.col(start)) / bucket_width).cast("long"),
                    (F.unix_seconds(F.col(end)) / bucket_width).cast("long"),
                )
            ),
        )

    joined = bucketed(left, l_start, l_end).join(
        bucketed(right, r_start, r_end), ["__bucket", *keys]
    )
    overlap_start = F.greatest(F.col(l_start), F.col(r_start))
    return joined.filter(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (
            F.col("__bucket")
            == (F.unix_seconds(overlap_start) / bucket_width).cast("long")
        )
    ).drop("__bucket")
