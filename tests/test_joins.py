"""Custom joins: as-of (backward, tolerance, equal-ts inclusivity) and
bucketed range join (equivalence to the naive inequality join)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from salesforce_plugin_spark.operators.joins import asof_join, range_join_bucketed

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_backward_basic(spark):
    trades = spark.createDataFrame(
        [("A", ts(10), 1), ("A", ts(30), 2), ("B", ts(5), 3)],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [("A", ts(0), 100.0), ("A", ts(25), 105.0), ("B", ts(50), 42.0)],
        "sym string, ts timestamp, px double",
    )
    out = {r.trade_id: r for r in asof_join(trades, quotes, "ts", ["sym"]).collect()}
    assert out[1].px_r == 100.0          # latest quote before min 10 is min 0
    assert out[2].px_r == 105.0
    assert out[3].px_r is None           # B's only quote is in the future


def test_asof_equal_timestamp_is_inclusive(spark):
    l = spark.createDataFrame([("A", ts(10), 1)], "k string, ts timestamp, i int")
    r = spark.createDataFrame([("A", ts(10), 7.0)], "k string, ts timestamp, v double")
    out = asof_join(l, r, "ts", ["k"]).collect()[0]
    assert out.v_r == 7.0                # "at or before" includes equal ts


def test_asof_tolerance_drops_stale_matches(spark):
    l = spark.createDataFrame([("A", ts(120), 1)], "k string, ts timestamp, i int")
    r = spark.createDataFrame([("A", ts(0), 9.0)], "k string, ts timestamp, v double")
    fresh = asof_join(l, r, "ts", ["k"], tolerance="3 HOURS").collect()[0]
    assert fresh.v_r == 9.0
    stale = asof_join(l, r, "ts", ["k"], tolerance="1 HOUR").collect()[0]
    assert stale.v_r is None


def test_range_join_bucketed_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, ts(i * 7)) for i in range(40)], "pid long, pt timestamp"
    )
    intervals = spark.createDataFrame(
        [(100, ts(0), ts(30)), (200, ts(25), ts(120)), (300, ts(500), ts(600))],
        "iid long, lo timestamp, hi timestamp",
    )
    naive = points.join(
        intervals, (F.col("pt") >= F.col("lo")) & (F.col("pt") <= F.col("hi"))
    ).select("pid", "iid")
    bucketed = range_join_bucketed(
        points, intervals, "pt", "lo", "hi", bucket_width=600
    ).select("pid", "iid")
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, naive.collect())
    )
    assert bucketed.count() > 0


def test_asof_forward_picks_next_at_or_after(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.joins import asof_join

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 10, ts(10)), (1, 11, ts(50)), (2, 20, ts(0))],
        "k int, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 100, ts(10)), (1, 101, ts(30)), (1, 102, ts(60))],
        "k int, rid int, ts timestamp",
    )
    out = {r.lid: r.rid_r for r in asof_join(
        left, right, "ts", by=["k"], direction="forward"
    ).collect()}
    assert out[10] == 100       # equal timestamp counts ("at or after")
    assert out[11] == 102       # next one after minute 50
    assert out[20] is None      # key 2 has no right rows


def test_asof_forward_tolerance_bounds_lookahead(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.joins import asof_join

    t0 = _dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 1, t0)], "k int, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 9, t0 + _dt.timedelta(hours=3))], "k int, rid int, ts timestamp"
    )
    hit = asof_join(left, right, "ts", ["k"], tolerance="4 hours",
                    direction="forward").collect()[0]
    assert hit.rid_r == 9
    miss = asof_join(left, right, "ts", ["k"], tolerance="2 hours",
                     direction="forward").collect()[0]
    assert miss.rid_r is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, right, "ts", ["k"], direction="sideways")


def test_asof_nearest_picks_closer_side_with_backward_ties(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.joins import asof_join

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 1, ts(10)), (1, 2, ts(28)), (1, 3, ts(20)), (1, 4, ts(15))],
        "k int, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 100, ts(0)), (1, 101, ts(30)), (1, 102, ts(40))],
        "k int, rid int, ts timestamp",
    )
    out = {r.lid: r.rid_r for r in asof_join(
        left, right, "ts", ["k"], direction="nearest"
    ).collect()}
    assert out[1] == 100   # 10 back vs 20 forward
    assert out[2] == 101   # 28 back vs 2 forward
    assert out[3] == 101   # 20 back vs 10 forward
    assert out[4] == 100   # exact tie (15 vs 15) goes backward
