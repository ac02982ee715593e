"""C1-C8 row/column transforms (SURVEY §5.3): flattener edge cases, epoch
seconds-vs-millis duality, newline scrub, truncation, fetch-time."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from salesforce_plugin_spark.operators.transforms import (
    add_fetch_time,
    coerce_to_epoch_seconds,
    decode_epoch_millis,
    drop_attributes,
    flatten_relationship,
    nest_children,
    scrub_newlines,
    truncate_varchar,
)

UTC = dt.timezone.utc


def test_flatten_replaces_parents_with_children(spark):
    parent = spark.createDataFrame(
        [(1, [(10, "a"), (11, "b")]), (2, [])],  # parent 2 has no children
        "pid int, kids array<struct<kid:int, v:string>>",
    )
    out = flatten_relationship(parent, "kids")
    rows = sorted((r.kid, r.v) for r in out.collect())
    # childless parent contributes nothing (explode, not explode_outer)
    assert rows == [(10, "a"), (11, "b")]
    assert out.columns == ["kid", "v"]


def test_flatten_null_relationship_drops_row(spark):
    parent = spark.createDataFrame(
        [(1, None)], "pid int, kids array<struct<kid:int>>"
    )
    assert flatten_relationship(parent, "kids").count() == 0


def test_nest_then_flatten_roundtrip(spark):
    parent = spark.createDataFrame([(1, "p1"), (2, "p2")], ["pk", "pname"])
    child = spark.createDataFrame([(1, 100), (1, 101)], ["fk", "cval"])
    nested = nest_children(parent, child, "pk", "fk", "kids")
    # parent without children gets a null array, matching SOQL nesting
    by_pk = {r.pk: r.kids for r in nested.collect()}
    assert by_pk[2] is None and len(by_pk[1]) == 2
    flat = flatten_relationship(nested, "kids")
    assert sorted((r.fk, r.cval) for r in flat.collect()) == [(1, 100), (1, 101)]


def test_drop_attributes_only_if_present(spark):
    df = spark.createDataFrame([(1, "m")], ["id", "attributes"])
    assert drop_attributes(df).columns == ["id"]
    df2 = spark.createDataFrame([(1,)], ["id"])
    assert drop_attributes(df2).columns == ["id"]


def test_epoch_seconds_vs_millis_duality(spark):
    ts = dt.datetime(2020, 4, 4, 12, 30, 0)
    df = spark.createDataFrame([(ts,)], "t timestamp")
    sec = coerce_to_epoch_seconds(df).collect()[0].t
    assert sec == 1586003400  # C3: epoch seconds, UTC
    decoded = df.select(
        decode_epoch_millis(F.unix_millis(F.col("t"))).alias("d")
    ).collect()[0].d
    assert decoded == ts  # C8: epoch millis round-trips


def test_coerce_discovers_temporal_columns(spark):
    df = spark.createDataFrame(
        [(dt.date(2020, 1, 2), dt.datetime(2020, 1, 2, 3, 4, 5), "x")],
        "d date, t timestamp, s string",
    )
    out = coerce_to_epoch_seconds(df)
    row = out.collect()[0]
    assert isinstance(row.d, int) and isinstance(row.t, int) and row.s == "x"


def test_scrub_newlines(spark):
    df = spark.createDataFrame([("a\r\nb\rc\nd",)], ["s"])
    assert df.select(scrub_newlines(F.col("s")).alias("s")).collect()[0].s == "abcd"


def test_truncate_varchar(spark):
    df = spark.createDataFrame([("abcdefgh", "keep")], ["a", "b"])
    out = truncate_varchar(df, {"a": 3}).collect()[0]
    assert out.a == "abc" and out.b == "keep"


def test_add_fetch_time_column(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    out = add_fetch_time(df)
    assert "time_fetched_from_salesforce" in out.columns
    assert out.collect()[0].time_fetched_from_salesforce is not None
