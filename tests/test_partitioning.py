"""Skew/bucketing utilities: salted join equivalence, skew profiling,
bucketed co-located joins (no exchange in the plan)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from salesforce_plugin_spark.operators.partitioning import (
    explain_skew,
    salted_join,
    write_bucketed,
)


def skewed_fixture(spark):
    # one hot key (90%) + a long tail
    rows = [(0, f"v{i}") for i in range(900)] + [
        (k, f"v{k}") for k in range(1, 101)
    ]
    fact = spark.createDataFrame(rows, ["k", "payload"])
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(101)], ["k", "dval"])
    return fact, dim


def test_salted_join_equals_plain_join(spark):
    fact, dim = skewed_fixture(spark)
    plain = fact.join(dim, "k").select("k", "payload", "dval")
    salted = salted_join(fact, dim, "k", salt=8).select("k", "payload", "dval")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    fact, dim = skewed_fixture(spark)
    extra = spark.createDataFrame([(999, "orphan")], ["k", "payload"])
    fact2 = fact.union(extra)
    out = salted_join(fact2, dim, "k", how="left", salt=4)
    orphan = out.filter(F.col("k") == 999).collect()
    assert len(orphan) == 1 and orphan[0].dval is None


def test_explain_skew_finds_hot_key(spark):
    fact, _ = skewed_fixture(spark)
    prof = explain_skew(fact, "k", top=3).collect()
    assert prof[0].k == 0 and prof[0].share == 0.9


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("w", F.col("id") + 1)
    import shutil

    for t in ("t_bucket_a", "t_bucket_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a stale warehouse dir from a killed run blocks CREATE even though
        # the (session-scoped) catalog has no such table
        shutil.rmtree(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
            + f"/{t}",
            ignore_errors=True,
        )
    write_bucketed(a, "t_bucket_a", ["id"], num_buckets=8)
    write_bucketed(b, "t_bucket_b", ["id"], num_buckets=8)
    # disable auto-broadcast: at toy size the planner would broadcast and
    # skip bucketed reads entirely; at real scale SMJ is the strategy
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "id")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        # co-located: SortMergeJoin with no shuffle exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE t_bucket_a")
    spark.sql("DROP TABLE t_bucket_b")
