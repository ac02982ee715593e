"""F3 IVF ANN (recall vs exact brute force) and F6 custom stateful
streaming (applyInPandasWithState running totals)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from salesforce_plugin_spark.functions.vector import cosine_topk, ivf_index, ivf_topk


@pytest.fixture(scope="module")
def vecs(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(300)
    ]
    return spark.createDataFrame(rows, "id long, v array<float>")


def test_ivf_recall_against_brute_force(vecs, spark):
    qvec = [float(x) for x in vecs.filter(F.col("id") == 0).collect()[0].v]
    q = vecs.filter(F.col("id") == 0).select(F.col("v").alias("q_vec"))
    exact = [r.id for r in cosine_topk(vecs, "id", "v", q, k=10).collect()]

    assigned, centroids = ivf_index(vecs, "id", "v", nlist=8)
    approx = [
        r.id
        for r in ivf_topk(
            assigned, centroids, qvec, "id", "v", k=10, nprobe=4
        ).collect()
    ]
    # self-match always found; recall@10 with half the lists probed ≥ 50%
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) >= 5
    # probing every list is exhaustive → identical to brute force
    full = [
        r.id
        for r in ivf_topk(
            assigned, centroids, qvec, "id", "v", k=10, nprobe=8
        ).collect()
    ]
    assert full == exact


def test_ivf_assignment_is_deterministic(vecs):
    a1, c1 = ivf_index(vecs, "id", "v", nlist=4, seed=11)
    a2, c2 = ivf_index(vecs, "id", "v", nlist=4, seed=11)
    assert c1 == c2
    assert a1.select("id", "centroid_id").collect() == a2.select(
        "id", "centroid_id"
    ).collect()


def test_running_user_totals_stateful_stream(spark, tmp_path):
    from salesforce_plugin_spark.streaming.stateful import running_user_totals
    from salesforce_plugin_spark.streaming.windows import stream_events

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, int((base + dt.timedelta(minutes=i)).timestamp() * 1e9),
         i % 2, "e", float(i), "{}")
        for i in range(10)
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, "
              "value double, props string"
    ).write.mode("overwrite").parquet(src)

    q = (
        running_user_totals(stream_events(spark, src))
        .writeStream.format("memory")
        .queryName("t_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user is the final running total
    got = {
        r.user_id: r
        for r in spark.table("t_totals").collect()
    }
    assert got[0].n_events == 5 and got[0].total_value == 0 + 2 + 4 + 6 + 8
    assert got[1].n_events == 5 and got[1].total_value == 1 + 3 + 5 + 7 + 9
    # last_ts_us reflects the newest event per user (user 1 saw minute 9)
    expect_us = int((base + dt.timedelta(minutes=9)).timestamp() * 1e6)
    assert got[1].last_ts_us == expect_us
