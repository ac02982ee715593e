"""Round-7 ADVICE fixes and the replay-idempotent additive stream
folds: wilson isqrt-seed n bound, ann_ndcg k overflow guard, sssp
NULL-weight loudness, additive-sum integral-type assertion, and the
crash-replay idempotence of the per-batch-partition state writes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- wilson


def test_wilson_within_bound_still_exact(spark):
    """Values below the 2.7e6 seed bound are unchanged by the guard."""
    from salesforce_plugin_spark.operators.analytics import (
        wilson_from_counts,
    )

    agg = spark.createDataFrame(
        [("a", 1000, 900), ("b", 3, 3)], "g string, n long, s long"
    )
    rows = {
        r.g: r for r in wilson_from_counts(agg, ["g"]).collect()
    }
    # 900/1000 must outrank 3/3 on the lower bound (the ranking fix)
    assert rows["a"].wilson_lb_ppm > rows["b"].wilson_lb_ppm
    assert rows["a"].rate_ppm == 900000
    # classic Wilson lower bound for 900/1000 at z=1.96 is ~0.8797
    assert 879000 <= rows["a"].wilson_lb_ppm <= 881000


def test_wilson_raises_beyond_isqrt_seed_bound(spark):
    """n past 2.7e6 exceeds the isqrt ±2 seed-correction window
    (radicand ≥ 2^104): must raise loudly, not silently degrade the
    bit-exact replay guarantee."""
    from salesforce_plugin_spark.operators.analytics import (
        wilson_from_counts,
    )

    agg = spark.createDataFrame(
        [("big", 5_000_000, 2_500_000)], "g string, n long, s long"
    )
    with pytest.raises(Exception, match="isqrt seed bound"):
        wilson_from_counts(agg, ["g"]).collect()


def test_wilson_boundary_n_is_exact(spark):
    """At the enforced boundary itself (n = 2.7e6) the integer bound
    must still match the closed-form Wilson formula to < 2 ppm."""
    import math

    from salesforce_plugin_spark.operators.analytics import (
        wilson_from_counts,
    )

    n, s = 2_700_000, 1_350_000
    agg = spark.createDataFrame([("edge", n, s)], "g string, n long, s long")
    got = wilson_from_counts(agg, ["g"]).collect()[0].wilson_lb_ppm
    z = 1.96
    p = s / n
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    rad = z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
    expect = (center - rad) / denom * 1e6
    assert abs(got - expect) < 2


# ---------------------------------------------------------------- ndcg


def test_ann_ndcg_rejects_overflowing_k():
    from salesforce_plugin_spark.functions.vector import ann_ndcg

    with pytest.raises(ValueError, match="overflows silently past k=36"):
        ann_ndcg(None, "id", "v", None, None, k=37)
    with pytest.raises(ValueError, match="k=0"):
        ann_ndcg(None, "id", "v", None, None, k=0)


def test_ndcg_gain_bound_arithmetic():
    """k=36 is safely inside the BIGINT frontier: the worst-case DCG
    is Σ_{j=1..k}(2^j−1)·10⁶ (rel values are distinct ≤ k, discounts
    ≤ 10⁶), which fits at 36 with a wide margin, while an unguarded
    large k (worst-case sum at k=43, ≈2^44·10⁶) genuinely exceeds 2^63 — i.e. the
    guard is conservative but the hazard is real."""
    assert sum(((1 << j) - 1) * 10**6 for j in range(1, 37)) < 2**63
    assert sum(((1 << j) - 1) * 10**6 for j in range(1, 44)) > 2**63


# ---------------------------------------------------------------- sssp


def test_sssp_null_weight_raises(spark):
    from salesforce_plugin_spark.functions.graph import sssp_fixed

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, None)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception, match="NULL or negative"):
        sssp_fixed(edges, seeds, rounds=3).collect()


def test_sssp_negative_weight_still_raises(spark):
    from salesforce_plugin_spark.functions.graph import sssp_fixed

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, -1)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception, match="NULL or negative"):
        sssp_fixed(edges, seeds, rounds=3).collect()


# ------------------------------------------------- additive stream folds


def test_additive_sums_rejects_double_columns(spark, tmp_path):
    """A double sum column would be silently truncated by the exact
    BIGINT fold — the assertion must fire before any state is
    written."""
    from salesforce_plugin_spark.streaming.upsert import (
        _assert_integral_sum_cols,
    )

    bad = spark.createDataFrame([(1, 0.5)], "g int, v double")
    with pytest.raises(TypeError, match="non-integral"):
        _assert_integral_sum_cols(bad, ["v"])
    # integral and scale-0 decimal pass
    ok = spark.createDataFrame([(1, 2)], "g int, v long").withColumn(
        "d", F.col("v").cast("decimal(38,0)")
    ).withColumn("b", F.lit(True))
    _assert_integral_sum_cols(ok, ["v", "d", "b"])
    # decimal with scale > 0 fails
    frac = ok.withColumn("f", F.col("v").cast("decimal(10,2)"))
    with pytest.raises(TypeError, match="non-integral"):
        _assert_integral_sum_cols(frac, ["f"])


def test_batch_partial_replay_is_idempotent(spark, tmp_path):
    """Folding the SAME batch id twice (a foreachBatch retry after a
    crash mid-write) leaves the summed state unchanged — the
    at-least-once guarantee the ``__b=<id>`` overwrite layout buys."""
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        write_batch_partials,
    )

    state = str(tmp_path / "counts")
    partials = spark.createDataFrame(
        [("a", 3), ("b", 2)], "cell string, n long"
    )
    write_batch_partials(partials, state, 0)
    once = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    # replay the same batch id — state must not double
    write_batch_partials(partials, state, 0)
    twice = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert once == twice == {"a": 3, "b": 2}
    # a genuinely new batch id still adds
    write_batch_partials(
        spark.createDataFrame([("a", 1)], "cell string, n long"), state, 1
    )
    final = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert final == {"a": 4, "b": 2}


def test_additive_counts_stream_replay_safe_end_to_end(spark, tmp_path):
    """Run the real availableNow fold, then simulate a retry of the
    LAST batch id by re-invoking the per-batch write with identical
    rows: the read-out must equal the one-shot batch count."""
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
        write_batch_partials,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100)],
        "id long, cell string",
    ).repartition(4).write.parquet(src)
    stream = spark.readStream.schema("id long, cell string").parquet(src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    run_stream_additive_counts(stream, state, ckpt, ["cell"])
    before = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert before == {"even": 50, "odd": 50}
    # replay batch id 0 with the same partials (what a retry produces)
    import os

    batch_dirs = [d for d in os.listdir(state) if d.startswith("__b=")]
    assert batch_dirs, "expected per-batch partition layout"
    bid = int(batch_dirs[0].split("=")[1])
    replay = spark.read.parquet(os.path.join(state, batch_dirs[0]))
    write_batch_partials(replay.localCheckpoint(eager=True), state, bid)
    after = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert after == before


def test_max_registers_batch_layout(spark, tmp_path):
    """The MAX-register fold also lands per-batch partitions so a
    retry cannot grow state."""
    from salesforce_plugin_spark.streaming.upsert import (
        read_max_registers,
        run_stream_max_registers,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"u{i % 7}") for i in range(50)], "id long, user string"
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, user string").parquet(src)
    state = str(tmp_path / "state")
    run_stream_max_registers(
        stream, state, str(tmp_path / "ckpt"), [], "user"
    )
    import os

    assert any(d.startswith("__b=") for d in os.listdir(state))
    regs = read_max_registers(spark, state, [])
    assert regs.count() > 0
