"""F6 streaming equivalence faces (run_stream_* drives whose final state must reproduce the batch oracle).

Split from the single-file conformance registry in round 6; byte-identical
query builders and oracle SQL. The ordered public registry lives in
``salesforce_plugin_spark.conformance`` (the package __init__).
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import *  # noqa: F401,F403


def assert_stream_matches_batch(
    streamed, batch, name: str, context: str = "", max_rows: int = 20
) -> None:
    """In-entry self-check for the stream-equals-batch faces (VERDICT
    r10 #1: q_stream_cusum went driver-red with a bare hash mismatch
    two rounds running while 13/13 local drives were green — the
    failure must SPEAK). Compares the accumulated streamed output
    against the one-shot batch twin row-for-row (order-insensitive,
    duplicate-sensitive: exceptAll both ways) and raises with a bounded
    row diff plus the caller's environment context, so a divergence
    lands in the driver's ``err`` field as evidence (which rows, which
    side, what the host looked like) instead of a silent hash flag. A
    pass means stream==batch IN THE DRIVER'S OWN SESSION — any
    remaining oracle mismatch is then a Spark-vs-DuckDB divergence on
    that host, not a fold defect."""
    cols = list(streamed.columns)
    b = batch.select(*cols)
    s_only = streamed.exceptAll(b).limit(max_rows).collect()
    b_only = b.exceptAll(streamed).limit(max_rows).collect()
    if s_only or b_only:
        raise ValueError(
            f"{name}: streamed output and batch twin diverge. "
            f"stream-only sample ({len(s_only)} of <= {max_rows}): "
            f"{[r.asDict() for r in s_only]}; "
            f"batch-only sample ({len(b_only)} of <= {max_rows}): "
            f"{[r.asDict() for r in b_only]}; context: {context}"
        )


def q_stream_near_dedup(spark, sf_dir):
    """F2 × F6: near-dedup as a CONTINUOUS-INGEST stream — documents
    arrive in three id-sliced micro-batches (ascending mtimes; per-batch
    append-only ids) and each batch is cluster-assigned against the bands
    state accumulated so far (streaming/upsert.run_stream_near_dedup).
    The accumulated assignments must be row-identical to the
    from-scratch full-corpus run: the oracle IS q_near_dedup's SQL."""
    import os
    import shutil
    import tempfile
    import time as _time

    from salesforce_plugin_spark.streaming.upsert import (
        read_near_dedup_assignments,
        run_stream_near_dedup,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = d.agg(F.max("doc_id")).collect()[0][0]
    cuts = [int(n * 0.5), int(n * 0.8)]
    slices = [
        d.filter(F.col("doc_id") <= cuts[0]),
        d.filter((F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])),
        d.filter(F.col("doc_id") > cuts[1]),
    ]
    tmp = tempfile.mkdtemp(prefix="conf_stream_neardedup_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        now = int(_time.time())
        for i, sl in enumerate(slices):
            part = os.path.join(tmp, f"stage{i}")
            sl.coalesce(1).write.mode("overwrite").parquet(part)
            pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
            dst = os.path.join(src, f"batch-{i}.parquet")
            shutil.move(os.path.join(part, pf), dst)
            os.utime(dst, (now + i * 60, now + i * 60))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_near_dedup(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            id_col="doc_id",
            text_col="text",
            num_hashes=8,
            bands=2,
            shingle_n=3,
        )
        out = (
            read_near_dedup_assignments(spark, state, "doc_id")
            .localCheckpoint(eager=True)  # detach from the tmp path
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Beyond-SOQL relational surface (free in Spark; SURVEY §2 non-goal list)
# ---------------------------------------------------------------------------

def q_stream_window(spark, sf_dir):
    """F6 through the *actual* readStream path: the streaming tumbling
    window aggregation drained to completion (availableNow trigger) and
    hash-checked against the same SQL oracle as the batch form — Spark's
    unified batch/streaming semantics, demonstrated at the driver gate.
    The memory sink is the test harness' observation point, not the
    production sink (that is run_to_parquet_sink)."""
    import os
    import uuid

    from salesforce_plugin_spark.streaming.windows import (
        run_to_memory_sink,
        stream_events,
        windowed_event_counts,
    )

    stream = windowed_event_counts(
        stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    )
    sink = run_to_memory_sink(
        stream, "t_conf_stream_" + uuid.uuid4().hex[:8], mode="complete"
    )
    return sink.select(
        F.unix_seconds(F.col("w_start")).alias("w_start_s"),
        "event_type",
        "n",
        "sum_value",
    )


def q_stream_dedup(spark, sf_dir):
    """F1/F6: streaming exact dedup (dropDuplicatesWithinWatermark state
    store) drained through the real readStream path. The fixture stream is
    unique on event_id, so the gate asserts losslessness — the streaming
    dedup emits exactly the distinct set, no rows dropped by state
    eviction or double-emitted across micro-batches. (The duplicate-
    dropping direction is pinned by tests/test_streaming.py with injected
    dupes.) Dedup state is partitioned by key and evicted at the
    watermark, so state size is bounded by the late-data horizon, not the
    stream length."""
    import os
    import uuid

    from salesforce_plugin_spark.streaming.windows import (
        dedup_stream,
        run_to_memory_sink,
        stream_events,
    )

    stream = dedup_stream(
        stream_events(spark, os.path.join(sf_dir, "events.parquet"))
    ).select("event_id", F.unix_micros(F.col("ts")).alias("ts_us"))
    return run_to_memory_sink(
        stream, "t_conf_sdedup_" + uuid.uuid4().hex[:8], mode="append"
    )


def q_stream_stateful(spark, sf_dir):
    """F6 custom stateful operator through the real readStream path:
    ``applyInPandasWithState`` per-user running totals drained with an
    availableNow trigger, final state per user hash-checked against a
    plain batch aggregate. Exactness comes from the integer-micros
    accumulator (see streaming/stateful.py) — a double accumulator would
    be batch-order-dependent and unverifiable. In update mode each user
    emits one row per micro-batch it appears in; ``n_events`` is strictly
    increasing, so the final state is the max-``n_events`` row."""
    import os
    import uuid

    from salesforce_plugin_spark.streaming.stateful import running_user_totals
    from salesforce_plugin_spark.streaming.windows import (
        run_to_memory_sink,
        stream_events,
    )

    sink = run_to_memory_sink(
        running_user_totals(
            stream_events(spark, os.path.join(sf_dir, "events.parquet"))
        ),
        "t_conf_state_" + uuid.uuid4().hex[:8],
        mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id", "n_events", "total_value_micros", "total_value", "last_ts_us"
        )
    )


def q_stream_upsert(spark, sf_dir):
    """E5/F6 streaming upsert through the real foreachBatch path: drain
    the events stream into a key-bucketed parquet table where the newest
    row per user wins (streaming/upsert.run_stream_upsert), then return
    the final table — hash-checked against a batch last-writer-wins
    window. Version is a (ts, event_id) struct so ties in ts are broken
    deterministically in any engine; the partition column is a hash
    bucket OF THE KEY so every version of a user lives in one partition
    and per-batch dynamic partition overwrite can never strand a stale
    row in an untouched partition (a time-partitioned layout would —
    that layout is for append+late-data tails, not keyed upserts)."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.streaming.upsert import run_stream_upsert
    from salesforce_plugin_spark.streaming.windows import stream_events

    stream = (
        stream_events(spark, os.path.join(sf_dir, "events.parquet"))
        .withColumn("__ver", F.struct(F.col("ts"), F.col("event_id")))
        .withColumn("__bucket", F.pmod(F.col("user_id"), F.lit(16)))
    )
    tmp = tempfile.mkdtemp(prefix="conf_upsert_")
    table = os.path.join(tmp, "latest")
    try:
        run_stream_upsert(
            stream,
            table,
            os.path.join(tmp, "ckpt"),
            key_cols=["user_id"],
            version_col="__ver",
            partition_col="__bucket",
        )
        out = (
            spark.read.parquet(table)
            .select(
                "user_id",
                "event_id",
                "event_type",
                "value",
                F.unix_micros(F.col("ts")).alias("ts_us"),
            )
            .localCheckpoint(eager=True)  # detach from the tmp path
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_stream_join(spark, sf_dir):
    """F6: stream-stream interval join through the real readStream path —
    click events joined to the purchase events of the same user within the
    2 hours after the click, both sides watermarked so join state is
    evicted at the lookback horizon instead of growing with the stream
    (streaming/windows.interval_join_streams). Same semantics and oracle
    as the batch q_range_join; the gate pins that the streaming drain
    emits exactly the batch join's row set."""
    import os
    import uuid

    from salesforce_plugin_spark.streaming.windows import (
        interval_join_streams,
        run_to_memory_sink,
        stream_events,
    )

    path = os.path.join(sf_dir, "events.parquet")
    clicks = (
        stream_events(spark, path, watermark=None)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    purchases = (
        stream_events(spark, path, watermark=None)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    joined = interval_join_streams(
        clicks, purchases, ["user_id"], "c_ts", "p_ts", lookback="2 hours"
    ).select(
        clicks["user_id"].alias("user_id"),
        "click_id",
        F.unix_micros(F.col("c_ts")).alias("click_us"),
        "purchase_id",
        F.unix_micros(F.col("p_ts")).alias("purchase_us"),
    )
    return run_to_memory_sink(
        joined, "t_conf_sjoin_" + uuid.uuid4().hex[:8], mode="append"
    )


def q_stream_scd2(spark, sf_dir):
    """F6 × warehouse modeling: SCD2 history maintained FROM A STREAM
    (streaming/upsert.py run_stream_scd2) — the events feed arrives as
    three time-sliced micro-batches (maxFilesPerTrigger=1, ascending
    mtimes so the file source drains them in observation order) and each
    batch folds into the interval table via scd2_apply_changes. The gate
    proves the streamed history is row-identical to a from-scratch batch
    rebuild: the oracle is the full-feed SCD2 SQL (same as q_scd2)."""
    import os
    import shutil
    import tempfile
    import time as _time

    from salesforce_plugin_spark.streaming.upsert import run_stream_scd2

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_scd2_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    cuts = ["2024-01-10", "2024-01-20"]
    slices = [
        e.filter(F.col("ts") < F.lit(cuts[0]).cast("timestamp")),
        e.filter(
            (F.col("ts") >= F.lit(cuts[0]).cast("timestamp"))
            & (F.col("ts") < F.lit(cuts[1]).cast("timestamp"))
        ),
        e.filter(F.col("ts") >= F.lit(cuts[1]).cast("timestamp")),
    ]
    try:
        now = int(_time.time())
        for i, sl in enumerate(slices):
            part = os.path.join(tmp, f"stage{i}")
            sl.coalesce(1).write.mode("overwrite").parquet(part)
            pf = next(
                f for f in os.listdir(part) if f.endswith(".parquet")
            )
            dst = os.path.join(src, f"batch-{i}.parquet")
            shutil.move(os.path.join(part, pf), dst)
            # ascending mtimes: the file source processes oldest-first,
            # which IS the per-key observation order (time-sliced files)
            os.utime(dst, (now + i * 60, now + i * 60))
        stream = (
            spark.readStream.schema(
                "user_id long, event_type string, ts timestamp, event_id long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        table = os.path.join(tmp, "scd2")
        run_stream_scd2(
            stream,
            table,
            os.path.join(tmp, "ckpt"),
            key_cols=["user_id"],
            attr_cols=["event_type"],
            ts_col="ts",
            tiebreak_cols=["event_id"],
        )
        out = (
            spark.read.parquet(table)
            .select(
                "user_id",
                "event_type",
                F.unix_micros(F.col("__valid_from")).alias("valid_from_us"),
                F.unix_micros(F.col("__valid_to")).alias("valid_to_us"),
                F.col("__is_current").alias("is_current"),
            )
            .localCheckpoint(eager=True)  # detach from the tmp path
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_stream_kmv(spark, sf_dir):
    """F6 + sketch: streaming KMV distinct-count through the real
    readStream → applyInPandasWithState path (streaming/stateful.py
    running_kmv_distinct). The hash is computed JVM-side
    (portable_hash32 of user_id) before the Arrow boundary; state is the
    k smallest hashes — a bounded, order-insensitive merge, so the final
    streamed state must equal the batch KMV over the same rows, which is
    exactly what the oracle computes. Final row per key = max-n_seen row
    of the update-mode sink (n_seen strictly increasing)."""
    import os
    import uuid

    from salesforce_plugin_spark.streaming.stateful import running_kmv_distinct
    from salesforce_plugin_spark.streaming.windows import (
        run_to_memory_sink,
        stream_events,
    )

    hashed = stream_events(spark, os.path.join(sf_dir, "events.parquet")).select(
        "event_type",
        D.portable_hash32(F.col("user_id").cast("string")).alias("__h"),
    )
    sink = run_to_memory_sink(
        running_kmv_distinct(hashed, k=64),
        "t_conf_kmv_" + uuid.uuid4().hex[:8],
        mode="update",
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n_seen").desc())
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", "n_seen", "k", "n_kept", "kth_hash", "est_distinct")
    )


def q_stream_heavy_hitters(spark, sf_dir):
    """Sketch × F6: count-min maintenance as a CONTINUOUS stream — events
    arrive in three event_id-sliced micro-batches and each batch's
    depth×width grid is appended to parquet state
    (streaming/upsert.run_stream_cm). A count-min sketch is purely
    additive, so the summed accumulated grid is bit-identical to one
    batch sketch over the full table — estimates read from the streamed
    state must therefore match q_heavy_hitters' oracle exactly (the
    oracle IS reused verbatim). Per-batch cost: one bounded aggregate;
    state grows ≤ depth·width rows per batch."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.sketch import cm_estimate
    from salesforce_plugin_spark.streaming.upsert import (
        read_cm_state,
        run_stream_cm,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    n = ev.agg(F.max("event_id")).collect()[0][0]
    cuts = [int(n * 0.4), int(n * 0.7)]
    slices = [
        ev.filter(F.col("event_id") <= cuts[0]),
        ev.filter((F.col("event_id") > cuts[0]) & (F.col("event_id") <= cuts[1])),
        ev.filter(F.col("event_id") > cuts[1]),
    ]
    tmp = tempfile.mkdtemp(prefix="conf_stream_cm_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        for i, sl in enumerate(slices):
            part = os.path.join(tmp, f"stage{i}")
            sl.coalesce(1).write.mode("overwrite").parquet(part)
            pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
            shutil.move(
                os.path.join(part, pf), os.path.join(src, f"batch-{i}.parquet")
            )
        stream = (
            spark.readStream.schema("event_id long, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        run_stream_cm(
            stream,
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
            "user_id",
            width=256,
            depth=4,
        )
        grid = read_cm_state(spark, os.path.join(tmp, "state")).localCheckpoint(
            eager=True  # detach from the tmp path before it is removed
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    est = cm_estimate(grid, ev, "user_id", width=256, depth=4)
    exact = ev.groupBy(F.col("user_id").alias("value")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    return est.join(exact, "value").select(
        F.col("value").alias("user_id"),
        "est_n",
        "exact_n",
        (F.col("est_n") - F.col("exact_n")).alias("overcount"),
    )


def q_stream_quantiles(spark, sf_dir):
    """Sketch x F6: quantile-sketch maintenance as a CONTINUOUS stream —
    events arrive in three event_id-sliced micro-batches, each batch's
    bounded histogram is appended to parquet state
    (streaming/upsert.run_stream_histogram). Histograms are purely
    additive, so the summed state is bit-identical to one batch
    histogram over the full table — quantiles elected from streamed
    state must match q_quantile_sketch's oracle exactly (the oracle IS
    reused verbatim). Per-batch cost: one <= n_bins-row aggregate."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.sketch import quantiles_from_counts
    from salesforce_plugin_spark.streaming.upsert import (
        read_histogram_state,
        run_stream_histogram,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    n = ev.agg(F.max("event_id")).collect()[0][0]
    cuts = [int(n * 0.4), int(n * 0.7)]
    slices = [
        ev.filter(F.col("event_id") <= cuts[0]),
        ev.filter((F.col("event_id") > cuts[0]) & (F.col("event_id") <= cuts[1])),
        ev.filter(F.col("event_id") > cuts[1]),
    ]
    tmp = tempfile.mkdtemp(prefix="conf_stream_hist_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    try:
        for i, sl in enumerate(slices):
            part = os.path.join(tmp, f"stage{i}")
            sl.coalesce(1).write.mode("overwrite").parquet(part)
            pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
            shutil.move(
                os.path.join(part, pf), os.path.join(src, f"batch-{i}.parquet")
            )
        stream = (
            spark.readStream.schema("event_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        run_stream_histogram(
            stream,
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
            "value",
            lo=0.0,
            hi=500.0,
            n_bins=1000,
        )
        hist = read_histogram_state(
            spark, os.path.join(tmp, "state")
        ).localCheckpoint(eager=True)  # detach from tmp before it is removed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return quantiles_from_counts(
        hist, qs=[0.5, 0.9, 0.99], lo=0.0, hi=500.0, n_bins=1000
    )


def q_stream_rolling_wau(spark, sf_dir):
    """F6 x growth accounting: rolling WAU maintained FROM A STREAM
    (streaming/upsert.py run_stream_active_days): per-batch distinct
    (user, day) rows append as SET state — fully arrival-order-
    insensitive (unlike the CUSUM/SCD2 faces, replay and overlap are
    harmless: the reader dedups) — and the rolling-distinct over the
    accumulated state equals the one-shot batch run; oracle is
    q_rolling_wau's SQL VERBATIM. Batches here are deliberately
    OVERLAPPING id slices to prove the set-state claim."""
    import os
    import shutil
    import tempfile
    import time as _time

    from salesforce_plugin_spark.streaming.upsert import (
        read_rolling_distinct,
        run_stream_active_days,
    )

    tmp = tempfile.mkdtemp(prefix="conf_stream_wau_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events")
    # deliberately OVERLAPPING slices (mod-3 residues plus a repeated
    # band) — set semantics make replay/overlap harmless
    slices = [
        ev.filter(F.col("event_id") % 3 == 0).select("user_id", "ts"),
        ev.filter(F.col("event_id") % 3 == 1).select("user_id", "ts"),
        ev.filter(
            (F.col("event_id") % 3 == 2) | (F.col("event_id") % 5 == 0)
        ).select("user_id", "ts"),
    ]
    try:
        now = int(_time.time())
        for i, sl in enumerate(slices):
            part = os.path.join(tmp, f"stage{i}")
            sl.coalesce(1).write.mode("overwrite").parquet(part)
            pf = next(
                f for f in os.listdir(part) if f.endswith(".parquet")
            )
            dst = os.path.join(src, f"batch-{i}.parquet")
            shutil.move(os.path.join(part, pf), dst)
            os.utime(dst, (now + i * 60, now + i * 60))
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_active_days(
            stream, state, os.path.join(tmp, "ckpt"), "user_id", "ts"
        )
        out = read_rolling_distinct(spark, state, window_days=7)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_stream_cusum(spark, sf_dir):
    """F6 x monitoring: the CUSUM detector maintained FROM A STREAM
    (streaming/upsert.py run_stream_cusum) — three time-sliced
    micro-batches (ascending mtimes) fold through a two-BIGINT-per-key
    carry (last prefix sum + clamped running min); the accumulated
    alarm rows must be row-identical to the one-shot batch run, so the
    oracle is q_cusum's SQL VERBATIM (the equivalence is the claim —
    the q_stream_scd2 / stream-sketch discipline).

    Round 11 (VERDICT r10 #1): the entry SELF-CHECKS — after the stream
    drains it also runs the batch twin (operators/timeseries.py
    cusum_alarms, q_cusum's exact call) on the same base and raises via
    :func:`assert_stream_matches_batch` with a bounded row diff + host
    context (session timezone, batch file listing, per-slice row
    counts) if they diverge, so the two-rounds-running silent driver
    hash mismatch becomes evidence in the ``err`` field. If this check
    passes and the driver still records a hash mismatch, the
    divergence is Spark-vs-DuckDB on the driver host (q_cusum sits in
    the same window to confirm), not the stream fold."""
    import os
    import shutil
    import tempfile
    import time as _time

    from salesforce_plugin_spark.streaming.upsert import run_stream_cusum

    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("value").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_cusum_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    cuts = ["2024-01-10", "2024-01-20"]
    slices = [
        base.filter(F.col("ts") < F.lit(cuts[0]).cast("timestamp")),
        base.filter(
            (F.col("ts") >= F.lit(cuts[0]).cast("timestamp"))
            & (F.col("ts") < F.lit(cuts[1]).cast("timestamp"))
        ),
        base.filter(F.col("ts") >= F.lit(cuts[1]).cast("timestamp")),
    ]
    try:
        now = int(_time.time())
        for i, sl in enumerate(slices):
            part = os.path.join(tmp, f"stage{i}")
            sl.coalesce(1).write.mode("overwrite").parquet(part)
            pf = next(
                f for f in os.listdir(part) if f.endswith(".parquet")
            )
            dst = os.path.join(src, f"batch-{i}.parquet")
            shutil.move(os.path.join(part, pf), dst)
            os.utime(dst, (now + i * 60, now + i * 60))
        stream = (
            spark.readStream.schema(
                "user_id long, ts timestamp, event_id long, v long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out_dir = os.path.join(tmp, "alarms")
        run_stream_cusum(
            stream,
            out_dir,
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
            key_cols=["user_id"],
            ts_col="ts",
            value_col="v",
            target=5000,
            slack=500,
            threshold=50000,
            tiebreak_cols=["event_id"],
        )
        out = (
            spark.read.parquet(out_dir)
            .select("user_id", "ts", "v", "event_id", "cusum", "alarm")
            .localCheckpoint(eager=True)
        )
        from salesforce_plugin_spark.operators.timeseries import (
            cusum_alarms,
        )

        twin = cusum_alarms(
            base,
            ["user_id"],
            "ts",
            "v",
            target=5000,
            slack=500,
            threshold=50000,
            tiebreak_cols=["event_id"],
        )
        files = sorted(
            (f, os.path.getsize(os.path.join(src, f)),
             int(os.path.getmtime(os.path.join(src, f))))
            for f in os.listdir(src)
        )
        ctx = (
            f"tz={spark.conf.get('spark.sql.session.timeZone', '?')}; "
            f"cuts={cuts}; files={files}; "
            f"slice_rows={[sl.count() for sl in slices]}"
        )
        assert_stream_matches_batch(out, twin, "q_stream_cusum", ctx)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return oracle_cross_check(out, "q_stream_cusum", sf_dir)


def q_stream_interarrival(spark, sf_dir):
    """F6 x capacity measurement: inter-arrival statistics maintained
    FROM A STREAM (streaming/upsert.py run_stream_interarrival) —
    three time-sliced micro-batches fold through a five-BIGINT-per-key
    carry (last_us, n, sum, min, max); batch-boundary gaps close
    against the carry's last_us. The final state must reproduce the
    one-shot batch stats, so the oracle is q_interarrival's SQL
    VERBATIM (the run_stream_cusum equivalence discipline)."""
    import os
    import shutil
    import tempfile
    import time as _time

    from salesforce_plugin_spark.streaming.upsert import (
        read_interarrival_state,
        run_stream_interarrival,
    )

    e = load_table(spark, sf_dir, "events")
    base = e.select("user_id", "ts")
    tmp = tempfile.mkdtemp(prefix="conf_stream_ia_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    cuts = ["2024-01-10", "2024-01-20"]
    slices = [
        base.filter(F.col("ts") < F.lit(cuts[0]).cast("timestamp")),
        base.filter(
            (F.col("ts") >= F.lit(cuts[0]).cast("timestamp"))
            & (F.col("ts") < F.lit(cuts[1]).cast("timestamp"))
        ),
        base.filter(F.col("ts") >= F.lit(cuts[1]).cast("timestamp")),
    ]
    try:
        now = int(_time.time())
        for i, sl in enumerate(slices):
            part = os.path.join(tmp, f"stage{i}")
            sl.coalesce(1).write.mode("overwrite").parquet(part)
            pf = next(
                f for f in os.listdir(part) if f.endswith(".parquet")
            )
            dst = os.path.join(src, f"batch-{i}.parquet")
            shutil.move(os.path.join(part, pf), dst)
            os.utime(dst, (now + i * 60, now + i * 60))
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_interarrival(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            key_cols=["user_id"],
            ts_col="ts",
        )
        rows = read_interarrival_state(spark, state).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id long, n_gaps long, min_us long, max_us long, "
        "mean_us long, burst_x1000 long",
    )


def q_stream_class_balance(spark, sf_dir):
    """F6 x curation sensing: the label-balance report maintained FROM
    A STREAM (streaming/upsert.py run_stream_additive_counts — the
    generic additive-count face): three DISJOINT doc_id slices append
    per-batch (cell, n) partials; summed state feeds
    class_balance_from_counts, and the result must equal the one-shot
    batch report — oracle is q_class_balance's SQL VERBATIM. The label
    cell is derived INSIDE the fold (prepare=), so the stream carries
    raw documents."""
    import shutil
    import tempfile
    import os

    from salesforce_plugin_spark.operators.analytics import (
        class_balance_from_counts,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_cb_")
    try:
        src = _slice_to_files(
            spark,
            [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "doc_id long, lang string, source string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["cell"],
            prepare=lambda b: b.select(
                F.concat_ws("/", "lang", "source").alias("cell")
            ),
        )
        counts = read_summed_counts(spark, state, ["cell"]).select(
            F.col("cell").alias("label"), "n"
        )
        rows = class_balance_from_counts(counts).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "label string, n long, share_ppm long, gini_ppm long"
    )


def q_stream_vocab_coverage(spark, sf_dir):
    """F6 x tokenizer sizing: the vocabulary-coverage curve maintained
    FROM A STREAM — per-batch token-count partials (explode inside the
    fold) append as additive state; the summed (term, n) table feeds
    coverage_from_term_counts and must reproduce the one-shot curve
    (q_vocab_coverage's oracle VERBATIM). State is vocab-bounded per
    batch regardless of event volume."""
    import shutil
    import tempfile
    import os

    from salesforce_plugin_spark.functions.text import (
        coverage_from_term_counts,
        tokens as _tokens,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="conf_stream_vc_")
    try:
        src = _slice_to_files(
            spark,
            [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["term"],
            prepare=lambda b: b.select(
                F.explode(_tokens(F.lower(F.col("text")))).alias("term")
            ).filter(F.col("term") != ""),
        )
        counts = read_summed_counts(spark, state, ["term"]).select(
            "term", F.col("n").alias("__cnt")
        )
        rows = coverage_from_term_counts(
            counts, cutoffs=[1, 10, 100, 1000]
        ).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "cutoff long, n_terms long, coverage_ppm long"
    )


def q_stream_user_growth(spark, sf_dir):
    """F6 x growth accounting: daily active/new/cumulative users
    maintained FROM A STREAM by REUSING run_stream_active_days' (user,
    day) SET state — everything user_growth needs (actives per day,
    first-seen day, cumulative) derives from that one accumulated set,
    so the stream face is a reader over existing state, zero new fold
    code. Set semantics make the deliberately OVERLAPPING slices
    harmless (the q_stream_rolling_wau claim); result must equal the
    one-shot batch run — q_user_growth's oracle VERBATIM."""
    import shutil
    import tempfile
    import os

    from salesforce_plugin_spark.operators.analytics import user_growth
    from salesforce_plugin_spark.streaming.upsert import (
        run_stream_active_days,
    )

    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="conf_stream_ug_")
    try:
        src = _slice_to_files(
            spark,
            [
                ev.filter(F.col("event_id") % 3 == 0).select("user_id", "ts"),
                ev.filter(F.col("event_id") % 3 == 1).select("user_id", "ts"),
                ev.filter(
                    (F.col("event_id") % 3 == 2) | (F.col("event_id") % 5 == 0)
                ).select("user_id", "ts"),
            ],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_active_days(
            stream, state, os.path.join(tmp, "ckpt"), "user_id", "ts"
        )
        kd = spark.read.parquet(state).distinct()
        rows = user_growth(
            kd.select(F.col("key").alias("user_id"), F.col("day").alias("ts")),
            "user_id",
            "ts",
        ).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "day date, active_users long, new_users long, cum_users long"
    )


def q_stream_rolling_quantiles(spark, sf_dir):
    """F6 x observability: trailing-7-day quantiles maintained FROM A
    STREAM — the (key, day, bin) day histogram is a per-group row
    count, so the GENERIC additive face (run_stream_additive_counts,
    prepare= projects key/day/bin inside the fold) maintains it with
    zero new fold code; summed state feeds
    rolling_quantiles_from_daily and must reproduce the one-shot batch
    curve (q_rolling_quantiles' oracle VERBATIM, disjoint event_id
    slices)."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.sketch import (
        rolling_quantiles_from_daily,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_rq_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, ts timestamp,"
                " value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        width = 512.0 / 256
        bin_ = F.least(
            F.lit(255),
            F.greatest(
                F.lit(0), F.floor((F.col("value") - 0.0) / F.lit(width))
            ),
        ).cast("int")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["key", "__d", "bin"],
            prepare=lambda b: b.filter(F.col("value").isNotNull()).select(
                F.col("event_type").alias("key"),
                F.to_date("ts").alias("__d"),
                bin_.alias("bin"),
            ),
        )
        daily = read_summed_counts(spark, state, ["key", "__d", "bin"]).select(
            "key", "__d", "bin", F.col("n").alias("cnt")
        )
        rows = rolling_quantiles_from_daily(
            daily, [0.5, 0.95], 0.0, 512.0, 256, 7
        ).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "key string, day date, q double, est double, n_total long"
    )


def q_stream_fano(spark, sf_dir):
    """F6 x burstiness: the Fano factor maintained FROM A STREAM — the
    (key, day) daily count is a per-group row count, so the generic
    additive face maintains it with zero new fold code; summed state
    feeds fano_from_daily and must equal the one-shot batch detector
    (q_fano's oracle VERBATIM, disjoint event_id slices)."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.analytics import fano_from_daily
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    tmp = tempfile.mkdtemp(prefix="conf_stream_fano_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["user_id", "__d"],
            prepare=lambda b: b.select(
                "user_id", F.to_date("ts").alias("__d")
            ),
        )
        daily = read_summed_counts(spark, state, ["user_id", "__d"]).select(
            "user_id", "__d", F.col("n").alias("__c")
        )
        rows = fano_from_daily(daily, ["user_id"]).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "user_id long, n_days long, total long, fano_x1000 long"
    )


def q_stream_dow(spark, sf_dir):
    """F6 x seasonality: the day-of-week profile maintained FROM A
    STREAM — weekday counts are per-group row counts, so the generic
    additive face maintains them with zero new fold code; summed state
    feeds dow_profile_from_counts and must equal the one-shot batch
    profile (q_dow_profile's oracle VERBATIM, disjoint slices)."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.timeseries import (
        dow_profile_from_counts,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_dow_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["event_type", "__sundow"],
            prepare=lambda b: b.select(
                "event_type", F.dayofweek("ts").alias("__sundow")
            ),
        )
        counts = read_summed_counts(
            spark, state, ["event_type", "__sundow"]
        )
        rows = dow_profile_from_counts(counts, ["event_type"]).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, dow int, n long, share_ppm long"
    )



def q_stream_theil_sen(spark, sf_dir):
    """F6 x robust trend: Theil-Sen slope maintained FROM A STREAM —
    per-(type, day) counts are additive, so the generic additive fold
    maintains them with zero new fold code; summed state feeds
    theil_sen_from_daily and must equal the one-shot batch trend
    (q_theil_sen's oracle VERBATIM, disjoint slices)."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.analytics import (
        theil_sen_from_daily,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_ts_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["__k", "__d"],
            prepare=lambda b: b.select(
                F.col("event_type").alias("__k"),
                F.datediff(
                    F.to_date("ts"), F.lit("1970-01-01").cast("date")
                ).alias("__d"),
            ),
        )
        daily = read_summed_counts(spark, state, ["__k", "__d"]).select(
            "__k", "__d", F.col("n").alias("__c")
        )
        rows = theil_sen_from_daily(daily, "event_type").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_days long, n_pairs long, slope_ppm long"
    )


def q_stream_temperature_mix(spark, sf_dir):
    """F6 x data mixing: τ=2 temperature sampling weights maintained
    FROM A STREAM — per-lang doc and token counts are additive row
    counts after exploding each doc into one 'doc' marker plus one row
    per token, so the generic additive fold maintains BOTH masses with
    zero new fold code; summed state feeds temperature_mix_from_counts
    and must equal the one-shot batch mix (q_temperature_mix's oracle
    VERBATIM, disjoint slices)."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.text import tokens
    from salesforce_plugin_spark.operators.pipeline import (
        temperature_mix_from_counts,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_tm_")
    try:
        src = _slice_to_files(
            spark,
            [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "doc_id long, lang string, text string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["lang", "__kind"],
            prepare=lambda b: b.select(
                "lang",
                F.explode(
                    F.concat(
                        F.array(F.lit("doc")),
                        F.transform(
                            tokens(F.col("text")), lambda _: F.lit("tok")
                        ),
                    )
                ).alias("__kind"),
            ),
        )
        counts = read_summed_counts(spark, state, ["lang", "__kind"])
        per = counts.groupBy(F.col("lang").alias("grp")).agg(
            F.sum(F.when(F.col("__kind") == "doc", F.col("n")))
            .cast("long")
            .alias("n_docs"),
            F.sum(F.when(F.col("__kind") == "tok", F.col("n")))
            .cast("long")
            .alias("n_tokens"),
        )
        rows = temperature_mix_from_counts(per, "lang", tau=2).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "lang string, n_docs long, n_tokens long, w long,"
        " share_ppm long, boost_ppm long",
    )


ORACLES: dict[str, str] = {}

ORACLES["q_stream_stateful"] = """
        SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT)
                   AS total_value_micros,
               CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE)
                   / 1000000.0 AS total_value,
               max(epoch_us(ts)) AS last_ts_us
        FROM events
        GROUP BY user_id
    """

ORACLES["q_stream_dedup"] = """
        SELECT event_id, epoch_us(ts) AS ts_us FROM events
    """

ORACLES["q_stream_upsert"] = """
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS __rn
            FROM events
        )
        WHERE __rn = 1
    """

ORACLES["q_stream_window"] = """
        SELECT epoch_ms(date_trunc('hour', ts)) // 1000 AS w_start_s,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """

ORACLES["q_stream_join"] = """
        SELECT c.user_id AS user_id,
               c.event_id AS click_id,
               epoch_us(c.ts) AS click_us,
               p.event_id AS purchase_id,
               epoch_us(p.ts) AS purchase_us
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR
    """

ORACLES["q_stream_kmv"] = """
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
    ), seen AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_seen
        FROM events GROUP BY event_type
    )
    SELECT a.event_type, s.n_seen, 64 AS k, a.n_kept, a.kth_hash,
           CASE WHEN a.n_kept < 64 THEN CAST(a.n_kept AS BIGINT)
                ELSE 270582939648 // a.kth_hash END AS est_distinct
    FROM agg a JOIN seen s USING (event_type)
"""


# streamed additive (type, day) counts == one-shot batch Theil-Sen


def q_stream_hll(spark, sf_dir):
    """F6 x cardinality sketch: the portable-HLL registers maintained
    FROM A STREAM (streaming/upsert.run_stream_max_registers) — and,
    unlike every additive face, with a deliberately OVERLAPPING batch
    schedule: slice 0 is streamed TWICE, because register merge is MAX
    (idempotent), so at-least-once delivery must not move the
    estimate. Max-merged state feeds hll_estimate_from_registers and
    must equal the one-shot batch estimate (q_hll's oracle VERBATIM) —
    which also means equal to a run that never saw the duplicate."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.sketch import (
        hll_estimate_from_registers,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_max_registers,
        run_stream_max_registers,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_hll_")
    try:
        slices = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
        slices.append(e.filter(F.col("event_id") % 3 == 0))  # replay
        src = _slice_to_files(spark, slices, tmp, None)
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, user_id long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_max_registers(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["event_type"],
            value_col="user_id",
        )
        regs = read_max_registers(spark, state, ["event_type"])
        est = hll_estimate_from_registers(regs, ["event_type"])
        exact = e.groupBy("event_type").agg(
            F.count_distinct(F.col("user_id"))
            .cast("long")
            .alias("true_distinct")
        )
        rows = (
            exact.join(est, "event_type")
            .select(
                "event_type",
                "true_distinct",
                "est_distinct",
                (F.col("est_distinct") - F.col("true_distinct"))
                .cast("long")
                .alias("err"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, true_distinct long, est_distinct long, err long",
    )


def q_stream_wilson(spark, sf_dir):
    """F6 x small-sample statistics: the Wilson quality ranking
    maintained FROM A STREAM — per-source (trial, success) counts are
    additive, so the generic additive face maintains them with zero
    new fold code (each doc emits its gate verdict as a counting
    cell); summed state feeds wilson_from_counts and must equal the
    one-shot batch bound (q_wilson's oracle VERBATIM, disjoint
    slices). 16th equivalence face."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.text import token_count
    from salesforce_plugin_spark.operators.analytics import (
        wilson_from_counts,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_wilson_")
    try:
        src = _slice_to_files(
            spark,
            [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "doc_id long, source string, text string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["source", "__ok"],
            prepare=lambda b: b.select(
                "source",
                (token_count("text") >= 30).cast("int").alias("__ok"),
            ),
        )
        counts = read_summed_counts(spark, state, ["source", "__ok"])
        agg = counts.groupBy("source").agg(
            F.sum("n").cast("long").alias("n"),
            F.sum(F.col("n") * F.col("__ok")).cast("long").alias("s"),
        )
        rows = wilson_from_counts(agg, ["source"]).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "source string, n long, s long, rate_ppm long, wilson_lb_ppm long",
    )


def q_stream_abtest(spark, sf_dir):
    """F6 x experimentation: the two-proportion z read-out maintained
    FROM A STREAM — per-(type, arm, verdict) counts are additive, so
    the generic additive face maintains them with zero new fold code;
    summed state feeds ab_from_counts and must equal the one-shot
    batch read-out (q_abtest's oracle VERBATIM, disjoint slices) —
    the live experiment monitor whose artifact can't drift from the
    offline analysis. 17th equivalence face."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.analytics import ab_from_counts
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_ab_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, user_id long,"
                " value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["event_type", "__arm", "__ok"],
            prepare=lambda b: b.select(
                "event_type",
                (F.col("user_id") % 2).cast("int").alias("__arm"),
                (F.col("value") >= 50).cast("int").alias("__ok"),
            ),
        )
        counts = read_summed_counts(
            spark, state, ["event_type", "__arm", "__ok"]
        )
        agg = counts.groupBy("event_type").agg(
            F.sum(F.when(F.col("__arm") == 0, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(
                F.when(
                    (F.col("__arm") == 0) & (F.col("__ok") == 1), F.col("n")
                ).otherwise(0)
            )
            .cast("long")
            .alias("s1"),
            F.sum(F.when(F.col("__arm") == 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n2"),
            F.sum(
                F.when(
                    (F.col("__arm") == 1) & (F.col("__ok") == 1), F.col("n")
                ).otherwise(0)
            )
            .cast("long")
            .alias("s2"),
        )
        rows = ab_from_counts(agg, ["event_type"]).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, n1 long, s1 long, n2 long, s2 long,"
        " p1_ppm long, p2_ppm long, diff_ppm long, z_milli long,"
        " significant int",
    )


def q_stream_calibration(spark, sf_dir):
    """F6 x score gating: the reliability curve maintained FROM A
    STREAM — per-bin (n, Σscore, Σoutcome) are SUMS, not just counts,
    so this face rides the additive fold generalized to column sums
    (run_stream_additive_sums — the first face needing it); merged
    state reduces to the exact mean-score/rate surface and must equal
    the one-shot batch curve (q_calibration's oracle VERBATIM,
    disjoint slices). 18th equivalence face."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_sums,
        run_stream_additive_sums,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_cal_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")

        def prep(b):
            score = F.round(F.col("value") * 1000, 0).cast("long")
            return b.select(
                F.least(
                    F.lit(9),
                    F.greatest(
                        F.lit(0),
                        F.expr(
                            "CAST(((CAST(round(value * 1000) AS BIGINT) - 0)"
                            " * 10) div 500000 AS INT)"
                        ),
                    ),
                ).alias("bin"),
                score.alias("score"),
                (F.col("event_type") == "purchase").cast("int").alias("ok"),
            )

        run_stream_additive_sums(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["bin"],
            sum_cols=["score", "ok"],
            prepare=prep,
        )
        merged = read_summed_sums(spark, state, ["bin"], ["score", "ok"])
        from salesforce_plugin_spark.functions.exactmath import dcast, dfloor

        # dfloor, NOT decimal `div` — Spark's div mis-handles decimal
        # operands (the exactmath.py discovery); the exact-multiple
        # identity is the safe floor
        rows = merged.select(
            "bin",
            "n",
            F.expr(
                dfloor(f"{dcast('sum_score')} * 1000", dcast("n"))
            ).alias("mean_score_milli"),
            F.expr(
                dfloor(f"{dcast('sum_ok')} * 1000000", dcast("n"))
            ).alias("rate_ppm"),
        ).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "bin int, n long, mean_score_milli long, rate_ppm long"
    )


def q_stream_zscore(spark, sf_dir):
    """F6 x quality monitoring: per-type moment state (n, Σq, Σq²)
    maintained FROM A STREAM via the additive-sums fold, then SCORED
    against the table at rest with the injected-stats z-gate
    (operators/analytics.py zscore_from_stats) — the live anomaly
    monitor whose flags cannot drift from the offline analysis, because
    the streamed sums are exact integers and the deciding comparison is
    the same cross-multiplied DECIMAL(38,0) inequality. Must equal the
    one-shot batch q_anomaly_zscore (oracle VERBATIM, disjoint slices).
    19th equivalence face — the first that joins streamed state back
    over a batch scan (stats live, data at rest: the standard
    monitoring-service split)."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.analytics import zscore_from_stats
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_sums,
        run_stream_additive_sums,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_z_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")

        def prep(b):
            qv = F.round(F.col("value") * 100, 0).cast("long")
            return b.select(
                F.col("event_type"), qv.alias("qv"), (qv * qv).alias("qv2")
            )

        run_stream_additive_sums(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["event_type"],
            sum_cols=["qv", "qv2"],
            prepare=prep,
        )
        stats_rows = read_summed_sums(
            spark, state, ["event_type"], ["qv", "qv2"]
        ).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    stats = spark.createDataFrame(
        stats_rows, "event_type string, n long, sum_qv long, sum_qv2 long"
    )
    return zscore_from_stats(
        e,
        "value",
        ["event_type"],
        stats,
        n_col="n",
        s_col="sum_qv",
        q2_col="sum_qv2",
        k_num=3,
        k_den=2,
        quant=100,
    ).select("event_id", "event_type", "value", "is_anomaly")


def q_stream_kanonymity(spark, sf_dir):
    """F6 x governance: the k-anonymity / l-diversity audit maintained
    FROM A STREAM by composing TWO folds over the same micro-batches —
    class sizes k through the additive-count fold (disjoint slices),
    and the l-diversity distinct (QI, sensitive) pairs through the
    SET-state fold (idempotent union — that half would even survive
    replay). The read-out joins the two states and must equal the
    one-shot batch audit (q_kanonymity's oracle VERBATIM). 20th
    equivalence face — the first composing two state kinds in one
    result."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.streaming.upsert import (
        read_distinct_set,
        read_summed_counts,
        run_stream_additive_counts,
        run_stream_distinct_set,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_kanon_")
    try:
        src = _slice_to_files(
            spark,
            [c.filter(F.col("c_custkey") % 3 == i) for i in range(3)],
            tmp,
            None,
        )

        def mkstream():
            return (
                spark.readStream.schema(
                    "c_custkey long, c_nationkey long,"
                    " c_mktsegment string, c_acctbal double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

        def prep(b):
            return b.select(
                F.col("c_nationkey").cast("long").alias("c_nationkey"),
                "c_mktsegment",
                F.floor(F.col("c_acctbal") / 1000)
                .cast("long")
                .alias("bal_band"),
            )

        k_state = os.path.join(tmp, "k_state")
        l_state = os.path.join(tmp, "l_state")
        run_stream_additive_counts(
            mkstream(),
            k_state,
            os.path.join(tmp, "ckpt_k"),
            group_cols=["c_nationkey", "c_mktsegment"],
            prepare=prep,
        )
        run_stream_distinct_set(
            mkstream(),
            l_state,
            os.path.join(tmp, "ckpt_l"),
            cols=["c_nationkey", "c_mktsegment", "bal_band"],
            prepare=prep,
        )
        k = read_summed_counts(
            spark, k_state, ["c_nationkey", "c_mktsegment"]
        ).select("c_nationkey", "c_mktsegment", F.col("n").alias("k"))
        l_ = (
            read_distinct_set(
                spark, l_state, ["c_nationkey", "c_mktsegment", "bal_band"]
            )
            .groupBy("c_nationkey", "c_mktsegment")
            .agg(F.count(F.lit(1)).cast("long").alias("l"))
        )
        rows = (
            k.join(l_, ["c_nationkey", "c_mktsegment"])
            .withColumn("at_risk", F.col("k") < 5)
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "c_nationkey long, c_mktsegment string, k long, l long,"
        " at_risk boolean",
    )


def q_stream_changepoint(spark, sf_dir):
    """F6 x time series: the changepoint search over LIVE-MAINTAINED
    daily counts — per-(type, day) counts through the additive fold
    (daily counts are the canonical additive state), the summed state
    feeds changepoint_from_daily (the fano_from_daily split applied to
    operators/timeseries.py changepoint_binary), and the found split
    must equal the one-shot batch search (q_changepoint's oracle
    VERBATIM, disjoint slices). 21st equivalence face — the monitor
    that re-answers "where did the level shift?" after every
    micro-batch without re-scanning history."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.timeseries import (
        changepoint_from_daily,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_cp_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")

        def prep(b):
            return b.select(
                "event_type", F.to_date(F.col("ts")).alias("__d")
            )

        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["event_type", "__d"],
            prepare=prep,
        )
        daily = read_summed_counts(
            spark, state, ["event_type", "__d"]
        ).select("event_type", "__d", F.col("n").alias("__c"))
        rows = changepoint_from_daily(daily, ["event_type"]).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, split_day string, n_left long, n_right long,"
        " mean_left_milli long, mean_right_milli long, gain_milli long",
    )


def q_stream_ks(spark, sf_dir):
    """F6 x drift monitoring: the exact KS drift test re-answered after
    every micro-batch — per-value (qv, ca, cb) counts are ADDITIVE, so
    they ride the additive-sums fold; the summed state feeds
    ks_from_counts (the changepoint_from_daily split applied to
    functions/sketch.py ks_statistic) and must equal the one-shot batch
    test (q_ks_test's oracle VERBATIM, disjoint slices). 22nd
    equivalence face — the live reference-vs-production distribution
    monitor that cannot drift from the offline analysis."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.sketch import ks_from_counts
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_sums,
        run_stream_additive_sums,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_ks_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")

        def prep(b):
            f = b.filter(
                F.col("event_type").isin("click", "view")
                & F.col("value").isNotNull()
            )
            return f.select(
                F.round(F.col("value") * 1000, 0).cast("long").alias("qv"),
                (F.col("event_type") == "click").cast("long").alias("ca"),
                (F.col("event_type") == "view").cast("long").alias("cb"),
            )

        run_stream_additive_sums(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["qv"],
            sum_cols=["ca", "cb"],
            prepare=prep,
        )
        g = read_summed_sums(spark, state, ["qv"], ["ca", "cb"]).select(
            "qv",
            F.col("sum_ca").alias("ca"),
            F.col("sum_cb").alias("cb"),
        )
        rows = ks_from_counts(g).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "n1 long, n2 long, d_num long, d_ppm long, at_qv long"
    )


def q_stream_benford(spark, sf_dir):
    """F6 x ingestion quality: the Benford first-digit audit maintained
    live — per-digit counts are the canonical additive state (9-row
    groups through the additive-count fold), the summed state feeds
    benford_from_counts, and the audit must equal the one-shot batch
    q_benford (oracle VERBATIM, disjoint slices). 23rd equivalence
    face — the fabricated-data monitor a live ingestion pipeline runs
    per batch without re-scanning history."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.validate import (
        benford_from_counts,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_benford_")
    try:
        src = _slice_to_files(
            spark,
            [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "o_orderkey long, o_totalprice double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")

        def prep(b):
            cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
            return b.filter(cents > 0).select(
                F.substring(cents.cast("string"), 1, 1)
                .cast("int")
                .alias("digit")
            )

        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["digit"],
            prepare=prep,
        )
        counts = read_summed_counts(spark, state, ["digit"])
        rows = benford_from_counts(counts).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "digit int, n long, obs_ppm long, exp_ppm long, dev_ppm long",
    )


def q_stream_itemcf(spark, sf_dir):
    """F6 x recommendation: the co-purchase recommender maintained live
    — TWO additive folds over BASKET-COMPLETE micro-batches (sliced by
    l_orderkey, the basket id: a basket split across batches would
    lose its cross-batch pairs, the slicing-contract nuance this face
    exists to pin), pair supports and item basket-counts, with the
    min_support floor applied on MERGED totals at read-out (a 1+1 pair
    is support 2). item_similarity_from_counts == the one-shot batch
    q_itemcf (oracle VERBATIM). 24th equivalence face."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.analytics import (
        copurchase_pairs,
        item_similarity_from_counts,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        read_summed_sums,
        run_stream_additive_counts,
        run_stream_additive_sums,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_itemcf_")
    try:
        src = _slice_to_files(
            spark,
            [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)],
            tmp,
            None,
        )

        def mkstream():
            return (
                spark.readStream.schema("l_orderkey long, l_partkey long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

        pair_state = os.path.join(tmp, "pairs")
        item_state = os.path.join(tmp, "items")
        run_stream_additive_sums(
            mkstream(),
            pair_state,
            os.path.join(tmp, "ckpt_p"),
            group_cols=["item_a", "item_b"],
            sum_cols=["support"],
            # min_support=1 INSIDE the batch (the floor applies to
            # merged totals only); each basket is whole inside one
            # batch because the slices are keyed on the basket id
            prepare=lambda b: copurchase_pairs(
                b, "l_orderkey", "l_partkey", min_support=1
            ),
        )
        run_stream_additive_counts(
            mkstream(),
            item_state,
            os.path.join(tmp, "ckpt_i"),
            group_cols=["item"],
            prepare=lambda b: b.select(
                F.col("l_orderkey").alias("__bk"),
                F.col("l_partkey").alias("item"),
            ).distinct(),
        )
        pairs = read_summed_sums(
            spark, pair_state, ["item_a", "item_b"], ["support"]
        ).select("item_a", "item_b", F.col("sum_support").alias("support"))
        counts = read_summed_counts(spark, item_state, ["item"]).select(
            "item", F.col("n").alias("c")
        )
        rows = item_similarity_from_counts(
            pairs, counts, min_support=2, top_k=5
        ).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "item long, neighbor long, support long, cos_ppm long, rank int",
    )


def q_stream_gram_power(spark, sf_dir):
    """F6 x distributed linear algebra: the eigensolver's INPUT
    maintained live — the Gram matrix G = Σᵢ xᵢxᵢᵀ is itself additive
    state (per-batch partial Grams sum exactly, BIGINT), so the
    quantized (dim_i, dim_j, Σ xqᵢ·xqⱼ) cells ride the additive-sums
    fold; the read-out contracts the summed G against the broadcast
    v0 to g = G·v0 — the IDENTICAL integers q_power_step computes as
    Xᵀ(Xv0) in one pass over data at rest (oracle VERBATIM). 25th
    equivalence face: a PCA/spectral service can keep G current per
    micro-batch and answer power steps without rescanning the corpus.
    State is dims²-bounded (256 cells at 16 dims) regardless of
    volume."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_sums,
        run_stream_additive_sums,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_gram_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("vec_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "vec_id long, embedding array<float>"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")

        def prep(b):
            xq = F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.round(x * 1000, 0).cast("long"),
            )
            rows = b.select(xq.alias("__xq"))
            a = rows.select(
                F.posexplode(F.col("__xq")).alias("__pi", "__xi"),
                F.col("__xq"),
            )
            return a.select(
                (F.col("__pi") + 1).cast("int").alias("dim_i"),
                F.posexplode(F.col("__xq")).alias("__pj", "__xj"),
                F.col("__xi"),
            ).select(
                "dim_i",
                (F.col("__pj") + 1).cast("int").alias("dim_j"),
                (F.col("__xi") * F.col("__xj")).alias("g"),
            )

        run_stream_additive_sums(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["dim_i", "dim_j"],
            sum_cols=["g"],
            prepare=prep,
        )
        gram = read_summed_sums(
            spark, state, ["dim_i", "dim_j"], ["g"]
        ).select("dim_i", "dim_j", F.col("sum_g").alias("s"))
        v0 = e.filter(F.col("vec_id") == 0).select(
            F.posexplode(
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000, 0).cast("long"),
                )
            ).alias("__p", "__v")
        ).select(
            (F.col("__p") + 1).cast("int").alias("dim_j"),
            F.col("__v").alias("v"),
        )
        rows = (
            gram.join(F.broadcast(v0), "dim_j")
            .groupBy(F.col("dim_i").alias("dim"))
            .agg(F.sum(F.col("s") * F.col("v")).cast("long").alias("gv"))
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "dim int, gv long")


def q_stream_autocorr(spark, sf_dir):
    """F6 x time series: the persistence probe live — the SAME additive
    per-(type, day) count state as q_stream_changepoint, read out
    through autocorr_from_daily; one maintained state serves BOTH
    monitors (the point of factoring folds from read-outs), and each
    read-out equals its one-shot batch (q_autocorr's oracle VERBATIM).
    26th equivalence face."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.operators.analytics import (
        autocorr_from_daily,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_ac_")
    try:
        src = _slice_to_files(
            spark,
            [e.filter(F.col("event_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["event_type", "day"],
            prepare=lambda b: b.select(
                "event_type", F.to_date(F.col("ts")).alias("day")
            ),
        )
        daily = read_summed_counts(
            spark, state, ["event_type", "day"]
        ).select(F.col("event_type").alias("__t"), "day", "n")
        rows = autocorr_from_daily(daily, "event_type", max_lag=3).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, lag int, dot long, n_days long"
    )


def q_stream_kneser_ney(spark, sf_dir):
    """F6 × LM curation: the Kneser-Ney perplexity gate's MODEL
    maintained FROM A STREAM — target-slice bigram counts are
    additive across disjoint batches, so the generic additive fold
    (replay-idempotent per-batch partitions) maintains c12 with zero
    new fold code; the summed state feeds kn_score_from_counts over
    the batch-loaded corpus and must equal the one-shot q_kneser_ney
    gate (its oracle VERBATIM). The face the live curation pipeline
    needs: the in-domain LM keeps absorbing new target documents
    while the scorer stays a pure reduction of the same state."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.text import (
        bigram_rows,
        kn_score_from_counts,
        tokens,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    tmp = tempfile.mkdtemp(prefix="conf_stream_kn_")
    try:
        src = _slice_to_files(
            spark,
            [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema("doc_id long, lang string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_counts(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["w1", "w2"],
            prepare=lambda b: bigram_rows(
                b.filter(F.col("lang") == "en"), "doc_id", "text"
            ).select("w1", "w2"),
        )
        c12 = read_summed_counts(spark, state, ["w1", "w2"]).select(
            "w1", "w2", F.col("n").alias("__c12")
        )
        big = bigram_rows(
            d.filter(F.size(tokens(F.col("text"))) >= 2), "doc_id", "text"
        )
        rows = kn_score_from_counts(big, c12, "doc_id").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, n_bigrams long, n_scored long, kn_bits_x8 long,"
        " milli_bits_per_bigram long",
    )


def q_stream_repeated_spans(spark, sf_dir):
    """F6 × F1 (round 8): the variable-length maximal repeated-span
    INVENTORY maintained from a stream — anchor-shingle occurrences are
    a SET (distinct (doc, spos, key)), so the set-union fold (append
    distinct, dedup on read: associative, commutative AND idempotent —
    fully replay/overlap safe) accumulates exactly the occ table the
    batch operator explodes; the read-out replays the batch op's
    flag → islands → content-hash tail over the summed state and must
    equal one-shot q_repeated_spans (its oracle VERBATIM)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window
    from salesforce_plugin_spark.functions.text import tokens
    from salesforce_plugin_spark.streaming.upsert import (
        read_distinct_set,
        run_stream_distinct_set,
    )

    n_anchor = 8
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="conf_stream_spans_")
    try:
        src = _slice_to_files(
            spark,
            [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")

        def occ_rows(b):
            toked = b.select(
                F.col("doc_id"), tokens(F.col("text")).alias("__toks")
            )
            starts = F.sequence(
                F.lit(1), F.size(F.col("__toks")) - (n_anchor - 1)
            )
            occ_structs = F.when(
                F.size(F.col("__toks")) >= n_anchor,
                F.transform(
                    starts,
                    lambda i: F.struct(
                        i.alias("spos"),
                        F.md5(
                            F.array_join(
                                F.slice(F.col("__toks"), i, n_anchor), " "
                            ).cast("binary")
                        ).alias("key"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<spos:int,key:string>>")
            )
            return toked.select(
                F.col("doc_id"), F.explode(occ_structs).alias("__s")
            ).select(
                F.col("doc_id"),
                F.col("__s.spos").alias("spos"),
                F.col("__s.key").alias("key"),
            )

        run_stream_distinct_set(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            cols=["doc_id", "spos", "key"],
            prepare=occ_rows,
        )
        occ = read_distinct_set(spark, state, ["doc_id", "spos", "key"])
        flagged = occ.withColumn(
            "__cnt", F.count(F.lit(1)).over(Window.partitionBy("key"))
        ).filter(F.col("__cnt") > 1)
        wd = Window.partitionBy("doc_id").orderBy("spos")
        runs = (
            flagged.withColumn(
                "__grp", F.col("spos") - F.row_number().over(wd)
            )
            .groupBy("doc_id", "__grp")
            .agg(
                F.min("spos").alias("span_start"),
                (F.max("spos") - F.min("spos") + n_anchor).alias(
                    "span_tokens"
                ),
            )
            .drop("__grp")
        )
        toked = d.select(F.col("doc_id"), tokens(F.col("text")).alias("__toks"))
        rows = (
            runs.join(toked, "doc_id")
            .select(
                F.col("doc_id"),
                F.col("span_start"),
                F.col("span_tokens"),
                F.md5(
                    F.array_join(
                        F.slice(
                            F.col("__toks"),
                            F.col("span_start"),
                            F.col("span_tokens"),
                        ),
                        " ",
                    ).cast("binary")
                ).alias("span_md5"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, span_start int, span_tokens int, span_md5 string"
    )


def q_stream_distill(spark, sf_dir):
    """F6 × F5 (round 8): the quality-distillation FIT maintained from a
    stream — the normal-equation moments are plain integer SUMS of
    per-sample-row terms (functions/ir.py quality_moment_rows), so the
    generic additive fold (replay-idempotent ``__b=`` partitions)
    maintains the fit state across batches with zero new fold code; the
    read-out solves the same exact-integer Cramer system and scores the
    batch-loaded corpus with apply_student — the literal plan the batch
    operator uses — and must equal one-shot q_distill_quality (its
    oracle VERBATIM). The face a live curation pipeline needs: the
    student keeps refitting as teacher labels stream in, scoring stays
    a pure reduction of the summed state."""
    import os
    import shutil
    import tempfile

    from salesforce_plugin_spark.functions.ir import (
        _solve_student,
        apply_student,
        quality_moment_rows,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_sums,
        run_stream_additive_sums,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="conf_stream_distill_")
    sums = ["x1", "x2", "y", "x1x1", "x2x2", "x1x2", "x1y", "x2y"]
    try:
        src = _slice_to_files(
            spark,
            [d.filter(F.col("doc_id") % 3 == i) for i in range(3)],
            tmp,
            None,
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(tmp, "state")
        run_stream_additive_sums(
            stream,
            state,
            os.path.join(tmp, "ckpt"),
            group_cols=["g"],
            sum_cols=sums,
            prepare=lambda b: quality_moment_rows(
                b, "doc_id", "text", sample_mod=4
            ),
        )
        row = read_summed_sums(spark, state, ["g"], sums).collect()[0]
        m = {"n": int(row["n"])}
        m.update(
            {
                k: int(row[f"sum_{c}"])
                for c, k in zip(
                    sums,
                    ["sx1", "sx2", "sy", "sx1x1", "sx2x2", "sx1x2",
                     "sx1y", "sx2y"],
                )
            }
        )
        w = _solve_student(m)
        rows = apply_student(d, "doc_id", "text", w, sample_mod=4).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, n_tokens long, n_stop long, teacher_scaled long,"
        " student_score double",
    )
