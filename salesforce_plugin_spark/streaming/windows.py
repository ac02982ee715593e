"""Structured Streaming formulation of the event pipeline (SURVEY §2 F6).

The reference's incremental idiom is a Jinja-templated watermark predicate —
``WHERE SystemModstamp > {{ prev_execution_date }}`` re-rendered per run
(``template_fields``, salesforce_to_s3_operator.py:25,115-116). Structured
Streaming is that idiom made continuous: the watermark tracks progress
instead of the scheduler, and the same windowed aggregations run as the
batch forms in conformance.py (q_event_window / q_event_session share these
plan shapes — Spark's unified batch/streaming semantics guarantee the same
results for the same input data).

Scale posture: streaming state (window + session stores) is partitioned by
grouping key across executors; watermarks bound state size by evicting
windows older than the allowed lateness. At 100 TB/day ingest, the knobs
that matter are ``spark.sql.shuffle.partitions`` (state store count),
watermark delay (state retention), and RocksDB state backend
(``spark.sql.streaming.stateStore.providerClass``) for state > heap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame, SparkSession

def events_schema(ts_is_raw_long: bool) -> T.StructType:
    """events fixture schema (FIXTURES.md) — streaming file sources need an
    explicit schema (no inference mid-stream). ``ts`` is declared LongType
    when the parquet physically stores TIMESTAMP(NANOS) (which the
    session-wide ``spark.sql.legacy.parquet.nanosAsLong`` surfaces as raw
    epoch-nanos longs) or a plain int64 epoch column; for µs/ms/s timestamp
    encodings it is a plain TimestampType."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField(
                "ts", T.LongType() if ts_is_raw_long else T.TimestampType()
            ),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


#: repair expression per raw-long epoch unit (all integer arithmetic —
#: epoch nanos exceed double's 2^53 exact range, so no float divides)
_EPOCH_REPAIR = {
    "ns": "timestamp_micros(ts div 1000)",
    "us": "timestamp_micros(ts)",
    "ms": "timestamp_millis(ts)",
    "s": "timestamp_seconds(ts)",
}


def stream_events(
    spark: SparkSession,
    path: str,
    watermark: str | None = "30 minutes",
    ts_unit: str | None = None,
) -> DataFrame:
    """readStream over an events parquet directory with event-time watermark.

    ``watermark=None`` skips the source watermark — for consumers that
    rename the event-time column before watermarking (e.g. the two sides
    of a stream-stream join), since Spark disallows redefining a watermark
    downstream.

    The watermark is the late-data bound: rows later than it are dropped
    from stateful aggregations, which is what lets state be evicted instead
    of growing forever.

    ``path`` may be a directory, a glob, or a single parquet file — the file
    streaming source itself only accepts directories/globs, so a plain file
    path is rewritten to a glob matching exactly that file.

    The ``ts`` encoding is sniffed from the parquet footer exactly like the
    batch path (catalog.timestamp_unit): genuine TIMESTAMP(NANOS) columns
    are read as raw longs and repaired with ``timestamp_micros(ts div
    1000)``; native µs/ms timestamps pass through untouched — dividing
    those again compresses event time 1000× (the round-2 streaming bug).
    A plain int64 ``ts`` is ambiguous by type alone (epoch-s/ms/us/ns are
    all plausible legacy-extract shapes), so its unit is sniffed from
    row-group statistics by magnitude (catalog.int64_epoch_unit); pass
    ``ts_unit`` explicitly to override, and if neither sniff nor caller
    determines the unit this raises rather than guessing.
    """
    import os

    from salesforce_plugin_spark.session import ensure_runtime_conf
    from salesforce_plugin_spark.sources.catalog import (
        column_arrow_type,
        int64_epoch_unit,
    )

    # normalize the session like the batch catalog does — a caller driving
    # ONLY the streaming path on a fresh session still needs UTC time and
    # the parquet confs (batch queries get this via load_table)
    ensure_runtime_conf(spark)
    arrow_t = column_arrow_type(path, "ts")
    if arrow_t == "timestamp[ns]":
        ts_unit = ts_unit or "ns"
    elif arrow_t == "int64":
        ts_unit = ts_unit or int64_epoch_unit(path, "ts")
        if ts_unit is None:
            raise ValueError(
                f"int64 ts column under {path} has no row-group statistics "
                "to infer its epoch unit from; pass ts_unit='s'|'ms'|'us'|'ns'"
            )
    else:
        ts_unit = None  # native timestamp — no repair
    if ts_unit is not None and ts_unit not in _EPOCH_REPAIR:
        raise ValueError(f"unknown ts_unit {ts_unit!r}")
    if os.path.isfile(path):
        path = path + "*" if not path.endswith("*") else path
    raw = (
        spark.readStream.schema(events_schema(ts_unit is not None))
        .option("maxFilesPerTrigger", 8)  # bounded batches on backfill
        .parquet(path)
    )
    if ts_unit is not None:
        raw = raw.withColumn("ts", F.expr(_EPOCH_REPAIR[ts_unit]))
    return raw.withWatermark("ts", watermark) if watermark else raw


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", slide: str | None = None
) -> DataFrame:
    """Tumbling (default) or sliding (``slide`` < ``window``) event-time
    aggregation — streaming form of q_event_window / q_event_sliding. A
    sliding window assigns each event to window/slide overlapping windows
    (state and output scale by that factor; the input is read once)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    # exact order-insensitive sum on the primitive fast path: per-row value
    # rounded to 4 digits by a compact decimal cast, carried as a scaled
    # BIGINT in the window state (cheaper per-update than a widening
    # decimal accumulator), divided back once on emit — value-identical to
    # a decimal sum cast to double (see conformance._sumd). Bounds (same
    # contract as _sumd): per-row |value| < 1e14 (decimal(18,4) headroom —
    # larger values fail the cast loudly under ANSI mode rather than
    # silently dropping out of the sum), the long accumulator holds
    # |Σ|·1e4 < 2^63, and the final divide is exact while |Σ|·1e4 < 2^53.
    scaled = (F.col("value").cast("decimal(18,4)") * 10000).cast("long")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(scaled) / F.lit(10000.0)).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionized_events(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows (inactivity gap) per user — streaming form of
    q_event_session. Sessions merge as events arrive; a session closes when
    the watermark passes its end."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup within the watermark horizon (F1, streaming
    form): duplicate event_ids arriving within the late-data bound are
    dropped; state for ids older than the watermark is evicted."""
    return events.dropDuplicatesWithinWatermark(keys or ["event_id"])


def dedup_stream_by_content(
    events: DataFrame, text_col: str, keys: list[str] | None = None
) -> DataFrame:
    """Streaming exact *content* dedup: fingerprint the payload (normalized
    md5, functions/text.fingerprint) and drop repeats within the watermark
    horizon — the streaming form of the training pipeline's dedup stage.
    State holds one fingerprint per distinct content until the watermark
    passes (bounded, evicted)."""
    from salesforce_plugin_spark.functions.text import fingerprint

    with_fp = events.withColumn("__fp", fingerprint(F.col(text_col)))
    return with_fp.dropDuplicatesWithinWatermark((keys or []) + ["__fp"]).drop(
        "__fp"
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: Column | str | list[str],
    how: str = "left",
    select: list[str] | None = None,
) -> DataFrame:
    """Stream-static enrichment join: decorate the event stream with a
    static dimension (user/account attributes) — the streaming form of the
    D8 parent-lookup join.

    The static side is broadcast, so the stream side never shuffles and no
    join state accumulates (stream-static joins are stateless by
    construction; the dimension is re-resolved per micro-batch, which is
    also what picks up slowly-changing dimension updates between batches).
    At 100 TB/day the dimension must stay broadcast-sized or be pre-bucketed
    to the stream's partitioning."""
    joined = events.join(F.broadcast(dim), on, how)
    return joined.select(*select) if select else joined


def interval_join_streams(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str,
    interval_end_ts: str,
    lookback: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each ``points`` event matches the
    ``intervals`` events of the same key whose end timestamp falls within
    ``[point_ts, point_ts + lookback]`` — i.e. the point lies in the
    interval's trailing window. The streaming form of the batch
    range_join_bucketed (operators/joins.py): clicks attributed to the
    purchases they precede.

    Both inputs MUST carry watermarks (stream_events sets one): the
    time-range join condition plus the two watermarks is exactly what lets
    Spark bound the join state — each side's state is evicted once the
    other side's watermark passes the range bound, so state size tracks
    the lookback horizon, not the stream length. Inner join only (outer
    stream-stream joins emit nulls on watermark expiry — different
    result-stability contract).

    Column naming: caller renames collision columns beforehand; the join
    condition references columns by name across the two plans.
    """
    cond = None
    for k in keys:
        c = points[k] == intervals[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (intervals[interval_end_ts] >= points[point_ts])
        & (
            intervals[interval_end_ts]
            <= points[point_ts] + F.expr(f"INTERVAL {lookback}")
        )
    )
    return points.join(intervals, cond, "inner")


def incremental_predicate(ts_col: str | Column, since) -> Column:
    """The reference's templated-watermark idiom (D21) as a plain predicate:
    ``WHERE ts > {{ prev_execution_date }}`` for batch incremental runs —
    the degenerate, scheduler-driven form of the streaming watermark."""
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return col > F.lit(since).cast("timestamp")


def run_to_parquet_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
):
    """Production file sink: exactly-once parquet output with a checkpoint
    directory (offsets + state), restartable mid-stream. ``partition_by``
    should be a coarse time bucket so partitioned reads prune (SCALE.md /
    partitioning.repartition_by_time). Drains available input and returns
    the finished StreamingQuery."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()
    return q


def run_to_memory_sink(
    stream: DataFrame, name: str, mode: str = "append"
) -> "DataFrame":
    """Drain all currently-available input through the streaming plan into an
    in-memory table (test/debug helper; production sinks are files/Kafka).
    Returns the sink table DataFrame after the stream finishes."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream.sparkSession.table(name)
