"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2 F6 — the genuinely-stateful piece the built-in window/session
aggregations can't express).

``running_user_totals`` keeps an arbitrary per-key accumulator (count +
value sum + last-seen event time) across micro-batches and emits the
updated totals each batch — the shape of per-user feature accumulation in
a training-data pipeline (e.g. rolling document counts per source).

Determinism: the value accumulator is an exact integer (micro-units,
``floor(value * 1e6)``) rather than a running double — float accumulation
order across micro-batches and shuffle arrival is nondeterministic, an
integer sum is associative/commutative, so the final state is
bit-identical run to run and oracle-checkable (``q_stream_stateful``).
The double ``total_value`` is derived by ONE division at emit time.

Scale posture: state lives in the state store partitioned by the grouping
key (one store per shuffle partition); each micro-batch touches only keys
present in that batch. The Arrow boundary batches rows per key-group, so
Python cost is per-batch, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_micros", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_micros", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_totals(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total_micros, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer micro-units; floor (not round) so there is no
        # half-way tie rule to match across engines
        total_micros += int(
            np.floor(pdf["value"].to_numpy() * 1e6).astype("int64").sum()
        )
        # normalize to ns first — the Arrow→pandas dtype may be [us] or [ns]
        ts_us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).max()
        last_us = max(last_us, int(ts_us))
    state.update((n, total_micros, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value_micros": [total_micros],
            "total_value": [total_micros / 1e6],
            "last_ts_us": [last_us],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum, last event time) maintained in
    streaming state; one updated row per user per micro-batch.

    ``events`` must have ``user_id``, ``value``, and a timestamp ``ts``
    (e.g. from ``stream_events``). Use output mode ``update``.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct-count (mergeable sketch state)
# ---------------------------------------------------------------------------

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("n_kept", T.IntegerType()),
        T.StructField("kth_hash", T.LongType()),
        T.StructField("est_distinct", T.LongType()),
    ]
)

KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
        T.StructField("hashes", T.ArrayType(T.LongType())),
    ]
)


def running_kmv_distinct(
    hashed: DataFrame, key_col: str = "event_type", hash_col: str = "__h",
    k: int = 64,
) -> DataFrame:
    """Per-key streaming distinct-count via a KMV sketch maintained in
    ``applyInPandasWithState`` — the streaming face of
    ``functions.sketch.kmv_distinct``, exercising the property that makes
    KMV the scalable streaming cardinality sketch: its state is a
    bounded, ORDER-INSENSITIVE merge (keep the k smallest hashes), so
    any micro-batch arrival order yields the identical final state, and
    the final estimate equals the batch computation over the same rows
    (gated by ``q_stream_kmv``). State is ≤ k longs per key regardless
    of stream length.

    ``hashed`` must already carry ``hash_col`` (computed JVM-side, e.g.
    ``dedup.portable_hash32`` — Python only merges sorted ints).
    ``n_seen`` (rows processed) is strictly increasing, so the final
    state row per key is the max-``n_seen`` row of an update-mode sink.
    """
    if k < 2:
        raise ValueError("kmv requires k >= 2")

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (etype,) = key
        n_seen, hashes = state.get if state.exists else (0, [])
        merged = set(hashes)
        for pdf in pdfs:
            n_seen += len(pdf)
            merged.update(int(h) for h in pdf[hash_col])
        kept = sorted(merged)[:k]
        state.update((n_seen, kept))
        kth = kept[-1] if kept else 0
        est = (
            len(kept)
            if len(kept) < k
            else ((k - 1) * (1 << 32)) // kth
        )
        yield pd.DataFrame(
            {
                "event_type": [etype],
                "n_seen": [n_seen],
                "k": [k],
                "n_kept": [len(kept)],
                "kth_hash": [kth],
                "est_distinct": [est],
            }
        )

    return (
        hashed.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=KMV_OUTPUT_SCHEMA,
            stateStructType=KMV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
