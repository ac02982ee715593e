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
