"""Fixture timestamp-precision guards.

Round 2 post-mortem: the driver regenerated the fixtures from
``timestamp[ns]`` to ``timestamp[us]`` while the streaming source still
hardcoded the nanos assumption — event time silently compressed 1000× and
four streaming queries went wrong. These tests pin (a) what the footers
actually contain (so FIXTURES.md can't drift silently again) and (b) that
the batch and streaming sources agree with the footer, whatever it says.
No Spark session needed — footer-only reads.
"""

from __future__ import annotations

import os

import pytest

from salesforce_plugin_spark.sources.catalog import (
    _nanos_timestamp_columns,
    timestamp_unit,
)

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

needs_fixtures = pytest.mark.skipif(not SF_DIRS, reason="no fixture dirs")

#: every (table, column) the engine treats as event time / temporal.
TS_COLUMNS = [
    ("events", "ts"),
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
]


@needs_fixtures
@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table,col", TS_COLUMNS)
def test_footer_unit_matches_fixtures_md(sf_dir, table, col):
    """FIXTURES.md documents timestamp[us] for all temporal columns; the
    footers must agree. If the driver regenerates with a different unit,
    this failure is the early warning — update FIXTURES.md and re-verify
    the streaming queries (the engine itself adapts via the footer sniff)."""
    unit = timestamp_unit(os.path.join(sf_dir, f"{table}.parquet"), col)
    assert unit == "us", (sf_dir, table, col, unit)


@needs_fixtures
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_nanos_repair_set_is_consistent_with_units(sf_dir):
    """The batch catalog's repair list must contain exactly the columns the
    footer says are TIMESTAMP(NANOS) — for the current µs fixtures that is
    the empty set, i.e. no repair (and no double-division) anywhere."""
    for table, col in TS_COLUMNS:
        path = os.path.join(sf_dir, f"{table}.parquet")
        nanos = {c.lower() for c in _nanos_timestamp_columns(path)}
        expected = {col} if timestamp_unit(path, col) == "ns" else set()
        assert nanos == expected, (table, nanos)


def test_epoch_unit_of_magnitudes():
    """Magnitude bands for int64 epoch inference: 2024-ish instants in each
    unit land in the right band, and the bands are decades apart."""
    from salesforce_plugin_spark.sources.catalog import epoch_unit_of

    t = 1_700_000_000  # 2023-11-14 in seconds
    assert epoch_unit_of(t) == "s"
    assert epoch_unit_of(t * 1_000) == "ms"
    assert epoch_unit_of(t * 1_000_000) == "us"
    assert epoch_unit_of(t * 1_000_000_000) == "ns"


def test_int64_epoch_unit_from_statistics(tmp_path):
    """int64_epoch_unit reads row-group stats only — a millis-encoded int64
    ts must sniff as 'ms' (the exact shape the nanos assumption broke on)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from salesforce_plugin_spark.sources.catalog import int64_epoch_unit

    path = str(tmp_path / "ev.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([1_700_000_000_000, 1_700_000_100_000])}),
        path,
    )
    assert int64_epoch_unit(path, "ts") == "ms"
    assert int64_epoch_unit(path, "missing") is None


def test_footer_cache_invalidates_on_rewrite(tmp_path):
    """The footer-schema cache keys on (path, mtime): regenerating a file at
    the same path with a different unit must re-sniff, not serve the stale
    decision (the between-rounds fixture hazard)."""
    import os as _os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from salesforce_plugin_spark.sources.catalog import timestamp_unit

    path = str(tmp_path / "t.parquet")
    ts = pa.array([1_700_000_000_000_000], type=pa.timestamp("us"))
    pq.write_table(pa.table({"ts": ts}), path)
    assert timestamp_unit(path, "ts") == "us"
    time.sleep(0.01)
    ts_ns = pa.array([1_700_000_000_000_000_000], type=pa.timestamp("ns"))
    pq.write_table(pa.table({"ts": ts_ns}), path)
    _os.utime(path)  # ensure the mtime tick is visible on coarse filesystems
    assert timestamp_unit(path, "ts") == "ns"


def test_footer_sniff_resolves_globs(tmp_path):
    """A glob path (the shape stream_events hands the source) must resolve
    to a sample file for footer inspection instead of silently failing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from salesforce_plugin_spark.sources.catalog import column_arrow_type

    path = str(tmp_path / "g.parquet")
    pq.write_table(pa.table({"ts": pa.array([1], type=pa.int64())}), path)
    assert column_arrow_type(path + "*", "ts") == "int64"
    assert column_arrow_type(str(tmp_path / "nope*"), "ts") is None


@needs_fixtures
def test_stream_schema_tracks_footer_unit():
    """The streaming source must declare ``ts`` LongType only for genuine
    raw-nanos parquet; for the current native-µs fixtures it must be a
    plain TimestampType with no div-1000 repair in the plan."""
    import pyspark.sql.types as T

    from salesforce_plugin_spark.streaming.windows import events_schema

    path = os.path.join(SF_DIRS[0], "events.parquet")
    is_ns = timestamp_unit(path, "ts") == "ns"
    schema = events_schema(is_ns)
    ts_field = next(f for f in schema.fields if f.name == "ts")
    expected = T.LongType() if is_ns else T.TimestampType()
    assert ts_field.dataType == expected
