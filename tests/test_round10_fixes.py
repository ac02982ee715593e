"""Round-10 fixes: stream-fold order guards + carry completeness.

The round-9 driver window produced its first hash-mismatch in seven
rounds (q_stream_cusum: rows/schema match, values wrong). Two defects
in that fold family are closed here, each pinned by a test written to
FAIL on the round-9 code:

1. run_stream_cusum's ``local.join(carry, key_cols, "left")`` dropped
   the carry rows of every key ABSENT from the current batch — a key
   with events in batches 0 and 2 but not 1 silently restarted its
   CUSUM from zero (exactly the driver signature).
2. The documented "batches arrive in per-key observation order"
   precondition of the cusum / interarrival / SCD2 faces was never
   checked at runtime, so an order perturbation produced silently
   wrong values instead of an error. The carry now stores the per-key
   last-folded timestamp and the fold RAISES on a violating batch.
"""

import datetime as dt
import os
import time as _time

import pyspark.sql.functions as F
import pytest


def _write_batches(tmp_path, spark, df, splits, schema):
    """Write df slices as mtime-ordered single-file batches; return src dir."""
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    now = int(_time.time())
    for i, sl in enumerate(splits):
        part = str(tmp_path / f"stage{i}")
        sl.coalesce(1).write.mode("overwrite").parquet(part)
        pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(part, pf), dst)
        os.utime(dst, (now + i * 60, now + i * 60))
    return src


def _cusum_stream(spark, src):
    return (
        spark.readStream.schema("k string, ts timestamp, id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _cusum_rows():
    # key "a": observations only in the first and last time slice;
    # key "b": observations in every slice.
    rows = []
    vals_a = [9, 14, 30, 12]  # ids 0,1 (slice 0) and 6,7 (slice 2)
    vals_b = [5, 2, 1, 9, 0, 7]  # ids 0..5 spread across all slices
    for i, v in enumerate(vals_a):
        day = 1 if i < 2 else 21
        rows.append(("a", dt.datetime(2024, 1, day, 0, 0, i), i, v))
    for i, v in enumerate(vals_b):
        day = 1 if i < 2 else (11 if i < 4 else 21)
        rows.append(("b", dt.datetime(2024, 1, day, 0, 0, i), i, v))
    return rows


def test_stream_cusum_key_absent_from_middle_batch(spark, tmp_path):
    """A key missing from an intermediate batch must KEEP its carry:
    streamed output stays row-identical to the one-shot batch run."""
    from salesforce_plugin_spark.operators.timeseries import cusum_alarms
    from salesforce_plugin_spark.streaming.upsert import run_stream_cusum

    df = spark.createDataFrame(
        _cusum_rows(), "k string, ts timestamp, id long, v long"
    )
    splits = [
        df.filter(F.col("ts") < "2024-01-10"),
        df.filter((F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-20")),
        df.filter(F.col("ts") >= "2024-01-20"),
    ]
    # precondition of the test itself: "a" absent from the middle slice
    assert splits[1].filter("k = 'a'").count() == 0
    assert splits[0].filter("k = 'a'").count() > 0
    assert splits[2].filter("k = 'a'").count() > 0
    src = _write_batches(tmp_path, spark, df, splits, None)
    out_dir = str(tmp_path / "out")
    run_stream_cusum(
        _cusum_stream(spark, src), out_dir, str(tmp_path / "state"),
        str(tmp_path / "ckpt"), ["k"], "ts", "v",
        target=5, slack=1, threshold=6, tiebreak_cols=["id"],
    )
    got = sorted(
        (r.k, r.ts, r.v, r.id, r.cusum, r.alarm)
        for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        (r.k, r.ts, r.v, r.id, r.cusum, r.alarm)
        for r in cusum_alarms(
            df, ["k"], "ts", "v", target=5, slack=1, threshold=6,
            tiebreak_cols=["id"],
        ).collect()
    )
    assert got == want and len(got) == 10


def test_stream_cusum_out_of_order_batch_raises(spark, tmp_path):
    """A batch holding a row OLDER than its key's last-folded ts is a
    precondition violation and must raise, never fold wrong values."""
    from salesforce_plugin_spark.streaming.upsert import run_stream_cusum

    rows = [
        ("k", dt.datetime(2024, 1, 20, 0, 0, i), i, v)
        for i, v in enumerate([5, 9, 2, 14])
    ]
    # the "late" slice time-travels before everything above
    rows += [("k", dt.datetime(2024, 1, 1), 99, 7)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v long")
    splits = [df.filter("id < 4"), df.filter("id = 99")]
    src = _write_batches(tmp_path, spark, df, splits, None)
    with pytest.raises(Exception, match="observation order"):
        run_stream_cusum(
            _cusum_stream(spark, src), str(tmp_path / "out"),
            str(tmp_path / "state"), str(tmp_path / "ckpt"),
            ["k"], "ts", "v", target=5, slack=1, threshold=6,
            tiebreak_cols=["id"],
        )


def test_stream_interarrival_out_of_order_batch_raises(spark, tmp_path):
    from salesforce_plugin_spark.streaming.upsert import (
        run_stream_interarrival,
    )

    rows = [("k", dt.datetime(2024, 1, 20, 0, 0, i)) for i in range(4)]
    rows += [("k", dt.datetime(2024, 1, 1))]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    splits = [
        df.filter(F.col("ts") >= "2024-01-10"),
        df.filter(F.col("ts") < "2024-01-10"),
    ]
    src = _write_batches(tmp_path, spark, df, splits, None)
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(Exception, match="observation order"):
        run_stream_interarrival(
            stream, str(tmp_path / "state"), str(tmp_path / "ckpt"),
            ["k"], "ts",
        )


def test_stream_scd2_out_of_order_batch_raises(spark, tmp_path):
    from salesforce_plugin_spark.streaming.upsert import run_stream_scd2

    rows = [
        ("k", "x", dt.datetime(2024, 1, 20), 0),
        ("k", "y", dt.datetime(2024, 1, 21), 1),
        # second batch STRADDLES the loaded frontier: one row
        # time-travels before the history, one genuinely advances it
        # (an entirely-past slice would be a legal idempotent replay)
        ("k", "z", dt.datetime(2024, 1, 1), 2),
        ("k", "w", dt.datetime(2024, 1, 22), 3),
    ]
    df = spark.createDataFrame(rows, "k string, attr string, ts timestamp, id long")
    splits = [df.filter("id < 2"), df.filter("id >= 2")]
    src = _write_batches(tmp_path, spark, df, splits, None)
    stream = (
        spark.readStream.schema(
            "k string, attr string, ts timestamp, id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with pytest.raises(Exception, match="straddles"):
        run_stream_scd2(
            stream, str(tmp_path / "table"), str(tmp_path / "ckpt"),
            ["k"], ["attr"], "ts", tiebreak_cols=["id"],
        )


def test_stream_scd2_in_order_still_green(spark, tmp_path):
    """The guard must not fire on a contract-honouring feed."""
    from salesforce_plugin_spark.operators.scd import scd2_intervals
    from salesforce_plugin_spark.streaming.upsert import run_stream_scd2

    rows = [
        ("k", "x", dt.datetime(2024, 1, 1), 0),
        ("k", "y", dt.datetime(2024, 1, 2), 1),
        ("k", "y", dt.datetime(2024, 1, 20), 2),
        ("k", "z", dt.datetime(2024, 1, 21), 3),
    ]
    df = spark.createDataFrame(rows, "k string, attr string, ts timestamp, id long")
    splits = [df.filter("id < 2"), df.filter("id >= 2")]
    src = _write_batches(tmp_path, spark, df, splits, None)
    stream = (
        spark.readStream.schema(
            "k string, attr string, ts timestamp, id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = str(tmp_path / "table")
    run_stream_scd2(
        stream, table, str(tmp_path / "ckpt"),
        ["k"], ["attr"], "ts", tiebreak_cols=["id"],
    )
    cols = ("k", "attr", "__valid_from", "__valid_to", "__is_current")
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(table).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in scd2_intervals(df, ["k"], ["attr"], "ts", ["id"]).collect()
    )
    assert got == want


def test_stream_cusum_legacy_carry_without_ts_still_folds(spark, tmp_path):
    """A round-9 carry (no ``__cts`` column) must keep folding: the
    guard is skipped for keys whose last ts is unknown, and the next
    commit upgrades the carry schema in place."""
    from salesforce_plugin_spark.streaming.upsert import (
        commit_carry,
        read_current_carry,
        run_stream_cusum,
    )

    state = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [("k", dt.datetime(2024, 2, 1, 0, i), i, v)
            for i, v in enumerate([9, 14])]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, v long")

    # run 1: fold the first batch normally (checkpoint advances to id 0)
    src = _write_batches(tmp_path, spark, df, [df.filter("id = 0")], None)
    run_stream_cusum(
        _cusum_stream(spark, src), out_dir, state, ckpt,
        ["k"], "ts", "v", target=5, slack=1, threshold=6,
        tiebreak_cols=["id"],
    )
    # doctor the committed carry back to the round-9 two-column schema
    # (what an upgraded deployment finds on disk): __ccum=3, __cm=0
    old = read_current_carry(spark, state)
    legacy = spark.createDataFrame(
        [tuple(r[c] for c in ("k", "__ccum", "__cm"))
         for r in old.collect()],
        "k string, __ccum long, __cm long",
    )
    commit_carry(legacy, state, 0)

    # run 2 (same checkpoint, batch id 1): must fold on the legacy carry
    now = int(_time.time()) + 600
    part = str(tmp_path / "stage_b1")
    df.filter("id = 1").coalesce(1).write.mode("overwrite").parquet(part)
    pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
    dst = os.path.join(src, "b1.parquet")
    os.rename(os.path.join(part, pf), dst)
    os.utime(dst, (now, now))
    run_stream_cusum(
        _cusum_stream(spark, src), out_dir, state, ckpt,
        ["k"], "ts", "v", target=5, slack=1, threshold=6,
        tiebreak_cols=["id"],
    )
    # batch 0: cum=3, m=0 -> 3; batch 1 on legacy carry: cum=3+8=11, m=0
    out = {r.id: r.cusum for r in spark.read.parquet(out_dir).collect()}
    assert out == {0: 3, 1: 11}
    carry = read_current_carry(spark, state)
    assert "__cts" in carry.columns
    row = carry.collect()[0]
    assert row["__ccum"] == 11 and row["__cts"] is not None


def test_near_dedup_fold_recovers_torn_compaction(spark, tmp_path):
    """ADVICE r9 (medium): the near-dedup fold read the bands corpus
    BEFORE any compaction recovery ran, so a crash between the
    compaction manifest write and the final rename left a torn layout
    that the next batch read as a corpus missing band rows. The fold
    must _recover_compaction both state dirs first."""
    from salesforce_plugin_spark.streaming import upsert as U

    # build a two-batch stream; between batches, simulate a torn
    # compaction of the bands dir (manifest written, __b= dirs half
    # deleted, compacted tmp present but not yet renamed).
    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely unrelated text about spark accumulators"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    state = str(tmp_path / "state")
    bands_path = os.path.join(state, "bands")

    src = _write_batches(
        tmp_path, spark, df, [df.filter("doc_id = 1")], None
    )
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    U.run_stream_near_dedup(
        stream, state, ckpt, "doc_id", "text", auto_compact_every=None,
    )

    # tear the bands dir exactly as an interrupted compact_batch_partials
    # would: write the compacted tmp + manifest, delete the __b= dirs,
    # but crash before the tmp -> __b=-1 rename.
    import json
    import shutil

    bdirs = [d for d in os.listdir(bands_path) if d.startswith("__b=")]
    assert bdirs
    corpus = spark.read.parquet(
        *[os.path.join(bands_path, d) for d in bdirs]
    ).select("doc_id", "band", "bucket").distinct()
    corpus = corpus.localCheckpoint(eager=True)
    tmpdir = os.path.join(bands_path, ".compact_tmp")
    corpus.write.mode("overwrite").parquet(tmpdir)
    with open(os.path.join(bands_path, "_compact_manifest.json"), "w") as fh:
        json.dump({"watermark": 1, "fold": sorted(bdirs)}, fh)
    for d in bdirs:
        shutil.rmtree(os.path.join(bands_path, d))

    # second batch (same source + checkpoint, batch id 1): doc 2 must
    # still join doc 1's cluster — requires the fold to complete the
    # compaction before reading the corpus.
    part = str(tmp_path / "stage_b1")
    df.filter("doc_id >= 2").coalesce(1).write.mode("overwrite").parquet(part)
    pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
    dst = os.path.join(src, "b1.parquet")
    os.rename(os.path.join(part, pf), dst)
    now2 = int(_time.time()) + 600
    os.utime(dst, (now2, now2))
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    U.run_stream_near_dedup(
        stream2, state, ckpt, "doc_id", "text", auto_compact_every=None,
    )
    assign = {
        r.doc_id: r.cluster_id
        for r in U.read_near_dedup_assignments(spark, state, "doc_id").collect()
    }
    assert assign[2] == assign[1]
    assert assign[3] != assign[1]


# --- two-phase grouping-set extensions (round 10) -----------------------


def test_soql_rollup_two_phase_avg_integral(spark):
    """AVG over an integral column is decomposable as Σsums/Σcounts
    (exact long partials, one double divide) — two-phase must fire
    and match the single-phase values, including all-NULL groups."""
    from salesforce_plugin_spark.plans import soql_to_df

    rows = [
        ("a", "x", 1), ("a", "x", 2), ("a", None, None),
        (None, "y", 4), ("b", "y", 5), ("b", "y", 6),
        ("c", "z", None),  # all-NULL group: AVG must stay NULL
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v int")
    got = soql_to_df(
        spark,
        "SELECT k1, AVG(v) a, COUNT() n, SUM(v) s FROM T "
        "GROUP BY ROLLUP(k1)",
        lambda name: df,
    )
    want = df.rollup("k1").agg(
        F.avg("v").alias("a"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    )
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )
    assert dict(got.dtypes)["a"] == dict(want.dtypes)["a"] == "double"
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and "__p0" in plan.split("Expand")[1][:600]


def test_soql_rollup_two_phase_decimal_sum_schema(spark):
    """ADVICE r9: the two-phase decimal SUM must produce the SAME
    result type as the single-phase lowering (sum precision widened
    ONCE), not a double-widened decimal(p+20,s)."""
    from decimal import Decimal

    from salesforce_plugin_spark.plans import soql_to_df

    rows = [("a", Decimal("1.25")), ("a", Decimal("2.50")),
            ("b", Decimal("3.75"))]
    df = spark.createDataFrame(rows, "k string, d decimal(12,2)")
    got = soql_to_df(
        spark,
        "SELECT k, SUM(d) s FROM T GROUP BY ROLLUP(k)",
        lambda name: df,
    )
    want = df.rollup("k").agg(F.sum("d").alias("s"))
    assert dict(got.dtypes)["s"] == dict(want.dtypes)["s"] == "decimal(22,2)"
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__p0" in plan  # two-phase actually fired
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )


def test_soql_rollup_avg_decimal_falls_back(spark):
    """Decimal AVG keeps the single-phase form (Catalyst's (p+4,s+4)
    divide-and-round is not reproduced two-phase) — fallback, correct."""
    from decimal import Decimal

    from salesforce_plugin_spark.plans import soql_to_df

    rows = [("a", Decimal("1.25")), ("a", Decimal("2.00")),
            ("b", Decimal("3.10"))]
    df = spark.createDataFrame(rows, "k string, d decimal(12,2)")
    got = soql_to_df(
        spark,
        "SELECT k, AVG(d) a FROM T GROUP BY ROLLUP(k)",
        lambda name: df,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__p0" not in plan  # single-phase
    want = df.rollup("k").agg(F.avg("d").alias("a"))
    assert dict(got.dtypes)["a"] == dict(want.dtypes)["a"]
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )


def test_grouping_sets_and_pivot_margins_two_phase_plans(spark):
    """The q_grouping_sets / q_pivot_margins conformance entries now
    aggregate the fact ONCE and Expand only the tiny base: the Expand
    node must sit above a partial aggregate (consuming __n/__f
    partials), not above the fact scan."""
    from salesforce_plugin_spark.conformance.relational import (
        q_grouping_sets,
    )
    from salesforce_plugin_spark.conformance.relational2 import (
        q_pivot_margins,
    )

    sf = "/root/testdata/sf0.001"
    for fn, marker in ((q_grouping_sets, "__n"), (q_pivot_margins, "__f")):
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in plan, fn.__name__
        below_expand = plan.split("Expand", 1)[1]
        assert marker in below_expand[:800], (fn.__name__, below_expand[:800])


# --- PNG codec (round 10): stdlib zlib + numpy, no media libs -----------


def test_png_roundtrip_all_filters_and_color_types():
    """decode(encode(x)) == x exactly for every color type and every
    forward filter type (each unfilter path exercised), over a spread
    of shapes including 1-pixel edges."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(1234)
    shapes = [(1, 1), (1, 7), (5, 1), (4, 4), (11, 3), (7, 13)]
    for ch in (1, 2, 3, 4):
        for h, w in shapes:
            arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            # cycle filters so every row filter appears when h >= 5
            filters = [(y % 5) for y in range(h)]
            out = decode_png(encode_png(arr, row_filters=filters))
            assert out.shape == (h, w, ch), (ch, h, w)
            assert np.array_equal(out, arr), (ch, h, w, filters)
    # per-filter isolation: a whole image under one filter each
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for f in range(5):
        got = decode_png(encode_png(arr, row_filters=[f] * 6))
        assert np.array_equal(got, arr), f


def test_png_grayscale_2d_input_and_default_filters():
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = decode_png(encode_png(arr))
    assert out.shape == (4, 6, 1)
    assert np.array_equal(out[:, :, 0], arr)


def test_decode_image_sniffs_png_and_bmp():
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_image,
        encode_bmp,
        encode_png,
    )

    rgb = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    assert np.array_equal(decode_image(encode_png(rgb)), rgb)
    assert np.array_equal(decode_image(encode_bmp(rgb)), rgb)
    # round 11: FFD8 now routes to the REAL decode_jpeg — a malformed
    # JPEG is a ValueError from the codec, not a seam refusal; the
    # injected-decoder pin moves to a genuinely unsupported format
    with pytest.raises(ValueError, match="truncated JPEG"):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg bytes")
    with pytest.raises(NotImplementedError, match="inject a decoder"):
        decode_image(b"GIF87a fake gif bytes")


def test_png_rejects_out_of_subset_and_truncation():
    import struct
    import zlib

    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-6])

    def rebuild(depth=8, color=2, interlace=0):
        sig = good[:8]
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        ck = lambda t, d: (  # noqa: E731
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )
        raw = zlib.compress(bytes(2 * (1 + 2 * 3)))
        return sig + ck(b"IHDR", ihdr) + ck(b"IDAT", raw) + ck(b"IEND", b"")

    # round 11 widened the subset to 16-bit, Adam7, and sub-byte
    # gray/palette — the reject pins move to the still-unsupported
    # tiers (sub-byte NON-gray/palette, 16-bit palette); the former
    # rejects are now size-validated decodes (positive round-trips
    # live in test_round11_fixes).
    with pytest.raises(ValueError, match="inject a decoder"):
        decode_png(rebuild(depth=4))  # sub-byte RGB stays illegal
    with pytest.raises(ValueError, match="inject a decoder"):
        decode_png(rebuild(depth=2, color=4))  # sub-byte gray+alpha
    with pytest.raises(ValueError, match="inject a decoder"):
        decode_png(rebuild(depth=16, color=3))  # 16-bit palette
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(rebuild(color=3))  # palette without a PLTE chunk
    with pytest.raises(ValueError, match="scanline size mismatch"):
        decode_png(rebuild(depth=16))  # 14 raw bytes, 2x2 RGB16 needs 26
    with pytest.raises(ValueError, match="Adam7 pass size"):
        decode_png(rebuild(interlace=1))  # 14 raw bytes, passes need 27
    # scanline size mismatch (valid zlib, wrong length)
    bad = rebuild()
    with pytest.raises(ValueError, match="scanline size mismatch"):
        # rebuild() deflates 2*(1+6)=14 zero bytes but IHDR says 2x2
        # RGB which needs exactly 14 — so corrupt by one row instead
        decode_png(
            bad.replace(
                zlib.compress(bytes(14)), zlib.compress(bytes(13))
            )
        )


def test_png_real_decode_through_pixel_histogram(spark):
    """The PNG path drives the same Arrow-batched operator the BMP
    tier does: encode known pixels (mixed filters), run
    image_pixel_histogram through the DEFAULT seam, check exact bin
    counts."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        encode_png,
        image_pixel_histogram,
    )

    rng = np.random.default_rng(7)
    arrs = {i: rng.integers(0, 256, (6, 4, 3), dtype=np.uint8) for i in (1, 2)}
    rows = [
        (i, bytearray(encode_png(a, row_filters=[y % 5 for y in range(6)])))
        for i, a in arrs.items()
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r.doc_id, r.bin): r.n
        for r in image_pixel_histogram(df, "doc_id", "payload", n_bins=16)
        .collect()
    }
    for i, a in arrs.items():
        want = np.bincount(a.reshape(-1) // 16, minlength=16)
        for b in range(16):
            assert got[(i, b)] == int(want[b]), (i, b)


def test_soql_rollup_count_distinct_two_phase(spark):
    """All-COUNT_DISTINCT-over-one-column ROLLUP/CUBE lowers through a
    distinct (keys, value) pair base: Expand consumes the deduped
    pairs, not the fact, and values (incl. NULL handling and the
    global row) match the single-phase operator."""
    from salesforce_plugin_spark.plans import soql_to_df

    rows = [
        ("a", "x"), ("a", "x"), ("a", "y"), ("a", None),
        ("b", "x"), (None, "z"), ("c", None),
    ]
    df = spark.createDataFrame(rows, "k string, t string")
    got = soql_to_df(
        spark,
        "SELECT k, COUNT_DISTINCT(t) nt FROM T GROUP BY ROLLUP(k)",
        lambda name: df,
    )
    want = df.rollup("k").agg(F.countDistinct("t").alias("nt"))
    key = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and "__dv" in plan


def test_soql_rollup_count_distinct_mixed_falls_back(spark):
    """COUNT_DISTINCT mixed with other aggregates (or over differing
    columns) keeps the single-phase form — correct, no pair base."""
    from salesforce_plugin_spark.plans import soql_to_df

    rows = [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)]
    df = spark.createDataFrame(rows, "k string, t string, v int")
    for stmt in (
        "SELECT k, COUNT_DISTINCT(t) nt, COUNT() n FROM T GROUP BY ROLLUP(k)",
        "SELECT k, COUNT_DISTINCT(t) nt, COUNT_DISTINCT(v) nv FROM T "
        "GROUP BY ROLLUP(k)",
    ):
        got = soql_to_df(spark, stmt, lambda name: df)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "__dv" not in plan and "__p0" not in plan, stmt
        got.collect()  # still runs correctly


def test_soql_cube_count_distinct_having_order(spark):
    """HAVING/ORDER BY references resolve against the pair-base output
    under the COUNT_DISTINCT two-phase form."""
    from salesforce_plugin_spark.plans import soql_to_df

    rows = [("a", "x"), ("a", "y"), ("a", "z"), ("b", "x"), ("b", "x")]
    df = spark.createDataFrame(rows, "k string, t string")
    got = soql_to_df(
        spark,
        "SELECT k, COUNT_DISTINCT(t) nt FROM T GROUP BY CUBE(k) "
        "HAVING COUNT_DISTINCT(t) > 1 ORDER BY COUNT_DISTINCT(t) DESC",
        lambda name: df,
    ).collect()
    # groups: a->3, b->1, global->3 ; HAVING>1 keeps a and global
    assert [(r.k, r.nt) for r in got] in (
        [(None, 3), ("a", 3)], [("a", 3), (None, 3)],
    )


def test_png_palette_roundtrip_and_trns():
    """Palette PNGs (color type 3) decode through PLTE lookup:
    decode(encode_palette(ix, pal)) == pal[ix] exactly over all five
    row filters; with tRNS the output gains the per-entry alpha."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png_palette,
    )

    rng = np.random.default_rng(99)
    pal = rng.integers(0, 256, (37, 3), dtype=np.uint8)
    idx = rng.integers(0, 37, (7, 5), dtype=np.uint8)
    filters = [y % 5 for y in range(7)]
    out = decode_png(encode_png_palette(idx, pal, row_filters=filters))
    assert out.shape == (7, 5, 3)
    assert np.array_equal(out, pal[idx])
    # tRNS: alpha per palette entry, padded with 255
    trns = np.array([0, 128, 255], dtype=np.uint8)
    out4 = decode_png(
        encode_png_palette(idx, pal, row_filters=filters, transparency=trns)
    )
    assert out4.shape == (7, 5, 4)
    assert np.array_equal(out4[:, :, :3], pal[idx])
    alpha = np.full(37, 255, dtype=np.uint8)
    alpha[:3] = trns
    assert np.array_equal(out4[:, :, 3], alpha[idx])


def test_png_palette_rejects_out_of_range_index():
    import numpy as np
    import struct
    import zlib

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png_palette,
    )

    pal = np.zeros((4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="out of range"):
        encode_png_palette(np.array([[0, 9]], dtype=np.uint8), pal)
    # hand-build a payload whose index exceeds the PLTE length
    sig = b"\x89PNG\r\n\x1a\n"
    ck = lambda t, d: (  # noqa: E731
        struct.pack(">I", len(d)) + t + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    )
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = zlib.compress(bytes([0, 1, 9]))  # filter 0, indices 1 and 9
    bad = (
        sig + ck(b"IHDR", ihdr) + ck(b"PLTE", pal.tobytes())
        + ck(b"IDAT", raw) + ck(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="out of range"):
        decode_png(bad)
