"""Round-11 fixes.

1. ADVICE r10 high: run_stream_scd2's frontier-straddle guard raised on
   LEGAL replays — the stored table compresses non-change observations,
   so a key whose batch held a change followed by later non-change rows
   has frontier (= last change ts) strictly inside the batch's [min,
   max] span, and a redelivery of that exact batch (crash between table
   write and checkpoint commit, or a checkpointless re-fold — both
   documented as legal no-ops) straddled and raised FOREVER (every
   restart redelivers and re-raises). The guard now compares the
   straddling keys' re-collapsed history against the stored one and
   raises only when it actually differs. The replay test here FAILS on
   round-10 code (ValueError: straddles); genuine out-of-order ingest
   still raises (test_round10_fixes.test_stream_scd2_out_of_order_
   batch_raises stays green unmodified).

2. VERDICT r10 #1/#6: the q_stream_cusum driver window failed with a
   silent hash mismatch two rounds running while every local drive was
   green. The entry now self-checks — after the stream drains it runs
   the batch twin (operators/timeseries.cusum_alarms) on the same base
   and RAISES with a bounded row diff if they diverge, so the driver's
   ``err`` field carries evidence instead of a bare hash mismatch. The
   comparator helper is unit-tested directly (divergence → ValueError
   naming rows; agreement → silent), and an end-to-end test proves an
   error raised inside the foreachBatch fold propagates out of the
   conformance-entry call path (not swallowed by the finally cleanup).
"""

import datetime as dt
import os
import time as _time

import pyspark.sql.functions as F
import pytest


def _write_batches(tmp_path, spark, df, splits):
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


SCD2_SCHEMA = "k string, attr string, ts timestamp, id long"


def _scd2_stream(spark, src):
    return (
        spark.readStream.schema(SCD2_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_scd2_replay_after_nonchange_absorbed(spark, tmp_path):
    """A change followed by non-change rows, then the SAME batch
    redelivered: frontier (last change ts) sits strictly inside the
    replay's span, but its re-collapse is identical — must be absorbed,
    not raise. FAILS on round-10 code (unconditional straddle raise)."""
    from salesforce_plugin_spark.operators.scd import scd2_intervals
    from salesforce_plugin_spark.streaming.upsert import run_stream_scd2

    rows = [
        ("k", "x", dt.datetime(2024, 1, 1), 0),
        ("k", "y", dt.datetime(2024, 1, 5), 1),   # change (frontier)
        ("k", "y", dt.datetime(2024, 1, 9), 2),   # non-change, compressed
    ]
    df = spark.createDataFrame(rows, SCD2_SCHEMA)
    src = _write_batches(tmp_path, spark, df, [df, df])  # second = replay
    run_stream_scd2(
        _scd2_stream(spark, src), str(tmp_path / "table"),
        str(tmp_path / "ckpt"), ["k"], ["attr"], "ts",
        tiebreak_cols=["id"],
    )
    got = spark.read.parquet(str(tmp_path / "table"))
    want = scd2_intervals(df, ["k"], ["attr"], "ts", ["id"])
    assert got.exceptAll(want.select(*got.columns)).count() == 0
    assert want.select(*got.columns).exceptAll(got).count() == 0


def test_stream_scd2_straddle_that_rewrites_history_raises(spark, tmp_path):
    """A straddling slice whose late row carries a DIFFERENT attribute
    genuinely rewrites the compressed history — still an error under
    the refined guard, with the differing interval rows in the text."""
    from salesforce_plugin_spark.streaming.upsert import run_stream_scd2

    rows = [
        ("k", "x", dt.datetime(2024, 1, 1), 0),
        ("k", "y", dt.datetime(2024, 1, 5), 1),
        # late row BEFORE the frontier with a new attr + a genuinely
        # new row after it: out-of-order ingest, not a replay
        ("k", "z", dt.datetime(2024, 1, 3), 2),
        ("k", "w", dt.datetime(2024, 1, 9), 3),
    ]
    df = spark.createDataFrame(rows, SCD2_SCHEMA)
    src = _write_batches(
        tmp_path, spark, df, [df.filter("id < 2"), df.filter("id >= 2")]
    )
    with pytest.raises(Exception, match="straddles.*changes the stored"):
        run_stream_scd2(
            _scd2_stream(spark, src), str(tmp_path / "table"),
            str(tmp_path / "ckpt"), ["k"], ["attr"], "ts",
            tiebreak_cols=["id"],
        )


def test_stream_selfcheck_divergence_raises(spark):
    from salesforce_plugin_spark.conformance.streaming import (
        assert_stream_matches_batch,
    )

    a = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "k long, v long, cusum long"
    )
    b = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 999)], "k long, v long, cusum long"
    )
    with pytest.raises(ValueError, match="q_test.*diverge"):
        assert_stream_matches_batch(a, b, "q_test", context="ctx-blob")
    # the bounded evidence must carry the rows and the caller context
    try:
        assert_stream_matches_batch(a, b, "q_test", context="ctx-blob")
    except ValueError as e:
        msg = str(e)
        assert "999" in msg and "ctx-blob" in msg


def test_stream_selfcheck_agreement_silent(spark):
    from salesforce_plugin_spark.conformance.streaming import (
        assert_stream_matches_batch,
    )

    a = spark.createDataFrame([(1, 10, 100)], "k long, v long, cusum long")
    assert_stream_matches_batch(a, a, "q_test", context="")


def test_stream_cusum_entry_propagates_fold_error(spark, tmp_path, monkeypatch):
    """VERDICT r10 #6: an exception raised INSIDE the foreachBatch fold
    must surface to the conformance-entry caller (into the driver's
    ``err`` field), not vanish in the entry's finally cleanup. Drive
    the real q_stream_cusum entry with the fold's order guard forced to
    fire and assert the guard's text reaches us."""
    from salesforce_plugin_spark.conformance import streaming as cs
    from salesforce_plugin_spark.streaming import upsert as up

    orig = up._assert_batches_in_order
    calls = {"n": 0}

    def tripwire(batch, carry_last_ts, key_cols, ts_us, batch_id, face):
        calls["n"] += 1
        if calls["n"] >= 2:  # second batch: simulate an order violation
            raise ValueError(
                f"{face}: batch {int(batch_id)} violates the per-key "
                "observation order precondition — forced by test"
            )
        return orig(batch, carry_last_ts, key_cols, ts_us, batch_id, face)

    monkeypatch.setattr(up, "_assert_batches_in_order", tripwire)
    with pytest.raises(Exception, match="observation order"):
        cs.q_stream_cusum(spark, "/root/testdata/sf0.001")


# ---- PNG round 11: 16-bit depth, Adam7 interlace, gray/RGB tRNS ----


def _rng(seed):
    import numpy as np

    return np.random.default_rng(seed)


def test_png16_roundtrip_all_filters():
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    for ch in (1, 2, 3, 4):
        arr = _rng(ch).integers(0, 65536, size=(7, 5, ch), dtype=np.uint16)
        out = decode_png(
            encode_png(arr, row_filters=[y % 5 for y in range(7)])
        )
        assert out.dtype == np.uint16 and out.shape == (7, 5, ch)
        assert np.array_equal(out, arr)


def test_png_adam7_roundtrip_8_and_16():
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    # odd/small/grid-aligned dims hit empty and partial passes
    for h, w in [(1, 1), (3, 5), (8, 8), (9, 13), (2, 2)]:
        a8 = _rng(h * 100 + w).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        ).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(a8, interlace=True)), a8)
        a16 = _rng(h * 107 + w).integers(
            0, 65536, size=(h, w, 1), dtype=np.uint16
        )
        assert np.array_equal(
            decode_png(encode_png(a16, interlace=True)), a16
        )


def test_png_adam7_filtered_scanline_stream():
    """Filters cycle across the seven-pass scanline stream — every
    unfilter path exercised within interlaced sub-images."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        _ADAM7,
        decode_png,
        encode_png,
    )

    h, w = 11, 9
    arr = _rng(3).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rows = sum(
        (h - y0 + dy - 1) // dy
        for x0, y0, dx, dy in _ADAM7
        if (w - x0 + dx - 1) // dx > 0 and (h - y0 + dy - 1) // dy > 0
    )
    enc = encode_png(
        arr, interlace=True, row_filters=[i % 5 for i in range(rows)]
    )
    assert np.array_equal(decode_png(enc), arr)


def test_png_trns_gray_and_rgb_expand_alpha():
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    g = np.array([[10, 20], [20, 30]], dtype=np.uint8)
    out = decode_png(encode_png(g, transparent=20))
    assert out.shape == (2, 2, 2)
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(
        out[:, :, 1], np.array([[255, 0], [0, 255]], dtype=np.uint8)
    )

    rgb = np.zeros((2, 2, 3), dtype=np.uint16)
    rgb[0, 1] = (256, 512, 768)
    out16 = decode_png(encode_png(rgb, transparent=(256, 512, 768)))
    assert out16.shape == (2, 2, 4) and out16.dtype == np.uint16
    want_a = np.full((2, 2), 65535, dtype=np.uint16)
    want_a[0, 1] = 0
    assert np.array_equal(out16[:, :, 3], want_a)


def test_png_trns_on_alpha_color_type_raises():
    import struct
    import zlib

    import numpy as np
    import pytest

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="tRNS"):
        encode_png(np.zeros((2, 2, 4), dtype=np.uint8), transparent=(1, 2, 3))

    # hand-build an RGBA PNG carrying an (invalid) tRNS chunk: the
    # decoder must reject it, not silently drop the transparency
    good = encode_png(np.zeros((2, 2, 4), dtype=np.uint8))

    def ck(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr_end = 8 + 12 + 13
    bad = good[:ihdr_end] + ck(b"tRNS", b"\0\1") + good[ihdr_end:]
    with pytest.raises(ValueError, match="tRNS chunk with color type"):
        decode_png(bad)


def test_png_roundtrip_randomized_matrix():
    """Randomized sweep over (depth, channels, interlace, dims) — the
    widened subset's round-trip identity, 40 cases."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    rng = _rng(1234)
    for case in range(40):
        h = int(rng.integers(1, 14))
        w = int(rng.integers(1, 14))
        ch = int(rng.integers(1, 5))
        depth16 = bool(rng.integers(0, 2))
        inter = bool(rng.integers(0, 2))
        if depth16:
            arr = rng.integers(0, 65536, size=(h, w, ch), dtype=np.uint16)
        else:
            arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        filters = None
        if not inter:
            filters = [int(rng.integers(0, 5)) for _ in range(h)]
        got = decode_png(encode_png(arr, row_filters=filters, interlace=inter))
        assert got.dtype == arr.dtype and np.array_equal(got, arr), (
            case, h, w, ch, depth16, inter,
        )


def test_resize_auto_encoder_by_channel_count(spark):
    """ADVICE r10 low: the default re-encode must not explode on
    non-3-channel decodes — gray PNG stays PNG, RGB uint8 stays BMP."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_image,
        encode_png,
        resize_image_nearest,
    )

    gray = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(gray)))], "doc_id long, payload binary"
    )
    out = resize_image_nearest(df, "doc_id", "payload", 3, 2).collect()
    px = decode_image(bytes(out[0].resized))
    assert px.shape == (2, 3, 1)
    ri = [(r * 4) // 2 for r in range(2)]
    ci = [(c * 6) // 3 for c in range(3)]
    assert np.array_equal(px, gray[np.ix_(ri, ci)])


def test_png_subbyte_gray_roundtrip_matrix():
    """Sub-byte tier (round 11): depths 1/2/4 grayscale round-trip
    exactly across odd widths (pad bits in the packed scanlines), all
    five filters over the PACKED bytes, and both interlace modes."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        _ADAM7,
        decode_png,
        encode_png,
    )

    rng = _rng(77)
    for depth in (1, 2, 4):
        for (h, w) in [(1, 1), (3, 5), (8, 8), (9, 17), (7, 31)]:
            img = rng.integers(0, 1 << depth, size=(h, w)).astype(np.uint8)
            for inter in (False, True):
                rows = (
                    sum(
                        (h - y0 + dy - 1) // dy
                        for x0, y0, dx, dy in _ADAM7
                        if (w - x0 + dx - 1) // dx > 0
                        and (h - y0 + dy - 1) // dy > 0
                    )
                    if inter
                    else h
                )
                got = decode_png(
                    encode_png(
                        img,
                        depth=depth,
                        interlace=inter,
                        row_filters=[i % 5 for i in range(rows)],
                    )
                )
                assert got.shape == (h, w, 1)
                assert np.array_equal(got[:, :, 0], img), (depth, h, w, inter)


def test_png_subbyte_palette_and_trns():
    """Sub-byte palette PNGs map through PLTE (and tRNS → RGBA); a
    sub-byte gray tRNS expands to alpha with the depth's max."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_png,
        encode_png,
        encode_png_palette,
    )

    rng = _rng(78)
    for depth in (1, 2, 4):
        npal = 1 << depth
        pal = rng.integers(0, 256, size=(npal, 3)).astype(np.uint8)
        idx = rng.integers(0, npal, size=(6, 9)).astype(np.uint8)
        got = decode_png(
            encode_png_palette(
                idx, pal, depth=depth, row_filters=[y % 5 for y in range(6)]
            )
        )
        assert got.shape == (6, 9, 3) and np.array_equal(got, pal[idx])
        alpha = rng.integers(0, 256, size=(npal,)).astype(np.uint8)
        got = decode_png(
            encode_png_palette(idx, pal, depth=depth, transparency=alpha)
        )
        assert got.shape == (6, 9, 4)
        assert np.array_equal(got[:, :, 3], alpha[idx])
    gray = rng.integers(0, 4, size=(5, 7)).astype(np.uint8)
    got = decode_png(encode_png(gray, depth=2, transparent=1))
    assert got.shape == (5, 7, 2)
    assert np.array_equal(got[:, :, 1] == 0, gray == 1)
    assert set(np.unique(got[:, :, 1])) <= {0, 3}  # alpha max = 2^2-1


def test_png_subbyte_encode_rejects():
    """The sub-byte encoder rejects what the format can't hold:
    multi-channel, out-of-range samples, oversized palettes,
    out-of-range transparent samples."""
    import numpy as np
    import pytest

    from salesforce_plugin_spark.functions.multimodal import (
        encode_png,
        encode_png_palette,
    )

    with pytest.raises(ValueError, match="grayscale-only"):
        encode_png(np.zeros((2, 2, 3), dtype=np.uint8), depth=2)
    with pytest.raises(ValueError, match="must be <"):
        encode_png(np.full((2, 2), 4, dtype=np.uint8), depth=2)
    with pytest.raises(ValueError, match="uint8 samples"):
        encode_png(np.zeros((2, 2), dtype=np.uint16), depth=4)
    with pytest.raises(ValueError, match="does not fit"):
        encode_png_palette(
            np.zeros((2, 2), dtype=np.uint8),
            np.zeros((5, 3), dtype=np.uint8),
            depth=2,
        )
    with pytest.raises(ValueError, match="out of range for"):
        encode_png(np.zeros((2, 2), dtype=np.uint8), depth=2, transparent=4)


def test_jpeg_constant_block_exact_roundtrip():
    """Baseline JPEG (round 11): under the flat quant table a
    constant-block grayscale image round-trips EXACTLY — only the DC
    coefficient survives and it is power-of-two-exact through the
    float DCT pair. This is the property the oracle tier leans on."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = _rng(90)
    for _ in range(15):
        bh, bw = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        vals = rng.integers(0, 256, size=(bh, bw)).astype(np.uint8)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        back = decode_jpeg(encode_jpeg(img))
        assert back.shape == (bh * 8, bw * 8, 1)
        assert np.array_equal(back[:, :, 0], img)


def test_jpeg_general_content_bounded_error():
    """General content is lossy as JPEG always is — but under the
    flat quant table the only error is coefficient rounding, bounded
    to ±1 gray / ±2 RGB (color conversion rounds too). Non-multiple-
    of-8 dims exercise the edge-replication padding; random content
    reliably produces 0xFF entropy bytes, exercising byte stuffing."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = _rng(91)
    stuffed = 0
    for _ in range(10):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        p = encode_jpeg(img)
        stuffed += p.count(b"\xFF\x00")
        back = decode_jpeg(p)
        assert back.shape == (h, w, 1)
        assert np.abs(back[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    assert stuffed > 0  # byte-stuffing path actually exercised
    img = rng.integers(0, 256, size=(24, 17, 3)).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(img))
    assert back.shape == (24, 17, 3)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_quant_table_lossy_but_smaller():
    """A coarse quant table compresses harder (smaller payload) and
    the decoder dequantizes with the stream's own DQT."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = _rng(92)
    img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    p1 = encode_jpeg(img)
    p2 = encode_jpeg(img, qtable=np.full((8, 8), 16, dtype=int))
    assert len(p2) < len(p1)
    back = decode_jpeg(p2)[:, :, 0].astype(int)
    # coarse quant is lossy but must stay in the ballpark
    assert np.abs(back - img.astype(int)).max() <= 8 * 16


def test_jpeg_rejects_outside_subset():
    """decode_jpeg raises loudly on everything outside baseline
    sequential 4:4:4: progressive SOF2, truncation, restart
    intervals, subsampling, and non-JPEG payloads."""
    import struct

    import numpy as np
    import pytest

    from salesforce_plugin_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[:20])
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(good.replace(b"\xFF\xC0", b"\xFF\xC2", 1))
    # DRI with nonzero interval, spliced before SOS
    at = good.index(b"\xFF\xDA")
    dri = struct.pack(">BBHH", 0xFF, 0xDD, 4, 8)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(good[:at] + dri + good[at:])
    # 2x2 subsampling byte in SOF0 (sampling 0x22 instead of 0x11)
    sof_at = good.index(b"\xFF\xC0")
    comp_sampling = sof_at + 4 + 6  # marker+len+prec+h+w+nc, comp0 id
    bad = bytearray(good)
    bad[comp_sampling + 1] = 0x22
    with pytest.raises(ValueError, match="subsampled"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="missing EOI"):
        decode_jpeg(good[:-2])


def test_jpeg_default_seam_dispatch(spark):
    """decode_image sniffs FFD8 and routes to decode_jpeg — the F4
    operators run real JPEG decode end-to-end with no injection."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        encode_jpeg,
        image_sample_stats,
    )

    vals = np.array([[7, 250], [128, 3]], dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img)))], "doc_id long, payload binary"
    )
    row = image_sample_stats(df, "doc_id", "payload").collect()[0]
    b = vals.astype(int)
    assert row.n == 256
    assert row.s == 64 * b.sum()
    assert row.sq == 64 * (b * b).sum()
    assert (row.vmin, row.vmax) == (3, 250)


def test_louvain_singleton_specialization_matches_generic(spark):
    """Optimization r11: louvain_step's communities=None fast path skips
    the identity community joins (k_{i,C}=1 per oriented edge, Σ_C =
    degree, own=self). Feeding the SAME singleton assignment explicitly
    exercises the generic path — both must agree row-for-row, including
    the smallest-label tiebreaks on a graph with ties and a bridge."""
    from salesforce_plugin_spark.functions.graph import louvain_step

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4), (6, 7)],
        "src long, dst long",
    )
    nodes = [1, 2, 3, 4, 5, 6, 7]
    singletons = spark.createDataFrame(
        [(n, n) for n in nodes], "id long, label long"
    )
    fast = {
        r.node: (r.old_label, r.new_label, r.moved)
        for r in louvain_step(edges).collect()
    }
    generic = {
        r.node: (r.old_label, r.new_label, r.moved)
        for r in louvain_step(edges, singletons).collect()
    }
    assert fast == generic

    # negative ids exercise the packed argmin key's 2^63 offset (the
    # label must round-trip the decimal pack/unpack exactly)
    neg_edges = edges.select(
        (F.col("src") - 5).alias("src"), (F.col("dst") - 5).alias("dst")
    )
    neg_singletons = spark.createDataFrame(
        [(n - 5, n - 5) for n in nodes], "id long, label long"
    )
    neg_fast = {
        r.node: (r.old_label, r.new_label, r.moved)
        for r in louvain_step(neg_edges).collect()
    }
    neg_generic = {
        r.node: (r.old_label, r.new_label, r.moved)
        for r in louvain_step(neg_edges, neg_singletons).collect()
    }
    assert neg_fast == neg_generic
    assert neg_fast == {
        k - 5: (a - 5, b - 5, m) for k, (a, b, m) in fast.items()
    }
