"""Round-9 verdict item 1: the four stream faces that were still
exactly-once-only are now at-least-once-safe — run_stream_cm and
run_stream_histogram moved onto the ``__b=`` per-batch-partition
protocol, run_stream_cusum and run_stream_interarrival onto the
fenced-carry protocol (versioned ``__c=`` carry + durable pointer).
Each test folds the same batch ids TWICE (a full fresh-checkpoint
replay of the stream — the worst-case foreachBatch retry storm) and
asserts the state and outputs are value-identical to the single run."""

import datetime as dt
import os
import time as _time

import pyspark.sql.functions as F


def _write_sliced_source(df, src, slices):
    """Write each slice as one parquet file with ascending mtimes so
    maxFilesPerTrigger=1 + availableNow yields deterministic batch
    ids in observation order."""
    os.makedirs(src, exist_ok=True)
    now = _time.time()
    for i, sl in enumerate(slices):
        part = src + f"_stage{i}"
        sl.coalesce(1).write.mode("overwrite").parquet(part)
        pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(part, pf), dst)
        os.utime(dst, (now + i * 10, now + i * 10))


def _batch_dirs(state):
    return sorted(
        int(n.split("=")[1])
        for n in os.listdir(state)
        if n.startswith("__b=")
    )


def _events(spark):
    rows = [
        ("k%d" % (i % 3), dt.datetime(2024, 1, 1, 0, 0, i), i, (i * 7) % 13)
        for i in range(24)
    ]
    return spark.createDataFrame(
        rows, "k string, ts timestamp, id long, v long"
    )


def _stream(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_cm_replay_idempotent(spark, tmp_path):
    """A full replay of every batch id (fresh checkpoint, same state
    dir) leaves the summed count-min grid identical: each retry
    overwrites its own __b= slice instead of appending a duplicate."""
    from salesforce_plugin_spark.streaming.upsert import (
        read_cm_state,
        run_stream_cm,
    )

    df = _events(spark)
    src = str(tmp_path / "src")
    _write_sliced_source(
        df, src, [df.filter("id < 8"), df.filter("id >= 8 and id < 16"),
                  df.filter("id >= 16")]
    )
    state = str(tmp_path / "state")
    schema = "k string, ts timestamp, id long, v long"
    run_stream_cm(
        _stream(spark, src, schema), state, str(tmp_path / "ck1"), "k"
    )
    once = {
        (r.row, r.bucket): r.n
        for r in read_cm_state(spark, state).collect()
    }
    layout_once = _batch_dirs(state)
    # replay: fresh checkpoint re-delivers batch ids 0..2 to the SAME
    # state dir — the foreachBatch retry storm
    run_stream_cm(
        _stream(spark, src, schema), state, str(tmp_path / "ck2"), "k"
    )
    twice = {
        (r.row, r.bucket): r.n
        for r in read_cm_state(spark, state).collect()
    }
    assert twice == once
    assert _batch_dirs(state) == layout_once == [0, 1, 2]


def test_stream_histogram_replay_idempotent(spark, tmp_path):
    from salesforce_plugin_spark.streaming.upsert import (
        read_histogram_state,
        run_stream_histogram,
    )

    df = _events(spark)
    src = str(tmp_path / "src")
    _write_sliced_source(df, src, [df.filter("id < 12"), df.filter("id >= 12")])
    state = str(tmp_path / "state")
    schema = "k string, ts timestamp, id long, v long"
    run_stream_histogram(
        _stream(spark, src, schema), state, str(tmp_path / "ck1"),
        "v", lo=0.0, hi=13.0, n_bins=16,
    )
    once = {
        r.bin: r.cnt for r in read_histogram_state(spark, state).collect()
    }
    run_stream_histogram(
        _stream(spark, src, schema), state, str(tmp_path / "ck2"),
        "v", lo=0.0, hi=13.0, n_bins=16,
    )
    twice = {
        r.bin: r.cnt for r in read_histogram_state(spark, state).collect()
    }
    assert twice == once
    assert sum(twice.values()) == 24  # every event counted exactly once
    assert _batch_dirs(state) == [0, 1]


def test_stream_cusum_replay_fenced(spark, tmp_path):
    """Replaying all batch ids against the committed carry is a no-op:
    the pointer fences each id, alarm partitions stay single-copy, and
    both alarms and carry are value-identical to the single run (which
    itself equals the one-shot batch oracle — the existing gate)."""
    from salesforce_plugin_spark.streaming.upsert import (
        carry_folded_through,
        run_stream_cusum,
    )

    df = _events(spark)
    src = str(tmp_path / "src")
    _write_sliced_source(
        df, src, [df.filter("id < 8"), df.filter("id >= 8 and id < 16"),
                  df.filter("id >= 16")]
    )
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    schema = "k string, ts timestamp, id long, v long"
    kwargs = dict(
        key_cols=["k"], ts_col="ts", value_col="v",
        target=5, slack=1, threshold=6, tiebreak_cols=["id"],
    )
    run_stream_cusum(
        _stream(spark, src, schema), out, state, str(tmp_path / "ck1"),
        **kwargs,
    )
    alarms_once = sorted(
        (r.k, r.ts, r.v, r.id, r.cusum, r.alarm)
        for r in spark.read.parquet(out).collect()
    )
    carry_once = sorted(
        map(tuple, spark.read.parquet(state + "/__c=2").collect())
    )
    assert carry_folded_through(spark, state) == 2
    run_stream_cusum(
        _stream(spark, src, schema), out, state, str(tmp_path / "ck2"),
        **kwargs,
    )
    alarms_twice = sorted(
        (r.k, r.ts, r.v, r.id, r.cusum, r.alarm)
        for r in spark.read.parquet(out).collect()
    )
    assert alarms_twice == alarms_once and len(alarms_once) == 24
    assert sorted(
        map(tuple, spark.read.parquet(state + "/__c=2").collect())
    ) == carry_once
    assert carry_folded_through(spark, state) == 2
    assert _batch_dirs(out) == [0, 1, 2]
    # exactly one carry version survives (GC of stale __c= dirs)
    assert [n for n in os.listdir(state) if n.startswith("__c=")] == [
        "__c=2"
    ]


def test_stream_interarrival_replay_fenced(spark, tmp_path):
    from salesforce_plugin_spark.streaming.upsert import (
        carry_folded_through,
        read_interarrival_state,
        run_stream_interarrival,
    )

    df = _events(spark)
    src = str(tmp_path / "src")
    _write_sliced_source(df, src, [df.filter("id < 12"), df.filter("id >= 12")])
    state = str(tmp_path / "state")
    schema = "k string, ts timestamp, id long, v long"
    run_stream_interarrival(
        _stream(spark, src, schema), state, str(tmp_path / "ck1"),
        ["k"], "ts",
    )
    once = sorted(
        map(tuple, read_interarrival_state(spark, state).collect())
    )
    assert carry_folded_through(spark, state) == 1
    run_stream_interarrival(
        _stream(spark, src, schema), state, str(tmp_path / "ck2"),
        ["k"], "ts",
    )
    twice = sorted(
        map(tuple, read_interarrival_state(spark, state).collect())
    )
    assert twice == once and len(once) == 3
    # 24 events over 3 keys in per-second steps: 7 gaps per key after
    # the batch-boundary gap closes — double-fold would inflate n_gaps
    n_gaps = {r[0]: r[1] for r in once}
    assert n_gaps == {"k0": 7, "k1": 7, "k2": 7}


def test_fenced_carry_protocol_crash_points(spark, tmp_path):
    """The commit_carry write-ahead order recovers from a crash at
    every step: an uncommitted __c= version (crash between carry
    write and pointer flip) is invisible to readers and overwritten
    by the retry; a committed pointer fences; stale versions GC."""
    from salesforce_plugin_spark.streaming.upsert import (
        carry_folded_through,
        commit_carry,
        read_current_carry,
    )

    state = str(tmp_path / "carry")
    assert carry_folded_through(spark, state) == -1
    assert read_current_carry(spark, state) is None

    c0 = spark.createDataFrame([("k", 10)], "k string, cum long")
    commit_carry(c0, state, 0)
    assert carry_folded_through(spark, state) == 0

    # crash point: batch 1's carry written, pointer NOT flipped
    spark.createDataFrame(
        [("k", 999)], "k string, cum long"
    ).write.parquet(state + "/__c=1")
    got = read_current_carry(spark, state).collect()
    assert [(r.k, r.cum) for r in got] == [("k", 10)]  # still batch 0's

    # the retry of batch 1 recomputes (here: the correct value) and
    # commits — overwriting the crashed attempt's version
    commit_carry(
        spark.createDataFrame([("k", 25)], "k string, cum long"), state, 1
    )
    assert carry_folded_through(spark, state) == 1
    assert [(r.k, r.cum) for r in read_current_carry(spark, state).collect()] == [
        ("k", 25)
    ]
    # stale __c=0 garbage-collected; only the committed version remains
    assert [n for n in os.listdir(state) if n.startswith("__c=")] == [
        "__c=1"
    ]


def test_fenced_carry_legacy_flat_state_raises(spark, tmp_path):
    """A carry dir holding pre-fence flat parquet files must raise
    with the migration step, not silently reinitialize (the
    test_stream_state_read_errors_propagate invariant, preserved
    across the layout change)."""
    import pytest

    from salesforce_plugin_spark.streaming.upsert import read_current_carry

    state = tmp_path / "legacy"
    state.mkdir()
    (state / "part-000.parquet").write_bytes(b"not parquet")
    with pytest.raises(ValueError, match="pre-fence overwrite layout"):
        read_current_carry(spark, str(state))


def test_cm_histogram_compaction(spark, tmp_path):
    """The new compact wrappers fold the grid/histogram partitions
    below the watermark into __b=-1 with identical read-outs."""
    from salesforce_plugin_spark.functions.sketch import (
        cm_sketch,
        histogram_counts,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        compact_cm_state,
        compact_histogram_state,
        read_cm_state,
        read_histogram_state,
        write_batch_partials,
    )

    df = _events(spark)
    cm_state = str(tmp_path / "cm")
    for b in range(3):
        write_batch_partials(
            cm_sketch(df.filter(f"id % 3 = {b}"), "k"), cm_state, b
        )
    before = {
        (r.row, r.bucket): r.n
        for r in read_cm_state(spark, cm_state).collect()
    }
    assert compact_cm_state(spark, cm_state, 3) == 3
    after = {
        (r.row, r.bucket): r.n
        for r in read_cm_state(spark, cm_state).collect()
    }
    assert after == before
    assert _batch_dirs(cm_state) == [-1]

    h_state = str(tmp_path / "hist")
    for b in range(3):
        write_batch_partials(
            histogram_counts(
                df.filter(f"id % 3 = {b}"), "v", 0.0, 13.0, 16
            ),
            h_state,
            b,
        )
    hb = {r.bin: r.cnt for r in read_histogram_state(spark, h_state).collect()}
    assert compact_histogram_state(spark, h_state, 3) == 3
    ha = {r.bin: r.cnt for r in read_histogram_state(spark, h_state).collect()}
    assert ha == hb and sum(ha.values()) == 24
    assert _batch_dirs(h_state) == [-1]


# --- ADVICE round-8 low findings --------------------------------------


def test_distill_teacher_oracle_parity_on_ragged_whitespace(spark):
    """The q_distill_quality oracle must replay the Python teacher's
    text.lower().split() EXACTLY on documents with leading/trailing
    tabs and newlines (DuckDB trim() strips spaces only — the round-8
    parity gap minted a phantom '' token on such docs, diverging
    teacher_scaled and the fitted weights)."""
    import duckdb

    from salesforce_plugin_spark.conformance import ORACLES
    from salesforce_plugin_spark.functions.ir import distill_quality

    docs = [
        (0, "alpha beta beta\n"),          # trailing newline
        (1, "\tgamma delta gamma"),        # leading tab
        (2, " epsilon zeta "),             # ordinary spaces
        (3, "\n"),                         # whitespace-only -> 0 tokens
        (4, "eta theta iota the of\r\n"),  # CRLF tail + stopwords
        (5, "kappa kappa kappa"),
        (6, ""),                           # empty
        (7, "lambda mu the\tnu\nxi"),      # internal tabs/newlines
        (8, "omicron pi of of rho"),
        (9, "sigma tau the upsilon"),
        (10, "phi chi psi omega the of"),
        (11, "a b c d e f"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: r
        for r in distill_quality(df, "doc_id", "text", sample_mod=4).collect()
    }

    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(docs, columns=["doc_id", "text"]),
    )
    want = {
        r[0]: r for r in con.sql(ORACLES["q_distill_quality"]).fetchall()
    }
    assert set(got) == set(want) == set(range(12))
    for i in range(12):
        g, w = got[i], want[i]
        assert g.teacher_scaled == w[3], (i, g.teacher_scaled, w[3])
        assert g.n_tokens == w[1] and g.n_stop == w[2], (i, g, w)
        assert abs(g.student_score - w[4]) < 1e-9, (i, g, w)


def test_fit_quality_student_empty_sample_raises(spark):
    """An empty teacher sample raises a meaningful ValueError, not an
    opaque TypeError from int(None) on the NULL moment sums."""
    import pytest

    from salesforce_plugin_spark.functions.ir import fit_quality_student

    odd = spark.createDataFrame(
        [(i, "some text here") for i in (1, 3, 5, 7)], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="empty teacher sample"):
        fit_quality_student(odd, "doc_id", "text", sample_mod=2)

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty teacher sample"):
        fit_quality_student(empty, "doc_id", "text", sample_mod=2)


# --- every-N-batches auto-compaction (VERDICT r8 item 6) ----------------


def test_auto_compact_bounds_partition_count(spark, tmp_path):
    """Folding many batches with auto-compact keeps the partition count
    <= every+1 at all times, totals stay exact through multiple
    compaction cycles, and pre-watermark replays stay fenced."""
    from salesforce_plugin_spark.streaming.upsert import (
        _maybe_auto_compact,
        compacted_below,
        read_summed_counts,
        write_batch_partials,
    )

    state = str(tmp_path / "counts")
    every = 8
    reduce_fn = lambda d: d.groupBy("cell").agg(  # noqa: E731
        F.sum("n").cast("long").alias("n")
    )
    for b in range(40):
        write_batch_partials(
            spark.createDataFrame([(str(b % 3), 1)], "cell string, n long"),
            state,
            b,
        )
        _maybe_auto_compact(spark, state, b, every, reduce_fn)
        assert len(_batch_dirs(state)) <= every + 1, (b, _batch_dirs(state))
    assert compacted_below(spark, state) == 32
    totals = {
        r.cell: r.n for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert totals == {"0": 14, "1": 13, "2": 13}

    # pre-watermark replay: a retry of batch 5 must be a no-op
    write_batch_partials(
        spark.createDataFrame([("0", 999)], "cell string, n long"), state, 5
    )
    after = {
        r.cell: r.n for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert after == totals


def test_auto_compact_streaming_e2e_with_replay(spark, tmp_path):
    """run_stream_additive_counts with auto_compact_every=2 over six
    micro-batches compacts inside the fold loop; a full fresh-checkpoint
    replay leaves the compacted state and totals unchanged (fenced
    pre-watermark ids, overwrite-idempotent post-watermark ids, re-run
    compactions find nothing to fold)."""
    from salesforce_plugin_spark.streaming.upsert import (
        compacted_below,
        read_summed_counts,
        run_stream_additive_counts,
    )

    df = _events(spark)
    src = str(tmp_path / "src")
    _write_sliced_source(
        df, src, [df.filter(f"id >= {i*4} and id < {i*4+4}") for i in range(6)]
    )
    state = str(tmp_path / "state")
    schema = "k string, ts timestamp, id long, v long"
    run_stream_additive_counts(
        _stream(spark, src, schema), state, str(tmp_path / "ck1"),
        ["k"], auto_compact_every=2,
    )
    once = {
        r.k: r.n for r in read_summed_counts(spark, state, ["k"]).collect()
    }
    assert once == {"k0": 8, "k1": 8, "k2": 8}
    assert compacted_below(spark, state) == 4
    assert _batch_dirs(state) == [-1, 4, 5]

    run_stream_additive_counts(
        _stream(spark, src, schema), state, str(tmp_path / "ck2"),
        ["k"], auto_compact_every=2,
    )
    twice = {
        r.k: r.n for r in read_summed_counts(spark, state, ["k"]).collect()
    }
    assert twice == once
    assert compacted_below(spark, state) == 4
    assert _batch_dirs(state) == [-1, 4, 5]


# --- real BMP/WAV decoders behind the F4 seam (VERDICT r8 item 3) -------


def test_bmp_codec_hand_computed():
    """decode_bmp against hand-laid-out bytes: header fields, BGR
    order, bottom-up rows, and 4-byte row padding all verified at the
    byte level, plus round trips across padded and unpadded widths."""
    import struct

    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    # 2x1 image: top pixel pure red, bottom pixel pure green
    img = np.array([[[255, 0, 0]], [[0, 255, 0]]], dtype=np.uint8)
    raw = encode_bmp(img)
    assert raw[:2] == b"BM"
    assert struct.unpack_from("<I", raw, 10)[0] == 54           # data offset
    assert struct.unpack_from("<ii", raw, 18) == (1, 2)          # w, h
    assert struct.unpack_from("<HH", raw, 26) == (1, 24)         # planes, bpp
    # bottom-up on disk: first stored row = BOTTOM row (green), BGR,
    # padded from 3 to 4 bytes
    assert raw[54:58] == bytes([0, 255, 0, 0])
    assert raw[58:62] == bytes([0, 0, 255, 0])
    assert (decode_bmp(raw) == img).all()
    # the default decode_image seam sniffs the magic — no injection
    assert (decode_image(raw) == img).all()

    for h, w in [(1, 1), (3, 2), (4, 4), (5, 3)]:
        x = (np.arange(h * w * 3, dtype=np.int64) * 31 % 251).astype(np.uint8)
        x = x.reshape(h, w, 3)
        assert (decode_bmp(encode_bmp(x)) == x).all(), (h, w)


def test_bmp_decoder_rejects_out_of_subset():
    import struct

    import numpy as np
    import pytest

    from salesforce_plugin_spark.functions.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    ok = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + ok[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(ok[:-5])
    # 8-bit BMP -> unsupported bpp
    bad_bpp = bytearray(ok)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="only 24-bit"):
        decode_bmp(bytes(bad_bpp))
    # compressed (BI_RLE8) -> unsupported
    bad_comp = bytearray(ok)
    struct.pack_into("<I", bad_comp, 30, 1)
    with pytest.raises(ValueError, match="only 24-bit"):
        decode_bmp(bytes(bad_comp))
    # non-BMP magic through the seam without an injected decoder
    with pytest.raises(NotImplementedError, match="inject a decoder"):
        decode_image(b"\x89PNG" + b"\x00" * 64)


def test_wav_codec_hand_computed():
    """decode_wav against hand-laid-out bytes: RIFF framing, fmt
    fields, little-endian int16 interleave, and tolerance of an extra
    chunk before data (real WAV writers emit LIST/INFO chunks)."""
    import struct

    import numpy as np
    import pytest

    from salesforce_plugin_spark.functions.multimodal import (
        decode_audio,
        decode_wav,
        encode_wav,
    )

    stereo = np.array([[1, -1], [300, -300], [32767, -32768]], dtype=np.int16)
    raw = encode_wav(44100, stereo)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    assert raw[12:16] == b"fmt " and struct.unpack_from("<I", raw, 16)[0] == 16
    fmt_code, n_ch, rate = struct.unpack_from("<HHI", raw, 20)
    assert (fmt_code, n_ch, rate) == (1, 2, 44100)
    assert raw[36:40] == b"data"
    # first frame little-endian: 0x0001, 0xFFFF
    assert raw[44:48] == bytes([1, 0, 255, 255])
    r, got = decode_wav(raw)
    assert r == 44100 and (got == stereo).all()
    r2, got2 = decode_audio(raw)  # default seam, magic-sniffed
    assert r2 == 44100 and (got2 == stereo).all()

    # an extra chunk between fmt and data must not break the walk
    extra = raw[:36] + b"LIST" + struct.pack("<I", 4) + b"INFO" + raw[36:]
    r3, got3 = decode_wav(extra)
    assert r3 == 44100 and (got3 == stereo).all()

    # non-PCM (IEEE float = 3) rejected
    bad = bytearray(raw)
    struct.pack_into("<H", bad, 20, 3)
    with pytest.raises(ValueError, match="only 16-bit PCM"):
        decode_wav(bytes(bad))
    with pytest.raises(NotImplementedError, match="inject a decoder"):
        decode_audio(b"ID3\x03" + b"\x00" * 64)


def test_real_decode_operators_end_to_end(spark):
    """image_pixel_histogram / wav_channel_stats / image_ahash_pairs
    through the DEFAULT seam (no injected decoder): pixel stats equal
    the pre-encode source arrays, proving decode∘encode is identity
    through the whole Arrow path."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        encode_bmp,
        encode_wav,
        image_ahash_pairs,
        image_pixel_histogram,
        wav_channel_stats,
    )

    rng_bytes = [(i * 37 + j * 11) % 256 for i in range(3) for j in range(48)]
    imgs, wavs, pixels = [], [], {}
    for i in range(3):
        arr = np.array(rng_bytes[i * 48 : (i + 1) * 48], dtype=np.uint8)
        pixels[i] = arr
        imgs.append((i, bytearray(encode_bmp(arr.reshape(4, 4, 3)))))
        wavs.append(
            (i, bytearray(encode_wav(8000, arr.astype(np.int16).reshape(-1, 2))))
        )
    img_df = spark.createDataFrame(imgs, "doc_id long, payload binary")
    hist = image_pixel_histogram(img_df, "doc_id", "payload", n_bins=16)
    got = {(r.doc_id, r.bin): r.n for r in hist.collect()}
    for i in range(3):
        want = np.bincount(pixels[i] // 16, minlength=16)
        for b in range(16):
            assert got[(i, b)] == want[b], (i, b)

    stats = {
        (r.doc_id, r.channel): r for r in wav_channel_stats(
            spark.createDataFrame(wavs, "doc_id long, payload binary"),
            "doc_id",
            "payload",
        ).collect()
    }
    for i in range(3):
        w = pixels[i].astype(np.int64)
        for c in (0, 1):
            sub = w[c::2]
            r = stats[(i, c)]
            assert (r.sample_rate, r.n, r.s, r.sq) == (
                8000, len(sub), int(sub.sum()), int((sub * sub).sum())
            ), (i, c)

    # identical pixels in different byte framings (extra padding via
    # different width) must still ahash-pair: encode doc 0's pixels
    # as 4x4 and as 8x2 — same flattened bytes, different BMP layout
    a = encode_bmp(pixels[0].reshape(4, 4, 3))
    b = encode_bmp(pixels[0].reshape(2, 8, 3))
    assert a != b  # genuinely different payload bytes
    pair_df = spark.createDataFrame(
        [(0, bytearray(a)), (1, bytearray(b))], "doc_id long, payload binary"
    )
    prs = image_ahash_pairs(pair_df, "doc_id", "payload", n_segs=8).collect()
    assert len(prs) == 1 and prs[0].hamming == 0


def test_codec_roundtrip_properties():
    """Property-based round trips: decode∘encode is the identity for
    every BMP shape (incl. widths needing row padding) and every WAV
    channel count / sample pattern hypothesis throws at them."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from salesforce_plugin_spark.functions.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 9),
        st.integers(1, 9),
        st.integers(0, 2**32 - 1),
    )
    def bmp_prop(h, w, seed):
        rng = np.random.default_rng(seed)
        x = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(x)) == x).all()

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(0, 64),
        st.integers(1, 5),
        st.integers(1, 192000),
        st.integers(0, 2**32 - 1),
    )
    def wav_prop(n, ch, rate, seed):
        rng = np.random.default_rng(seed)
        x = rng.integers(-(2**15), 2**15, size=(n, ch)).astype(np.int16)
        r, got = decode_wav(encode_wav(rate, x))
        assert r == rate and got.shape == (n, ch) and (got == x).all()

    bmp_prop()
    wav_prop()


def test_resize_image_nearest_exact(spark):
    """NN resize through real decode equals the hand-computed integer
    index map, down- and up-scaling, and the output is itself a valid
    BMP (decodes back to the sampled pixels)."""
    import numpy as np

    from salesforce_plugin_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
        image_pixels_long,
        resize_image_nearest,
    )

    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(src)))], "doc_id long, payload binary"
    )
    for out_w, out_h in [(2, 3), (8, 2), (1, 1), (4, 6)]:
        ri = (np.arange(out_h) * 6) // out_h
        ci = (np.arange(out_w) * 4) // out_w
        want = src[np.ix_(ri, ci)]
        row = resize_image_nearest(
            df, "doc_id", "payload", out_w, out_h
        ).collect()[0]
        assert (row.width, row.height) == (out_w, out_h)
        assert (decode_bmp(bytes(row.resized)) == want).all(), (out_w, out_h)

    # long-form pixel explode matches the array view
    px = {
        (r.r, r.c, r.ch): r.v
        for r in image_pixels_long(df, "doc_id", "payload").collect()
    }
    assert len(px) == 6 * 4 * 3
    for r in range(6):
        for c in range(4):
            for ch in range(3):
                assert px[(r, c, ch)] == int(src[r, c, ch])


def test_auto_compact_1k_batches(spark, tmp_path):
    """The verdict's item-6 acceptance shape verbatim: fold 1,000
    batches with auto-compact on (N=64) — the partition count stays
    ≤ N+1 after EVERY fold, totals stay exact through all ~15
    compaction cycles, and a pre-watermark replay is fenced.
    (Direct fold-loop like the r8 1k-batch compaction test — a real
    foreachBatch would spend the wall clock on trigger plumbing, and
    the protocol under test is identical.)"""
    from salesforce_plugin_spark.streaming.upsert import (
        _maybe_auto_compact,
        compacted_below,
        read_summed_counts,
        write_batch_partials,
    )

    state = str(tmp_path / "counts")
    every = 64
    reduce_fn = lambda d: d.groupBy("cell").agg(  # noqa: E731
        F.sum("n").cast("long").alias("n")
    )
    one = {}
    for cell in "abcd":
        one[cell] = spark.createDataFrame(
            [(cell, 1)], "cell string, n long"
        ).localCheckpoint(eager=True)
    worst = 0
    for b in range(1000):
        write_batch_partials(one["abcd"[b % 4]], state, b)
        _maybe_auto_compact(spark, state, b, every, reduce_fn)
        worst = max(worst, len(_batch_dirs(state)))
        assert len(_batch_dirs(state)) <= every + 1, (b, worst)
    assert compacted_below(spark, state) == 960  # 15 cycles fired
    totals = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert totals == {"a": 250, "b": 250, "c": 250, "d": 250}
    # pre-watermark replay of a long-compacted id: fenced no-op
    write_batch_partials(
        spark.createDataFrame([("a", 10**6)], "cell string, n long"),
        state,
        5,
    )
    after = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert after == totals
    assert worst == every + 1  # the bound is tight, not slack


def test_decoder_guards_from_review():
    """Round-9 review findings: a WAV chunk that declares more bytes
    than the payload holds raises (no silently partial statistics), a
    short fmt chunk raises ValueError (not struct.error), and
    histogram n_bins values that don't tile the byte range raise
    instead of silently dropping or zeroing bins."""
    import struct

    import numpy as np
    import pytest

    from salesforce_plugin_spark.functions.multimodal import (
        _check_n_bins,
        decode_wav,
        encode_wav,
    )

    raw = bytearray(encode_wav(8000, np.array([[1, 2]] * 4, dtype=np.int16)))
    # inflate the data chunk's declared size beyond the payload
    struct.pack_into("<I", raw, 40, 10**6)
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(bytes(raw))

    # fmt chunk cut to 8 bytes -> ValueError, not struct.error
    short_fmt = (
        b"RIFF" + struct.pack("<I", 24) + b"WAVE"
        + b"fmt " + struct.pack("<I", 8) + b"\x01\x00\x02\x00\x40\x1f\x00\x00"
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="fmt chunk"):
        decode_wav(short_fmt)

    assert _check_n_bins(16) == 16
    assert _check_n_bins(256) == 1
    for bad in (0, 10, 257, 512, -4):
        with pytest.raises(ValueError, match="divisor of 256"):
            _check_n_bins(bad)


# --- two-phase ROLLUP/CUBE lowering (SOQL planner + q_agg_cube) ---------


def _soql(spark, sf_dir, stmt, **kw):
    from salesforce_plugin_spark.conformance._common import load_table
    from salesforce_plugin_spark.plans import soql_to_df

    return soql_to_df(
        spark, stmt, lambda name: load_table(spark, sf_dir, name.lower()), **kw
    )


def test_soql_rollup_two_phase_values_and_plan(spark):
    """Decomposable ROLLUP lowers two-phase: values identical to the
    single-phase oracle semantics (incl. data-NULL keys and subtotal
    rows), and the physical plan expands the BASE aggregate, not the
    fact scan."""
    import pyspark.sql.functions as F

    from salesforce_plugin_spark.conformance._common import load_table  # noqa: F401
    from salesforce_plugin_spark.plans import soql_to_df

    rows = [
        ("a", "x", 1), ("a", "x", 2), ("a", None, 3),
        (None, "y", 4), ("b", "y", 5), ("b", "y", 6),
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 string, v int")

    got = soql_to_df(
        spark,
        "SELECT k1, k2, COUNT() n, SUM(v) s, MAX(v) mx FROM T "
        "GROUP BY ROLLUP(k1, k2)",
        lambda name: df,
    )
    want = (
        df.rollup("k1", "k2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
    )
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # Expand consumes the base-aggregate partials, not raw input rows
    assert "Expand" in plan and "__p0" in plan.split("Expand")[1][:400]


def test_soql_rollup_two_phase_having_and_order(spark):
    """HAVING and ORDER BY aggregate references resolve to the FINAL
    output columns under two-phase (re-deriving count(1) there would
    count base groups)."""
    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(2)]
    df = spark.createDataFrame(rows, "k string, v int")
    from salesforce_plugin_spark.plans import soql_to_df

    got = soql_to_df(
        spark,
        "SELECT k, COUNT() n FROM T GROUP BY ROLLUP(k) "
        "HAVING COUNT() > 2 ORDER BY COUNT() DESC",
        lambda name: df,
    ).collect()
    # groups: a=5, b=2, total=7 -> HAVING>2 keeps total(7) and a(5),
    # ordered desc; a two-phase bug counting BASE rows would emit 2/1/1
    assert [(r.k, r.n) for r in got] == [(None, 7), ("a", 5)]


def test_soql_rollup_falls_back_when_not_decomposable(spark):
    """COUNT_DISTINCT / AVG / double-SUM force the single-phase form —
    values must still be correct (fallback, not failure)."""
    import pyspark.sql.functions as F

    rows = [("a", "x", 1.5), ("a", "y", 2.5), ("b", "x", 3.5)]
    df = spark.createDataFrame(rows, "k string, t string, d double")
    from salesforce_plugin_spark.plans import soql_to_df

    got = soql_to_df(
        spark,
        "SELECT k, COUNT_DISTINCT(t) nt, AVG(d) ad, SUM(d) sd FROM T "
        "GROUP BY ROLLUP(k)",
        lambda name: df,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__p0" not in plan  # single-phase: no partial columns
    want = df.rollup("k").agg(
        F.countDistinct("t").alias("nt"),
        F.avg("d").alias("ad"),
        F.sum("d").alias("sd"),
    )
    key = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )


def test_soql_rollup_two_phase_empty_input_count_zero(spark):
    """The empty-input global row keeps COUNT = 0 (a naive Σ of zero
    partials would be NULL)."""
    df = spark.createDataFrame([], "k string, v int")
    from salesforce_plugin_spark.plans import soql_to_df

    got = soql_to_df(
        spark,
        "SELECT k, COUNT() n, SUM(v) s FROM T GROUP BY ROLLUP(k)",
        lambda name: df,
    ).collect()
    single = df.rollup("k").agg(
        __import__("pyspark.sql.functions", fromlist=["x"]).count(
            __import__("pyspark.sql.functions", fromlist=["x"]).lit(1)
        ).alias("n")
    ).collect()
    # whatever the single-phase operator emits on empty input, the
    # two-phase form must match row-for-row on the count column
    assert len(got) == len(single)
    for g, w in zip(
        sorted((r.k, r.n) for r in got),
        sorted((r.k, r.n) for r in single),
    ):
        assert g == w
