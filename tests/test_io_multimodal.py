"""A5-A13 sinks (csv/ndjson/json-array round-trips, deterministic order) and
F4 multimodal plumbing (payload stats, stubbed decoders)."""

from __future__ import annotations

import glob
import json
import os
import tempfile

import pytest

from salesforce_plugin_spark.functions.multimodal import (
    decode_audio,
    decode_image,
    frame_sample_plan,
    payload_stats,
)
from salesforce_plugin_spark.sources.io import (
    write_csv,
    write_json_array,
    write_ndjson,
)


def sample_df(spark):
    return spark.createDataFrame(
        [(2, "B\nB", {"type": "T"}), (1, "a", {"type": "T"})],
        "ID long, Txt string, attributes map<string,string>",
    )


def read_text(path):
    parts = sorted(glob.glob(os.path.join(path, "part-*")))
    return "".join(open(p).read() for p in parts)


def test_write_csv_scrubs_newlines_and_lowercases(spark, tmp_path):
    out = str(tmp_path / "csv")
    write_csv(sample_df(spark), out)
    text = read_text(out)
    header = text.splitlines()[0]
    assert header == "id,txt"           # attributes dropped, names lowercased
    assert "BB" in text and "B\nB" not in text


def test_write_ndjson_roundtrip(spark, tmp_path):
    out = str(tmp_path / "nd")
    write_ndjson(sample_df(spark), out)
    lines = [json.loads(x) for x in read_text(out).strip().splitlines()]
    assert sorted(x["id"] for x in lines) == [1, 2]
    assert all("attributes" not in x for x in lines)


def test_write_json_array_deterministic_order(spark, tmp_path):
    df = sample_df(spark).repartition(4)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_json_array(df, a, order_by=["id"])
    write_json_array(df, b, order_by=["id"])
    ja, jb = read_text(a), read_text(b)
    assert ja == jb                      # run-to-run deterministic
    arr = json.loads(ja)
    assert [x["id"] for x in arr] == [1, 2]


def test_write_csv_overwrite_idempotent(spark, tmp_path):
    out = str(tmp_path / "ow")
    write_csv(sample_df(spark), out)
    write_csv(sample_df(spark), out)     # E5: replace=True analog
    assert read_text(out).splitlines()[0] == "id,txt"


# --- F4 multimodal ----------------------------------------------------------

def test_payload_stats_real_pipeline(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, "hello"), (2, "")], ["doc_id", "t"]).select(
        "doc_id", F.col("t").cast("binary").alias("payload")
    )
    rows = {r.doc_id: r for r in payload_stats(df, "doc_id", "payload").collect()}
    assert rows[1].byte_len == 5
    assert rows[1].payload_md5 == "5d41402abc4b2a76b9719d911017c592"  # md5('hello')
    assert rows[2].byte_len == 0


def test_decoders_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")
    # injected decoder passes through
    assert decode_image(b"x", decoder=lambda b: ("img", len(b))) == ("img", 1)


def test_byte_histogram_features(spark):
    import pyspark.sql.functions as F

    from salesforce_plugin_spark.functions.multimodal import byte_histogram

    df = spark.createDataFrame(
        [(1, bytes([0, 0, 16, 255])), (2, b"")], ["doc_id", "p"]
    )
    out = byte_histogram(df, "doc_id", "p", n_bins=16)
    assert [f.name for f in out.schema.fields] == ["doc_id", "bin", "n"]
    rows = {(r.doc_id, r.bin): r.n for r in out.collect()}
    # exploded long form: all 16 bins per doc, zeros included
    assert len(rows) == 32
    # bytes 0,0 → bin 0; 16 → bin 1; 255 → bin 15
    assert rows[(1, 0)] == 2 and rows[(1, 1)] == 1 and rows[(1, 15)] == 1
    assert sum(n for (d, _), n in rows.items() if d == 1) == 4
    # empty payload → all-zero bins, still 16 rows
    assert all(rows[(2, b)] == 0 for b in range(16))


def test_histogram_output_survives_pandas_canonicalization(spark):
    """Replica of the driver's failure mode: its checker canonicalizes the
    result as a pandas frame (sort_values over all columns). The round-3
    array<long> output crashed that with 'unhashable type: numpy.ndarray';
    the exploded long form must sort/factorize cleanly."""
    import pandas as pd

    from salesforce_plugin_spark.functions.multimodal import byte_histogram

    df = spark.createDataFrame(
        [(2, b"ab"), (1, bytes([255, 0]))], ["doc_id", "p"]
    )
    pdf = byte_histogram(df, "doc_id", "p", n_bins=16).toPandas()
    out = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    # factorize every column — what a hash-based canonicalizer does
    for c in out.columns:
        pd.factorize(out[c])
    assert len(out) == 32 and out["n"].sum() == 4


def test_resize_plan_with_fake_decoder_and_resizer(spark):
    import pyspark.sql.functions as F

    from salesforce_plugin_spark.functions.multimodal import resize_image_plan

    df = spark.createDataFrame([(1, b"imagebytes")], ["doc_id", "p"])
    out = resize_image_plan(
        df, "doc_id", "p", size=(4, 2),
        decoder=lambda b: b.upper(),                # fake "decoded image"
        resizer=lambda img, sz: img[: sz[0] * sz[1]],  # fake "resize"
    ).collect()[0]
    assert bytes(out.resized) == b"IMAGEBYT"
    assert (out.width, out.height) == (4, 2)
    # without an injected resizer the stub refuses loudly
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|resiz"):
        resize_image_plan(
            df, "doc_id", "p", decoder=lambda b: b
        ).collect()


def test_frame_sample_plan_with_fake_decoder(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, "abcdef")], ["doc_id", "t"]).select(
        "doc_id", F.col("t").cast("binary").alias("payload")
    )
    # fake decoder: one "frame" per byte
    out = frame_sample_plan(
        df, "doc_id", "payload", every_nth=2,
        decoder=lambda b: [bytes([x]) for x in b],
    ).collect()
    assert [bytes(r.frame) for r in out] == [b"a", b"c", b"e"]
    assert [r.frame_no for r in out] == [0, 1, 2]
