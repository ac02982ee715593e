"""Weighted corpus mixing (deterministic, engine-free selection),
small-file compaction, and streaming content dedup."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyspark.sql.functions as F

from salesforce_plugin_spark.operators.pipeline import compact_parquet, mix_corpora


def test_mix_corpora_rates_and_determinism(spark):
    a = spark.createDataFrame([(i, "a") for i in range(2000)], ["doc_id", "src"])
    b = spark.createDataFrame([(i, "b") for i in range(2000)], ["doc_id", "src"])
    mixed = mix_corpora([(a, 1.0), (b, 0.25)])
    counts = {r.mix_source: r["count"] for r in mixed.groupBy("mix_source").count().collect()}
    assert counts[0] == 2000
    assert 400 < counts[1] < 600          # ~25% of 2000, hash-exact not random
    # deterministic: same inputs → identical selection
    again = mix_corpora([(a, 1.0), (b, 0.25)])
    assert sorted(map(tuple, mixed.collect())) == sorted(map(tuple, again.collect()))


def test_mix_corpora_salts_by_source(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
    mixed = mix_corpora([(df, 0.5), (df, 0.5)])
    kept = mixed.groupBy("mix_source").count().collect()
    ids0 = {r.doc_id for r in mixed.filter(F.col("mix_source") == 0).collect()}
    ids1 = {r.doc_id for r in mixed.filter(F.col("mix_source") == 1).collect()}
    assert ids0 != ids1                   # per-source salt → different subsets
    assert all(300 < r["count"] < 700 for r in kept)


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "many")
    spark.range(0, 10000).repartition(24).write.parquet(src)
    n_before = len(glob.glob(os.path.join(src, "part-*")))
    assert n_before == 24
    n_parts = compact_parquet(spark, src, target_file_mb=256)
    n_after = len(glob.glob(os.path.join(src, "part-*")))
    assert n_parts == 1 and n_after == 1
    assert spark.read.parquet(src).count() == 10000


def test_streaming_content_dedup(spark, tmp_path):
    from salesforce_plugin_spark.streaming.windows import (
        dedup_stream_by_content,
        run_to_memory_sink,
        stream_events,
    )

    base = dt.datetime(2024, 6, 1)
    texts = ["same  text", "same text", "other text", "Same Text", "unique"]
    rows = [
        (i, int((base + dt.timedelta(minutes=i)).timestamp() * 1e9), 0,
         "e", 0.0, texts[i])
        for i in range(len(texts))
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, "
              "value double, props string"
    ).write.parquet(src)
    got = run_to_memory_sink(
        dedup_stream_by_content(
            stream_events(spark, src), text_col="props"
        ).select("event_id"),
        "t_content_dedup",
    )
    ids = sorted(r.event_id for r in got.collect())
    # "same  text" / "same text" / "Same Text" share a normalized fingerprint
    # → exactly one of {0,1,3} survives (streaming keeps the first SEEN in
    # arrival order, not the smallest id); 2 and 4 are unique content
    assert len(ids) == 3
    assert len(set(ids) & {0, 1, 3}) == 1
    assert {2, 4} <= set(ids)
