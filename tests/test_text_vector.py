"""F3/F5 column libraries: tokenization, language ID, quality metrics,
fingerprints, vector math, top-k search."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from salesforce_plugin_spark.functions.text import (
    bpe_token_count,
    distinct_token_count,
    fingerprint,
    lang_id,
    normalized_text,
    quality_metrics,
    token_count,
)
from salesforce_plugin_spark.functions.vector import (
    as_double,
    cosine,
    cosine_topk,
    dot,
    sign_bucket,
)


def one(spark, text, col):
    return spark.createDataFrame([(text,)], ["t"]).select(col.alias("v")).collect()[0].v


def test_token_counts(spark):
    assert one(spark, "a b  c", token_count(F.col("t"))) == 3
    assert one(spark, "A a b", distinct_token_count(F.col("t"))) == 2
    # BPE-ish: letter runs, digit runs, single punct
    assert one(spark, "ab12,cd", bpe_token_count(F.col("t"))) == 4


def test_lang_id_markers(spark):
    assert one(spark, "the cat and the dog", lang_id(F.col("t"))) == "en"
    assert one(spark, "el perro que corre", lang_id(F.col("t"))) == "es"
    assert one(spark, "les chiens dans une rue", lang_id(F.col("t"))) == "fr"
    assert one(spark, "der hund und das haus", lang_id(F.col("t"))) == "de"
    assert one(spark, "xyz qrs", lang_id(F.col("t"))) == "und"


def test_quality_metrics(spark):
    m = quality_metrics(F.col("t"))
    df = spark.createDataFrame([("the cat, a dog!",)], ["t"])
    row = df.select(*[v.alias(k) for k, v in m.items()]).collect()[0]
    assert row.n_chars == 15 and row.n_tokens == 4
    assert row.punct_ratio == pytest.approx(2 / 15, abs=1e-6)
    assert row.stopword_ratio == pytest.approx(2 / 4, abs=1e-6)


def test_fingerprint_is_whitespace_case_invariant(spark):
    a = one(spark, "  Hello   World ", fingerprint(F.col("t")))
    b = one(spark, "hello world", fingerprint(F.col("t")))
    assert a == b and len(a) == 32
    assert one(spark, " A  b ", normalized_text(F.col("t"))) == "a b"


def test_dot_and_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    assert row.d == 32.0
    assert row.c == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))


def test_cosine_topk_orders_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        "id long, v array<float>",
    )
    q = df.filter(F.col("id") == 1).select(F.col("v").alias("q_vec"))
    out = cosine_topk(df, "id", "v", q, k=2).collect()
    assert [r.id for r in out] == [1, 2]
    assert out[0].sim == 1.0


def test_sign_bucket_deterministic(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0])], "id long, v array<float>"
    )
    # bits: dim1>=0→1, dim2<0→0, dim3>=0→4, ... = 1+4+16+32+64+128 = 245
    assert df.select(sign_bucket(F.col("v"), 8).alias("b")).collect()[0].b == 245
