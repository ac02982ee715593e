"""End-to-end training-corpus pipeline: dedup survivors, quality/language
gates, reproducible splits, per-split stats."""

from __future__ import annotations

from salesforce_plugin_spark.operators.pipeline import (
    build_training_corpus,
    corpus_stats,
)

EN = "the cat and the dog walked to the park in the morning and stayed"
ES = "el perro corre y los gatos que viven en una casa grande duermen"


def corpus_df(spark):
    return spark.createDataFrame(
        [
            (1, EN),
            (2, EN),                      # exact duplicate → dropped
            (3, "  " + EN + "  "),        # whitespace-variant duplicate → dropped
            (4, ES),
            (5, "short text"),            # fails min_tokens
            (6, None),                    # null → dropped
            (7, "zzz qqq www rrr ttt yyy uuu iii ooo ppp"),  # 'und' language
        ],
        ["doc_id", "text"],
    )


def test_pipeline_stages(spark):
    out = build_training_corpus(
        corpus_df(spark), min_tokens=5, langs=("en", "es")
    ).collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [1, 4]                 # survivors only
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].lang_pred == "en" and by_id[4].lang_pred == "es"
    assert by_id[1].split in ("train", "val", "test")


def test_pipeline_is_reproducible(spark):
    a = build_training_corpus(corpus_df(spark), min_tokens=5, langs=("en", "es"))
    b = build_training_corpus(
        corpus_df(spark).repartition(7), min_tokens=5, langs=("en", "es")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_corpus_stats(spark):
    corpus = build_training_corpus(
        corpus_df(spark), min_tokens=5, langs=("en", "es")
    )
    stats = {r.split: (r.n_docs, r.n_tokens) for r in corpus_stats(corpus).collect()}
    assert sum(n for n, _ in stats.values()) == 2
