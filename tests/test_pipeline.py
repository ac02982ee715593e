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


def test_chunk_documents_covers_every_token_with_overlap(spark):
    from salesforce_plugin_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, "doc_id", "text", chunk_tokens=64, stride=48)
    got = {(r.doc_id, r.chunk_id): r for r in rows.collect()}
    # doc 1: starts at tokens 1, 49, 97 → 3 chunks; stride < chunk → the
    # 16-token overlap means every 64-token window is fully inside a chunk
    assert {(1, 0), (1, 1), (1, 2)} <= set(got)
    assert got[(1, 0)].n_tokens == 64 and got[(1, 2)].n_tokens == 4
    assert got[(1, 1)].chunk_text.split()[0] == "t48"  # 1-based start 49
    # short and empty docs still produce exactly one chunk
    assert got[(2, 0)].n_tokens == 2 and (3, 0) in got


def test_pack_token_bins_first_fit_bound(spark):
    from salesforce_plugin_spark.functions.text import chunk_documents
    from salesforce_plugin_spark.operators.pipeline import pack_token_bins

    docs = spark.createDataFrame(
        [(i, "src", " ".join("w" for _ in range(37))) for i in range(40)],
        "doc_id long, source string, text string",
    )
    chunks = chunk_documents(docs, "doc_id", "text", 64, 48).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    packed = pack_token_bins(chunks, 256, ["source"], ["doc_id", "chunk_id"])
    per_bin = (
        packed.groupBy("bin_id").sum("n_tokens").withColumnRenamed(
            "sum(n_tokens)", "tot"
        )
    ).collect()
    max_chunk = 64
    # first-fit-in-order guarantee: a bin holds < seq_len before its last
    # chunk, so it can overflow by at most one chunk
    assert all(r.tot < 256 + max_chunk for r in per_bin)
    # and bins are dense: every bin except possibly the last is ≥ seq_len
    tots = [r.tot for r in sorted(per_bin, key=lambda r: r.bin_id)]
    assert all(t >= 256 for t in tots[:-1])


def test_sample_per_group_quota_and_determinism(spark):
    """Exactly min(n, group size) rows per group; selection is a pure
    function of the group's id set (same picks on re-run and under a
    different input partitioning)."""
    from salesforce_plugin_spark.operators.pipeline import sample_per_group

    rows = [(i, "g%d" % (i % 3)) for i in range(30)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = sample_per_group(df, ["grp"], "id", 4)
    sizes = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert sizes == {"g0": 4, "g1": 4, "g2": 4, "tiny": 1}

    picks = sorted((r["grp"], r["id"]) for r in out.collect())
    again = sorted(
        (r["grp"], r["id"])
        for r in sample_per_group(df.repartition(7), ["grp"], "id", 4).collect()
    )
    assert picks == again


# --- weighted Bernoulli sampling ---

def test_weighted_sample_rate_tracks_weight(spark):
    from salesforce_plugin_spark.operators.pipeline import weighted_sample

    n = 4000
    df = spark.createDataFrame([(i, 25) for i in range(n)], "id long, w int")
    kept = weighted_sample(df, "id", "w", cap=100).count()
    # p = 0.25; binomial sd ~ 27 rows; allow 5 sigma
    assert abs(kept - n * 0.25) < 140


def test_weighted_sample_keeps_heavy_and_drops_zero(spark):
    from salesforce_plugin_spark.operators.pipeline import weighted_sample

    df = spark.createDataFrame(
        [(1, 100), (2, 250), (3, 0)], "id long, w int"
    )
    kept = {r.id for r in weighted_sample(df, "id", "w", cap=100).collect()}
    assert {1, 2} <= kept and 3 not in kept  # w >= cap always kept; w=0 never


def test_weighted_sample_is_append_stable(spark):
    from salesforce_plugin_spark.operators.pipeline import weighted_sample

    small = spark.createDataFrame([(i, 50) for i in range(100)], "id long, w int")
    big = spark.createDataFrame([(i, 50) for i in range(200)], "id long, w int")
    s1 = {r.id for r in weighted_sample(small, "id", "w", cap=100).collect()}
    s2 = {r.id for r in weighted_sample(big, "id", "w", cap=100).collect()}
    assert s1 == {i for i in s2 if i < 100}  # membership independent of corpus


def test_weighted_sample_rejects_bad_cap(spark):
    import pytest as _pytest

    from salesforce_plugin_spark.operators.pipeline import weighted_sample

    df = spark.createDataFrame([(1, 1)], "id long, w int")
    with _pytest.raises(ValueError):
        weighted_sample(df, "id", "w", cap=0)
    with _pytest.raises(ValueError):
        weighted_sample(df, "id", "w", cap=1 << 32)


# --- negative sampling ---

def test_negative_samples_basic_contract(spark):
    from salesforce_plugin_spark.operators.pipeline import negative_samples

    corpus = spark.createDataFrame([(i,) for i in range(200)], "id long")
    anchors = spark.createDataFrame([(0,), (7,), (42,)], "id long")
    out = negative_samples(corpus, anchors, "id", k=4, n_buckets=16).collect()
    assert all(r.neg_id != r.anchor_id for r in out)       # no self-pairs
    per = {}
    for r in out:
        per.setdefault(r.anchor_id, set()).add(r.j)
    assert all(len(js) <= 4 for js in per.values())        # up to k per anchor
    assert set(per) <= {0, 7, 42}


def test_negative_samples_partitioning_invariant(spark):
    from salesforce_plugin_spark.operators.pipeline import negative_samples

    corpus = spark.createDataFrame([(i,) for i in range(300)], "id long")
    anchors = corpus.filter("id % 37 = 0")
    a = sorted(map(tuple, negative_samples(corpus, anchors, "id").collect()))
    b = sorted(
        map(
            tuple,
            negative_samples(
                corpus.repartition(13), anchors.repartition(3), "id"
            ).collect(),
        )
    )
    assert a == b  # pure function of ids: layout never changes the draw


def test_negative_samples_rejects_bad_args(spark):
    import pytest as _pytest

    from salesforce_plugin_spark.operators.pipeline import negative_samples

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        negative_samples(df, df, "id", k=0)
    with _pytest.raises(ValueError):
        negative_samples(df, df, "id", n_buckets=1)


# --- budget sampling ---

def test_budget_sample_exact_quota_never_exceeded(spark):
    from salesforce_plugin_spark.operators.pipeline import budget_sample

    df = spark.createDataFrame(
        [(i, "g", 10) for i in range(100)], "id long, g string, w int"
    )
    out = budget_sample(df, ["g"], "id", "w", budget=250).collect()
    assert len(out) == 25  # exactly 250/10 rows fit


def test_budget_sample_is_deterministic_across_layouts(spark):
    from salesforce_plugin_spark.operators.pipeline import budget_sample

    df = spark.createDataFrame(
        [(i, "ab"[i % 2], 7 + i % 5) for i in range(200)],
        "id long, g string, w int",
    )
    a = sorted(r.id for r in budget_sample(df, ["g"], "id", "w", 300).collect())
    b = sorted(
        r.id
        for r in budget_sample(df.repartition(17), ["g"], "id", "w", 300).collect()
    )
    assert a == b


def test_budget_sample_drops_over_budget_first_row(spark):
    from salesforce_plugin_spark.operators.pipeline import budget_sample

    df = spark.createDataFrame([(1, "g", 50)], "id long, g string, w int")
    assert budget_sample(df, ["g"], "id", "w", budget=49).count() == 0
    assert budget_sample(df, ["g"], "id", "w", budget=50).count() == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        budget_sample(df, ["g"], "id", "w", budget=0)


# --- epoch shuffle ---

def test_epoch_shuffle_layout_and_determinism(spark):
    from salesforce_plugin_spark.operators.pipeline import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    a = epoch_shuffle(df, "id", n_shards=4, epoch=0).collect()
    b = epoch_shuffle(df.repartition(13), "id", n_shards=4, epoch=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every row placed exactly once; positions dense 0..n_i-1 per shard
    assert len(a) == 300 and len({r.id for r in a}) == 300
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_epoch_shuffle_epochs_permute_differently(spark):
    from salesforce_plugin_spark.operators.pipeline import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    e0 = {r.id: (r.shard, r.pos) for r in epoch_shuffle(df, "id", 4, epoch=0).collect()}
    e1 = {r.id: (r.shard, r.pos) for r in epoch_shuffle(df, "id", 4, epoch=1).collect()}
    assert e0 != e1  # different permutation per epoch
    import pytest as _pytest
    with _pytest.raises(ValueError):
        epoch_shuffle(df, "id", n_shards=0)
