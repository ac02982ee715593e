"""Unit semantics tests for round-5 operators: grouped k-fold, target
encoding, winsorize, RAKE, degree distribution, k-core peel, Markov
transitions, chat render, length buckets."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F


# --- grouped k-fold ---

def test_kfold_group_atomicity_and_determinism(spark):
    from salesforce_plugin_spark.operators.pipeline import kfold_assign

    rows = [(i, f"g{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = kfold_assign(df, "g", k=5)
    # every group sits in exactly one fold
    per_group = out.groupBy("g").agg(
        F.countDistinct("fold").alias("nf")
    ).collect()
    assert all(r.nf == 1 for r in per_group)
    # deterministic across invocations
    a = {(r.id, r.fold) for r in out.collect()}
    b = {(r.id, r.fold) for r in kfold_assign(df, "g", 5).collect()}
    assert a == b
    with pytest.raises(ValueError):
        kfold_assign(df, "g", k=1)


# --- target encoding ---

def test_target_encoding_exact_values(spark):
    from salesforce_plugin_spark.operators.analytics import target_encoding

    # group A: y = 10, 20 (n=2, S=30); group B: y = 40 (n=1)
    df = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20), (3, "B", 40)],
        "id long, g string, y long",
    )
    out = {
        r.id: r
        for r in target_encoding(
            df, "g", "y", smoothing=2, scale=100
        ).collect()
    }
    # prior_q = (70*100) div 3 = 2333
    # enc(A) = (30*100 + 2*2333) div (2+2) = (3000+4666) div 4 = 1916
    assert out[1].enc == 1916 and out[2].enc == 1916
    # enc(B) = (40*100 + 4666) div 3 = 2888
    assert out[3].enc == 2888
    # loo for id=1: ((30-10)*100 + 4666) div (1+2) = 2222
    assert out[1].enc_loo == 2222
    # loo for id=2: ((30-20)*100 + 4666) div 3 = 1888
    assert out[2].enc_loo == 1888
    # singleton group: loo undefined
    assert out[3].enc_loo is None


def test_target_encoding_skips_null_targets(spark):
    from salesforce_plugin_spark.operators.analytics import target_encoding

    df = spark.createDataFrame(
        [(1, "A", 10), (2, "A", None)], "id long, g string, y long"
    )
    rows = target_encoding(df, "g", "y").collect()
    assert [r.id for r in rows] == [1]


# --- winsorize ---

def test_winsorize_clamps_tails_only(spark):
    from salesforce_plugin_spark.functions.sketch import winsorize

    # 100 uniform values 1..100 plus wild outliers
    vals = [(float(i),) for i in range(1, 101)] + [(1000.0,), (-500.0,)]
    df = spark.createDataFrame(vals, "v double")
    out = winsorize(df, "v", lo=0.0, hi=128.0, q_low=0.05, q_high=0.95)
    rows = out.collect()
    clamped = [r for r in rows if r.clamped == 1]
    # the two outliers are certainly clamped; bulk midrange is not
    assert any(r.value == 1000.0 for r in clamped)
    assert any(r.value == -500.0 for r in clamped)
    mid = [r for r in rows if 20 <= r.value <= 80]
    assert all(r.clamped == 0 for r in mid)
    # winsorized range is within the fences
    assert all(0 <= r.winsorized <= 128 for r in rows)
    with pytest.raises(ValueError):
        winsorize(df, "v", 0.0, 128.0, q_low=0.9, q_high=0.1)


def test_winsorize_null_passthrough(spark):
    from salesforce_plugin_spark.functions.sketch import winsorize

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 51)] + [(None,)], "v double"
    )
    rows = winsorize(df, "v", 0.0, 64.0).collect()
    nulls = [r for r in rows if r.value is None]
    # NULL in -> NULL out, never fabricated to the lower fence
    assert len(nulls) == 1
    assert nulls[0].winsorized is None and nulls[0].clamped is None


# --- RAKE ---

def test_rake_phrases_split_on_stopwords(spark):
    from salesforce_plugin_spark.functions.text import rake_phrases

    df = spark.createDataFrame(
        [(1, "deep learning is the best model, for sure")],
        "doc_id long, text string",
    )
    got = {r.phrase for r in rake_phrases(df, "doc_id", "text").collect()}
    assert got == {"deep learning", "best model", "sure"}


def test_rake_scores_exact(spark):
    from salesforce_plugin_spark.functions.text import rake_keywords

    # phrases: "deep learning" x2, "deep" x1
    # freq(deep)=3, degree(deep)=2+2+1=5 -> wscore=5_000_000 div 3=1666666
    # freq(learning)=2, degree=4 -> wscore=2_000_000
    # score("deep learning") = 1666666+2000000 = 3666666
    # score("deep") = 1666666
    df = spark.createDataFrame(
        [(1, "deep learning"), (2, "deep learning"), (3, "deep")],
        "doc_id long, text string",
    )
    rows = {r.phrase: r for r in rake_keywords(df, "doc_id", "text").collect()}
    assert rows["deep learning"].score_ppm == 3666666
    assert rows["deep learning"].n_occ == 2
    assert rows["deep"].score_ppm == 1666666
    assert rows["deep learning"].rank == 1


# --- degree distribution / k-core ---

def test_degree_distribution_star(spark):
    from salesforce_plugin_spark.functions.graph import degree_distribution

    # star: center 0 connected to 1..5 (plus a duplicate + self-loop)
    edges = [(0, i) for i in range(1, 6)] + [(1, 0), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.degree: r.n_nodes for r in degree_distribution(df).collect()}
    assert got == {5: 1, 1: 5}


def test_kcore_cascading_peel(spark):
    from salesforce_plugin_spark.functions.graph import kcore_fixed

    # triangle {0,1,2} + path 2-3-4-5 hanging off it, k=2:
    # round 1 drops 5 (deg 1), round 2 drops 4, round 3 drops 3 ->
    # converged core = the triangle. one round is provably not enough.
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    after1 = {r.node for r in kcore_fixed(df, k=2, rounds=1).collect()}
    assert 4 in after1  # cascade not finished after one round
    core = {r.node: r.degree for r in kcore_fixed(df, k=2, rounds=4).collect()}
    assert core == {0: 2, 1: 2, 2: 2}
    # fixpoint: extra rounds change nothing
    again = {r.node: r.degree for r in kcore_fixed(df, k=2, rounds=6).collect()}
    assert again == core
    with pytest.raises(ValueError):
        kcore_fixed(df, k=0)


# --- Markov transitions ---

def test_transition_probabilities_ppm_and_rank(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.analytics import (
        transition_probabilities,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=30)
    rows = [
        # one user, one session: a->b, b->a, a->b  (a: 2 transitions out)
        (1, t0 + 0 * s, "a", 1),
        (1, t0 + 1 * s, "b", 2),
        (1, t0 + 2 * s, "a", 3),
        (1, t0 + 3 * s, "b", 4),
        # session break > 10 min: no transition across it
        (1, t0 + dt.timedelta(hours=1), "c", 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    out = {
        (r.prev_type, r.next_type): r
        for r in transition_probabilities(
            df, "user_id", "ts", "event_type", 10, ["event_id"]
        ).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}  # no cross-session pair
    assert out[("a", "b")].n == 2
    assert out[("a", "b")].prob_ppm == 1_000_000
    assert out[("b", "a")].prob_ppm == 1_000_000
    assert out[("a", "b")].rank == 1


# --- chat render ---

def test_render_chat_offsets(spark):
    from salesforce_plugin_spark.operators.pipeline import render_chat

    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in render_chat(
        df, "doc_id", "text", instruction_words=3
    ).collect()}
    r1 = out[1]
    assert r1.rendered == "<|user|>\none two three\n<|assistant|>\nfour"
    assert r1.prompt_chars == len("<|user|>\none two three\n<|assistant|>\n")
    # the completion starts exactly at prompt_chars
    assert r1.rendered[r1.prompt_chars:] == "four"
    assert r1.prompt_tokens == 3 and r1.completion_tokens == 1
    # whitespace canonicalizes: newlines/doubled spaces split as \s+
    df2 = spark.createDataFrame(
        [(3, "one\ntwo  three")], "doc_id long, text string"
    )
    r3 = render_chat(df2, "doc_id", "text", instruction_words=2).collect()[0]
    assert r3.rendered.endswith("<|assistant|>\nthree")
    assert r3.prompt_tokens == 2 and r3.completion_tokens == 1
    # short doc: empty completion
    r2 = out[2]
    assert r2.completion_tokens == 0
    assert r2.rendered.endswith("<|assistant|>\n")
    assert r2.prompt_tokens == 2


# --- length buckets ---

def test_length_buckets_pow2_boundaries(spark):
    from salesforce_plugin_spark.operators.pipeline import length_buckets

    df = spark.createDataFrame(
        [(1,), (15,), (16,), (17,), (32,), (33,), (100,)], "n long"
    )
    got = {r.bucket: r for r in length_buckets(df, "n", min_bucket=16).collect()}
    # 1, 15, 16 -> 16; 17, 32 -> 32; 33 -> 64; 100 -> 128
    assert got[16].n_docs == 3
    assert got[32].n_docs == 2
    assert got[64].n_docs == 1
    assert got[128].n_docs == 1
    assert got[16].padding == (16 - 1) + (16 - 15) + 0
    assert got[32].padding == (32 - 17) + 0
    assert got[128].padding == 28


# --- inter-arrival stats ---

def test_interarrival_exact_gaps(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.timeseries import (
        interarrival_stats,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0, 1),
        ("u", t0 + dt.timedelta(seconds=1), 2),
        ("u", t0 + dt.timedelta(seconds=4), 3),   # gaps: 1s, 3s
        ("v", t0, 4),                             # single event: no gap
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long")
    out = {r.k: r for r in interarrival_stats(df, ["k"], "ts", ["id"]).collect()}
    assert set(out) == {"u"}
    u = out["u"]
    assert u.n_gaps == 2
    assert u.min_us == 1_000_000 and u.max_us == 3_000_000
    assert u.mean_us == 2_000_000
    assert u.burst_x1000 == 1500  # 3s / 2s


# --- dup size histogram ---

def test_dup_size_histogram(spark):
    from salesforce_plugin_spark.functions.dedup import dup_size_histogram

    df = spark.createDataFrame(
        [("a b",), ("A  b",), ("c",), ("d",)], "text string"
    )  # "a b" and "A  b" normalize identically
    got = {r.cluster_size: r for r in dup_size_histogram(df).collect()}
    assert got[2].n_clusters == 1 and got[2].n_docs == 2
    assert got[1].n_clusters == 2 and got[1].n_docs == 2


# --- vocab coverage ---

def test_vocab_coverage_curve(spark):
    from salesforce_plugin_spark.functions.text import vocab_coverage

    # counts: x:4, y:2, z:1, w:1  (total 8); rank order x,y,w,z (ties by term)
    df = spark.createDataFrame(
        [(1, "x x x x y y"), (2, "z w")], "doc_id long, text string"
    )
    got = {r.cutoff: r for r in vocab_coverage(
        df, "text", cutoffs=[1, 2, 4, 100]
    ).collect()}
    assert got[1].coverage_ppm == 500_000           # 4/8
    assert got[2].coverage_ppm == 750_000           # 6/8
    assert got[4].coverage_ppm == 1_000_000
    assert got[100].n_terms == 4                    # clamped at |vocab|


# --- centroid similarity ---

def test_centroid_similarity_identical_and_orthogonal(spark):
    from salesforce_plugin_spark.functions.vector import centroid_similarity

    rows = [
        (0, [1.0, 0.0]), (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {(r.label_a, r.label_b): r for r in centroid_similarity(
        df, "label", "embedding", scale=100
    ).collect()}
    assert got[(0, 1)].cos_ppm == 0          # orthogonal
    assert got[(0, 2)].cos_ppm == 1_000_000  # parallel
    assert got[(0, 2)].dot == 200 * 100      # 2 vectors * scale · 1 * scale
    assert got[(1, 2)].cos_ppm == 0


def test_centroid_similarity_exact_isqrt_and_sign(spark):
    """cos_ppm is floor(|dot|·10⁶ / isqrt(na·nb)) with trunc-toward-zero
    sign handling — exact against Python's math.isqrt."""
    import math

    from salesforce_plugin_spark.functions.vector import centroid_similarity

    rows = [
        (0, [3.0, 4.0]),
        (1, [-4.0, 3.0]),   # orthogonal to label 0
        (2, [1.0, 7.0]),    # oblique
        (3, [-3.0, -4.0]),  # anti-parallel to label 0 → cos_ppm = -10⁶
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {(r.label_a, r.label_b): r for r in centroid_similarity(
        df, "label", "embedding", scale=1000
    ).collect()}
    for (la, lb), r in got.items():
        p = r.norm2_a * r.norm2_b
        y = math.isqrt(p)
        want = (
            -((-r.dot * 1_000_000) // y)
            if r.dot < 0
            else (r.dot * 1_000_000) // y
        )
        assert r.cos_ppm == want, (la, lb)
    assert got[(0, 3)].cos_ppm == -1_000_000
    assert got[(0, 1)].cos_ppm == 0


# --- random projection ---

def test_random_projection_matches_numpy(spark):
    import numpy as np
    from salesforce_plugin_spark.functions.vector import (
        projection_signs,
        random_projection,
    )

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(5)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = random_projection(
        df, "vec_id", "embedding", n_components=4, dims=16, quant=1000
    ).collect()
    signs = np.array(projection_signs(4, 16))
    for r in out:
        q = np.array(
            [round(float(np.float64(np.float32(x))) * 1000) for x in vecs[r.vec_id][1]],
            dtype=np.int64,
        )
        assert r.y == int(signs[r.j] @ q)
    # deterministic: same matrix on re-call
    assert projection_signs(4, 16) == projection_signs(4, 16)
    assert len(out) == 5 * 4


# --- min-max scaling ---

def test_minmax_scale_exact(spark):
    from salesforce_plugin_spark.operators.analytics import minmax_scale

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 15), (4, "b", 7)],
        "id long, g string, y long",
    )
    got = {r.id: r for r in minmax_scale(df, "g", "y").collect()}
    assert got[1].scaled_ppm == 0
    assert got[2].scaled_ppm == 1_000_000
    assert got[3].scaled_ppm == 500_000
    assert got[4].scaled_ppm is None  # degenerate group


# --- token gini ---

def test_token_gini_known_values(spark):
    from salesforce_plugin_spark.functions.text import token_gini

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b"), (4, "  ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in token_gini(df, "doc_id", "text").collect()}
    assert got[1].gini_ppm == 0                       # one token repeated
    assert got[2].gini_ppm == 750_000                 # all distinct: 1-4/16
    assert got[3].gini_ppm == 500_000                 # (16-8)/16
    assert got[2].n_distinct == 4 and got[1].n_distinct == 1
    # empty/whitespace docs: 0 tokens, NULL gini (not a fake 1-token loop)
    assert got[4].n_tokens == 0 and got[4].n_distinct == 0
    assert got[4].gini_ppm is None


# --- source vocab overlap ---

def test_source_vocab_overlap_exact(spark):
    from salesforce_plugin_spark.functions.text import source_vocab_overlap

    df = spark.createDataFrame(
        [("s1", "a b c"), ("s2", "b c d"), ("s3", "x")],
        "source string, text string",
    )
    got = {(r.group_a, r.group_b): r for r in source_vocab_overlap(
        df, "source", "text"
    ).collect()}
    r = got[("s1", "s2")]
    assert (r.v_a, r.v_b, r.inter) == (3, 3, 2)
    assert r.jaccard_ppm == 500_000  # 2/4
    assert ("s1", "s3") not in got   # disjoint vocab: no pair emitted


# --- streaming inter-arrival face ---

def test_stream_interarrival_equals_batch(spark, tmp_path):
    import datetime as dt
    import os
    import time as _time

    from salesforce_plugin_spark.operators.timeseries import (
        interarrival_stats,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_interarrival_state,
        run_stream_interarrival,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0),
        ("u", t0 + dt.timedelta(seconds=2)),
        # batch boundary gap: 5s
        ("u", t0 + dt.timedelta(seconds=7)),
        ("u", t0 + dt.timedelta(seconds=8)),
        ("v", t0 + dt.timedelta(seconds=7)),   # appears only in batch 2
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = df.filter(df.ts < dt.datetime(2024, 1, 1, 0, 0, 5))
    b2 = df.filter(df.ts >= dt.datetime(2024, 1, 1, 0, 0, 5))
    now = _time.time()
    for i, b in enumerate([b1, b2]):
        stage = str(tmp_path / f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(stage, pf), dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    run_stream_interarrival(
        stream, state, str(tmp_path / "ckpt"), ["k"], "ts"
    )
    streamed = {
        r.k: r for r in read_interarrival_state(spark, state).collect()
    }
    batch = {
        r.k: r for r in interarrival_stats(df, ["k"], "ts").collect()
    }
    assert set(streamed) == set(batch) == {"u"}  # v: single event, no gap
    for k in batch:
        for c in ["n_gaps", "min_us", "max_us", "mean_us", "burst_x1000"]:
            assert getattr(streamed[k], c) == getattr(batch[k], c), (k, c)
    # the boundary gap was genuinely exercised
    assert streamed["u"].max_us == 5_000_000
    assert streamed["u"].n_gaps == 3


# --- generic additive-count stream face ---

def test_stream_additive_counts_equals_batch(spark, tmp_path):
    import os
    import time as _time

    from salesforce_plugin_spark.streaming.upsert import (
        read_summed_counts,
        run_stream_additive_counts,
    )

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(30)], "id long, g string"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = _time.time()
    for i in range(2):
        b = df.filter(df.id % 2 == i)
        stage = str(tmp_path / f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(stage, pf), dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("id long, g string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    run_stream_additive_counts(
        stream, state, str(tmp_path / "ckpt"), ["g"]
    )
    # state holds one partial per (batch, group): genuinely merged
    assert spark.read.parquet(state).count() == 6
    got = {r.g: r.n for r in read_summed_counts(spark, state, ["g"]).collect()}
    want = {r.g: r.n for r in df.groupBy("g").count()
            .withColumnRenamed("count", "n").collect()}
    assert got == want


# --- BPE apply ---

def test_bpe_apply_single_pass_non_overlap(spark):
    from salesforce_plugin_spark.functions.text import bpe_apply

    # corpus vocab {llll}: only pair 'll' -> single merge. one
    # left-to-right non-overlapping pass over ' l l l l ' merges the
    # FIRST pair only (' ll l l '): 3 tokens per word.
    df = spark.createDataFrame(
        [(1, "llll llll"), (2, "x9 a")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bpe_apply(
        df, "doc_id", "text", n_merges=2
    ).collect()}
    assert got[1].n_words == 2 and got[1].n_tokens == 6
    # non-alphabetic / 1-char words pass through at 1 token each
    assert got[2].n_words == 2 and got[2].n_tokens == 2


def test_bpe_apply_merge_order(spark):
    from salesforce_plugin_spark.functions.text import bpe_apply

    # vocab {the: 3}: pairs th(3), he(3); rank order is (n desc, pair
    # asc) -> 'he' merges FIRST, blocking 'th': 'the' -> [t, he].
    df = spark.createDataFrame(
        [(1, "the the the")], "doc_id long, text string"
    )
    r = bpe_apply(df, "doc_id", "text", n_merges=2).collect()[0]
    assert r.n_words == 3 and r.n_tokens == 6


# --- rolling quantiles ---

def test_rolling_quantiles_window_semantics(spark):
    import datetime as dt
    from salesforce_plugin_spark.functions.sketch import rolling_quantiles

    # key 'a': day 1 has values {2.0 x3}, day 5 has {10.0 x1}.
    # with a 7-day window, day 5's report sees all 4 values; day 1's
    # report sees only day 1. width = 1.0 (lo=0, hi=16, 16 bins):
    # upper-edge convention -> p50(day1) = 3.0 (bin 2), p50(day5) = 3.0,
    # p95... for 4 values ceil(.95*4)=4 -> the 10.0 bin -> est 11.0.
    rows = [("a", dt.datetime(2024, 1, 1, 12), 2.0)] * 3 + [
        ("a", dt.datetime(2024, 1, 5, 12), 10.0)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.key, str(r.day), r.q): r
        for r in rolling_quantiles(
            df, "k", "ts", "v", [0.5, 0.95], 0.0, 16.0, 16, 7
        ).collect()
    }
    assert out[("a", "2024-01-01", 0.5)].est == 3.0
    assert out[("a", "2024-01-01", 0.5)].n_total == 3
    assert out[("a", "2024-01-05", 0.5)].est == 3.0
    assert out[("a", "2024-01-05", 0.95)].est == 11.0
    assert out[("a", "2024-01-05", 0.95)].n_total == 4
    # day 8 is served by day 5's explode only (day 1 aged out)
    assert out[("a", "2024-01-08", 0.5)].n_total == 1
    assert out[("a", "2024-01-11", 0.5)].n_total == 1  # last served day
    assert ("a", "2024-01-12", 0.5) not in out  # beyond day 5 + 6


# --- keyset pagination ---

def test_keyset_page_boundaries(spark):
    from salesforce_plugin_spark.operators.transforms import keyset_page

    df = spark.createDataFrame(
        [(d, k) for d in [1, 2, 3] for k in [10, 20, 30]], "d int, k int"
    )
    page = keyset_page(df, ["d", "k"], [2, 20], 3).collect()
    assert [(r.d, r.k) for r in page] == [(2, 30), (3, 10), (3, 20)]
    first = keyset_page(df, ["d", "k"], None, 4).collect()
    assert [(r.d, r.k) for r in first] == [
        (1, 10), (1, 20), (1, 30), (2, 10)
    ]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        keyset_page(df, ["d"], [1, 2], 3)


# --- ANN recall evaluation ---

def test_ann_recall_perfect_and_missed(spark):
    import pyspark.sql.functions as F
    from salesforce_plugin_spark.functions.vector import ann_recall, as_double

    # two well-separated clusters around e1 and e2; 6 vectors each
    def vec(axis, i):
        v = [0.0, 0.0, 0.0]
        v[axis] = 1.0
        v[(axis + 1) % 3] = 0.01 * i
        return v

    rows = [(i, vec(0, i)) for i in range(6)] + [
        (10 + i, vec(1, i)) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = df.filter(F.col("vec_id").isin(0, 10)).select(
        F.col("vec_id").alias("centroid_id"),
        as_double(F.col("embedding")).alias("c_vec"),
    )
    queries = df.filter(F.col("vec_id").isin(1, 11)).select(
        F.col("vec_id").alias("q_id"),
        as_double(F.col("embedding")).alias("q_vec"),
    )
    # nprobe=1, k=6: each query's own cluster is probed -> perfect recall
    got = {r.q_id: r for r in ann_recall(
        df, "vec_id", "embedding", seeds, queries, k=6, nprobe=1
    ).collect()}
    assert got[1].recall_ppm == 1_000_000 and got[1].rr_x1000 == 1000
    assert got[11].recall_ppm == 1_000_000
    # k=12 > cluster size with nprobe=1: the other cluster's vectors
    # are unreachable -> recall 6/12
    got2 = {r.q_id: r for r in ann_recall(
        df, "vec_id", "embedding", seeds, queries, k=12, nprobe=1
    ).collect()}
    assert got2[1].n_hits == 6 and got2[1].recall_ppm == 500_000
    # nprobe=2 restores perfection at k=12
    got3 = {r.q_id: r for r in ann_recall(
        df, "vec_id", "embedding", seeds, queries, k=12, nprobe=2
    ).collect()}
    assert got3[1].recall_ppm == 1_000_000


# --- funnel latency ---

def test_funnel_latency_median(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.analytics import funnel_latency

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, s, typ):
        return (u, t0 + dt.timedelta(seconds=s), typ)

    rows = [
        ev(1, 0, "a"), ev(1, 10, "b"),     # a>b: 10s
        ev(2, 0, "a"), ev(2, 30, "b"),     # a>b: 30s
        ev(3, 0, "a"),                      # never converts
        ev(2, 40, "c"),                     # b>c: 10s
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, t string")
    got = {r.transition: r for r in funnel_latency(
        df, "u", "ts", "t", ["a", "b", "c"]
    ).collect()}
    ab = got["a>b"]
    assert ab.n_converted == 2
    assert ab.median_us == 10_000_000  # lower median of {10s, 30s}
    assert got["b>c"].n_converted == 1
    assert got["b>c"].median_us == 10_000_000
    # zero-converter transitions stay visible with n=0, NULL median
    got2 = {r.transition: r for r in funnel_latency(
        df, "u", "ts", "t", ["a", "b", "z"]
    ).collect()}
    assert got2["b>z"].n_converted == 0
    assert got2["b>z"].median_us is None


# --- k-hop reachability ---

def test_khop_exact_distances(spark):
    from salesforce_plugin_spark.functions.graph import khop_reachability

    # path 1-2-3-4-5 plus a branch 2-6
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "id long")
    got = {r.node: r.hops for r in khop_reachability(e, seeds, k=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 6: 2, 4: 3}  # 5 is 4 hops: absent
    # k=1 stops at direct neighbors
    got1 = {r.node: r.hops for r in khop_reachability(e, seeds, k=1).collect()}
    assert got1 == {1: 0, 2: 1}


# --- multimodal channel stats ---

def test_channel_stats_deinterleave(spark):
    from salesforce_plugin_spark.functions.multimodal import (
        channel_stats_plan,
    )
    import pyspark.sql.functions as F

    # payload bytes 1..6 over 2 channels: ch0 = [1,3,5], ch1 = [2,4,6]
    df = spark.createDataFrame(
        [(1, bytes([1, 2, 3, 4, 5, 6]))], "doc_id long, payload binary"
    )
    got = {r.channel: r for r in channel_stats_plan(
        df, "doc_id", "payload", n_channels=2, decoder=lambda b: b
    ).collect()}
    assert got[0].n == 3 and got[0].s == 9 and got[0].sq == 35
    assert got[1].n == 3 and got[1].s == 12 and got[1].sq == 56
    import pytest as _pytest
    with _pytest.raises(Exception):
        # no decoder injected -> the documented NotImplementedError seam
        channel_stats_plan(df, "doc_id", "payload", 2).collect()


# --- HITS ---

def test_hits_exact_one_iteration(spark):
    from salesforce_plugin_spark.functions.graph import hits_fixed

    # u1 -> {p1, p2, p3}, u2 -> {p1}
    edges = [(1, 101), (1, 102), (1, 103), (2, 101)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.side, r.id): r.score for r in hits_fixed(
        df, iterations=1
    ).collect()}
    # a1: p1 = 2e6 -> 1e6 after renorm; p2 = p3 = 5e5
    assert got[("auth", 101)] == 1_000_000
    assert got[("auth", 102)] == 500_000
    # h1: u1 = 1e6 + 5e5 + 5e5 = 2e6 -> 1e6; u2 = 1e6 -> 5e5
    assert got[("hub", 1)] == 1_000_000
    assert got[("hub", 2)] == 500_000
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hits_fixed(df, iterations=0)


# --- MAD outliers ---

def test_mad_outliers_robustness(spark):
    from salesforce_plugin_spark.operators.analytics import mad_outliers

    # values 10..19 plus a wild outlier 1000: median 15 (lower of 14/15
    # -> 2*cum>=tot at 15? values 10..19: cum at 14 is 5, tot 11 ->
    # 2*5<11; at 15 cum 6 -> 12>=11: med=15), MAD = median(|y-15|)
    vals = [(i, "g", v) for i, v in enumerate(list(range(10, 20)) + [1000])]
    df = spark.createDataFrame(vals, "id long, g string, y long")
    got = {r.id: r for r in mad_outliers(df, "g", "y", 3, 1).collect()}
    assert got[0].med == 15
    # deviations: 5,4,3,2,1,0,1,2,3,4,985 sorted ->
    # 0,1,1,2,2,3,3,4,4,5,985; lower median = 3
    assert got[0].mad == 3
    flagged = [r.id for r in got.values() if r.is_outlier == 1]
    assert flagged == [10]  # only the 1000 row: |985| > 9


# --- rank movers ---

def test_rank_movers_delta_and_nulls(spark):
    from salesforce_plugin_spark.operators.analytics import rank_movers

    rows = [
        ("u1", "A", 100), ("u2", "A", 50),
        ("u1", "B", 10), ("u2", "B", 90), ("u3", "B", 5),
    ]
    df = spark.createDataFrame(rows, "k string, p string, m long")
    got = {r.key: r for r in rank_movers(df, "k", "m", "p", "A", "B").collect()}
    assert got["u1"].rank_a == 1 and got["u1"].rank_b == 2
    assert got["u1"].delta == -1          # dropped a place
    assert got["u2"].delta == 1           # improved
    assert got["u3"].rank_a is None and got["u3"].delta is None


# --- lead-lag ---

def test_leadlag_detects_shift(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.analytics import (
        leadlag_correlation,
    )

    d0 = dt.datetime(2024, 1, 10)
    rows = []
    # 'x' spikes on days 0 and 2; 'y' spikes exactly 1 day later
    for day, n in [(0, 5), (2, 7)]:
        rows += [(d0 + dt.timedelta(days=day), "x")] * n
        rows += [(d0 + dt.timedelta(days=day + 1), "y")] * n
    df = spark.createDataFrame(rows, "ts timestamp, t string")
    got = {r.lag: r for r in leadlag_correlation(
        df, "ts", "t", "x", "y", 2
    ).collect()}
    assert got[1].dot == 5 * 5 + 7 * 7    # aligned at lag +1
    assert got[1].dot > got.get(0, type("z", (), {"dot": 0})).dot
    assert got[-1].dot == 5 * 7           # x day2 vs y day1


# --- exact decimal floor-division helper ---

def test_dfloor_beyond_long_range(spark):
    import pyspark.sql.functions as F
    from salesforce_plugin_spark.functions.exactmath import dcast, dfloor

    # numerator ~ 8.1e18 * 1e6 = 8.1e24: wraps long, exact in decimal
    df = spark.createDataFrame(
        [(9_000_000_000, 8_999_999_999)], "total long, n long"
    )
    r = df.select(
        F.expr(dfloor(dcast("n") + " * 1000000000000", dcast("total")))
        .alias("x")
    ).collect()[0]
    assert r.x == (8_999_999_999 * 10**12) // 9_000_000_000
    # the plain-long form cannot produce this number: under ANSI it
    # throws ArithmeticException (and with ANSI off it would wrap) --
    # either way the decimal path is the only correct one
    import pytest as _pytest
    with _pytest.raises(Exception):
        df.select(
            F.expr("n * 1000000000000 div total").alias("x")
        ).collect()


# --- weighted PageRank ---

def test_weighted_pagerank_splits_by_weight(spark):
    from salesforce_plugin_spark.functions.graph import pagerank_fixed

    # directed star: u -> a (w=9), u -> b (w=1); no symmetrize
    df = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1)], "src long, dst long, w long"
    )
    r = {x.id: x.rank_scaled for x in pagerank_fixed(
        df, iterations=1, symmetrize=False, weight_col="w"
    ).collect()}
    # teleport base is equal; a's inflow is 9x b's
    base = r[0]
    assert (r[1] - base) == 9 * (r[2] - base) or abs(
        (r[1] - base) - 9 * (r[2] - base)
    ) <= 9  # floor-div slack < 1 unit per divide
    assert r[1] > r[2] > r[0]


# --- mutual nearest neighbors ---

def test_mutual_nn_requires_symmetry(spark):
    from salesforce_plugin_spark.functions.vector import mutual_nn

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.14], 0),   # 1 and 2: each other's top-1
        (3, [0.7, 0.71], 0),    # 3's top-1 is 2, but 2's is 1: excluded
        (9, [0.0, 1.0], 1),     # alone in its block: no pairs
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = [(r.id_a, r.id_b) for r in mutual_nn(
        df, "vec_id", "embedding", "label"
    ).collect()]
    assert got == [(1, 2)]


# --- component size histogram ---

def test_component_size_histogram(spark):
    from salesforce_plugin_spark.functions.dedup import (
        component_size_histogram,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40), (5, 50)],
        "id long, component_id long",
    )
    got = {r.cluster_size: r for r in component_size_histogram(df).collect()}
    assert got[3].n_components == 1 and got[3].n_docs == 3
    assert got[1].n_components == 2 and got[1].n_docs == 2


# --- Fano factor ---

def test_fano_factor_exact(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.analytics import fano_factor

    d0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 'c': 5 events/day x 2 days (constant -> fano 0)
    for day in range(2):
        rows += [("c", d0 + dt.timedelta(days=day))] * 5
    # user 'b': 1 then 9 events (n=2, total=10, sq=82 -> 3200)
    rows += [("b", d0)] * 1 + [("b", d0 + dt.timedelta(days=1))] * 9
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    got = {r.u: r for r in fano_factor(df, ["u"], "ts").collect()}
    assert got["c"].fano_x1000 == 0
    assert got["b"].fano_x1000 == (2 * 82 - 100) * 1000 // (2 * 10)


def test_mutual_nn_adaptive_subblocking(spark):
    from salesforce_plugin_spark.functions.vector import mutual_nn

    # 130 same-label vectors -> bits = msb(130 div 64) = 1: blocks split
    # on the sign of dim 1. A near-identical pair with MATCHING first
    # sign is found; a near-identical pair STRADDLING the sign split is
    # not (the documented ANN recall tradeoff of sub-blocking).
    rows = [(1, [1.0, 0.9, 0.0]), (2, [1.0, 0.9001, 0.0])]      # found
    rows += [(3, [0.001, 0.5, 0.8]), (4, [-0.001, 0.5, 0.8])]   # straddle
    rows += [
        (100 + i, [1.0, float(i), 100.0 + i]) for i in range(126)
    ]  # filler to push the block over target_block
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = {(r.id_a, r.id_b) for r in mutual_nn(
        df, "vec_id", "embedding", "label"
    ).collect()}
    assert (1, 2) in got
    assert (3, 4) not in got
    # with sub-blocking effectively off (huge target), the pair appears
    got2 = {(r.id_a, r.id_b) for r in mutual_nn(
        df, "vec_id", "embedding", "label", target_block=1000
    ).collect()}
    assert (3, 4) in got2


# --- degree assortativity ---

def test_degree_assortativity_star(spark):
    from salesforce_plugin_spark.functions.graph import degree_assortativity

    # star: center 0 (deg 4) - leaves 1..4 (deg 1)
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    got = {r.degree: r for r in degree_assortativity(df).collect()}
    # leaves' only neighbor has degree 4: knn = 4.0
    assert got[1].n_nodes == 4 and got[1].knn_x1000 == 4000
    # center's neighbors all have degree 1: knn = 1.0
    assert got[4].n_nodes == 1 and got[4].knn_x1000 == 1000


# --- modularity ---

def test_modularity_two_cliques(spark):
    from salesforce_plugin_spark.functions.graph import modularity

    # two triangles joined by one bridge edge: m = 7
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    comm = spark.createDataFrame(
        [(i, 0) for i in (1, 2, 3)] + [(i, 1) for i in (4, 5, 6)],
        "id long, label long",
    )
    got = {r.label: r for r in modularity(e, comm).collect()}
    # community 0: e_in=3, d=2+2+3=7 -> q_num = 4*7*3 - 49 = 35
    assert got[0].e_in == 3 and got[0].degree_sum == 7
    assert got[0].q_num == 4 * 7 * 3 - 49
    assert got[0].m == 7
    # Q = (35 + 35) / (4*49) ~ 0.357: positive, as a good split should be
    total = sum(r.q_num for r in got.values())
    assert total == 70
    # degenerate: everything in one community -> Q = 0 exactly
    allone = spark.createDataFrame(
        [(i, 9) for i in range(1, 7)], "id long, label long"
    )
    g2 = modularity(e, allone).collect()[0]
    assert g2.q_num == 4 * 7 * 7 - 14 * 14  # = 0


# --- day-of-week profile ---

def test_dow_profile_iso_numbering(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.timeseries import dow_profile

    # 2024-01-01 is a Monday; 2024-01-07 a Sunday
    rows = [("a", dt.datetime(2024, 1, 1, 9))] * 3 + [
        ("a", dt.datetime(2024, 1, 7, 9))
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r.dow: r for r in dow_profile(df, ["k"], "ts").collect()}
    assert got[1].n == 3      # Monday = ISO 1
    assert got[7].n == 1      # Sunday = ISO 7
    assert got[1].share_ppm == 750_000


# --- coverage gaps ---

def test_coverage_gaps_counts_missing_days(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.timeseries import coverage_gaps

    d0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", d0), ("u", d0), ("u", d0 + dt.timedelta(days=4)),
        ("v", d0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {r.k: r for r in coverage_gaps(df, ["k"], "ts").collect()}
    u = got["u"]
    assert u.n_active_days == 2 and u.span_days == 5 and u.n_missing == 3
    v = got["v"]
    assert v.span_days == 1 and v.n_missing == 0


# --- seasonal anomaly days ---

def test_seasonal_anomaly_same_weekday_baseline(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.timeseries import (
        seasonal_anomaly_days,
    )

    rows = []
    # Mondays (Jan 1, 8, 15): 10, 10, 40 events -> the 40 spikes
    for day, n in [(1, 10), (8, 10), (15, 40)]:
        rows += [("k", dt.datetime(2024, 1, day, 9))] * n
    # Sundays (Jan 7, 14): 2, 2 -> quiet baseline, NO false alarm
    for day in (7, 14):
        rows += [("k", dt.datetime(2024, 1, day, 9))] * 2
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {str(r.day): r for r in seasonal_anomaly_days(
        df, ["k"], "ts"
    ).collect()}
    assert got["2024-01-15"].spike == 1            # 40*3*2 > 3*60
    assert got["2024-01-01"].spike == 0
    assert got["2024-01-01"].dip == 0              # 10*3*2 > 60: no dip
    # Sundays at count 2 match their own baseline exactly: no alarms
    assert got["2024-01-07"].spike == 0 and got["2024-01-07"].dip == 0


def test_weighted_pagerank_zero_weight_edges_safe(spark):
    from salesforce_plugin_spark.functions.graph import pagerank_fixed

    # node 3's only out-edge has weight 0: must not divide by zero,
    # and 3 must still appear with its teleport share
    df = spark.createDataFrame(
        [(0, 1, 5), (1, 0, 5), (3, 0, 0)], "src long, dst long, w long"
    )
    r = {x.id: x for x in pagerank_fixed(
        df, iterations=1, symmetrize=False, weight_col="w"
    ).collect()}
    assert 3 in r and r[3].rank_scaled > 0
    assert r[0].rank_scaled > r[3].rank_scaled  # 0 receives real mass
