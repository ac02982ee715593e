"""Round-6 ADVICE fixes: NULL-safe keyset cursors, decimal overflow
discipline at the two flagged quadratic sites, random_projection size
guard, and specific-exception streaming state reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_keyset_page_null_sort_keys_reachable(spark):
    """Rows with NULL sort keys must be pageable: a cursor that lands
    among them (NULLS FIRST) resumes after the tuple instead of
    dropping the rest of the NULL-keyed rows forever."""
    from salesforce_plugin_spark.operators.transforms import keyset_page

    rows = [(None, k) for k in range(1, 6)] + [(d, 0) for d in (1, 2, 3)]
    df = spark.createDataFrame(rows, "d int, k int")
    # full ordering (NULLS FIRST on d, then k):
    # (N,1)(N,2)(N,3)(N,4)(N,5)(1,0)(2,0)(3,0)
    seen = []
    cursor = None
    while True:
        page = keyset_page(df, ["d", "k"], cursor, 2).collect()
        if not page:
            break
        seen.extend([(r.d, r.k) for r in page])
        cursor = [page[-1].d, page[-1].k]
    assert seen == [
        (None, 1), (None, 2), (None, 3), (None, 4), (None, 5),
        (1, 0), (2, 0), (3, 0),
    ]
    # no duplicates either
    assert len(seen) == len(set(seen))


def test_keyset_page_null_cursor_mid_column(spark):
    """A NULL in a non-terminal cursor position: equality arm must be
    null-safe so deeper columns still discriminate."""
    from salesforce_plugin_spark.operators.transforms import keyset_page

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (5, 1)], "a int, b int"
    )
    page = keyset_page(df, ["a", "b"], [None, 1], 10).collect()
    assert [(r.a, r.b) for r in page] == [(None, 2), (5, 1)]


def test_token_gini_large_doc_no_overflow(spark):
    """(n² − Σc²)·10⁶ must survive n ≈ 4M tokens (BIGINT form
    overflows past ~3M under ANSI)."""
    from salesforce_plugin_spark.functions.text import token_gini

    n = 4_000_000
    # n copies of one token: gini = 0 exactly, numerator (n²−n²)·10⁶=0
    # but n²·10⁶ intermediate in the old BIGINT form blew past 2^63.
    # Build the 16 MB doc with repeat() (one string fill) instead of
    # materializing a 4M-element array and concat_ws-ing it — same text
    # after trim, ~40 s faster; tokens() trims, so the tail space drops.
    df = spark.range(1).select(
        F.lit(1).alias("doc_id"),
        F.repeat(F.lit("tok "), n).alias("text"),
    )
    row = token_gini(df, "doc_id", "text").collect()[0]
    assert row.n_tokens == n
    assert row.n_distinct == 1
    assert row.gini_ppm == 0

    # two distinct tokens, 2M each: gini = (n² − 2·(n/2)²)/n² = 1/2
    half = n // 2
    df2 = spark.range(1).select(
        F.lit(2).alias("doc_id"),
        F.concat(
            F.repeat(F.lit("a "), half), F.repeat(F.lit("b "), half)
        ).alias("text"),
    )
    row2 = token_gini(df2, "doc_id", "text").collect()[0]
    assert row2.gini_ppm == 500_000


def test_leadlag_dot_decimal_no_overflow(spark):
    """Daily-count products beyond 2^63 must not overflow: two days at
    ~3.1e9 simulated via pre-aggregated... (exercise through the API
    with moderate counts and verify exact dot; overflow path verified
    by the decimal cast in the plan)."""
    from salesforce_plugin_spark.operators.analytics import (
        leadlag_correlation,
    )

    rows = (
        [("2024-01-01 00:00:00", "a")] * 7
        + [("2024-01-02 00:00:00", "a")] * 3
        + [("2024-01-01 00:00:00", "b")] * 2
        + [("2024-01-02 00:00:00", "b")] * 5
    )
    df = spark.createDataFrame(rows, "ts string, et string").select(
        F.col("ts").cast("timestamp").alias("ts"), "et"
    )
    out = {
        r.lag: (r.dot, r.n_days)
        for r in leadlag_correlation(df, "ts", "et", "a", "b", 1).collect()
    }
    # lag 0: 7*2 + 3*5 = 29 over 2 days
    assert out[0] == (29, 2)
    # lag +1: cA(d)*cB(d+1) → 7*5 = 35 on one day
    assert out[1] == (35, 1)
    # lag -1: cA(d)*cB(d-1) → 3*2 = 6 on one day
    assert out[-1] == (6, 1)
    # the plan must route the product through decimal(38,0)
    plan = leadlag_correlation(
        df, "ts", "et", "a", "b", 1
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "decimal(38,0)" in plan


def test_random_projection_dims_mismatch_raises(spark):
    from salesforce_plugin_spark.functions.vector import random_projection

    ok = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "id int, v array<double>"
    )
    out = random_projection(ok, "id", "v", n_components=2, dims=4)
    assert out.count() == 2  # exploded components

    bad = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "id int, v array<double>"
    )
    with pytest.raises(Exception, match="random_projection"):
        random_projection(bad, "id", "v", n_components=2, dims=4).collect()


def test_stream_state_read_errors_propagate(spark, tmp_path):
    """A CORRUPT state dir must raise, not silently reinitialize."""
    from salesforce_plugin_spark.streaming.upsert import (
        run_stream_cusum,
        run_stream_interarrival,
    )

    src = tmp_path / "src"
    src.mkdir()
    (tmp_path / "ia_state").mkdir()
    # a non-parquet file inside the state dir → read fails with a
    # non-AnalysisException error at execution time OR an
    # AnalysisException at schema inference; either way it must not be
    # swallowed as "first batch" when the dir exists but is garbage
    (tmp_path / "ia_state" / "part-000.parquet").write_bytes(b"not parquet")

    import json

    (src / "b1.json").write_text(
        "\n".join(
            json.dumps({"k": "x", "ts": "2024-01-01T00:00:0%d" % i})
            for i in range(3)
        )
    )
    stream = spark.readStream.schema("k string, ts timestamp").json(
        str(src)
    )
    # the run_stream_* helpers drain availableNow and await internally,
    # so the corrupt-state failure surfaces from the call itself
    with pytest.raises(Exception):
        run_stream_interarrival(
            stream,
            str(tmp_path / "ia_state"),
            str(tmp_path / "ia_ckpt"),
            ["k"],
            "ts",
        )
    # cusum path sanity: with NO state dir at all, the
    # AnalysisException first-batch branch still initializes cleanly
    run_stream_cusum(
        spark.readStream.schema("k string, ts timestamp")
        .json(str(src))
        .withColumn("v", F.lit(1).cast("long")),
        str(tmp_path / "cu_out"),
        str(tmp_path / "cu_state"),
        str(tmp_path / "cu_ckpt"),
        ["k"],
        "ts",
        "v",
        target=0,
        slack=0,
        threshold=100,
    )
    state = spark.read.parquet(str(tmp_path / "cu_state"))
    assert state.count() == 1


def test_lcs_pairs_exact_length(spark):
    """lcs_len equals the true longest common substring for runs of
    consecutive matching grams on one diagonal."""
    from salesforce_plugin_spark.functions.dedup import lcs_pairs

    shared = "abcdefghijklmnopqrstuvwxyz"  # 26 chars shared
    rows = [
        (1, "XX" + shared + "YYYYY"),
        (2, "QQQQ" + shared + "ZZ"),
        (3, "no overlap here at all with anyone 123456"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {(r.id_a, r.id_b): r for r in lcs_pairs(
        df, "doc_id", "text", gram_len=10, min_df=2, max_df=10
    ).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # 26-char shared substring with L=10 → run of 17 grams → 17+9=26
    assert r.lcs_len == 26
    assert r.n_matches == 17


def test_lcs_pairs_multiple_diagonals_takes_max(spark):
    from salesforce_plugin_spark.functions.dedup import lcs_pairs

    # two shared substrings of different lengths at different offsets
    long_s = "0123456789ABCDEFGHIJ"     # 20 chars
    short_s = "zyxwvutsrqpo"            # 12 chars
    rows = [
        (1, long_s + "----" + short_s),
        (2, "##" + short_s + "####" + long_s),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    r = lcs_pairs(df, "doc_id", "text", gram_len=10, min_df=2,
                  max_df=10).collect()[0]
    assert r.lcs_len == 20  # the longer of the two


def test_rerank_interaction_scores_and_coverage(spark):
    import math

    from salesforce_plugin_spark.functions.ir import rerank_interaction

    corpus = spark.createDataFrame(
        [
            (1, "key key key value"),
            (2, "row row index"),
            (3, "nothing relevant"),
            (4, "key row"),
        ],
        "doc_id int, text string",
    )
    cands = spark.createDataFrame([(1,), (2,), (3,)], "doc_id int")
    out = {r.doc_id: r for r in rerank_interaction(
        corpus, cands, "doc_id", "text", terms=["key", "row"]
    ).collect()}
    # corpus stats: N=4; df(key)=2 (docs 1,4), df(row)=2 (docs 2,4)
    # idf_scaled = (2*4-2*2+1)*10000 // (2*2+1) = 5*10000//5 = 10000
    # doc 1: tf(key)=3 → sat = 3000//4 = 750 → 10000*750 = 7_500_000
    assert out[1].n_hit == 1 and out[1].rerank_scaled == 7_500_000
    # doc 2: tf(row)=2 → sat = 2000//3 = 666 → 6_660_000
    assert out[2].n_hit == 1 and out[2].rerank_scaled == 6_660_000
    # doc 3: no hits, still present with 0
    assert out[3].n_hit == 0 and out[3].rerank_scaled == 0
    assert out[1].rerank == 1 and out[2].rerank == 2 and out[3].rerank == 3


def test_self_repetition_suffix_tree_semantics(spark):
    """Longest internal repeat with overlaps: 'ababab' has 'abab'
    repeated at offsets 0 and 2 (overlapping) → max_rep_len 4."""
    from salesforce_plugin_spark.functions.dedup import self_repetition

    rows = [
        (1, "ababab"),
        (2, "abcdefgh"),          # no repeat of length >= 2
        (3, "xx--xx--xx"),        # 'xx--xx' repeats at 0 and 4 → len 6
        (4, "a"),                 # shorter than gram_len
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in self_repetition(
        df, "doc_id", "text", gram_len=2
    ).collect()}
    assert out[1].max_rep_len == 4
    assert out[2].max_rep_len == 0 and out[2].n_rep_grams == 0
    assert out[3].max_rep_len == 6
    assert out[4].max_rep_len == 0
    assert len(out) == 4  # every doc surfaces a row


def test_mmr_select_diversifies(spark):
    """MMR must skip a near-duplicate of the first pick in favor of a
    diverse candidate; plain top-k would take the duplicate."""
    from salesforce_plugin_spark.functions.vector import mmr_select

    rows = [
        (0, [1.0, 0.0, 0.0]),    # query
        (1, [0.99, 0.14, 0.0]),  # best hit
        (2, [0.98, 0.17, 0.0]),  # near-dup of 1
        (3, [0.7, 0.0, 0.71]),   # diverse, lower relevance
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    import pyspark.sql.functions as F
    q = df.filter(F.col("vec_id") == 0).select("embedding")
    cand = df.filter(F.col("vec_id") != 0)
    # λ = 1/2: the near-dup's penalty (sim≈0.999 to pick 1) outweighs
    # its relevance edge over the diverse candidate
    out = {r.pick: r.vec_id for r in mmr_select(
        cand, "vec_id", "embedding", q, k=3, pool_n=3,
        lam_num=1, lam_den=2,
    ).collect()}
    assert out[1] == 1          # relevance argmax
    assert out[2] == 3          # diversity beats the near-dup
    assert out[3] == 2
    # at λ = 1 (no penalty) MMR degenerates to plain top-k order
    topk = {r.pick: r.vec_id for r in mmr_select(
        cand, "vec_id", "embedding", q, k=3, pool_n=3,
        lam_num=1, lam_den=1,
    ).collect()}
    assert topk == {1: 1, 2: 2, 3: 3}


def test_minhash_error_eval_exact_bounds(spark):
    """Identical docs estimate ppm=10⁶ with zero error; disjoint docs
    never pair. The estimator is exact at J=1 regardless of hashes."""
    from salesforce_plugin_spark.functions.dedup import minhash_error_eval

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # identical to 1
        (3, "one two three four five six seven"),      # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {(r.id_a, r.id_b): r for r in minhash_error_eval(
        df, "doc_id", "text", num_hashes=8, shingle_n=3,
        min_true_ppm=100_000,
    ).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r.true_ppm == 1_000_000
    assert r.est_ppm == 1_000_000
    assert r.err_ppm == 0


def test_theil_sen_resists_outlier_day(spark):
    """One corrupted day must not move the Theil–Sen slope (it would
    drag an OLS fit): counts 1,2,3,4,100 over days 0-4 still yield a
    median pairwise slope of ~1/day."""
    from salesforce_plugin_spark.operators.analytics import theil_sen_trend

    rows = []
    counts = {0: 1, 1: 2, 2: 3, 3: 4, 4: 100}
    for day, n in counts.items():
        for i in range(n):
            rows.append(("e", f"2024-01-0{day + 1} 00:00:{i % 60:02d}"))
    df = spark.createDataFrame(rows, "event_type string, ts string").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    r = theil_sen_trend(df, "event_type", "ts").collect()[0]
    assert r.n_days == 5
    assert r.n_pairs == 10
    # pairwise slopes: six 1.0s among the clean points, four inflated
    # by day 4; sorted, the lower median (position 5) is 1.0/day
    assert r.slope_ppm == 1_000_000


def test_temperature_mix_flattens_distribution(spark):
    """τ=2 must upsample the small source (boost > 10⁶) and downsample
    the dominant one; τ=1 is the natural distribution (boost = 10⁶)."""
    from salesforce_plugin_spark.operators.pipeline import temperature_mix

    rows = [(i, "en", "w " * 100) for i in range(9)] + [(9, "fr", "w " * 10)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    t2 = {r.lang: r for r in temperature_mix(df, "lang", "text", tau=2).collect()}
    # en: 900 tokens → isqrt 30; fr: 10 tokens → isqrt 3 (isqrt(10)=3)
    assert t2["en"].w == 30 and t2["fr"].w == 3
    assert t2["fr"].boost_ppm > 1_000_000 > t2["en"].boost_ppm
    t1 = {r.lang: r for r in temperature_mix(df, "lang", "text", tau=1).collect()}
    assert t1["en"].boost_ppm == 1_000_000 == t1["fr"].boost_ppm
    with pytest.raises(ValueError):
        temperature_mix(df, "lang", "text", tau=3)


def test_hard_negatives_excludes_own_label(spark):
    from salesforce_plugin_spark.functions.vector import hard_negatives

    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.99, 0.1]),   # same label as anchor 0 — excluded
        (2, 1, [0.95, 0.3]),   # different label, close → hard negative
        (3, 1, [0.0, 1.0]),    # different label, far
    ]
    df = spark.createDataFrame(rows, "vec_id int, label int, embedding array<float>")
    out = [r for r in hard_negatives(
        df, "vec_id", "embedding", "label", k=2
    ).collect() if r.q_label == 0]
    assert [r.vec_id for r in sorted(out, key=lambda r: r.rank)] == [2, 3]
    assert all(r.label != 0 for r in out)


def test_ppr_concentrates_near_seeds(spark):
    """Seeded restart must rank the seed and its neighbors above a
    disconnected far component; uniform PageRank would tie them."""
    from salesforce_plugin_spark.functions.graph import ppr_fixed

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    r = {row.id: row.rank_scaled for row in ppr_fixed(
        edges, seeds, iterations=3
    ).collect()}
    assert r[1] > r[10] and r[2] > r[11]
    # far component gets NO mass (teleport never lands there)
    assert r[10] == 0 and r[11] == 0 and r[12] == 0


def test_cm_error_never_undercounts(spark):
    from salesforce_plugin_spark.functions.sketch import cm_error_eval

    rows = [(i % 7,) for i in range(200)]
    df = spark.createDataFrame(rows, "v int")
    out = cm_error_eval(df, "v", width=4, depth=2).collect()
    assert len(out) == 7
    assert all(r.overcount >= 0 for r in out)          # CM upper bound
    assert all(r.est_n == r.true_n + r.overcount for r in out)
    # tiny width forces at least one collision among 7 values / 4 buckets
    assert any(r.overcount > 0 for r in out)


def test_stratified_sample_largest_remainder_exact(spark):
    """Allocation must sum EXACTLY to total_n with ±1 proportionality:
    strata 50/30/20 rows at total_n=7 → quotas 3.5/2.1/1.4 → floors
    3/2/1 + one leftover to the largest remainder (.5 → stratum a)."""
    from salesforce_plugin_spark.operators.pipeline import stratified_sample

    rows = (
        [(i, "a") for i in range(50)]
        + [(100 + i, "b") for i in range(30)]
        + [(200 + i, "c") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    out = stratified_sample(df, "doc_id", "lang", total_n=7).collect()
    per = {}
    for r in out:
        per[r.lang] = per.get(r.lang, 0) + 1
    assert sum(per.values()) == 7
    assert per == {"a": 4, "b": 2, "c": 1}
    # determinism: same input → identical selection
    again = stratified_sample(df, "doc_id", "lang", total_n=7).collect()
    assert sorted((r.doc_id, r.lang) for r in out) == sorted(
        (r.doc_id, r.lang) for r in again
    )
