"""SCD2 intervals, funnel, cohort retention, KMV sketch, interval-overlap
join: unit semantics on hand-built inputs (the sf0.01 differential gate
covers the fixture-scale behavior)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from salesforce_plugin_spark.functions.sketch import kmv_distinct
from salesforce_plugin_spark.operators.analytics import cohort_retention, funnel
from salesforce_plugin_spark.operators.joins import interval_overlap_join
from salesforce_plugin_spark.operators.scd import scd2_intervals

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


# --- SCD2 ---

def test_scd2_collapses_runs_and_marks_current(spark):
    feed = spark.createDataFrame(
        [
            (1, "a", ts(0), 100),
            (1, "a", ts(10), 101),   # same state → same interval
            (1, "b", ts(20), 102),   # change
            (1, "a", ts(30), 103),   # change back → NEW interval (not merged)
            (2, "x", ts(5), 104),
        ],
        "k int, attr string, ts timestamp, chg_id int",
    )
    out = scd2_intervals(feed, ["k"], ["attr"], "ts", ["chg_id"])
    rows = sorted(out.collect(), key=lambda r: (r.k, r["__valid_from"]))
    assert [(r.k, r.attr) for r in rows] == [(1, "a"), (1, "b"), (1, "a"), (2, "x")]
    assert rows[0]["__valid_from"] == ts(0) and rows[0]["__valid_to"] == ts(20)
    assert rows[1]["__valid_to"] == ts(30)
    assert rows[2]["__valid_to"] is None and rows[2]["__is_current"]
    assert rows[3]["__is_current"]


def test_scd2_null_transitions_are_changes(spark):
    feed = spark.createDataFrame(
        [(1, "a", ts(0), 1), (1, None, ts(10), 2), (1, None, ts(20), 3),
         (1, "a", ts(30), 4)],
        "k int, attr string, ts timestamp, chg_id int",
    )
    out = scd2_intervals(feed, ["k"], ["attr"], "ts", ["chg_id"]).collect()
    # a → NULL → a: three intervals, the NULL run collapsed to one
    assert sorted(
        ((r["__valid_from"], r.attr) for r in out)
    ) == [(ts(0), "a"), (ts(10), None), (ts(30), "a")]


def test_scd2_single_shuffle_plan(spark):
    feed = spark.createDataFrame(
        [(1, "a", ts(0), 1)], "k int, attr string, ts timestamp, chg_id int"
    )
    plan = (
        scd2_intervals(feed, ["k"], ["attr"], "ts", ["chg_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the lead() window must reuse the lag() window's exchange
    assert plan.count("Exchange") == 1


# --- SCD2 incremental apply ---

def _iv_key(r):
    return (r.k, r["__valid_from"], r["__valid_to"], r.attr, r["__is_current"])


def test_scd2_apply_matches_full_rebuild(spark):
    from salesforce_plugin_spark.operators.scd import scd2_apply_changes

    schema = "k int, attr string, ts timestamp, chg_id int"
    old = [
        (1, "a", ts(0), 1), (1, "a", ts(10), 2), (1, "b", ts(20), 3),
        (2, "x", ts(5), 4),
        (3, "p", ts(7), 5),
    ]
    new = [
        (1, "b", ts(40), 6),   # no change → absorbed into open interval
        (1, "c", ts(50), 7),   # change → closes the open interval
        (3, "q", ts(60), 8),   # change for key 3
        (4, "n", ts(45), 9),   # brand-new key
    ]
    initial = scd2_intervals(
        spark.createDataFrame(old, schema), ["k"], ["attr"], "ts", ["chg_id"]
    )
    merged = scd2_apply_changes(
        initial, spark.createDataFrame(new, schema),
        ["k"], ["attr"], "ts", ["chg_id"],
    )
    full = scd2_intervals(
        spark.createDataFrame(old + new, schema),
        ["k"], ["attr"], "ts", ["chg_id"],
    )
    assert sorted(map(_iv_key, merged.collect())) == sorted(
        map(_iv_key, full.collect())
    )


def test_scd2_apply_leaves_untouched_keys_intact(spark):
    from salesforce_plugin_spark.operators.scd import scd2_apply_changes

    schema = "k int, attr string, ts timestamp, chg_id int"
    initial = scd2_intervals(
        spark.createDataFrame(
            [(1, "a", ts(0), 1), (2, "x", ts(0), 2), (2, "y", ts(10), 3)],
            schema,
        ),
        ["k"], ["attr"], "ts", ["chg_id"],
    )
    merged = scd2_apply_changes(
        initial,
        spark.createDataFrame([(1, "b", ts(20), 4)], schema),
        ["k"], ["attr"], "ts", ["chg_id"],
    )
    key2 = sorted(
        map(_iv_key, merged.filter(F.col("k") == 2).collect())
    )
    orig2 = sorted(
        map(_iv_key, initial.filter(F.col("k") == 2).collect())
    )
    assert key2 == orig2
    # key 1's open interval closed at the batch row
    k1 = sorted(map(_iv_key, merged.filter(F.col("k") == 1).collect()))
    assert [r[3] for r in k1] == ["a", "b"]
    assert k1[0][2] == ts(20) and k1[1][4] is True


# --- funnel ---

def _events(spark, rows):
    return spark.createDataFrame(rows, "u int, ts timestamp, et string")


def test_funnel_ordered_stages(spark):
    e = _events(
        spark,
        [
            (1, ts(0), "view"), (1, ts(5), "click"), (1, ts(9), "buy"),
            # user 2: click BEFORE the first view → not funnel progress
            (2, ts(0), "click"), (2, ts(5), "view"),
            # user 3 never views → absent entirely
            (3, ts(0), "buy"),
        ],
    )
    out = {r.u: r for r in funnel(e, "u", "ts", "et", ["view", "click", "buy"]).collect()}
    assert set(out) == {1, 2}
    assert out[1].depth == 3 and out[1].t_buy == ts(9)
    assert out[2].depth == 1 and out[2].t_click is None and out[2].t_buy is None


def test_funnel_equal_ts_counts(spark):
    e = _events(spark, [(1, ts(0), "view"), (1, ts(0), "click")])
    out = funnel(e, "u", "ts", "et", ["view", "click"]).collect()[0]
    assert out.depth == 2          # at-or-after: equal timestamps qualify


def test_funnel_requires_stages(spark):
    with pytest.raises(ValueError):
        funnel(_events(spark, [(1, ts(0), "v")]), "u", "ts", "et", [])


# --- retention ---

def test_cohort_retention_counts(spark):
    day = 24 * 60
    e = _events(
        spark,
        [
            (1, ts(0), "x"), (1, ts(day), "x"), (1, ts(2 * day), "x"),
            (2, ts(0), "x"), (2, ts(2 * day), "x"),
            (3, ts(day), "x"),                      # later cohort
        ],
    )
    out = {
        (r.cohort, r.period_offset): r.n_users
        for r in cohort_retention(e, "u", "ts", period="day").collect()
    }
    d0 = T0.date()
    d1 = (T0 + dt.timedelta(days=1)).date()
    assert out[(d0, 0)] == 2 and out[(d0, 1)] == 1 and out[(d0, 2)] == 2
    assert out[(d1, 0)] == 1


def test_cohort_retention_rejects_unknown_period(spark):
    with pytest.raises(ValueError):
        cohort_retention(_events(spark, [(1, ts(0), "x")]), "u", "ts", "month")


# --- KMV ---

def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(str(i),) for i in range(10)], "v string")
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row.n_kept == 10 and row.est_distinct == 10


def test_kmv_estimate_within_error(spark):
    n = 2000
    df = spark.createDataFrame([(str(i),) for i in range(n)], "v string")
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row.n_kept == 256
    # std err ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row.est_distinct - n) / n < 0.25


def test_kmv_duplicates_do_not_inflate(spark):
    df = spark.createDataFrame([(str(i % 50),) for i in range(5000)], "v string")
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row.est_distinct == 50          # exact: only 50 distinct hashes


def test_kmv_rejects_tiny_k(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", k=1)


def test_kmv_setops_exact_below_k(spark):
    from salesforce_plugin_spark.functions.sketch import kmv_set_ops

    a = spark.createDataFrame([(str(i),) for i in range(20)], "v string")
    b = spark.createDataFrame([(str(i),) for i in range(10, 30)], "v string")
    row = kmv_set_ops(a, b, "v", k=64).collect()[0]
    # below k the sketch holds the full union: every stat is exact
    assert row.n_kept == 30 and row.union_est == 30
    assert row.n_both == 10 and row.inter_est == 10
    assert row.jaccard_permille == 1000 * 10 // 30


def test_kmv_setops_disjoint_and_identical(spark):
    from salesforce_plugin_spark.functions.sketch import kmv_set_ops

    a = spark.createDataFrame([(str(i),) for i in range(15)], "v string")
    b = spark.createDataFrame([(str(i),) for i in range(100, 115)], "v string")
    row = kmv_set_ops(a, b, "v", k=64).collect()[0]
    assert row.n_both == 0 and row.inter_est == 0 and row.jaccard_permille == 0
    same = kmv_set_ops(a, a, "v", k=64).collect()[0]
    assert same.jaccard_permille == 1000 and same.inter_est == same.union_est


def test_kmv_setops_estimate_within_error(spark):
    from salesforce_plugin_spark.functions.sketch import kmv_set_ops

    # |A|=3000, |B|=3000, |A∩B|=1000, |A∪B|=5000
    a = spark.createDataFrame([(str(i),) for i in range(3000)], "v string")
    b = spark.createDataFrame([(str(i),) for i in range(2000, 5000)], "v string")
    row = kmv_set_ops(a, b, "v", k=256).collect()[0]
    assert row.n_kept == 256
    assert abs(row.union_est - 5000) / 5000 < 0.25
    assert abs(row.inter_est - 1000) / 1000 < 0.5  # ratio estimator is noisier


def test_kmv_setops_rejects_tiny_k(spark):
    from salesforce_plugin_spark.functions.sketch import kmv_set_ops

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        kmv_set_ops(df, df, "v", k=1)


# --- interval overlap join ---

def test_interval_overlap_matches_naive(spark):
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [
            (i, rng.randrange(3), ts(s := rng.randrange(0, 300)), ts(s + rng.randrange(1, 90)))
            for i in range(40)
        ],
        "lid int, k int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (i, rng.randrange(3), ts(s := rng.randrange(0, 300)), ts(s + rng.randrange(1, 90)))
            for i in range(40)
        ],
        "rid int, k int, rs timestamp, re timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_width=600, extra_keys=["k"]
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.join(right, "k")
        .filter((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    assert got == naive and len(got) > 0


def test_interval_overlap_emits_each_pair_once(spark):
    # two long intervals sharing many buckets must still pair exactly once
    left = spark.createDataFrame([(1, ts(0), ts(600))], "lid int, ls timestamp, le timestamp")
    right = spark.createDataFrame([(2, ts(10), ts(590))], "rid int, rs timestamp, re timestamp")
    out = interval_overlap_join(left, right, "ls", "le", "rs", "re", bucket_width=60).collect()
    assert len(out) == 1


# --- span dedup (Lee et al. shape) ---

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_dedup_removes_later_occurrences(spark):
    from salesforce_plugin_spark.functions.dedup import span_dedup

    span = "a b c d"  # 4-token span, span_tokens=4
    docs = _docs(
        spark,
        [
            (1, f"{span} tail1 tail2"),
            (2, f"head1 head2 {span}"),   # later occurrence → removed
            (3, "x y z w v"),             # untouched
        ],
    )
    out = {r.doc_id: r for r in span_dedup(docs, span_tokens=4).collect()}
    assert out[1].cleaned == "a b c d tail1 tail2" and out[1].n_removed == 0
    assert out[2].cleaned == "head1 head2" and out[2].n_removed == 4
    assert out[3].cleaned == "x y z w v" and out[3].n_removed == 0


def test_span_dedup_overlapping_spans_merge(spark):
    from salesforce_plugin_spark.functions.dedup import span_dedup

    # 5-token duplicated region with span_tokens=4 → two overlapping
    # flagged shingles chain into one maximal removed region
    region = "p q r s t"
    docs = _docs(spark, [(1, f"{region} u"), (2, f"z {region} z2")])
    out = {r.doc_id: r for r in span_dedup(docs, span_tokens=4).collect()}
    assert out[1].n_removed == 0
    assert out[2].cleaned == "z z2" and out[2].n_removed == 5


def test_span_dedup_short_docs_pass_through(spark):
    from salesforce_plugin_spark.functions.dedup import span_dedup

    docs = _docs(spark, [(1, "  only   three  tokens "), (2, "only three tokens")])
    out = {r.doc_id: r for r in span_dedup(docs, span_tokens=8).collect()}
    # below span length: never flagged even though identical; whitespace
    # normalized on rebuild
    assert out[1].cleaned == "only three tokens"
    assert out[2].cleaned == "only three tokens"


def test_span_dedup_within_doc_duplicates(spark):
    from salesforce_plugin_spark.functions.dedup import span_dedup

    docs = _docs(spark, [(1, "a b c a b c")])  # span_tokens=3: "a b c" twice
    out = span_dedup(docs, span_tokens=3).collect()[0]
    assert out.cleaned == "a b c" and out.n_removed == 3


# --- CDC merge ---

def test_apply_changes_upsert_delete_latest_wins(spark):
    from salesforce_plugin_spark.operators.merge import apply_changes

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "u", 1),
            (2, "b3", 22.0, "u", 2),     # later → wins
            (3, "c", 30.0, "d", 1),      # delete existing
            (4, "d", 40.0, "u", 1),      # insert
            (5, "e", 50.0, "d", 1),      # delete absent → no-op
        ],
        "k int, s string, v double, op string, seq int",
    )
    out = {
        r.k: r
        for r in apply_changes(snap, changes, ["k"], ["seq"], "op").collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1].s == "a" and out[1].v == 10.0      # untouched passthrough
    assert out[2].s == "b3" and out[2].v == 22.0     # latest change wins
    assert out[4].s == "d"                           # upsert-insert


def test_apply_changes_delete_then_reinsert(spark):
    from salesforce_plugin_spark.operators.merge import apply_changes

    snap = spark.createDataFrame([(1, 1.0)], "k int, v double")
    changes = spark.createDataFrame(
        [(1, 0.0, "d", 1), (1, 9.0, "u", 2)], "k int, v double, op string, seq int"
    )
    out = apply_changes(snap, changes, ["k"], ["seq"], "op").collect()
    assert len(out) == 1 and out[0].v == 9.0         # later upsert overrides delete


# --- binned quantiles ---

def test_binned_quantiles_exact_bins(spark):
    from salesforce_plugin_spark.functions.sketch import binned_quantiles

    # 100 values 0.5..99.5 over [0,100) with 100 bins → bin i has 1 value
    df = spark.createDataFrame([(i + 0.5,) for i in range(100)], "v double")
    out = {
        r.q: r
        for r in binned_quantiles(df, "v", [0.5, 0.99], 0.0, 100.0, 100).collect()
    }
    # ceil(0.5*100)=50 → bin 49, upper edge 50.0
    assert out[0.5].bin == 49 and out[0.5].est == 50.0
    assert out[0.99].bin == 98 and out[0.99].est == 99.0
    assert out[0.5].n_total == 100


def test_binned_quantiles_clamps_outliers(spark):
    from salesforce_plugin_spark.functions.sketch import binned_quantiles

    df = spark.createDataFrame([(-5.0,), (0.5,), (999.0,)], "v double")
    out = {r.q: r for r in binned_quantiles(df, "v", [0.5, 1.0], 0.0, 10.0, 10).collect()}
    assert out[0.5].bin == 0          # -5 clamps into bin 0
    assert out[1.0].bin == 9          # 999 clamps into the last bin


def test_binned_quantiles_validates_args(spark):
    from salesforce_plugin_spark.functions.sketch import binned_quantiles

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        binned_quantiles(df, "v", [], 0.0, 1.0)
    with pytest.raises(ValueError):
        binned_quantiles(df, "v", [0.5], 5.0, 5.0)


# --- BM25 ---

def test_bm25_rewards_tf_and_rarity(spark):
    from salesforce_plugin_spark.functions.ir import bm25_scores

    docs = _docs(
        spark,
        [
            (1, "apple apple apple pear pear plum plum plum"),
            (2, "apple pear pear plum plum plum plum plum"),
            (3, "plum plum plum plum plum plum plum plum"),   # no apple/pear
            (4, "kiwi apple plum plum plum plum plum plum"),  # kiwi: df=1
        ],
    )
    out = {r.doc_id: r for r in bm25_scores(docs, "doc_id", "text", ["apple", "kiwi"]).collect()}
    assert set(out) == {1, 2, 4}              # doc 3 matches nothing
    assert out[1].score > out[2].score        # tf(apple)=3 beats tf=1 (equal dl)
    # kiwi (df=1) outweighs apple (df=3) at equal tf and dl
    assert out[4].score > out[2].score
    assert out[1].n_terms == 1 and out[4].n_terms == 2


def test_bm25_score_is_exact_sum_of_scaled_parts(spark):
    from salesforce_plugin_spark.functions.ir import bm25_scores

    docs = _docs(spark, [(1, "a b c"), (2, "a a b")])
    out = bm25_scores(docs, "doc_id", "text", ["a", "b", "c"]).collect()
    for r in out:
        assert r.score == r.score_scaled / 10**6


def test_bm25_requires_terms(spark):
    from salesforce_plugin_spark.functions.ir import bm25_scores

    with pytest.raises(ValueError):
        bm25_scores(_docs(spark, [(1, "x")]), "doc_id", "text", [])


def test_funnel_conversion_window(spark):
    from salesforce_plugin_spark.operators.analytics import funnel

    e = _events(
        spark,
        [
            (1, ts(0), "view"), (1, ts(30), "click"),   # within 1 hour
            (2, ts(0), "view"), (2, ts(90), "click"),   # beyond 1 hour
        ],
    )
    out = {r.u: r for r in funnel(e, "u", "ts", "et", ["view", "click"], within="1 hour").collect()}
    assert out[1].depth == 2
    assert out[2].depth == 1 and out[2].t_click is None


# --- URL normalization / dedup ---

def test_url_normalize_chain(spark):
    from salesforce_plugin_spark.functions.web import url_normalize

    cases = [
        ("https://WWW.Example.com/Path/?utm_source=f#top", "example.com/path"),
        ("http://example.com/x?id=3&utm_medium=m&b=2", "example.com/x?id=3&b=2"),
        ("example.com/x?utm_campaign=z&gclid=abc", "example.com/x"),
        ("https://example.com/x?id=3&fbclid=y", "example.com/x?id=3"),
        ("  https://example.com/  ", "example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(url_normalize("url")).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_keeps_first_and_counts(spark):
    from salesforce_plugin_spark.functions.web import url_dedup

    df = spark.createDataFrame(
        [
            (3, "https://www.a.com/p?utm_source=x"),
            (1, "http://a.com/p/"),
            (2, "https://b.com/q"),
        ],
        "id long, url string",
    )
    out = {r.url_norm: r for r in url_dedup(df, "id", "url").collect()}
    assert out["a.com/p"].id == 1 and out["a.com/p"].n_dups == 2
    assert out["b.com/q"].n_dups == 1


# --- PageRank ---

def test_pagerank_star_center_dominates(spark):
    from salesforce_plugin_spark.functions.graph import pagerank_fixed

    # star: 0 at the center of 1..5
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    out = {r.id: r for r in pagerank_fixed(edges, iterations=3).collect()}
    assert out[0].rank > out[1].rank
    leaf_ranks = {out[i].rank_scaled for i in range(1, 6)}
    assert len(leaf_ranks) == 1            # symmetric leaves tie exactly


def test_pagerank_mass_approximately_conserved(spark):
    from salesforce_plugin_spark.functions.graph import pagerank_fixed

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], "src long, dst long"
    )
    rows = pagerank_fixed(edges, iterations=3, scale=10**12).collect()
    total = sum(r.rank_scaled for r in rows)
    # floor quantization only ever loses mass, and loses very little
    assert 0.999 * 10**12 < total <= 10**12


def test_pagerank_validates_iterations(spark):
    from salesforce_plugin_spark.functions.graph import pagerank_fixed

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_fixed(edges, iterations=0)


# --- streaming KMV ---

def test_streaming_kmv_merges_across_batches(spark, tmp_path):
    from salesforce_plugin_spark.functions.dedup import portable_hash32
    from salesforce_plugin_spark.functions.sketch import kmv_distinct
    from salesforce_plugin_spark.streaming.stateful import running_kmv_distinct
    from salesforce_plugin_spark.streaming.windows import run_to_memory_sink

    src = str(tmp_path / "src")
    mk = lambda vals: spark.createDataFrame(  # noqa: E731
        [("a", str(v)) for v in vals], "event_type string, uid string"
    )
    # overlapping value sets across two files → two micro-batches whose
    # sketch states must merge order-insensitively
    mk(range(0, 120)).coalesce(1).write.mode("append").parquet(src)
    mk(range(60, 200)).coalesce(1).write.mode("append").parquet(src)

    raw = (
        spark.readStream.schema("event_type string, uid string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hashed = raw.select("event_type", portable_hash32(F.col("uid")).alias("__h"))
    sink = run_to_memory_sink(
        running_kmv_distinct(hashed, k=32),
        "t_test_kmv",
        mode="update",
    )
    final = (
        sink.orderBy(sink.n_seen.desc()).limit(1).collect()[0]
    )
    assert final.n_seen == 260

    batch = spark.createDataFrame(
        [(str(v),) for v in range(0, 200)], "uid string"
    )
    expect = kmv_distinct(batch, "uid", k=32).collect()[0]
    # streamed state == batch sketch over the union of both files
    assert final.n_kept == expect.n_kept
    assert final.kth_hash == expect.kth_hash
    assert final.est_distinct == expect.est_distinct


def test_streaming_kmv_rejects_tiny_k(spark):
    from salesforce_plugin_spark.streaming.stateful import running_kmv_distinct

    with pytest.raises(ValueError):
        running_kmv_distinct(None, k=1)


# --- z-order layout ---

def test_zorder_key_matches_reference_interleave(spark):
    from salesforce_plugin_spark.operators.partitioning import zorder_key

    def morton(x, y, bits=10):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(x, y) for x in range(0, 33, 7) for y in range(0, 33, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=10).alias("z")
    ).collect()
    for r in got:
        assert r.z == morton(r.x, r.y)


def test_zorder_key_validates_args(spark):
    from salesforce_plugin_spark.operators.partitioning import zorder_key

    with pytest.raises(ValueError):
        zorder_key([F.col("x")])
    with pytest.raises(ValueError):
        zorder_key([F.col("x")] * 4, bits=16)


def test_write_zordered_bounds_both_dims_per_file(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from salesforce_plugin_spark.operators.partitioning import write_zordered

    # 64x64 grid; z-ordered layout should give each file a bounded box in
    # BOTH x and y, so min/max footer stats prune on either column
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    out = str(tmp_path / "z")
    write_zordered(df, out, ["x", "y"], bits=6, num_files=8)

    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.read_metadata(f)
        mins = {"x": 1 << 30, "y": 1 << 30}
        maxs = {"x": -1, "y": -1}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name] = min(mins[name], col.statistics.min)
                    maxs[name] = max(maxs[name], col.statistics.max)
        if maxs["x"] >= 0:
            spans.append((maxs["x"] - mins["x"], maxs["y"] - mins["y"]))
    assert len(spans) > 1
    # every file bounds BOTH dimensions strictly tighter than the full 0-63
    # range on at least one axis, and the average box is far below full span
    avg_x = sum(s[0] for s in spans) / len(spans)
    avg_y = sum(s[1] for s in spans) / len(spans)
    assert avg_x < 50 and avg_y < 50


# --- session transitions ---

def test_session_transitions_reset_at_boundary(spark):
    from salesforce_plugin_spark.operators.analytics import session_transitions

    e = spark.createDataFrame(
        [
            (1, ts(0), "a", 1), (1, ts(1), "b", 2),      # a→b in session 1
            (1, ts(60), "c", 3), (1, ts(61), "a", 4),    # gap → c→a in session 2
            (2, ts(0), "b", 5), (2, ts(2), "b", 6),      # b→b
        ],
        "u int, ts timestamp, et string, eid int",
    )
    out = {
        (r.prev_type, r.next_type): r.n
        for r in session_transitions(
            e, "u", "ts", "et", gap_minutes=10, tiebreak_cols=["eid"]
        ).collect()
    }
    # b→c across the 59-min gap must NOT appear
    assert out == {("a", "b"): 1, ("c", "a"): 1, ("b", "b"): 1}


def test_session_transitions_gap_boundary_is_strict(spark):
    from salesforce_plugin_spark.operators.analytics import session_transitions

    e = spark.createDataFrame(
        [(1, ts(0), "a", 1), (1, ts(10), "b", 2), (1, ts(21), "c", 3)],
        "u int, ts timestamp, et string, eid int",
    )
    out = {
        (r.prev_type, r.next_type)
        for r in session_transitions(
            e, "u", "ts", "et", gap_minutes=10, tiebreak_cols=["eid"]
        ).collect()
    }
    # exactly-10-min gap stays in session (strict >); 11-min gap splits
    assert out == {("a", "b")}


def test_pagerank_directed_keeps_sink_nodes(spark):
    from salesforce_plugin_spark.functions.graph import pagerank_fixed

    # directed chain 0 -> 1 -> 2: node 2 is a pure sink and must still
    # appear (and accumulate inflow), node 0 keeps only the teleport base
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = {
        r.id: r for r in pagerank_fixed(edges, iterations=2, symmetrize=False).collect()
    }
    assert set(out) == {0, 1, 2}
    assert out[2].rank > out[0].rank


def test_encoding_repair_gate_roundtrips_on_fixtures(spark):
    # the differential gate would also pass if BOTH engines failed to
    # round-trip; pin the semantic claim itself
    from salesforce_plugin_spark.conformance import QUERIES

    rows = QUERIES["q_encoding_repair"](spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.roundtrip_ok for r in rows)
    assert any("â€" in r.corrupted for r in rows)   # damage genuinely present


# --- Gopher quality gate ---

def test_gopher_gate_bitmask_semantics(spark):
    from salesforce_plugin_spark.functions.text import gopher_quality

    docs = _docs(
        spark,
        [
            (1, "the quick brown foxes jumped over the lazy dogs and it was good today"),  # clean
            (2, "a b"),                              # too few tokens → bit 1
            (3, "!!! ??? ... !!! the and of it"),    # symbol-heavy → bit 8
            (4, "zz " * 30),                         # no stopwords → bit 16 (+len)
            (5, "1 2 3 4 5 6 7 8 9 10 11 12"),      # numeric → bits 16|32 (+4: mean len<3)
        ],
    )
    out = {
        r.doc_id: r
        for r in gopher_quality(docs, min_tokens=5).collect()
    }
    assert out[1].flags == 0 and out[1].passes
    assert out[2].flags & 1
    assert out[3].flags & 8
    assert out[4].flags & 16
    assert out[5].flags & 16 and out[5].flags & 32 and out[5].flags & 4
    assert not out[5].passes


# --- user growth / z-score outliers ---

def test_user_growth_accounts_new_active_cumulative(spark):
    from salesforce_plugin_spark.operators.analytics import user_growth

    e = _events(
        spark,
        [
            (1, ts(0), "a"), (2, ts(10), "a"),          # day 1: users 1,2 new
            (1, ts(1440), "a"),                          # day 2: 1 returns
            (3, ts(1500), "a"), (3, ts(1510), "a"),      # day 2: 3 new
        ],
    )
    out = {str(r.day): r for r in user_growth(e, "u", "ts").collect()}
    d1, d2 = sorted(out)
    assert out[d1].active_users == 2 and out[d1].new_users == 2
    assert out[d1].cum_users == 2
    assert out[d2].active_users == 2 and out[d2].new_users == 1
    assert out[d2].cum_users == 3


def test_zscore_outliers_flags_only_the_spike(spark):
    from salesforce_plugin_spark.operators.analytics import zscore_outliers

    rows = [(i, "g", 10.0) for i in range(20)] + [(99, "g", 1000.0)]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = {r.id: r.is_anomaly for r in zscore_outliers(df, "v", ["g"]).collect()}
    assert out[99] is True
    assert all(not out[i] for i in range(20))


def test_zscore_outliers_zero_variance_flags_nothing(spark):
    from salesforce_plugin_spark.operators.analytics import zscore_outliers

    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(5)], "id int, g string, v double"
    )
    out = zscore_outliers(df, "v", ["g"]).collect()
    assert all(not r.is_anomaly for r in out)


def test_zscore_outliers_fractional_k(spark):
    from salesforce_plugin_spark.operators.analytics import zscore_outliers

    # symmetric two-point distribution: every |z| = 1 exactly; k=1/2
    # flags all, k=3/2 flags none — the boundary never divides
    df = spark.createDataFrame(
        [(1, "g", 0.0), (2, "g", 10.0)], "id int, g string, v double"
    )
    low = zscore_outliers(df, "v", ["g"], k_num=1, k_den=2).collect()
    high = zscore_outliers(df, "v", ["g"], k_num=3, k_den=2).collect()
    assert all(r.is_anomaly for r in low)
    assert all(not r.is_anomaly for r in high)


# --- count-min sketch ---

def test_cm_estimate_never_undercounts(spark):
    from salesforce_plugin_spark.functions.sketch import cm_estimate, cm_sketch

    df = spark.createDataFrame(
        [(i % 20,) for i in range(2000)], "v long"
    )
    sk = cm_sketch(df, "v", width=64, depth=4)
    est = {
        r.value: r.est_n
        for r in cm_estimate(sk, df, "v", width=64, depth=4).collect()
    }
    assert set(est) == set(range(20))
    for v in range(20):
        assert est[v] >= 100  # true count; CM never undercounts


def test_cm_exact_when_collision_free(spark):
    from salesforce_plugin_spark.functions.sketch import cm_estimate, cm_sketch

    # 5 values in a 1024-wide grid: collisions in ALL 4 rows for some
    # value are (5/1024)^4-unlikely; with this fixed hash family they
    # don't occur, so every estimate is exact.
    df = spark.createDataFrame(
        [(i % 5,) for i in range(500)], "v long"
    )
    sk = cm_sketch(df, "v", width=1024, depth=4)
    est = cm_estimate(sk, df, "v", width=1024, depth=4).collect()
    assert sorted((r.value, r.est_n) for r in est) == [
        (v, 100) for v in range(5)
    ]


def test_cm_sketch_grid_is_bounded(spark):
    from salesforce_plugin_spark.functions.sketch import cm_sketch

    df = spark.createDataFrame([(i,) for i in range(3000)], "v long")
    rows = cm_sketch(df, "v", width=32, depth=3).collect()
    assert len(rows) <= 3 * 32
    assert sum(r.n for r in rows) == 3 * 3000  # each input hits depth rows


def test_cm_rejects_bad_shape(spark):
    from salesforce_plugin_spark.functions.sketch import cm_sketch

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        cm_sketch(df, "v", width=1, depth=4)


# --- entity resolution ---

def test_fuzzy_link_elects_best_match(spark):
    from salesforce_plugin_spark.functions.entity import blocked_fuzzy_link

    master = spark.createDataFrame(
        [(1, "acme corp"), (2, "acme corps"), (3, "zenith ltd")],
        "master_id long, name string",
    )
    dirty = spark.createDataFrame(
        [(10, "acme corpse"), (11, "zenith ltdx"), (12, "other thing")],
        "dirty_id long, name string",
    )
    got = {
        r.dirty_id: (r.master_id, r.dist)
        for r in blocked_fuzzy_link(
            master, dirty, "master_id", "dirty_id", "name", max_dist=2
        ).collect()
    }
    # "acme corpse": dist 2 to "acme corp", 1 to "acme corps" -> master 2
    assert got[10] == (2, 1)
    assert got[11] == (3, 1)
    assert 12 not in got  # no candidate within max_dist


def test_fuzzy_link_tie_breaks_to_lowest_master(spark):
    from salesforce_plugin_spark.functions.entity import blocked_fuzzy_link

    master = spark.createDataFrame(
        [(7, "blue bolt"), (4, "blue bolt")], "master_id long, name string"
    )
    dirty = spark.createDataFrame(
        [(1, "blue boltz")], "dirty_id long, name string"
    )
    rows = blocked_fuzzy_link(
        master, dirty, "master_id", "dirty_id", "name"
    ).collect()
    assert len(rows) == 1 and rows[0].master_id == 4 and rows[0].dist == 1


def test_fuzzy_link_blocking_excludes_cross_block(spark):
    from salesforce_plugin_spark.functions.entity import blocked_fuzzy_link

    # identical names apart from the FIRST token land in different
    # blocks and are never compared — the documented blocking tradeoff
    master = spark.createDataFrame(
        [(1, "red widget")], "master_id long, name string"
    )
    dirty = spark.createDataFrame(
        [(9, "ted widget")], "dirty_id long, name string"
    )
    assert (
        blocked_fuzzy_link(
            master, dirty, "master_id", "dirty_id", "name"
        ).count()
        == 0
    )


# --- RRF fusion ---

def test_rrf_fuse_scores_and_ranks(spark):
    from salesforce_plugin_spark.functions.ir import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "id long, rank int"
    )
    sem = spark.createDataFrame(
        [(2, 1), (4, 2)], "id long, rank int"
    )
    rows = {
        r.id: r
        for r in rrf_fuse([("lex", lex), ("sem", sem)], "id", k0=60).collect()
    }
    s = 10**9
    assert rows[2].rrf_scaled == s // 62 + s // 61  # in both lists
    assert rows[1].rrf_scaled == s // 61
    assert rows[1].rank_sem is None
    # doc 2 fuses highest; 1 vs 4: s//61 > s//62
    assert rows[2].fused_rank == 1 and rows[1].fused_rank == 2
    assert rows[4].fused_rank == 3 and rows[3].fused_rank == 4


def test_rrf_fuse_rejects_duplicate_names(spark):
    from salesforce_plugin_spark.functions.ir import rrf_fuse

    df = spark.createDataFrame([(1, 1)], "id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse([("a", df), ("a", df)], "id")


def test_ranked_is_deterministic_and_truncated(spark):
    import pyspark.sql.functions as F

    from salesforce_plugin_spark.functions.ir import ranked

    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 9)], "id long, score long"
    )
    rows = ranked(
        df, "id", [F.col("score").desc(), F.col("id")], top_n=2
    ).collect()
    assert [(r.id, r.rank) for r in rows] == [(3, 1), (1, 2)]


# --- BPE pair counting ---

def test_bpe_pair_counts_weighted_by_word_freq(spark):
    from salesforce_plugin_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [("low low low lower",), ("newest newest",)], "text string"
    )
    got = {r.pair: r.n for r in bpe_pair_counts(df, "text", top_n=50).collect()}
    # vocab: low(3) lower(1) newest(2) — "lo"/"ow" appear in low AND lower
    assert got["lo"] == 4 and got["ow"] == 4
    assert got["we"] == 1 + 2  # lower + newest
    assert got["es"] == 2 and got["st"] == 2


def test_bpe_pair_counts_rank_tiebreak_and_filters(spark):
    from salesforce_plugin_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [("ab ba x 12 C3",)], "text string"  # x too short; 12/C3 non-alpha
    )
    rows = bpe_pair_counts(df, "text", top_n=10).collect()
    assert [(r.pair, r.n, r.rank) for r in rows] == [("ab", 1, 1), ("ba", 1, 2)]


def test_cm_sketch_is_additive(spark):
    from salesforce_plugin_spark.functions.sketch import cm_sketch

    df = spark.createDataFrame([(i % 17,) for i in range(400)], "v long")
    full = cm_sketch(df, "v", width=64, depth=3)
    a = cm_sketch(df.filter("v < 9"), "v", width=64, depth=3)
    b = cm_sketch(df.filter("v >= 9"), "v", width=64, depth=3)
    import pyspark.sql.functions as F

    summed = (
        a.unionByName(b).groupBy("row", "bucket").agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, summed.collect())) == sorted(
        map(tuple, full.collect())
    )


# --- co-purchase / triangles / power step ---

def test_copurchase_support_ignores_multiplicity(spark):
    from salesforce_plugin_spark.operators.analytics import copurchase_pairs

    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "bk long, it string")
    got = {
        (r.item_a, r.item_b): r.support
        for r in copurchase_pairs(df, "bk", "it", min_support=1).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1}  # dup (1,a) not inflating


def test_copurchase_min_support_filters(spark):
    from salesforce_plugin_spark.operators.analytics import copurchase_pairs

    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)]
    df = spark.createDataFrame(rows, "bk long, it long")
    got = copurchase_pairs(df, "bk", "it", min_support=2).collect()
    assert [(r.item_a, r.item_b, r.support) for r in got] == [(10, 20, 2)]


def test_triangle_counts_triangle_plus_tail(spark):
    from salesforce_plugin_spark.functions.graph import triangle_counts

    # triangle 1-2-3 plus a dangling edge 3-4; reversed/dup edges collapse
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_k4_has_three_per_node(spark):
    from itertools import combinations

    from salesforce_plugin_spark.functions.graph import triangle_counts

    edges = spark.createDataFrame(
        list(combinations(range(4), 2)), "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4: each node in C(3,2) triangles


def test_gram_power_step_matches_numpy(spark):
    import numpy as np

    from salesforce_plugin_spark.functions.vector import gram_power_step

    rng = np.random.default_rng(7)
    x = rng.uniform(-0.5, 0.5, size=(40, 8))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    v0 = spark.createDataFrame(
        [([float(v) for v in x[0]],)], "v0 array<double>"
    )
    got = {r.dim: r.gv for r in gram_power_step(df, "vec_id", "embedding", v0).collect()}
    xq = np.round(x * 1000).astype(np.int64)
    v0q = np.round(x[0] * 1000).astype(np.int64)
    want = xq.T @ (xq @ v0q)
    assert got == {d + 1: int(want[d]) for d in range(8)}


def test_gram_power_iterations_two_steps_match_numpy(spark):
    import numpy as np

    from salesforce_plugin_spark.functions.vector import gram_power_iterations

    rng = np.random.default_rng(11)
    x = rng.uniform(-0.4, 0.4, size=(30, 6))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    v0 = spark.createDataFrame([([float(v) for v in x[0]],)], "v0 array<double>")
    got = {
        r.dim: (r.vq, r.gv)
        for r in gram_power_iterations(
            df, "vec_id", "embedding", v0, iterations=2, quant=1000
        ).collect()
    }
    xq = np.round(x * 1000).astype(object)  # python ints: no int64 overflow ambiguity
    v0q = np.round(x[0] * 1000).astype(object)
    g1 = xq.T @ (xq @ v0q)
    m = max(abs(int(v)) for v in g1)
    v1 = np.array(
        [(-1 if int(g) < 0 else 1) * ((abs(int(g)) * 1000) // m) for g in g1],
        dtype=object,
    )
    g2 = xq.T @ (xq @ v1)
    assert got == {d + 1: (int(v1[d]), int(g2[d])) for d in range(6)}


def test_gram_power_iterations_rejects_zero(spark):
    from salesforce_plugin_spark.functions.vector import gram_power_iterations

    df = spark.createDataFrame([(0, [0.1])], "vec_id long, embedding array<double>")
    v0 = spark.createDataFrame([([0.1],)], "v0 array<double>")
    with pytest.raises(ValueError):
        gram_power_iterations(df, "vec_id", "embedding", v0, iterations=0)


def test_kmv_join_size_exact_below_k(spark):
    from salesforce_plugin_spark.functions.sketch import kmv_join_size

    # 10 distinct keys, fA = 3, fB = 2 -> exact join size 10*3*2 = 60;
    # below k the sketch holds every key, so the estimate is exact.
    a = spark.createDataFrame(
        [(str(i % 10),) for i in range(30)], "k string"
    )
    b = spark.createDataFrame(
        [(str(i % 10),) for i in range(20)], "k string"
    )
    row = kmv_join_size(a, b, "k", k=64).collect()[0]
    assert row.n_kept == 10 and row.union_est == 10
    assert row.sum_ff == 60 and row.join_est == 60


def test_kmv_join_size_disjoint_keys(spark):
    from salesforce_plugin_spark.functions.sketch import kmv_join_size

    a = spark.createDataFrame([("a",), ("b",)], "k string")
    b = spark.createDataFrame([("c",), ("d",)], "k string")
    row = kmv_join_size(a, b, "k", k=64).collect()[0]
    assert row.sum_ff == 0 and row.join_est == 0


def test_kmv_join_size_estimate_within_error(spark):
    from salesforce_plugin_spark.functions.sketch import kmv_join_size

    # 2000 keys, fA=2, fB=1 on the even half -> exact = 1000*2 = 2000
    a = spark.createDataFrame(
        [(str(i % 2000),) for i in range(4000)], "k string"
    )
    b = spark.createDataFrame(
        [(str(2 * i),) for i in range(1000)], "k string"
    )
    row = kmv_join_size(a, b, "k", k=256).collect()[0]
    assert row.n_kept == 256
    assert abs(row.join_est - 2000) / 2000 < 0.35  # ~4 sigma at k=256


def test_deletion_neighborhood_complete_at_dist1(spark):
    import pyspark.sql.functions as F

    from salesforce_plugin_spark.functions.entity import deletion_neighborhood

    df = spark.createDataFrame([("abc",)], "s string")
    keys = df.select(
        F.explode(deletion_neighborhood(F.col("s"))).alias("k")
    ).collect()
    assert sorted(r.k for r in keys) == ["ab", "abc", "ac", "bc"]


def test_deletion_link_finds_all_single_edits(spark):
    from salesforce_plugin_spark.functions.entity import deletion_link

    master = spark.createDataFrame(
        [(1, "ring #42"), (2, "ring #4")], "master_id long, name string"
    )
    dirty = spark.createDataFrame(
        [
            (10, "ring #4"),    # exact dup of master 2 (dist 0 beats 1)
            (11, "ring #422"),  # insertion vs master 1
            (12, "rng #42"),    # deletion vs master 1
            (13, "ring #43"),   # substitution vs master 1
            (14, "totally off"),
        ],
        "dirty_id long, name string",
    )
    got = {
        r.dirty_id: (r.master_id, r.dist)
        for r in deletion_link(
            master, dirty, "master_id", "dirty_id", "name", max_dist=1
        ).collect()
    }
    assert got[10] == (2, 0)
    assert got[11] == (1, 1)
    assert got[12] == (1, 1)
    assert got[13] == (1, 1)
    assert 14 not in got


# --- time series ---

def _ts_events(spark, rows):
    return spark.createDataFrame(rows, "k long, ts timestamp, eid long, v long")


def test_resample_ffill_fills_gaps_and_elects_last(spark):
    import datetime as _dt

    import pyspark.sql.functions as F

    from salesforce_plugin_spark.operators.timeseries import resample_daily_ffill

    d = _dt.datetime
    rows = [
        (1, d(2024, 1, 1, 9), 1, 10),
        (1, d(2024, 1, 1, 18), 2, 20),   # later ts wins day 1
        (1, d(2024, 1, 4, 12), 3, 40),   # days 2-3 are gaps
        (2, d(2024, 1, 2, 0), 4, 7),
    ]
    out = resample_daily_ffill(
        _ts_events(spark, rows), "k", "ts", F.col("v"), order_cols=["eid"]
    )
    got = {(r.k, r.day): (r.n_obs, r.filled) for r in out.collect()}
    assert got[(1, "2024-01-01")] == (2, 20)
    assert got[(1, "2024-01-02")] == (0, 20)  # gap, carried forward
    assert got[(1, "2024-01-03")] == (0, 20)
    assert got[(1, "2024-01-04")] == (1, 40)
    assert got[(2, "2024-01-02")] == (1, 7)
    assert len(got) == 5  # spine bounded per key, no cross-key spill


def test_resample_ffill_tiebreak_is_deterministic(spark):
    import datetime as _dt

    import pyspark.sql.functions as F

    from salesforce_plugin_spark.operators.timeseries import resample_daily_ffill

    d = _dt.datetime
    rows = [(1, d(2024, 1, 1, 9), 1, 10), (1, d(2024, 1, 1, 9), 2, 99)]
    out = resample_daily_ffill(
        _ts_events(spark, rows), "k", "ts", F.col("v"), order_cols=["eid"]
    ).collect()
    assert out[0].filled == 99  # same ts: higher eid wins


def test_rolling_metrics_trailing_range_window(spark):
    import datetime as _dt

    import pyspark.sql.functions as F

    from salesforce_plugin_spark.operators.timeseries import (
        rolling_daily_metrics,
    )

    d = _dt.datetime
    rows = [
        (1, d(2024, 1, 1), 1, 5),
        (1, d(2024, 1, 3), 2, 7),
        (1, d(2024, 1, 20), 3, 100),  # outside any 7-day window of the others
    ]
    out = rolling_daily_metrics(
        _ts_events(spark, rows), "k", "ts", F.col("v"), window_days=7
    )
    got = {r.day: (r.day_sum, r.roll_n, r.roll_sum) for r in out.collect()}
    assert got["2024-01-01"] == (5, 1, 5)
    assert got["2024-01-03"] == (7, 2, 12)   # includes Jan 1 (range, not rows)
    assert got["2024-01-20"] == (100, 1, 100)


def test_rolling_metrics_rejects_bad_window(spark):
    import pyspark.sql.functions as F

    from salesforce_plugin_spark.operators.timeseries import (
        rolling_daily_metrics,
    )

    df = _ts_events(spark, [])
    with pytest.raises(ValueError):
        rolling_daily_metrics(df, "k", "ts", F.col("v"), window_days=0)


def test_quantile_bins_equi_depth_labels(spark):
    from salesforce_plugin_spark.functions.sketch import quantile_bins

    # values 1..100 uniform: quartile cuts ~25/50/75 -> 4 near-equal bins
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    out = quantile_bins(df, "v", n_bins_out=4, lo=0.0, hi=128.0, n_bins=256)
    got = {r.id: r.bin for r in out.collect()}
    assert set(got.values()) == {0, 1, 2, 3}
    from collections import Counter

    sizes = Counter(got.values())
    assert all(20 <= n <= 30 for n in sizes.values())  # near equi-depth
    assert got[1] == 0 and got[100] == 3
    # monotone labeling
    assert all(got[i] <= got[i + 1] for i in range(1, 100))


def test_quantile_bins_rejects_degenerate(spark):
    from salesforce_plugin_spark.functions.sketch import quantile_bins

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        quantile_bins(df, "v", n_bins_out=1, lo=0.0, hi=1.0)


# --- Bloom filter pruning ---

def test_bloom_no_false_negatives(spark):
    from salesforce_plugin_spark.functions.sketch import bloom_build, bloom_prune

    build = spark.createDataFrame([(i,) for i in range(0, 100, 7)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    bloom = bloom_build(build, "k", n_bits=256, n_hashes=3)
    passed = {r.k for r in bloom_prune(probe, "k", bloom, 256, 3).collect()}
    assert set(range(0, 100, 7)) <= passed  # one-sided: every true key survives


def test_bloom_prunes_most_nonmembers(spark):
    from salesforce_plugin_spark.functions.sketch import bloom_build, bloom_prune

    build = spark.createDataFrame([(i,) for i in range(20)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    # 8192 bits / 20 keys / 3 hashes -> fpp well under 1%
    bloom = bloom_build(build, "k", n_bits=8192, n_hashes=3)
    n_pass = bloom_prune(probe, "k", bloom, 8192, 3).count()
    assert 20 <= n_pass <= 20 + 40  # ~2% leak ceiling on 1980 non-members


def test_bloom_bit_set_is_bounded(spark):
    from salesforce_plugin_spark.functions.sketch import bloom_build

    build = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    bloom = bloom_build(build, "k", n_bits=64, n_hashes=3)
    assert bloom.count() <= 64


def test_binned_quantiles_grouped_matches_per_group_exact(spark):
    from salesforce_plugin_spark.functions.sketch import binned_quantiles

    rows = [("a", float(v)) for v in range(100)] + [
        ("b", float(v) * 2) for v in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r.g, r.q): r.est
        for r in binned_quantiles(
            df, "v", [0.5], lo=0.0, hi=200.0, n_bins=200, group_cols=["g"]
        ).collect()
    }
    # bin width 1.0: p50 of 0..99 -> bin 49 edge 50; of 0,2,..,98 -> bin 48 edge 49
    assert out[("a", 0.5)] == 50.0
    assert out[("b", 0.5)] == 49.0


def test_binned_quantiles_grouped_counts_are_per_group(spark):
    from salesforce_plugin_spark.functions.sketch import binned_quantiles

    rows = [("a", 1.0)] * 30 + [("b", 2.0)] * 70
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r.n_total for r in binned_quantiles(
        df, "v", [0.5], lo=0.0, hi=4.0, n_bins=4, group_cols=["g"]
    ).collect()}
    assert out == {"a": 30, "b": 70}


def test_key_skew_flags_hot_key(spark):
    from salesforce_plugin_spark.operators.analytics import key_skew

    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew(df, "k", top_n=3).collect()
    top = next(r for r in out if r.rnk == 1)
    assert top.key == "hot" and top.n == 90
    assert top.share_ppm == 900000          # 90/100
    assert top.hot_x1000 == 90 * 11 * 1000 // 100  # 9900: ~10x uniform


def test_key_skew_deterministic_tiebreak(spark):
    from salesforce_plugin_spark.operators.analytics import key_skew

    df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    out = [r.key for r in key_skew(df, "k", top_n=3).collect()]
    assert sorted(out) == ["a", "b", "c"]
    by_rank = {r.rnk: r.key for r in key_skew(df, "k", top_n=3).collect()}
    assert by_rank == {1: "a", 2: "b", 3: "c"}  # equal counts: key order


# --- snapshot diff ---

def test_snapshot_diff_classifies_all_three(spark):
    from salesforce_plugin_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    new = spark.createDataFrame(
        [(1, 10), (2, 99), (4, 40)], "k long, v long"
    )
    out = {r.k: (r.change, r.v_old, r.v_new) for r in snapshot_diff(
        old, new, ["k"], ["v"]
    ).collect()}
    assert out == {
        2: ("update", 20, 99),
        3: ("delete", 30, None),
        4: ("insert", None, 40),
    }  # key 1 unchanged: absent


def test_snapshot_diff_null_values_are_not_changes(spark):
    from salesforce_plugin_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    new = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    out = {r.k: r.change for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out == {2: "update"}  # null==null via null-safe equality


def test_snapshot_diff_roundtrips_through_apply_changes(spark):
    from salesforce_plugin_spark.operators.merge import apply_changes, snapshot_diff

    old = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, v long"
    )
    new = spark.createDataFrame(
        [(i, i * 10 + (7 if i % 5 == 0 else 0)) for i in range(2, 22)],
        "k long, v long",
    )
    feed = snapshot_diff(old, new, ["k"], ["v"]).select(
        "k",
        F.col("v_new").alias("v"),
        F.when(F.col("change") == "delete", "d").otherwise("u").alias("op"),
        F.lit(1).alias("seq"),
    )
    rebuilt = apply_changes(old, feed, ["k"], order_by=["seq"], op_col="op")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )  # diff -> apply reproduces the new snapshot exactly


def test_percentile_normalize_monotone_and_bounded(spark):
    from salesforce_plugin_spark.functions.sketch import percentile_normalize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    out = {r.id: r.pct_ppm for r in percentile_normalize(
        df, "v", lo=0.0, hi=100.0, n_bins=100
    ).collect()}
    assert out[0] == 10000          # first bin: 1/100 -> 10000 ppm
    assert out[99] == 1000000       # top bin: full mass
    assert all(out[i] <= out[i + 1] for i in range(99))  # monotone in value


def test_percentile_normalize_grouped_is_per_group(spark):
    from salesforce_plugin_spark.functions.sketch import percentile_normalize

    rows = [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(5)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = percentile_normalize(
        df, "v", lo=0.0, hi=10.0, n_bins=10, group_cols=["g"]
    ).collect()
    top_b = next(r for r in out if r.g == "b" and r.v == 4.0)
    assert top_b.pct_ppm == 1000000  # b's max is b's 100th pct, not the corpus's


def test_iqr_outliers_flags_seeded_tail(spark):
    from salesforce_plugin_spark.functions.sketch import iqr_outliers

    rows = [(i, float(i % 100)) for i in range(1000)] + [
        (9001, 5000.0), (9002, 6000.0)
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r.id for r in iqr_outliers(df, "v", lo=0.0, hi=8192.0, n_bins=8192).collect()}
    assert {9001, 9002} <= out
    assert len(out) == 2  # the uniform body is inside the fences


def test_iqr_outliers_resists_masking(spark):
    from salesforce_plugin_spark.functions.sketch import iqr_outliers

    # one colossal value should not widen the fence enough to hide a
    # moderate outlier (the failure mode of mean/sigma fences)
    rows = [(i, float(i % 50)) for i in range(1000)] + [
        (8001, 700.0), (8002, 1_000_000.0)
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    out = {r.id for r in iqr_outliers(
        df, "v", lo=0.0, hi=2 ** 20, n_bins=2 ** 20
    ).collect()}
    assert {8001, 8002} <= out


def test_class_balance_gini_known_values(spark):
    from salesforce_plugin_spark.operators.analytics import class_balance

    # 4 balanced classes: gini = 1 - 4*(1/16) = 0.75
    df = spark.createDataFrame(
        [(c,) for c in "abcd" for _ in range(25)], "label string"
    )
    rows = class_balance(df, "label").collect()
    assert all(r.gini_ppm == 750000 for r in rows)
    assert all(r.share_ppm == 250000 for r in rows)

    # single class: gini = 0
    one = spark.createDataFrame([("x",)] * 10, "label string")
    assert class_balance(one, "label").collect()[0].gini_ppm == 0


# --- hierarchy resolution ---

def test_hierarchy_resolves_deep_chain_in_log_rounds(spark):
    from salesforce_plugin_spark.operators.hierarchy import resolve_hierarchy

    # path 0 <- 1 <- 2 <- ... <- 30: depth 30 resolves within
    # max_rounds=6 ONLY because doubling covers 2^6 = 64 levels
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "id long, parent long")
    out = {r.id: (r.root, r.depth) for r in resolve_hierarchy(
        df, "id", "parent", max_rounds=6
    ).collect()}
    assert out[30] == (0, 30) and out[0] == (0, 0) and out[15] == (0, 15)


def test_hierarchy_forest_and_cycle(spark):
    from salesforce_plugin_spark.operators.hierarchy import resolve_hierarchy

    rows = [
        (1, None), (2, 1), (3, 2),      # tree rooted at 1
        (10, None), (11, 10),           # second root
        (20, 21), (21, 20),             # 2-cycle: must NOT loop forever
    ]
    df = spark.createDataFrame(rows, "id long, parent long")
    out = {r.id: (r.root, r.depth) for r in resolve_hierarchy(
        df, "id", "parent", max_rounds=5
    ).collect()}
    assert out[3] == (1, 2) and out[11] == (10, 1)
    assert out[20] == (None, None) and out[21] == (None, None)


# --- distribution drift (TVD) ---

def test_histogram_tvd_identical_and_disjoint(spark):
    from salesforce_plugin_spark.functions.sketch import histogram_tvd

    a = spark.createDataFrame([(float(v % 10),) for v in range(100)], "v double")
    b = spark.createDataFrame(
        [(float(v % 10) + 50.0,) for v in range(200)], "v double"
    )
    same = histogram_tvd(a, a, "v", 0.0, 100.0, 100).collect()[0]
    assert same.tvd_ppm == 0 and same.sum_absdiff == 0
    apart = histogram_tvd(a, b, "v", 0.0, 100.0, 100).collect()[0]
    assert apart.tvd_ppm == 1000000  # disjoint support
    assert apart.n_a == 100 and apart.n_b == 200


def test_histogram_tvd_half_mass_moved(spark):
    from salesforce_plugin_spark.functions.sketch import histogram_tvd

    # A: all mass in bin 0; B: half bin 0, half bin 9 -> TVD = 0.5
    a = spark.createDataFrame([(0.5,)] * 40, "v double")
    b = spark.createDataFrame([(0.5,)] * 20 + [(9.5,)] * 20, "v double")
    r = histogram_tvd(a, b, "v", 0.0, 10.0, 10).collect()[0]
    assert r.tvd_ppm == 500000
    assert r.worst_bin in (0, 9)  # both bins carry the same absdiff


def test_date_dimension_fiscal_and_iso_edges(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.timeseries import date_dimension

    out = {r.d: r for r in date_dimension(
        spark, "2023-12-30", "2024-04-01", fiscal_start_month=4
    ).collect()}
    jan1 = out[_dt.date(2024, 1, 1)]
    assert jan1.dow_iso == 1 and jan1.wk_iso == 1       # Monday, ISO week 1
    assert jan1.fiscal_yr == 2024 and jan1.fiscal_mon == 10
    apr1 = out[_dt.date(2024, 4, 1)]
    assert apr1.fiscal_yr == 2025 and apr1.fiscal_mon == 1  # FY rollover
    assert apr1.fiscal_qtr == 1
    dec30 = out[_dt.date(2023, 12, 30)]                 # Saturday, ISO week 52
    assert dec30.is_weekend == 1 and dec30.wk_iso == 52
    import pytest as _pytest
    with _pytest.raises(ValueError):
        date_dimension(spark, "2024-01-01", "2024-01-02", fiscal_start_month=0)


# --- surrogate keys ---

def test_surrogate_keys_dense_and_stable(spark):
    from salesforce_plugin_spark.operators.merge import surrogate_keys

    d1 = spark.createDataFrame([("b",), ("a",), ("c",)], "nk string")
    m1 = {r.nk: r.sk for r in surrogate_keys(d1, ["nk"]).collect()}
    assert m1 == {"a": 1, "b": 2, "c": 3}  # dense, natural-key order

    d2 = spark.createDataFrame([("c",), ("aa",), ("z",)], "nk string")
    existing = surrogate_keys(d1, ["nk"])
    m2 = {r.nk: r.sk for r in surrogate_keys(d2, ["nk"], existing).collect()}
    # prior keys untouched; new keys continue after max(sk) in order
    assert m2["a"] == 1 and m2["b"] == 2 and m2["c"] == 3
    assert m2["aa"] == 4 and m2["z"] == 5


def test_surrogate_keys_rerun_is_idempotent(spark):
    from salesforce_plugin_spark.operators.merge import surrogate_keys

    d = spark.createDataFrame([("x",), ("y",)], "nk string")
    m = surrogate_keys(d, ["nk"])
    again = surrogate_keys(d, ["nk"], existing=m)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, again.collect()))


def test_fold_additive_rollup_any_batching_agrees(spark):
    from salesforce_plugin_spark.operators.merge import fold_additive_rollup

    rows = [(i % 3, 1, i) for i in range(30)]
    df = spark.createDataFrame(rows, "k int, n long, s long")
    one_shot = fold_additive_rollup(None, df, ["k"], ["n", "s"])

    state = None
    for lo, hi in [(0, 7), (7, 19), (19, 30)]:
        sl = spark.createDataFrame(rows[lo:hi], "k int, n long, s long")
        delta = fold_additive_rollup(None, sl, ["k"], ["n", "s"])
        state = fold_additive_rollup(state, delta, ["k"], ["n", "s"])
    assert sorted(map(tuple, state.collect())) == sorted(
        map(tuple, one_shot.collect())
    )
    import pytest as _pytest
    with _pytest.raises(ValueError):
        fold_additive_rollup(None, df, [], ["n"])


# --- debounce / throttle ---

def test_debounce_collapses_chained_bursts(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.timeseries import debounce

    t0 = _dt.datetime(2024, 1, 1)
    seconds = [0, 3, 6, 100, 200, 204]
    rows = [(1, i, t0 + _dt.timedelta(seconds=s)) for i, s in enumerate(seconds)]
    df = spark.createDataFrame(rows, "k int, eid int, ts timestamp")
    kept = sorted(r.eid for r in debounce(df, ["k"], "ts", 5, ["eid"]).collect())
    # session-gap chaining: s=6 is within 5s of s=3 (the previous EVENT),
    # so the whole [0,3,6] run is one burst; survivors are burst firsts
    assert kept == [0, 3, 4]  # eids at s=0, s=100, s=200
    import pytest as _pytest
    with _pytest.raises(ValueError):
        debounce(df, ["k"], "ts", 0)


def test_throttle_caps_per_window(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.timeseries import throttle_per_window

    t0 = _dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + _dt.timedelta(minutes=i)) for i in range(10)]
    rows += [(2, 100, t0)]
    df = spark.createDataFrame(rows, "k int, eid int, ts timestamp")
    kept = throttle_per_window(df, ["k"], "ts", 3600, 4, ["eid"]).collect()
    k1 = sorted(r.eid for r in kept if r.k == 1)
    assert k1 == [0, 1, 2, 3]       # earliest 4 of the hour
    assert any(r.k == 2 for r in kept)


def test_disorder_stats_detects_regressions(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.timeseries import disorder_stats

    t0 = _dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + _dt.timedelta(seconds=s)

    # arrival order 1..5; event times: 0, 100, 40, 200, 190
    rows = [(1, 1, ts(0)), (1, 2, ts(100)), (1, 3, ts(40)),
            (1, 4, ts(200)), (1, 5, ts(190))]
    df = spark.createDataFrame(rows, "k int, seq int, ts timestamp")
    r = disorder_stats(df, ["k"], "seq", "ts").collect()[0]
    assert r.n_events == 5
    assert r.n_regressions == 2                 # seq 3 and seq 5
    assert r.max_lateness_us == 60 * 1_000_000  # 100 - 40 seconds


def test_union_evolve_fills_missing_columns(spark):
    from salesforce_plugin_spark.operators.transforms import union_evolve

    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([(2, "y", 9)], "id long, v string, extra long")
    out = union_evolve([a, b])
    assert out.columns == ["id", "v", "extra"]  # first-appearance order
    rows = {r.id: r for r in out.collect()}
    assert rows[1].extra is None and rows[2].extra == 9
    import pytest as _pytest
    with _pytest.raises(ValueError):
        union_evolve([])


def test_golden_records_majority_with_tiebreak_and_null_rules(spark):
    from salesforce_plugin_spark.functions.entity import golden_records

    rows = [
        (1, "acme", "NY"), (1, "acme", "NY"), (1, "acme inc", "SF"),
        (2, "b", None), (2, None, None), (2, "a", None),
        (3, None, None),
    ]
    df = spark.createDataFrame(rows, "c int, name string, city string")
    out = {r.c: r for r in golden_records(df, "c", ["name", "city"]).collect()}
    assert out[1].name == "acme" and out[1].city == "NY"       # majority
    assert out[2].name == "a"      # 1-1 tie -> smaller value
    assert out[2].city is None     # all-null attribute stays null
    assert out[3].name is None and out[3].n_members == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        golden_records(df, "c", [])


def test_contribution_analysis_signed_shares(spark):
    from salesforce_plugin_spark.operators.analytics import contribution_analysis

    rows = [
        ("p1", "a", 100), ("p2", "a", 300),   # a: +200
        ("p1", "b", 100), ("p2", "b", 50),    # b: -50
    ]
    df = spark.createDataFrame(rows, "per string, seg string, m long")
    out = {r.seg: r for r in contribution_analysis(
        df, "per", ["seg"], "m", "p1", "p2"
    ).collect()}
    assert out["a"].delta == 200 and out["b"].delta == -50
    # total +150: a contributes 1333333 ppm, b -333333 (trunc toward zero)
    assert out["a"].share_ppm == 200 * 1_000_000 // 150
    assert out["b"].share_ppm == -333333


def test_contribution_analysis_zero_total_is_null(spark):
    from salesforce_plugin_spark.operators.analytics import contribution_analysis

    rows = [("p1", "a", 10), ("p2", "a", 20), ("p1", "b", 20), ("p2", "b", 10)]
    df = spark.createDataFrame(rows, "per string, seg string, m long")
    out = contribution_analysis(df, "per", ["seg"], "m", "p1", "p2").collect()
    assert all(r.share_ppm is None for r in out)


def test_linear_attribution_credit_sums_to_million(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.analytics import linear_attribution

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    conv = spark.createDataFrame(
        [(1, 900, ts(60)), (2, 901, ts(60))],
        "u int, cid int, ts timestamp",
    )
    touch = spark.createDataFrame(
        [(1, 1, ts(1)), (1, 2, ts(30)), (1, 3, ts(50)),   # 3 in window
         (1, 4, ts(61)),                                   # after conversion
         (2, 5, ts(59))],                                  # 1 in window
        "u int, tid int, ts timestamp",
    )
    out = linear_attribution(
        conv, touch, "u", "cid", "tid", "ts", "ts", 3600
    ).collect()
    c1 = [r for r in out if r.conv_id == 900]
    assert {r.touch_id for r in c1} == {1, 2, 3}
    assert sum(r.credit_ppm for r in c1) == 1_000_000
    # remainder goes to the LAST touch (tid 3): 333334 vs 333333
    assert {r.touch_id: r.credit_ppm for r in c1}[3] == 333334
    c2 = [r for r in out if r.conv_id == 901]
    assert len(c2) == 1 and c2[0].credit_ppm == 1_000_000


def test_activity_bitmap_bits_and_recency(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.analytics import activity_bitmap

    def d(day):
        return _dt.datetime(2024, 1, day, 10, 0, 0)

    rows = [(1, d(30)), (1, d(28)), (1, d(28)), (2, d(5)), (3, d(1))]
    df = spark.createDataFrame(rows, "u int, ts timestamp")
    out = {r.u: r for r in activity_bitmap(
        df, ["u"], "ts", "2024-01-30", n_days=7
    ).collect()}
    assert out[1].bitmap == 0b101          # bits 0 (day 30) and 2 (day 28)
    assert out[1].n_active_days == 2 and out[1].days_since_last == 0
    assert out[2].bitmap == 0 and out[2].days_since_last is None  # outside
    u2 = activity_bitmap(df, ["u"], "ts", "2024-01-08", n_days=7).collect()
    r2 = next(r for r in u2 if r.u == 2)
    assert r2.bitmap == 0b1000 and r2.days_since_last == 3
    import pytest as _pytest
    with _pytest.raises(ValueError):
        activity_bitmap(df, ["u"], "ts", "2024-01-30", n_days=65)


def test_attribution_models_first_and_last(spark):
    import datetime as _dt

    from salesforce_plugin_spark.operators.analytics import linear_attribution

    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + _dt.timedelta(minutes=m)

    conv = spark.createDataFrame([(1, 900, ts(60))], "u int, cid int, ts timestamp")
    touch = spark.createDataFrame(
        [(1, 1, ts(10)), (1, 2, ts(30)), (1, 3, ts(50))],
        "u int, tid int, ts timestamp",
    )
    last = {r.touch_id: r.credit_ppm for r in linear_attribution(
        conv, touch, "u", "cid", "tid", "ts", "ts", 3600, model="last_touch"
    ).collect()}
    assert last == {1: 0, 2: 0, 3: 1_000_000}
    first = {r.touch_id: r.credit_ppm for r in linear_attribution(
        conv, touch, "u", "cid", "tid", "ts", "ts", 3600, model="first_touch"
    ).collect()}
    assert first == {1: 1_000_000, 2: 0, 3: 0}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        linear_attribution(conv, touch, "u", "cid", "tid", "ts", "ts", 3600,
                           model="u_shaped")


# --- group trend (integer-exact OLS) ---

def test_group_trend_exact_line(spark):
    from salesforce_plugin_spark.operators.analytics import group_trend

    # y = 3x + 7 exactly -> slope_num/den == 3, icept_num/den == 7
    df = spark.createDataFrame(
        [("g", x, 3 * x + 7) for x in range(10)], "g string, x int, y int"
    )
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    assert r.den > 0
    assert r.slope_num == 3 * r.den
    assert r.icept_num == 7 * r.den


def test_group_trend_degenerate_x_zero_den(spark):
    from salesforce_plugin_spark.operators.analytics import group_trend

    df = spark.createDataFrame(
        [("g", 5, y) for y in range(4)], "g string, x int, y int"
    )
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    assert r.den == 0  # undefined fit surfaces as zero denominator


def test_group_trend_matches_numpy(spark):
    import numpy as np
    from salesforce_plugin_spark.operators.analytics import group_trend

    xs = [0, 1, 2, 5, 9, 12]
    ys = [4, -3, 8, 0, 21, 17]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x int, y int"
    )
    r = group_trend(df, ["g"], "x", "y").collect()[0]
    slope, icept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    assert abs(r.slope_num / r.den - slope) < 1e-9
    assert abs(r.icept_num / r.den - icept) < 1e-9


# --- rank correlation (tie-correct Spearman) ---

def test_rank_correlation_perfect_monotone(spark):
    from salesforce_plugin_spark.operators.analytics import rank_correlation

    df = spark.createDataFrame(
        [("g", x, x * x) for x in range(1, 8)], "g string, x int, y int"
    )
    r = rank_correlation(df, ["g"], "x", "y").collect()[0]
    assert r.rho == 1.0
    df2 = spark.createDataFrame(
        [("g", x, -x) for x in range(1, 8)], "g string, x int, y int"
    )
    assert rank_correlation(df2, ["g"], "x", "y").collect()[0].rho == -1.0


def test_rank_correlation_ties_match_scipy_formula(spark):
    from salesforce_plugin_spark.operators.analytics import rank_correlation

    # hand-computed Pearson-on-average-ranks with ties in both variables
    xs = [1, 1, 2, 3, 3, 3]
    ys = [2, 1, 2, 5, 5, 4]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x int, y int"
    )
    r = rank_correlation(df, ["g"], "x", "y").collect()[0]

    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and v[order[j]] == v[order[i]]:
                j += 1
            for k in range(i, j):
                ranks[order[k]] = (i + j + 1) / 2.0
            i = j
        return ranks

    import math
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert abs(r.rho - round(want, 6)) < 1e-12


def test_rank_correlation_constant_variable_null(spark):
    from salesforce_plugin_spark.operators.analytics import rank_correlation

    df = spark.createDataFrame(
        [("g", 1, y) for y in range(5)], "g string, x int, y int"
    )
    r = rank_correlation(df, ["g"], "x", "y").collect()[0]
    assert r.dx == 0 and r.rho is None


# --- label propagation ---

def test_label_propagation_majority_and_tiebreak(spark):
    from salesforce_plugin_spark.functions.graph import label_propagation_fixed

    # star: center 0 with neighbors labeled 7,7,9 -> majority 7
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(0, 9), (1, 7), (2, 7), (3, 9)], "id long, label long"
    )
    out = {
        r.id: r.label
        for r in label_propagation_fixed(edges, labels, iterations=1).collect()
    }
    assert out[0] == 7
    # leaves see only the center (label 9) -> adopt 9
    assert out[1] == 9 and out[2] == 9 and out[3] == 9
    # tie (one 7-neighbor, one 9-neighbor) -> smallest label wins
    e2 = spark.createDataFrame([(0, 1), (0, 2)], "src long, dst long")
    l2 = spark.createDataFrame(
        [(0, 5), (1, 9), (2, 7)], "id long, label long"
    )
    out2 = {
        r.id: r.label
        for r in label_propagation_fixed(e2, l2, iterations=1).collect()
    }
    assert out2[0] == 7


def test_label_propagation_isolated_keeps_label_and_spreads_two_hops(spark):
    from salesforce_plugin_spark.functions.graph import label_propagation_fixed

    # path 1-2-3 plus isolated 9; node 3's label needs 2 rounds to reach 1
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    labels = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 1), (9, 42)], "id long, label long"
    )
    one = {
        r.id: r.label
        for r in label_propagation_fixed(edges, labels, iterations=1).collect()
    }
    assert one[9] == 42  # no neighbors: keeps its label
    assert one[2] == 1  # tie {100, 1} -> smallest
    two = {
        r.id: r.label
        for r in label_propagation_fixed(edges, labels, iterations=2).collect()
    }
    assert two[1] == 1  # propagated through the middle node
    import pytest as _pytest
    with _pytest.raises(ValueError):
        label_propagation_fixed(edges, labels, iterations=0)


# --- CUSUM drift alarms ---

def test_cusum_matches_sequential_recursion(spark):
    from salesforce_plugin_spark.operators.timeseries import cusum_alarms
    import datetime as dt

    vals = [5, 5, 9, 9, 9, 2, 2, 14, 1, 9]
    rows = [
        ("k", dt.datetime(2024, 1, 1, 0, 0, i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = sorted(
        cusum_alarms(
            df, ["k"], "ts", "v", target=5, slack=1, threshold=6
        ).collect(),
        key=lambda r: r.ts,
    )
    # sequential reference: S_t = max(0, S + v - target - slack)
    s, want = 0, []
    for v in vals:
        s = max(0, s + v - 5 - 1)
        want.append(s)
    assert [r.cusum for r in out] == want
    assert [r.alarm for r in out] == [w > 6 for w in want]


def test_cusum_is_per_key_and_resets_nothing_across_keys(spark):
    from salesforce_plugin_spark.operators.timeseries import cusum_alarms
    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 0, 0), 10),
        ("b", dt.datetime(2024, 1, 1, 0, 0, 1), 0),
        ("a", dt.datetime(2024, 1, 1, 0, 0, 2), 10),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    out = {(r.k, r.ts.second): r.cusum for r in cusum_alarms(
        df, ["k"], "ts", "v", target=0, slack=0, threshold=5).collect()}
    assert out[("a", 0)] == 10 and out[("a", 2)] == 20
    assert out[("b", 1)] == 0


# --- Poisson bootstrap ---

def test_poisson_bootstrap_weights_match_python_replay(spark):
    import hashlib
    from salesforce_plugin_spark.operators.analytics import (
        POISSON1_THRESHOLDS,
        poisson_bootstrap,
    )

    rows = [(i, 10 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, y long")
    out = {r.b: r for r in poisson_bootstrap(df, "id", "y", replicates=4).collect()}

    def weight(i, b):
        u = int(hashlib.md5(f"{i}:{b}".encode()).hexdigest()[:8], 16)
        for k, t in enumerate(POISSON1_THRESHOLDS):
            if u < t:
                return k
        return len(POISSON1_THRESHOLDS)

    for b in range(4):
        ws = [(weight(i, b), y) for i, y in rows]
        assert out[b].sum_w == sum(w for w, _ in ws)
        assert out[b].sum_wy == sum(w * y for w, y in ws)
        assert out[b].n_eff == sum(1 for w, _ in ws if w > 0)


def test_poisson_bootstrap_weight_distribution_sane(spark):
    from salesforce_plugin_spark.operators.analytics import poisson_bootstrap

    df = spark.createDataFrame([(i, 1) for i in range(2000)], "id long, y long")
    r = poisson_bootstrap(df, "id", "y", replicates=1).collect()[0]
    # Poisson(1): E[w] = 1, P(w>0) = 1 - 1/e ~ 0.632
    assert abs(r.sum_w - 2000) < 200
    assert abs(r.n_eff - 2000 * 0.632) < 100
    import pytest as _pytest
    with _pytest.raises(ValueError):
        poisson_bootstrap(df, "id", "y", replicates=0)


# --- weighted median ---

def test_weighted_median_known_values(spark):
    from salesforce_plugin_spark.operators.analytics import weighted_median

    # weights pull the median below the unweighted middle
    df = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 1), ("g", 10, 1)], "g string, v int, w int"
    )
    r = weighted_median(df, ["g"], "v", "w").collect()[0]
    assert (r.median, r.total_w, r.n_distinct) == (1, 7, 3)
    # even split: smallest value reaching half wins (lower median)
    df2 = spark.createDataFrame(
        [("g", 1, 1), ("g", 9, 1)], "g string, v int, w int"
    )
    assert weighted_median(df2, ["g"], "v", "w").collect()[0].median == 1


def test_weighted_median_matches_numpy_on_unit_weights(spark):
    import numpy as np
    from salesforce_plugin_spark.operators.analytics import weighted_median

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([("g", v, 1) for v in vals], "g string, v int, w int")
    r = weighted_median(df, ["g"], "v", "w").collect()[0]
    # lower-median convention: for odd n this IS the numpy median
    assert r.median == int(np.median(np.array(vals)))
    assert r.total_w == len(vals)


# --- session trajectories ---

def test_session_trajectories_order_and_gap(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.analytics import session_trajectories

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view"),
        (1, t0 + dt.timedelta(minutes=2), 2, "click"),
        (1, t0 + dt.timedelta(minutes=5), 3, "purchase"),
        # > 10 min gap -> new session
        (1, t0 + dt.timedelta(minutes=30), 4, "view"),
        (2, t0, 5, "click"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long, t string")
    out = {
        (r.u, r.session_id): r
        for r in session_trajectories(
            df, "u", "ts", "t", gap_minutes=10, tiebreak_cols=["id"]
        ).collect()
    }
    assert out[(1, 1)].trajectory == "view>click>purchase"
    assert out[(1, 1)].n_events == 3
    assert out[(1, 2)].trajectory == "view"
    assert out[(2, 1)].trajectory == "click"
    assert out[(1, 1)].end_us - out[(1, 1)].start_us == 5 * 60 * 1_000_000


def test_session_trajectories_partitioning_invariant(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.analytics import session_trajectories

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(minutes=3 * i), u * 100 + i, f"e{i % 4}")
        for u in range(5)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, id long, t string")
    a = sorted(map(tuple, session_trajectories(
        df, "u", "ts", "t", tiebreak_cols=["id"]).collect()))
    b = sorted(map(tuple, session_trajectories(
        df.repartition(17), "u", "ts", "t", tiebreak_cols=["id"]).collect()))
    assert a == b


# --- rolling distinct (exact WAU) ---

def test_rolling_distinct_exact_vs_naive(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.analytics import rolling_distinct

    rows = []
    for u in range(6):
        for d in range(0, 12, u + 1):  # varied activity cadences
            rows.append((u, dt.datetime(2024, 1, 1 + d, 9, 0)))
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        r.day.isoformat(): r.n_distinct
        for r in rolling_distinct(df, "u", "ts", window_days=3).collect()
    }
    # naive reference
    from collections import defaultdict
    active = defaultdict(set)
    for u, ts in rows:
        active[ts.date()].add(u)
    days = sorted({d for d in active})
    lo, hi = days[0], max(days) + dt.timedelta(days=2)
    want = {}
    cur = lo
    while cur <= hi:
        s = set()
        for back in range(3):
            s |= active.get(cur - dt.timedelta(days=back), set())
        if s:
            want[cur.isoformat()] = len(s)
        cur += dt.timedelta(days=1)
    assert got == want
    import pytest as _pytest
    with _pytest.raises(ValueError):
        rolling_distinct(df, "u", "ts", window_days=0)


# --- neighbor feature aggregation ---

def test_neighbor_agg_one_and_two_hops(spark):
    from salesforce_plugin_spark.functions.graph import neighbor_agg

    # path 1 - 2 - 3 with features 10, 20, 40; node 9 isolated
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    feats = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 40), (9, 5)], "id long, f long"
    )
    h1 = {r.id: r for r in neighbor_agg(edges, feats, hops=1).collect()}
    assert (h1[1].n_neighbors, h1[1].f_sum) == (1, 20)
    assert (h1[2].n_neighbors, h1[2].f_sum) == (2, 50)
    assert (h1[3].n_neighbors, h1[3].f_sum) == (1, 20)
    assert (h1[9].n_neighbors, h1[9].f_sum) == (0, 0)
    h2 = {r.id: r for r in neighbor_agg(edges, feats, hops=2).collect()}
    # walk-counted: node 1's 2-hop sum = f_sum(2) = 50 (walks 1-2-1, 1-2-3)
    assert (h2[1].n_2hop, h2[1].f_sum_2hop) == (1, 50)
    assert (h2[2].n_2hop, h2[2].f_sum_2hop) == (2, 40)  # via 1 and 3
    assert h2[9].f_sum_2hop == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        neighbor_agg(edges, feats, hops=3)


# --- step-decay engagement score ---

def test_decayed_score_exact_weights(spark):
    import datetime as dt
    from salesforce_plugin_spark.operators.analytics import decayed_score

    # anchor 2024-01-10, horizon 4, half-life 1:
    # age 0 -> weight 2^3, age 1 -> 2^2, age 3 -> 2^0, age 4 -> 0
    rows = [
        ("k", dt.datetime(2024, 1, 10, 12), 5),   # age 0
        ("k", dt.datetime(2024, 1, 9, 12), 3),    # age 1
        ("k", dt.datetime(2024, 1, 7, 12), 7),    # age 3
        ("k", dt.datetime(2024, 1, 6, 12), 100),  # age 4: out
        ("k", dt.datetime(2024, 1, 11, 12), 100), # future: out
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v int")
    r = decayed_score(df, ["k"], "ts", "v", "2024-01-10", 4, 1).collect()[0]
    assert r.score == 5 * 8 + 3 * 4 + 7 * 1
    assert r.n_events == 3
    # half-life 2 over horizon 4: ages 0,1 -> 2^1; ages 2,3 -> 2^0
    r2 = decayed_score(df, ["k"], "ts", "v", "2024-01-10", 4, 2).collect()[0]
    assert r2.score == 5 * 2 + 3 * 2 + 7 * 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decayed_score(df, ["k"], "ts", "v", "2024-01-10", 60, 1)
