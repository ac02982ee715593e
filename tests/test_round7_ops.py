"""Round-7 operator additions: the cross-encoder rerank seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "key value pair in a row"),
            (2, "the index of the key appears late late late key"),
            (3, "nothing relevant here at all"),
            (4, None),
            (5, "  value   " + "pad " * 100 + "key"),  # key beyond window
        ],
        "doc_id long, text string",
    )


def test_positional_scorer_hand_computed():
    from salesforce_plugin_spark.functions.ir import positional_ce_scorer

    hits, scores = positional_ce_scorer(
        ["key value pair in a row", "nothing here", ""],
        ["key", "row", "value"],
        max_len=8,
    )
    # doc1: key@1 -> 8, row@6 -> 3, value@2 -> 7  => 18, 3 hits
    assert hits == [3, 0, 0]
    assert scores == [18, 0, 0]


def test_positional_scorer_window_truncation():
    from salesforce_plugin_spark.functions.ir import positional_ce_scorer

    text = "pad " * 64 + "key"  # key is token 65, outside max_len=64
    hits, scores = positional_ce_scorer([text], ["key"], max_len=64)
    assert hits == [0] and scores == [0]
    hits, scores = positional_ce_scorer([text], ["key", "pad"], max_len=65)
    assert hits == [2] and scores == [(65 - 65 + 1) + (65 - 1 + 1)]


def test_rerank_cross_encoder_end_to_end(spark, docs):
    from salesforce_plugin_spark.functions.ir import rerank_cross_encoder

    cands = spark.createDataFrame([(1,), (2,), (3,), (4,), (5,)], "doc_id long")
    out = rerank_cross_encoder(
        docs, cands, "doc_id", "text", ["key", "value", "index"], max_len=64
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # doc1: key@1 (64), value@2 (63), no index       => 127, 2 hits
    assert (rows[1].n_hit, rows[1].ce_scaled) == (2, 127)
    # doc2: index@2 (63), key@6 (59... "the index of the key appears":
    # tokens: the,index,of,the,key,... key@5 => 60) => 123, 2 hits
    assert (rows[2].n_hit, rows[2].ce_scaled) == (2, 63 + 60)
    assert (rows[3].n_hit, rows[3].ce_scaled) == (0, 0)
    assert (rows[4].n_hit, rows[4].ce_scaled) == (0, 0)  # NULL text
    # doc5: value@1 (64); key is token 102 — outside the 64 window
    assert (rows[5].n_hit, rows[5].ce_scaled) == (1, 64)
    # rank: ce_scaled desc, id asc => 1, 2, 5, then 3 before 4 (id tiebreak)
    assert [r.doc_id for r in sorted(rows.values(), key=lambda r: r.ce_rank)] \
        == [1, 2, 5, 3, 4]


def test_rerank_cross_encoder_candidate_bounded(spark, docs):
    """Only candidate rows reach the Python stage; non-candidates are
    absent from the output entirely."""
    from salesforce_plugin_spark.functions.ir import rerank_cross_encoder

    cands = spark.createDataFrame([(1,), (3,)], "doc_id long")
    out = rerank_cross_encoder(docs, cands, "doc_id", "text", ["key"])
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]
    # the plan joins against a broadcast of the candidate ids
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_rerank_cross_encoder_injected_scorer(spark, docs):
    """The learned-model seam: a custom scorer slots in and the Spark
    plan/plumbing is unchanged."""
    from salesforce_plugin_spark.functions.ir import rerank_cross_encoder

    def length_scorer(texts, terms, max_len):
        return (
            [len(terms)] * len(texts),
            [len((t or "").split()) for t in texts],
        )

    cands = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = rerank_cross_encoder(
        docs, cands, "doc_id", "text", ["a", "b"], scorer=length_scorer
    )
    rows = {r.doc_id: r.ce_scaled for r in out.collect()}
    assert rows == {1: 6, 2: 10}


def test_rerank_cross_encoder_guards(spark, docs):
    from salesforce_plugin_spark.functions.ir import rerank_cross_encoder

    cands = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="at least one term"):
        rerank_cross_encoder(docs, cands, "doc_id", "text", [])
    with pytest.raises(ValueError, match="max_len"):
        rerank_cross_encoder(docs, cands, "doc_id", "text", ["k"], max_len=0)


# ------------------------------------------------ dbscan hierarchy/tree


@pytest.fixture()
def embedded(spark):
    # two tight 3-point clumps that merge at loose eps, plus one
    # far-off noise point; 2-d unit-ish vectors
    rows = [
        (1, [1.00, 0.00]), (2, [0.99, 0.05]), (3, [0.98, 0.09]),
        (4, [0.00, 1.00]), (5, [0.05, 0.99]), (6, [0.09, 0.98]),
        (7, [-0.9, -0.9]),
        (8, [0.71, 0.70]),  # bridge between clumps at loose eps
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_dbscan_hierarchy_refinement(spark, embedded):
    """Tight core clusters must refine loose ones: every id core at
    level k with a cluster keeps ONE cluster at level k+1."""
    from salesforce_plugin_spark.functions.vector import (
        dbscan_hierarchy,
        dbscan_tree,
    )

    h = dbscan_hierarchy(
        embedded, "vec_id", "embedding",
        [995000, 900000, 500000], min_pts=2, sign_bits=2, target_bucket=100,
    )
    rows = h.collect()
    by = {(r.vec_id, r.level): r for r in rows}
    assert len(rows) == 8 * 3
    # level 0 (cos >= 0.995): the two clumps are separate; 7 is noise
    l0 = {r.vec_id: r.cluster for r in rows if r.level == 0 and r.role == "core"}
    assert l0, "expected cores at the tightest level"
    # level 2 (cos >= 0.5): clumps merge through the bridge point
    l2 = {r.vec_id: r.cluster for r in rows if r.level == 2 and r.role == "core"}
    assert len(set(l2.values())) < len(set(l0.values())) or len(set(l0.values())) == 1
    # refinement: members of one tight cluster share the loose cluster
    for lvl in (0, 1):
        tight = {}
        for r in rows:
            if r.level == lvl and r.role == "core" and r.cluster is not None:
                tight.setdefault(r.cluster, []).append(r.vec_id)
        for members in tight.values():
            parents = {by[(m, lvl + 1)].cluster for m in members}
            assert len(parents) == 1, f"cluster split across parents: {parents}"
    # the far-off point stays noise at every level
    assert all(by[(7, lvl)].role == "noise" for lvl in (0, 1, 2))
    # tree edges: one parent per child cluster
    t = dbscan_tree(h, "vec_id").collect()
    seen = {}
    for r in t:
        key = (r.level, r.child_cluster)
        assert key not in seen, "child cluster with two parents"
        seen[key] = r.parent_cluster
        assert r.n_members >= 1


def test_dbscan_hierarchy_core_monotone(spark, embedded):
    """Loosening eps can only add cores (degree is monotone)."""
    from salesforce_plugin_spark.functions.vector import dbscan_hierarchy

    h = dbscan_hierarchy(
        embedded, "vec_id", "embedding",
        [995000, 900000, 500000], min_pts=2, sign_bits=2, target_bucket=100,
    )
    cores = {
        lvl: {r.vec_id for r in h.collect() if r.level == lvl and r.role == "core"}
        for lvl in (0, 1, 2)
    }
    assert cores[0] <= cores[1] <= cores[2]


def test_dbscan_hierarchy_empty_ladder_raises(spark, embedded):
    from salesforce_plugin_spark.functions.vector import dbscan_hierarchy

    with pytest.raises(ValueError, match="non-empty eps ladder"):
        dbscan_hierarchy(embedded, "vec_id", "embedding", [])


def test_dbscan_hierarchy_single_level_matches_clusters(spark, embedded):
    """A one-rung ladder must equal plain dbscan_clusters."""
    from salesforce_plugin_spark.functions.vector import (
        dbscan_clusters,
        dbscan_hierarchy,
    )

    flat = {
        (r.vec_id): (r.role, r.cluster)
        for r in dbscan_clusters(
            embedded, "vec_id", "embedding", eps_ppm=900000, min_pts=2,
            sign_bits=2, target_bucket=100,
        ).collect()
    }
    hier = {
        r.vec_id: (r.role, r.cluster)
        for r in dbscan_hierarchy(
            embedded, "vec_id", "embedding", [900000], min_pts=2,
            sign_bits=2, target_bucket=100,
        ).collect()
    }
    assert flat == hier


# ------------------------------------------------ kneser-ney LM gate


def _py_log2_eighths(r: int) -> int:
    """Exact Python mirror of exactmath.log2_eighths_* (same mantissa
    floor, same pinned thresholds)."""
    from salesforce_plugin_spark.functions.exactmath import (
        LOG2_EIGHTH_THRESHOLDS,
    )

    k = r.bit_length() - 1
    m3 = (r >> (k - 12)) if k >= 12 else (r << (12 - k))
    j = max((i for i, t in enumerate(LOG2_EIGHTH_THRESHOLDS) if m3 >= t),
            default=0)
    return 8 * k + j


def _py_kn(docs, target_ids):
    """Reference KN-bigram scorer (pure Python, exact integers)."""
    def bigrams(text):
        import re

        toks = [t.lower() for t in re.split(r"\s+", text.strip(), flags=re.ASCII)]
        return list(zip(toks, toks[1:]))

    from collections import Counter

    c12 = Counter()
    for i, tx in docs:
        if i in target_ids:
            c12.update(bigrams(tx))
    c1, n1p, n1c = Counter(), Counter(), Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1p[w1] += 1
        n1c[w2] += 1
    nt = len(c12)
    out = {}
    for i, tx in docs:
        bgs = bigrams(tx)
        if not bgs:
            continue
        n_scored = bits8 = 0
        for w1, w2 in bgs:
            if w1 not in c1:
                continue
            num = max(4 * c12.get((w1, w2), 0) - 3, 0) * nt \
                + 3 * n1p[w1] * n1c.get(w2, 0)
            if num == 0:
                continue
            den = 4 * c1[w1] * nt
            n_scored += 1
            bits8 += max(_py_log2_eighths((den * 4096) // num) - 96, 0)
        out[i] = (len(bgs), n_scored, bits8,
                  bits8 * 125 // n_scored if n_scored else None)
    return out


def test_kn_hand_computed(spark):
    from salesforce_plugin_spark.functions.text import kn_bigram_bits

    df = spark.createDataFrame(
        [
            (1, "a b a b a c", True),   # model doc
            (2, "a b", False),          # P(b|a) = 21/36 -> 6 eighth-bits
            (3, "z q", False),          # OOV left context: unscored
            (4, "a", False),            # < 2 tokens: absent
        ],
        "doc_id long, text string, tgt boolean",
    )
    out = {
        r.doc_id: r
        for r in kn_bigram_bits(df, "doc_id", "text", F.col("tgt")).collect()
    }
    assert 4 not in out
    r2 = out[2]
    # num = max(4*2-3,0)*3 + 3*2*1 = 21; den = 4*3*3 = 36
    # floor(8*log2(36/21)) = floor(6.22) = 6
    assert (r2.n_bigrams, r2.n_scored, r2.kn_bits_x8) == (1, 1, 6)
    assert r2.milli_bits_per_bigram == 750
    r3 = out[3]
    assert (r3.n_bigrams, r3.n_scored, r3.kn_bits_x8) == (1, 0, 0)
    assert r3.milli_bits_per_bigram is None


def test_kn_certain_bigram_is_zero_bits(spark):
    """c12 = c1 (the only continuation): P = 1, bits clamp at 0."""
    from salesforce_plugin_spark.functions.text import kn_bigram_bits

    df = spark.createDataFrame(
        [(1, "a a a a", True), (2, "a a", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = {r.doc_id: r for r in
           kn_bigram_bits(df, "doc_id", "text", F.col("tgt")).collect()}
    assert out[2].kn_bits_x8 == 0 and out[2].n_scored == 1


def test_kn_matches_python_reference(spark):
    """Seeded random corpus: the Spark plan equals the pure-Python
    exact-integer reference on every output cell."""
    import random

    from salesforce_plugin_spark.functions.text import kn_bigram_bits

    rng = random.Random(7)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far", "qq"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
        for i in range(30)
    ]
    target_ids = {i for i in range(30) if i % 3 == 0}
    df = spark.createDataFrame(
        [(i, tx, i in target_ids) for i, tx in docs],
        "doc_id long, text string, tgt boolean",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.n_scored, r.kn_bits_x8,
                   r.milli_bits_per_bigram)
        for r in kn_bigram_bits(df, "doc_id", "text", F.col("tgt")).collect()
    }
    want = _py_kn(docs, target_ids)
    assert got == want


def test_log2_eighths_spark_matches_python(spark):
    from salesforce_plugin_spark.functions.exactmath import (
        log2_eighths_spark,
    )

    import random

    rng = random.Random(3)
    vals = [1, 2, 3, 4095, 4096, 4097, 2**50 - 1] + [
        rng.randint(1, 2**50) for _ in range(50)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "r long")
    got = [
        r.b for r in df.select(
            F.expr(log2_eighths_spark("r")).alias("b")
        ).collect()
    ]
    assert got == [_py_log2_eighths(v) for v in vals]


# --------------------------------------------- minhash candidate mode


def test_minhash_error_eval_candidate_mode(spark):
    """Candidate mode must equal the exhaustive mode on the same
    pairs, and disjoint pairs surface with true_ppm 0 instead of
    vanishing."""
    from salesforce_plugin_spark.functions.dedup import minhash_error_eval

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over a lazy dog"),
            (3, "completely different words entirely here xyz"),
        ],
        "doc_id long, text string",
    )
    full = {
        (r.id_a, r.id_b): (r.true_ppm, r.est_ppm, r.err_ppm)
        for r in minhash_error_eval(docs, min_true_ppm=0).collect()
    }
    cand = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    sampled = {
        (r.id_a, r.id_b): (r.true_ppm, r.est_ppm, r.err_ppm)
        for r in minhash_error_eval(docs, candidates=cand).collect()
    }
    assert set(sampled) == {(1, 2), (1, 3)}
    assert sampled[(1, 2)] == full[(1, 2)]
    # (1, 3): no shared 3-gram shingles -> exact 0, estimate whatever
    # the signatures say, error = est - 0
    t13, e13, err13 = sampled[(1, 3)]
    assert t13 == 0 and err13 == e13
