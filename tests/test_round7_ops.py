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
