"""F1/F2 dedup operators: exact survivor selection, shingles (short-doc
guard), minhash/LSH clustering invariants, jaccard, simhash, cosine pairs."""

from __future__ import annotations

import pyspark.sql.functions as F

from salesforce_plugin_spark.functions.dedup import (
    dedup_exact,
    embedding_cosine_pairs,
    hamming64,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dedup_clusters,
    ngram_jaccard_pairs,
    simhash_table,
    word_shingles,
)


def test_derive_banding_recall_holds_at_threshold():
    """The derived (num_hashes, bands) must give >= 90% candidate recall
    AT the operating threshold — the ADVICE regression was a fixed
    16-hash/8-band scheme whose banding threshold (~0.35) sat far above
    the default threshold (0.2), silently finding ~28% of true pairs."""
    from salesforce_plugin_spark.functions.dedup import derive_banding

    for t in (0.05, 0.1, 0.2, 0.35, 0.5, 0.8):
        num_hashes, bands = derive_banding(t)
        r = num_hashes // bands
        assert num_hashes == bands * r and num_hashes <= 256
        recall = 1.0 - (1.0 - t**r) ** bands
        assert recall >= 0.9, (t, num_hashes, bands, recall)

    import pytest

    with pytest.raises(ValueError):
        derive_banding(0.0)
    with pytest.raises(ValueError):
        derive_banding(0.001)  # needs >256 hashes


def test_jaccard_lsh_mismatched_banding_args_raise(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], ["id", "t"])
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(df, "id", "t", num_hashes=16)  # bands missing


def test_dedup_exact_keeps_first_by_order(spark):
    df = spark.createDataFrame(
        [(1, "k", 3), (2, "k", 1), (3, "k", 2), (4, "j", 9)],
        ["id", "key", "seq"],
    )
    out = dedup_exact(df, ["key"], ["seq", "id"])
    assert sorted(r.id for r in out.collect()) == [2, 4]


def test_word_shingles_short_doc_guard(spark):
    df = spark.createDataFrame([("",), ("one",), ("two words",), ("a b c d",)], ["t"])
    rows = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert [r.s for r in rows[:3]] == [[], [], []]  # < n tokens → empty, no crash
    assert rows[3].s == ["a b c", "b c d"]


def test_shingles_are_distinct_and_lowercased(spark):
    df = spark.createDataFrame([("A b A b A b",)], ["t"])
    rows = df.select(word_shingles(F.col("t"), 2).alias("s")).collect()[0].s
    assert sorted(rows) == ["a b", "b a"]


def test_minhash_signature_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps")],
        ["id", "t"],
    )
    sigs = minhash_signatures(df, "id", "t", num_hashes=8).collect()
    a, b = sorted(sigs, key=lambda r: r.id)
    # identical text → identical signature
    assert [a[f"mh_{i}"] for i in range(8)] == [b[f"mh_{i}"] for i in range(8)]


def test_lsh_candidates_find_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, base), (2, base + " ok"), (3, "completely different words entirely here now")],
        ["id", "t"],
    )
    sigs = minhash_signatures(df, "id", "t", num_hashes=16)
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, "id").collect()}
    assert (1, 2) in pairs
    assert all(p[0] < p[1] for p in pairs)


def test_near_dedup_clusters_cover_all_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, ""), (4, "zz")],
        ["id", "t"],
    )
    rows = near_dedup_clusters(df, "id", "t").collect()
    got = {r.id: r.cluster_id for r in rows}
    assert set(got) == {1, 2, 3, 4}          # one row per input doc
    assert got[1] == got[2] == 1             # exact dupes share a cluster
    assert got[3] == 3 and got[4] == 4       # shingle-less → singleton


def test_near_dedup_clusters_portable_matches_semantics(spark):
    from salesforce_plugin_spark.functions.dedup import near_dedup_clusters_portable

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, ""), (4, "zz")],
        ["id", "t"],
    )
    rows = near_dedup_clusters_portable(df, "id", "t").collect()
    got = {r.id: r.cluster_id for r in rows}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == got[2] == 1
    assert got[3] == 3 and got[4] == 4


def test_connected_components_closes_multi_hop_chains(spark):
    from salesforce_plugin_spark.functions.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["id"])
    # chain 1-2-3-4 (diameter 3, needs >1 iteration), pair 5-6, isolate 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], ["id_a", "id_b"]
    )
    got = {
        r.id: r.component_id
        for r in connected_components(nodes, edges, id_col="id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_star_components_match_propagation_on_path_graph(spark):
    """Large-star/small-star converges on a long-diameter path graph in
    O(log² n) rounds — a 30-node path (diameter 29) must fully collapse
    within far fewer than 29 iterations, and the labeling must equal the
    propagation method's (given enough iterations for the latter)."""
    from salesforce_plugin_spark.functions.dedup import connected_components

    n = 30
    nodes = spark.createDataFrame([(i,) for i in range(n + 3)], ["id"])
    # path 0-1-...-29, plus pair (30, 31), isolate 32
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(n, n + 1)], ["id_a", "id_b"]
    )
    star = {
        r.id: r.component_id
        for r in connected_components(
            nodes, edges, id_col="id", max_iter=10, method="star"
        ).collect()
    }
    prop = {
        r.id: r.component_id
        for r in connected_components(
            nodes, edges, id_col="id", max_iter=40
        ).collect()
    }
    expected = {i: 0 for i in range(n)} | {n: n, n + 1: n, n + 2: n + 2}
    assert star == expected and prop == expected


def test_star_components_on_random_graphs_match_propagation(spark):
    """Cross-method equivalence on seeded random graphs (the property that
    matters: both methods compute the same exact partition)."""
    import random

    from salesforce_plugin_spark.functions.dedup import connected_components

    rng = random.Random(7)
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edges = spark.createDataFrame(
        [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(30)
        ],
        ["id_a", "id_b"],
    )
    star = {
        r.id: r.component_id
        for r in connected_components(
            nodes, edges, id_col="id", method="star"
        ).collect()
    }
    prop = {
        r.id: r.component_id
        for r in connected_components(
            nodes, edges, id_col="id", max_iter=40
        ).collect()
    }
    assert star == prop


def test_lsh_recall_on_synthetic_near_duplicates(spark):
    """Recall check: documents that differ by one word in twenty have
    3-shingle jaccard ≈ 0.71 (3 changed shingles of ~18, union ~21). At
    16 hashes / 8 bands of 2, theoretical recall is 1-(1-j²)⁸ ≈ 0.99;
    4 bands of 4 gives only ~0.70 (observed 14/20 — matching theory, which
    is why the banding choice is the recall knob, not the hash count)."""
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(50)]
    rows, expected_pairs = [], []
    for d in range(20):
        base_words = [rng.choice(vocab) for _ in range(20)]
        near = list(base_words)
        near[7] = "CHANGED"
        rows.append((2 * d, " ".join(base_words)))
        rows.append((2 * d + 1, " ".join(near)))
        expected_pairs.append((2 * d, 2 * d + 1))
    df = spark.createDataFrame(rows, ["id", "t"])
    clusters = {
        r.id: r.cluster_id
        for r in near_dedup_clusters(df, "id", "t", num_hashes=16, bands=8).collect()
    }
    found = sum(clusters[a] == clusters[b] for a, b in expected_pairs)
    assert found >= 18  # ≥90% recall with 8 bands of 2
    # unrelated docs (different random words) stay apart in the main
    cross = sum(
        clusters[a1] == clusters[a2]
        for (a1, _), (a2, _) in zip(expected_pairs, expected_pairs[1:])
    )
    assert cross <= 4


def test_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["id", "t"]
    )
    # 2-shingles: {ab,bc,cd} vs {ab,bc,ce} → inter=2, union=4 → 0.5
    # prune=None: this test pins the exact exhaustive semantics (threshold
    # 0.0 is far below any sane LSH banding threshold)
    out = ngram_jaccard_pairs(
        df, "id", "t", n=2, threshold=0.0, prune=None
    ).collect()
    assert len(out) == 1 and out[0].jaccard == 0.5


def test_jaccard_lsh_pruned_matches_exhaustive_on_fixture(spark):
    """The default LSH-pruned verifier must produce the same pairs as the
    exhaustive shingle self-join at the conformance operating point (n=5,
    threshold 0.5) — near-dup fixture pairs sit far above the 16-hash /
    8-band candidate threshold, so pruning costs no recall here. The plan
    difference is the point: the pruned form joins candidates on
    (band-bucket) then (id, shingle); the raw form self-joins shingles."""
    import os

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        import pytest

        pytest.skip("driver fixtures not present")
    from salesforce_plugin_spark.sources.catalog import load_table

    docs = load_table(spark, sf, "documents")
    pruned = ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.5)
    raw = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=5, threshold=0.5, prune=None
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, raw.collect())
    )
    # plan shape: the pruned form goes through the xxhash64 banding join
    pruned_plan = pruned._jdf.queryExecution().toString()
    raw_plan = raw._jdf.queryExecution().toString()
    assert "xxhash64" in pruned_plan
    assert "xxhash64" not in raw_plan


def test_simhash_similar_docs_close_in_hamming(spark):
    df = spark.createDataFrame(
        [
            (1, "spark makes big data processing fast and simple today"),
            (2, "spark makes big data processing fast and simple tonight"),
            (3, "quantum chromodynamics lattice gauge theory computations"),
        ],
        ["id", "t"],
    )
    sh = {r.id: r.simhash for r in simhash_table(df, "id", "t").collect()}
    pairs = spark.createDataFrame(
        [(sh[1], sh[2]), (sh[1], sh[3])], "a long, b long"
    ).select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()
    near, far = pairs[0].h, pairs[1].h
    assert near < far


def test_embedding_cosine_pairs_threshold_and_blocking(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.999, 0.01], 0), (3, [0.0, 1.0], 1)],
        "id long, v array<float>, blk int",
    )
    out = embedding_cosine_pairs(df, "id", "v", threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}
    blocked = embedding_cosine_pairs(df, "id", "v", threshold=-1.0, block_col="blk")
    assert {(r.id_a, r.id_b) for r in blocked.collect()} == {(1, 2)}  # cross-block pruned


# ---------------------------------------------------------------------------
# Winnowing fingerprints
# ---------------------------------------------------------------------------

def test_winnow_guarantee_shared_run(spark):
    """SIGMOD'03 guarantee: a shared token run of >= w+k-1 tokens (here 6)
    forces at least one common fingerprint."""
    from salesforce_plugin_spark.functions.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    df = spark.createDataFrame(
        [
            (1, f"intro one two {shared} tail xyz"),
            (2, f"completely different prefix {shared}"),
            (3, "no overlap here at all whatsoever truly"),
        ],
        ["id", "t"],
    )
    fps = winnow_fingerprints(df, "id", "t", k=3, w=4)
    by_id = {
        i: {r.fp for r in rows}
        for i, rows in __import__("itertools").groupby(
            sorted(fps.collect(), key=lambda r: r.id), key=lambda r: r.id
        )
    }
    assert by_id[1] & by_id[2], "docs sharing a 6-token run must share a fp"
    assert not (by_id[1] & by_id[3])


def test_winnow_short_docs(spark):
    from salesforce_plugin_spark.functions.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [
            (1, "only two"),               # < k tokens: no k-grams, no fps
            (2, "exactly three tokens"),   # 1 k-gram < w: single global-min fp
            (3, ""),                       # empty: tokenizes to [""], no fps
        ],
        ["id", "t"],
    )
    out = winnow_fingerprints(df, "id", "t", k=3, w=4).collect()
    assert {r.id for r in out} == {2}
    assert len(out) == 1


def test_winnow_density_bounded(spark):
    """Winnowing keeps far fewer fingerprints than the full k-gram set
    (expected density ~ 2/(w+1)) while staying deterministic."""
    from salesforce_plugin_spark.functions.dedup import winnow_fingerprints

    text = " ".join(f"tok{i % 37}x{i % 11}" for i in range(400))
    df = spark.createDataFrame([(1, text)], ["id", "t"])
    n_fp = winnow_fingerprints(df, "id", "t", k=3, w=8).count()
    n_grams = 400 - 2
    assert n_fp < n_grams / 2
    again = winnow_fingerprints(df, "id", "t", k=3, w=8).count()
    assert again == n_fp


def test_global_line_dedup_keeper_and_reassembly(spark):
    """First occurrence (lowest (id, line_no)) survives corpus-wide;
    later occurrences drop; documents reassemble in line order; a fully
    duplicated document disappears under min_kept=1."""
    from salesforce_plugin_spark.functions.dedup import global_line_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c x y z"),          # lines: "a b c", "x y z"
            (2, "x y z q r s"),          # "x y z" duped from doc 1
            (3, "A B C x y z"),          # both lines dupes (case-insens.)
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in global_line_dedup(df, "doc_id", "text", words_per_line=3).collect()
    }
    assert set(out) == {1, 2}  # doc 3 fully deduplicated away
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["cleaned"] == "a b c\nx y z"
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["cleaned"] == "q r s"


def test_global_line_dedup_min_kept_gate(spark):
    """min_kept=2 drops documents that keep only one line."""
    from salesforce_plugin_spark.functions.dedup import global_line_dedup

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f")],
        ["doc_id", "text"],
    )
    out = global_line_dedup(
        df, "doc_id", "text", words_per_line=3, min_kept=2
    ).collect()
    # doc 2's first line "a b c" loses to doc 1's (lower doc_id);
    # doc 2 keeps only "d e f" -> dropped; doc 1 keeps 1 line -> dropped
    assert out == []


def test_semantic_dedup_blocks_by_cluster_and_keeps_min(spark):
    """Two tight groups near opposite seed axes: in-cluster near-dups
    merge (min id keeps), and a cross-cluster near-pair does NOT merge —
    the documented SemDeDup blocking trade."""
    from salesforce_plugin_spark.functions.dedup import semantic_dedup

    rows = [
        # cluster around +x: 1,2 duplicates; 3 distinct direction
        (1, [1.0, 0.02, 0.0]),
        (2, [1.0, 0.01, 0.0]),
        (3, [0.6, 0.8, 0.0]),
        # cluster around -x: 4,5 duplicates
        (4, [-1.0, 0.0, 0.02]),
        (5, [-1.0, 0.0, 0.01]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [-1.0, 0.0, 0.0])],
        "cluster int, centroid array<double>",
    )
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            df, "vec_id", "embedding", seeds, threshold=0.95
        ).collect()
    }
    assert out[1].dup_group == 1 and out[1].keep
    assert out[2].dup_group == 1 and not out[2].keep
    assert out[3].dup_group == 3 and out[3].keep        # below threshold
    assert out[4].dup_group == 4 and out[4].keep
    assert out[5].dup_group == 4 and not out[5].keep
    assert out[1].cluster == 0 and out[4].cluster == 1


def test_semantic_dedup_chained_group_collapses_to_one_keeper(spark):
    """A ≈ B ≈ C chains within one cluster: the closure yields ONE
    keeper even when A and C are not directly above threshold."""
    import math

    from salesforce_plugin_spark.functions.dedup import semantic_dedup

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0]

    # pairwise cos: (a,b)=(b,c)=cos(18°)≈0.95, (a,c)=cos(36°)≈0.81
    rows = [(1, unit(0.0)), (2, unit(0.314159)), (3, unit(0.628318))]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "cluster int, centroid array<double>"
    )
    out = semantic_dedup(df, "vec_id", "embedding", seeds, threshold=0.9)
    rows_out = out.collect()
    assert {r.dup_group for r in rows_out} == {1}
    assert [r.vec_id for r in rows_out if r.keep] == [1]


def test_near_dedup_apply_equals_full_rebuild(spark):
    from salesforce_plugin_spark.functions.dedup import (
        minhash_signatures_portable,
        near_dedup_apply,
        near_dedup_clusters_portable,
        portable_bands,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "an entirely different document about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
        # batch
        (10, "the quick brown fox jumps over the lazy dog today"),  # dup of 1
        (11, "fresh unseen content with its own shingle set here"),
        (12, "an entirely different document about spark engines"),  # dup of 2
        (13, "xy"),                                                 # shingle-less
    ]
    kw = dict(num_hashes=8, bands=2, shingle_n=3)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    corpus = df.filter("doc_id < 10")
    batch = df.filter("doc_id >= 10")

    corpus_bands = portable_bands(
        minhash_signatures_portable(corpus, "doc_id", "text", 8, 3),
        "doc_id", 8, 2,
    )
    inc, new_bands = near_dedup_apply(
        corpus_bands, batch, "doc_id", "text", **kw
    )
    base = near_dedup_clusters_portable(corpus, "doc_id", "text", **kw)
    got = sorted(
        map(tuple, base.unionByName(inc).collect())
    )
    full = sorted(
        map(tuple, near_dedup_clusters_portable(df, "doc_id", "text", **kw).collect())
    )
    assert got == full
    by_id = dict(got)
    assert by_id[10] == 1 and by_id[12] == 2   # batch dups adopt corpus ids
    assert by_id[11] == 11 and by_id[13] == 13  # fresh + shingle-less singleton
    # the appended state is one band row set per batch doc with shingles
    assert new_bands.select("doc_id").distinct().count() == 3


# --- directional containment ---

def test_containment_finds_quoted_doc_jaccard_misses(spark):
    from salesforce_plugin_spark.functions.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon"
    long = (
        "intro words here now " + short + " plus a very long tail "
        "of unrelated filler text that dilutes the jaccard overlap "
        "far below any banding threshold used by minhash pipelines"
    )
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "completely different content entirely")],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r.contain_pct for r in containment_pairs(
        df, "doc_id", "text", shingle_n=3, max_df=10, threshold_pct=80
    ).collect()}
    assert out.get((1, 2)) == 100        # short fully contained in long
    assert (2, 1) not in out             # reverse direction is far below
    assert all(a != 3 and b != 3 for a, b in out)


def test_containment_rejects_bad_params(spark):
    import pytest as _pytest

    from salesforce_plugin_spark.functions.dedup import containment_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        containment_pairs(df, "doc_id", "text", threshold_pct=0)
    with _pytest.raises(ValueError):
        containment_pairs(df, "doc_id", "text", max_df=1)


def test_novelty_scores_boilerplate_vs_unique(spark):
    from salesforce_plugin_spark.functions.dedup import novelty_scores

    boiler = "terms of service apply to all users"
    df = spark.createDataFrame(
        [(1, boiler), (2, boiler), (3, "entirely unique snowflake content here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.novelty_ppm for r in novelty_scores(
        df, "doc_id", "text"
    ).collect()}
    assert out[1] == 0 and out[2] == 0    # every shingle shared
    assert out[3] == 1000000              # nothing corroborated


# --- cross-set embedding decontamination ---

def test_embedding_decontaminate_removes_only_near_probe(spark):
    from salesforce_plugin_spark.functions.dedup import (
        cross_contaminated_ids,
        embedding_decontaminate,
    )

    # corpus: one vector identical to the probe, one orthogonal-ish,
    # one near-opposite (different bucket -> blocking never sees it)
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.5, 0.25]),
            (2, [-0.5, 1.0, -0.25]),
            (3, [-1.0, -0.5, -0.25]),
        ],
        "id long, v array<double>",
    )
    probe = spark.createDataFrame([(9, [1.0, 0.5, 0.25])], "id long, v array<double>")
    bad = {r.id for r in cross_contaminated_ids(corpus, probe, "id", "v", 0.9, bits=3).collect()}
    assert bad == {1}
    kept = {r.id for r in embedding_decontaminate(corpus, probe, "id", "v", 0.9, bits=3).collect()}
    assert kept == {2, 3}


def test_embedding_decontaminate_bucket_blocking_bounds_recall(spark):
    from salesforce_plugin_spark.functions.dedup import cross_contaminated_ids

    # same direction but sign-flipped first dim -> different bucket:
    # blocked candidate set misses it even at a permissive threshold
    corpus = spark.createDataFrame(
        [(1, [-0.001, 1.0, 1.0])], "id long, v array<double>"
    )
    probe = spark.createDataFrame(
        [(9, [0.001, 1.0, 1.0])], "id long, v array<double>"
    )
    assert cross_contaminated_ids(corpus, probe, "id", "v", 0.5, bits=3).count() == 0
    # bits=1 on a shared-sign dim recovers it (fewer bits = higher recall)
    corpus2 = spark.createDataFrame([(1, [1.0, 1.0, -0.5])], "id long, v array<double>")
    probe2 = spark.createDataFrame([(9, [1.0, 0.9, -0.4])], "id long, v array<double>")
    assert cross_contaminated_ids(corpus2, probe2, "id", "v", 0.5, bits=1).count() == 1
