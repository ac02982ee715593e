"""Round-6 breadth operators: portable HLL (+ linear counting), k-NN
label classification, association rules, unigram surprisal."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestHLL:
    def test_small_range_linear_counting_near_exact(self, spark):
        """At n << m the raw HLL estimator is known-biased; the pinned
        linear-counting table must bring the estimate within a few
        counts of truth."""
        from salesforce_plugin_spark.functions.sketch import hll_error_eval

        df = spark.createDataFrame(
            [("g", i) for i in range(20)], "grp string, v long"
        )
        row = hll_error_eval(df, "grp", "v").collect()[0]
        assert row.true_distinct == 20
        assert abs(row.err) <= 4

    def test_mid_range_within_published_sigma(self, spark):
        """n = 500 at m = 64: σ ≈ 1.04/√64 = 13%; allow 3σ."""
        from salesforce_plugin_spark.functions.sketch import hll_error_eval

        df = spark.createDataFrame(
            [("g", i * 7919) for i in range(500)], "grp string, v long"
        )
        row = hll_error_eval(df, "grp", "v").collect()[0]
        assert abs(row.err) <= 0.39 * 500

    def test_duplicates_do_not_move_registers(self, spark):
        """Cardinality sketch: multiplicity must be invisible."""
        from salesforce_plugin_spark.functions.sketch import hll_distinct

        once = spark.createDataFrame(
            [("g", i) for i in range(100)], "grp string, v long"
        )
        many = spark.createDataFrame(
            [("g", i) for i in range(100) for _ in range(5)],
            "grp string, v long",
        )
        a = hll_distinct(once, ["grp"], "v").collect()[0].est_distinct
        b = hll_distinct(many, ["grp"], "v").collect()[0].est_distinct
        assert a == b

    def test_ln_table_matches_math_log(self):
        """The pinned table IS round(1e6·ln(64/V)) — the contract."""
        from salesforce_plugin_spark.functions.sketch import LN64_TABLE_PPM

        assert len(LN64_TABLE_PPM) == 64
        for v in (1, 2, 5, 32, 63, 64):
            assert LN64_TABLE_PPM[v - 1] == round(1e6 * math.log(64 / v))


class TestKnnClassify:
    def test_separable_clusters_classify_perfectly(self, spark):
        """Two well-separated directions: every holdout row must get
        its own cluster's label."""
        from salesforce_plugin_spark.functions.vector import knn_classify

        rows = []
        for i in range(40):
            if i % 2 == 0:
                vec, lbl = [1.0, 0.0 + i * 1e-4], 0
            else:
                vec, lbl = [0.0 + i * 1e-4, 1.0], 1
            rows.append((i, vec, lbl))
        df = spark.createDataFrame(rows, "id long, v array<float>, lbl int")
        out = knn_classify(df, "id", "v", "lbl", k=3, holdout_mod=10)
        got = {r.id: (r.lbl, r.pred_label, r.correct) for r in out.collect()}
        assert set(got) == {0, 10, 20, 30}
        for _id, (lbl, pred, correct) in got.items():
            assert pred == lbl and correct == 1

    def test_vote_tie_breaks_to_smaller_label(self, spark):
        """k=2 with one neighbor of each label: tie → smaller label."""
        from salesforce_plugin_spark.functions.vector import knn_classify

        df = spark.createDataFrame(
            [
                (10, [1.0, 0.0], 9),  # query (10 % 10 == 0)
                (1, [1.0, 0.01], 5),
                (2, [1.0, -0.01], 3),
            ],
            "id long, v array<float>, lbl int",
        )
        out = knn_classify(df, "id", "v", "lbl", k=2, holdout_mod=10)
        row = out.collect()[0]
        assert row.pred_label == 3 and row.correct == 0


class TestAssocRules:
    def test_hand_computed_confidence_and_lift(self, spark):
        """4 baskets: {a,b} ×3, {a} ×1 ⇒ supp(ab)=3, supp(a)=4,
        supp(b)=3, N=4. conf(a→b)=750000; lift=(3·4)/(4·3)=10⁶ exactly;
        conf(b→a)=10⁶."""
        from salesforce_plugin_spark.operators.analytics import assoc_rules

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
                (3, "a"), (3, "b"), (4, "a")]
        df = spark.createDataFrame(rows, "bk int, it string")
        out = {
            (r.antecedent, r.consequent): (r.support, r.conf_ppm, r.lift_ppm)
            for r in assoc_rules(df, "bk", "it", min_support=2).collect()
        }
        assert out[("a", "b")] == (3, 750000, 1000000)
        assert out[("b", "a")] == (3, 1000000, 1000000)

    def test_negative_association_lift_below_one(self, spark):
        """Items that co-occur LESS than independence predicts get
        lift < 10⁶."""
        from salesforce_plugin_spark.operators.analytics import assoc_rules

        # a in 4 baskets, b in 4 baskets, together only once; N=7
        rows = (
            [(i, "a") for i in range(1, 5)]
            + [(i, "b") for i in range(4, 8)]
        )
        df = spark.createDataFrame(rows, "bk int, it string")
        out = {
            (r.antecedent, r.consequent): r.lift_ppm
            for r in assoc_rules(df, "bk", "it", min_support=1).collect()
        }
        # lift = 1·7·10⁶/(4·4) = 437500
        assert out[("a", "b")] == 437500

    def test_multiplicity_inside_basket_ignored(self, spark):
        from salesforce_plugin_spark.operators.analytics import assoc_rules

        rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
        df = spark.createDataFrame(rows, "bk int, it string")
        out = assoc_rules(df, "bk", "it", min_support=2).collect()
        sup = {(r.antecedent, r.consequent): r.support for r in out}
        assert sup[("a", "b")] == 2


class TestUnigramSurprisal:
    def test_uniform_corpus_bits_exact(self, spark):
        """4 docs of one token each, all distinct ⇒ N=4, c=1 per token,
        bits = ⌊log₂ 4⌋ = 2 per token."""
        from salesforce_plugin_spark.functions.text import unigram_surprisal

        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(["aa", "bb", "cc", "dd"])],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in unigram_surprisal(df, "doc_id", "text").collect()}
        for r in out.values():
            assert (r.n_tokens, r.surprisal_bits, r.bits_per_token_ppm) == (
                1, 2, 2000000,
            )

    def test_common_token_scores_zero_bits(self, spark):
        """A token that IS most of the corpus has N div c = 1 ⇒ 0 bits;
        the rare token carries the surprisal."""
        from salesforce_plugin_spark.functions.text import unigram_surprisal

        df = spark.createDataFrame(
            [(1, "the the the the the the the rare")],
            "doc_id long, text string",
        )
        r = unigram_surprisal(df, "doc_id", "text").collect()[0]
        # N=8; 'the' c=7 → 8 div 7 = 1 → 0 bits; 'rare' c=1 → 8 → 3 bits
        assert r.n_tokens == 8
        assert r.surprisal_bits == 3
        assert r.bits_per_token_ppm == 375000


class TestStreamRegisters:
    def test_max_merge_replay_idempotent(self, spark):
        """Register state max-merged from overlapping partial builds
        must equal the one-shot build — the at-least-once-safety claim
        of the streaming HLL face."""
        from salesforce_plugin_spark.functions.sketch import (
            hll_distinct,
            hll_registers,
        )

        df = spark.createDataFrame(
            [("g", i) for i in range(300)], "grp string, v long"
        )
        a = hll_registers(df.filter("v < 200"), ["grp"], "v")
        b = hll_registers(df.filter("v >= 100"), ["grp"], "v")  # overlap
        merged = (
            a.unionByName(b)
            .groupBy("grp", "bucket")
            .agg(F.max("m_j").alias("m_j"))
        )
        from salesforce_plugin_spark.functions.sketch import (
            hll_estimate_from_registers,
        )

        est_m = hll_estimate_from_registers(merged, ["grp"]).collect()[0]
        est_1 = hll_distinct(df, ["grp"], "v").collect()[0]
        assert est_m.est_distinct == est_1.est_distinct


class TestQuantError:
    def test_identical_vectors_zero_error(self, spark):
        """Identical adjacent vectors: both quantizations give cos =
        10⁶ exactly, so the measured error is 0."""
        from salesforce_plugin_spark.functions.vector import quant_error_eval

        df = spark.createDataFrame(
            [(1, [0.5, 0.25, -0.125]), (2, [0.5, 0.25, -0.125])],
            "id long, v array<float>",
        )
        r = quant_error_eval(df, "id", "v").collect()[0]
        assert (r.cos_ref_ppm, r.cos_int8_ppm, r.err_ppm) == (
            1000000, 1000000, 0,
        )

    def test_error_bounded_for_generic_pairs(self, spark):
        """int8 keeps ~7 bits per component: cosine error on
        well-scaled vectors stays within ~2% (2·10⁴ ppm)."""
        from salesforce_plugin_spark.functions.vector import quant_error_eval

        rows = [
            (i, [((i * 37 + j * 11) % 19 - 9) / 10.0 for j in range(8)])
            for i in range(1, 30)
        ]
        df = spark.createDataFrame(rows, "id long, v array<float>")
        out = quant_error_eval(df, "id", "v").collect()
        assert len(out) == 28
        assert all(abs(r.err_ppm) < 20000 for r in out)

    def test_zero_vector_surfaces_null(self, spark):
        from salesforce_plugin_spark.functions.vector import quant_error_eval

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id long, v array<float>"
        )
        r = quant_error_eval(df, "id", "v").collect()[0]
        assert r.cos_ref_ppm is None and r.cos_int8_ppm is None


class TestDeterministicWalks:
    def test_forced_path_followed(self, spark):
        """A path graph 1-2-3-4-5 from seed 1: step 1 must go to 2;
        subsequent hops are hash-chosen between the two neighbors but
        every emitted node must be adjacent to its predecessor."""
        from salesforce_plugin_spark.functions.graph import deterministic_walks

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(1,)], "id long")
        out = {
            r.step: r.node
            for r in deterministic_walks(edges, seeds, steps=3).collect()
        }
        assert out[0] == 1 and out[1] == 2
        adj = {(1, 2), (2, 3), (3, 4), (4, 5)}
        for s in (2, 3):
            a, b = out[s - 1], out[s]
            assert (min(a, b), max(a, b)) in adj

    def test_isolated_seed_stops_at_step_zero(self, spark):
        from salesforce_plugin_spark.functions.graph import deterministic_walks

        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        seeds = spark.createDataFrame([(9,)], "id long")
        out = deterministic_walks(edges, seeds, steps=3).collect()
        assert [(r.walk_id, r.step, r.node) for r in out] == [(9, 0, 9)]

    def test_replay_identical(self, spark):
        from salesforce_plugin_spark.functions.graph import deterministic_walks

        edges = spark.createDataFrame(
            [(i, (i * 3) % 7 + 10) for i in range(7)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(0,), (1,)], "id long")
        a = sorted(map(tuple, deterministic_walks(edges, seeds, 4).collect()))
        b = sorted(map(tuple, deterministic_walks(edges, seeds, 4).collect()))
        assert a == b


class TestQuantileError:
    def test_exact_within_one_bin(self, spark):
        """Uniform 0..99 values with bin width 0.5: estimate must sit
        within one bin width above the exact order statistic."""
        from salesforce_plugin_spark.functions.sketch import (
            quantile_error_eval,
        )

        df = spark.createDataFrame(
            [(float(i),) for i in range(100)], "value double"
        )
        out = {
            r.q: r
            for r in quantile_error_eval(
                df, "value", [0.5, 0.9], 0.0, 500.0, 1000
            ).collect()
        }
        for r in out.values():
            assert 0 <= r.err_milli <= 500
        # p50 of 0..99: k = ceil(0.5·100) = 50 → value 49.0
        assert out[0.5].true_milli == 49000


class TestSaltedDistinct:
    def test_equals_plain_count_distinct(self, spark):
        from salesforce_plugin_spark.operators.partitioning import (
            salted_count_distinct,
        )

        rows = [("a", i % 17) for i in range(200)] + [
            ("b", i % 5) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "g string, v long")
        got = {
            r.g: r.n_distinct
            for r in salted_count_distinct(df, ["g"], "v", salt=8).collect()
        }
        assert got == {"a": 17, "b": 5}

    def test_salt_one_value_groups(self, spark):
        """All rows share one value: exactly 1 distinct regardless of
        which shard it hashes into."""
        from salesforce_plugin_spark.operators.partitioning import (
            salted_count_distinct,
        )

        df = spark.createDataFrame(
            [("g", 42)] * 30, "g string, v long"
        )
        out = salted_count_distinct(df, ["g"], "v", salt=16).collect()
        assert out[0].n_distinct == 1


class TestLinkPrediction:
    def test_hand_computed_scores(self, spark):
        """Hubs {1:{a,b}, 2:{a,b}, 3:{a,b,c}}: pair (a,b) common=3,
        deg_a=deg_b=3 → jaccard = 3/(3+3-3) = 10⁶; aa = 1000//1 +
        1000//1 + 1000//2 = 2500 (hub sizes 2,2,3 → bits 2,2,2 →
        wait: bin(2)='10' len 2, bin(3)='11' len 2 → 500·3 = 1500)."""
        from salesforce_plugin_spark.functions.graph import link_prediction

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
                (3, "a"), (3, "b"), (3, "c")]
        df = spark.createDataFrame(rows, "hub int, n string")
        out = {
            (r.node_a, r.node_b): (r.common, r.jaccard_ppm, r.aa_milli)
            for r in link_prediction(df, "hub", "n", min_common=1).collect()
        }
        # hub degrees: 1→2, 2→2, 3→3; bits: bin(2)=2, bin(3)=2 → 500 each
        assert out[("a", "b")] == (3, 1000000, 1500)
        # (a,c): common=1 (hub 3), deg_a=3, deg_c=1 → j = 10⁶/3 = 333333
        assert out[("a", "c")] == (1, 333333, 500)

    def test_big_hub_damped_below_small_hub(self, spark):
        """Integer Adamic-Adar: a shared 2-node hub contributes
        1000//2bits=500; a shared 16-node hub only 1000//5 = 200."""
        from salesforce_plugin_spark.functions.graph import link_prediction

        small = [(1, "a"), (1, "b")]
        big = [(2, chr(99 + i)) for i in range(14)] + [(2, "a"), (2, "b")]
        df = spark.createDataFrame(small + big, "hub int, n string")
        out = {
            (r.node_a, r.node_b): r.aa_milli
            for r in link_prediction(df, "hub", "n", min_common=1).collect()
        }
        # (a,b) shares hub1 (deg2→bits2→500) + hub2 (deg16→bits5→200)
        assert out[("a", "b")] == 700


class TestPerceptualAhash:
    def test_identical_payloads_distance_zero(self, spark):
        from salesforce_plugin_spark.functions.multimodal import (
            perceptual_ahash_pairs,
        )

        rows = [(1, b"abcdefgh" * 8), (2, b"abcdefgh" * 8), (3, b"\x00" * 64)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = perceptual_ahash_pairs(df, "doc_id", "payload").collect()
        got = {(r.id_a, r.id_b): r.hamming for r in out}
        assert got[(1, 2)] == 0
        assert (1, 3) not in got or got[(1, 3)] <= 1

    def test_one_flipped_segment_is_distance_one(self, spark):
        """Payload B inverts one 8-byte segment of A's byte pattern so
        exactly one mean bit flips — must pair at hamming 1."""
        from salesforce_plugin_spark.functions.multimodal import (
            perceptual_ahash_pairs,
        )

        # 8 segments of 8 bytes; alternate low/high segments
        a = (b"\x01" * 8 + b"\xf0" * 8) * 4
        b = bytearray(a)
        b[0:8] = b"\xf0" * 8  # raise segment 0 above the mean
        df = spark.createDataFrame(
            [(1, bytes(a)), (2, bytes(b))], "doc_id long, payload binary"
        )
        out = perceptual_ahash_pairs(df, "doc_id", "payload").collect()
        got = {(r.id_a, r.id_b): r.hamming for r in out}
        assert got.get((1, 2)) == 1

    def test_distance_two_not_paired(self, spark):
        from salesforce_plugin_spark.functions.multimodal import (
            perceptual_ahash_pairs,
        )

        a = (b"\x01" * 8 + b"\xf0" * 8) * 4
        b = bytearray(a)
        b[0:8] = b"\xf0" * 8
        b[16:24] = b"\xf0" * 8  # flip two segments
        df = spark.createDataFrame(
            [(1, bytes(a)), (2, bytes(b))], "doc_id long, payload binary"
        )
        out = perceptual_ahash_pairs(df, "doc_id", "payload").collect()
        assert out == []


class TestWilson:
    def test_small_sample_does_not_outrank_large(self, spark):
        """3/3 vs 900/1000: raw rate says 3/3 wins; Wilson LB must
        rank the large sample higher."""
        from salesforce_plugin_spark.operators.analytics import wilson_quality

        rows = [("tiny", 1)] * 3 + [("big", 1)] * 900 + [("big", 0)] * 100
        df = spark.createDataFrame(rows, "g string, ok int")
        out = {r.g: r for r in wilson_quality(df, ["g"], F.col("ok")).collect()}
        assert out["tiny"].rate_ppm == 1000000
        assert out["big"].rate_ppm == 900000
        assert out["big"].wilson_lb_ppm > out["tiny"].wilson_lb_ppm

    def test_matches_float_wilson_within_5ppm(self, spark):
        import math

        from salesforce_plugin_spark.operators.analytics import wilson_quality

        rows = (
            [("a", 1)] * 17 + [("a", 0)] * 8
            + [("b", 1)] * 999 + [("b", 0)] * 1
            + [("c", 0)] * 10
        )
        df = spark.createDataFrame(rows, "g string, ok int")
        for r in wilson_quality(df, ["g"], F.col("ok")).collect():
            p, z = r.s / r.n, 1.96
            lb = (
                p + z * z / (2 * r.n)
                - z * math.sqrt((p * (1 - p) + z * z / (4 * r.n)) / r.n)
            ) / (1 + z * z / r.n)
            assert abs(lb * 1e6 - r.wilson_lb_ppm) < 5

    def test_zero_successes_bound_zero_clamped(self, spark):
        from salesforce_plugin_spark.operators.analytics import wilson_quality

        df = spark.createDataFrame([("g", 0)] * 4, "g string, ok int")
        r = wilson_quality(df, ["g"], F.col("ok")).collect()[0]
        assert r.wilson_lb_ppm == 0 and r.rate_ppm == 0


class TestDbscanRoles:
    def test_dense_cluster_core_border_noise(self, spark):
        """Unit vectors at angles 0/5/10/15/20/35 deg with eps = cos 12
        deg (neighbors = within 10 deg) and min_pts=4: 5/10/15 deg have
        >= 3 neighbors (core), 0/20 deg have 2 but touch a core
        (border), 35 deg touches nothing (noise)."""
        import math

        from salesforce_plugin_spark.functions.vector import dbscan_roles

        angles = [0, 5, 10, 15, 20, 35]
        rows = [
            (i, [math.cos(math.radians(a)), math.sin(math.radians(a))])
            for i, a in enumerate(angles)
        ]
        df = spark.createDataFrame(rows, "id long, v array<float>")
        out = {
            r.id: r.role
            for r in dbscan_roles(
                df, "id", "v", eps_ppm=978000, min_pts=4
            ).collect()
        }
        assert out == {
            0: "border", 1: "core", 2: "core", 3: "core",
            4: "border", 5: "noise",
        }

    def test_cross_bucket_neighbors_missed_documented_trade(self, spark):
        """Two identical vectors in different sign buckets never pair —
        the documented LSH recall trade."""
        from salesforce_plugin_spark.functions.vector import dbscan_roles

        df = spark.createDataFrame(
            [(1, [1.0, 1.0]), (2, [-1.0, -1.0])],
            "id long, v array<float>",
        )
        out = {
            r.id: r.role
            for r in dbscan_roles(
                df, "id", "v", eps_ppm=500000, min_pts=2, target_bucket=1
            ).collect()
        }
        assert out == {1: "noise", 2: "noise"}


class TestDbscanClusters:
    def test_two_chains_two_clusters_border_noise(self, spark):
        """Angles 0..20 form one ε-chain (cluster A: cores 5/10/15 at
        min_pts=4, with 0 and 20 as borders); angles 60..80 a second;
        35 deg is noise. Clusters must be distinct and min-core-id
        labeled."""
        import math

        from salesforce_plugin_spark.functions.vector import dbscan_clusters

        angles = [0, 5, 10, 15, 20, 35, 60, 65, 70, 75, 80]
        rows = [
            (i, [math.cos(math.radians(a)), math.sin(math.radians(a))])
            for i, a in enumerate(angles)
        ]
        df = spark.createDataFrame(rows, "id long, v array<float>")
        out = {
            r.id: (r.role, r.cluster)
            for r in dbscan_clusters(
                df, "id", "v", eps_ppm=978000, min_pts=4
            ).collect()
        }
        assert out[5] == ("noise", None)
        # chain 1: cores 1,2,3 -> cluster 1; borders 0,4
        for i in (1, 2, 3):
            assert out[i] == ("core", 1)
        for i in (0, 4):
            assert out[i] == ("border", 1)
        # chain 2: cores 7,8,9 -> cluster 7; borders 6,10
        for i in (7, 8, 9):
            assert out[i] == ("core", 7)
        for i in (6, 10):
            assert out[i] == ("border", 7)


class TestErasureImpact:
    def test_direct_and_bridged_counts(self, spark):
        from salesforce_plugin_spark.operators.validate import erasure_impact

        subj = spark.createDataFrame([(1,), (2,)], "k long")
        orders = spark.createDataFrame(
            [(10, 1), (11, 1), (12, 2), (13, 9)], "ok long, ck long"
        )
        items = spark.createDataFrame(
            [(10, "a"), (10, "b"), (12, "c"), (13, "d")],
            "ok long, item string",
        )
        bridge = orders.filter(F.col("ck").isin(1, 2))
        out = {
            r.table: (r.n_rows, r.n_keys)
            for r in erasure_impact(
                subj,
                "k",
                [
                    ("orders", orders, "ck"),
                    ("items", items, "ok", bridge, "ok"),
                ],
            ).collect()
        }
        assert out["orders"] == (3, 2)
        assert out["items"] == (3, 2)  # rows 10,10,12; keys 10,12


class TestBlockingRecall:
    def test_identical_docs_full_recall_at_high_threshold(self, spark):
        from salesforce_plugin_spark.functions.dedup import (
            blocking_recall_eval,
        )

        text = "the quick brown fox jumps over the lazy dog again"
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, "completely different words here now ok")],
            "doc_id long, text string",
        )
        r = {
            row.threshold_ppm: row
            for row in blocking_recall_eval(
                df, "doc_id", "text", thresholds_ppm=[900000]
            ).collect()
        }[900000]
        assert (r.n_true, r.n_hit, r.recall_ppm) == (1, 1, 1000000)

    def test_empty_truth_recall_null(self, spark):
        from salesforce_plugin_spark.functions.dedup import (
            blocking_recall_eval,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "one two three four")],
            "doc_id long, text string",
        )
        r = blocking_recall_eval(
            df, "doc_id", "text", thresholds_ppm=[500000]
        ).collect()[0]
        assert r.n_true == 0 and r.recall_ppm is None


class TestAbTest:
    def test_matches_float_z(self, spark):
        import math

        from salesforce_plugin_spark.operators.analytics import ab_test_z

        rows = (
            [(0, 1)] * 120 + [(0, 0)] * 380
            + [(1, 1)] * 180 + [(1, 0)] * 320
        )
        df = spark.createDataFrame(rows, "arm int, ok int")
        r = ab_test_z(df, F.col("arm"), F.col("ok") == 1).collect()[0]
        p1, p2 = r.s1 / r.n1, r.s2 / r.n2
        pp = (r.s1 + r.s2) / (r.n1 + r.n2)
        z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / r.n1 + 1 / r.n2))
        assert abs(z * 1000 - r.z_milli) <= 1
        assert r.significant == (1 if abs(z) >= 1.96 else 0)
        # B lifts: diff negative, z negative, clearly significant
        assert r.z_milli < -1960 and r.significant == 1
        assert r.diff_ppm == -120000

    def test_no_variance_surfaces_null(self, spark):
        from salesforce_plugin_spark.operators.analytics import ab_test_z

        df = spark.createDataFrame(
            [(0, 1)] * 5 + [(1, 1)] * 5, "arm int, ok int"
        )
        r = ab_test_z(df, F.col("arm"), F.col("ok") == 1).collect()[0]
        assert r.z_milli is None and r.significant == 0


class TestCalibration:
    def test_perfectly_calibrated_score(self, spark):
        """Score IS the probability (ppm): each bin's rate must track
        its mean score."""
        from salesforce_plugin_spark.operators.analytics import (
            calibration_bins,
        )

        rows = []
        for score_ppm, rate in ((100000, 0.1), (500000, 0.5), (900000, 0.9)):
            for i in range(100):
                rows.append((score_ppm, 1 if i < rate * 100 else 0))
        df = spark.createDataFrame(rows, "score long, ok int")
        out = {
            r.bin: r
            for r in calibration_bins(
                df, F.col("score"), F.col("ok") == 1, 0, 1000000, 10
            ).collect()
        }
        assert out[1].rate_ppm == 100000
        assert out[5].rate_ppm == 500000
        assert out[9].rate_ppm == 900000
        assert out[5].mean_score_milli == 500000 * 1000

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        from salesforce_plugin_spark.operators.analytics import (
            calibration_bins,
        )

        df = spark.createDataFrame(
            [(-50, 1), (2000, 0)], "score long, ok int"
        )
        out = {
            r.bin: r.n
            for r in calibration_bins(
                df, F.col("score"), F.col("ok") == 1, 0, 1000, 10
            ).collect()
        }
        assert out == {0: 1, 9: 1}


class TestAdditiveSums:
    def test_partial_sums_merge_to_batch_totals(self, spark, tmp_path):
        """The additive-sums fold contract at the unit level: manually
        written partial (n, sum) rows merge to the exact batch
        aggregate."""
        from salesforce_plugin_spark.streaming.upsert import read_summed_sums

        state = str(tmp_path / "state")
        a = spark.createDataFrame(
            [("x", 2, 30), ("y", 1, 5)], "g string, n long, sum_v long"
        )
        b = spark.createDataFrame(
            [("x", 3, 70)], "g string, n long, sum_v long"
        )
        a.write.mode("append").parquet(state)
        b.write.mode("append").parquet(state)
        out = {
            r.g: (r.n, r.sum_v)
            for r in read_summed_sums(spark, state, ["g"], ["v"]).collect()
        }
        assert out == {"x": (5, 100), "y": (1, 5)}


class TestSSSP:
    def test_cheaper_two_hop_beats_direct_edge(self, spark):
        """Weighted semantics: a 2-edge path of total weight 6 must win
        over the direct weight-10 edge (khop would stop at 1 hop)."""
        from salesforce_plugin_spark.functions.graph import sssp_fixed

        edges = spark.createDataFrame(
            [(1, 3, 10), (1, 2, 3), (2, 3, 3)], "src long, dst long, w long"
        )
        seeds = spark.createDataFrame([(1,)], "id long")
        out = {r.node: r.dist for r in sssp_fixed(edges, seeds, rounds=3).collect()}
        assert out == {1: 0, 2: 3, 3: 6}

    def test_round_bound_limits_path_length(self, spark):
        """rounds=1 can only see 1-edge paths: the direct edge wins."""
        from salesforce_plugin_spark.functions.graph import sssp_fixed

        edges = spark.createDataFrame(
            [(1, 3, 10), (1, 2, 3), (2, 3, 3)], "src long, dst long, w long"
        )
        seeds = spark.createDataFrame([(1,)], "id long")
        out = {r.node: r.dist for r in sssp_fixed(edges, seeds, rounds=1).collect()}
        assert out == {1: 0, 2: 3, 3: 10}

    def test_undirected_and_multi_seed_min(self, spark):
        """Edges relax in both directions; with two seeds each node
        takes the min over seed distances; unreachable nodes absent."""
        from salesforce_plugin_spark.functions.graph import sssp_fixed

        edges = spark.createDataFrame(
            [(2, 1, 5), (2, 3, 1), (4, 3, 1), (8, 9, 1)],
            "src long, dst long, w long",
        )
        seeds = spark.createDataFrame([(1,), (4,)], "id long")
        out = {r.node: r.dist for r in sssp_fixed(edges, seeds, rounds=3).collect()}
        assert out[1] == 0 and out[4] == 0
        assert out[3] == 1        # via seed 4
        assert out[2] == 2        # via 4-3-2, beating 1-2 (5)
        assert 8 not in out and 9 not in out


class TestZscoreFromStats:
    def test_injected_stats_reproduce_batch_flags(self, spark):
        """The stats-injection variant must flag identically to the
        self-computing batch operator when fed the exact BIGINT moments
        it would have computed itself."""
        from salesforce_plugin_spark.operators.analytics import (
            zscore_from_stats,
            zscore_outliers,
        )

        df = spark.createDataFrame(
            [("a", i, float(v)) for i, v in enumerate([1, 2, 1, 2, 50])]
            + [("b", 10 + i, float(v)) for i, v in enumerate([5, 5, 5])],
            "grp string, rid long, value double",
        )
        qv = F.round(F.col("value") * 100, 0).cast("long")
        stats = (
            df.select("grp", qv.alias("qv"))
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("qv").alias("sum_qv"),
                F.sum(F.col("qv") * F.col("qv")).alias("sum_qv2"),
            )
        )
        got = {
            r.rid: r.is_anomaly
            for r in zscore_from_stats(
                df, "value", ["grp"], stats,
                n_col="n", s_col="sum_qv", q2_col="sum_qv2",
                k_num=3, k_den=2, quant=100,
            ).collect()
        }
        want = {
            r.rid: r.is_anomaly
            for r in zscore_outliers(
                df, "value", ["grp"], k_num=3, k_den=2, quant=100
            ).collect()
        }
        assert got == want
        assert got[4] is True      # the 50 among 1s and 2s
        assert got[10] is False    # constant group: zero variance, no flag


class TestKAnonymity:
    def test_class_sizes_l_counts_and_risk_flag(self, spark):
        from salesforce_plugin_spark.operators.validate import (
            k_anonymity_audit,
        )

        df = spark.createDataFrame(
            [("US", "A", 1), ("US", "A", 1), ("US", "A", 2),
             ("US", "B", 5), ("FR", "A", 9)],
            "nat string, seg string, sens long",
        )
        out = {
            (r.nat, r.seg): (r.k, r.l, r.at_risk)
            for r in k_anonymity_audit(
                df, ["nat", "seg"], "sens", k_min=3
            ).collect()
        }
        assert out[("US", "A")] == (3, 2, False)
        assert out[("US", "B")] == (1, 1, True)
        assert out[("FR", "A")] == (1, 1, True)

    def test_no_sensitive_column_zero_fills_l(self, spark):
        from salesforce_plugin_spark.operators.validate import (
            k_anonymity_audit,
        )

        df = spark.createDataFrame([("US", 1)], "nat string, x long")
        row = k_anonymity_audit(df, ["nat"], None, k_min=2).collect()[0]
        assert (row.k, row.l, row.at_risk) == (1, 0, True)

    def test_empty_quasi_cols_raises(self, spark):
        from salesforce_plugin_spark.operators.validate import (
            k_anonymity_audit,
        )

        with pytest.raises(ValueError):
            k_anonymity_audit(spark.range(1), [], None)


class TestNDCG:
    def test_discount_table_pinned_and_monotone(self):
        from salesforce_plugin_spark.functions.vector import ndcg_discounts

        d = ndcg_discounts(10)
        assert d[0] == 1_000_000          # rank 1: log2(2) = 1
        assert d[2] == 500_000            # rank 3: log2(4) = 2
        assert all(a > b for a, b in zip(d, d[1:]))

    def test_exhaustive_probe_is_perfect(self, spark):
        """nprobe covering every list makes ANN == exact: ndcg = 10^6
        and dcg == idcg for every query."""
        from salesforce_plugin_spark.functions.vector import (
            ann_ndcg,
            as_double,
        )

        rows = [
            (i, [float(i % 3) + 0.1 * i, float((i * 7) % 5), 1.0])
            for i in range(12)
        ]
        e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        seeds = e.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("centroid_id"),
            as_double(F.col("embedding")).alias("c_vec"),
        )
        queries = e.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"),
            as_double(F.col("embedding")).alias("q_vec"),
        )
        out = ann_ndcg(
            e, "vec_id", "embedding", seeds, queries, k=5, nprobe=2
        ).collect()
        assert len(out) == 3
        for r in out:
            assert r.ndcg_ppm == 1_000_000
            assert r.dcg == r.idcg > 0


class TestLouvainStep:
    EDGES = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]

    def _edges(self, spark):
        return spark.createDataFrame(self.EDGES, "src long, dst long")

    def test_singleton_first_sweep_argmax_and_ties(self, spark):
        """Barbell of two triangles: hand-computed gain argmax per node
        (2m·1 − k_i·k_j), including node 3's 8-vs-8 tie broken to the
        smaller community label."""
        from salesforce_plugin_spark.functions.graph import louvain_step

        out = {
            r.node: (r.new_label, r.moved)
            for r in louvain_step(self._edges(spark)).collect()
        }
        assert out == {
            1: (2, True), 2: (1, True), 3: (1, True),
            4: (5, True), 5: (6, True), 6: (5, True),
        }

    def test_optimal_partition_is_a_fixed_point(self, spark):
        """With the two triangles already grouped, staying put wins the
        argmax for every node (own-community score includes the Σ\\{i}
        correction) — no row moves."""
        from salesforce_plugin_spark.functions.graph import louvain_step

        comm = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
            "id long, label long",
        )
        out = louvain_step(self._edges(spark), comm).collect()
        assert all(not r.moved for r in out)
        assert {r.node: r.new_label for r in out} == {
            1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4
        }


class TestDistinctSetFold:
    def test_set_state_is_replay_safe(self, spark, tmp_path):
        """Appending overlapping batch projections then deduping yields
        the same set as disjoint slices — the idempotent-union claim."""
        from salesforce_plugin_spark.streaming.upsert import (
            read_distinct_set,
        )

        state = str(tmp_path / "state")
        a = spark.createDataFrame(
            [("x", 1), ("y", 2)], "g string, v long"
        )
        b = spark.createDataFrame(
            [("x", 1), ("z", 3)], "g string, v long"   # x,1 replayed
        )
        a.select("g", "v").distinct().write.mode("append").parquet(state)
        b.select("g", "v").distinct().write.mode("append").parquet(state)
        got = {
            (r.g, r.v)
            for r in read_distinct_set(spark, state, ["g", "v"]).collect()
        }
        assert got == {("x", 1), ("y", 2), ("z", 3)}


class TestZonemapPrune:
    def test_sorted_layout_prunes_scattered_does_not(self, spark):
        """Values 0..63 in 8 files: sorted by v, a [16, 23] predicate
        touches exactly 1 file; a scrambled layout spreads the range
        across all files and prunes nothing."""
        from salesforce_plugin_spark.operators.partitioning import (
            zonemap_prune_eval,
        )

        df = spark.createDataFrame(
            [(i, (i * 37) % 64) for i in range(64)], "rid long, v long"
        )
        out = {
            r.layout: (r.files_read, r.rows_read, r.prune_ppm)
            for r in zonemap_prune_eval(
                df,
                {"sorted": [F.col("v")], "scrambled": [F.col("rid")]},
                F.col("v"),
                16,
                23,
                n_files=8,
            ).collect()
        }
        assert out["sorted"] == (1, 8, 875000)
        assert out["scrambled"][0] == 8 and out["scrambled"][2] == 0


class TestPCAProject:
    def test_parallel_vector_zero_residual_orthogonal_zero_proj(self, spark):
        """A corpus dominated by one axis: vectors along the principal
        direction get res_num == 0 (Cauchy-Schwarz equality); an
        orthogonal vector gets proj == 0 and positive residual."""
        from salesforce_plugin_spark.functions.vector import pca_project

        rows = [
            (0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [3.0, 0.0]),
            (3, [-1.0, 0.0]), (4, [0.0, 1.0]),
        ]
        e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        v0 = e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("v0")
        )
        out = {
            r.vec_id: (r.proj, r.res_num)
            for r in pca_project(e, "vec_id", "embedding", v0).collect()
        }
        for vid in (0, 1, 2, 3):
            assert out[vid][1] == 0
        assert out[4][0] == 0 and out[4][1] > 0
        # projections preserve exact ratios along the axis
        assert out[1][0] == 2 * out[0][0]
        assert out[3][0] == -out[0][0]


class TestChangepoint:
    def test_obvious_level_shift_found_exactly(self, spark):
        """5 days at 2 events/day then 5 days at 10: the split lands
        after day 5 with exact segment means."""
        from salesforce_plugin_spark.operators.timeseries import (
            changepoint_binary,
        )

        rows = []
        for d in range(10):
            per = 2 if d < 5 else 10
            for i in range(per):
                rows.append(("a", f"2024-03-{d + 1:02d} 0{i % 10}:00:00"))
        df = spark.createDataFrame(rows, "k string, ts string").select(
            "k", F.col("ts").cast("timestamp").alias("ts")
        )
        r = changepoint_binary(df, ["k"], "ts").collect()[0]
        assert r.split_day == "2024-03-05"
        assert (r.n_left, r.n_right) == (5, 5)
        assert r.mean_left_milli == 2000 and r.mean_right_milli == 10000
        assert r.gain_milli > 0

    def test_flat_series_zero_gain_earliest_tiebreak(self, spark):
        """A constant series has zero gain everywhere; the earliest
        split wins the tie deterministically."""
        from salesforce_plugin_spark.operators.timeseries import (
            changepoint_binary,
        )

        rows = [
            ("a", f"2024-03-{d + 1:02d} 00:00:00") for d in range(4)
        ]
        df = spark.createDataFrame(rows, "k string, ts string").select(
            "k", F.col("ts").cast("timestamp").alias("ts")
        )
        r = changepoint_binary(df, ["k"], "ts").collect()[0]
        assert r.gain_milli == 0
        assert r.split_day == "2024-03-01"

    def test_single_day_key_absent(self, spark):
        from salesforce_plugin_spark.operators.timeseries import (
            changepoint_binary,
        )

        df = spark.createDataFrame(
            [("a", "2024-03-01 00:00:00")], "k string, ts string"
        ).select("k", F.col("ts").cast("timestamp").alias("ts"))
        assert changepoint_binary(df, ["k"], "ts").count() == 0


class TestKSStatistic:
    def test_identical_samples_zero_d(self, spark):
        from salesforce_plugin_spark.functions.sketch import ks_statistic

        a = spark.createDataFrame(
            [(float(v),) for v in (1, 2, 3, 4)], "value double"
        )
        r = ks_statistic(a, a, "value").collect()[0]
        assert r.d_num == 0 and r.d_ppm == 0

    def test_disjoint_supports_full_separation(self, spark):
        """a entirely below b: D = 1 (10^6 ppm) at a's maximum."""
        from salesforce_plugin_spark.functions.sketch import ks_statistic

        a = spark.createDataFrame(
            [(float(v),) for v in (1, 2)], "value double"
        )
        b = spark.createDataFrame(
            [(float(v),) for v in (10, 20, 30)], "value double"
        )
        r = ks_statistic(a, b, "value").collect()[0]
        assert (r.n1, r.n2) == (2, 3)
        assert r.d_ppm == 1_000_000
        assert r.at_qv == 2000          # sup attained at a's max value

    def test_hand_computed_mixed_case(self, spark):
        """a = {1,2,3}, b = {2,4}: gaps at qv 1000,2000,3000,4000 are
        |1·2−0| = 2, |2·2−1·3| = 1, |3·2−1·3| = 3, |6−6| = 0 → D = 3/6
        at qv 3000."""
        from salesforce_plugin_spark.functions.sketch import ks_statistic

        a = spark.createDataFrame(
            [(float(v),) for v in (1, 2, 3)], "value double"
        )
        b = spark.createDataFrame(
            [(float(v),) for v in (2, 4)], "value double"
        )
        r = ks_statistic(a, b, "value").collect()[0]
        assert r.d_num == 3 and r.at_qv == 3000
        assert r.d_ppm == 500_000


class TestBenford:
    def test_pinned_table_and_exact_shares(self, spark):
        from salesforce_plugin_spark.operators.validate import (
            benford_audit,
            benford_expected_ppm,
        )

        exp = benford_expected_ppm()
        assert exp[0] == 301030 and len(exp) == 9 and sum(exp) == 1_000_000
        df = spark.createDataFrame(
            [(v,) for v in (100, 150, 199, 20, 9000, -5, 0)], "amt long"
        )
        out = {
            r.digit: (r.n, r.obs_ppm, r.dev_ppm)
            for r in benford_audit(df, F.col("amt")).collect()
        }
        # negatives/zero excluded: total 5 positive rows
        assert out[1] == (3, 600000, 600000 - 301030)
        assert out[2][0] == 1 and out[9][0] == 1
        assert 5 not in out


class TestItemCF:
    def test_exact_binary_cosine_and_topk(self, spark):
        """Hand case: items 1,2 co-occur in 2 of their baskets
        (c1 = 3, c2 = 2 → cos = 2/√6); item 3 pairs once with 1 only —
        below min_support, absent."""
        from salesforce_plugin_spark.operators.analytics import (
            item_similarity,
        )

        rows = [
            (10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3),
            (13, 2),
        ]
        # c1 = 3 baskets, c2 = 3, c12 = 2 → wait: item 2 in baskets
        # 10, 11, 13 → c2 = 3; cos = 2/3 → 666666 ppm (floored)
        df = spark.createDataFrame(rows, "bk long, it long")
        out = {
            (r.item, r.neighbor): (r.support, r.cos_ppm, r.rank)
            for r in item_similarity(df, "bk", "it", 2, 5).collect()
        }
        assert out[(1, 2)] == (2, 666666, 1)
        assert out[(2, 1)] == (2, 666666, 1)
        assert (1, 3) not in out and (3, 1) not in out


class TestRobustnessGuards:
    def test_sssp_negative_weight_raises(self, spark):
        from salesforce_plugin_spark.functions.graph import sssp_fixed

        edges = spark.createDataFrame(
            [(1, 2, -3)], "src long, dst long, w long"
        )
        seeds = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(Exception, match="negative edge weight"):
            sssp_fixed(edges, seeds, rounds=1).collect()

    def test_louvain_isolated_node_stays_visible(self, spark):
        """A node present in the assignment but absent from the edge
        set must surface (staying put), not vanish."""
        from salesforce_plugin_spark.functions.graph import louvain_step

        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        comm = spark.createDataFrame(
            [(1, 1), (2, 1), (99, 99)], "id long, label long"
        )
        out = {r.node: (r.new_label, r.moved)
               for r in louvain_step(edges, comm).collect()}
        assert out[99] == (99, False)

    def test_zscore_missing_group_surfaces_null(self, spark):
        """A row whose group is absent from injected stats gets
        is_anomaly NULL, not dropped."""
        from salesforce_plugin_spark.operators.analytics import (
            zscore_from_stats,
        )

        df = spark.createDataFrame(
            [("known", 1.0), ("unknown", 9.0)], "grp string, value double"
        )
        stats = spark.createDataFrame(
            [("known", 3, 300, 30000)],
            "grp string, n long, s long, q2 long",
        )
        rows = {r.grp: r.is_anomaly for r in zscore_from_stats(
            df, "value", ["grp"], stats
        ).collect()}
        assert "unknown" in rows and rows["unknown"] is None
        assert rows["known"] is not None


class TestGlobalCumsum:
    def test_matches_single_partition_window(self, spark):
        """The distributed prefix sum equals the plain window cumsum on
        a tie-free key, regardless of how ranges were partitioned."""
        from pyspark.sql import Window

        from salesforce_plugin_spark.operators.partitioning import (
            global_cumsum,
        )

        df = spark.createDataFrame(
            [(k, (k * 13) % 7 + 1) for k in range(200)], "k long, v long"
        )
        got = {
            r.k: r.cum_v
            for r in global_cumsum(df, [F.col("k")], ["v"], n_parts=8)
            .collect()
        }
        want = {
            r.k: r.cum
            for r in df.withColumn(
                "cum", F.sum("v").over(Window.orderBy("k"))
            ).collect()
        }
        assert got == want


class TestAutocorr:
    def test_lag0_energy_and_shifted_dot(self, spark):
        """Counts [2, 3, 4] by day: lag0 = 4+9+16 = 29 over 3 days,
        lag1 = 2·3+3·4 = 18 over 2 days."""
        from salesforce_plugin_spark.operators.analytics import (
            autocorrelation_daily,
        )

        rows = []
        for d, c in enumerate([2, 3, 4]):
            for i in range(c):
                rows.append(("a", f"2024-03-{d + 1:02d} 0{i}:00:00"))
        df = spark.createDataFrame(rows, "t string, ts string").select(
            "t", F.col("ts").cast("timestamp").alias("ts")
        )
        out = {
            (r.t, r.lag): (r.dot, r.n_days)
            for r in autocorrelation_daily(df, "t", "ts", 2).collect()
        }
        assert out[("a", 0)] == (29, 3)
        assert out[("a", 1)] == (18, 2)
        assert out[("a", 2)] == (8, 1)
