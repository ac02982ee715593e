"""Round-8 regression tests: the round-7 ADVICE findings (Kneser-Ney
operand-level DECIMAL casts, candidate-mode minhash_error_eval keeping
zero-shingle pairs) and the VERDICT's ``__b=`` partitioned-stream-state
compaction (fold below a batch-id watermark into one base partition,
crash-safe via a manifest, replay-fenced via a durable watermark)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest


# --- Kneser-Ney exact arithmetic -----------------------------------------


def test_kn_score_decimal_operands_survive_huge_counts(spark):
    """kn_score_from_counts at corpus scale: c1·Nt here is ≈ 2^77,
    far past int64 — with operand-level DECIMAL(38,0) casts the score
    computes; with the old BIGINT products it dies with an
    ArithmeticException under Spark 4's default ANSI mode."""
    from salesforce_plugin_spark.functions.text import kn_score_from_counts

    n_types = 1_000_000
    c12 = spark.range(n_types).select(
        F.lit("a").alias("w1"),
        F.concat(F.lit("x"), F.col("id")).alias("w2"),
        F.lit(1 << 35).cast("long").alias("__c12"),
    )
    big = spark.createDataFrame(
        [(1, "a", "x5")], "doc_id long, w1 string, w2 string"
    )
    row = kn_score_from_counts(big, c12, "doc_id").collect()
    assert len(row) == 1
    r = row[0]
    assert r.n_bigrams == 1 and r.n_scored == 1
    # P(x5|a) = [(4·2^35−3)·Nt + 3·1·1] / (4·(Nt·2^35)·Nt) ≈ 1/Nt = 2^-20
    # → ≈ 20 bits; the 1/8-bit integer log2 gives 8·20 = 160 exactly ±1
    assert 152 <= r.kn_bits_x8 <= 168


def test_kn_bigram_bits_small_values_unchanged(spark):
    """The decimal rewrite must not move any small-scale value: a
    hand-checkable two-doc corpus scores identically to the rational
    directly evaluated in Python integers."""
    from salesforce_plugin_spark.functions.text import kn_bigram_bits

    df = spark.createDataFrame(
        [(1, "the cat sat", True), (2, "the cat ran", False)],
        "doc_id long, text string, is_target boolean",
    )
    out = {
        r.doc_id: r
        for r in kn_bigram_bits(df, "doc_id", "text", F.col("is_target"))
        .collect()
    }
    # model from doc 1 only: bigrams (the,cat), (cat,sat); every count 1
    # scoring doc 2: (the,cat) seen → P = (1·2 + 3·1·1)/(4·1·2) = 5/8
    #   bits = floor(8·log2(8/5)) = floor(8·0.678) = 5
    # (cat,ran): "ran" is an unseen continuation (N1c = 0, c12 = 0 →
    #   num = 0) → the documented OOV read-out: counted, not scored
    assert out[2].n_bigrams == 2 and out[2].n_scored == 1
    assert out[2].kn_bits_x8 == 5
    assert out[2].milli_bits_per_bigram == 625


# --- candidate-mode minhash_error_eval zero-shingle pairs ------------------


def test_minhash_error_eval_keeps_zero_shingle_candidates(spark):
    """A candidate pair where one (or both) docs yield zero shingles
    (< shingle_n tokens) must still surface, with true_ppm 0 and
    est_ppm 0 — the docstring's claim the round-7 inner joins broke."""
    from salesforce_plugin_spark.functions.dedup import minhash_error_eval

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "hi"),          # 1 token → zero 3-shingles
            (4, "yo"),          # 1 token → zero 3-shingles
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in minhash_error_eval(
            docs, "doc_id", "text", num_hashes=8, shingle_n=3,
            candidates=cand,
        ).collect()
    }
    assert set(rows) == {(1, 2), (1, 3), (3, 4)}, "every candidate surfaces"
    assert rows[(1, 2)].true_ppm > 0
    for pair in [(1, 3), (3, 4)]:
        assert rows[pair].true_ppm == 0
        assert rows[pair].est_ppm == 0
        assert rows[pair].err_ppm == 0


# --- __b= partitioned state: compaction ----------------------------------


def _batch_dirs(state: str) -> list[int]:
    return sorted(
        int(d.split("=")[1])
        for d in os.listdir(state)
        if d.startswith("__b=")
    )


def test_compaction_folds_1k_batches_and_fences_replays(spark, tmp_path):
    """The VERDICT-prescribed scenario: 1000 batches of per-group
    partial counts (laid down as the identical partitioned layout ONE
    write_batch_partials call per batch would produce), compacted
    below watermark 990 → reads collapse to O(groups) over ~11
    partitions with identical totals; a PRE-watermark batch-id replay
    is a no-op (its rows live in the base — rewriting would
    double-count); a POST-watermark replay stays overwrite-idempotent;
    new batches still add; a second compaction re-folds the base."""
    from salesforce_plugin_spark.streaming.upsert import (
        compact_summed_counts,
        compacted_below,
        read_summed_counts,
        write_batch_partials,
    )

    state = str(tmp_path / "counts")
    n_batches = 1000
    # one partitioned write producing exactly the __b=<id> layout of
    # n_batches write_batch_partials calls: batch b contributes
    # (cell=b%3, n=1)
    spark.range(n_batches).select(
        (F.col("id") % 3).cast("string").alias("cell"),
        F.lit(1).cast("long").alias("n"),
        F.col("id").cast("int").alias("__b"),
    ).repartition(8).write.partitionBy("__b").parquet(state)
    expect = {"0": 334, "1": 333, "2": 333}

    def totals():
        return {
            r.cell: r.n
            for r in read_summed_counts(spark, state, ["cell"]).collect()
        }

    assert totals() == expect
    assert len(_batch_dirs(state)) == n_batches

    folded = compact_summed_counts(spark, state, 990, ["cell"])
    assert folded == 990
    dirs = _batch_dirs(state)
    assert dirs == [-1] + list(range(990, 1000))
    assert totals() == expect, "compaction is read-invisible"
    assert compacted_below(spark, state) == 990

    # PRE-watermark replay (foreachBatch retry of batch 5 after the
    # fold): fenced to a no-op
    write_batch_partials(
        spark.createDataFrame([("2", 1)], "cell string, n long"), state, 5
    )
    assert totals() == expect
    assert 5 not in _batch_dirs(state)

    # POST-watermark replay of batch 995 with its own rows: idempotent
    write_batch_partials(
        spark.createDataFrame(
            [(str(995 % 3), 1)], "cell string, n long"
        ),
        state,
        995,
    )
    assert totals() == expect

    # a genuinely new batch still adds
    write_batch_partials(
        spark.createDataFrame([("0", 7)], "cell string, n long"),
        state,
        1000,
    )
    expect2 = dict(expect, **{"0": expect["0"] + 7})
    assert totals() == expect2

    # second compaction folds the base + everything below the new
    # watermark back into ONE partition
    assert compact_summed_counts(spark, state, 1001, ["cell"]) == 12
    assert _batch_dirs(state) == [-1]
    assert totals() == expect2
    assert compacted_below(spark, state) == 1001


def test_compaction_crash_recovery_manifest(spark, tmp_path):
    """Kill the transaction at its worst point — manifest written,
    SOME folded partitions already deleted, tmp not yet renamed — and
    verify the next reader completes it: totals exact, no
    double-count, watermark persisted, manifest gone."""
    import json
    import shutil

    from salesforce_plugin_spark.streaming.upsert import (
        _COMPACT_MANIFEST,
        _COMPACT_TMP,
        compacted_below,
        read_summed_counts,
        write_batch_partials,
    )

    state = str(tmp_path / "counts")
    for b in range(6):
        write_batch_partials(
            spark.createDataFrame(
                [(str(b % 2), 1)], "cell string, n long"
            ),
            state,
            b,
        )
    # hand-build the interrupted compaction of batches 0-3: the merged
    # tmp parquet is complete (manifest is only ever written after it),
    # partitions 0 and 1 already deleted, 2 and 3 still present
    spark.createDataFrame(
        [("0", 2), ("1", 2)], "cell string, n long"
    ).write.parquet(os.path.join(state, _COMPACT_TMP))
    with open(os.path.join(state, _COMPACT_MANIFEST), "w") as fh:
        json.dump(
            {"watermark": 4, "fold": [f"__b={b}" for b in range(4)]}, fh
        )
    shutil.rmtree(os.path.join(state, "__b=0"))
    shutil.rmtree(os.path.join(state, "__b=1"))

    totals = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert totals == {"0": 3, "1": 3}
    assert _batch_dirs(state) == [-1, 4, 5]
    assert compacted_below(spark, state) == 4
    assert not os.path.exists(os.path.join(state, _COMPACT_MANIFEST))
    assert not os.path.exists(os.path.join(state, _COMPACT_TMP))


def test_compaction_max_registers_and_sums(spark, tmp_path):
    """The MAX-register and additive-sums reduce wrappers: compacted
    read-outs equal the pre-compaction merge."""
    from salesforce_plugin_spark.functions.sketch import hll_registers
    from salesforce_plugin_spark.streaming.upsert import (
        compact_max_registers,
        compact_summed_sums,
        read_max_registers,
        read_summed_sums,
        write_batch_partials,
    )

    # HLL registers over 4 batches
    reg_state = str(tmp_path / "regs")
    for b in range(4):
        batch = spark.createDataFrame(
            [(i, f"u{i % 11}") for i in range(b * 25, b * 25 + 25)],
            "id long, user string",
        )
        write_batch_partials(
            hll_registers(batch, [], "user"), reg_state, b
        )
    before = {
        (r.bucket,): r.m_j
        for r in read_max_registers(spark, reg_state, []).collect()
    }
    assert compact_max_registers(spark, reg_state, 3, []) == 3
    after = {
        (r.bucket,): r.m_j
        for r in read_max_registers(spark, reg_state, []).collect()
    }
    assert after == before
    assert _batch_dirs(reg_state) == [-1, 3]

    # additive sums over 5 batches
    sum_state = str(tmp_path / "sums")
    for b in range(5):
        write_batch_partials(
            spark.createDataFrame(
                [("g", 2, b * 10)], "grp string, n long, sum_v long"
            ),
            sum_state,
            b,
        )
    got = read_summed_sums(spark, sum_state, ["grp"], ["v"]).collect()[0]
    assert (got.n, got.sum_v) == (10, 100)
    assert compact_summed_sums(spark, sum_state, 5, ["grp"], ["v"]) == 5
    got2 = read_summed_sums(spark, sum_state, ["grp"], ["v"]).collect()[0]
    assert (got2.n, got2.sum_v) == (10, 100)
    assert _batch_dirs(sum_state) == [-1]


def test_legacy_flat_state_dir_raises(spark, tmp_path):
    """A state dir holding pre-partition-layout flat parquet files
    must fail loudly at the first partitioned write, with the
    migration step — not mis-discover partitions later."""
    from salesforce_plugin_spark.streaming.upsert import (
        write_batch_partials,
    )

    state = str(tmp_path / "legacy")
    spark.createDataFrame(
        [("a", 1)], "cell string, n long"
    ).coalesce(1).write.parquet(state)
    with pytest.raises(ValueError, match="flat parquet files"):
        write_batch_partials(
            spark.createDataFrame([("a", 1)], "cell string, n long"),
            state,
            0,
        )


def test_stream_equivalence_survives_compaction(spark, tmp_path):
    """End-to-end: run the real additive-count stream, compact below
    the last batch, stream MORE data into the same state dir, and the
    read-out still equals the one-shot batch count over everything —
    the additivity equivalence is compaction-invariant."""
    from salesforce_plugin_spark.streaming.upsert import (
        compact_summed_counts,
        read_summed_counts,
        run_stream_additive_counts,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100)],
        "id long, cell string",
    ).repartition(4).write.parquet(src)
    state = str(tmp_path / "state")
    run_stream_additive_counts(
        spark.readStream.schema("id long, cell string").parquet(src),
        state,
        str(tmp_path / "ckpt1"),
        ["cell"],
    )
    top = max(_batch_dirs(state))
    compact_summed_counts(spark, state, top + 1, ["cell"])
    # second tranche through a fresh checkpoint (batch ids restart at
    # 0 — below the watermark!): a REAL deployment keeps one
    # checkpoint so ids increase; emulate that by a direct fold at a
    # post-watermark id
    from salesforce_plugin_spark.streaming.upsert import (
        write_batch_partials,
    )

    more = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100, 150)],
        "id long, cell string",
    )
    write_batch_partials(
        more.groupBy("cell").agg(F.count(F.lit(1)).cast("long").alias("n")),
        state,
        top + 1,
    )
    got = {
        r.cell: r.n
        for r in read_summed_counts(spark, state, ["cell"]).collect()
    }
    assert got == {"even": 75, "odd": 75}
