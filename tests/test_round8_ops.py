"""Round-8 operators: variable-length maximal repeated-span inventory."""

from __future__ import annotations

from salesforce_plugin_spark.functions.dedup import repeated_spans, span_dedup


def _spans(spark, docs, min_tokens=8):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        (r.doc_id, r.span_start, r.span_tokens, r.span_md5)
        for r in repeated_spans(
            df, "doc_id", "text", min_tokens=min_tokens
        ).collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_maximal_span_has_true_variable_length(spark):
    """A 12-token region duplicated across two docs is reported as ONE
    maximal span of 12 tokens in EACH doc (inventory includes the first
    occurrence), not as five overlapping 8-token spans."""
    dup = _words("d", 12)
    rows = _spans(
        spark,
        [(1, dup + " " + _words("x", 9)), (2, _words("y", 9) + " " + dup)],
    )
    by_doc = {(d, s, n) for d, s, n, _ in rows}
    assert by_doc == {(1, 1, 12), (2, 10, 12)}
    # identical content -> identical span_md5 across occurrences
    assert len({md5 for *_, md5 in rows}) == 1


def test_disjoint_spans_stay_separate(spark):
    """Two duplicated regions separated by unique tokens produce two rows
    per doc, each with its own maximal extent."""
    a, b = _words("a", 8), _words("b", 10)
    rows = _spans(
        spark,
        [
            (1, a + " " + _words("u", 5) + " " + b),
            (2, b + " " + _words("v", 5) + " " + a),
        ],
    )
    lens = sorted(n for d, s, n, _ in rows if d == 1)
    assert lens == [8, 10]
    assert len(rows) == 4  # two spans x two docs


def test_below_min_tokens_not_reported(spark):
    """A 7-token duplicate is invisible at min_tokens=8."""
    dup = _words("d", 7)
    rows = _spans(
        spark,
        [(1, dup + " " + _words("x", 9)), (2, _words("y", 9) + " " + dup)],
    )
    assert rows == set()


def test_consistent_with_span_dedup_removal(spark):
    """Tokens covered by the inventory in a non-first occurrence are
    exactly the tokens span_dedup removes (same anchors, same chaining)."""
    dup = _words("d", 15)
    docs = [(1, dup + " " + _words("x", 9)), (2, _words("y", 9) + " " + dup)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    removed = {
        r.doc_id: r.n_removed
        for r in span_dedup(df, "doc_id", "text", span_tokens=8).collect()
    }
    spans = _spans(spark, docs)
    # doc 2's only span is the 15-token clone; span_dedup removes all 15
    assert removed == {1: 0, 2: 15}
    assert (2, 10, 15) in {(d, s, n) for d, s, n, _ in spans}


# --- quality-classifier distillation ---------------------------------------

def test_distill_weights_match_lstsq(spark):
    """The exact-integer Cramer solve equals numpy's least squares on the
    same design matrix (to float tolerance)."""
    import numpy as np

    from salesforce_plugin_spark.functions.ir import (
        default_quality_teacher,
        fit_quality_student,
    )
    from salesforce_plugin_spark.functions.text import STOPWORDS_RE
    import re

    docs = [
        (
            i,
            " ".join(f"u{i}{j}" for j in range(3 + i))
            + " the" * (i % 5)
            + " of" * ((i * 3) % 7),
        )
        for i in range(0, 40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = fit_quality_student(df, "doc_id", "text", sample_mod=2)

    sample = [(i, t) for i, t in docs if i % 2 == 0]
    y = default_quality_teacher([t for _, t in sample])
    X = np.array(
        [
            [
                1.0,
                len(t.strip().split()),
                len(re.findall(rf"\b{STOPWORDS_RE}\b", t.lower())),
            ]
            for _, t in sample
        ]
    )
    ref, *_ = np.linalg.lstsq(X, np.array(y, dtype=float), rcond=None)
    assert abs(got["w0"] - ref[0]) < 1e-6 * max(1, abs(ref[0]))
    assert abs(got["w1"] - ref[1]) < 1e-6 * max(1, abs(ref[1]))
    assert abs(got["w2"] - ref[2]) < 1e-6 * max(1, abs(ref[2]))


def test_distill_singular_design_raises(spark):
    """Constant features on the sample -> loud raise, no pseudo-inverse."""
    import pytest

    from salesforce_plugin_spark.functions.ir import fit_quality_student

    df = spark.createDataFrame(
        [(i, "same text here") for i in range(0, 8)], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="singular"):
        fit_quality_student(df, "doc_id", "text", sample_mod=2)


def test_distill_scores_whole_corpus(spark):
    """Every doc gets a student score; teacher_scaled only on the sample."""
    from salesforce_plugin_spark.functions.ir import distill_quality

    docs = [
        (
            i,
            " ".join(f"w{i}{j}" for j in range(4 + i))
            + " the" * (i % 3)
            + " of" * ((i * 2) % 5),
        )
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {r.doc_id: r for r in distill_quality(
        df, "doc_id", "text", sample_mod=4
    ).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        assert r.student_score is not None
        assert (r.teacher_scaled is not None) == (i % 4 == 0)


def test_streamed_moments_equal_batch_moments(spark):
    """Sums of quality_moment_rows (the stream-fold state) equal the
    batch fit's DECIMAL moments exactly — the invariant that makes
    q_stream_distill equal q_distill_quality by construction."""
    import pyspark.sql.functions as F

    from salesforce_plugin_spark.functions.ir import (
        fit_quality_student,
        quality_moment_rows,
    )

    docs = [
        (
            i,
            " ".join(f"u{i}{j}" for j in range(3 + i))
            + " the" * (i % 5)
            + " of" * ((i * 3) % 7),
        )
        for i in range(0, 32)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    batch = fit_quality_student(df, "doc_id", "text", sample_mod=2)["moments"]
    mr = quality_moment_rows(df, "doc_id", "text", sample_mod=2)
    agg = mr.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(c) for c in
          ["x1", "x2", "y", "x1x1", "x2x2", "x1x2", "x1y", "x2y"]],
    ).collect()[0]
    assert int(agg["n"]) == batch["n"]
    for c, k in zip(
        ["x1", "x2", "y", "x1x1", "x2x2", "x1x2", "x1y", "x2y"],
        ["sx1", "sx2", "sy", "sx1x1", "sx2x2", "sx1x2", "sx1y", "sx2y"],
    ):
        assert int(agg[c]) == batch[k], (c, int(agg[c]), batch[k])


def test_distinct_set_fold_partitioned_and_compactable(spark, tmp_path):
    """Round-8 migration of the set fold onto the __b= layout: per-batch
    overwrite partitions (storage-idempotent replay), watermark fence,
    and compact_distinct_set folding everything below the watermark into
    one deduped base with the set unchanged."""
    import os

    from salesforce_plugin_spark.streaming.upsert import (
        compact_distinct_set,
        read_distinct_set,
        write_batch_partials,
    )

    state = str(tmp_path / "state")
    n_batches = 40
    for b in range(n_batches):
        # overlapping sets: batch b carries {b, b+1, b+2} per group
        rows = spark.createDataFrame(
            [(g, b + k) for g in ("a", "m") for k in range(3)], ["g", "v"]
        ).distinct()
        write_batch_partials(rows, state, b)

    expect = {(g, v) for g in ("a", "m") for v in range(n_batches + 2)}
    got = {
        (r.g, r.v)
        for r in read_distinct_set(spark, state, ["g", "v"]).collect()
    }
    assert got == expect

    folded = compact_distinct_set(spark, state, n_batches, ["g", "v"])
    assert folded == n_batches
    parts = [d for d in os.listdir(state) if d.startswith("__b=")]
    assert parts == ["__b=-1"]
    got2 = {
        (r.g, r.v)
        for r in read_distinct_set(spark, state, ["g", "v"]).collect()
    }
    assert got2 == expect

    # pre-watermark replay is a no-op (fence), set unchanged
    replay = spark.createDataFrame([("a", 999_999)], ["g", "v"])
    write_batch_partials(replay, state, 3)
    got3 = {
        (r.g, r.v)
        for r in read_distinct_set(spark, state, ["g", "v"]).collect()
    }
    assert got3 == expect


def test_near_dedup_stream_state_replay_idempotent(spark, tmp_path):
    """Round-8 migration of the near-dedup band/assign state onto __b=
    partitions: re-folding the last batch (a foreachBatch retry AFTER its
    state was durably written — the worst replay point) overwrites its
    own slice and leaves the accumulated assignments byte-identical."""
    import os

    from salesforce_plugin_spark.functions.dedup import (
        near_dedup_apply,
        near_dedup_clusters_portable,
    )
    from salesforce_plugin_spark.streaming.upsert import (
        read_near_dedup_assignments,
        run_stream_near_dedup,
        write_batch_partials,
    )

    b1 = [(1, "alpha beta gamma delta one"), (2, "zeta eta theta iota two")]
    b2 = [(10, "alpha beta gamma delta one"), (11, "unique text here three")]
    state = str(tmp_path / "state")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate((b1, b2)):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        part = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(part)
        pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        os.rename(os.path.join(part, pf), os.path.join(src, f"b-{i}.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_stream_near_dedup(
        stream, state, str(tmp_path / "ckpt"),
        id_col="doc_id", text_col="text",
        num_hashes=8, bands=2, shingle_n=3,
    )
    before = sorted(
        map(tuple,
            read_near_dedup_assignments(spark, state, "doc_id").collect())
    )

    # retry of batch 1 (the b2 slice), with its own state already present
    batch = spark.createDataFrame(b2, "doc_id long, text string")
    corpus_bands = spark.read.parquet(os.path.join(state, "bands")).select(
        "doc_id", "band", "bucket"
    )
    assigned, new_bands = near_dedup_apply(
        corpus_bands, batch, "doc_id", "text",
        num_hashes=8, bands=2, shingle_n=3,
    )
    write_batch_partials(assigned, os.path.join(state, "assign"), 1)
    write_batch_partials(new_bands, os.path.join(state, "bands"), 1)

    after = sorted(
        map(tuple,
            read_near_dedup_assignments(spark, state, "doc_id").collect())
    )
    assert after == before
    # and still equal to the from-scratch full run
    full = near_dedup_clusters_portable(
        spark.createDataFrame(b1 + b2, "doc_id long, text string"),
        "doc_id", "text", num_hashes=8, bands=2, shingle_n=3,
    )
    assert after == sorted(map(tuple, full.collect()))
    # per-batch partitions, not flat files
    assert all(
        d.startswith("__b=") or d.startswith("_")
        for d in os.listdir(os.path.join(state, "bands"))
    )
