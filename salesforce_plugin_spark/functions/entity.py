"""Entity resolution: blocked fuzzy record linkage.

The record-linkage shape a warehouse ELT pipeline (the reference's
Salesforce→Redshift extracts are exactly the "master" side of this) runs
daily: link an incoming dirty batch — names with typos, no reliable key
— to a master registry. The naive form is an O(N·M) cross join with an
edit-distance predicate; the production form is *blocking*: a cheap,
typo-stable key (here the first name token) turns the cross join into an
equijoin whose per-block candidate count is what you pay. Levenshtein is
evaluated JVM-side (``F.levenshtein``, classic unit-cost edit distance —
identical semantics to DuckDB/Postgres ``levenshtein``), after a length-
band prefilter that discards most candidates without touching the DP
matrix.

Scale posture: the equijoin shuffles both sides on the block key once;
cost is Σ_b |master_b|·|dirty_b|. With a name-token block over real name
distributions blocks are Zipfian — cap them (or add a second blocking
pass on a different key) when a block exceeds memory; AQE's skew-join
split handles moderate skew unaided. Nothing here is driver-side and no
Python runs per row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def blocked_fuzzy_link(
    master: DataFrame,
    dirty: DataFrame,
    master_id: str,
    dirty_id: str,
    name_col: str,
    block: Column | None = None,
    max_dist: int = 2,
) -> DataFrame:
    """Link each ``dirty`` record to its best ``master`` match.

    Both inputs must carry ``name_col``; ``block`` (default: lowercased
    first whitespace token of the name) is computed on each side and
    equijoined. Candidates within the block pass a length-band prefilter
    (``|len(a) - len(b)| <= max_dist``, a provable lower bound on edit
    distance) before the levenshtein verify. Best match per dirty record
    = lowest distance, ties to the lowest master id (deterministic,
    engine-replayable election via a row_number window).

    Output (scalar-only): ``(dirty_id, master_id, dist int)`` — dirty
    records with no candidate within ``max_dist`` are absent (the
    "needs human review" queue is the anti-join of the input against
    this output).
    """
    if max_dist < 0:
        raise ValueError("blocked_fuzzy_link requires max_dist >= 0")

    def side(df: DataFrame, idc: str, tag: str) -> DataFrame:
        name = F.lower(F.trim(F.col(name_col)))
        blk = block if block is not None else F.substring_index(name, " ", 1)
        return df.select(
            F.col(idc).alias(f"__{tag}_id"),
            name.alias(f"__{tag}_name"),
            blk.alias("__blk"),
        )

    m = side(master, master_id, "m")
    d = side(dirty, dirty_id, "d")
    cand = d.join(m, "__blk").filter(
        F.abs(F.length("__d_name") - F.length("__m_name")) <= max_dist
    )
    scored = cand.select(
        F.col("__d_id"),
        F.col("__m_id"),
        F.levenshtein("__d_name", "__m_name").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
    w = Window.partitionBy("__d_id").orderBy(F.col("dist"), F.col("__m_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__d_id").alias(dirty_id),
            F.col("__m_id").alias(master_id),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def deletion_neighborhood(c: Column) -> Column:
    """The string plus every single-character deletion of it — the
    SymSpell blocking key set: two strings at edit distance <= 1 ALWAYS
    share at least one key (b=del(a) ⇒ b ∈ del1(a); substitution at i ⇒
    del_i(a) = del_i(b); insertion symmetric), so a key-equijoin is a
    COMPLETE candidate generator for distance-1 matching — no recall
    trade, unlike attribute blocking. Keys per string = length + 1
    (deduplicated: doubled letters collapse), generated in one codegen
    projection."""
    n = F.length(c)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n),
            lambda i: F.when(i == F.lit(0), c).otherwise(
                F.concat(
                    F.substring(c, F.lit(1), i - 1), F.substring(c, i + 1, n)
                )
            ),
        )
    )


def deletion_link(
    master: DataFrame,
    dirty: DataFrame,
    master_id: str,
    dirty_id: str,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Record linkage via deletion-neighborhood (SymSpell) blocking: the
    scale-safe form of :func:`blocked_fuzzy_link` when no discriminative
    attribute block exists (degenerate name vocabularies make attribute
    blocks quadratic; deletion keys bucket only true near-matches, so
    candidate volume stays ~linear in the input).

    Candidates are pairs sharing ANY key from
    :func:`deletion_neighborhood` — a COMPLETE generator at
    ``max_dist=1``; at 2 it still catches most pairs (both ends' single
    deletions) but completeness would need the quadratic 2-deletion
    neighborhood — pass 1 unless the recall trade is acceptable and
    documented. Election identical to blocked_fuzzy_link: lowest
    (dist, master_id) per dirty record, engine-replayable.

    Plan: each side explodes to ~(len+1) keys map-side, ONE key-equijoin,
    a distinct on the candidate pair (two ids), the levenshtein verify,
    and the per-dirty-id election window.

    Output (scalar-only): ``(dirty_id, master_id, dist int)``.
    """
    if max_dist < 0:
        raise ValueError("deletion_link requires max_dist >= 0")

    def side(df: DataFrame, idc: str, tag: str) -> DataFrame:
        name = F.lower(F.trim(F.col(name_col)))
        return df.select(
            F.col(idc).alias(f"__{tag}_id"),
            name.alias(f"__{tag}_name"),
            F.explode(deletion_neighborhood(name)).alias("__key"),
        )

    m = side(master, master_id, "m")
    d = side(dirty, dirty_id, "d")
    cand = (
        d.join(m, "__key")
        .select("__d_id", "__d_name", "__m_id", "__m_name")
        .distinct()
    )
    scored = cand.select(
        F.col("__d_id"),
        F.col("__m_id"),
        F.levenshtein("__d_name", "__m_name").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
    w = Window.partitionBy("__d_id").orderBy(F.col("dist"), F.col("__m_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__d_id").alias(dirty_id),
            F.col("__m_id").alias(master_id),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def golden_records(
    df: DataFrame,
    cluster_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Golden-record election — the master-data-management step AFTER
    linkage/clustering: collapse each entity cluster to one canonical
    row by per-attribute MAJORITY vote, ties broken by the smaller
    value (deterministic, engine-replayable; "most recent" or
    "most trusted source" are the same election under a different
    order column — swap the tiebreak).

    NULLs never win an election unless the attribute is null across
    the whole cluster (a present value beats any count of absences).
    Output (scalar-only): ``(cluster_col, n_members, attr_cols...)``.

    Plan: ONE exchange per attribute is avoided by electing all
    attributes in a single groupBy — each attribute's vote rides as a
    ``max_by`` over (count, value) pairs computed from a per-(cluster,
    value) pre-count; total cost is one (cluster, attr-value) exchange
    per attribute batch + the final cluster aggregate, all map-side
    combined. Cluster sizes bound every group.
    """
    if not attr_cols:
        raise ValueError("golden_records requires attr_cols")
    base = df.groupBy(cluster_col).agg(F.count("*").alias("n_members"))
    out = base
    for a in attr_cols:
        counted = (
            df.filter(F.col(a).isNotNull())
            .groupBy(cluster_col, a)
            .agg(F.count("*").alias("__n"))
        )
        # majority with deterministic small-value tiebreak: maximize
        # (count, reversed-rank-by-value) — expressed as max_by over a
        # struct of (count, value) with value ordered ASC via min_by on
        # ties; two-stage: take max count, then min value at that count
        best = (
            counted.groupBy(cluster_col)
            .agg(F.max("__n").alias("__top"))
            .join(counted, cluster_col)
            .filter(F.col("__n") == F.col("__top"))
            .groupBy(cluster_col)
            .agg(F.min(a).alias(a))
        )
        out = out.join(best, cluster_col, "left")
    return out
