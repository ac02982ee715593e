"""Batch CDC apply: merge a change feed (upserts + deletes) into a
snapshot — the keyed-merge step downstream of the reference's COPY
load (`salesforce_schema_to_redshift_operator.py:277` lands extracts
append-style; applying them to a keyed table is this operator;
streaming/upsert.py is the continuous variant, this is the batch one).

Plan shape: the change feed first reduces to ONE winning change per key
(``max_by`` over the event order — a hash aggregate, partial-combining
map-side, so the exchange carries ~1/r rows at change-ratio r), then a
single full-outer equi-join against the snapshot applies the verdict:

- key only in snapshot → row passes through;
- winning change is a delete → key dropped (even if absent: no-op);
- otherwise the change row replaces/inserts.

Two exchanges total (changes reduce + join); both sides hash on the same
key so the join itself adds one sort/exchange on the snapshot side only.
Deletes of absent keys and updates of absent keys (= inserts) need no
special casing — the outer join's null pattern encodes them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[str],
    op_col: str = "op",
    delete_op: str = "d",
) -> DataFrame:
    """Apply a CDC change feed to a snapshot; returns the new snapshot
    with the snapshot's columns.

    ``changes`` must carry the snapshot's columns plus ``op_col`` and the
    ``order_by`` columns (which may overlap the value columns). The
    winning change per key is the LAST under ``order_by`` (lexicographic
    struct order — make the tuple unique per key for a deterministic
    winner, same contract as ``dedup_exact``).
    """
    val_cols = snapshot.columns
    ord_struct = F.struct(*[F.col(c) for c in order_by])
    winner = changes.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(
            F.struct(
                *[F.col(c) for c in val_cols if c not in keys],
                F.col(op_col).alias("__op"),
            ),
            ord_struct,
        ).alias("__w")
    )
    joined = snapshot.alias("s").join(
        winner.alias("c"), on=keys, how="full_outer"
    )
    is_delete = F.col("c.__w.__op") == delete_op
    take_change = F.col("c.__w").isNotNull() & ~is_delete
    keep_snapshot = F.col("c.__w").isNull()
    return joined.filter(keep_snapshot | take_change).select(
        *[F.col(k) for k in keys],
        *[
            F.when(take_change, F.col(f"c.__w.{c}"))
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
            for c in val_cols
            if c not in keys
        ],
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Derive a change feed from two table versions — the INVERSE of
    :func:`apply_changes`: given yesterday's and today's snapshot of a
    keyed table, emit one row per differing key with
    ``change ∈ {'insert', 'delete', 'update'}`` and the old/new values
    of each compared column (suffixed ``_old`` / ``_new``). Unchanged
    keys produce nothing. This is how a CDC feed is manufactured when
    the source system only hands you full extracts (the reference's
    Salesforce full-object pulls are exactly that shape) — diff the
    snapshots, then drive the incremental consumers.

    Keys must be unique per snapshot (enforce upstream with
    ``dedup_exact``); ``compare_cols`` should be exact-typed (ints,
    longs, dates, strings, exact decimals) so equality is engine-
    unambiguous — pre-quantize floats.

    Plan: ONE full-outer equi-join on the key (both sides shuffle on the
    key once — unavoidable for a keyed diff; co-partitioned/bucketed
    snapshots make it exchange-free), null-pattern classification,
    a null-safe-inequality OR across the compared columns. Output is
    ~|changed| rows, typically << |snapshot|.
    """
    if not key_cols or not compare_cols:
        raise ValueError("snapshot_diff requires key_cols and compare_cols")
    o = old.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    any_diff = None
    for c in compare_cols:
        d = ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
        any_diff = d if any_diff is None else (any_diff | d)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(any_diff, F.lit("update"))
    )
    out_cols = (
        [*key_cols, change.alias("change")]
        + [f"{c}_old" for c in compare_cols]
        + [f"{c}_new" for c in compare_cols]
    )
    return joined.select(*out_cols).filter(F.col("change").isNotNull())


def surrogate_keys(
    df: DataFrame,
    natural_cols: list[str],
    existing: DataFrame | None = None,
    key_col: str = "sk",
) -> DataFrame:
    """Dimension surrogate-key management: map each distinct natural key
    to a dense integer, STABLY — re-running with ``existing`` (the
    current mapping) assigns fresh keys only to unseen naturals,
    continuing after ``max(sk)``; already-mapped rows come back
    untouched. This is the warehouse load step between staging and a
    star schema (the reference's Redshift targets assume it exists; no
    IDENTITY column survives a cross-engine migration, so the mapping
    must be data, not DDL).

    New keys are assigned in natural-key sort order — deterministic and
    engine-replayable (a hash order would also work; sort order makes
    the mapping human-auditable). Output: ``natural_cols + (sk long)``.

    Plan: a distinct on the naturals, an anti-join against the existing
    mapping, a 1-row max broadcast, then ``row_number`` over the NEW
    keys only — the single-partition sort touches dimension churn
    (new naturals per batch), never fact volume or the full dimension.
    """
    if not natural_cols:
        raise ValueError("surrogate_keys requires natural_cols")
    nat = df.select(*natural_cols).distinct()
    if existing is None:
        new = nat
        base = nat.sparkSession.range(1).select(
            F.lit(0).cast("long").alias("__base")
        )
        prior = None
    else:
        new = nat.join(existing.select(*natural_cols), natural_cols, "left_anti")
        base = existing.agg(
            F.coalesce(F.max(key_col), F.lit(0)).cast("long").alias("__base")
        )
        prior = existing.select(*natural_cols, key_col)
    w = Window.orderBy(*[F.col(c) for c in natural_cols])
    assigned = (
        new.crossJoin(F.broadcast(base))
        .withColumn(
            key_col,
            (F.row_number().over(w) + F.col("__base")).cast("long"),
        )
        .drop("__base")
    )
    return assigned if prior is None else prior.unionByName(assigned)


def fold_additive_rollup(
    state: DataFrame | None,
    delta: DataFrame,
    key_cols: list[str],
    measure_cols: list[str],
) -> DataFrame:
    """Incremental materialized-rollup maintenance: fold a new batch's
    pre-aggregated ``delta`` into the existing rollup ``state`` by
    element-wise addition per key — the only state discipline that
    makes an aggregate maintainable at 100 TB (recomputing a daily
    rollup over the full history is O(history); folding the new
    partition is O(batch + touched keys)).

    Works for any ADDITIVE measure set: counts, sums, sum-of-squares
    (variance via (Σx, Σx², n)), scaled-integer money, histogram bin
    counts, count-min grids. Averages/ratios must be carried as their
    additive parts and divided at read time — storing a ratio makes the
    state unfoldable, the classic MV-maintenance mistake.

    The fold is associative and commutative, so ANY batching of the
    same rows yields the identical rollup — the equivalence
    q_incremental_rollup gates against the one-shot batch oracle, and
    the property that makes replays/backfills idempotent-by-
    construction when each source partition is folded exactly once.

    Plan: one union + one map-side-combined exchange on the keys,
    bounded by |state keys| + |delta keys|.
    """
    if not key_cols or not measure_cols:
        raise ValueError("fold_additive_rollup requires keys and measures")
    merged = delta if state is None else state.unionByName(delta)
    return merged.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in measure_cols]
    )


def content_manifest(
    df: DataFrame,
    key_col: str,
    cols: list[str],
    n_shards: int = 16,
) -> DataFrame:
    """Per-shard content digests — the cheap "are these two copies of
    the table identical, and if not, WHERE?" primitive for export
    verification and cross-system sync (pairs with
    :func:`snapshot_diff`, which answers the expensive row-level
    question; run the manifest first, diff only the shards that
    disagree — O(changed shards), not O(table)). Each row's fingerprint
    is the portable 32-bit hash of its canonical serialized form
    (``\\x1f``-joined string casts, NULL as the explicit ``<NULL>``
    marker so null and empty differ); a shard's digest folds the
    fingerprints with two independent ORDER-INSENSITIVE accumulators
    (bit_xor and exact BIGINT sum — xor alone is blind to duplicated
    pairs, sum alone to crafted offsets; together collisions need both
    to coincide). Everything is engine-replayable integer arithmetic.

    Plan: one codegen projection + ONE map-side-combined exchange
    bounded by ``n_shards`` rows. Output: (shard int, n_rows long,
    digest_xor long, digest_sum long).
    """
    if n_shards < 1:
        raise ValueError("content_manifest requires n_shards >= 1")
    from salesforce_plugin_spark.functions.dedup import portable_hash32
    from salesforce_plugin_spark.functions.text import hash_bucket

    canon = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
            for c in cols
        ],
    )
    fp = portable_hash32(canon)
    shard = hash_bucket(F.col(key_col), n_shards).cast("int")
    return (
        df.select(shard.alias("shard"), fp.alias("__fp"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__fp)").alias("digest_xor"),
            F.sum("__fp").alias("digest_sum"),
        )
    )
