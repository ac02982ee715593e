"""Data-quality validation: declarative expectations evaluated in ONE
aggregate pass over the data (training-data pipelines gate ingestion on
these before anything touches a 100 TB corpus).

Each expectation compiles to a conditional-count column expression, so a
suite of N checks costs a single scan + single (tiny) aggregate row — not
N jobs. The report is exact, not sampled.

The reference has no validation layer (its correctness strategy is
delegation, SURVEY §5); this is part of the north-star extension surface
alongside dedup/quality-scoring (BASELINE.json).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Expectation:
    """One named check; ``violated`` is a boolean Column over a row."""

    name: str
    violated: Column

    @staticmethod
    def not_null(col: str) -> "Expectation":
        return Expectation(f"not_null_{col}", F.col(col).isNull())

    @staticmethod
    def in_range(col: str, lo=None, hi=None) -> "Expectation":
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(col) < lo)
        if hi is not None:
            cond = cond | (F.col(col) > hi)
        return Expectation(f"in_range_{col}", cond)

    @staticmethod
    def matches(col: str, pattern: str) -> "Expectation":
        return Expectation(
            f"matches_{col}", ~F.col(col).rlike(pattern) | F.col(col).isNull()
        )

    @staticmethod
    def one_of(col: str, values: list) -> "Expectation":
        return Expectation(f"one_of_{col}", ~F.col(col).isin(values))

    @staticmethod
    def min_length(col: str, n: int) -> "Expectation":
        return Expectation(f"min_length_{col}", F.length(col) < n)


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """One row: total row count + one violation count per expectation.
    Single scan, map-side partial aggregation, constant-size output."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(e.violated, 1).otherwise(0)).alias(f"viol_{e.name}")
        for e in expectations
    ]
    return df.agg(*aggs)


def validate_or_raise(
    df: DataFrame, expectations: list[Expectation], max_violation_ratio: float = 0.0
) -> dict:
    """Run the suite; raise ValueError naming every failed expectation whose
    violation ratio exceeds the budget. Returns the report dict on success.
    (The one intentional driver-side action — the report is a single row.)"""
    row = validate(df, expectations).collect()[0].asDict()
    n = row["n_rows"] or 1
    failed = {
        k: v for k, v in row.items()
        if k != "n_rows" and (v or 0) / n > max_violation_ratio
    }
    if failed:
        detail = ", ".join(f"{k}={v}/{n}" for k, v in sorted(failed.items()))
        raise ValueError(f"data-quality violations over budget: {detail}")
    return row


def uniqueness_report(df: DataFrame, keys: list[str]) -> DataFrame:
    """Exact duplicate-key profile: (n_keys, n_dup_keys, n_dup_rows). One
    shuffle on the key — the check you run before declaring a primary key."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("__n") > 1, 1).otherwise(0)).alias("n_dup_keys"),
        F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(0)).alias("n_dup_rows"),
    )


def approx_profile(
    df: DataFrame,
    distinct_cols: list[str],
    quantile_cols: list[str] | None = None,
    rsd: float = 0.05,
    quantile_error: float = 0.01,
) -> DataFrame:
    """Sketch-based column profile for 100 TB-scale data exploration: one
    row with HyperLogLog++ distinct estimates and approximate quantiles.

    This is the scale alternative to the EXACT aggregates the query
    surface must keep (SOQL COUNT_DISTINCT is exact — D10): HLL++ and
    quantile sketches are mergeable, so the profile is ONE map-side pass
    plus a constant-size combine — no distinct shuffle, no sort, state
    O(1/rsd² per column) regardless of cardinality. Estimates, not oracle
    material: guaranteed only within their error bounds (HLL relative
    ``rsd``; quantile rank error ``quantile_error``).
    """
    aggs = [
        F.approx_count_distinct(c, rsd=rsd).alias(f"{c}_approx_distinct")
        for c in distinct_cols
    ]
    for c in quantile_cols or []:
        aggs.append(
            F.percentile_approx(
                c, [0.5, 0.95, 0.99], int(1.0 / quantile_error)
            ).alias(f"{c}_q50_95_99")
        )
    return df.agg(*aggs)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """EXACT per-column table profile in long form — one output row per
    profiled column: (column_name, n_rows, n_nulls, n_distinct, min_num,
    max_num, min_str, max_str). Numeric columns report min/max as DOUBLE
    (an actual data value — exact in any engine); string columns report
    min/max as binary-collation strings (Spark and DuckDB both compare
    strings bytewise by default); each family NULLs the other's slots.

    Execution shape: ONE scan — all aggregates evaluate in a single
    global aggregation (the exact-distincts expand the input k ways for k
    profiled columns, the standard cost of exact multi-column distinct;
    use :func:`approx_profile` when sketch accuracy is acceptable at
    100 TB), then the 1×(6k) row is exploded to long form driver-free.
    This is the engine-side analog of the reference's describe()-driven
    schema introspection (A4) extended with data statistics.
    """
    from pyspark.sql.types import NumericType

    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs, structs = [], []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.count(c).alias(f"__nonnull_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
        ]
        if c in numeric:
            aggs += [
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            ]
        else:
            aggs += [
                F.min(c).alias(f"__min_{c}"),
                F.max(c).alias(f"__max_{c}"),
            ]
    prof = df.agg(*aggs)
    for c in cols:
        is_num = c in numeric
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__rows_{c}").alias("n_rows"),
                (F.col(f"__rows_{c}") - F.col(f"__nonnull_{c}")).alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if is_num else F.col(f"__min_{c}")).alias("min_str"),
                (F.lit(None).cast("string") if is_num else F.col(f"__max_{c}")).alias("max_str"),
            )
        )
    return prof.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def fk_orphans(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    relationship: str,
) -> DataFrame:
    """Referential-integrity audit for one foreign-key relationship: ONE
    summary row ``(relationship, n_child_rows, n_child_keys,
    n_orphan_rows, n_orphan_keys)`` counting child rows/keys whose
    ``fk_col`` has no match in ``parent.pk_col`` (NULL FKs are not
    orphans — they are absent references, flagged separately by
    ``Expectation.not_null``). Union several calls for a schema-wide
    audit — the post-load check an ELT pipeline runs after every
    snapshot/CDC apply (the reference pipeline trusts Redshift
    constraints it never enforces; declared-but-unenforced FKs are
    exactly where orphans accumulate).

    Plan: the parent reduces to its DISTINCT key set; the child's
    distinct-FK aggregate LEFT-joins it (AQE broadcasts a dim-sized key
    set; degrades to SMJ past the threshold rather than OOM) carrying
    per-key child-row counts, so orphan rows are summed WITHOUT a
    second child scan. Exchanges: child key aggregate + the join; the
    final aggregate is one row.
    """
    keys = (
        child.filter(F.col(fk_col).isNotNull())
        .groupBy(F.col(fk_col).alias("__fk"))
        .agg(F.count("*").alias("__rows"))
    )
    pk = parent.select(F.col(pk_col).alias("__fk")).distinct().withColumn(
        "__hit", F.lit(1)
    )
    joined = keys.join(pk, "__fk", "left")
    return joined.agg(
        F.lit(relationship).alias("relationship"),
        F.sum("__rows").alias("n_child_rows"),
        F.count("*").alias("n_child_keys"),
        F.sum(F.when(F.col("__hit").isNull(), F.col("__rows")).otherwise(0)).alias(
            "n_orphan_rows"
        ),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphan_keys"),
    )


def fd_violations(
    df: DataFrame, lhs_cols: list[str], rhs_col: str
) -> DataFrame:
    """Functional-dependency audit: the determinant values for which
    ``lhs_cols -> rhs_col`` does NOT hold — one row per violating key
    with ``n_rows``, ``n_distinct`` (> 1 by construction), and the
    min/max observed ``rhs`` as deterministic examples. Empty result =
    the dependency holds corpus-wide.

    This is the schema-contract check between `uniqueness_report`
    (lhs -> whole row) and `fk_orphans` (cross-table): "one price per
    SKU", "one nation per customer", "one schema hash per object
    version" — assumptions ELT silently bakes in and drift silently
    breaks.

    Plan: ONE exchange on the determinant (exact count-distinct over
    the dependent rides the same aggregate); output bounded by
    violating keys. For a quick pass/fail at 100 TB, aggregate the
    result once more to a count.
    """
    if not lhs_cols:
        raise ValueError("fd_violations requires at least one lhs column")
    return (
        df.groupBy(*lhs_cols)
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(F.col(rhs_col)).alias("n_distinct"),
            F.min(F.col(rhs_col)).alias("rhs_min"),
            F.max(F.col(rhs_col)).alias("rhs_max"),
        )
        .filter(F.col("n_distinct") > 1)
    )


def erasure_impact(
    subjects: DataFrame,
    key_col: str,
    cascades: list,
) -> DataFrame:
    """Right-to-be-forgotten impact audit: for a set of data-subject
    keys, the exact row and distinct-key counts each cascade table
    would lose — the plan a deletion pipeline reviews BEFORE executing
    (the E5-idempotence mirror image: upsert's inverse), and the
    evidence record an erasure request leaves behind. ``cascades`` is
    ``[(table_name, df, fk_col), ...]`` where ``fk_col`` refs the
    subject key directly, or ``(table_name, df, fk_col, keys_df,
    keys_col)`` for an INDIRECT path — ``keys_df`` carries the bridged
    key population (e.g. the subject's order keys for the
    orders→lineitem hop) and ``fk_col`` refs THAT.

    Plan: every key set is a broadcast semi-side (an erasure batch —
    and its bridged expansion — is human-scale); each cascade is ONE
    broadcast semi-join + a 1-row aggregate, unioned — no cascade
    table is scanned more than once, nothing shuffles wider than the
    per-table count. Output (scalar-only): ``(table string,
    n_rows long, n_keys long)``.
    """
    if not cascades:
        raise ValueError("erasure_impact requires at least one cascade")
    out = None
    default_keys = subjects.select(
        F.col(key_col).alias("__k")
    ).distinct()
    for cascade in cascades:
        if len(cascade) == 3:
            name, df, fk = cascade
            keys = default_keys
        else:
            name, df, fk, keys_df, keys_col = cascade
            keys = keys_df.select(F.col(keys_col).alias("__k")).distinct()
        hit = df.join(
            F.broadcast(keys), df[fk] == F.col("__k"), "left_semi"
        )
        agg = hit.agg(
            F.lit(name).alias("table"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.col(fk)).cast("long").alias("n_keys"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k_min: int = 5,
) -> DataFrame:
    """Re-identification risk audit for a release/training extract: one
    row per quasi-identifier equivalence class with its size ``k``
    (how many records share this QI combination — a class of 1 is a
    unique individual), the distinct-sensitive-value count ``l``
    (l-diversity: a class where every member shares the sensitive value
    leaks it even at large k), and an ``at_risk`` flag for classes
    below ``k_min``. Sweeney's k-anonymity / Machanavajjhala's
    l-diversity as one grouped aggregate — the governance check run
    before shipping any dataset keyed on demographic-ish columns.

    Plan: ONE exchange on the QI tuple (count + exact count-distinct
    ride the same aggregate); output bounded by the QI domain, never
    the table. At 100 TB add a ``.filter(at_risk)`` downstream for the
    actionable slice, or aggregate once more for the headline rate —
    both reuse this exchange.

    Output (scalar-only): quasi cols + ``(k long, l long, at_risk
    boolean)``; ``l`` is 0-filled when no sensitive column is given.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity_audit requires quasi columns")
    aggs = [F.count(F.lit(1)).cast("long").alias("k")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).cast("long").alias("l")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    if sensitive_col is None:
        out = out.withColumn("l", F.lit(0).cast("long"))
    return out.withColumn("at_risk", F.col("k") < k_min)


def benford_expected_ppm() -> list[int]:
    """Pinned Benford first-digit distribution: ``round(10⁶ ·
    log10(1 + 1/d))`` for d = 1..9, computed HERE once in Python
    (driver-side constants, the ndcg_discounts discipline) so neither
    engine evaluates a log in-plan. Sums to 1,000,000 − 0/+ rounding."""
    import math

    return [round(10**6 * math.log10(1 + 1 / d)) for d in range(1, 10)]


def benford_audit(df: DataFrame, amount_col) -> DataFrame:
    """First-digit (Benford) audit of a positive integer amount column
    — the classic fabricated-data / unit-mixing smell test for money
    and count columns (organically-grown magnitudes follow
    log10(1+1/d); flat or spiked digits indicate synthesis, caps, or a
    unit seam). The first digit comes from the INTEGER's decimal
    string (identical formatting in every engine — no float log10 /
    pow roundtrip), observed shares are exact ppm, and the expected
    distribution is the pinned :func:`benford_expected_ppm` table.

    One map-side-combined 9-group aggregate over a single scan; rows
    with amount ≤ 0 are excluded (Benford is undefined there — audit
    them separately).

    Output (scalar-only): ``(digit int, n long, obs_ppm long,
    exp_ppm long, dev_ppm long)`` with dev = obs − exp (signed).
    """
    pos = df.filter(amount_col > 0).select(
        F.substring(amount_col.cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counts = pos.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return benford_from_counts(counts)


def benford_from_counts(counts: DataFrame) -> DataFrame:
    """:func:`benford_audit` from a pre-aggregated ``(digit int, n
    long)`` table — the entry point for additive digit-count state
    (the streaming ingestion monitor folds per-batch counts and feeds
    the sum here; the ks_from_counts precedent)."""
    exp = benford_expected_ppm()
    total = counts.agg(F.sum("n").cast("long").alias("__tot"))
    exp_col = F.element_at(
        F.array(*[F.lit(e).cast("long") for e in exp]), F.col("digit")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr("n * 1000000 div __tot").cast("long").alias("obs_ppm"),
            exp_col.alias("exp_ppm"),
            (
                F.expr("n * 1000000 div __tot").cast("long") - exp_col
            ).alias("dev_ppm"),
        )
    )
