"""Distributed cardinality sketching: K-Minimum-Values (KMV).

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is the prod
fast path, but its register layout is engine-private — no other engine
can replay it, so it can't sit under a cross-engine differential gate.
KMV (Bar-Yossef et al. 2002) is the sketch that CAN: keep the k smallest
values of a uniform hash of the column; if fewer than k distinct hashes
exist the count is exact, otherwise estimate

    D ≈ (k - 1) * H / h_k

where ``h_k`` is the k-th smallest hash and ``H`` the hash space size.
With an md5-derived hash (``dedup.portable_hash32``) every stage —
hashing, the k-smallest election, the final integer division — is
bit-reproducible in any md5-capable engine, which is exactly the
property a correctness gate (or a cross-engine migration audit at
100 TB) needs. Standard error is ~1/sqrt(k-2) (~13% at k=64).

Plan shape, per group: (1) distinct-hash aggregate — one exchange on
``(group, hash)`` with map-side partial dedup; (2) ``row_number`` window
ordered by hash over the *distinct* hashes (state per group is the
surviving distinct set, already reduced); (3) a k-row-per-group filter
and a final tiny aggregate. Sketch unions (the reason KMV scales: merge
= merge-sort the k-lists and re-truncate) come free here by re-running
the same plan over a union of inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from salesforce_plugin_spark.functions.dedup import portable_hash32
from salesforce_plugin_spark.functions.exactmath import dcast, dfloor

#: portable_hash32 maps into [0, 2^32); the estimator needs the space size.
_HASH_SPACE = 1 << 32


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``value_col``.

    Output (scalar-only): the ``group_cols``, ``k`` (int), ``n_kept``
    (hashes retained, = min(distinct, k)), ``kth_hash`` (the largest
    retained hash, long) and ``est_distinct`` (long; exact when
    ``n_kept < k``, else ``(k-1)*2^32 div kth_hash`` — integer floor
    division, identical across engines).
    """
    if k < 2:
        raise ValueError("kmv requires k >= 2")
    groups = group_cols or []
    hashed = (
        df.select(*groups, portable_hash32(F.col(value_col)).alias("__h"))
        .groupBy(*groups, "__h")
        .agg(F.lit(1).alias("__one"))
    )
    # two-level k-smallest election: pre-truncate per (group, salt) so the
    # final per-group sort sees at most n_salts*k rows, not the whole
    # distinct-hash set — the difference between O(D log D) and O(k) state
    # per group when D is millions
    n_salts = 32
    pre = Window.partitionBy(*groups, F.pmod(F.col("__h"), F.lit(n_salts))).orderBy(
        "__h"
    )
    truncated = hashed.withColumn("__prn", F.row_number().over(pre)).filter(
        F.col("__prn") <= k
    )
    w = Window.partitionBy(*groups).orderBy("__h")
    kept = truncated.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = kept.groupBy(*groups).agg(
        F.count("*").cast("int").alias("n_kept"),
        F.max("__h").alias("kth_hash"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("long")).otherwise(
        F.expr(f"{(k - 1) * _HASH_SPACE}L div kth_hash")
    )
    return agg.select(
        *groups,
        F.lit(k).alias("k"),
        "n_kept",
        "kth_hash",
        est.alias("est_distinct"),
    )


def kmv_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col_a: str,
    value_col_b: str | None = None,
    k: int = 64,
) -> DataFrame:
    """KMV set-operation estimates over two keyed inputs (Beyer et al.,
    "On Synopses for Distinct-Value Estimation Under Multiset Operations",
    SIGMOD'07): union cardinality, intersection cardinality, and Jaccard —
    from ONE merged k-minimum-values sketch.

    The union sketch is the k smallest distinct hashes of A ∪ B with
    per-side membership flags carried along; with ``K∩`` = flagged-both
    hashes among the kept k:

        |A ∪ B| ≈ (k-1) * H / h_k          (exact when n_kept < k)
        |A ∩ B| ≈ (K∩ / n_kept) * |A ∪ B|  (ratio estimator)
        J(A,B)  ≈ K∩ / n_kept

    Every stage is engine-replayable: md5-derived hashes
    (``dedup.portable_hash32``), max-flag merge, k-smallest election, and
    integer floor divisions — so the whole estimator sits under the
    cross-engine differential gate (the reason to prefer KMV over HLL's
    private register layout). Jaccard is reported as integer per-mille to
    keep the output float-free; both divisions yield NULL on an empty
    merged sketch (two empty inputs) rather than raising.

    Plan shape: each side is hashed and flag-tagged map-side; ONE exchange
    merges flags per distinct hash (map-side partial ``max``); the
    k-smallest election is the same two-level salted window as
    :func:`kmv_distinct` (per-salt pre-truncation bounds the final sort at
    ``n_salts * k`` rows); everything after is a 1-row aggregate. Nothing
    downstream of the first aggregate scales with the data.
    """
    if k < 2:
        raise ValueError("kmv requires k >= 2")
    vb = value_col_b or value_col_a
    a = df_a.select(
        portable_hash32(F.col(value_col_a)).alias("__h"),
        F.lit(1).alias("__ina"),
        F.lit(0).alias("__inb"),
    )
    b = df_b.select(
        portable_hash32(F.col(vb)).alias("__h"),
        F.lit(0).alias("__ina"),
        F.lit(1).alias("__inb"),
    )
    merged = (
        a.unionByName(b)
        .groupBy("__h")
        .agg(F.max("__ina").alias("__ina"), F.max("__inb").alias("__inb"))
    )
    n_salts = 32
    pre = Window.partitionBy(F.pmod(F.col("__h"), F.lit(n_salts))).orderBy("__h")
    truncated = merged.withColumn("__prn", F.row_number().over(pre)).filter(
        F.col("__prn") <= k
    )
    w = Window.partitionBy().orderBy("__h")
    kept = truncated.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = kept.agg(
        F.count("*").cast("int").alias("n_kept"),
        F.max("__h").alias("kth_hash"),
        F.sum(F.col("__ina") * F.col("__inb")).cast("long").alias("n_both"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("long")
    ).otherwise(F.expr(f"{(k - 1) * _HASH_SPACE}L div kth_hash"))
    return (
        agg.select(
            F.lit(k).alias("k"),
            "n_kept",
            "kth_hash",
            "n_both",
            union_est.alias("union_est"),
        )
        .select(
            "k",
            "n_kept",
            "kth_hash",
            "n_both",
            "union_est",
            F.expr("(n_both * union_est) div n_kept").alias("inter_est"),
            F.expr("(1000 * n_both) div n_kept").alias("jaccard_permille"),
        )
    )


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Single-pass approximate quantiles via a fixed equi-width histogram
    — the distributed-quantile pattern whose every step is deterministic
    and engine-replayable (unlike rank-interpolation over doubles, where
    tie-breaking and interpolation arithmetic differ between engines, or
    GK/t-digest sketches, whose merge order is nondeterministic).

    Values clamp into ``n_bins`` equal bins over ``[lo, hi)``; the
    q-quantile estimate is the UPPER EDGE of the first bin whose
    cumulative count reaches ``ceil(q * n)``. Error is bounded by one bin
    width — size ``n_bins`` to the precision the consumer needs.

    Plan: one map-side-combined exchange on the bin id (≤ ``n_bins``
    rows survive), a cumulative-sum window over those rows, then a tiny
    broadcast cross join against the quantile list and a ``min_by``
    aggregate per q. Nothing after the first aggregate scales with the
    data.

    Output: ``(q double, bin int, est double, n_total long)`` — prefixed
    by ``group_cols`` when given (per-group quantiles: the cumulative
    window and the final election partition by group; exchange stays
    bounded by ``|groups| * n_bins`` rows). ``est`` is computed with one
    multiply + one add over exact operands, so it is bit-identical
    across engines.
    """
    if not qs:
        raise ValueError("binned_quantiles requires at least one quantile")
    if not lo < hi:
        raise ValueError("binned_quantiles requires lo < hi")
    groups = group_cols or []
    width = (hi - lo) / n_bins
    raw_bin = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(
        F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin)
    ).cast("int")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, bin_.alias("__bin"))
        .groupBy(*groups, "__bin")
        .agg(F.count("*").alias("__cnt"))
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("__cum", F.sum("__cnt").over(w)).withColumn(
        "__n", F.sum("__cnt").over(Window.partitionBy(*groups))
    )
    q_df = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = cum.crossJoin(F.broadcast(q_df)).filter(
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__n"))
    )
    return (
        hit.groupBy(*groups, "q")
        .agg(
            F.min("__bin").alias("bin"),
            F.max("__n").alias("n_total"),
        )
        .select(
            *groups,
            "q",
            "bin",
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("est"),
            "n_total",
        )
    )


def _cm_buckets(value: Column, width: int, depth: int) -> Column:
    """Array of ``depth`` (row, bucket) structs for a value: row ``i``
    hashes ``"{i}:{value}"`` with the portable md5 family into
    ``[0, width)``. Computed in ONE codegen projection (no UDF)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    portable_hash32(
                        F.concat(
                            F.lit(f"{i}:"), value.cast("string")
                        )
                    ),
                    F.lit(width),
                )
                .cast("int")
                .alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cm_sketch(
    df: DataFrame, value_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of ``value_col``:
    a ``depth x width`` grid of counters, here as an exploded long table
    ``(row int, bucket int, n long)`` — the mergeable frequency summary a
    100 TB pipeline ships between stages instead of a full group-by
    (union two sketches = SUM the grids; error bound n_total*e/width with
    probability 1 - exp(-depth)).

    The explode multiplies rows by ``depth`` BEFORE aggregation, but the
    hash aggregate partial-combines map-side, so the exchange carries at
    most ``depth * width`` rows per task regardless of input size. Hashes
    are the engine-portable md5 family (``dedup.portable_hash32`` over
    ``"{row}:{value}"``), so the whole grid — and any estimate read from
    it — is bit-reproducible in any md5-capable engine.
    """
    if width < 2 or depth < 1:
        raise ValueError("cm_sketch requires width >= 2 and depth >= 1")
    pairs = df.select(
        F.explode(_cm_buckets(F.col(value_col), width, depth)).alias("__rb")
    )
    return (
        pairs.groupBy(
            F.col("__rb.row").alias("row"), F.col("__rb.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates from a count-min ``sketch`` for every
    distinct value in ``candidates``: est = min over rows of the value's
    bucket counter (an upper bound on the true count; never an
    undercount).

    The sketch is at most ``depth * width`` rows, so it is BROADCAST and
    the candidate side — which may be large — never shuffles: explode the
    ``depth`` probes map-side, hash-join the broadcast grid, and
    partial-combine the per-value ``min``. Output (scalar-only):
    ``(value, est_n long)``.

    ``(width, depth)`` are part of the sketch's identity: they MUST
    equal the values the grid was built with — a mismatch silently
    probes the wrong buckets (typically estimating 0). Ship them
    alongside the grid the way a schema is shipped with data.
    """
    if not {"row", "bucket", "n"} <= set(sketch.columns):
        raise ValueError(
            "sketch must be a cm_sketch grid with (row, bucket, n) columns"
        )
    probes = candidates.select(F.col(value_col).alias("value")).distinct()
    probes = probes.select(
        "value",
        F.explode(_cm_buckets(F.col("value"), width, depth)).alias("__rb"),
    )
    joined = probes.join(
        F.broadcast(sketch),
        (F.col("__rb.row") == F.col("row"))
        & (F.col("__rb.bucket") == F.col("bucket")),
        "left",
    )
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_n")
    )


def kmv_join_size(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col_a: str,
    key_col_b: str | None = None,
    k: int = 128,
) -> DataFrame:
    """Equi-join cardinality estimate from ONE merged KMV sketch carrying
    per-side key frequencies — the join-planning statistic that decides
    broadcast-vs-shuffle or flags a runaway join BEFORE running it at
    100 TB (|A ⋈ B| on key v is Σ_v fA(v)·fB(v); computing it exactly IS
    the join's group-by).

    Per side the input reduces to (key-hash, count) — one
    partial-combined exchange each — then the flag-merge / k-smallest
    election is exactly :func:`kmv_set_ops`'s plan with counts instead
    of flags. The kept k hashes are a uniform sample of the union's
    distinct keys, so

        |A ⋈ B| ≈ (D_union div n_kept) * Σ_kept fA·fB

    with ``D_union`` the standard KMV estimate. Every stage — md5
    hashes, BIGINT count products, the two integer floor divisions — is
    engine-replayable, so the estimator itself sits under the
    differential gate (gate it beside the exact value to SEE the
    error, as q_kmv_distinct does).

    Output (scalar-only, 1 row): ``(k int, n_kept int, kth_hash long,
    sum_ff long, union_est long, join_est long)``.
    """
    if k < 2:
        raise ValueError("kmv requires k >= 2")
    kb = key_col_b or key_col_a
    a = (
        df_a.select(portable_hash32(F.col(key_col_a)).alias("__h"))
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__ca"), F.lit(0).cast("long").alias("__cb"))
    )
    b = (
        df_b.select(portable_hash32(F.col(kb)).alias("__h"))
        .groupBy("__h")
        .agg(F.lit(0).cast("long").alias("__ca"), F.count(F.lit(1)).alias("__cb"))
    )
    merged = (
        a.unionByName(b)
        .groupBy("__h")
        .agg(F.sum("__ca").alias("__ca"), F.sum("__cb").alias("__cb"))
    )
    n_salts = 32
    pre = Window.partitionBy(F.pmod(F.col("__h"), F.lit(n_salts))).orderBy("__h")
    truncated = merged.withColumn("__prn", F.row_number().over(pre)).filter(
        F.col("__prn") <= k
    )
    w = Window.partitionBy().orderBy("__h")
    kept = truncated.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = kept.agg(
        F.count("*").cast("int").alias("n_kept"),
        F.max("__h").alias("kth_hash"),
        F.sum(F.col("__ca") * F.col("__cb")).alias("sum_ff"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("long")
    ).otherwise(F.expr(f"{(k - 1) * _HASH_SPACE}L div kth_hash"))
    return (
        agg.select(
            F.lit(k).alias("k"),
            "n_kept",
            "kth_hash",
            "sum_ff",
            union_est.alias("union_est"),
        )
        .select(
            "k",
            "n_kept",
            "kth_hash",
            "sum_ff",
            "union_est",
            F.expr("(union_est div n_kept) * sum_ff").alias("join_est"),
        )
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins_out: int,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Equi-depth feature binning — the discretization step feature
    pipelines run before hashing/embedding a numeric column: learn
    ``n_bins_out`` quantile cut points with :func:`binned_quantiles`
    (single pass, deterministic) and label every row with the count of
    cut points at or below its value (bin ∈ [0, n_bins_out-1]).

    The cut-point table is ``n_bins_out - 1`` rows — broadcast; labeling
    is a broadcast join + a partial-combined per-row conditional sum, so
    the data side is scanned once and never shuffles wide (the only
    exchanges are the sketch's bounded ones and the per-row aggregate's
    own key partitioning). Exactly the two-pass shape a 100 TB
    discretizer needs: pass 1 reduces to ≤ n_bins rows, pass 2 is
    map-heavy labeling.

    Output (scalar-only): one row per input row —
    ``(value_col, bin int)`` plus any pass-through columns the caller
    pre-selected into ``df`` (they group the per-row aggregate, so keep
    a unique id among them).
    """
    if n_bins_out < 2:
        raise ValueError("quantile_bins requires n_bins_out >= 2")
    qs = [i / n_bins_out for i in range(1, n_bins_out)]
    cuts = binned_quantiles(df, value_col, qs, lo, hi, n_bins).select(
        F.col("est").alias("__cut")
    )
    passthrough = [c for c in df.columns if c != value_col]
    return (
        df.crossJoin(F.broadcast(cuts))
        .groupBy(*passthrough, value_col)
        .agg(
            F.sum(
                F.when(F.col(value_col) >= F.col("__cut"), 1).otherwise(0)
            )
            .cast("int")
            .alias("bin")
        )
    )


def bloom_positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The ``n_hashes`` Bloom bit positions of ``key`` (long columns in
    ``[0, n_bits)``): ``portable_hash32(key || ':' || i) mod n_bits`` —
    md5-derived, so any engine replays the exact positions (the classic
    double-hashing trick would also work, but per-index salting keeps the
    oracle SQL a one-liner per position)."""
    return [
        F.pmod(
            portable_hash32(
                F.concat_ws(":", key.cast("string"), F.lit(str(i)))
            ),
            F.lit(n_bits),
        ).cast("long")
        for i in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 4096, n_hashes: int = 3
) -> DataFrame:
    """Build-side of a Bloom semi-join filter: the DISTINCT set bit
    positions (``pos`` long) of every key in ``df`` — at most ``n_bits``
    rows regardless of build cardinality.

    This is the engine-portable, explicitly-planned form of the runtime
    filters lakehouse engines inject (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` builds one
    JVM-side; its layout is engine-private so it can never sit under a
    cross-engine gate). Size ``n_bits`` at ~10 bits per expected build
    key for ~1% false-positive rate with ``n_hashes=3``
    (fpp ≈ (1 - e^(-kn/m))^k).

    Plan shape: one map-side projection of the k positions per build row,
    one DISTINCT exchange bounded by ``n_bits`` rows. The result is a
    broadcast-sized relation even for multi-million-key builds
    (1M positions ≈ 8 MB of longs).
    """
    pos = bloom_positions(F.col(key_col), n_bits, n_hashes)
    rows = [df.select(p.alias("pos")) for p in pos]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.distinct()


def bloom_prune(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key_col`` passes the Bloom filter
    ``bloom`` (from :func:`bloom_build` with the SAME ``n_bits`` /
    ``n_hashes``). One-sided: every true match survives; a bounded
    fraction of non-matches leak through (false positives) to be removed
    by the real join afterwards.

    Why it matters at 100 TB: a selective fact⨝dim join otherwise
    shuffles the ENTIRE fact side on the join key before the join can
    drop non-matches. Pruning first — k broadcast left-semi joins against
    the ≤``n_bits``-row position set, all map-side, zero fact-side
    exchange — cuts the shuffle to the surviving fraction. This is the
    portable analog of Spark's runtime bloom pushdown, usable when the
    filter must be built once and reused across stages/engines.
    """
    probe = df
    for i, p in enumerate(bloom_positions(F.col(key_col), n_bits, n_hashes)):
        tag = f"__bloom_p{i}"
        probe = (
            probe.withColumn(tag, p)
            .join(
                F.broadcast(bloom.withColumnRenamed("pos", tag)),
                on=tag,
                how="left_semi",
            )
            .drop(tag)
        )
    return probe


def percentile_normalize(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Percentile-rank normalization of a numeric column — the feature-
    engineering transform that replaces a raw score with its corpus
    percentile (robust to scale/outliers, comparable across sources):
    every row gains ``pct_ppm`` (long, parts-per-million), the fraction
    of rows whose histogram bin is at or below this row's bin.

    Exact rank normalization needs a global sort (or a per-group sort) —
    a full-width exchange of the data. This sketch form is the 100 TB
    shape: pass 1 reduces to a ≤ ``groups x n_bins``-row cumulative
    histogram (one map-side-combined exchange); pass 2 joins it back
    BROADCAST on the bin id — the data side is scanned once and never
    shuffles. Resolution is one bin (choose ``n_bins`` accordingly);
    ties within a bin share a rank, which is what makes the result
    deterministic under any row order. ``10^6 * cum div n`` is an
    integer floor — engine-replayable, no float at any boundary.

    Output: all of ``df``'s columns plus ``pct_ppm``.
    """
    groups = group_cols or []
    width = (hi - lo) / n_bins
    raw_bin = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin)).cast("int")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, bin_.alias("__bin"))
        .groupBy(*groups, "__bin")
        .agg(F.count("*").alias("__cnt"))
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = (
        counts.withColumn("__cum", F.sum("__cnt").over(w))
        .withColumn("__n", F.sum("__cnt").over(Window.partitionBy(*groups)))
        .select(*groups, "__bin", F.expr("1000000 * __cum div __n").alias("pct_ppm"))
    )
    return (
        df.withColumn("__bin", bin_)
        .join(F.broadcast(hist), [*groups, "__bin"])
        .drop("__bin")
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1000,
) -> DataFrame:
    """Tukey-fence robust outlier detection from the histogram sketch:
    rows where ``value`` falls outside ``[Q1 - 1.5*IQR, Q3 + 1.5*IQR]``
    — the quartile-based complement to ``analytics.zscore_outliers``
    (median/IQR ignore the outliers themselves, so one huge corrupt
    value can't widen the fence that should catch it, the masking
    problem mean/sigma fences have).

    Quartiles come from :func:`binned_quantiles` (single bounded pass);
    with ``lo/hi/n_bins`` chosen so the bin width is an exact binary
    double, Q1/Q3 — and therefore the fences ``Q1 - 3*(Q3-Q1)/2`` /
    ``Q3 + 3*(Q3-Q1)/2``, built from one subtract/multiply/divide-by-2
    each — are bit-identical across engines, and the fence comparison
    is unambiguous. The factor is fixed at Tukey's 3/2 (exact in
    binary) by design.

    Plan: the sketch's bounded exchange, a 1-row fence aggregate
    broadcast back, one map-side filter. Output: all of ``df``'s
    columns plus ``lo_fence``/``hi_fence`` (double).
    """
    cuts = binned_quantiles(df, value_col, [0.25, 0.75], lo, hi, n_bins)
    fences = cuts.agg(
        F.min(F.when(F.col("q") == 0.25, F.col("est"))).alias("__q1"),
        F.min(F.when(F.col("q") == 0.75, F.col("est"))).alias("__q3"),
    ).select(
        (F.col("__q1") - (F.lit(3) * (F.col("__q3") - F.col("__q1"))) / F.lit(2))
        .alias("lo_fence"),
        (F.col("__q3") + (F.lit(3) * (F.col("__q3") - F.col("__q1"))) / F.lit(2))
        .alias("hi_fence"),
    )
    return df.crossJoin(F.broadcast(fences)).filter(
        (F.col(value_col) < F.col("lo_fence"))
        | (F.col(value_col) > F.col("hi_fence"))
    )


def histogram_counts(
    df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int = 1024
) -> DataFrame:
    """The bounded histogram that underlies :func:`binned_quantiles`,
    exposed as state: ``(bin int, cnt long)`` rows, ≤ ``n_bins`` of
    them, from one map-side-combined exchange. Histograms are purely
    ADDITIVE — the histogram of a union is the element-wise sum — which
    makes this the streaming/mergeable face of the quantile sketch
    (append per-batch counts, sum on read), the same state discipline
    as the count-min grid."""
    if not lo < hi:
        raise ValueError("histogram_counts requires lo < hi")
    width = (hi - lo) / n_bins
    raw_bin = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin)).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def quantiles_from_counts(
    counts: DataFrame, qs: list[float], lo: float, hi: float, n_bins: int = 1024
) -> DataFrame:
    """Quantile election over a ``(bin, cnt)`` histogram (from
    :func:`histogram_counts` or summed streamed state): identical
    output contract to :func:`binned_quantiles` —
    ``(q, bin, est, n_total)`` with the upper-edge convention — so a
    batch sketch and a streamed, state-summed sketch gate against the
    SAME oracle. Everything here is bounded by ``n_bins`` rows."""
    if not qs:
        raise ValueError("quantiles_from_counts requires at least one quantile")
    width = (hi - lo) / n_bins
    w = (
        Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__n", F.sum("cnt").over(Window.partitionBy())
    )
    q_df = counts.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = cum.crossJoin(F.broadcast(q_df)).filter(
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__n"))
    )
    return (
        hit.groupBy("q")
        .agg(F.min("bin").alias("bin"), F.max("__n").alias("n_total"))
        .select(
            "q",
            "bin",
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("est"),
            "n_total",
        )
    )


def histogram_tvd(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Distribution-drift measurement between two corpora: the total
    variation distance ``TVD = 1/2 * Σ_bins |p_A(bin) - p_B(bin)|``
    over a shared equi-width histogram — the deterministic alternative
    to PSI/KL (whose ``log`` can never hash-gate and blows up on empty
    bins; TVD is bounded [0, 1], defined everywhere, and rational in
    the counts).

    All integer: per bin ``|c_A * n_B - c_B * n_A|`` (the common-
    denominator numerator), summed exactly, then
    ``tvd_ppm = Σ * 500000 div (n_A * n_B)``. Output is ONE row:
    ``(n_a, n_b, sum_absdiff, tvd_ppm, worst_bin, worst_absdiff)`` —
    the worst bin localizes WHERE the distributions diverge.
    0 = identical binned shape; 10^6 = disjoint support.

    Overflow bound: ``Σ * 500000 ≤ 10^6 * n_A * n_B < 2^63`` needs
    ``n_A * n_B < 9·10^12`` (~3M rows each). Past that, pre-divide both
    histograms' counts by a common factor — the ppm result is unchanged
    to quantization.

    Plan: two bounded histogram exchanges (:func:`histogram_counts`),
    a full-outer join on ≤ ``n_bins`` rows, a 1-row aggregate. Nothing
    scales past ``n_bins`` after the first aggregates.
    """
    ha = histogram_counts(df_a, value_col, lo, hi, n_bins).withColumnRenamed(
        "cnt", "ca"
    )
    hb = histogram_counts(df_b, value_col, lo, hi, n_bins).withColumnRenamed(
        "cnt", "cb"
    )
    joined = (
        ha.join(hb, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    totals = joined.agg(
        F.sum("ca").alias("__na"), F.sum("cb").alias("__nb")
    )
    diff = joined.crossJoin(F.broadcast(totals)).select(
        "bin",
        F.abs(F.col("ca") * F.col("__nb") - F.col("cb") * F.col("__na")).alias(
            "absdiff"
        ),
        "__na",
        "__nb",
    )
    return diff.agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.sum("absdiff").alias("sum_absdiff"),
        F.expr("sum(absdiff) * 500000 div (max(__na) * max(__nb))").alias(
            "tvd_ppm"
        ),
        F.max_by("bin", F.struct(F.col("absdiff"), -F.col("bin"))).alias(
            "worst_bin"
        ),
        F.max("absdiff").alias("worst_absdiff"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    q_low: float = 0.05,
    q_high: float = 0.95,
    n_bins: int = 1024,
) -> DataFrame:
    """Winsorization — clamp a numeric column at sketch-learned
    quantile fences — the standard heavy-tail tamer applied before
    means/regressions/scalers that outliers would otherwise dominate
    (the complement of :func:`iqr_outliers`, which FLAGS tail rows;
    winsorize KEEPS them at the fence).

    Fences are the ``q_low`` / ``q_high`` estimates of
    :func:`binned_quantiles` — single-pass, deterministic, exact-binary
    arithmetic — so both the cut values and every comparison replay
    bit-identically cross-engine. Two-pass shape at 100 TB: pass 1
    reduces to <= ``n_bins`` rows; pass 2 is a 1-row broadcast join +
    map-side clamp (no shuffle on the data side).

    Output: one row per input row — the caller's pre-selected columns
    with ``value_col`` replaced by ``(value double, winsorized double,
    clamped int)``.
    """
    if not 0.0 < q_low < q_high < 1.0:
        raise ValueError("winsorize requires 0 < q_low < q_high < 1")
    fences = (
        binned_quantiles(df, value_col, [q_low, q_high], lo, hi, n_bins)
        .groupBy()
        .agg(
            F.min(F.when(F.col("q") == q_low, F.col("est"))).alias("__flo"),
            F.min(F.when(F.col("q") == q_high, F.col("est"))).alias("__fhi"),
        )
    )
    v = F.col(value_col)
    # guard NULL inputs explicitly: Spark's greatest/least SKIP nulls,
    # so an unguarded clamp would rewrite NULL to the lower fence --
    # fabricating data in exactly the rows the caller knows least about
    wz = F.when(
        v.isNotNull(), F.least(F.greatest(v, F.col("__flo")), F.col("__fhi"))
    )
    passthrough = [c for c in df.columns if c != value_col]
    return (
        df.crossJoin(F.broadcast(fences))
        .select(
            *passthrough,
            v.alias("value"),
            wz.alias("winsorized"),
            F.when(v.isNotNull(), (v != wz).cast("int")).alias("clamped"),
        )
    )


def rolling_quantiles(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
    window_days: int = 7,
) -> DataFrame:
    """Per-key TRAILING-WINDOW quantiles ("rolling p95 per service") —
    the observability workhorse that has no sliding-window exact form
    at scale (quantiles aren't subtractable) and whose t-digest
    implementations are merge-order nondeterministic. Solved the
    histogram way: quantile state IS additive.

    Plan: collapse events to day-level per-(key, bin) histograms
    (ONE map-side-combined exchange; ≤ keys × days × n_bins rows
    survive — never event volume), explode each day row into the ≤
    ``window_days`` report days it serves (the rolling_wau move), sum
    bins per (key, report day), then run the standard upper-edge
    election per (key, day). Every value is exact-binary (size lo/hi
    so width is a power of two) and the election is the
    binned_quantiles contract, so results replay cross-engine.

    Output (scalar-only): ``(key, day date, q double, est double,
    n_total long)`` — days with no window data are absent (join a
    calendar spine for gap-explicit output).
    """
    if not qs:
        raise ValueError("rolling_quantiles requires at least one quantile")
    if not lo < hi:
        raise ValueError("rolling_quantiles requires lo < hi")
    if window_days < 1:
        raise ValueError("rolling_quantiles requires window_days >= 1")
    width = (hi - lo) / n_bins
    raw_bin = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw_bin)).cast(
        "int"
    )
    daily = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("__d"),
            bin_.alias("bin"),
        )
        .groupBy("key", "__d", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return rolling_quantiles_from_daily(
        daily, qs, lo, hi, n_bins, window_days
    )


def rolling_quantiles_from_daily(
    daily: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
    window_days: int = 7,
) -> DataFrame:
    """:func:`rolling_quantiles` from a pre-aggregated
    ``(key, __d date, bin, cnt)`` day-histogram table — the entry point
    for ADDITIVE day-histogram state (the streaming face folds
    per-batch (key, day, bin) counts and feeds the sum here; compacted
    warehouse rollups compose the same way)."""
    if window_days < 1:
        raise ValueError(
            "rolling_quantiles_from_daily requires window_days >= 1"
        )
    width = (hi - lo) / n_bins
    served = daily.select(
        "key",
        "bin",
        "cnt",
        F.explode(
            F.sequence(
                F.col("__d"), F.date_add(F.col("__d"), window_days - 1)
            )
        ).alias("day"),
    )
    windowed = served.groupBy("key", "day", "bin").agg(
        F.sum("cnt").alias("cnt")
    )
    w = (
        Window.partitionBy("key", "day")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = windowed.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__n", F.sum("cnt").over(Window.partitionBy("key", "day"))
    )
    q_df = daily.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    hit = cum.crossJoin(F.broadcast(q_df)).filter(
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__n"))
    )
    return (
        hit.groupBy("key", "day", "q")
        .agg(F.min("bin").alias("bin"), F.max("__n").alias("n_total"))
        .select(
            "key",
            "day",
            "q",
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("est"),
            F.col("n_total").cast("long").alias("n_total"),
        )
    )


def cm_error_eval(
    df: DataFrame,
    value_col: str,
    width: int = 64,
    depth: int = 2,
) -> DataFrame:
    """Count-min sketch accuracy against EXACT per-value counts — the
    sketch's own evaluation harness (the q_minhash_error / q_ann_recall
    discipline applied to CM): every distinct value's estimate, true
    count, and overcount, so the (width, depth) budget is sized from
    measured error instead of the worst-case bound. CM never
    undercounts, so ``overcount = est − true ≥ 0`` — an assertable
    invariant the gate also checks implicitly.

    One sketch build (depth·width-bounded exchange), one exact count
    (the group-by the sketch would replace at scale — affordable here
    BECAUSE this is the eval, run on a sample or a fixture), one
    broadcast-grid probe join. Output (scalar-only):
    ``(value, true_n long, est_n long, overcount long)``.
    """
    sketch = cm_sketch(df, value_col, width, depth)
    exact = df.groupBy(F.col(value_col).alias("value")).agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    est = cm_estimate(sketch, df, value_col, width, depth)
    return exact.join(est, "value").select(
        "value",
        "true_n",
        F.col("est_n").cast("long").alias("est_n"),
        (F.col("est_n") - F.col("true_n")).cast("long").alias("overcount"),
    )


# --- HyperLogLog (portable-register variant) --------------------------------
#
# Spark's approx_count_distinct IS HLL++ but its registers are
# engine-private (the module docstring's reason KMV carries the gate).
# This is the complement: an HLL whose register computation is pinned to
# public, engine-portable primitives (md5 → 60-bit integer; bucket = low
# 6 bits; rank = leading-zero count of the remaining 54 bits via
# length(bin(w)) — both engines strip leading zeros), so any md5-capable
# engine replays the registers AND the integer estimator bit-for-bit
# (Flajolet et al. 2007, the m=64 classic estimator).
#
# α₆₄ is pinned as the integer constant ALPHA64_PPM = round(10⁶ ·
# 0.7213/(1 + 1.079/64)); the constant is part of the contract, like the
# quantization constants elsewhere. The small-range linear-counting
# correction needs ln() (float) and is deliberately OMITTED — this
# variant exists to be measured, and hll_error_eval makes the resulting
# low-cardinality bias visible instead of hiding it behind a float path
# the gate couldn't check.

#: 10⁶ · α₆₄ for the m=64 estimator, rounded — pinned contract constant.
ALPHA64_PPM = 709340

#: round(10⁶·ln(64/V)) for V in 1..64 — the linear-counting correction's
#: ENTIRE domain as a pinned integer table (computed once here, embedded
#: as literals in both the Spark plan and the DuckDB oracle SQL, so no
#: engine evaluates ln at query time).
LN64_TABLE_PPM = [4158883, 3465736, 3060271, 2772589, 2549445, 2367124, 2212973, 2079442, 1961659, 1856298, 1760988, 1673976, 1593934, 1519826, 1450833, 1386294, 1325670, 1268511, 1214444, 1163151, 1114361, 1067841, 1023389, 980829, 940007, 900787, 863046, 826679, 791587, 757686, 724896, 693147, 662376, 632523, 603535, 575364, 547965, 521297, 495321, 470004, 445311, 421213, 397683, 374693, 352221, 330242, 308735, 287682, 267063, 246860, 227057, 207639, 188591, 169899, 151550, 133531, 115832, 98440, 81346, 64539, 48009, 31749, 15748, 0]

#: 2^55 (the largest power of two used as an exact BIGINT literal here).
_POW55 = 1 << 55


def hll_registers(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """(group, bucket, max-rank) register rows for an m=64 portable HLL.

    One exchange on (group, bucket) with map-side partial max — register
    state is ≤ 64 rows per group no matter how many input rows, which is
    the whole point of HLL at 100 TB: the shuffle is bounded by
    |groups|·64, not by cardinality (KMV's k-smallest needs a distinct
    pass first; HLL's max is directly partial-aggregable).
    """
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    # h div 64 via an integer shift — `/` would be DOUBLE division,
    # losing bits past 2^53 on a 60-bit hash.
    w = F.shiftright(h, 6)
    rank = F.when(w == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(w))
    )
    # NULLs carry no cardinality: md5(NULL) would land a phantom
    # NULL-bucket register that inflates n_regs
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, (h % 64).alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("m_j"))
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL cardinality estimate as an exact-integer pipeline.

    Raw estimator: ``est = floor(α₆₄_ppm·m²·2⁶⁴ / (S·10⁶))`` with
    ``S = Σ 2^(64−M_j)`` over all 64 registers (absent registers
    contribute 2⁶⁴). Every term is an exact DECIMAL(38,0):
    2^(64−M) = 512·2^(55−M) keeps the shift inside BIGINT range
    (M ≥ 1 ⇒ exponent ≤ 54), and the numerator 709340·4096·2⁶⁴ ≈
    5.4e28 sits well inside 38 digits.

    Small-range correction (Flajolet et al. 2007 §4): when empty
    registers exist (V = 64 − n_regs > 0) and the raw estimate is
    ≤ 5/2·m, linear counting ``m·ln(m/V)`` applies. ln is float — so
    it is pinned as the 64-entry integer table ``LN64_TABLE_PPM``
    (V ∈ [1,64] is the ENTIRE domain), a contract constant shared
    verbatim by the oracle generator; the correction is then the pure
    integer ``(64·table[V]) div 10⁶``. Output: ``(*group_cols,
    est_distinct long)``.
    """
    regs = hll_registers(df, group_cols, value_col)
    return hll_estimate_from_registers(regs, group_cols)


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """:func:`hll_distinct`'s estimator from a pre-built ``(group,
    bucket, m_j)`` register table — the entry point for MERGED register
    state (streaming face / sketch unions: registers merge by MAX,
    which is idempotent and commutative, so at-least-once delivery and
    batch overlap are both harmless — strictly weaker requirements
    than the additive-count faces' disjoint-slice contract)."""
    # shiftleft's first arg MUST be BIGINT — a bare `1` is INT and the
    # 32-bit shift silently wraps for exponents ≥ 31.
    s_present = F.sum(
        F.expr(f"{dcast('shiftleft(CAST(1 AS BIGINT), 55 - m_j)')} * 512")
    )
    n_regs = F.count(F.lit(1))
    per_group = regs.groupBy(*group_cols).agg(
        s_present.alias("__s_present"), n_regs.alias("__n_regs")
    )
    s_total = (
        f"__s_present + {dcast('64 - __n_regs')} * {dcast(str(_POW55))} * 512"
    )
    num = f"{dcast(str(ALPHA64_PPM * 4096))} * {dcast(str(_POW55))} * 512"
    raw = F.expr(dfloor(num, f"({s_total}) * 1000000"))
    v = F.lit(64) - F.col("__n_regs")
    lc_tab = F.array(*[F.lit(x) for x in LN64_TABLE_PPM])
    # exact-multiple identity (the dfloor discipline, in Column algebra):
    # the numerator ≤ 64·4158883 ≈ 2.7e8 ≪ 2^53, so the double divide of
    # an exact multiple is exact.
    lc_num = F.lit(64).cast("long") * F.element_at(lc_tab, v.cast("int")).cast(
        "long"
    )
    lc = ((lc_num - lc_num % 1000000) / F.lit(1000000)).cast("long")
    return per_group.select(
        *group_cols,
        F.when((v > 0) & (raw <= 160), lc)
        .otherwise(raw)
        .cast("long")
        .alias("est_distinct"),
    )


def hll_error_eval(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """HLL accuracy against EXACT per-group distinct counts — the
    cm_error_eval / minhash_error discipline applied to the cardinality
    sketch: per group ``(true_distinct, est_distinct, err signed)``, so
    the m=64 register budget (theoretical σ ≈ 1.04/√64 ≈ 13%) is sized
    from measured error, and the linear-counting/raw estimator
    crossover is measured rather than assumed to behave as published.
    The exact side is the count-distinct the sketch replaces at
    scale — affordable here because this is the eval."""
    est = hll_distinct(df, [group_col], value_col)
    exact = df.groupBy(group_col).agg(
        F.count_distinct(F.col(value_col)).cast("long").alias("true_distinct")
    )
    return exact.join(est, group_col).select(
        group_col,
        "true_distinct",
        "est_distinct",
        (F.col("est_distinct") - F.col("true_distinct"))
        .cast("long")
        .alias("err"),
    )


def quantile_error_eval(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1000,
    scale: int = 1000,
) -> DataFrame:
    """Histogram-quantile accuracy against EXACT order statistics — the
    q_cm_error / q_hll discipline applied to the quantile sketch: per
    requested q, the binned estimate vs the exact k-th smallest value
    (k = ceil(q·n), the same ceil-rank the sketch targets), both scaled
    to integer millis, signed error — so ``n_bins`` is sized from
    measured error instead of the one-bin-width worst case.

    The exact side is one global sort-rank pass (the cost the sketch
    exists to avoid at 100 TB — affordable here BECAUSE this is the
    eval); the estimate side is the production one-exchange histogram.
    Values are quantized round(value·scale) BEFORE ranking so the order
    statistic is an integer both engines agree on; the binned ``est``
    is a multiple of the exact-binary bin width, so round(est·scale)
    is exact too. Output (scalar-only): ``(q double, est_milli long,
    true_milli long, err_milli long)``.
    """
    est = binned_quantiles(df, value_col, qs, lo, hi, n_bins).select(
        "q",
        F.round(F.col("est") * scale, 0).cast("long").alias("est_milli"),
    )
    v = df.filter(F.col(value_col).isNotNull()).select(
        F.round(F.col(value_col).cast("double") * scale, 0)
        .cast("long")
        .alias("__v")
    )
    ranked = v.select(
        "__v", F.row_number().over(Window.orderBy("__v")).alias("__rk")
    )
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    ks = qdf.crossJoin(
        F.broadcast(v.agg(F.count(F.lit(1)).alias("__n")))
    ).select("q", F.ceil(F.col("q") * F.col("__n")).cast("int").alias("__k"))
    exact = ranked.join(
        F.broadcast(ks), ranked["__rk"] == ks["__k"]
    ).select("q", F.col("__v").alias("true_milli"))
    return est.join(exact, "q").select(
        "q",
        "est_milli",
        "true_milli",
        (F.col("est_milli") - F.col("true_milli"))
        .cast("long")
        .alias("err_milli"),
    )


def ks_statistic(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    quant: int = 1000,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic — the UNBINNED
    companion to :func:`histogram_tvd` (TVD depends on a bin choice;
    KS is the supremum of the empirical-CDF gap over the observed
    values themselves, the standard drift test between a reference and
    a candidate sample). Fully integer: values quantize to scaled
    longs, cumulative counts ride the distributed prefix sum
    (:func:`~salesforce_plugin_spark.operators.partitioning
    .global_cumsum` — NOT a single-partition window), and the gap is
    cross-multiplied to ``|C₁·n₂ − C₂·n₁|`` so no engine divides at
    the argmax. The supremum's location (smallest qv tiebreak) comes
    from one TakeOrderedAndProject over the distinct-value rows.

    ``d_num`` is exact while n₁·n₂ < 2⁶³ (10⁹-row samples) — past
    that it fails LOUDLY at the BIGINT cast under ANSI (the modularity
    q_num contract); ``d_ppm = d_num·10⁶ div (n₁·n₂)`` always fits.

    Output (one row): ``(n1, n2, d_num, d_ppm, at_qv)``.
    """
    qv = F.round(F.col(value_col) * quant, 0).cast("long").alias("qv")
    ua = a.select(qv, F.lit(1).alias("ca"), F.lit(0).alias("cb"))
    ub = b.select(qv, F.lit(0).alias("ca"), F.lit(1).alias("cb"))
    g = (
        ua.unionByName(ub)
        .groupBy("qv")
        .agg(
            F.sum("ca").cast("long").alias("ca"),
            F.sum("cb").cast("long").alias("cb"),
        )
    )
    return ks_from_counts(g)


def ks_from_counts(g: DataFrame) -> DataFrame:
    """:func:`ks_statistic` from a pre-aggregated ``(qv long, ca long,
    cb long)`` per-value count table — the entry point for additive
    count state (the streaming drift monitor folds per-batch counts
    and feeds the sum here; the changepoint_from_daily precedent)."""
    from salesforce_plugin_spark.operators.partitioning import (
        global_cumsum,
    )

    cum = global_cumsum(g, [F.col("qv")], ["ca", "cb"])
    n = g.agg(
        F.sum("ca").cast("long").alias("n1"),
        F.sum("cb").cast("long").alias("n2"),
    )
    gap = cum.crossJoin(F.broadcast(n)).withColumn(
        "__gap",
        F.expr(
            "abs(" + dcast("cum_ca") + " * " + dcast("n2")
            + " - " + dcast("cum_cb") + " * " + dcast("n1") + ")"
        ),
    )
    top = gap.orderBy(F.col("__gap").desc(), F.col("qv").asc()).limit(1)
    return top.select(
        "n1",
        "n2",
        F.expr("CAST(__gap AS BIGINT)").alias("d_num"),
        F.expr(
            dfloor("__gap * 1000000", dcast("n1") + " * " + dcast("n2"))
        ).alias("d_ppm"),
        F.col("qv").alias("at_qv"),
    )
