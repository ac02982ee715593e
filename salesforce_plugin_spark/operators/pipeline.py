"""The end-to-end training-corpus pipeline (north star, BASELINE.json):
clean → exact-dedup → quality/language filter → reproducible split, as ONE
lazy DataFrame plan.

This is the composition the individual operators exist for. Shape at
100 TB: a scan, one shuffle (fingerprint dedup), then pure map-side
filtering and split assignment — no collect, no second pass. Near-dup
removal (minhash/LSH, functions/dedup.py) slots in between dedup and
filtering when semantic dedup is wanted; it's kept out of the default
pipeline so the whole thing stays exactly reproducible and
oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from salesforce_plugin_spark.functions.text import (
    fingerprint,
    lang_id,
    punct_count,
    split_assign,
    token_count,
)


def build_training_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    langs: tuple[str, ...] = ("en",),
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Returns (id, text, fp, n_tokens, lang_pred, split) for the surviving
    documents:

    1. drop null/empty text;
    2. exact content dedup — one deterministic survivor (min id) per
       normalized-text fingerprint (hash-groupBy via window, one shuffle);
    3. quality gate — token count ≥ min_tokens and punctuation ratio ≤
       max_punct_ratio;
    4. language gate — marker-heuristic language ID ∈ ``langs``;
    5. reproducible split — md5 hash-bucket of the id (engine-portable).

    Every step is a pure function of the row (plus the dedup shuffle), so
    the same corpus always produces the same output set — the property a
    training-data pipeline needs to be auditable.
    """
    text = F.col(text_col)
    base = df.filter(text.isNotNull() & (F.length(F.trim(text)) > 0)).select(
        F.col(id_col), text.alias("text"), fingerprint(text).alias("fp")
    )
    # min_by hash-aggregation instead of a row_number window: same
    # deterministic survivor (min id per fingerprint) but no per-partition
    # sort, and the aggregate is partial-combined map-side — measured ~20%
    # faster than the window form at sf0.1, bigger at scale where a hot
    # fingerprint would otherwise sort one partition.
    deduped = (
        base.groupBy("fp")
        .agg(
            F.min_by(
                F.struct(F.col(id_col), F.col("text")), F.col(id_col)
            ).alias("__survivor")
        )
        .select(
            F.col(f"__survivor.{id_col}").alias(id_col),
            F.col("__survivor.text").alias("text"),
            "fp",
        )
    )
    enriched = deduped.select(
        F.col(id_col),
        "text",
        "fp",
        token_count(F.col("text")).alias("n_tokens"),
        punct_count(F.col("text")).cast("long").alias("n_punct"),
        lang_id(F.col("text")).alias("lang_pred"),
    )
    gated = enriched.filter(
        (F.col("n_tokens") >= min_tokens)
        & (
            F.col("n_punct").cast("double") / F.length("text")
            <= max_punct_ratio
        )
        & F.col("lang_pred").isin(*langs)
    )
    return gated.select(
        F.col(id_col),
        "text",
        "fp",
        "n_tokens",
        "lang_pred",
        split_assign(F.col(id_col), train_pct, val_pct).alias("split"),
    )


def mix_corpora(
    sources: list[tuple[DataFrame, float]],
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Weighted dataset mixing by deterministic subsampling: each source
    keeps the fraction of rows whose md5 hash-bucket falls under its rate
    (rate > 1.0 keeps everything — upsampling is a training-loader concern,
    not a storage concern). Selection is a pure function of (source order,
    id): reproducible across runs and engines, no RNG, no shuffle — the
    standard way to hit a target corpus blend (e.g. 70% web, 20% code,
    10% reference) at 100 TB without a sampling pass.
    """
    from salesforce_plugin_spark.functions.text import hash_bucket

    if not sources:
        raise ValueError("mix_corpora needs at least one (df, rate) source")
    parts = []
    for i, (df, rate) in enumerate(sources):
        tagged = df.withColumn("mix_source", F.lit(i))
        if rate < 1.0:
            # salt the bucket with the source index so the same id can be
            # kept in one source and dropped in another
            bucket = hash_bucket(
                F.concat_ws(":", F.lit(str(i)), F.col(id_col).cast("string")),
                n_buckets,
            )
            tagged = tagged.filter(bucket < int(rate * n_buckets))
        parts.append(tagged)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n: int,
) -> DataFrame:
    """Deterministic stratified sample: exactly ``min(n, |group|)`` rows
    per group, selected by md5-hash order of the id with the id itself as
    tie-break — the balanced eval-set / per-stratum-quota construction
    (e.g. "300 documents per (lang, source) cell"). Selection is a pure
    function of the group's id set: reproducible across runs, engines,
    and partitionings (no RNG seed to drift), and the hash order makes it
    an unbiased draw rather than "first n by id".

    Scale shape: ONE shuffle on the group keys; rank-based selection must
    sort each group, so a hot group sorts one partition (row_number
    window). That is inherent to exact-n quotas — when approximate quotas
    suffice at scale, prefer rate-based ``hash_bucket`` thresholding
    (:func:`mix_corpora`), which selects map-side with no shuffle at all.
    Unlike rate-based selection, exact-n membership is NOT append-stable:
    new rows can displace earlier picks by hash order (quota semantics).
    """
    order = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    cap: int,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep each row
    independently with probability ``min(1, weight / cap)`` where
    ``weight`` is a non-negative INTEGER column (token count, byte size,
    an importance score pre-scaled to integers) — the mixture-reweighting
    primitive of training-data pipelines ("sample long documents
    proportionally more", "downsample this source to its quality
    weight"). Rows with ``weight >= cap`` always survive.

    The coin flip is the md5-derived ``portable_hash32(id)`` compared by
    cross-multiplication — keep iff ``h * cap < 2^32 * weight`` — so
    selection is a pure integer function of the row's own id and weight:
    reproducible across runs, engines, partitionings, and appends (a new
    row's fate never depends on the rest of the corpus, unlike exact-n
    quotas). No divide, no float, no RNG state.

    Scale shape: a single map-side codegen projection + filter — zero
    shuffle, zero driver state; composes with any downstream plan. The
    cross-multiplication stays in BIGINT for ``cap * 2^32 < 2^63``
    (cap up to ~2·10^9), enforced here.
    """
    if cap <= 0:
        raise ValueError("weighted_sample requires cap > 0")
    if cap >= (1 << 31):
        raise ValueError("cap too large: h * cap must fit in BIGINT")
    from salesforce_plugin_spark.functions.dedup import portable_hash32

    h = portable_hash32(F.col(id_col).cast("string"))
    keep = (h * F.lit(cap)) < (F.lit(1 << 32) * F.col(weight_col).cast("long"))
    return df.filter(keep)


def negative_samples(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str,
    k: int = 4,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic pseudo-random negatives for contrastive training:
    for each anchor, up to ``k`` corpus items drawn by hash — WITHOUT a
    cartesian and without RNG state.

    Construction: the corpus reduces to one representative per hash
    bucket (``min(id)`` over ``portable_hash32(id) mod n_buckets`` — ONE
    bounded aggregate, ≤ ``n_buckets`` rows, broadcastable). Each anchor
    probes bucket ``portable_hash32(anchor || '#' || j) mod n_buckets``
    for ``j in [0, k)`` — a k-way literal explode + a broadcast equijoin,
    so the anchor side never shuffles. Self-pairs are dropped, and a
    probe into an empty bucket yields no row, so an anchor receives UP TO
    ``k`` negatives (exactly k whp once ``|corpus| >> n_buckets``).

    Every stage is an integer function of ids (md5 family), so the draw
    is reproducible across engines and partitionings — the property that
    lets a resumed or re-sharded training-data job regenerate identical
    pairs. Output (scalar-only): ``(anchor_id, j int, neg_id)``.

    At 100 TB: negatives come from bucket representatives, a corpus-size-
    independent relation; raise ``n_buckets`` for draw diversity (memory
    cost is the broadcast table, 16 bytes/bucket).
    """
    if k < 1 or n_buckets < 2:
        raise ValueError("negative_samples requires k >= 1, n_buckets >= 2")
    from salesforce_plugin_spark.functions.dedup import portable_hash32

    reps = (
        corpus.select(
            F.pmod(
                portable_hash32(F.col(id_col).cast("string")), F.lit(n_buckets)
            ).alias("__b"),
            F.col(id_col).alias("neg_id"),
        )
        .groupBy("__b")
        .agg(F.min("neg_id").alias("neg_id"))
    )
    probes = (
        anchors.select(F.col(id_col).alias("anchor_id"))
        .withColumn("j", F.explode(F.array(*[F.lit(j) for j in range(k)])))
        .withColumn(
            "__b",
            F.pmod(
                portable_hash32(
                    F.concat_ws(
                        "#", F.col("anchor_id").cast("string"), F.col("j").cast("string")
                    )
                ),
                F.lit(n_buckets),
            ),
        )
    )
    return (
        probes.join(F.broadcast(reps), "__b")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", F.col("j").cast("int").alias("j"), "neg_id")
    )


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 256,
    out_path: str | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into files of
    roughly ``target_file_mb`` (streaming sinks and fine-grained partitions
    accumulate KB-scale files whose per-file open/footer cost dominates
    scans at 100 TB). Returns the number of output partitions. Writes to
    ``out_path`` (default: in-place via overwrite) with a single
    round-robin repartition — no skew, no sort assumed."""
    import os as _os

    total_bytes = 0
    for dp, _, fs in _os.walk(path):
        total_bytes += sum(
            _os.path.getsize(_os.path.join(dp, f))
            for f in fs
            if f.endswith(".parquet") or f.startswith("part-")
        )
    n = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if out_path is None:
        # Spark cannot overwrite a path it is reading from; stage + swap.
        import shutil as _shutil

        staging = path.rstrip("/") + "__compacting"
        df.repartition(n).write.mode("overwrite").parquet(staging)
        _shutil.rmtree(path)
        _os.rename(staging, path)
    else:
        df.repartition(n).write.mode("overwrite").parquet(out_path)
    return n


def corpus_stats(corpus: DataFrame) -> DataFrame:
    """Per-split size/token report for the built corpus (one tiny agg)."""
    return corpus.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def pack_token_bins(
    chunks: DataFrame,
    seq_len: int,
    partition_cols: list[str],
    order_cols: list[str],
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each chunk to a fixed-token-budget training bin: bin id =
    floor(cumulative-tokens-before / seq_len) under a total order within
    each partition — the streaming analog of greedy sequence packing, as a
    pure window expression (exact integer arithmetic, no Python).

    One shuffle on ``partition_cols``; per-key state is the running sum the
    window computes. A chunk that crosses a bin boundary stays in the bin
    where it started, so a bin overflows seq_len by at most one chunk (and
    a single chunk larger than seq_len spans several bin widths, leaving
    the skipped ids empty) — the exact behavior of a sequential greedy
    packer folding over the same order, property-tested against one.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return chunks.withColumn(
        "bin_id", F.floor(cum_before / F.lit(seq_len)).cast("long")
    )


def corpus_to_sequences(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    seq_len: int = 256,
    chunk_tokens: int = 64,
    stride: int = 48,
    n_shards: int = 8,
) -> DataFrame:
    """Corpus → packed training sequences: overlapping context-window chunks
    (text.chunk_documents) packed into fixed-token bins (pack_token_bins) —
    the last mile from a cleaned corpus to dataloader-shaped units.

    Packing shards BY DEFAULT: the window partition key is (split, shard)
    with ``shard = md5-bucket(id) % n_shards``, carried through in the
    output. Partitioning only by split means one task sorts each split's
    entire chunk set — 3 window partitions total at ANY data size, a
    single-machine bottleneck at 100 TB. Sharding makes parallelism scale
    with ``n_shards`` (raise it with the cluster; packing quality is
    shard-local either way — each shard under-fills at most its own final
    bin). The shard key is the engine-portable md5 bucket, so the sharded
    form is still value-reproducible by any engine (the conformance oracle
    mirrors it). ``n_shards=1`` recovers the single-ordered-stream form
    (no shard column).
    """
    from salesforce_plugin_spark.functions.text import chunk_documents, hash_bucket

    chunks = chunk_documents(
        corpus, id_col, text_col, chunk_tokens, stride, carry=(split_col,)
    )
    if n_shards <= 1:
        return pack_token_bins(chunks, seq_len, [split_col], [id_col, "chunk_id"])
    chunks = chunks.withColumn("shard", hash_bucket(F.col(id_col), n_shards))
    return pack_token_bins(
        chunks, seq_len, [split_col, "shard"], [id_col, "chunk_id"]
    )


def budget_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Deterministic budget-constrained selection: per group, take rows
    in md5-hash order of the id until the cumulative ``weight_col``
    reaches ``budget`` — the "1B tokens per source" mixture-quota
    construction. A row is kept iff the running total THROUGH it is
    ≤ ``budget`` (so a group never exceeds budget; an over-budget first
    row is dropped rather than bursting the cap).

    Hash order makes the draw an unbiased, reproducible function of the
    group's id set — re-runs, engines, and partitionings agree, and
    unlike a quality-ordered take it doesn't bias the sample toward any
    correlated attribute. Contrast :func:`weighted_sample` (row-
    independent probability, approximate total) — budget_sample hits an
    EXACT total at the cost of a per-group sort; contrast
    :func:`sample_per_group` (exact row count n, not exact weight).

    Plan: ONE exchange on the group keys + a per-group window cumsum
    (hot groups sort one partition — inherent to exact quotas; shard
    the budget over an md5 sub-key, as token packing does, when one
    group outweighs a partition).
    """
    if budget <= 0:
        raise ValueError("budget_sample requires budget > 0")
    order = F.md5(F.col(id_col).cast("string").cast("binary"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__cum", F.sum(F.col(weight_col)).over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    epoch: int = 0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-epoch training order: every example gets a
    pseudo-random but fully reproducible ``(shard, pos)`` placement from
    the md5 of ``seed:epoch:id`` — a different permutation each epoch, the
    same permutation every re-run. This is the export step between a
    curated corpus and a data-parallel trainer (each of ``n_shards``
    readers consumes its own shard in ``pos`` order), done WITHOUT the
    global sort a naive ``ORDER BY rand()`` would cost, and without RNG
    state: a resumed or re-sharded job regenerates the identical order
    (the same property :func:`negative_samples` and the md5 split rely
    on).

    ``shard`` is the hash's top 32 bits mod ``n_shards`` (uniform, so
    shards balance to ~n/n_shards without a skew guard); ``pos`` is the
    example's rank within its shard by full-hash order (ties broken by
    id; dense 0..|shard|-1). Plan: ONE exchange on ``shard`` + a
    per-shard sort — at corpus scale that is ``repartition(shard)`` +
    ``sortWithinPartitions``, exactly the physical layout the writer
    needs, so the shuffle IS the export layout (no second pass).
    """
    if n_shards <= 0:
        raise ValueError("epoch_shuffle requires n_shards > 0")
    key = F.md5(
        F.concat_ws(
            ":",
            F.lit(str(seed)),
            F.lit(str(epoch)),
            F.col(id_col).cast("string"),
        ).cast("binary")
    )
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    out = df.withColumn("__key", key).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col("__key"), F.col(id_col))
    return out.select(
        F.col(id_col),
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def kfold_assign(
    df: DataFrame,
    group_col: str,
    k: int = 5,
) -> DataFrame:
    """GROUPED k-fold assignment: fold = md5-hash of the GROUP key mod
    ``k``, so every row of a group lands in the same fold — the
    cross-validation split that prevents leakage when rows within a
    group are correlated (all documents from one source/domain, all
    events of one user). Plain row-level k-fold on such data leaks
    near-duplicates across folds and inflates eval scores.

    Pure map-side projection (no shuffle, no RNG state): the assignment
    is a function of the group key alone, so it is reproducible across
    runs, engines, partitionings, and appends — a new group's fold never
    disturbs existing ones (same contract as
    :func:`~salesforce_plugin_spark.functions.text.hash_bucket`, which
    supplies the bucket).
    """
    if k < 2:
        raise ValueError("kfold_assign requires k >= 2")
    from salesforce_plugin_spark.functions.text import hash_bucket

    return df.withColumn("fold", hash_bucket(F.col(group_col), k).cast("int"))


def render_chat(
    df: DataFrame,
    id_col: str,
    text_col: str,
    instruction_words: int = 8,
    user_tag: str = "<|user|>",
    assistant_tag: str = "<|assistant|>",
) -> DataFrame:
    """Deterministic chat-template rendering with loss-mask offsets —
    the corpus → SFT-example formatting step. The document's first
    ``instruction_words`` whitespace tokens become the user turn, the
    remainder the assistant turn, rendered as::

        <|user|>\\n{instruction}\\n<|assistant|>\\n{response}

    Output carries the CHARACTER OFFSET where the assistant span starts
    (``prompt_chars``) and per-turn token counts — exactly what a
    completion-only loss mask needs; trainers mask everything before
    ``prompt_chars``. All string/integer builtins in one codegen
    projection (no shuffle, no UDF); any real chat schema (system turns,
    multi-turn) is the same concat_ws composition over more columns.

    Output (scalar-only): ``(id, rendered string, prompt_chars int,
    total_chars int, prompt_tokens int, completion_tokens int)``.
    """
    # \s+ over trimmed text (the shared tokens() contract): a literal
    # single-space split would turn newlines/double spaces into phantom
    # or fused "words", shifting the mask boundary. Rendering therefore
    # CANONICALIZES whitespace (tokens re-join with single spaces).
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    instr = F.array_join(F.slice(toks, 1, instruction_words), " ")
    resp = F.array_join(
        F.slice(
            toks,
            instruction_words + 1,
            F.greatest(F.size(toks) - instruction_words, F.lit(0)),
        ),
        " ",
    )
    prompt = F.concat(
        F.lit(user_tag + "\n"), instr, F.lit("\n" + assistant_tag + "\n")
    )
    rendered = F.concat(prompt, resp)
    return df.select(
        F.col(id_col),
        rendered.alias("rendered"),
        F.length(prompt).cast("int").alias("prompt_chars"),
        F.length(rendered).cast("int").alias("total_chars"),
        F.least(F.size(toks), F.lit(instruction_words))
        .cast("int")
        .alias("prompt_tokens"),
        F.greatest(F.size(toks) - instruction_words, F.lit(0))
        .cast("int")
        .alias("completion_tokens"),
    )


def length_buckets(
    df: DataFrame,
    token_count_col,
    min_bucket: int = 16,
) -> DataFrame:
    """Power-of-two sequence-length bucket accounting — the batching-
    efficiency report behind bucketed batching / packing decisions: pad
    every example up to the next power of two and measure what padding
    costs per bucket.

    The bucket is computed with INTEGER BIT ARITHMETIC, no log2 on
    doubles (a float log at an exact power-of-two boundary is
    engine-ambiguous in the last ulp): ``ceil_pow2(n) = 1 <<
    length(bin(n-1))`` for n ≥ 2, via the binary-string-length msb
    idiom, floored at ``min_bucket``. Map-side projection + one
    aggregate bounded by the number of distinct buckets (~log of max
    length).

    Output (scalar-only): ``(bucket long, n_docs long, sum_tokens long,
    padding long)`` where ``padding = Σ (bucket − tokens)`` — the wasted
    compute the report exists to surface.
    """
    n = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    ).cast("long")
    ceil_pow2 = F.expr(
        "CASE WHEN __n <= 1 THEN CAST(1 AS BIGINT) ELSE "
        "shiftleft(CAST(1 AS BIGINT), "
        "CAST(length(bin(__n - 1)) AS INT)) END"
    )
    bucket = F.greatest(ceil_pow2, F.lit(min_bucket).cast("long"))
    return (
        df.select(n.alias("__n"))
        .select(bucket.alias("bucket"), F.col("__n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("sum_tokens"),
            F.sum(F.col("bucket") - F.col("__n")).cast("long").alias("padding"),
        )
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    tau: int = 2,
) -> DataFrame:
    """Temperature-based source mixing weights — the multilingual /
    multi-source sampling-rate calculator (the p_s^(1/τ) reweighting
    of mBERT/XLM-R and every data-mixture recipe since): raising small
    sources and damping dominant ones so a τ-tempered sampler sees a
    flatter source distribution than the raw token counts.

    EXACT for τ ∈ {1, 2, 4}: the tempered mass is ``n`` (τ=1),
    ``isqrt(n)`` (τ=2), or ``isqrt(isqrt(n))`` (τ=4) — the corrected
    integer square root (double seed + ±2 integer CASE, the
    with_exact_cos_ppm discipline), so weights replay identically in
    any engine; no float pow. ``share_ppm = w·10⁶ div Σw`` and
    ``boost_ppm = (w·N_tokens·10⁶) div (Σw·n)`` (the over/under-
    sampling factor vs natural frequency, >10⁶ = upsampled) are exact
    DECIMAL(38,0) floor divides.

    One corpus scan (token counts per group partial-combine), then
    everything is bounded by |groups|: the Σw aggregate is a 1-row
    broadcast. Output (scalar-only): ``(group, n_docs long, n_tokens
    long, w long, share_ppm long, boost_ppm long)``.
    """
    from salesforce_plugin_spark.functions.text import tokens

    if tau not in (1, 2, 4):
        raise ValueError("temperature_mix supports tau in {1, 2, 4}")
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col))).cast("long"))
        .cast("long")
        .alias("n_tokens"),
    )
    return temperature_mix_from_counts(per, group_col, tau)


def temperature_mix_from_counts(
    per: DataFrame,
    group_col: str,
    tau: int = 2,
) -> DataFrame:
    """:func:`temperature_mix` from a pre-aggregated ``(grp, n_docs,
    n_tokens)`` table — the entry point for additive count state
    (streaming face: doc and token counts are additive, so the generic
    fold maintains them and this reduction must equal the one-shot
    batch mix)."""
    if tau not in (1, 2, 4):
        raise ValueError("temperature_mix supports tau in {1, 2, 4}")

    def isqrt_col(frame: DataFrame, src: str, dst: str) -> DataFrame:
        return (
            frame.withColumn("__p", F.expr(f"CAST({src} AS decimal(38,0))"))
            .withColumn(
                "__y0",
                F.expr(
                    "CAST(FLOOR(SQRT(CAST(__p AS DOUBLE))) AS decimal(38,0))"
                ),
            )
            .withColumn(
                dst,
                F.expr(
                    "CASE WHEN (__y0+2)*(__y0+2) <= __p THEN __y0+2 "
                    "WHEN (__y0+1)*(__y0+1) <= __p THEN __y0+1 "
                    "WHEN __y0*__y0 <= __p THEN __y0 "
                    "WHEN (__y0-1)*(__y0-1) <= __p THEN __y0-1 "
                    "ELSE __y0-2 END"
                ).cast("long"),
            )
            .drop("__p", "__y0")
        )

    if tau == 1:
        weighted = per.withColumn("w", F.col("n_tokens"))
    elif tau == 2:
        weighted = isqrt_col(per, "n_tokens", "w")
    else:
        weighted = isqrt_col(
            isqrt_col(per, "n_tokens", "__w2"), "__w2", "w"
        ).drop("__w2")
    totals = weighted.agg(
        F.sum("w").cast("long").alias("__sw"),
        F.sum("n_tokens").cast("long").alias("__st"),
    )
    from salesforce_plugin_spark.functions.exactmath import dcast, dfloor

    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_tokens",
            "w",
            F.expr(
                dfloor(f"{dcast('w')} * 1000000", dcast("__sw"))
            ).alias("share_ppm"),
            F.expr(
                dfloor(
                    f"{dcast('w')} * {dcast('__st')} * 1000000",
                    f"{dcast('__sw')} * {dcast('n_tokens')}",
                )
            ).alias("boost_ppm"),
        )
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    total_n: int,
) -> DataFrame:
    """Exactly-``total_n`` stratified sample with LARGEST-REMAINDER
    (Hamilton) proportional allocation — the eval-set construction
    primitive: every stratum gets ``floor(n_s·total_n / N)`` slots and
    the leftover slots go to the largest fractional remainders, so the
    allocation sums to total_n EXACTLY (naive per-stratum rounding
    over- or under-shoots) and stays within ±1 of true
    proportionality. Ties on the remainder break by stratum value —
    fully deterministic, no float quota.

    Row selection within a stratum is the reproducible-split
    discipline: rank by ``(md5(id), id)`` and keep the first
    ``alloc_s`` — any engine replays the same sample.

    Plan: one stratum-count aggregate (bounded by |strata|), a
    |strata|-sized window for the remainder ranking, then one window
    over the data partitioned by stratum pruned to the allocation.
    Output (scalar-only): ``(id_col, stratum_col, rk int)`` with
    exactly ``total_n`` rows (fewer only if total_n > |df|).
    """
    if total_n < 0:
        raise ValueError("stratified_sample requires total_n >= 0")
    counts = df.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    # NB: Spark resolves column names case-insensitively by default, so
    # the total's alias must not collide with per-stratum "__n"
    tot = counts.agg(F.sum("__n").cast("long").alias("__tot"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "__s",
        "__n",
        F.expr(f"(__n * {total_n}L) div __tot").alias("__floor"),
        F.expr(f"(__n * {total_n}L) % __tot").alias("__rem"),
    )
    w = Window.orderBy(F.col("__rem").desc(), F.col("__s"))
    leftovers = quota.crossJoin(
        F.broadcast(
            quota.agg(
                (F.lit(total_n) - F.sum("__floor")).cast("long").alias("__L")
            )
        )
    ).select(
        "__s",
        (
            F.col("__floor")
            + F.when(F.row_number().over(w) <= F.col("__L"), 1).otherwise(0)
        )
        .cast("long")
        .alias("__alloc"),
    )
    ws = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(id_col, stratum_col)
        .withColumn("rk", F.row_number().over(ws))
        .join(
            F.broadcast(leftovers.withColumnRenamed("__s", stratum_col)),
            stratum_col,
        )
        .filter(F.col("rk") <= F.col("__alloc"))
        .select(id_col, stratum_col, F.col("rk").cast("int").alias("rk"))
    )
