"""F1/F2 deduplication: exact/fingerprint/line/span dedup, MinHash+LSH near-dup, SimHash, connected components, semantic blocking.

Split from the single-file conformance registry in round 6; byte-identical
query builders and oracle SQL. The ordered public registry lives in
``salesforce_plugin_spark.conformance`` (the package __init__).
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import *  # noqa: F401,F403


# ---------------------------------------------------------------------------
# C3/C4/C5/C7/C8, B5/B8/B9: the plugin's own transforms
# ---------------------------------------------------------------------------

def q_coerce_epoch(spark, sf_dir):
    """C3+C8: epoch-seconds coercion (file path) and epoch-millis decode
    (COPY path) round-trip, as the dual the reference encodes."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    coerced = TR.coerce_to_epoch_seconds(li, ["l_shipdate"])
    return coerced.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").alias("epoch_s"),
        TR.decode_epoch_millis(F.col("l_shipdate") * 1000).cast("date").cast("string").alias("decoded_date"),
    )


def q_newline_scrub(spark, sf_dir):
    """C4: CR/LF scrub of string cells (CSV single-line invariant)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", X.scrub_newlines(F.col("text")).alias("clean_text")
    )


def q_varchar_truncate(spark, sf_dir):
    """C7: TRUNCATECOLUMNS — silent truncation to declared varchar length."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = TR.truncate_varchar(d, {"text": 80})
    return t.select(
        "doc_id",
        F.col("text").alias("clipped"),
        F.length("text").cast("long").alias("clipped_len"),
    )


def q_lowercase_schema_align(spark, sf_dir):
    """B5+B8+B9: schema-drift alignment — a drifted source half (missing
    c_mktsegment, uppercase names) aligned to destination order with
    null-fill, unioned with an up-to-date half."""
    c = load_table(spark, sf_dir, "customer")
    dest = ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]
    drifted = (
        c.filter(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", "c_name", "c_acctbal")
        .toDF("C_CUSTKEY", "C_NAME", "C_ACCTBAL")
    )
    current = c.filter(F.col("c_custkey") % 2 == 1).select(*dest)
    aligned = align_to_destination(drifted, dest).select(
        *[F.col(k).cast(t) for k, t in zip(dest, ["long", "string", "double", "string"])]
    )
    return aligned.unionByName(current)


def q_fetch_time_added(spark, sf_dir):
    """C5: fetch-time annotator (reference ``record_time_added``,
    salesforce_to_s3_operator.py:103-107). The annotator itself is
    nondeterministic (current_timestamp), so the gated projection carries
    the deterministic columns plus a ``fetch_time_set`` flag proving the
    annotation column was populated on every row — fully oracle-able while
    still executing TR.add_fetch_time in the plan."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return TR.add_fetch_time(c).select(
        "c_custkey",
        "c_name",
        F.col("time_fetched_from_salesforce").isNotNull().alias("fetch_time_set"),
    )


# ---------------------------------------------------------------------------
# F1/F2/F5: dedup + text analysis
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """F1: exact dedup — one deterministic survivor per (user_id, event_type)."""
    e = load_table(spark, sf_dir, "events")
    kept = D.dedup_exact(e, ["user_id", "event_type"], ["ts", "event_id"])
    return kept.select("event_id", "user_id", "event_type")


def q_dedup_fingerprint(spark, sf_dir):
    """F1 (content form): md5-fingerprint hash-groupBy dedup — survivor id +
    duplicate count per distinct normalized text."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return (
        d.select(X.fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


def q_winnow_fingerprint(spark, sf_dir):
    """F2/F5: winnowed rolling-hash fingerprints (SIGMOD'03 winnowing) with
    the engine-portable md5 hash so DuckDB can replay it exactly — (doc_id,
    fp) rows, k=3-token grams, window w=4."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.winnow_fingerprints(
        d, "doc_id", "text", k=3, w=4, hash_fn=D.portable_hash32
    )


def q_near_dedup(spark, sf_dir):
    """F2: full MinHash+LSH near-dup cluster assignment under the value
    gate — the engine-portable hash family (md5-derived, dedup.py
    ``near_dedup_clusters_portable``) with 2 bands of 4 hashes, so every
    stage (shingle → minhash → band bucket → bucket-min cluster) is
    reproduced value-for-value by the oracle. Distinct banding from
    q_minhash_clusters (4×2), which gates the same pipeline at a different
    similarity threshold. The xxhash64 fast path (near_dedup_clusters) is
    plan-identical and pinned against this one in tests."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.near_dedup_clusters_portable(
        d, "doc_id", "text", num_hashes=8, bands=2, shingle_n=3
    )


def q_incremental_dedup(spark, sf_dir):
    """F2 incremental form: MinHash/LSH near-dedup of a NEW batch against
    an existing corpus (dedup.near_dedup_apply) — the first 80% of
    documents stand in for the loaded corpus (their maintained state is
    just the (id, band, bucket) table), the rest arrive as a batch whose
    minhash pipeline runs over the batch alone, probing corpus bands via
    a touched-bucket semi-join. Under append-only ids the composition is
    row-identical to a from-scratch run over everything — the oracle IS
    q_near_dedup's full-corpus SQL (same 8-hash / 2-band portable
    family)."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    cut = F.col("doc_id") < 400
    corpus, batch = d.filter(cut), d.filter(~cut)
    base = D.near_dedup_clusters_portable(
        corpus, "doc_id", "text", num_hashes=8, bands=2, shingle_n=3
    )
    corpus_bands = D.portable_bands(
        D.minhash_signatures_portable(
            corpus, "doc_id", "text", num_hashes=8, shingle_n=3
        ),
        "doc_id",
        num_hashes=8,
        bands=2,
    )
    inc, _new_bands = D.near_dedup_apply(
        corpus_bands, batch, "doc_id", "text",
        num_hashes=8, bands=2, shingle_n=3,
    )
    return base.unionByName(inc)


def q_vocab(spark, sf_dir):
    """F5 north-star: tokenizer-vocabulary building — corpus-wide term
    frequency + document frequency, min-count floor, deterministic top-k
    by (tf desc, token). Partial aggregation keeps the token groupBy
    map-combined; the top-k is TakeOrderedAndProject (no full sort). At
    100 TB the token key space is Zipf-skewed but the heavy hitters are
    exactly the rows partial agg collapses map-side, so no salting is
    needed."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    ex = d.select(
        "doc_id",
        F.explode(F.transform(X.tokens(F.col("text")), F.lower)).alias("token"),
    ).filter(F.col("token") != "")
    return (
        ex.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("tf") >= 5)
        .orderBy(F.col("tf").desc(), "token")
        .limit(100)
    )


def q_tfidf(spark, sf_dir):
    """F5 north-star: per-document top-3 terms by tf-idf. The idf is kept
    rational — round((tf * n_docs)::double / doc_freq, 6) — so no
    transcendental (ln) whose last-ulp behavior differs across engines
    enters the hash gate; ranking is made total with the token as
    tie-break. doc_freq is a broadcastable token-level dim (vocab-sized,
    not corpus-sized) joined onto per-doc term counts."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    ex = d.select(
        "doc_id",
        F.explode(F.transform(X.tokens(F.col("text")), F.lower)).alias("token"),
    ).filter(F.col("token") != "")
    # one exchange on doc_id serves the (doc_id, token) term-count rollup
    # (subset rule) and the per-doc top-k window at the end of the plan
    tf = (
        ex.repartition("doc_id")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    # doc-freq from the already-grouped tf relation: tf is unique per
    # (doc, token), so count(*) == countDistinct(doc_id) over the raw
    # explode — but reading tf avoids tokenizing/exploding the corpus a
    # second time
    dfreq = tf.groupBy("token").agg(F.count("*").alias("doc_freq"))
    n_docs = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf") * F.col("n_docs")).cast("double") / F.col("doc_freq"),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("doc_id", "token", "tfidf")
    )


def q_minhash_clusters(spark, sf_dir):
    """F2: the full MinHash+LSH near-dedup pipeline (shingle → 8-family
    minhash → 4-band md5 buckets → bucket-min cluster assignment) over the
    portable hash family, so every intermediate value is engine-reproducible
    and the whole pipeline sits under the value-hash gate (q_near_dedup
    gates the same pipeline at 2×4 banding; the murmur/xxhash fast path is
    plan-identical and covered by unit tests). Plan shape: one
    explode+groupBy shuffle for signatures, one window+groupBy for
    assignment, left join back for singletons."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.near_dedup_clusters_portable(
        d, "doc_id", "text", num_hashes=8, bands=4, shingle_n=3
    )


def q_dedup_components(spark, sf_dir):
    """F2 (iterative): exact connected components over the portable-LSH
    candidate graph — the multi-hop closure of q_minhash_clusters (a ~ b,
    b ~ c ⇒ one component even when a, c share no bucket). Min-label
    propagation, one shuffle join per iteration, driver sees only the
    changed-count; oracle is a recursive-CTE transitive closure over the
    identical edge set."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    banded = D.portable_bands(
        D.minhash_signatures_portable(d, "doc_id", "text", 8, 3), "doc_id", 8, 4
    )
    a, b = banded.alias("a"), banded.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return D.connected_components(
        d.select("doc_id"), edges, id_col="doc_id"
    )


def q_global_line_dedup(spark, sf_dir):
    """F1/F5 (corpus-global): C4-style exact line-level dedup — wrap each
    document into deterministic 3-word lines (the fixture-scale analog of
    C4's three-sentence span), keep only the FIRST occurrence of each
    normalized line across the whole corpus (first = lowest
    (doc_id, line_no)), reassemble each document's surviving lines in
    order. ~19% of lines are corpus-duplicates at sf0.01, so the rebuilt
    text — hash-checked, not just the counts — genuinely exercises the
    keeper election. Two exchanges: window-min on the md5 line key (no
    secondary sort), then reassembly on doc_id. Oracle replays keeper
    election with a row_number window over the normalized line."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.global_line_dedup(
        d, "doc_id", "text", words_per_line=3, min_kept=1
    )


def q_quality_classifier(spark, sf_dir):
    """F5: hashed linear quality classifier — fasttext-shape model under
    the hashing trick (token → portable 32-bit hash → one of 256 buckets
    → integer weight in [-1000,1000] derived from md5 → exact BIGINT sum
    → single divide → threshold label). The per-document score is the
    cheap learned-quality gate a corpus pipeline runs before expensive
    stages; integer weights make the mean reproducible bit-for-bit in
    any engine with md5. All HOFs over the materialized token array —
    per-row in codegen, no explode, no shuffle. Oracle replays the
    double-md5 chain (token hash → bucket → bucket-seeded weight)."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    s = X.hashed_linear_score(F.col("text"), n_features=256, seed="w")
    return d.select(
        "doc_id",
        s["n_tokens"].alias("n_tokens"),
        s["score_raw"].alias("score_raw"),
        s["score"].alias("score"),
        s["label"].alias("label"),
    )


def q_embed_centroids(spark, sf_dir):
    """F3 (clustering primitive): per-label embedding centroid in
    exploded (label, dim, centroid, n) long form — the mean step under
    k-means / per-class embeddings / drift monitoring. Components are
    quantized to scaled longs BEFORE aggregation so the per-(label,dim)
    sum is exact in any engine (float accumulation order never enters the
    hash gate); one map-side-combined exchange bounded by labels × dims.
    Oracle replays the same quantize-then-sum over unnested components."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return V.centroids_long(e, "label", "embedding")


def q_kmeans_assign(spark, sf_dir):
    """F3 (clustering, assignment step): each embedding goes to its
    nearest of 8 deterministic seed centroids (the vec_id < 8 vectors).
    Distances are exact integers — per-dim diffs widened to double,
    quantized to scaled longs, squared and integer-summed — so the
    argmin is engine-exact with no float accumulation order or sqrt.
    Seeds broadcast; the k-way scores reduce per-vector via a
    partial-combined min(struct) aggregate (exchange carries one row per
    vector, not k). Oracle replays quantize → integer sum → window-min."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("centroid")
    )
    return V.kmeans_assign(e, seeds)


def q_kmeans_step(spark, sf_dir):
    """F3 (clustering, full Lloyd iteration): the q_kmeans_assign
    assignment joined back to the vectors, then per-cluster quantized
    centroid means in exploded (cluster, dim, centroid, n) long form —
    assign + update composed end-to-end, both stages integer-exact, so
    the whole iteration is reproducible across engines (the property an
    iterative algorithm needs for checkpointed resume at scale). One
    broadcast assign, one join on vec_id, one map-side-combined centroid
    exchange bounded by k × dims."""
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("centroid")
    )
    assigned = V.kmeans_assign(e, seeds).select("vec_id", "cluster")
    return V.centroids_long(
        e.join(assigned, "vec_id"), "cluster", "embedding"
    ).withColumn("cluster", F.col("cluster").cast("long"))


def q_bigram_fluency(spark, sf_dir):
    """F5 (corpus-level LM filter, CCNet shape): fit a bigram
    conditional-probability model on the corpus itself, score every
    document by the MEAN conditional probability of its bigrams, label
    fluent/disfluent at the corpus median (~0.0345 at sf0.01). The mean
    stays rational — each bigram's probability is the scaled-integer
    (c_bigram * 1e6) div c_prefix, summed as exact BIGINTs with one final
    divide + round(6) — so no transcendental enters the hash gate (same
    discipline as q_tfidf). Model is a vocab²-bounded aggregate,
    un-hinted (AQE broadcasts it when small); prefix counts derive from
    the bigram table, not a second corpus pass."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return X.bigram_fluency(d, "doc_id", "text")


def q_dedup_components_star(spark, sf_dir):
    """F2 (iterative, scale variant): the same component closure as
    q_dedup_components but via the large-star/small-star alternation
    (Kiveris et al.) — O(log² n) rounds independent of graph diameter,
    for corpora whose near-dup clusters chain instead of forming
    near-cliques. Same edge set, same oracle, identical labeling."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    banded = D.portable_bands(
        D.minhash_signatures_portable(d, "doc_id", "text", 8, 3), "doc_id", 8, 4
    )
    a, b = banded.alias("a"), banded.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return D.connected_components(
        d.select("doc_id"), edges, id_col="doc_id", method="star"
    )


def q_text_tokens(spark, sf_dir):
    """F5: token counting — whitespace, distinct, BPE-ish regex. Tokens are
    materialized once per document, then each metric reads the array (the
    HOF-lambda no-CSE pitfall, SCALE.md)."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    toked = d.select(
        "doc_id",
        F.col("text"),
        X.tokens(F.col("text")).alias("__toks"),
    )
    return toked.select(
        "doc_id",
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.transform(F.col("__toks"), F.lower)))
        .cast("long")
        .alias("n_distinct"),
        X.bpe_token_count(F.col("text")).alias("n_bpe"),
        F.length("text").cast("long").alias("n_chars"),
    )


def q_lang_id(spark, sf_dir):
    """F5: n-gram/stopword-marker language ID heuristic."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", "lang", X.lang_id(F.col("text")).alias("lang_pred"))


def q_quality_score(spark, sf_dir):
    """F5: length/punct/stopword quality signals (counts — exact integers)."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tokens"),
        X.punct_count(F.col("text")).cast("long").alias("n_punct"),
        X.stopword_count(F.col("text")).cast("long").alias("n_stopwords"),
    )


def q_pii_redact(spark, sf_dir):
    """F5 north-star: PII scrubbing (functions/text.pii_redact) — the
    standard pre-training privacy pass. The fixture text is deliberately
    PII-free, so the query seeds each document with deterministic fake
    PII derived from its id (an email, a phone, an IPv4), then redacts;
    the oracle rebuilds the identical seeded input and applies the same
    RE2-subset regex chain in the same order, so the redacted text must
    hash-match byte for byte. Counts are taken pre-redaction (audit
    signal). Single codegen'd projection over the scan — no shuffle."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel +1-555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" host 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7 end"),
        ).alias("__seeded"),
    )
    counts = X.pii_counts(F.col("__seeded"))
    return seeded.select(
        "doc_id",
        *[c.alias(k) for k, c in counts.items()],
        X.pii_redact(F.col("__seeded")).alias("redacted"),
    )


def q_repetition(spark, sf_dir):
    """F5 north-star: within-document repetition signals (Gopher-style
    quality rules): duplicate 2-/3-gram fractions via higher-order
    functions over one materialized token array (no shuffle), plus the
    top-token fraction via the explode→two-level-aggregate shape (shuffle
    on (doc, token) then doc — both with map-side partial aggregation;
    the HOF form of top-token would be O(tokens²) per row, the exploded
    form is linear and scales out)."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    toked = d.select(
        "doc_id",
        F.transform(X.tokens(F.col("text")), F.lower).alias("__toks"),
    )
    s2 = X.ngram_repetition_stats(F.col("__toks"), 2)
    s3 = X.ngram_repetition_stats(F.col("__toks"), 3)
    hof = toked.select(
        "doc_id",
        F.size(F.col("__toks")).cast("long").alias("n_tokens"),
        s2["dup_2gram_frac"].alias("dup_2gram_frac"),
        s3["dup_3gram_frac"].alias("dup_3gram_frac"),
    )
    per_tok = (
        toked.select("doc_id", F.explode(F.col("__toks")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    top = per_tok.groupBy("doc_id").agg(
        F.round(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("top_token_frac")
    )
    return hof.join(top, "doc_id")


def q_contamination(spark, sf_dir):
    """F5/F2 north-star: benchmark-contamination detection — training
    documents sharing ≥ 3 distinct 5-gram shingles with the eval set
    (source 'src0' plays the held-out benchmark). The eval side of the
    join is the DISTINCT shingle set of a benchmark — thousands of docs
    even at production scale — so it is broadcast: the training corpus
    is scanned once, shingled in-codegen (one projection materializes
    tokens, the next shingles — no HOF re-evaluation), and probed against
    the broadcast hash relation with zero shuffle of the corpus side;
    the only exchange is the per-doc count aggregation on doc_id."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    toked = d.select(
        "doc_id",
        "source",
        F.transform(X.tokens(F.col("text")), F.lower).alias("__toks"),
    )
    sh = toked.select(
        "doc_id",
        "source",
        F.explode(D.shingles_from_tokens(F.col("__toks"), 5)).alias("shingle"),
    )
    eval_sh = (
        sh.filter(F.col("source") == "src0").select("shingle").distinct()
    )
    return (
        sh.filter(F.col("source") != "src0")
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


def q_sample_split(spark, sf_dir):
    """North-star: reproducible train/val/test split by md5 hash bucket —
    assignment is a pure function of the document id (stable under
    re-partitioning, appends, and engine changes; oracle proves it)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.split_assign(F.col("doc_id")).alias("split"),
        X.hash_bucket(F.col("doc_id"), 100).cast("long").alias("bucket"),
    )


def q_simhash(spark, sf_dir):
    """F2/F5: SimHash fingerprint in its engine-portable form — 32-bit,
    md5-derived token hashes (functions/dedup.portable_hash32) so the
    oracle reproduces every bit vote; the default xxhash64/64-bit variant
    is the production fast path (JVM-only hash family, tested in
    tests/test_dedup.py)."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.simhash_table(
        d,
        "doc_id",
        "text",
        bits=32,
        hash_fn=lambda t: D.portable_hash32(F.lower(t)),
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-shape semantic dedup (functions/dedup.py semantic_dedup,
    Abbas et al. 2023): k-means blocking on a corpus-size-scaled
    deterministic codebook (_scaled_semantic_seeds: k = max(8,
    floor(sqrt(n/2))) — fixed k was the 10x probe's one quadratic, see
    the helper) → within-cluster rounded-cosine pairs (cluster equijoin,
    never a cartesian) → connected components → one keeper per near-dup
    group. Complements q_embed_dedup's sign-LSH blocking with the
    density-adaptive blocking production pipelines use; threshold 0.3 is
    the fixture's operating point (the synthetic 64-dim embeddings are
    near-orthogonal). Oracle replays every stage: the scaled-seed
    kmeans-assign CTEs, list_cosine_similarity pairs, and a
    recursive-CTE transitive closure."""
    from salesforce_plugin_spark.functions.dedup import semantic_dedup

    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    return semantic_dedup(
        e, "vec_id", "embedding", _scaled_semantic_seeds(e),
        threshold=0.3, quant=1000,
    )


def q_curation_capstone(spark, sf_dir):
    """Cross-modal corpus-curation capstone: the documents table and its
    aligned embeddings (doc_id = vec_id, 1:1) are curated in ONE lazy
    plan composing four first-class stages — Gopher-rule quality gate
    (integer bitmask), DSIR-shape importance vs the English target domain
    (importance ≥ 0.45 decided in integers: 20·score ≥ 9·10⁶·n_bigrams,
    never a float compare), SemDeDup k-means-blocked embedding dedup
    (keepers only), and the reproducible md5 split. The selection a
    training-data pipeline actually ships: text-quality × domain-fit ×
    semantic-uniqueness, each stage independently oracle-gated elsewhere
    and the composition oracle-gated here (the SQL replays all four
    stages in one WITH RECURSIVE)."""
    from salesforce_plugin_spark.functions.dedup import semantic_dedup
    from salesforce_plugin_spark.functions.text import (
        gopher_quality,
        hashed_ngram_importance,
        split_assign,
        tokens,
    )

    # embeddings are parallelized (the kmeans-assign/pair stages below are
    # CPU-bound and the fixture scan is one row group); documents are NOT —
    # an A/B at sf0.1 measured the d-side repartition SLOWER (8.25 vs
    # 6.95 s): it re-shuffles the full text payload once per consuming
    # branch (gq/imp/base join), tripling the bytes moved for pipelines
    # whose per-row HOF work already spreads over the scan tasks.
    d = load_table(spark, sf_dir, "documents")
    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    # r12 (VERDICT r11 #3): the gopher and importance branches used to
    # re-scan and re-tokenize the same corpus (13.1 + 11.1 s executor
    # time at sf0.1), then hash-join their outputs. Fused LINEARLY:
    # gopher_quality keeps text+tokens flowing (keep_cols) and
    # hashed_ngram_importance rides the gate's n_tokens/passes through
    # its exploded bigram table (carry_cols), so ONE scan+split feeds
    # every text stage and the gq⋈imp exchange disappears. A
    # checkpointed shared-tokens variant was measured SLOWER (7.73 →
    # 12.96 s lazy / 7.98 s eager at sf0.1): materializing text + token
    # arrays costs more than the one split it saves — the narrow
    # exploded-grams cut inside the importance operator remains the
    # only materialization. Declared outputs unchanged: rows with
    # NULL carries (< 2 tokens, never scored) fail the importance
    # filter exactly as they failed the old inner joins.
    dt = d.select(
        "doc_id", "lang", "source", "text",
        tokens(F.col("text")).alias("__sht"),
    )
    dg = gopher_quality(
        dt, "doc_id", "text", min_tokens=10, toks_col="__sht",
        keep_cols=("lang", "__sht"),
    )
    imp = hashed_ngram_importance(
        dg, "doc_id", "text", F.col("lang") == "en", n_buckets=4096,
        toks_col="__sht", carry_cols=("n_tokens", "passes"),
    ).select(
        "doc_id", "n_bigrams", "score_scaled", "importance",
        "n_tokens", "passes",
    )
    sd = semantic_dedup(
        e, "vec_id", "embedding", _scaled_semantic_seeds(e),
        threshold=0.3, quant=1000,
    ).select(F.col("vec_id").alias("doc_id"), "dup_group", "keep")
    return (
        d.select("doc_id", "lang", "source")
        .join(imp, "doc_id")
        .join(sd, "doc_id")
        .filter(
            F.col("passes")
            & F.col("keep")
            & (
                F.lit(20) * F.col("score_scaled")
                >= F.lit(9_000_000) * F.col("n_bigrams")
            )
        )
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "importance",
            "dup_group",
            split_assign(F.col("doc_id"), 80, 10).alias("split"),
        )
    )


def q_span_dedup(spark, sf_dir):
    """F1/F5: corpus-global exact repeated-span removal — the
    distributable form of Lee et al. 2022's suffix-array exact-substring
    dedup (functions/dedup.py span_dedup): every 8-token span occurring
    more than once corpus-wide is removed at all but its first
    occurrence, tokens survive iff uncovered. One exchange on the span
    md5 (count + first-election as window aggregates), one fold of
    flagged starts per doc, HOF coverage rebuild — no token-level
    shuffle. ~9% of the fixture's 8-gram occurrences are corpus dups
    (planted near-dup docs), so the hash-checked rebuilt text genuinely
    exercises the removal path."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.span_dedup(d, "doc_id", "text", span_tokens=8)


def q_repeated_spans(spark, sf_dir):
    """F1/F5 (round 8): variable-length MAXIMAL repeated-span inventory —
    the suffix-automaton-grade generalization of q_span_dedup's fixed
    8-token granularity (functions/dedup.py repeated_spans). Consecutive
    corpus-duplicated anchor shingles merge (gaps-and-islands on the
    anchor start positions) into one maximal region whose true token
    length is variable; one row per occurrence of each maximal region
    with its content md5. One anchor-key exchange + one doc-id exchange
    over flagged anchors only — no suffix structure, no token-level
    shuffle."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.repeated_spans(d, "doc_id", "text", min_tokens=8)


def q_lcs_dedup(spark, sf_dir):
    """EXACT longest-common-substring pairs (functions/dedup.py
    lcs_pairs) — the round-6 generalization of q_span_dedup's fixed
    granularity to suffix-array-grade maximal matches: a shared
    substring of length S >= 20 is S−19 consecutive matching char
    20-grams on one alignment diagonal, so one blocked gram equijoin +
    the pos−row_number islands trick measure lcs_len EXACTLY per
    surviving pair. Grams blocked to df ∈ [2, 20] (the
    containment_pairs rare-shingle discipline — boilerplate grams'
    quadratic buckets are the documented recall trade). The oracle
    replays gram explode, df block, diagonal islands verbatim."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.lcs_pairs(d, "doc_id", "text", gram_len=20, min_df=2, max_df=20)


def q_self_lcs(spark, sf_dir):
    """Longest INTERNAL repeated substring per document
    (functions/dedup.py self_repetition) — the exact memorization /
    degeneration signal (suffix-tree semantics, overlaps counted):
    q_lcs_dedup's diagonal-islands identity self-joined per document
    with the trivial diagonal excluded (pos_a > pos_b). Join key is
    (doc_id, gram) so matches never cross documents and corpus-level
    skew cannot occur; every doc surfaces a row ((0,0) when nothing of
    length >= 12 repeats — 287/500 fixture docs do repeat)."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.self_repetition(d, "doc_id", "text", gram_len=12)


def q_minhash_error(spark, sf_dir):
    """MinHash estimator accuracy eval (functions/dedup.py
    minhash_error_eval) — the q_ann_recall discipline applied to F2:
    for every pair with exact 3-gram Jaccard >= 0.2 (ppm), the
    portable-MinHash estimate (matching positions / num_hashes) and
    its EXACT signed error vs the true Jaccard, both integer ppm. This
    is how the num_hashes/bands budget is sized from measurement; the
    oracle replays shingles, the md5 hash family, and both ppm floors
    verbatim."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return D.minhash_error_eval(
        d, "doc_id", "text", num_hashes=8, shingle_n=3,
        min_true_ppm=200_000,
    )


def q_containment(spark, sf_dir):
    """Directional near-containment (functions/dedup.py
    containment_pairs): pairs where >= 60% of a's 3-gram shingles also
    appear in b — the doc-in-doc signal symmetric Jaccard misses (a
    short doc quoted in a long one has low Jaccard but high
    containment). Rare-shingle blocking (df in [2, 20]) bounds
    candidates at df^2 per shingle; verification counts the full
    intersection for candidates only; the threshold is an integer
    percent floor."""
    from salesforce_plugin_spark.functions.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        d, "doc_id", "text", shingle_n=3, max_df=20, threshold_pct=60
    )


def q_novelty(spark, sf_dir):
    """Per-document novelty scoring (functions/dedup.py
    novelty_scores): the ppm of each doc's distinct 3-gram shingles
    appearing in NO other document — the inverse of containment
    (boilerplate scores near 0, uncorroborated noise near 10^6). One
    shingle-df exchange + one per-doc aggregate; no pair generation."""
    from salesforce_plugin_spark.functions.dedup import novelty_scores

    d = load_table(spark, sf_dir, "documents")
    return novelty_scores(d, "doc_id", "text", shingle_n=3)


def q_embed_decontaminate(spark, sf_dir):
    """Semantic train/eval decontamination (functions/dedup.py
    embedding_decontaminate): the corpus (vec_id % 10 != 0) minus every
    vector sign-LSH-bucket-matched AND rounded-cosine >= 0.25 to any
    probe vector (vec_id % 10 == 0) — q_contamination's n-gram probe
    catches verbatim eval leaks, this catches paraphrased ones. Bucket
    equijoin (never cartesian) -> verify -> distinct ids -> left-anti;
    8 of 450 corpus vectors are removed at sf0.01, so the gate
    genuinely exercises the removal. Output is the surviving
    (vec_id, label) set."""
    from salesforce_plugin_spark.functions.dedup import embedding_decontaminate

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 10 != 0)
    probe = e.filter(F.col("vec_id") % 10 == 0)
    return embedding_decontaminate(
        corpus, probe, "vec_id", "embedding", threshold=0.25, bits=8
    ).select("vec_id", "label")


def q_dup_size_dist(spark, sf_dir):
    """Dedup profiling (functions/dedup.py dup_size_histogram):
    duplicate-cluster size histogram from the content fingerprint — the
    measurement BEFORE dedup strategy selection (singletons vs hot
    clusters decide whether min_by suffices or hot keys need care);
    n_docs − n_clusters per size is exactly what dedup would remove.
    Same exchange dedup_exact pays, then a size-bounded aggregate.
    The fixture documents are exactly unique at full length, so the
    gate fingerprints the 6-token normalized PREFIX — genuine
    cluster-size spread (boilerplate-opening detection, the practical
    prefix-dup audit) rather than a degenerate 1-row histogram."""
    from salesforce_plugin_spark.functions.dedup import dup_size_histogram

    d = load_table(spark, sf_dir, "documents").select(
        F.array_join(
            F.slice(F.split(F.trim("text"), r"\s+"), 1, 6), " "
        ).alias("text")
    )
    return dup_size_histogram(d, "text")



ORACLES: dict[str, str] = {}

ORACLES["q_coerce_epoch"] = """
        SELECT l_orderkey, l_linenumber,
               epoch_ms(l_shipdate) // 1000 AS epoch_s,
               strftime(l_shipdate, '%Y-%m-%d') AS decoded_date
        FROM lineitem
    """

ORACLES["q_newline_scrub"] = r"""
        SELECT doc_id, regexp_replace(text, '[\r\n]+', '', 'g') AS clean_text
        FROM documents
    """

ORACLES["q_varchar_truncate"] = """
        SELECT doc_id, substr(text, 1, 80) AS clipped,
               CAST(length(substr(text, 1, 80)) AS BIGINT) AS clipped_len
        FROM documents
    """

ORACLES["q_lowercase_schema_align"] = """
        SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
        FROM customer WHERE c_custkey % 2 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 2 = 1
    """

ORACLES["q_dedup_exact"] = """
        SELECT event_id, user_id, event_type FROM (
            SELECT event_id, user_id, event_type,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """

ORACLES["q_dedup_fingerprint"] = r"""
        SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
               min(doc_id) AS keep_id, count(*) AS n_dups
        FROM documents GROUP BY 1
    """

ORACLES["q_text_tokens"] = rf"""
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(list_transform(
                    regexp_split_to_array(trim(text), '\s+'), x -> lower(x)))) AS BIGINT) AS n_distinct,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    """

ORACLES["q_lang_id"] = r"""
        WITH s AS (
            SELECT doc_id, lang,
                   len(regexp_extract_all(lower(text), '\b(?:the|and|of|to|in)\b')) AS en,
                   len(regexp_extract_all(lower(text), '\b(?:el|los|las|que|una)\b')) AS es,
                   len(regexp_extract_all(lower(text), '\b(?:les|des|une|est|dans)\b')) AS fr,
                   len(regexp_extract_all(lower(text), '\b(?:der|die|und|das|ist)\b')) AS de
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN en > 0 AND en >= es AND en >= fr AND en >= de THEN 'en'
                    WHEN es > 0 AND es >= fr AND es >= de THEN 'es'
                    WHEN fr > 0 AND fr >= de THEN 'fr'
                    WHEN de > 0 THEN 'de'
                    ELSE 'und' END AS lang_pred
        FROM s
    """

ORACLES["q_quality_score"] = rf"""
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct,
               CAST(len(regexp_extract_all(lower(text), '{_STOP_RE}')) AS BIGINT) AS n_stopwords
        FROM documents
    """

ORACLES["q_pii_redact"] = r"""
        WITH seeded AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com tel +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.7 end' AS s
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(s,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(s,
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
                   AS n_ip,
               CAST(len(regexp_extract_all(s,
                   '\+?\d{1,3}[-.\s]?\d{3}[-.\s]?\d{3,4}\b')) AS BIGINT)
                   AS n_phone,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(s,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                   '\+?\d{1,3}[-.\s]?\d{3}[-.\s]?\d{3,4}\b', '<PHONE>', 'g')
                   AS redacted
        FROM seeded
    """

ORACLES["q_repetition"] = r"""
        WITH toked AS (
            SELECT doc_id,
                   list_transform(regexp_split_to_array(trim(text), '\s+'),
                                  x -> lower(x)) AS t
            FROM documents
        ), g2 AS (
            SELECT doc_id, array_to_string(list_slice(t, s, s + 1), ' ') AS g
            FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS s
                  FROM toked WHERE len(t) >= 2)
        ), g3 AS (
            SELECT doc_id, array_to_string(list_slice(t, s, s + 2), ' ') AS g
            FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS s
                  FROM toked WHERE len(t) >= 3)
        ), d2 AS (
            SELECT doc_id, count(*) AS total, count(DISTINCT g) AS dist
            FROM g2 GROUP BY doc_id
        ), d3 AS (
            SELECT doc_id, count(*) AS total, count(DISTINCT g) AS dist
            FROM g3 GROUP BY doc_id
        ), pt AS (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(t) AS tok FROM toked)
            GROUP BY doc_id, tok
        ), top AS (
            SELECT doc_id,
                   round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_token_frac
            FROM pt GROUP BY doc_id
        )
        SELECT b.doc_id,
               CAST(len(b.t) AS BIGINT) AS n_tokens,
               CASE WHEN d2.total IS NULL THEN 0.0
                    ELSE round(1.0 - CAST(d2.dist AS DOUBLE) / d2.total, 6)
               END AS dup_2gram_frac,
               CASE WHEN d3.total IS NULL THEN 0.0
                    ELSE round(1.0 - CAST(d3.dist AS DOUBLE) / d3.total, 6)
               END AS dup_3gram_frac,
               top.top_token_frac
        FROM toked b
        LEFT JOIN d2 ON d2.doc_id = b.doc_id
        LEFT JOIN d3 ON d3.doc_id = b.doc_id
        JOIN top ON top.doc_id = b.doc_id
    """

ORACLES["q_sample_split"] = """
        WITH b AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               bucket
        FROM b
    """

ORACLES["q_vocab"] = r"""
        WITH ex AS (
            SELECT doc_id,
                   lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS token
            FROM documents
        )
        SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS doc_freq
        FROM ex WHERE token <> ''
        GROUP BY token HAVING count(*) >= 5
        ORDER BY tf DESC, token LIMIT 100
    """

ORACLES["q_tfidf"] = r"""
        WITH ex AS (
            SELECT doc_id,
                   lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS token
            FROM documents
        ), tf AS (
            SELECT doc_id, token, count(*) AS tf
            FROM ex WHERE token <> '' GROUP BY doc_id, token
        ), dfreq AS (
            SELECT token, count(DISTINCT doc_id) AS doc_freq
            FROM ex WHERE token <> '' GROUP BY token
        ), n AS (
            SELECT count(*) AS n_docs FROM documents
        ), scored AS (
            SELECT doc_id, tf.token AS token,
                   round(CAST(tf * n_docs AS DOUBLE) / doc_freq, 6) AS tfidf
            FROM tf JOIN dfreq ON tf.token = dfreq.token, n
        )
        SELECT doc_id, token, tfidf FROM (
            SELECT doc_id, token, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, token) AS rn
            FROM scored
        ) WHERE rn <= 3
    """

ORACLES["q_minhash_clusters"] = r"""
        WITH toked AS (
            SELECT doc_id,
                   list_transform(regexp_split_to_array(trim(text), '\s+'),
                                  x -> lower(x)) AS t
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(t, s, s + 2), ' ') AS shingle
            FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 2)) AS s
                FROM toked WHERE len(t) >= 3
            )
        ), mh AS (
            SELECT doc_id,
                   min(CAST(('0x' || substr(md5('0:' || shingle), 1, 8)) AS BIGINT)) AS mh_0,
                   min(CAST(('0x' || substr(md5('1:' || shingle), 1, 8)) AS BIGINT)) AS mh_1,
                   min(CAST(('0x' || substr(md5('2:' || shingle), 1, 8)) AS BIGINT)) AS mh_2,
                   min(CAST(('0x' || substr(md5('3:' || shingle), 1, 8)) AS BIGINT)) AS mh_3,
                   min(CAST(('0x' || substr(md5('4:' || shingle), 1, 8)) AS BIGINT)) AS mh_4,
                   min(CAST(('0x' || substr(md5('5:' || shingle), 1, 8)) AS BIGINT)) AS mh_5,
                   min(CAST(('0x' || substr(md5('6:' || shingle), 1, 8)) AS BIGINT)) AS mh_6,
                   min(CAST(('0x' || substr(md5('7:' || shingle), 1, 8)) AS BIGINT)) AS mh_7
            FROM sh GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, 0 AS band,
                   md5(CAST(mh_0 AS VARCHAR) || '|' || CAST(mh_1 AS VARCHAR)) AS bucket FROM mh
            UNION ALL
            SELECT doc_id, 1,
                   md5(CAST(mh_2 AS VARCHAR) || '|' || CAST(mh_3 AS VARCHAR)) FROM mh
            UNION ALL
            SELECT doc_id, 2,
                   md5(CAST(mh_4 AS VARCHAR) || '|' || CAST(mh_5 AS VARCHAR)) FROM mh
            UNION ALL
            SELECT doc_id, 3,
                   md5(CAST(mh_6 AS VARCHAR) || '|' || CAST(mh_7 AS VARCHAR)) FROM mh
        ), bmin AS (
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY band, bucket) AS bucket_min
            FROM banded
        ), assigned AS (
            SELECT doc_id, min(bucket_min) AS cluster_id
            FROM bmin GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN assigned a ON d.doc_id = a.doc_id
    """

ORACLES["q_dedup_components"] = r"""
        WITH RECURSIVE toked AS (
            SELECT doc_id,
                   list_transform(regexp_split_to_array(trim(text), '\s+'),
                                  x -> lower(x)) AS t
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(t, s, s + 2), ' ') AS shingle
            FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 2)) AS s
                FROM toked WHERE len(t) >= 3
            )
        ), mh AS (
            SELECT doc_id,
                   min(CAST(('0x' || substr(md5('0:' || shingle), 1, 8)) AS BIGINT)) AS mh_0,
                   min(CAST(('0x' || substr(md5('1:' || shingle), 1, 8)) AS BIGINT)) AS mh_1,
                   min(CAST(('0x' || substr(md5('2:' || shingle), 1, 8)) AS BIGINT)) AS mh_2,
                   min(CAST(('0x' || substr(md5('3:' || shingle), 1, 8)) AS BIGINT)) AS mh_3,
                   min(CAST(('0x' || substr(md5('4:' || shingle), 1, 8)) AS BIGINT)) AS mh_4,
                   min(CAST(('0x' || substr(md5('5:' || shingle), 1, 8)) AS BIGINT)) AS mh_5,
                   min(CAST(('0x' || substr(md5('6:' || shingle), 1, 8)) AS BIGINT)) AS mh_6,
                   min(CAST(('0x' || substr(md5('7:' || shingle), 1, 8)) AS BIGINT)) AS mh_7
            FROM sh GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, 0 AS band,
                   md5(CAST(mh_0 AS VARCHAR) || '|' || CAST(mh_1 AS VARCHAR)) AS bucket FROM mh
            UNION ALL
            SELECT doc_id, 1,
                   md5(CAST(mh_2 AS VARCHAR) || '|' || CAST(mh_3 AS VARCHAR)) FROM mh
            UNION ALL
            SELECT doc_id, 2,
                   md5(CAST(mh_4 AS VARCHAR) || '|' || CAST(mh_5 AS VARCHAR)) FROM mh
            UNION ALL
            SELECT doc_id, 3,
                   md5(CAST(mh_6 AS VARCHAR) || '|' || CAST(mh_7 AS VARCHAR)) FROM mh
        ), edges AS (
            SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.doc_id <> b.doc_id
        ), reach AS (
            SELECT doc_id AS id, doc_id AS r FROM documents
            UNION
            SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
        )
        SELECT id AS doc_id, min(r) AS component_id FROM reach GROUP BY id
    """

ORACLES["q_contamination"] = r"""
        WITH toked AS (
            SELECT doc_id, source,
                   list_transform(regexp_split_to_array(trim(text), '\s+'),
                                  x -> lower(x)) AS t
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, source,
                   array_to_string(list_slice(t, s, s + 4), ' ') AS shingle
            FROM (
                SELECT doc_id, source, t,
                       unnest(generate_series(1, len(t) - 4)) AS s
                FROM toked WHERE len(t) >= 5
            )
        ), eval_sh AS (
            SELECT DISTINCT shingle FROM sh WHERE source = 'src0'
        )
        SELECT s.doc_id, count(*) AS n_shared
        FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
        WHERE s.source <> 'src0'
        GROUP BY s.doc_id
        HAVING count(*) >= 3
    """

ORACLES["q_winnow_fingerprint"] = r"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
            FROM documents
        ), kg AS (
            SELECT doc_id, g.i AS i,
                   CAST(('0x' || substr(md5(array_to_string(t[g.i:g.i+2], ' ')), 1, 8)) AS BIGINT) AS h
            FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
            WHERE len(t) >= 3
        ), win AS (
            SELECT doc_id, i,
                   min(h) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
                   count(*) OVER (PARTITION BY doc_id) AS nh
            FROM kg
        )
        SELECT DISTINCT doc_id, fp FROM win WHERE nh >= 4 AND i <= nh - 3
        UNION
        SELECT doc_id, min(h) AS fp FROM kg GROUP BY doc_id HAVING count(*) < 4
    """

ORACLES["q_fetch_time_added"] = """
        SELECT c_custkey, c_name, TRUE AS fetch_time_set FROM customer
    """

ORACLES["q_near_dedup"] = r"""
        WITH toked AS (
            SELECT doc_id,
                   list_transform(regexp_split_to_array(trim(text), '\s+'),
                                  x -> lower(x)) AS t
            FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(t, s, s + 2), ' ') AS shingle
            FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, len(t) - 2)) AS s
                FROM toked WHERE len(t) >= 3
            )
        ), mh AS (
            SELECT doc_id,
                   min(CAST(('0x' || substr(md5('0:' || shingle), 1, 8)) AS BIGINT)) AS mh_0,
                   min(CAST(('0x' || substr(md5('1:' || shingle), 1, 8)) AS BIGINT)) AS mh_1,
                   min(CAST(('0x' || substr(md5('2:' || shingle), 1, 8)) AS BIGINT)) AS mh_2,
                   min(CAST(('0x' || substr(md5('3:' || shingle), 1, 8)) AS BIGINT)) AS mh_3,
                   min(CAST(('0x' || substr(md5('4:' || shingle), 1, 8)) AS BIGINT)) AS mh_4,
                   min(CAST(('0x' || substr(md5('5:' || shingle), 1, 8)) AS BIGINT)) AS mh_5,
                   min(CAST(('0x' || substr(md5('6:' || shingle), 1, 8)) AS BIGINT)) AS mh_6,
                   min(CAST(('0x' || substr(md5('7:' || shingle), 1, 8)) AS BIGINT)) AS mh_7
            FROM sh GROUP BY doc_id
        ), banded AS (
            SELECT doc_id, 0 AS band,
                   md5(CAST(mh_0 AS VARCHAR) || '|' || CAST(mh_1 AS VARCHAR)
                       || '|' || CAST(mh_2 AS VARCHAR) || '|' || CAST(mh_3 AS VARCHAR)) AS bucket
            FROM mh
            UNION ALL
            SELECT doc_id, 1,
                   md5(CAST(mh_4 AS VARCHAR) || '|' || CAST(mh_5 AS VARCHAR)
                       || '|' || CAST(mh_6 AS VARCHAR) || '|' || CAST(mh_7 AS VARCHAR))
            FROM mh
        ), bmin AS (
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY band, bucket) AS bucket_min
            FROM banded
        ), assigned AS (
            SELECT doc_id, min(bucket_min) AS cluster_id
            FROM bmin GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN assigned a ON d.doc_id = a.doc_id
    """

ORACLES["q_simhash"] = _simhash_oracle()

ORACLES["q_global_line_dedup"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ), lines AS (
        SELECT doc_id, c,
               array_to_string(list_slice(w, c*3 + 1, c*3 + 3), ' ') AS line
        FROM (
            SELECT doc_id, w,
                   unnest(generate_series(
                       0, CAST(ceil(len(w) / 3.0) AS INT) - 1)) AS c
            FROM toks WHERE len(array_to_string(w, '')) > 0
        )
    ), marked AS (
        SELECT doc_id, c, line,
               row_number() OVER (
                   PARTITION BY lower(trim(line)) ORDER BY doc_id, c
               ) = 1 AS kept
        FROM lines
    ), agg AS (
        SELECT doc_id,
               count(*) AS n_lines,
               count(*) FILTER (kept) AS n_kept,
               coalesce(string_agg(line, chr(10) ORDER BY c)
                            FILTER (kept), '') AS cleaned
        FROM marked GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_kept AS BIGINT) AS n_kept, cleaned
    FROM agg WHERE n_kept >= 1
"""

ORACLES["q_quality_classifier"] = r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        FROM documents
        WHERE len(trim(text)) > 0
    ), weighted AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('w:' || CAST(
                   CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 256
               AS VARCHAR)), 1, 8)) AS BIGINT) % 2001 - 1000 AS w
        FROM tok
    ), scored AS (
        SELECT doc_id,
               count(*) AS n_tokens,
               sum(w) AS score_raw
        FROM weighted GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(s.score_raw AS BIGINT) AS score_raw,
           round(s.score_raw / (1000.0 * s.n_tokens), 6) AS score,
           CASE WHEN s.score_raw / (1000.0 * s.n_tokens) > 0.0
                THEN 'keep' ELSE 'drop' END AS label
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
"""

ORACLES["q_kmeans_assign"] = _KMEANS_ASSIGN_CTES + """
    SELECT vec_id, cluster, CAST(dist2 AS BIGINT) AS dist2
    FROM ranked WHERE rn = 1
"""

ORACLES["q_kmeans_step"] = _KMEANS_ASSIGN_CTES + """
    , assign AS (SELECT vec_id, cluster FROM ranked WHERE rn = 1)
    , ex AS (
        SELECT a.cluster, g.i - 1 AS dim,
               CAST(round(CAST(e.embedding[g.i] AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS q
        FROM embeddings e JOIN assign a USING (vec_id)
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(1, len(e.embedding))) AS i
        ) g
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(dim AS INTEGER) AS dim,
           round(sum(q) / (1000000.0 * count(*)), 6) AS centroid,
           CAST(count(*) AS BIGINT) AS n
    FROM ex GROUP BY cluster, dim
"""

ORACLES["q_embed_centroids"] = """
    SELECT label,
           CAST(i - 1 AS INTEGER) AS dim,
           round(sum(CAST(round(CAST(e[i] AS DOUBLE) * 1000000.0)
                          AS BIGINT)) / (1000000.0 * count(*)), 6)
               AS centroid,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT label, embedding AS e,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings
    )
    GROUP BY label, i
"""

ORACLES["q_bigram_fluency"] = r"""
    WITH toks AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              t -> lower(t)) AS w
        FROM documents
    ), grams AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM (
            SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM toks WHERE len(w) >= 2
        )
    ), cbg AS (
        SELECT w1, w2, count(*) AS c_bg FROM grams GROUP BY w1, w2
    ), cpre AS (
        SELECT w1, sum(c_bg) AS c_w1 FROM cbg GROUP BY w1
    ), model AS (
        SELECT w1, w2, (c_bg * 1000000) // c_w1 AS term
        FROM cbg JOIN cpre USING (w1)
    ), scored AS (
        SELECT g.doc_id, sum(m.term) AS s, count(*) AS n
        FROM grams g JOIN model m USING (w1, w2)
        GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(sc.n, 0) AS BIGINT) AS n_bigrams,
           round(sc.s / (1000000.0 * sc.n), 6) AS fluency,
           CASE WHEN sc.s / (1000000.0 * sc.n) > 0.0345
                THEN 'fluent' ELSE 'disfluent' END AS label
    FROM documents d LEFT JOIN scored sc ON d.doc_id = sc.doc_id
"""

ORACLES["q_span_dedup"] = r"""
    WITH toked AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ), occ AS (
        SELECT doc_id, s AS spos,
               md5(array_to_string(list_slice(t, s, s + 7), ' ')) AS key
        FROM (
            SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS s
            FROM toked WHERE len(t) >= 8
        )
    ), marked AS (
        SELECT doc_id, spos,
               count(*) OVER (PARTITION BY key) AS cnt,
               row_number() OVER (PARTITION BY key ORDER BY doc_id, spos)
                   AS rn
        FROM occ
    ), covered AS (
        SELECT DISTINCT m.doc_id, m.spos + g.o AS j
        FROM marked m, unnest(generate_series(0, 7)) AS g(o)
        WHERE m.cnt > 1 AND m.rn > 1
    ), toks AS (
        SELECT doc_id, j, t[j] AS tok
        FROM (
            SELECT doc_id, t, unnest(generate_series(1, len(t))) AS j
            FROM toked
        )
    ), kept AS (
        SELECT k.doc_id, k.j, k.tok
        FROM toks k
        LEFT JOIN covered c ON k.doc_id = c.doc_id AND k.j = c.j
        WHERE c.j IS NULL
    )
    SELECT d.doc_id,
           CAST(len(d.t) AS BIGINT) AS n_tokens,
           CAST(len(d.t) - count(k.j) AS BIGINT) AS n_removed,
           coalesce(string_agg(k.tok, ' ' ORDER BY k.j), '') AS cleaned
    FROM toked d LEFT JOIN kept k USING (doc_id)
    GROUP BY d.doc_id, len(d.t)
"""

ORACLES["q_repeated_spans"] = r"""
    WITH toked AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ), occ AS (
        SELECT doc_id, s AS spos,
               md5(array_to_string(list_slice(t, s, s + 7), ' ')) AS key
        FROM (
            SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS s
            FROM toked WHERE len(t) >= 8
        )
    ), flagged AS (
        SELECT doc_id, spos FROM (
            SELECT doc_id, spos,
                   count(*) OVER (PARTITION BY key) AS cnt
            FROM occ
        ) WHERE cnt > 1
    ), runs AS (
        SELECT doc_id, min(spos) AS span_start,
               max(spos) - min(spos) + 8 AS span_tokens
        FROM (
            SELECT doc_id, spos,
                   spos - row_number()
                       OVER (PARTITION BY doc_id ORDER BY spos) AS grp
            FROM flagged
        )
        GROUP BY doc_id, grp
    )
    SELECT r.doc_id, r.span_start, r.span_tokens,
           md5(array_to_string(
               list_slice(d.t, r.span_start,
                          r.span_start + r.span_tokens - 1), ' '
           )) AS span_md5
    FROM runs r JOIN toked d USING (doc_id)
"""

ORACLES["q_semantic_dedup"] = _KMEANS_ASSIGN_SCALED_CTES.replace(
    "WITH seeds", "WITH RECURSIVE seeds", 1
) + """
    , assign AS (SELECT vec_id, cluster FROM ranked WHERE rn = 1)
    , vv AS (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.cluster
        FROM embeddings e JOIN assign a USING (vec_id)
    ), edges AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM vv a JOIN vv b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
    ), sym AS (
        SELECT src, dst FROM edges
        UNION
        SELECT dst, src FROM edges
    ), reach AS (
        SELECT vec_id AS id, vec_id AS r FROM embeddings
        UNION
        SELECT reach.id, e.dst FROM reach JOIN sym e ON reach.r = e.src
    ), grp AS (
        SELECT id AS vec_id, min(r) AS dup_group FROM reach GROUP BY id
    )
    SELECT c.vec_id, a.cluster, c.dup_group,
           c.dup_group = c.vec_id AS keep
    FROM grp c JOIN assign a USING (vec_id)
"""

# Curation capstone: all four stage oracles composed into one statement —
# kmeans assign + semantic-dedup closure (recursive), gopher bitmask,
# hashed-bigram importance, md5 split. CTE names are disjoint by
# construction (seeds/comp/dists/ranked | assign/vv/edges/sym/reach/grp |
# gm/gf | toked/grams/model/scored).
ORACLES["q_curation_capstone"] = _KMEANS_ASSIGN_SCALED_CTES.replace(
    "WITH seeds", "WITH RECURSIVE seeds", 1
) + r"""
    , assign AS (SELECT vec_id, cluster FROM ranked WHERE rn = 1)
    , vv AS (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, a.cluster
        FROM embeddings e JOIN assign a USING (vec_id)
    ), edges AS (
        SELECT a.vec_id AS src, b.vec_id AS dst
        FROM vv a JOIN vv b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
    ), sym AS (
        SELECT src, dst FROM edges
        UNION
        SELECT dst, src FROM edges
    ), reach AS (
        SELECT vec_id AS id, vec_id AS r FROM embeddings
        UNION
        SELECT reach.id, e.dst FROM reach JOIN sym e ON reach.r = e.src
    ), grp AS (
        SELECT id AS vec_id, min(r) AS dup_group FROM reach GROUP BY id
    ), gm AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                    AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform(
                    regexp_split_to_array(trim(text), '\s+'),
                    t -> strlen(t))) AS BIGINT) AS sum_len,
               CAST(len(regexp_extract_all(text, '[^\w\s]'))
                    AS BIGINT) AS n_punct,
               CAST(len(regexp_extract_all(lower(text),
                    '\b(?:the|a|an|and|or|of|to|in|is|it|that|this|for|on|with|as)\b'))
                    AS BIGINT) AS n_stop,
               CAST(len(list_filter(
                    regexp_split_to_array(trim(text), '\s+'),
                    t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha
        FROM documents
    ), gf AS (
        SELECT doc_id, n_tokens FROM gm
        WHERE NOT (n_tokens < 10 OR n_tokens > 100000
               OR sum_len < 3 * n_tokens OR sum_len > 10 * n_tokens
               OR 10 * n_punct >= n_tokens
               OR 25 * n_stop <= n_tokens
               OR 5 * n_alpha <= 4 * n_tokens)
    ), toked AS (
        SELECT doc_id, lang = 'en' AS is_target,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              t -> lower(t)) AS w
        FROM documents
    ), grams AS (
        SELECT doc_id, is_target,
               CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1]), 1, 8))
                    AS BIGINT) % 4096 AS bkt
        FROM (
            SELECT doc_id, is_target, w,
                   unnest(generate_series(1, len(w) - 1)) AS i
            FROM toked WHERE len(w) >= 2
        )
    ), model AS (
        SELECT bkt,
               (1000000 * (sum(CASE WHEN is_target THEN 1 ELSE 0 END) + 1))
                   // (count(*) + 1) AS term
        FROM grams GROUP BY bkt
    ), scored AS (
        SELECT g.doc_id, count(*) AS n_bigrams, sum(m.term) AS s
        FROM grams g JOIN model m USING (bkt)
        GROUP BY g.doc_id
    )
    SELECT d.doc_id, d.lang, d.source, gf.n_tokens,
           round(sc.s / (1000000.0 * sc.n_bigrams), 6) AS importance,
           g.dup_group,
           CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                          1, 8)) AS BIGINT) % 100 < 80
                THEN 'train'
                WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                          1, 8)) AS BIGINT) % 100 < 90
                THEN 'val' ELSE 'test' END AS split
    FROM documents d
    JOIN gf USING (doc_id)
    JOIN scored sc ON sc.doc_id = d.doc_id
                  AND 20 * sc.s >= 9000000 * sc.n_bigrams
    JOIN grp g ON g.vec_id = d.doc_id AND g.dup_group = d.doc_id
"""

ORACLES["q_containment"] = r"""
    WITH toked AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, s, s + 2), ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 2)) AS s
            FROM toked WHERE len(t) >= 3
        )
    ), sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), rare AS (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) BETWEEN 2 AND 20
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN rare r ON a.shingle = r.shingle
                  JOIN sh b ON b.shingle = a.shingle
        WHERE a.doc_id <> b.doc_id
    ), inter AS (
        SELECT c.id_a, c.id_b, count(*) AS n_int
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
        GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b, i.n_int, s.n_sh AS n_sh_a,
           100 * i.n_int // s.n_sh AS contain_pct
    FROM inter i JOIN sizes s ON s.doc_id = i.id_a
    WHERE 100 * i.n_int // s.n_sh >= 60
"""

ORACLES["q_novelty"] = r"""
    WITH toked AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, s, s + 2), ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 2)) AS s
            FROM toked WHERE len(t) >= 3
        )
    ), dfreq AS (
        SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS novelty_ppm
    FROM sh s JOIN dfreq d USING (shingle)
    GROUP BY s.doc_id
"""

ORACLES["q_embed_decontaminate"] = """
    WITH b AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) +
               (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END) +
               (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) +
               (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) +
               (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END) +
               (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END) +
               (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END) +
               (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bkt
        FROM embeddings
    ), c AS (
        SELECT * FROM b WHERE vec_id % 10 <> 0
    ), p AS (
        SELECT * FROM b WHERE vec_id % 10 = 0
    ), bad AS (
        SELECT DISTINCT c.vec_id
        FROM c JOIN p ON c.bkt = p.bkt
        WHERE round(list_cosine_similarity(c.v, p.v), 6) >= 0.25
    )
    SELECT vec_id, label FROM c
    WHERE vec_id NOT IN (SELECT vec_id FROM bad)
"""

ORACLES["q_dup_size_dist"] = r"""
    WITH pfx AS (
        SELECT array_to_string(list_slice(
            regexp_split_to_array(trim(text), '\s+'), 1, 6), ' ') AS text
        FROM documents
    ), sizes AS (
        SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
               CAST(count(*) AS BIGINT) AS cluster_size
        FROM pfx GROUP BY 1
    )
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs
    FROM sizes GROUP BY 1
"""


ORACLES["q_lcs_dedup"] = """
    WITH occ AS (
        SELECT doc_id AS id, CAST(g.i AS BIGINT) AS pos,
               substr(text, g.i + 1, 20) AS gram
        FROM documents d CROSS JOIN LATERAL (
            SELECT unnest(generate_series(0, strlen(d.text) - 20)) AS i
        ) g
        WHERE strlen(d.text) >= 20
    ), keep AS (
        SELECT gram FROM (
            SELECT gram, count(DISTINCT id) AS ndocs FROM occ GROUP BY 1
        ) WHERE ndocs BETWEEN 2 AND 20
    ), blocked AS (
        SELECT occ.* FROM occ JOIN keep USING (gram)
    ), matches AS (
        SELECT a.id AS id_a, b.id AS id_b, a.pos AS pa,
               a.pos - b.pos AS diag
        FROM blocked a JOIN blocked b
          ON a.gram = b.gram AND a.id < b.id
    ), runs AS (
        SELECT id_a, id_b, diag,
               pa - row_number() OVER (
                   PARTITION BY id_a, id_b, diag ORDER BY pa) AS grp
        FROM matches
    ), rl AS (
        SELECT id_a, id_b, diag, grp, count(*) AS run
        FROM runs GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           CAST(max(run) + 19 AS BIGINT) AS lcs_len,
           CAST(sum(run) AS BIGINT) AS n_matches
    FROM rl GROUP BY 1, 2
"""

ORACLES["q_self_lcs"] = """
    WITH occ AS (
        SELECT doc_id AS id, CAST(g.i AS BIGINT) AS pos,
               substr(text, g.i + 1, 12) AS gram
        FROM documents d CROSS JOIN LATERAL (
            SELECT unnest(generate_series(0, strlen(d.text) - 12)) AS i
        ) g
        WHERE strlen(d.text) >= 12
    ), matches AS (
        SELECT a.id, a.pos AS pa, a.pos - b.pos AS diag
        FROM occ a JOIN occ b
          ON a.gram = b.gram AND a.id = b.id AND a.pos > b.pos
    ), runs AS (
        SELECT id, diag,
               pa - row_number() OVER (
                   PARTITION BY id, diag ORDER BY pa) AS grp
        FROM matches
    ), rl AS (
        SELECT id, diag, grp, count(*) AS run
        FROM runs GROUP BY 1, 2, 3
    ), per_doc AS (
        SELECT id, CAST(max(run) + 11 AS BIGINT) AS max_rep_len,
               CAST(sum(run) AS BIGINT) AS n_rep_grams
        FROM rl GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(p.max_rep_len, 0) AS BIGINT) AS max_rep_len,
           CAST(coalesce(p.n_rep_grams, 0) AS BIGINT) AS n_rep_grams
    FROM documents d LEFT JOIN per_doc p ON p.id = d.doc_id
"""

ORACLES["q_minhash_error"] = r"""
    WITH toked AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, s, s + 2), ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 2)) AS s
            FROM toked WHERE len(t) >= 3
        )
    ), sizes AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
        FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS i
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), tp AS (
        SELECT id_a, id_b,
               (i * 1000000) // (sa.n_sh + sb.n_sh - i) AS true_ppm
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    ), tpf AS (
        SELECT * FROM tp WHERE true_ppm >= 200000
    ), mh AS (
        SELECT doc_id,
               min(CAST(('0x' || substr(md5('0:' || shingle), 1, 8)) AS BIGINT)) AS mh_0,
                   min(CAST(('0x' || substr(md5('1:' || shingle), 1, 8)) AS BIGINT)) AS mh_1,
                   min(CAST(('0x' || substr(md5('2:' || shingle), 1, 8)) AS BIGINT)) AS mh_2,
                   min(CAST(('0x' || substr(md5('3:' || shingle), 1, 8)) AS BIGINT)) AS mh_3,
                   min(CAST(('0x' || substr(md5('4:' || shingle), 1, 8)) AS BIGINT)) AS mh_4,
                   min(CAST(('0x' || substr(md5('5:' || shingle), 1, 8)) AS BIGINT)) AS mh_5,
                   min(CAST(('0x' || substr(md5('6:' || shingle), 1, 8)) AS BIGINT)) AS mh_6,
                   min(CAST(('0x' || substr(md5('7:' || shingle), 1, 8)) AS BIGINT)) AS mh_7
        FROM sh GROUP BY doc_id
    )
    SELECT t.id_a, t.id_b, t.true_ppm,
           CAST(((CASE WHEN a.mh_0 = b.mh_0 THEN 1 ELSE 0 END + CASE WHEN a.mh_1 = b.mh_1 THEN 1 ELSE 0 END + CASE WHEN a.mh_2 = b.mh_2 THEN 1 ELSE 0 END + CASE WHEN a.mh_3 = b.mh_3 THEN 1 ELSE 0 END + CASE WHEN a.mh_4 = b.mh_4 THEN 1 ELSE 0 END + CASE WHEN a.mh_5 = b.mh_5 THEN 1 ELSE 0 END + CASE WHEN a.mh_6 = b.mh_6 THEN 1 ELSE 0 END + CASE WHEN a.mh_7 = b.mh_7 THEN 1 ELSE 0 END) * 1000000) // 8 AS BIGINT) AS est_ppm,
           CAST(((CASE WHEN a.mh_0 = b.mh_0 THEN 1 ELSE 0 END + CASE WHEN a.mh_1 = b.mh_1 THEN 1 ELSE 0 END + CASE WHEN a.mh_2 = b.mh_2 THEN 1 ELSE 0 END + CASE WHEN a.mh_3 = b.mh_3 THEN 1 ELSE 0 END + CASE WHEN a.mh_4 = b.mh_4 THEN 1 ELSE 0 END + CASE WHEN a.mh_5 = b.mh_5 THEN 1 ELSE 0 END + CASE WHEN a.mh_6 = b.mh_6 THEN 1 ELSE 0 END + CASE WHEN a.mh_7 = b.mh_7 THEN 1 ELSE 0 END) * 1000000) // 8 - t.true_ppm AS BIGINT)
               AS err_ppm
    FROM tpf t
    JOIN mh a ON a.doc_id = t.id_a
    JOIN mh b ON b.doc_id = t.id_b
"""


def q_blocking_recall(spark, sf_dir):
    """Blocking-recall eval (functions/dedup.py blocking_recall_eval):
    candidate recall of the 8-hash/4-band portable LSH banding against
    EXACT shingle-Jaccard ground truth at thresholds 0.05/0.2/0.5 —
    the q_ann_recall discipline applied to F2's blocking stage
    (q_minhash_error grades the estimator; this grades what the bands
    SURFACE — at 0.05, below the banding's S-curve knee, the measured
    recall visibly drops below 10⁶, which is exactly the
    sub-threshold loss the (num_hashes, bands) budget trades away).
    Truth is the exhaustive shared-shingle quadratic — affordable
    because this is the eval; the candidate side is the production
    banding plan — run over the bounded doc_id < 500 eval slice (the
    knn_classify bounded-eval lesson: the unbounded truth quadratic
    probed 24× at 10×; the bound is a pushed-down predicate, not an
    orderBy+limit that re-sorts the corpus per subtree reuse)."""
    from salesforce_plugin_spark.functions.dedup import blocking_recall_eval

    d = load_table(spark, sf_dir, "documents")
    return blocking_recall_eval(
        d, "doc_id", "text", thresholds_ppm=[50000, 200000, 500000]
    )


def _blocking_recall_oracle(
    thresholds=(50000, 200000, 500000), num_hashes: int = 8, bands: int = 4
) -> str:
    rows_per_band = num_hashes // bands
    mh_cols = ",\n                   ".join(
        f"min(CAST(('0x' || substr(md5('{i}:' || shingle), 1, 8))"
        f" AS BIGINT)) AS mh_{i}"
        for i in range(num_hashes)
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS bucket FROM mh".format(
            b=b,
            concat=" || '|' || ".join(
                f"CAST(mh_{b * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    per_t = " UNION ALL ".join(
        f"""
        SELECT CAST({t} AS BIGINT) AS threshold_ppm,
               CAST(count(*) AS BIGINT) AS n_true,
               CAST(sum(hit) AS BIGINT) AS n_hit
        FROM joined WHERE jac_ppm >= {t}"""
        for t in thresholds
    )
    return rf"""
    WITH toked AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents WHERE doc_id < 500
    ), sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(t, s, s + 2), ' ') AS shingle
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 2)) AS s
            FROM toked WHERE len(t) >= 3
        )
    ), sizes AS (
        SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), truth AS (
        SELECT id_a, id_b,
               (i * 1000000) // (sa.n_sh + sb.n_sh - i) AS jac_ppm
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    ), mh AS (
        SELECT doc_id,
               {mh_cols}
        FROM sh GROUP BY doc_id
    ), bb AS (
        {band_rows}
    ), cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bb a JOIN bb b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
    ), joined AS (
        SELECT t.*, CASE WHEN c.id_a IS NULL THEN 0 ELSE 1 END AS hit
        FROM truth t LEFT JOIN cands c USING (id_a, id_b)
    ), per_t AS ({per_t}
    )
    SELECT threshold_ppm, n_true, n_hit,
           CASE WHEN n_true > 0
                THEN (n_hit * 1000000) // n_true END AS recall_ppm
    FROM per_t
"""


ORACLES["q_blocking_recall"] = _blocking_recall_oracle()
