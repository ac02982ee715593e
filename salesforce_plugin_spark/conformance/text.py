"""F5 text analysis: tokenization, quality, contamination, tf-idf, RAKE, BPE, language/encoding heuristics.

Split from the single-file conformance registry in round 6; byte-identical
query builders and oracle SQL. The ordered public registry lives in
``salesforce_plugin_spark.conformance`` (the package __init__).
"""

from __future__ import annotations

from salesforce_plugin_spark.conformance._common import *  # noqa: F401,F403


def q_line_clean(spark, sf_dir):
    """F5: C4-style line-level cleaning — wrap each document into
    deterministic 12-word lines (the fixture corpus is single-line;
    wrap_words gives it an engine-portable line structure), drop lines
    with <5 words or containing a blacklisted term, gate documents on ≥3
    surviving lines. Emits (doc_id, n_lines, n_kept, cleaned) with the
    surviving lines rejoined in order — the cleaned text itself is
    hash-checked, not just the counts. All JVM HOFs, no shuffle."""
    from salesforce_plugin_spark.functions.text import line_filter, wrap_words

    d = parallelized(load_table(spark, sf_dir, "documents"))
    lines = wrap_words(F.col("text"), 12)
    kept = line_filter(lines, min_words=5, blacklist=("slow", "merge"))
    return (
        d.select(
            "doc_id",
            F.size(lines).cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(kept, "\n").alias("cleaned"),
        )
        .filter(F.col("n_kept") >= 3)
    )


def q_importance_weights(spark, sf_dir):
    """DSIR-shape data selection (functions/text.py
    hashed_ngram_importance, Xie et al. 2023): hashed-bigram importance
    of every document against the English-language target domain —
    add-one-smoothed target/corpus count ratios per md5 bucket, exact
    BIGINT per-document sums, one final divide. The cheap
    "does this raw text look like my curated domain" scorer that fronts
    importance resampling at corpus scale; every deciding operation is
    integer so the DuckDB oracle replays it bit-for-bit."""
    from salesforce_plugin_spark.functions.text import hashed_ngram_importance

    d = load_table(spark, sf_dir, "documents")
    return hashed_ngram_importance(
        d, "doc_id", "text", F.col("lang") == "en", n_buckets=4096
    )


def q_bm25(spark, sf_dir):
    """F5/IR: exact-arithmetic BM25 (functions/ir.py) — the lexical
    retrieval scorer for query-based corpus selection, made
    hash-gateable by keeping every partial an integer ratio (idf's +0.5
    smoothing cleared to (2N-2df+1)/(2df+1), dl/avgdl pre-quantized by
    integer division) and floor-scaling ONCE before an exact BIGINT sum
    — associative under any aggregation order, unlike float BM25. One
    exchange on (doc, term) for tf; df and corpus stats are tiny
    broadcast sides; final per-doc sum partial-combines."""
    from salesforce_plugin_spark.functions.ir import bm25_scores

    d = parallelized(load_table(spark, sf_dir, "documents"))
    return bm25_scores(d, "doc_id", "text", terms=["key", "row", "table"])


def q_url_dedup(spark, sf_dir):
    """Web-corpus stage one: URL-level dedup (functions/web.py) — CCNet/
    RefinedWeb/Dolma all collapse by normalized URL before any content
    work. The fixture has no URL column, so each document seeds a
    deterministic fake URL from its id (same discipline as q_pii_redact's
    seeded PII): mixed case, optional www., utm tracking params, optional
    fragment — every branch of the RE2-subset normalization chain
    (URL_NORMALIZE_CHAIN, replayed verbatim in the oracle) fires. One
    codegen projection + one min_by hash aggregate; ~154 normalized keys
    absorb 500 docs at sf0.01 (2-5-way dups)."""
    from salesforce_plugin_spark.functions.web import url_dedup

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(did % 4 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("Site"),
        (did % 7).cast("string"),
        F.lit(".example.com/p/"),
        (did % 11).cast("string"),
        F.when(did % 3 == 0, F.lit("?utm_source=feed&x=1"))
        .when(did % 3 == 1, F.lit("?x=1"))
        .otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return url_dedup(d.select("doc_id", url.alias("url")), "doc_id", "url")


def q_encoding_repair(spark, sf_dir):
    """F5 cleaning stage: UTF-8-as-cp1252 mojibake repair
    (functions/encoding.py) — ftfy's corpus-scale subset as a chained
    LITERAL replace projection (no regex, no Python, no shuffle), with
    the chain DERIVED from the encodings (utf-8 bytes decoded as cp1252)
    so it cannot drift from the standards it models. The ASCII fixture
    text is seeded with every repair target, damaged with the inverse
    chain (corrupt_encoding), repaired, and both forms are hash-gated
    against an oracle generated from the same chain table; repaired text
    must equal the seeded original byte-for-byte."""
    from salesforce_plugin_spark.functions.encoding import (
        ENCODING_SEED,
        corrupt_encoding,
        fix_encoding,
    )

    d = parallelized(load_table(spark, sf_dir, "documents"))
    seeded = d.select(
        "doc_id", F.concat(F.col("text"), F.lit(ENCODING_SEED)).alias("__s")
    )
    out = seeded.withColumn("corrupted", corrupt_encoding(F.col("__s")))
    return out.select(
        "doc_id",
        "corrupted",
        fix_encoding(F.col("corrupted")).alias("repaired"),
        (fix_encoding(F.col("corrupted")) == F.col("__s")).alias("roundtrip_ok"),
    )


def q_gopher_gate(spark, sf_dir):
    """F5 composite filter: Gopher-rule quality gate (functions/text.py
    gopher_quality) — the named rule family (Rae et al. 2021) as one
    map-side projection emitting a violation bitmask; every threshold is
    an integer cross-multiplication so no double ratio decides a
    boundary. min_tokens scaled to the fixture's short documents; the
    remaining rules run at Gopher's published values."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return X.gopher_quality(d, "doc_id", "text", min_tokens=10)


def q_bpe_step(spark, sf_dir):
    """Tokenizer training under the gate: one BPE merge-selection step
    (functions/text.py bpe_pair_counts) — corpus-wide adjacent
    character-pair frequencies over the lowercase alphabetic vocab,
    ranked (n desc, pair asc) so row rank=1 is the next merge. The
    word-level pre-aggregation is the scale move: pair counting runs
    over the DISTINCT vocabulary (one vocab-bounded exchange), never the
    corpus; the final window sees ≤ 26² rows."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return X.bpe_pair_counts(d, "text", top_n=40)


def q_fuzzy_link(spark, sf_dir):
    """Entity resolution (functions/entity.py deletion_link): link a
    seeded-typo dirty batch back to the part master by SymSpell
    deletion-neighborhood blocking — the scale-safe ER shape. The first
    cut of this query used attribute blocking (first name token,
    functions/entity.py blocked_fuzzy_link, kept as the API for
    discriminative attributes): the 10x probe showed the fixture's
    ~100-stem name vocabulary makes every attribute block quadratic
    (46 s at sf0.1). Deletion keys bucket only true near-matches, so
    candidate volume stays ~linear. Master names are made unique by a
    derived ' #<partkey>' suffix (the realistic registry shape — and it
    creates REAL ambiguity: dropping the last digit of '#4821' lands
    exactly on master '#482' at dist 0, so the (dist, master_id)
    election does genuine work). Corruption is DERIVED (drop / double
    the final char, or append 'x' — all dist 1), so the oracle
    regenerates the identical dirty side; max_dist=1 keeps the
    deletion-neighborhood candidate generator COMPLETE."""
    from salesforce_plugin_spark.functions.entity import deletion_link

    p = load_table(spark, sf_dir, "part")
    uname = F.concat(F.col("p_name"), F.lit(" #"), F.col("p_partkey"))
    master = p.select(F.col("p_partkey").alias("master_id"), uname.alias("name"))
    corrupted = (
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.substring(uname, F.lit(1), F.length(uname) - 1),
        )
        .when(
            F.col("p_partkey") % 3 == 1,
            F.concat(uname, F.substring(uname, F.length(uname), F.lit(1))),
        )
        .otherwise(F.concat(uname, F.lit("x")))
    )
    dirty = p.select(
        (F.col("p_partkey") + 1000000).alias("dirty_id"),
        corrupted.alias("name"),
    )
    return deletion_link(master, dirty, "master_id", "dirty_id", "name", max_dist=1)


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval (functions/ir.py rrf_fuse): BM25 lexical top-20
    fused with embedding-cosine semantic top-20 by reciprocal-rank
    fusion — the standard two-tower retrieval combiner, made
    hash-gateable by floor-scaling each 1/(k0+rank) fraction to an
    integer so the fused score is an exact BIGINT sum. Both input ranks
    are themselves deterministic: BM25 orders by its exact integer
    score_scaled (doc_id tiebreak), cosine by the round-6 similarity
    (vec_id tiebreak; doc_id = vec_id in the fixtures). Fusion cost is
    bounded by the truncated lists (40 rows), never the corpus."""
    from salesforce_plugin_spark.functions.ir import bm25_scores, ranked, rrf_fuse

    d = parallelized(load_table(spark, sf_dir, "documents"))
    e = load_table(spark, sf_dir, "embeddings")
    lex = ranked(
        bm25_scores(d, "doc_id", "text", terms=["key", "row", "table"]),
        "doc_id",
        [F.col("score_scaled").desc(), F.col("doc_id")],
        top_n=20,
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    sims = (
        e.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                V.cosine(
                    V.as_double(F.col("embedding")), V.as_double(F.col("q_vec"))
                ),
                6,
            ).alias("sim"),
        )
    )
    sem = ranked(
        sims, "doc_id", [F.col("sim").desc(), F.col("doc_id")], top_n=20
    )
    return rrf_fuse([("lex", lex), ("sem", sem)], "doc_id", k0=60)


def q_rerank(spark, sf_dir):
    """Two-stage retrieval with second-stage reranking (functions/ir.py
    rerank_interaction, round 6): the q_hybrid_rrf fused top-20 is the
    recall stage; the precision stage rescoped each candidate with the
    exact-integer late-interaction score (idf_scaled · saturating-tf
    summed over query terms) — the seam where a learned cross-encoder
    would run as an Arrow stage over the same bounded (candidate, doc)
    rows. Corpus stats broadcast; only candidate docs re-tokenize; the
    rerank window covers ≤ 20 rows. Oracle replays the whole chain
    (BM25 → cosine → RRF → interaction rerank) in one WITH."""
    from salesforce_plugin_spark.functions.ir import (
        bm25_scores,
        ranked,
        rerank_interaction,
        rrf_fuse,
    )

    d = parallelized(load_table(spark, sf_dir, "documents"))
    e = load_table(spark, sf_dir, "embeddings")
    lex = ranked(
        bm25_scores(d, "doc_id", "text", terms=["key", "row", "table"]),
        "doc_id",
        [F.col("score_scaled").desc(), F.col("doc_id")],
        top_n=20,
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    sims = e.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            V.cosine(
                V.as_double(F.col("embedding")), V.as_double(F.col("q_vec"))
            ),
            6,
        ).alias("sim"),
    )
    sem = ranked(
        sims, "doc_id", [F.col("sim").desc(), F.col("doc_id")], top_n=20
    )
    fused = rrf_fuse([("lex", lex), ("sem", sem)], "doc_id", k0=60)
    rer = rerank_interaction(
        d, fused, "doc_id", "text", terms=["key", "value", "index", "row"]
    )
    return fused.select("doc_id", "rrf_scaled", "fused_rank").join(
        rer, "doc_id"
    )


def q_collocations(spark, sf_dir):
    """Collocation mining by lift (functions/text.py collocation_lift):
    adjacent-bigram lift — the log-free PMI analog, rational in exact
    counts so it hash-gates — with margins derived from the bigram
    table itself (one corpus scan, vocab^2-bounded exchanges,
    broadcast margin joins). Top 40 by (lift desc, pair) with a
    min-count floor of 5."""
    from salesforce_plugin_spark.functions.text import collocation_lift

    d = parallelized(load_table(spark, sf_dir, "documents"))
    return collocation_lift(d, "text", min_pair_count=5, top_n=40)


def q_oov_audit(spark, sf_dir):
    """Tokenizer-coverage audit (functions/text.py oov_rate): per-doc
    out-of-vocabulary rate against the corpus's own deterministic
    top-500 vocab — one corpus scan, vocab as a bounded broadcast
    membership join, integer ppm. The detector for documents a frozen
    tokenizer would shred."""
    from salesforce_plugin_spark.functions.text import oov_rate

    d = parallelized(load_table(spark, sf_dir, "documents"))
    return oov_rate(d, "doc_id", "text", vocab_size=500)


def q_golden_records(spark, sf_dir):
    """Golden-record election (functions/entity.py golden_records): the
    MDM step after linkage — clusters (derived: partkey div 4) collapse
    to one canonical row by per-attribute majority vote with a
    deterministic smaller-value tiebreak; a present value always beats
    absences. Bounded per-(cluster, value) pre-counts; everything
    map-side combined."""
    from salesforce_plugin_spark.functions.entity import golden_records

    p = load_table(spark, sf_dir, "part").select(
        F.expr("p_partkey div 4").alias("cluster"),
        "p_brand",
        "p_type",
    )
    return golden_records(p, "cluster", ["p_brand", "p_type"])


def q_cluster_terms(spark, sf_dir):
    """Topic labeling capstone (functions/text.py cluster_terms —
    BERTopic's c-TF-IDF shape, log-free): documents k-means-assigned
    via their 1:1 embeddings (q_kmeans_assign's exact-integer
    assignment, vec_id < 8 seeds), then each cluster's top-5 terms by
    integer document-presence lift with a TOTAL tie order. The oracle
    chains the kmeans-assign CTEs into the presence/df/lift replay."""
    from salesforce_plugin_spark.functions.text import cluster_terms

    e = parallelized(load_table(spark, sf_dir, "embeddings"))
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"),
        F.col("embedding").alias("centroid"),
    )
    assign = V.kmeans_assign(e, seeds).select("vec_id", "cluster")
    d = load_table(spark, sf_dir, "documents")
    joined = d.join(
        assign, d["doc_id"] == assign["vec_id"]
    ).select("cluster", "text")
    return cluster_terms(joined, "cluster", "text", top_k=5, min_df=10)


def q_skipgrams(spark, sf_dir):
    """Skip-gram co-occurrence table (functions/text.py skipgram_counts):
    ordered (center, context) counts within a 3-token forward window —
    the word2vec/GloVe/windowed-PMI input — generated entirely by
    per-row HOFs (transform-with-index x slice x flatten: explode
    factor exactly `window`, no join, no pre-count shuffle) into ONE
    partial-combined count exchange. min_count=5 floors the output."""
    from salesforce_plugin_spark.functions.text import skipgram_counts

    d = load_table(spark, sf_dir, "documents")
    return skipgram_counts(d, "text", window=3, min_count=5)


def q_term_assoc(spark, sf_dir):
    """Term-label feature selection (functions/text.py
    term_label_association): the full 2x2 contingency per (term, source)
    — including a = 0 rows from the term x label scaffold — with the phi
    coefficient as the one surface float (products of exact ints, one
    sqrt, one divide, round 6; |phi| ranking == chi-squared ranking at
    fixed n). df floor 25 docs bounds the output vocabulary."""
    from salesforce_plugin_spark.functions.text import term_label_association

    d = load_table(spark, sf_dir, "documents")
    return term_label_association(d, "doc_id", "text", "source", min_docs=25)


def q_rake(spark, sf_dir):
    """Unsupervised keyphrase extraction (functions/text.py
    rake_keywords): RAKE over the corpus — stopword-delimited candidate
    phrases (map-side regex + explode), word degree/freq stats in one
    vocab-bounded exchange, integer-ppm word scores, phrase score = sum
    of member scores, top-50 under a TOTAL order. Float RAKE could
    never hash-gate; degree*10^6 div freq can."""
    from salesforce_plugin_spark.functions.text import rake_keywords

    d = load_table(spark, sf_dir, "documents")
    return rake_keywords(d, "doc_id", "text", top_k=50)


def q_length_buckets(spark, sf_dir):
    """Batching-efficiency accounting (operators/pipeline.py
    length_buckets): pad-to-next-pow2 bucket histogram with the wasted
    padding mass per bucket — computed with integer bit arithmetic
    (1 << length(bin(n-1)), no float log2 whose last ulp at exact
    power-of-two boundaries is engine-ambiguous). Map-side + one
    ~log(max_len)-bounded aggregate."""
    from salesforce_plugin_spark.functions.text import token_count
    from salesforce_plugin_spark.operators.pipeline import length_buckets

    d = load_table(spark, sf_dir, "documents").select(
        token_count("text").alias("n_tokens")
    )
    return length_buckets(d, "n_tokens", min_bucket=16)


def q_vocab_coverage(spark, sf_dir):
    """Tokenizer sizing (functions/text.py vocab_coverage): corpus
    token-occurrence coverage of the top-c terms per rank cutoff — the
    vocabulary-size / OOV-budget curve. One vocab-bounded term
    exchange; rank + cumsum windows run over the vocab table under a
    total (count desc, term) order; coverage is one integer div."""
    from salesforce_plugin_spark.functions.text import vocab_coverage

    d = load_table(spark, sf_dir, "documents")
    return vocab_coverage(d, "text", cutoffs=[1, 10, 100, 1000])


def q_token_gini(spark, sf_dir):
    """Per-document lexical concentration (functions/text.py
    token_gini): Gini impurity of the token distribution in exact
    integer ppm — no float entropy/log, so the signal sits under the
    hash gate (the class_balance discipline, per document). HOF counts
    over the row's own token array: pure projection, NO shuffle; the
    oracle pays an explode+group the Spark side never does."""
    from salesforce_plugin_spark.functions.text import token_gini

    d = load_table(spark, sf_dir, "documents")
    return token_gini(d, "doc_id", "text")


def q_source_overlap(spark, sf_dir):
    """Corpus-mix diagnostic (functions/text.py source_vocab_overlap):
    pairwise vocabulary Jaccard between sources in exact integer ppm —
    which corpus slices are lexically redundant before weighting them.
    One DISTINCT (source, term) exchange; intersections via a term
    equijoin (co-occurring terms only, never cartesian); final
    aggregate bounded by sources²."""
    from salesforce_plugin_spark.functions.text import source_vocab_overlap

    d = load_table(spark, sf_dir, "documents")
    return source_vocab_overlap(d, "source", "text")


def q_bpe_apply(spark, sf_dir):
    """Tokenizer APPLICATION (functions/text.py bpe_apply): segment the
    corpus with the top-6 char-pair merge table (bpe_pair_counts' rank
    order) and return exact per-document token counts — the consumer
    side of q_bpe_step, i.e. "how many tokens is this corpus under the
    tokenizer". Each merge is one global leftmost-non-overlapping
    literal replacement over sentinel-spaced characters — semantics
    both engines' replace() share, so the segmentation replays
    verbatim. The chain runs over the DISTINCT vocab only; counts join
    back per (doc, word)."""
    from salesforce_plugin_spark.functions.text import bpe_apply

    d = load_table(spark, sf_dir, "documents")
    return bpe_apply(d, "doc_id", "text", n_merges=6)



def q_cross_encoder(spark, sf_dir):
    """Two-stage retrieval with the SECOND stage running through the
    Arrow ``mapInPandas`` cross-encoder seam (functions/ir.py
    rerank_cross_encoder, round 7): BM25 top-20 is the recall stage;
    each surviving (query, document) pair then crosses the Python
    boundary in Arrow batches and is scored by the deterministic
    positional scorer (first-position-weighted term contributions over
    a 64-token context window) — the exact plumbing a learned
    cross-encoder uses, with the model call swapped for an
    oracle-replayable stand-in. Only the ≤ 20 candidate texts reach
    Python (candidate ids broadcast into the join); the rerank window
    covers ≤ 20 rows. The oracle replays BM25 + the positional score
    with list_position over the same truncated token window."""
    from salesforce_plugin_spark.functions.ir import (
        bm25_scores,
        ranked,
        rerank_cross_encoder,
    )

    d = parallelized(load_table(spark, sf_dir, "documents"))
    lex = ranked(
        bm25_scores(d, "doc_id", "text", terms=["key", "row", "table"]),
        "doc_id",
        [F.col("score_scaled").desc(), F.col("doc_id")],
        top_n=20,
    )
    ce = rerank_cross_encoder(
        d, lex, "doc_id", "text",
        terms=["key", "value", "index", "row"], max_len=64,
    )
    return lex.withColumnRenamed("rank", "lex_rank").join(ce, "doc_id")


ORACLES: dict[str, str] = {}

ORACLES["q_line_clean"] = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        FROM documents
    ), lines AS (
        SELECT doc_id, c,
               array_to_string(list_slice(w, c*12 + 1, c*12 + 12), ' ') AS line
        FROM (
            SELECT doc_id, w,
                   unnest(generate_series(
                       0, CAST(ceil(len(w) / 12.0) AS INT) - 1)) AS c
            FROM toks WHERE len(array_to_string(w, '')) > 0
        )
    ), marked AS (
        SELECT doc_id, c, line,
               len(string_split(line, ' ')) >= 5
               AND NOT list_has_any(string_split(lower(line), ' '),
                                    ['slow', 'merge']) AS keep
        FROM lines
    ), agg AS (
        SELECT doc_id,
               count(*) AS n_lines,
               count(*) FILTER (keep) AS n_kept,
               coalesce(string_agg(line, chr(10) ORDER BY c)
                            FILTER (keep), '') AS cleaned
        FROM marked GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_kept AS BIGINT) AS n_kept, cleaned
    FROM agg WHERE n_kept >= 3
"""

#: q_bm25 integer coefficients for k1=6/5, b=3/4, rel_dl quantum 10^4,
#: scale 10^6 — mirrors functions/ir.py bm25_scores exactly.
ORACLES["q_bm25"] = r"""
    WITH toked AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), lens AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toked
    ), corpus AS (
        SELECT CAST(count(*) AS BIGINT) AS d_docs,
               CAST(sum(dl) AS BIGINT) AS t_toks
        FROM lens
    ), hits AS (
        SELECT doc_id, tok AS term
        FROM (SELECT doc_id, unnest(t) AS tok FROM toked)
        WHERE tok IN ('key', 'row', 'table')
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM hits GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), parts AS (
        SELECT tf.doc_id,
               ((2 * c.d_docs - 2 * d.df + 1) * tf.tf * 440000 * 1000000)
               // ((2 * d.df + 1)
                   * (200000 * tf.tf + 60000
                      + 18 * ((l.dl * c.d_docs * 10000) // c.t_toks)))
                   AS part
        FROM tf
        JOIN lens l USING (doc_id)
        JOIN dfreq d USING (term)
        CROSS JOIN corpus c
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_terms,
           CAST(sum(part) AS BIGINT) AS score_scaled,
           CAST(CAST(sum(part) AS BIGINT) AS DOUBLE) / 1000000.0 AS score
    FROM parts GROUP BY doc_id
"""

ORACLES["q_url_dedup"] = r"""
    WITH seeded AS (
        SELECT doc_id,
               'https://'
               || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
               || 'Site' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id % 11 AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&x=1'
                       WHEN doc_id % 3 = 1 THEN '?x=1' ELSE '' END
               || CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END AS url
        FROM documents
    ), normed AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(
                   lower(trim(url)),
                   '#.*$', '', 'g'),
                   '^https?://', '', 'g'),
                   '^www\.', '', 'g'),
                   '(utm_[a-z]+|gclid|fbclid)=[^&]*&?', '', 'g'),
                   '\?&', '?', 'g'),
                   '[?&]+$', '', 'g'),
                   '/+$', '', 'g') AS url_norm
        FROM seeded
    )
    SELECT min(doc_id) AS doc_id, url_norm,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM normed GROUP BY url_norm
"""

ORACLES["q_encoding_repair"] = _encoding_repair_oracle()

ORACLES["q_gopher_gate"] = r"""
    WITH m AS (
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
    ), f AS (
        SELECT doc_id, n_tokens,
               CAST(
                 CASE WHEN n_tokens < 10 THEN 1 ELSE 0 END
               + CASE WHEN n_tokens > 100000 THEN 2 ELSE 0 END
               + CASE WHEN sum_len < 3 * n_tokens
                       OR sum_len > 10 * n_tokens THEN 4 ELSE 0 END
               + CASE WHEN 10 * n_punct >= n_tokens THEN 8 ELSE 0 END
               + CASE WHEN 25 * n_stop <= n_tokens THEN 16 ELSE 0 END
               + CASE WHEN 5 * n_alpha <= 4 * n_tokens THEN 32 ELSE 0 END
               AS INT) AS flags
        FROM m
    )
    SELECT doc_id, n_tokens, flags, flags = 0 AS passes FROM f
"""

ORACLES["q_importance_weights"] = r"""
    WITH toked AS (
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
    SELECT t.doc_id, t.is_target,
           CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(sc.s AS BIGINT) AS score_scaled,
           round(sc.s / (1000000.0 * sc.n_bigrams), 6) AS importance
    FROM toked t LEFT JOIN scored sc ON t.doc_id = sc.doc_id
"""

# BPE pair counting over the distinct vocab, same tokenization chain.
ORACLES["q_bpe_step"] = r"""
    WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wf
        FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
            FROM documents
        )
        WHERE regexp_matches(w, '^[a-z]+$') AND strlen(w) >= 2
        GROUP BY w
    ), pairs AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, wf
        FROM (
            SELECT w, wf, unnest(generate_series(1, strlen(w) - 1)) AS i
            FROM words
        )
    ), agg AS (
        SELECT pair, CAST(sum(wf) AS BIGINT) AS n FROM pairs GROUP BY pair
    )
    SELECT pair, n, rank FROM (
        SELECT pair, n,
               CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rank
        FROM agg
    ) WHERE rank <= 40
"""

# Blocked levenshtein linkage; the dirty side is re-derived in SQL.
ORACLES["q_fuzzy_link"] = r"""
    WITH master AS (
        SELECT p_partkey AS master_id,
               lower(trim(p_name || ' #' || CAST(p_partkey AS VARCHAR))) AS name
        FROM part
    ), dirty AS (
        SELECT p_partkey + 1000000 AS dirty_id,
               lower(trim(CASE
                   WHEN p_partkey % 3 = 0 THEN substr(raw, 1, CAST(strlen(raw) AS INT) - 1)
                   WHEN p_partkey % 3 = 1
                       THEN raw || substr(raw, CAST(strlen(raw) AS INT), 1)
                   ELSE raw || 'x'
               END)) AS name
        FROM (SELECT p_partkey,
                     p_name || ' #' || CAST(p_partkey AS VARCHAR) AS raw
              FROM part)
    ), mk AS (
        SELECT master_id, name,
               CASE WHEN i = 0 THEN name
                    ELSE substr(name, 1, CAST(i AS INT) - 1)
                         || substr(name, CAST(i AS INT) + 1) END AS key
        FROM (SELECT master_id, name,
                     unnest(generate_series(0, strlen(name))) AS i
              FROM master)
    ), dk AS (
        SELECT dirty_id, name,
               CASE WHEN i = 0 THEN name
                    ELSE substr(name, 1, CAST(i AS INT) - 1)
                         || substr(name, CAST(i AS INT) + 1) END AS key
        FROM (SELECT dirty_id, name,
                     unnest(generate_series(0, strlen(name))) AS i
              FROM dirty)
    ), cand AS (
        SELECT DISTINCT d.dirty_id, d.name AS dname, m.master_id, m.name AS mname
        FROM dk d JOIN mk m USING (key)
    ), scored AS (
        SELECT dirty_id, master_id,
               CAST(levenshtein(dname, mname) AS INT) AS dist
        FROM cand
        WHERE levenshtein(dname, mname) <= 1
    )
    SELECT dirty_id, master_id, dist FROM (
        SELECT dirty_id, master_id, dist,
               row_number() OVER (PARTITION BY dirty_id
                                  ORDER BY dist, master_id) AS rn
        FROM scored
    ) WHERE rn = 1
"""

# RRF fusion: BM25 CTEs (identical coefficients to q_bm25) + round-6
# cosine ranks, integer floor-scaled reciprocal ranks, exact BIGINT sum.
ORACLES["q_hybrid_rrf"] = r"""
    WITH toked AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), lens AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toked
    ), corpus AS (
        SELECT CAST(count(*) AS BIGINT) AS d_docs,
               CAST(sum(dl) AS BIGINT) AS t_toks
        FROM lens
    ), hits AS (
        SELECT doc_id, tok AS term
        FROM (SELECT doc_id, unnest(t) AS tok FROM toked)
        WHERE tok IN ('key', 'row', 'table')
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM hits GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), parts AS (
        SELECT tf.doc_id,
               ((2 * c.d_docs - 2 * d.df + 1) * tf.tf * 440000 * 1000000)
               // ((2 * d.df + 1)
                   * (200000 * tf.tf + 60000
                      + 18 * ((l.dl * c.d_docs * 10000) // c.t_toks)))
                   AS part
        FROM tf
        JOIN lens l USING (doc_id)
        JOIN dfreq d USING (term)
        CROSS JOIN corpus c
    ), bm AS (
        SELECT doc_id, CAST(sum(part) AS BIGINT) AS score_scaled
        FROM parts GROUP BY doc_id
    ), lex AS (
        SELECT doc_id, CAST(rn AS INT) AS rank FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS rn
            FROM bm
        ) WHERE rn <= 20
    ), sims AS (
        SELECT e.vec_id AS doc_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ), sem AS (
        SELECT doc_id, CAST(rn AS INT) AS rank FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY sim DESC, doc_id) AS rn
            FROM sims
        ) WHERE rn <= 20
    ), tagged AS (
        SELECT doc_id, 'lex' AS src, rank FROM lex
        UNION ALL
        SELECT doc_id, 'sem' AS src, rank FROM sem
    ), fused AS (
        SELECT doc_id,
               CAST(min(CASE WHEN src = 'lex' THEN rank END) AS INT)
                   AS rank_lex,
               CAST(min(CASE WHEN src = 'sem' THEN rank END) AS INT)
                   AS rank_sem,
               CAST(sum(1000000000 // (60 + rank)) AS BIGINT) AS rrf_scaled
        FROM tagged GROUP BY doc_id
    )
    SELECT doc_id, rank_lex, rank_sem, rrf_scaled,
           CAST(row_number() OVER (ORDER BY rrf_scaled DESC, doc_id) AS INT)
               AS fused_rank
    FROM fused
"""

ORACLES["q_collocations"] = r"""
    WITH toked AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents
    ), grams AS (
        SELECT t[s] AS w1, t[s + 1] AS w2
        FROM (
            SELECT t, unnest(generate_series(1, len(t) - 1)) AS s
            FROM toked WHERE len(t) >= 2
        )
    ), pairs AS (
        SELECT w1, w2, count(*) AS n_ab FROM grams GROUP BY 1, 2
    ), lm AS (
        SELECT w1, sum(n_ab) AS n_a FROM pairs GROUP BY w1
    ), rm AS (
        SELECT w2, sum(n_ab) AS n_b FROM pairs GROUP BY w2
    ), tot AS (
        SELECT sum(n_ab) AS n FROM pairs
    ), scored AS (
        SELECT p.w1, p.w2, p.n_ab, lm.n_a, rm.n_b,
               p.n_ab * t.n * 1000000 // (lm.n_a * rm.n_b) AS lift_ppm
        FROM pairs p
        JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot t
        WHERE p.n_ab >= 5
    )
    SELECT w1, w2, n_ab,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(lift_ppm AS BIGINT) AS lift_ppm,
           CAST(row_number() OVER (ORDER BY lift_ppm DESC, w1, w2) AS INT)
               AS rank
    FROM scored
    QUALIFY rank <= 40
"""

ORACLES["q_oov_audit"] = r"""
    WITH ex AS (
        SELECT doc_id, unnest(
            list_transform(regexp_split_to_array(trim(text), '\s+'),
                           x -> lower(x))) AS tok
        FROM documents
    ), ex2 AS (
        SELECT doc_id, tok FROM ex WHERE tok <> ''
    ), vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS tf FROM ex2 GROUP BY tok
            ORDER BY tf DESC, tok LIMIT 500
        )
    )
    SELECT e.doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS oov_ppm
    FROM ex2 e LEFT JOIN vocab v ON e.tok = v.tok
    GROUP BY e.doc_id
"""

ORACLES["q_golden_records"] = """
    WITH base AS (
        SELECT p_partkey // 4 AS cluster, p_brand, p_type FROM part
    ), members AS (
        SELECT cluster, count(*) AS n_members FROM base GROUP BY cluster
    ), brand_votes AS (
        SELECT cluster, p_brand, count(*) AS n FROM base
        WHERE p_brand IS NOT NULL GROUP BY cluster, p_brand
    ), brand AS (
        SELECT v.cluster, min(v.p_brand) AS p_brand
        FROM brand_votes v
        JOIN (SELECT cluster, max(n) AS top FROM brand_votes GROUP BY cluster) t
          ON t.cluster = v.cluster AND v.n = t.top
        GROUP BY v.cluster
    ), type_votes AS (
        SELECT cluster, p_type, count(*) AS n FROM base
        WHERE p_type IS NOT NULL GROUP BY cluster, p_type
    ), cont AS (
        SELECT v.cluster, min(v.p_type) AS p_type
        FROM type_votes v
        JOIN (SELECT cluster, max(n) AS top FROM type_votes GROUP BY cluster) t
          ON t.cluster = v.cluster AND v.n = t.top
        GROUP BY v.cluster
    )
    SELECT m.cluster, m.n_members, b.p_brand, c.p_type
    FROM members m
    LEFT JOIN brand b ON b.cluster = m.cluster
    LEFT JOIN cont c ON c.cluster = m.cluster
"""

ORACLES["q_term_assoc"] = r"""
    WITH el AS (
        SELECT doc_id, source AS label,
               lower(unnest(regexp_split_to_array(trim(text), '\s+')))
                   AS term
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
    ), pres AS (
        SELECT DISTINCT doc_id, label, term FROM el
    ), tl AS (
        SELECT term, label, count(*) AS a FROM pres GROUP BY 1, 2
    ), tt AS (
        SELECT term, sum(a) AS tt FROM tl GROUP BY 1
    ), lt AS (
        SELECT source AS label, count(*) AS lt FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL GROUP BY 1
    ), nd AS (
        SELECT count(*) AS n FROM documents
        WHERE text IS NOT NULL AND source IS NOT NULL
    ), cells AS (
        SELECT sc.term, sc.label,
               CAST(COALESCE(tl.a, 0) AS BIGINT) AS a,
               CAST(sc.tt - COALESCE(tl.a, 0) AS BIGINT) AS b,
               CAST(sc.lt - COALESCE(tl.a, 0) AS BIGINT) AS c,
               CAST(nd.n - sc.tt - sc.lt + COALESCE(tl.a, 0) AS BIGINT) AS d
        FROM (SELECT t.term, l.label, t.tt, l.lt
              FROM tt t CROSS JOIN lt l WHERE t.tt >= 25) sc
        LEFT JOIN tl ON sc.term = tl.term AND sc.label = tl.label
        CROSS JOIN nd
    )
    SELECT term, label, a, b, c, d,
           CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) > 0
                THEN round(CAST(a * d - b * c AS DOUBLE) /
                           sqrt(CAST(a + b AS DOUBLE) * (c + d) * (a + c)
                                * (b + d)), 6)
           END AS phi
    FROM cells
"""

ORACLES["q_skipgrams"] = r"""
    WITH t AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM documents WHERE text IS NOT NULL
    ), pos AS (
        SELECT tk, unnest(generate_series(1, len(tk))) AS i FROM t
    ), pairs AS (
        SELECT tk[i] AS center, tk[j] AS context
        FROM pos, unnest(generate_series(i + 1, least(i + 3, len(tk))))
                  AS u(j)
    )
    SELECT center, context, count(*) AS n
    FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5
"""

ORACLES["q_cluster_terms"] = _KMEANS_ASSIGN_CTES + r"""
    , assign AS (
        SELECT vec_id, cluster FROM ranked WHERE rn = 1
    ), jd AS (
        SELECT a.cluster, d.text
        FROM documents d JOIN assign a ON d.doc_id = a.vec_id
        WHERE d.text IS NOT NULL
    ), pres AS (
        SELECT cluster, term
        FROM (
            SELECT cluster,
                   unnest(list_distinct(regexp_split_to_array(
                       lower(trim(text)), '\s+'))) AS term
            FROM jd
        )
    ), tc AS (
        SELECT term, cluster, count(*) AS a FROM pres GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, sum(a) AS df FROM tc GROUP BY 1
    ), csize AS (
        SELECT cluster, count(*) AS nc FROM jd GROUP BY 1
    ), nd AS (
        SELECT count(*) AS n FROM jd
    ), scored AS (
        SELECT tc.cluster, tc.term,
               CAST(tc.a AS BIGINT) AS a,
               CAST(dfreq.df AS BIGINT) AS df,
               (tc.a * nd.n * 1000000) // (csize.nc * dfreq.df)
                   AS lift_ppm
        FROM tc
        JOIN dfreq ON tc.term = dfreq.term
        JOIN csize ON tc.cluster = csize.cluster
        CROSS JOIN nd
        WHERE dfreq.df >= 10
    )
    SELECT cluster, CAST(rk AS INT) AS rank, term, a, df,
           CAST(lift_ppm AS BIGINT) AS lift_ppm
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY cluster
            ORDER BY lift_ppm DESC, a DESC, term ASC) AS rk
        FROM scored
    ) WHERE rk <= 5
"""

ORACLES["q_rake"] = r"""
    WITH ph0 AS (
        SELECT unnest(str_split(
            regexp_replace(
                regexp_replace(lower(text), '[^a-z0-9\s]', '|', 'g'),
                '\b(?:the|a|an|and|or|of|to|in|is|it|that|this|for|on|with|as)\b',
                '|', 'g'),
            '|')) AS run
        FROM documents
    ), ph AS (
        SELECT regexp_replace(trim(run), '\s+', ' ', 'g') AS phrase
        FROM ph0 WHERE regexp_replace(trim(run), '\s+', ' ', 'g') <> ''
    ), pw AS (
        SELECT len(str_split(phrase, ' ')) AS n_words,
               unnest(str_split(phrase, ' ')) AS word
        FROM ph
    ), wsc AS (
        SELECT word,
               (CAST(sum(n_words) AS BIGINT) * 1000000)
                   // CAST(count(*) AS BIGINT) AS wscore
        FROM pw GROUP BY word
    ), pc AS (
        SELECT phrase, CAST(len(str_split(phrase, ' ')) AS INT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_occ
        FROM ph GROUP BY 1, 2
    ), px AS (
        SELECT phrase, n_words, n_occ,
               unnest(str_split(phrase, ' ')) AS word
        FROM pc
    ), psc AS (
        SELECT phrase, n_words, n_occ,
               CAST(sum(wsc.wscore) AS BIGINT) AS score_ppm
        FROM px JOIN wsc USING (word)
        GROUP BY 1, 2, 3
    )
    SELECT CAST(rk AS INT) AS rank, phrase, n_words, n_occ, score_ppm
    FROM (
        SELECT *, row_number() OVER (
            ORDER BY score_ppm DESC, n_occ DESC, phrase ASC) AS rk
        FROM psc
    ) WHERE rk <= 50
"""

ORACLES["q_length_buckets"] = r"""
    WITH tok AS (
        SELECT CAST(len(regexp_split_to_array(trim(text), '\s+'))
                    AS BIGINT) AS n
        FROM documents
    ), pw AS (
        SELECT (CAST(1 AS BIGINT) << g.i) AS p
        FROM generate_series(4, 40) g(i)
    ), b AS (
        SELECT n, (SELECT min(p) FROM pw WHERE p >= tok.n) AS bucket
        FROM tok
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS sum_tokens,
           CAST(sum(bucket - n) AS BIGINT) AS padding
    FROM b GROUP BY 1
"""

ORACLES["q_vocab_coverage"] = r"""
    WITH terms AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                AS term
            FROM documents
        ) WHERE term <> '' GROUP BY 1
    ), ranked AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, term ASC) AS rnk,
               sum(cnt) OVER (ORDER BY cnt DESC, term ASC
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cnt) OVER () AS total
        FROM terms
    ), cuts(cutoff) AS (VALUES (1), (10), (100), (1000))
    SELECT CAST(cutoff AS BIGINT) AS cutoff,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST((max(cum) * 1000000) // max(total) AS BIGINT)
               AS coverage_ppm
    FROM ranked JOIN cuts ON rnk <= cutoff
    GROUP BY 1
"""

ORACLES["q_token_gini"] = r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
        FROM documents
    ), tc AS (
        SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2
    ), agg AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(c * c) AS BIGINT) AS sq
        FROM tc GROUP BY 1
    )
    SELECT doc_id, n AS n_tokens, nd AS n_distinct,
           CAST(((n * n - sq) * 1000000) // (n * n) AS BIGINT) AS gini_ppm
    FROM agg
"""

ORACLES["q_source_overlap"] = r"""
    WITH gt AS (
        SELECT DISTINCT g, term FROM (
            SELECT source AS g,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                       AS term
            FROM documents
        ) WHERE term <> ''
    ), v AS (
        SELECT g, CAST(count(*) AS BIGINT) AS v FROM gt GROUP BY 1
    ), inter AS (
        SELECT a.g AS group_a, b.g AS group_b,
               CAST(count(*) AS BIGINT) AS inter
        FROM gt a JOIN gt b ON a.term = b.term AND a.g < b.g
        GROUP BY 1, 2
    )
    SELECT i.group_a, i.group_b, va.v AS v_a, vb.v AS v_b, i.inter,
           CAST((i.inter * 1000000) // (va.v + vb.v - i.inter)
                AS BIGINT) AS jaccard_ppm
    FROM inter i
    JOIN v va ON va.g = i.group_a
    JOIN v vb ON vb.g = i.group_b
"""

ORACLES["q_bpe_apply"] = _bpe_apply_oracle()


ORACLES["q_rerank"] = r"""
    WITH toked AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), lens AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toked
    ), corpus AS (
        SELECT CAST(count(*) AS BIGINT) AS d_docs,
               CAST(sum(dl) AS BIGINT) AS t_toks
        FROM lens
    ), hits AS (
        SELECT doc_id, tok AS term
        FROM (SELECT doc_id, unnest(t) AS tok FROM toked)
        WHERE tok IN ('key', 'row', 'table')
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM hits GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), parts AS (
        SELECT tf.doc_id,
               ((2 * c.d_docs - 2 * d.df + 1) * tf.tf * 440000 * 1000000)
               // ((2 * d.df + 1)
                   * (200000 * tf.tf + 60000
                      + 18 * ((l.dl * c.d_docs * 10000) // c.t_toks)))
                   AS part
        FROM tf
        JOIN lens l USING (doc_id)
        JOIN dfreq d USING (term)
        CROSS JOIN corpus c
    ), bm AS (
        SELECT doc_id, CAST(sum(part) AS BIGINT) AS score_scaled
        FROM parts GROUP BY doc_id
    ), lex AS (
        SELECT doc_id, CAST(rn AS INT) AS rank FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS rn
            FROM bm
        ) WHERE rn <= 20
    ), sims AS (
        SELECT e.vec_id AS doc_id,
               round(list_cosine_similarity(
                   CAST(e.embedding AS DOUBLE[]),
                   CAST(q.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ), sem AS (
        SELECT doc_id, CAST(rn AS INT) AS rank FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY sim DESC, doc_id) AS rn
            FROM sims
        ) WHERE rn <= 20
    ), tagged AS (
        SELECT doc_id, 'lex' AS src, rank FROM lex
        UNION ALL
        SELECT doc_id, 'sem' AS src, rank FROM sem
    ), fused AS (
        SELECT doc_id,
               CAST(sum(1000000000 // (60 + rank)) AS BIGINT) AS rrf_scaled
        FROM tagged GROUP BY doc_id
    ), fused_ranked AS (
        SELECT doc_id, rrf_scaled,
               CAST(row_number() OVER (ORDER BY rrf_scaled DESC, doc_id)
                    AS INT) AS fused_rank
        FROM fused
    ), hits2 AS (
        SELECT t.doc_id, tok AS term
        FROM (SELECT doc_id, unnest(t) AS tok FROM toked) t
        JOIN fused_ranked fr ON fr.doc_id = t.doc_id
        WHERE tok IN ('key', 'value', 'index', 'row')
    ), tf2 AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM hits2 GROUP BY 1, 2
    ), dfreq2 AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM (SELECT doc_id, tok AS term
              FROM (SELECT doc_id, unnest(t) AS tok FROM toked)
              WHERE tok IN ('key', 'value', 'index', 'row'))
        GROUP BY 1
    ), scored AS (
        SELECT tf2.doc_id,
               CAST(count(*) AS INT) AS n_hit,
               CAST(sum(
                   ((2 * c.d_docs - 2 * d2.df + 1) * 10000
                    // (2 * d2.df + 1))
                   * ((tf2.tf * 1000) // (tf2.tf + 1))
               ) AS BIGINT) AS rerank_scaled
        FROM tf2
        JOIN dfreq2 d2 USING (term)
        CROSS JOIN corpus c
        GROUP BY tf2.doc_id
    ), reranked AS (
        SELECT fr.doc_id, fr.rrf_scaled, fr.fused_rank,
               CAST(coalesce(s.n_hit, 0) AS INT) AS n_hit,
               CAST(coalesce(s.rerank_scaled, 0) AS BIGINT)
                   AS rerank_scaled
        FROM fused_ranked fr LEFT JOIN scored s USING (doc_id)
    )
    SELECT doc_id, rrf_scaled, fused_rank, n_hit, rerank_scaled,
           CAST(row_number() OVER (ORDER BY rerank_scaled DESC, doc_id)
                AS INT) AS rerank
    FROM reranked
"""


def q_surprisal(spark, sf_dir):
    """Unigram-LM surprisal scoring (functions/text.py
    unigram_surprisal): per-document total and per-token ⌊log₂⌋
    inverse-frequency bits, all integer via the shared bin()
    bit-length idiom — the CCNet-perplexity-shaped quality/novelty
    filter with a hash-gateable surface (float log2 is engine-ambiguous
    at ulp boundaries; bit length is not). One vocab-bounded term
    aggregate, a 1-row total broadcast, the corpus explode equijoined
    to the vocab, one per-doc aggregate."""
    from salesforce_plugin_spark.functions.text import unigram_surprisal

    d = load_table(spark, sf_dir, "documents")
    return unigram_surprisal(d, "doc_id", "text")


ORACLES["q_surprisal"] = r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                   AS term
        FROM documents
    ), tk AS (
        SELECT doc_id, term FROM toks WHERE term <> ''
    ), vocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY 1
    ), total AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM vocab
    ), scored AS (
        SELECT t.doc_id,
               CAST(length(bin(total.n_total // v.cnt)) - 1 AS BIGINT)
                   AS bits
        FROM tk t JOIN vocab v USING (term) CROSS JOIN total
    ), agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(bits) AS BIGINT) AS surprisal_bits
        FROM scored GROUP BY 1
    )
    SELECT doc_id, n_tokens, surprisal_bits,
           CAST((surprisal_bits * 1000000) // n_tokens AS BIGINT)
               AS bits_per_token_ppm
    FROM agg
"""

ORACLES["q_cross_encoder"] = r"""
    WITH toked AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), lens AS (
        SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toked
    ), corpus AS (
        SELECT CAST(count(*) AS BIGINT) AS d_docs,
               CAST(sum(dl) AS BIGINT) AS t_toks
        FROM lens
    ), hits AS (
        SELECT doc_id, tok AS term
        FROM (SELECT doc_id, unnest(t) AS tok FROM toked)
        WHERE tok IN ('key', 'row', 'table')
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM hits GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), parts AS (
        SELECT tf.doc_id,
               ((2 * c.d_docs - 2 * d.df + 1) * tf.tf * 440000 * 1000000)
               // ((2 * d.df + 1)
                   * (200000 * tf.tf + 60000
                      + 18 * ((l.dl * c.d_docs * 10000) // c.t_toks)))
                   AS part
        FROM tf
        JOIN lens l USING (doc_id)
        JOIN dfreq d USING (term)
        CROSS JOIN corpus c
    ), bm AS (
        SELECT doc_id, CAST(sum(part) AS BIGINT) AS score_scaled
        FROM parts GROUP BY doc_id
    ), lex AS (
        SELECT doc_id, CAST(rn AS INT) AS lex_rank FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS rn
            FROM bm
        ) WHERE rn <= 20
    ), win AS (
        SELECT l.doc_id, l.lex_rank, list_slice(t.t, 1, 64) AS w
        FROM lex l JOIN toked t USING (doc_id)
    ), pos AS (
        SELECT doc_id, lex_rank,
               list_position(w, 'index') AS p1,
               list_position(w, 'key')   AS p2,
               list_position(w, 'row')   AS p3,
               list_position(w, 'value') AS p4
        FROM win
    ), scored AS (
        SELECT doc_id, lex_rank,
               CAST((CASE WHEN p1 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN p2 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN p3 > 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN p4 > 0 THEN 1 ELSE 0 END) AS INT) AS n_hit,
               CAST((CASE WHEN p1 > 0 THEN 65 - p1 ELSE 0 END)
                  + (CASE WHEN p2 > 0 THEN 65 - p2 ELSE 0 END)
                  + (CASE WHEN p3 > 0 THEN 65 - p3 ELSE 0 END)
                  + (CASE WHEN p4 > 0 THEN 65 - p4 ELSE 0 END) AS BIGINT)
                   AS ce_scaled
        FROM pos
    )
    SELECT doc_id, lex_rank, n_hit, ce_scaled,
           CAST(row_number() OVER (ORDER BY ce_scaled DESC, doc_id) AS INT)
               AS ce_rank
    FROM scored
"""


def q_kneser_ney(spark, sf_dir):
    """CCNet-shape LM quality gate (functions/text.py kn_bigram_bits,
    round 7; Wenzek et al. 2020): every document's cross-entropy under
    an interpolated Kneser-Ney bigram model (fixed D = 3/4) trained on
    the corpus's English slice — the classic "train a small LM on the
    target domain, keep low-perplexity documents" curation filter, in
    EXACT integers: with a rational discount every KN probability is a
    BIGINT ratio, and the per-bigram information content comes from
    the pinned-threshold integer log2 (1/8-bit resolution,
    exactmath.log2_eighths_*), so the gate hash-matches across engines
    where float log-probs never could. Model tables are
    bigram-type-bounded; at the fixture the en slice scores ~116
    milli-bits/bigram lower than non-en — the in-domain signal the
    filter exists to read."""
    d = parallelized(load_table(spark, sf_dir, "documents"))
    return X.kn_bigram_bits(d, "doc_id", "text", F.col("lang") == "en")


def _kneser_ney_oracle() -> str:
    from salesforce_plugin_spark.functions.exactmath import (
        log2_eighths_duck,
    )

    bits = log2_eighths_duck(
        "CAST((CAST(den AS HUGEINT) * 4096) // num AS BIGINT)"
    )
    return rf"""
    WITH toked AS (
        SELECT doc_id, lang,
               list_transform(regexp_split_to_array(trim(text), '\s+'),
                              x -> lower(x)) AS t
        FROM documents
    ), big AS (
        SELECT doc_id, (lang = 'en') AS tgt,
               t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
        FROM toked, UNNEST(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    ), c12 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM big WHERE tgt GROUP BY 1, 2
    ), lft AS (
        SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p
        FROM c12 GROUP BY 1
    ), rgt AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS n1c FROM c12 GROUP BY 1
    ), nt AS (
        SELECT CAST(count(*) AS BIGINT) AS nt FROM c12
    ), rows_nd AS (
        SELECT b.doc_id,
               CASE WHEN l.c1 IS NULL THEN NULL
                    ELSE greatest(4 * coalesce(c.c12, 0) - 3, 0) * nt.nt
                         + 3 * coalesce(l.n1p, 0) * coalesce(r.n1c, 0)
               END AS num,
               4 * coalesce(l.c1, 1) * nt.nt AS den
        FROM big b
        LEFT JOIN c12 c USING (w1, w2)
        LEFT JOIN lft l USING (w1)
        LEFT JOIN rgt r USING (w2)
        CROSS JOIN nt
    ), scored AS (
        SELECT doc_id,
               CASE WHEN num IS NULL OR num = 0 THEN NULL
                    ELSE greatest({bits} - 96, 0) END AS bits8
        FROM rows_nd
    ), agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(count(bits8) AS BIGINT) AS n_scored,
               CAST(coalesce(sum(bits8), 0) AS BIGINT) AS kn_bits_x8
        FROM scored GROUP BY 1
    )
    SELECT doc_id, n_bigrams, n_scored, kn_bits_x8,
           CASE WHEN n_scored > 0
                THEN CAST(kn_bits_x8 * 125 // n_scored AS BIGINT) END
               AS milli_bits_per_bigram
    FROM agg
"""


ORACLES["q_kneser_ney"] = _kneser_ney_oracle()


def q_distill_quality(spark, sf_dir):
    """F5 (round 8): quality-classifier distillation through the
    cross-encoder Arrow seam (functions/ir.py distill_quality, VERDICT
    r7 #7): the deterministic teacher (lexical diversity, 10^6-scaled
    integer) scores only the doc_id % 4 == 0 sample in Python; the
    2-feature linear student (n_tokens, n_stopwords) is fitted by EXACT
    normal equations (DECIMAL(38,0) moments, Cramer on exact ints,
    one int->double conversion per weight) and scores the whole corpus
    JVM-side as broadcast literals. The oracle replays the teacher, the
    HUGEINT moments, the same Cramer determinants and the identical
    double expression tree."""
    from salesforce_plugin_spark.functions.ir import distill_quality

    d = parallelized(load_table(spark, sf_dir, "documents"))
    return distill_quality(d, "doc_id", "text", sample_mod=4)


ORACLES["q_distill_quality"] = r"""
    WITH feats AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
               CAST(len(regexp_extract_all(lower(text),
                   '\b(?:the|a|an|and|or|of|to|in|is|it|that|this|for|on|with|as)\b'))
                   AS BIGINT) AS n_stop
        FROM documents
    ), taught AS (
        -- replicates the Python teacher's text.lower().split() EXACTLY:
        -- split on \s+ and drop empty tokens, so leading/trailing tabs
        -- or newlines cannot mint a phantom '' token (DuckDB trim()
        -- strips spaces only — the round-8 parity gap)
        SELECT doc_id,
               CASE WHEN len(toks) = 0 THEN 0
                    ELSE (1000000 * len(list_distinct(toks))) // len(toks)
               END AS teacher_scaled
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS toks
            FROM documents WHERE doc_id % 4 = 0
        )
    ), m AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(f.n_tokens) AS HUGEINT) AS sx1,
               CAST(sum(f.n_stop) AS HUGEINT) AS sx2,
               CAST(sum(t.teacher_scaled) AS HUGEINT) AS sy,
               CAST(sum(f.n_tokens * f.n_tokens) AS HUGEINT) AS sx1x1,
               CAST(sum(f.n_stop * f.n_stop) AS HUGEINT) AS sx2x2,
               CAST(sum(f.n_tokens * f.n_stop) AS HUGEINT) AS sx1x2,
               CAST(sum(f.n_tokens * t.teacher_scaled) AS HUGEINT) AS sx1y,
               CAST(sum(f.n_stop * t.teacher_scaled) AS HUGEINT) AS sx2y
        FROM taught t JOIN feats f USING (doc_id)
    ), dets AS (
        SELECT
            n*(sx1x1*sx2x2 - sx1x2*sx1x2)
              - sx1*(sx1*sx2x2 - sx1x2*sx2)
              + sx2*(sx1*sx1x2 - sx1x1*sx2) AS det,
            sy*(sx1x1*sx2x2 - sx1x2*sx1x2)
              - sx1*(sx1y*sx2x2 - sx1x2*sx2y)
              + sx2*(sx1y*sx1x2 - sx1x1*sx2y) AS det0,
            n*(sx1y*sx2x2 - sx1x2*sx2y)
              - sy*(sx1*sx2x2 - sx1x2*sx2)
              + sx2*(sx1*sx2y - sx1y*sx2) AS det1,
            n*(sx1x1*sx2y - sx1y*sx1x2)
              - sx1*(sx1*sx2y - sx1y*sx2)
              + sy*(sx1*sx1x2 - sx1x1*sx2) AS det2
        FROM m
    ), w AS (
        SELECT CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS w0,
               CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS w1,
               CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS w2
        FROM dets
    )
    SELECT f.doc_id, f.n_tokens, f.n_stop, t.teacher_scaled,
           round(w.w0 + w.w1 * CAST(f.n_tokens AS DOUBLE)
                      + w.w2 * CAST(f.n_stop AS DOUBLE), 6) AS student_score
    FROM feats f
    CROSS JOIN w
    LEFT JOIN taught t USING (doc_id)
"""
