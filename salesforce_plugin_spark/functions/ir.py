"""Information-retrieval scoring: exact-arithmetic BM25.

BM25 (Robertson/Spärck Jones; the Okapi formulation) is the standard
lexical retrieval scorer a training-data pipeline uses for query-based
corpus selection and eval-set mining. The usual floating formulation
sums per-term partials in whatever order the aggregation tree produces —
order-dependent in the last ulp, so it can never sit under a
cross-engine hash gate (the same failure class as raw double SUMs, see
conformance.py's determinism discipline).

This implementation keeps EVERYTHING integer until one final divide:

- ``k1`` and ``b`` are rationals (defaults 6/5 and 3/4);
- the document-length ratio ``dl/avgdl`` is pre-quantized to
  ``rel_dl = (dl * D * 10^4) div T`` (exact integer division; D docs,
  T total tokens);
- each per-term partial becomes an integer-ratio
  ``num/(den)`` with
  ``num  = (2N - 2df + 1) * tf * (k1n + k1d) * bd * 10^4``
  ``den  = (2df + 1) * (k1d*bd*10^4*tf + k1n*(bd-bn)*10^4 + k1n*bn*rel_dl)``
  (the idf uses the +0.5 smoothing cleared to integers: (N-df+0.5)/(df+0.5)
  = (2N-2df+1)/(2df+1));
- the partial is floor-scaled once: ``part = num*scale div den`` — a
  documented 1/scale quantization — and the per-document score is an
  exact BIGINT sum of those partials, associative under any aggregation
  order; the final ``score`` is one double divide by ``scale``.

Bounds: ``num*scale`` must fit int64 — holds while
``N * tf * scale < ~2*10^13`` (N corpus docs, tf max term frequency) at
the default scale 10^6; lower ``scale`` at larger N.

Plan shape: tokenize once, explode only tokens matching the query terms
(the explode is pre-filtered with ``array_intersect`` gating, so the
exchange carries matched tokens only), one exchange on (doc, term), the
document-frequency and corpus aggregates are tiny broadcast sides, and
the final per-doc sum partial-combines map-side.
"""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from salesforce_plugin_spark.functions.text import tokens


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: Fraction = Fraction(6, 5),
    b: Fraction = Fraction(3, 4),
    scale: int = 10**6,
) -> DataFrame:
    """Exact-arithmetic BM25 of ``terms`` against every document holding
    at least one of them. Output (scalar-only):
    ``(id, n_terms int, score_scaled long, score double)`` where
    ``score_scaled`` is the exact integer sum of floor-scaled partials
    and ``score = score_scaled / scale`` (one double divide).
    """
    if not terms:
        raise ValueError("bm25_scores requires at least one query term")
    terms_l = sorted({t.lower() for t in terms})
    k1n, k1d = k1.numerator, k1.denominator
    bn, bd = b.numerator, b.denominator
    q = 10**4  # rel_dl quantization

    toked = df.select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)), F.lower).alias("__toks"),
    )
    lens = toked.select(
        F.col(id_col), F.size(F.col("__toks")).cast("long").alias("__dl")
    )
    corpus = lens.agg(
        F.count(F.lit(1)).alias("__D"), F.sum("__dl").alias("__T")
    )

    term_arr = F.array(*[F.lit(t) for t in terms_l])
    hits = toked.select(
        F.col(id_col),
        F.explode(
            F.filter(F.col("__toks"), lambda t: F.array_contains(term_arr, t))
        ).alias("__term"),
    )
    tf = hits.groupBy(id_col, "__term").agg(
        F.count(F.lit(1)).cast("long").alias("__tf")
    )
    dfreq = tf.groupBy("__term").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )

    joined = (
        tf.join(lens, id_col)
        .join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(corpus))
    )
    rel_dl = F.expr(f"(__dl * __D * {q}) div __T")
    num = (
        (2 * F.col("__D") - 2 * F.col("__df") + 1)
        * F.col("__tf")
        * F.lit((k1n + k1d) * bd * q)
    )
    den = (2 * F.col("__df") + 1) * (
        F.lit(k1d * bd * q) * F.col("__tf")
        + F.lit(k1n * (bd - bn) * q)
        + F.lit(k1n * bn) * F.col("__rel_dl")
    )
    # integer floor divide via `div` (both operands positive BIGINTs)
    part = (
        joined.withColumn("__rel_dl", rel_dl)
        .withColumn("__num", num * F.lit(scale))
        .withColumn("__den", den)
        .select(F.col(id_col), F.expr("__num div __den").alias("__part"))
    )
    return (
        part.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms"),
            F.sum("__part").alias("score_scaled"),
        )
        .withColumn(
            "score", F.col("score_scaled").cast("double") / F.lit(float(scale))
        )
    )


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str,
    k0: int = 60,
    scale: int = 10**9,
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) — the standard
    way hybrid retrieval combines a lexical (BM25) and a semantic
    (embedding) ranking without score calibration:

        rrf(d) = Σ_lists 1 / (k0 + rank_list(d))

    Each input is ``(name, df)`` where ``df`` holds ``(id_col, rank)``
    with ranks 1-based and deterministic. The fraction is floor-scaled to
    an integer ONCE per list membership — ``floor(scale / (k0 + rank))``
    — so the fused score is an exact BIGINT sum, associative under any
    aggregation order and bit-replayable cross-engine (float RRF sums
    would drift in the last ulp with aggregation order). A document
    missing from a list contributes 0 (standard RRF over truncated
    lists).

    Plan: union the (small, already-truncated) ranked lists with a
    source tag, ONE partial-combined exchange on the id, then a
    single-task window over ≤ Σ|lists| rows for the final rank — every
    stage is bounded by the list sizes, never the corpus.

    Output (scalar-only): ``(id_col, rank_<name> int nullable per list,
    rrf_scaled long, fused_rank int)``, fused rank by (rrf_scaled desc,
    id asc); ``top_n`` truncates if given.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    names = [n for n, _ in rankings]
    if len(set(names)) != len(names):
        raise ValueError("ranking names must be unique")
    tagged = None
    for name, df in rankings:
        t = df.select(
            F.col(id_col),
            F.lit(name).alias("__src"),
            F.col("rank").cast("int").alias("__rank"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    per_list = [
        F.min(F.when(F.col("__src") == n, F.col("__rank"))).alias(f"rank_{n}")
        for n in names
    ]
    contrib = F.expr(f"{scale} div ({k0} + __rank)")
    fused = tagged.groupBy(id_col).agg(
        *per_list, F.sum(contrib).alias("rrf_scaled")
    )
    w = Window.orderBy(F.col("rrf_scaled").desc(), F.col(id_col))
    out = fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
    if top_n is not None:
        out = out.filter(F.col("fused_rank") <= top_n)
    return out


def ranked(
    df: DataFrame, id_col: str, order_by: list, top_n: int
) -> DataFrame:
    """Attach a deterministic 1-based ``rank`` by ``order_by`` (include
    a unique tiebreaker column last) and truncate to ``top_n`` — the
    normalization step before :func:`rrf_fuse`. Single-task window over
    the candidate set; callers reduce to a bounded candidate set first
    (top-k retrieval output, not a corpus)."""
    from pyspark.sql import Window as _W

    w = _W.orderBy(*order_by)
    return (
        df.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select(F.col(id_col), F.col("rank"))
    )


def rerank_interaction(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    idf_q: int = 10**4,
    sat_q: int = 1000,
) -> DataFrame:
    """Second-stage reranking of a bounded first-stage candidate list —
    the two-stage retrieval shape production rankers use (cheap
    corpus-wide recall stage, expensive per-pair precision stage over
    the top-k only). The per-pair scorer here is a DETERMINISTIC
    integer late-interaction proxy; a learned cross-encoder would slot
    into exactly this seam as an Arrow ``mapInPandas`` stage over the
    same (candidate, document) rows — the plumbing this function gates
    (candidate-bounded text join, corpus-stat broadcast, rerank window
    over ≤ |candidates| rows) is the production plan either way.

    Score (exact BIGINT, oracle-replayable):

        score = Σ_{t ∈ terms ∩ doc}  idf_scaled(t) · sat(tf_t)
        idf_scaled = (2N − 2df + 1)·idf_q div (2df + 1)   (BM25's
            +half-smoothed idf cleared to integers, the bm25_scores
            discipline)
        sat(tf) = tf·sat_q div (tf + 1)                    (saturating
            term frequency in [0, sat_q))

    Document-frequency/N come from the full corpus (broadcast, one
    bounded exchange); per-candidate term frequencies tokenize ONLY
    the candidate-joined documents.

    Output (scalar-only): ``(id_col, n_hit int, rerank_scaled long,
    rerank int)`` — every candidate appears (no-hit candidates score
    0), rerank by (rerank_scaled desc, id asc).
    """
    if not terms:
        raise ValueError("rerank_interaction requires at least one term")
    terms_l = sorted({t.lower() for t in terms})
    term_arr = F.array(*[F.lit(t) for t in terms_l])

    cand_ids = candidates.select(F.col(id_col)).distinct()
    cand_toked = df.join(F.broadcast(cand_ids), id_col).select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)), F.lower).alias("__toks"),
    )
    tf = (
        cand_toked.select(
            F.col(id_col),
            F.explode(
                F.filter(
                    F.col("__toks"), lambda t: F.array_contains(term_arr, t)
                )
            ).alias("__term"),
        )
        .groupBy(id_col, "__term")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    # corpus stats: df = docs containing the term at least once, N = |corpus|
    corpus_toked = df.select(
        F.transform(tokens(F.col(text_col)), F.lower).alias("__toks")
    )
    dfreq = (
        corpus_toked.select(
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.col("__toks"),
                        lambda t: F.array_contains(term_arr, t),
                    )
                )
            ).alias("__term")
        )
        .groupBy("__term")
        .agg(F.count(F.lit(1)).cast("long").alias("__df"))
    )
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("__N"))

    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.expr(
                f"((2 * __N - 2 * __df + 1) * {idf_q} div (2 * __df + 1))"
                f" * (__tf * {sat_q} div (__tf + 1))"
            ).alias("__part"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_hit"),
            F.sum("__part").cast("long").alias("rerank_scaled"),
        )
    )
    out = cand_ids.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("int").alias("n_hit"),
        F.coalesce(F.col("rerank_scaled"), F.lit(0))
        .cast("long")
        .alias("rerank_scaled"),
    )
    w = Window.orderBy(F.col("rerank_scaled").desc(), F.col(id_col))
    return out.withColumn("rerank", F.row_number().over(w).cast("int"))


def positional_ce_scorer(texts, terms: list[str], max_len: int):
    """Default pair scorer for :func:`rerank_cross_encoder` — a
    deterministic stand-in with a real cross-encoder's SHAPE (truncated
    token window, per-pair score from query-document interaction) but
    integer, library-free semantics the DuckDB oracle can replay:

    - tokenize like ``functions.text.tokens`` (split trimmed text on
      ASCII ``\\s+``), lowercase, truncate to the first ``max_len``
      tokens (the model's context window);
    - each query term contributes ``max_len − p + 1`` where ``p`` is
      its first 1-based position inside the window (0 if absent) —
      early mentions score higher, the positional-attention proxy;
    - ``ce_scaled`` is the contribution sum, ``n_hit`` the number of
      matched terms.

    Signature contract for injected replacements (the learned-model
    seam, same discipline as the multimodal decoder seam): take
    ``(texts: list[str], terms, max_len)``, return ``(hits, scores)``
    as equal-length integer lists. A real ONNX/torch cross-encoder
    slots in by batching ``texts`` through the model instead.
    """
    import re

    ws = re.compile(r"\s+", re.ASCII)  # Java-regex \s is ASCII-only
    hits, scores = [], []
    for text in texts:
        toks = [
            t.lower() for t in ws.split((text or "").strip())[:max_len]
        ]
        h = s = 0
        for t in terms:
            try:
                p = toks.index(t) + 1
            except ValueError:
                continue
            h += 1
            s += max_len - p + 1
        hits.append(h)
        scores.append(s)
    return hits, scores


def rerank_cross_encoder(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    max_len: int = 64,
    scorer=None,
) -> DataFrame:
    """Second-stage reranking through the Arrow ``mapInPandas`` seam
    :func:`rerank_interaction` documents — the plumbing a learned
    cross-encoder needs, exercised for real: candidate-bounded text
    join (broadcast of the first-stage ids, so only |candidates| texts
    ever reach Python), Arrow-batched transfer into the scorer, and a
    ≤ |candidates|-row rerank window. ``scorer`` defaults to
    :func:`positional_ce_scorer` (deterministic, oracle-replayable);
    inject the real model scorer in production — the Spark plan is
    identical either way, which is the point of gating the seam.

    Output (scalar-only): ``(id_col, n_hit int, ce_scaled long,
    ce_rank int)``; every candidate appears (absent terms score 0),
    rank by (ce_scaled desc, id asc).
    """
    if not terms:
        raise ValueError("rerank_cross_encoder requires at least one term")
    if max_len < 1:
        raise ValueError("rerank_cross_encoder requires max_len >= 1")
    terms_l = sorted({t.lower() for t in terms})
    sc = scorer or positional_ce_scorer

    cand_ids = candidates.select(F.col(id_col)).distinct()
    pairs = df.join(F.broadcast(cand_ids), id_col).select(
        F.col(id_col), F.col(text_col)
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            h, s = sc(pdf[text_col].fillna("").tolist(), terms_l, max_len)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_hit": h, "ce_scaled": s}
            )

    scored = pairs.mapInPandas(
        run, schema=f"{id_col} long, n_hit int, ce_scaled long"
    )
    w = Window.orderBy(F.col("ce_scaled").desc(), F.col(id_col))
    return scored.select(
        F.col(id_col),
        F.col("n_hit").cast("int").alias("n_hit"),
        F.col("ce_scaled").cast("long").alias("ce_scaled"),
    ).withColumn("ce_rank", F.row_number().over(w).cast("int"))


def default_quality_teacher(texts: list) -> list:
    """Deterministic stand-in for a learned quality model: lexical
    diversity as ``floor(10^6 · distinct_tokens / n_tokens)`` over
    whitespace-lowered tokens (empty text scores 0). Integer-exact, so
    an oracle can replay it; inject the real model in production — the
    Spark plan (Arrow batching, sample gating, fit, broadcast scoring)
    is identical either way, which is what the seam gates."""
    out = []
    for text in texts:
        toks = (text or "").lower().split()
        out.append(0 if not toks else (10**6 * len(set(toks))) // len(toks))
    return out


def _teacher_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    teacher=None,
    sample_mod: int = 4,
) -> DataFrame:
    """``(id, __y)`` teacher scores over the deterministic
    ``id % sample_mod == 0`` sample through the Arrow ``mapInPandas``
    seam — factored out so :func:`distill_quality` can run the Python
    teacher ONCE and feed both the fit and the apply side."""
    teach = teacher or default_quality_teacher
    sample = df.filter((F.col(id_col) % sample_mod) == 0).select(
        F.col(id_col), F.col(text_col)
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            y = teach(pdf[text_col].fillna("").tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "__y": y})

    return sample.mapInPandas(run, schema=f"{id_col} long, __y long")


def fit_quality_student(
    df: DataFrame,
    id_col: str,
    text_col: str,
    teacher=None,
    sample_mod: int = 4,
    taught: DataFrame | None = None,
) -> dict:
    """Distill a teacher quality scorer into a 2-feature linear student
    (VERDICT r7 #7, the distillation half): run the (expensive) teacher
    on the deterministic sample ``id % sample_mod == 0`` through the
    Arrow ``mapInPandas`` seam, then fit
    ``teacher ≈ w0 + w1·n_tokens + w2·n_stopwords`` by exact normal
    equations: every moment (Σx, Σx², Σxy, …) is a DECIMAL(38,0) sum of
    per-row products of integer features — exact and associative, so
    Spark's partial/final aggregation order cannot diverge from a
    sequential scan — and the 3×3 Cramer solve runs on exact Python
    ints from the collected 1-row aggregate (same driver-side pattern
    as operators/validate.py's 1-row collect; the fit state is 9
    numbers, not data). Weights become plan literals via one
    int→double conversion per determinant ratio.

    ``taught`` may carry a precomputed teacher-row table (the r11
    optimization: distill_quality runs the teacher once and shares it
    between fit and apply). CONTRACT (ADVICE r11): it must have been
    built with the SAME ``sample_mod`` predicate, i.e. ``taught`` ⊆
    ``{id % sample_mod == 0}`` — the feature scan below pre-filters
    with that predicate before the inner join, so taught rows with ids
    outside it are silently dropped from the fit. Callers passing a
    custom ``taught`` from a different sample must pass the matching
    ``sample_mod``.

    Returns ``{"w0","w1","w2"}`` (floats) plus the exact integer
    moments under ``"moments"``. Raises on a singular design (constant
    features on the sample) — loud, not a silent pseudo-inverse.

    Scale: the teacher touches |corpus|/sample_mod rows (raise
    ``sample_mod`` at scale — the fit needs a statistical sample, not
    the corpus); everything after the 1-row collect is a broadcast
    literal. Moment magnitudes are bounded by sample size × feature
    ranges; DECIMAL(38,0) holds through ~10^12-row samples at 10^3
    token counts and 10^6-scaled teacher scores — cap the sample far
    below that.
    """
    from salesforce_plugin_spark.functions.text import stopword_count, token_count

    if taught is None:
        taught = _teacher_rows(df, id_col, text_col, teacher, sample_mod)
    # the inner join below keeps only the taught (sample) ids, so the
    # feature regex scan may pre-filter with the SAME deterministic
    # sample predicate — identical join result, 1/sample_mod of the
    # regex work
    feats = df.filter((F.col(id_col) % sample_mod) == 0).select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("__x1"),
        stopword_count(F.col(text_col)).cast("long").alias("__x2"),
    )
    d38 = "decimal(38,0)"
    j = taught.join(feats, id_col)
    x1 = F.col("__x1").cast(d38)
    x2 = F.col("__x2").cast(d38)
    y = F.col("__y").cast(d38)
    row = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx1x1"),
        F.sum(x2 * x2).alias("sx2x2"),
        F.sum(x1 * x2).alias("sx1x2"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
    ).collect()[0]
    if row["n"] == 0:
        # the sums are all NULL here; int(None) would raise an opaque
        # TypeError long before the singular-design guard
        raise ValueError(
            f"fit_quality_student: empty teacher sample (no rows with "
            f"{id_col} % {sample_mod} == 0, or empty input) - lower "
            "sample_mod or check the corpus"
        )
    m = {k: int(row[k]) for k in row.asDict()}
    return _solve_student(m)


def _solve_student(m: dict) -> dict:
    """Cramer's rule on the exact integer moments — shared by the batch
    fit and the streamed-moments face (the moments are additive, so a
    replay-idempotent additive fold maintains them exactly)."""
    n, sx1, sx2, sy = m["n"], m["sx1"], m["sx2"], m["sy"]
    sx1x1, sx2x2, sx1x2 = m["sx1x1"], m["sx2x2"], m["sx1x2"]
    sx1y, sx2y = m["sx1y"], m["sx2y"]
    # normal equations [[n,sx1,sx2],[sx1,sx1x1,sx1x2],[sx2,sx1x2,sx2x2]]
    # · [w0,w1,w2] = [sy,sx1y,sx2y]; Cramer on exact ints
    det = (
        n * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
        - sx1 * (sx1 * sx2x2 - sx1x2 * sx2)
        + sx2 * (sx1 * sx1x2 - sx1x1 * sx2)
    )
    if det == 0:
        raise ValueError(
            "fit_quality_student: singular normal equations (constant "
            "features on the sample) - widen the sample or drop a feature"
        )
    det0 = (
        sy * (sx1x1 * sx2x2 - sx1x2 * sx1x2)
        - sx1 * (sx1y * sx2x2 - sx1x2 * sx2y)
        + sx2 * (sx1y * sx1x2 - sx1x1 * sx2y)
    )
    det1 = (
        n * (sx1y * sx2x2 - sx1x2 * sx2y)
        - sy * (sx1 * sx2x2 - sx1x2 * sx2)
        + sx2 * (sx1 * sx2y - sx1y * sx2)
    )
    det2 = (
        n * (sx1x1 * sx2y - sx1y * sx1x2)
        - sx1 * (sx1 * sx2y - sx1y * sx2)
        + sy * (sx1 * sx1x2 - sx1x1 * sx2)
    )
    return {
        "w0": float(det0) / float(det),
        "w1": float(det1) / float(det),
        "w2": float(det2) / float(det),
        "moments": m,
    }


def distill_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    teacher=None,
    sample_mod: int = 4,
) -> DataFrame:
    """Apply the distilled student corpus-wide: fit on the sample (see
    :func:`fit_quality_student`), then score EVERY document JVM-side
    with the broadcast literal weights — the teacher's Python cost is
    paid on 1/sample_mod of the corpus, the student is pure codegen.

    Output (scalar-only): ``(id, n_tokens long, n_stop long,
    teacher_scaled long|null — sample rows only, student_score double
    rounded 6dp)``.
    """
    # run the Python teacher ONCE: the fit's 1-row collect and the
    # apply-side left join both consume the same (id, __y) sample
    # table, so without a lineage cut the Arrow teacher boundary paid
    # twice per run (guide §4/§5 — the rows are two longs each)
    taught = _teacher_rows(
        df, id_col, text_col, teacher, sample_mod
    ).localCheckpoint(eager=False)
    w = fit_quality_student(
        df, id_col, text_col, teacher, sample_mod, taught=taught
    )
    return apply_student(
        df, id_col, text_col, w, teacher, sample_mod, taught=taught
    )


def apply_student(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: dict,
    teacher=None,
    sample_mod: int = 4,
    taught: DataFrame | None = None,
) -> DataFrame:
    """Score the corpus with fitted weights (shared by the batch
    operator and the streamed-moments face, so their outputs are the
    same plan over the same literals by construction)."""
    from salesforce_plugin_spark.functions.text import stopword_count, token_count

    if taught is None:
        taught = _teacher_rows(df, id_col, text_col, teacher, sample_mod)
    feats = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        stopword_count(F.col(text_col)).cast("long").alias("n_stop"),
    )
    score = (
        F.lit(w["w0"])
        + F.lit(w["w1"]) * F.col("n_tokens").cast("double")
        + F.lit(w["w2"]) * F.col("n_stop").cast("double")
    )
    return (
        feats.join(taught, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("n_stop"),
            F.col("__y").alias("teacher_scaled"),
            F.round(score, 6).alias("student_score"),
        )
    )


def quality_moment_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    teacher=None,
    sample_mod: int = 4,
) -> DataFrame:
    """Per-sample-row moment terms as LONG columns — the streamed form
    of :func:`fit_quality_student`'s aggregate: the normal-equation
    moments are plain sums of these rows, so the generic additive fold
    (replay-idempotent ``__b=`` partitions) maintains the fit state
    exactly. Per-row products must fit int64 (|x|·|y| < 2^63 — holds
    for any real document: 10^6-scaled teacher × 10^12 tokens); the
    SUMS are what grow with corpus size, and the fold's BIGINT addition
    bounds them the same way the batch DECIMAL(38,0) path does."""
    teach = teacher or default_quality_teacher
    from salesforce_plugin_spark.functions.text import stopword_count, token_count

    def run(batches):
        import pandas as pd

        for pdf in batches:
            y = teach(pdf[text_col].fillna("").tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "__y": y})

    sample = df.filter((F.col(id_col) % sample_mod) == 0)
    taught = sample.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, schema=f"{id_col} long, __y long"
    )
    feats = sample.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("__x1"),
        stopword_count(F.col(text_col)).cast("long").alias("__x2"),
    )
    x1, x2, y = F.col("__x1"), F.col("__x2"), F.col("__y")
    return taught.join(feats, id_col).select(
        F.lit(1).alias("g"),
        x1.alias("x1"),
        x2.alias("x2"),
        y.alias("y"),
        (x1 * x1).alias("x1x1"),
        (x2 * x2).alias("x2x2"),
        (x1 * x2).alias("x1x2"),
        (x1 * y).alias("x1y"),
        (x2 * y).alias("x2y"),
    )
