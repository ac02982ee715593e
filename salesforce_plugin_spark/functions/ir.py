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
from pyspark.sql import DataFrame

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
