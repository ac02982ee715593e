"""Vector math over ``array<float>`` embedding columns — pure column
expressions (JVM-side, whole-stage codegen), no Python UDFs in the hot path.

Determinism contract: embeddings are cast element-wise to double *first* (an
exact widening), then dot products fold sequentially in array order — the same
evaluation order a scalar loop uses, which is what keeps results reproducible
across engines and runs. Every op here is embarrassingly parallel per-row, so
the operators scale with the scan; only top-k adds a (tiny, k-bounded) shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def as_double(vec: Column | str) -> Column:
    """Exact float→double widening of an array column."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: products first (each rounded to double),
    then left-to-right summation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int,
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k: the baseline similarity search (SURVEY §2 F3).

    ``query_df`` must contain exactly one row with a ``q_vec`` array column; it
    is broadcast, so the scan side never shuffles — the only exchange is the
    k-row ``TakeOrderedAndProject``. This is the shape that survives 100 TB:
    one pass over the candidates, no pairwise materialization. Similarity is
    rounded before ranking so the ordering is stable under float noise; ties
    break on the id.
    """
    sim = F.round(cosine(as_double(F.col(vec_col)), as_double(F.col("q_vec"))), round_digits)
    return (
        df.crossJoin(F.broadcast(query_df))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """LSH-style bucket id from the sign pattern of the first ``bits`` dims.

    The scale path for ANN search: bucket both sides, then search only within
    the query's bucket — turns an O(N) scan into an O(N/2^bits) one at some
    recall cost. Deterministic and engine-portable (no hashing involved).
    """
    acc = F.lit(0)
    for i in range(bits):
        acc = acc + F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc
