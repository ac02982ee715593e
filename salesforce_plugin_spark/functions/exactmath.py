"""Exact integer arithmetic helpers shared by the ppm/ratio operators.

Two facts drive the shape of everything here (both discovered by
measurement, both documented at their first fix sites —
``operators/analytics.zscore_outliers`` and round-5's
``class_balance_from_counts``):

1. Plain BIGINT products of counts/sums overflow once intermediates
   pass 2^63 — under Spark 4's default ANSI mode that KILLS the job
   with ArithmeticException (with ANSI off it wraps silently); either
   way, products of two corpus-scale counts get there long before
   100 TB does. Exact integer-valued DECIMAL(38,0)
   gives 128-bit headroom (HUGEINT on the DuckDB oracle side).
2. Spark's integer-division operator ``div`` MIS-HANDLES decimal
   operands (returns garbage, not an error). The exact floor division
   of non-negative decimals is therefore written as the exact-multiple
   identity ``(a - a % b) / b``: the remainder is exact, the numerator
   becomes an exact multiple of ``b``, and dividing an exact multiple
   is exact in decimal arithmetic regardless of the result scale.
"""

from __future__ import annotations

D38 = "decimal(38,0)"


def dfloor(num_sql: str, den_sql: str) -> str:
    """SQL for exact integral num/den over decimal-typed operands,
    returned as BIGINT. Wrap operands in ``dcast`` first.

    Semantics notes (deliberate, relied upon by callers):

    - For a NEGATIVE numerator this is TRUNCATION toward zero, not a
      mathematical floor — exactly what Spark's integer ``div`` and
      DuckDB's integer ``//`` do, which is what keeps signed ppm
      shares (contribution_analysis) bit-identical cross-engine.
      "Fixing" this to true flooring would silently diverge from both
      engines' integer division.
    - A result past 2^63 fails LOUDLY under Spark's default ANSI mode
      (ArithmeticException at the BIGINT cast; NULL only with ANSI
      off) — never silent garbage either way.
    """
    n, d = f"({num_sql})", f"({den_sql})"
    return f"CAST(({n} - {n} % {d}) / {d} AS BIGINT)"


def dcast(sql: str) -> str:
    """SQL casting an integral expression to exact DECIMAL(38,0)."""
    return f"CAST(({sql}) AS {D38})"


def isqrt_case(p_sql: str, y0_sql: str) -> str:
    """SQL CASE pinning the exact integer sqrt floor from a double
    seed: the seed errs by ≤ 1-2 ulps for p < 2^104, so checking
    y0−2 … y0+2 against p covers every case — any engine replays the
    identical integer regardless of its sqrt rounding (the
    with_exact_cos_ppm / temperature_mix discipline, shareable)."""
    y0, p = f"({y0_sql})", f"({p_sql})"
    return (
        f"CASE WHEN ({y0}+2)*({y0}+2) <= {p} THEN {y0}+2 "
        f"WHEN ({y0}+1)*({y0}+1) <= {p} THEN {y0}+1 "
        f"WHEN {y0}*{y0} <= {p} THEN {y0} "
        f"WHEN ({y0}-1)*({y0}-1) <= {p} THEN {y0}-1 "
        f"ELSE {y0}-2 END"
    )


#: floor(2^(j/8) * 4096) for j = 0..7 — pinned integer thresholds for
#: eighth-of-a-bit log2 resolution (driver-side public math, the
#: ndcg_discounts pinned-constant discipline: no engine evaluates a
#: transcendental inside a gated plan).
LOG2_EIGHTH_THRESHOLDS = [4096, 4466, 4870, 5311, 5792, 6316, 6888, 7512]


def _eighth_case(m3_sql: str) -> str:
    m3 = f"({m3_sql})"
    arms = " ".join(
        f"WHEN {m3} >= {t} THEN {j}"
        for j, t in sorted(
            enumerate(LOG2_EIGHTH_THRESHOLDS), key=lambda p: -p[1]
        )
    )
    return f"CASE {arms} ELSE 0 END"


def log2_eighths_spark(r_sql: str) -> str:
    """Spark SQL for ``floor(8 · log2(r))`` over BIGINT ``r ≥ 1`` —
    integer-only: ``k = bitlen(r) − 1`` gives the whole bits, then the
    normalized mantissa ``m3 = floor(r · 4096 / 2^k) ∈ [4096, 8192)``
    is binned against the pinned 2^(j/8) thresholds for the eighths.
    The mantissa floor loses < 1/4096 relative — the only effect is
    which side of an eighth boundary a value within 0.02% of it lands
    on, identically in both engines. Needs ``r · 4096 < 2^63``
    (r < 2^51 — a probability down to 2^-51 per event, far below any
    LM's floor)."""
    r = f"({r_sql})"
    k = f"(length(bin({r})) - 1)"
    m3 = (
        f"(CASE WHEN {k} >= 12 THEN shiftright({r}, {k} - 12) "
        f"ELSE shiftleft({r}, 12 - {k}) END)"
    )
    return f"(8 * {k} + {_eighth_case(m3)})"


def log2_eighths_duck(r_sql: str) -> str:
    """DuckDB rendering of :func:`log2_eighths_spark` (same pinned
    thresholds, ``>>``/``<<`` shifts) for oracle construction."""
    r = f"({r_sql})"
    k = f"(length(bin({r})) - 1)"
    m3 = (
        f"(CASE WHEN {k} >= 12 THEN {r} >> ({k} - 12) "
        f"ELSE {r} << (12 - {k}) END)"
    )
    return f"(8 * {k} + {_eighth_case(m3)})"
