"""Oracle-stable (cross-engine bit-identical) rounding and aggregation.

Two portability traps this module removes (SURVEY.md §7.4 #4/#7):

1. ``round()`` semantics differ per engine: Spark rounds the *decimal string*
   of a double (HALF_UP on "4.475"), DuckDB rounds the binary value — exact
   ties diverge. ``pround`` instead uses ``floor(x*10^s + 0.5)/10^s``: every
   step is a plain IEEE double op, so any engine computes the identical
   result (regardless of tie philosophy — both run the same formula).
2. Double sums are order-dependent (parallel partials vs sequential scan).
   ``dsum`` quantizes each summand to 1e-6 with ``floor(x*1e6 + 0.5)`` (a
   per-row, order-free, bit-identical op) and sums exact int64 — then
   presents the rounded double. Requires non-negative summands on the 1e-6
   grid-or-finer — true for all fixture money/quantity columns. Int64
   headroom: 1e-6-quantized sums stay exact below ~9.2e12 in value terms —
   far above the bench scale; at larger SF widen to decimal accumulation.

Scale note: both helpers stay inside whole-stage codegen; the quantized sum
is map-side combinable like any integer sum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_Q = 1_000_000  # summand quantization: 1e-6 grid


def pround(col: Column, scale: int = 2) -> Column:
    """Portable round-half-up of a double column (bit-identical in any
    engine running ``floor(x*10^s + 0.5)/10^s``)."""
    m = 10**scale
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(float(m))


def pround_sql(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return f"floor(({expr}) * {m} + 0.5) / {float(m)}"


def _q6(col: Column) -> Column:
    return F.floor(col * F.lit(_Q) + F.lit(0.5)).cast("bigint")


def _q6_sql(expr: str) -> str:
    return f"CAST(floor(({expr}) * {_Q} + 0.5) AS BIGINT)"


def q6_sql(expr: str) -> str:
    """DuckDB rendering of :func:`q6` (the partial/summand form of dsum)."""
    return _q6_sql(expr)


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent, cross-engine-exact sum of a (non-negative) double
    column, rounded to ``scale`` dp and returned as double."""
    return dsum_finalize(F.sum(_q6(col)), scale)


def q6(col: Column) -> Column:
    """Partial form of ``dsum``: the per-row 1e-6-quantized int64 summand.

    Because the quantization is per-row, partial ``sum(q6(x))`` aggregates
    are ASSOCIATIVE — pre-aggregate below a join (e.g. per order key), sum
    the partials above it, and ``dsum_finalize`` the total: bit-identical
    to a single flat ``dsum``, with the join build side shrunk to one row
    per key (two-level aggregation pushdown Catalyst won't do itself)."""
    return _q6(col)


def dsum_finalize(summed_q6: Column, scale: int = 2) -> Column:
    """Round a summed ``q6`` column to ``scale`` dp as double (the final
    step of ``dsum``, split out for two-level aggregation)."""
    div = float(10 ** (6 - scale))
    m = float(10**scale)
    return F.floor(summed_q6.cast("double") / F.lit(div) + F.lit(0.5)) / F.lit(m)


def dsum_sql(expr: str, scale: int = 2) -> str:
    div = float(10 ** (6 - scale))
    m = float(10**scale)
    return (
        f"floor(CAST(sum({_q6_sql(expr)}) AS DOUBLE) / {div} + 0.5) / {m}"
    )


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent mean: exact quantized sum, one double division,
    portable rounding."""
    s6 = F.sum(_q6(col)).cast("double")
    avg = s6 / (F.count(col).cast("double") * F.lit(float(_Q)))
    m = float(10**scale)
    return F.floor(avg * F.lit(m) + F.lit(0.5)) / F.lit(m)


def davg_sql(expr: str, scale: int = 2) -> str:
    m = float(10**scale)
    return (
        f"floor(CAST(sum({_q6_sql(expr)}) AS DOUBLE)"
        f" / (CAST(count({expr}) AS DOUBLE) * {float(_Q)}) * {m} + 0.5) / {m}"
    )
