"""Exact (order-independent) floating aggregate helpers.

Double-precision SUM/AVG over a shuffled dataset is order-dependent: Spark
and DuckDB will disagree in the last few ulps, and at 100 TB even within-
engine reruns disagree. The engine therefore computes every floating
aggregate by exact decimal accumulation and converts to double only at the
very end:

    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)

Decimal addition is associative and commutative, so the result is
bit-identical regardless of partitioning — which is both the correctness
contract with the DuckDB oracle (SURVEY.md §5.1) and the right semantics for
money-typed columns at scale. The fixtures' doubles carry ≤2 fractional
digits (FIXTURES.md), so scale 6 is lossless.

Each helper has a trivially mirrorable SQL spelling, kept adjacent in the
query modules.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

#: Decimal type used for exact accumulation of fixture doubles.
DEC = "decimal(18,6)"

#: Decimal type for *multiplicand* operands: fixture money columns carry at
#: most 2 fractional digits (verified against all sf dirs), and (12,2)
#: operands keep 2- and 3-way products within both engines' 38-digit decimal
#: limit (beyond which DuckDB silently falls back to order-dependent double
#: math while Spark rounds the decimal — the one divergence mode we must
#: avoid).
DEC2 = "decimal(12,2)"


def dec2(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC2)


def _dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, alias: str) -> Column:
    """Exact SUM of a double column, returned as double."""
    return F.sum(_dec(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact AVG = exact decimal SUM / COUNT(*), divided in double space.

    Both engines evaluate double/bigint as IEEE double division of
    identical operands → identical results. (Native AVG would accumulate in
    engine-specific order.) SQL twin:
    ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)``.
    """
    return (F.sum(_dec(col)).cast("double") / F.count(F.lit(1))).alias(alias)


def dmul_sum(expr: Column, alias: str) -> Column:
    """Exact SUM of a decimal product expression, returned as double.

    Caller builds the product in decimal space, e.g.
    ``_dec(price) * (1 - _dec(discount))``.
    """
    return F.sum(expr).cast("double").alias(alias)


# --------------------------------------------------------------------------
# Fixed-point fast path
# --------------------------------------------------------------------------
#
# The decimal helpers above are exact but leave Spark's fast path once a
# SUM's result precision exceeds 18: the aggregation buffer switches from a
# long-backed Decimal to per-row java.math.BigDecimal, and a scan-bound
# aggregate becomes arithmetic-bound (measured: TPC-H Q1's seven decimal
# aggregates add ~8 s over the 1.3 s grouping skeleton at 60 M rows —
# SCALING_r9.json `sweep_headline_noop` vs the pruned-aggregate count()
# row). The fixed-point helpers below compute the SAME values with plain
# long arithmetic — whole-stage-codegen'd, vectorizable — and reconstruct
# the exact decimal only on the handful of post-aggregation rows:
#
#   * a 2-decimal money double becomes integer hundredths via
#     floor(x*100 + 0.5) (the fixtures' money columns carry ≤2 fractional
#     digits, the same assumption DEC2 already documents; see cents() for
#     why not F.round — Spark's Round on double is per-row BigDecimal);
#   * per-row integer products that could overflow a 63-bit SUM are split
#     hi = p div 10^k, lo = p mod 10^k and summed separately — both sums
#     stay far under 2^63;
#   * the group result Σhi + Σlo/10^k is recombined in decimal space on
#     ~|groups| rows, where BigDecimal cost is irrelevant. The decimal
#     division below is EXACT: cast(Σlo as decimal(20,0)) / 10^k yields
#     result scale max(6, p2+1) ≥ k for every k ≤ 6 used here, so no
#     rounding occurs before the single terminal cast to double — the
#     same one-rounding contract as CAST(SUM(decimal) AS DOUBLE).
#
# Bit-identity with the decimal spelling (and therefore with the DuckDB
# oracle) is asserted per group across sf0.01/sf0.1/sf1/sf10 in
# tests/test_aggregates.py.


def cents(col: Column | str, digits: int = 2) -> Column:
    """Integer fixed-point value of a ≤``digits``-decimal double column.

    Computed as ``floor(x·10^d + 0.5)`` — pure double arithmetic plus one
    ``Math.floor``, which codegen keeps register-resident. The obvious
    ``F.round(x·10^d)`` spelling is NOT used because Spark's Round on
    DoubleType allocates a java.math.BigDecimal per row, and that
    dominated the whole flagship aggregation: at sf10 the round-based Q1
    measured a median 2.60 s vs 1.28 s for this form, the floor form
    winning all 4 alternating fresh-JVM paired rounds (ISOLATE_r11.json
    ``q1_cents_paired_series``). Exactness: for a double representing a ≤d-decimal
    value n·10^-d, x·10^d lands within ~1e-9 of the integer n (error
    bound n·2^-52 plus one rounding, ≪ 0.5), so adding 0.5 and flooring
    yields exactly n for any sign; a true half-way point (which floor
    would round toward +∞ but HALF_UP rounds away from zero) would need
    a (d+1)-th decimal digit of 5, excluded by the ≤d-decimal
    precondition this helper already carries. Bit-identity with the
    decimal/oracle spelling stays asserted per group across all sf
    fixtures in tests/test_aggregates.py."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10 ** digits) + F.lit(0.5))


def _exact_div_pow10(long_col: Column, k: int) -> Column:
    """EXACT decimal ``long_col / 10^k`` (see module note on scales)."""
    return long_col.cast("decimal(38,0)") / F.lit(10 ** k).cast(
        f"decimal({k + 1},0)"
    )


def fsum(cents_expr: Column, k: int, alias: str) -> Column:
    """Exact SUM of a fixed-point long expression scaled by 10^k, returned
    as double. The caller guarantees the TOTAL Σ stays below
    2^63−1 ≈ 9.2×10^18 — e.g. per-row values ≤ 10^10 over ≤ 10^8 rows
    (Σ ≤ 10^18). With ANSI mode off an overflowing long SUM wraps
    silently, so products that can push Σ past that bound must go
    through :func:`fsum_split` instead (current call sites top out at
    per-row ~1.1×10^9 over ≤ 6×10^7 rows: Σ ≤ 6.6×10^16)."""
    return _exact_div_pow10(F.sum(cents_expr), k).cast("double").alias(alias)


def fsum_split(prod_expr: Column, k: int, alias: str) -> Column:
    """Exact SUM of a fixed-point product scaled by 10^k whose direct sum
    COULD overflow a long: per-row hi/lo split at 10^k, two long sums,
    exact decimal recombination, one terminal double cast."""
    p = F.lit(10 ** k).cast("long")
    rem = prod_expr % p
    # (prod - rem) is an exact multiple of p and < 2^53, so the IEEE
    # division is exact (the true quotient is representable) — no
    # truncation-boundary risk, unlike floor(prod / p).
    hi = F.sum(((prod_expr - rem) / p).cast("long"))
    lo = F.sum(rem)
    return (
        (hi.cast("decimal(38,6)") + _exact_div_pow10(lo, k))
        .cast("double")
        .alias(alias)
    )


def favg(cents_expr: Column, k: int, alias: str) -> Column:
    """Exact AVG twin of :func:`davg`: exact fixed-point SUM as double,
    divided by COUNT(*) in double space (identical operands → identical
    IEEE result in both engines)."""
    return (
        _exact_div_pow10(F.sum(cents_expr), k).cast("double")
        / F.count(F.lit(1))
    ).alias(alias)
