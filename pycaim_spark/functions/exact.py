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
