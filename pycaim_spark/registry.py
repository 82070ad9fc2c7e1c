"""Query registry: the SURVEY.md §2 operator contract, executable.

Every operator the engine claims is registered here as a
``QuerySpec(name, fn, oracle)`` pair:

- ``fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation (the
  engine under test).
- ``oracle`` — an equivalent ANSI-SQL string DuckDB runs on the same parquet
  (views pre-registered by the driver); ``None`` marks a rows-only check for
  genuinely non-SQL-expressible ops (iterative CAIM fit, approx/seeded
  algorithms, streaming, sinks) — each such spec carries a
  ``rows_only_reason``.

Determinism contract between the two sides (SURVEY.md §5.1):

- Alias every computed column identically on both sides (the driver sorts
  columns by NAME before hashing).
- Float aggregates use exact decimal accumulation on BOTH sides —
  ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`` — so results are
  bit-identical regardless of partitioning/row order, with no dependence on
  rounding luck. ``pycaim_spark.functions.exact`` holds the helpers.
- No nondeterministic keeper semantics (``dropDuplicates`` picks an
  arbitrary row): dedup queries aggregate with min/max instead.
- Timestamps are µs-precision naive (UTC session timezone); arrays in
  output are sorted and joined to strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    rows_only_reason: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    rows_only_reason: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query + its DuckDB oracle twin."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        if oracle is None and rows_only_reason is None:
            raise ValueError(f"{name}: rows-only queries must state a reason")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
            rows_only_reason=rows_only_reason,
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    """Import all query modules (registration happens at import time)."""
    import pycaim_spark.queries  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
