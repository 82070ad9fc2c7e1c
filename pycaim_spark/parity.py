"""Local DuckDB-parity harness mirroring the driver's correctness gate.

The driver runs each ``queries()[name]`` (PySpark) and ``oracle_sql()[name]``
(DuckDB, views pre-registered over the same parquet) and compares row-count +
schema + order-insensitive value-hash. This module reproduces that check
locally so every operator lands green before the driver sees it.

Canonicalization before comparison (both sides identically):

- columns sorted by name (the driver hashes on name-sorted columns),
- doubles kept as-is — the exact-decimal policy makes them bit-identical,
- timestamps rendered to ISO strings at µs precision,
- rows sorted by their full string rendering (order-insensitive).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from pycaim_spark.catalog import TABLES


@dataclass
class ParityReport:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with fixture views registered like the driver's."""
    con = duckdb.connect()
    for table in TABLES:
        path = os.path.join(sf_dir, f"{table}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {table} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        # repr keeps full precision; exact-decimal policy makes both sides
        # bit-identical, so no rounding is applied here on purpose: any
        # difference is a real bug to fix at the query level.
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare(spark, name: str, sf_dir: str) -> ParityReport:
    """Run one registered query against its oracle and diff canonical rows."""
    from pycaim_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        ok = len(sdf) >= 0  # rows-only: smoke that it executes
        return ParityReport(name, ok, len(sdf), -1, f"rows-only: {spec.rows_only_reason}")
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(spec.oracle).df()
    finally:
        con.close()
    detail = []
    if len(sdf) != len(odf):
        detail.append(f"row count {len(sdf)} != {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        detail.append(f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}")
    if not detail:
        s_rows, o_rows = canonicalize(sdf), canonicalize(odf)
        if s_rows != o_rows:
            diffs = [
                f"  spark={s}\n  oracle={o}"
                for s, o in zip(s_rows, o_rows)
                if s != o
            ][:5]
            detail.append("value mismatch:\n" + "\n".join(diffs))
    return ParityReport(
        name, not detail, len(sdf), len(odf), "; ".join(detail)
    )
