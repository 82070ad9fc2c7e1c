"""pycaim_spark — PySpark-native analytics engine with PyCAIM's capabilities.

A brand-new, idiomatic PySpark engine (DataFrame / Spark SQL / Catalyst /
Structured Streaming) reproducing the data-processing capabilities of the
reference (Morgan243/PyCAIM — the CAIM supervised discretization algorithm,
Kurgan & Cios, IEEE TKDE 16(2), 2004), surrounded by a full relational
operator surface and LLM-data-pipeline operators, designed for 100 TB scale.

NOTE on reference citations: the vendored reference tree at /root/reference
was empty at survey time (SURVEY.md §0), so docstrings cite SURVEY.md §2 rows
and the published CAIM paper instead of reference file:line.

Architecture: the "engine" is a library of operator builders that return
plain ``pyspark.sql.DataFrame`` logical plans — Catalyst is the optimizer and
Tungsten the executor (SURVEY.md §4: zero custom rules needed). Every
operator is registered in :mod:`pycaim_spark.registry` together with an
equivalent ANSI-SQL oracle string for the DuckDB correctness gate.
"""

from pycaim_spark.session import get_spark, configure_session
from pycaim_spark.catalog import TABLES, load_table, load_tables
from pycaim_spark.registry import queries, oracle_sql, REGISTRY

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "configure_session",
    "TABLES",
    "load_table",
    "load_tables",
    "queries",
    "oracle_sql",
    "REGISTRY",
]
