"""Oracle-parity gate: every registered query must match DuckDB at sf0.001.

Mirrors the driver's t2 check (which runs at sf0.01); sf0.001 keeps the
local loop fast. Rows-only queries are smoke-executed.
"""

from __future__ import annotations

import pytest

from pycaim_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    from pycaim_spark.parity import compare

    report = compare(spark, name, sf_dir)
    assert report.ok, f"{name}: {report.detail}"
    if REGISTRY[name].oracle is not None:
        assert report.spark_rows > 0, f"{name}: empty result weakens the check"
