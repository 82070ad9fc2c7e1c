"""Reusable column-expression helpers (engine "scalar function" layer)."""

from pycaim_spark.functions.exact import dsum, davg, dmul_sum, dec2, DEC, DEC2

__all__ = ["dsum", "davg", "dmul_sum", "dec2", "DEC", "DEC2"]
