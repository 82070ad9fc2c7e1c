"""CAIM supervised discretization (Kurgan & Cios, IEEE TKDE 16(2), 2004).

The reference repo's core capability (SURVEY.md §2.A; the vendored tree was
empty, so this derives from the published paper — no file:line citations are
possible).

Three layers:

- :mod:`.reference` — paper-literal naive implementation (loops, raw rows).
  The correctness oracle for everything else; never used at scale.
- :mod:`.core` — vectorized greedy over a (value, class)-count histogram.
  Shared verbatim by the driver-side fit and the Spark per-feature workers.
- :mod:`.estimator` — Spark MLlib ``Estimator``/``Model`` pipeline stage
  (the driver's mandated approach, BASELINE.json:7): histogram
  pre-aggregation in Spark, per-feature greedy via ``applyInPandas``.
"""

from pycaim_spark.operators.caim.core import caim_greedy, caim_value, bucketize_value
from pycaim_spark.operators.caim.reference import naive_caim_fit
from pycaim_spark.operators.caim.estimator import CaimDiscretizer, CaimDiscretizerModel

__all__ = [
    "caim_greedy",
    "caim_value",
    "bucketize_value",
    "naive_caim_fit",
    "CaimDiscretizer",
    "CaimDiscretizerModel",
]
