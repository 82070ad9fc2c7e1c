"""Dump `.explain("formatted")` for named queries into plans/r<N>/ files.

Optimization-round deliverable (OPTIMIZATION_r18.md): the judge cannot run
Spark, so every plan claim must be checkable against a committed
`plans/r18/<query>_{before,after}.txt`. Uses the same static-plan session
as tools/gen_plans_md.py (AQE off so the concrete plan with codegen span
ids is visible, no cached tables).

Usage: python tools/dump_plans.py SUFFIX QUERY [QUERY ...]
       python tools/dump_plans.py before tpch_q3 dedup_minhash
writes plans/r18/tpch_q3_before.txt etc.  $PYCAIM_PLANS_DIR overrides the
output directory (default plans/r18).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pycaim_spark.planaudit import plan_string  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _session():
    from pyspark.sql import SparkSession

    from pycaim_spark.session import configure_session

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PYCAIM_DRIVER_MEM", "8g"))
        .appName("pycaim-plan-dump")
        .getOrCreate()
    )
    configure_session(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return spark


def main() -> None:
    from pycaim_spark.registry import REGISTRY, _ensure_loaded

    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.environ.get(
        "PYCAIM_PLANS_DIR", os.path.join(REPO, "plans", "r18")
    )
    os.makedirs(out_dir, exist_ok=True)
    _ensure_loaded()
    spark = _session()
    for name in names:
        fn = REGISTRY[name].fn
        df = fn(spark, SF_DIR)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan_string(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
