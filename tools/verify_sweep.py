"""Driver-contract verification sweep (the CLAUDE.md verify recipe).

Drives __spark_entry__.py the way the correctness driver does: a PLAIN
SparkSession (none of our confs — catches worker-import and runtime-conf
bugs pytest cannot), entry() smoke, then every queries() entry compared
against its DuckDB oracle at sf0.01 plus a non-empty probe at sf0.001
(domain coverage shifts with scale; CLAUDE.md invariant).

Run from OUTSIDE the repo so path assumptions surface:

    cd /tmp && python /root/repo/tools/verify_sweep.py

Exit status 0 iff every query passes both gates.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ORACLE_SF = os.environ.get("PYCAIM_VERIFY_SF", "/root/testdata/sf0.01")
NONEMPTY_SF = os.environ.get("PYCAIM_VERIFY_SMALL_SF", "/root/testdata/sf0.001")


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from pycaim_spark.parity import compare

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry() returned 0 rows"
    print(f"entry ok: {len(rows)} rows", flush=True)

    qs = e.queries()
    fails: list[tuple[str, str]] = []
    t0 = time.time()
    for i, name in enumerate(sorted(qs)):
        try:
            rep = compare(spark, name, ORACLE_SF)
            if not rep.ok:
                fails.append((name, rep.detail))
            elif rep.spark_rows == 0:
                fails.append((name, f"EMPTY at {ORACLE_SF}"))
        except Exception as ex:
            fails.append((name, f"EXC {type(ex).__name__}: {ex}"))
        if (i + 1) % 25 == 0:
            print(f"  {i + 1}/{len(qs)} ({time.time() - t0:.0f}s)", flush=True)
    print(f"{ORACLE_SF} sweep: {len(qs) - len(fails)}/{len(qs)} ok "
          f"in {time.time() - t0:.0f}s")
    for name, detail in fails:
        print(f"  FAIL {name}: {str(detail)[:200]}")

    t0 = time.time()
    empty: list[str] = []
    for name in sorted(qs):
        try:
            if qs[name](spark, NONEMPTY_SF).count() == 0:
                empty.append(name)
        except Exception as ex:
            empty.append(f"{name} EXC {type(ex).__name__}")
    print(f"{NONEMPTY_SF} non-empty probe in {time.time() - t0:.0f}s; "
          f"empties: {empty}")
    return 1 if fails or empty else 0


if __name__ == "__main__":
    sys.exit(main())
