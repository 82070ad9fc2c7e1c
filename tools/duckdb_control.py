"""Standalone DuckDB controls on a quiet box (CLAUDE.md r12 measurement
rule: DuckDB controls measured in-process next to heavy Spark activity are
contaminated — in the r12 sf10 sweep the IDENTICAL Q21 SQL read 25.9 s
in-sweep vs 3.45 s standalone). This tool refuses to run while any Spark
JVM is alive, settles to 1-min load < 0.5, and times each registered
query's oracle SQL on its OWN fresh connection (warm + median of 3).

Usage: python tools/duckdb_control.py SF_DIR q1,q2,... [out.json] [key]
Merges {"query": {"duckdb_clean": sec}} under `key` into out.json
(default SCALING_r13.json).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def spark_jvm_alive() -> bool:
    # -x: exact process-name match (a full-cmdline grep matches its own
    # invocation). Local Spark runs as a plain `java` process.
    return subprocess.run(["pgrep", "-x", "java"],
                          capture_output=True).returncode == 0


def settle(limit=0.5, max_wait=900):
    waited = 0
    while os.getloadavg()[0] > limit and waited < max_wait:
        time.sleep(30)
        waited += 30
    print("load at start:", os.getloadavg(), flush=True)


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "SCALING_r13.json")
    key = sys.argv[4] if len(sys.argv) > 4 else "duckdb_clean_controls"

    if spark_jvm_alive():
        raise SystemExit(
            "refusing to measure: a Spark JVM is alive (the r12 "
            "contamination rule — kill it and re-run)")

    from pycaim_spark.parity import duckdb_connection
    from pycaim_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    results = {}
    # Post-settle load, recorded BEFORE any measurement (VERDICT r14 #4:
    # the old artifact carried only an at-END load reading, which for a
    # CPU-saturating sweep is dominated by the sweep's own work — e.g.
    # `duckdb_clean_sf10` read load 5.355 next to a "settled < 0.5" note,
    # inviting a future reader to misjudge the controls as contaminated).
    settle()
    load_start = [round(x, 3) for x in os.getloadavg()]
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            print(f"skip {name}: no oracle", flush=True)
            continue
        settle()
        # Fresh connection per query: no accumulated buffer/GC state from
        # earlier queries in the sweep.
        con = duckdb_connection(sf_dir)
        try:
            con.execute(spec.oracle).fetchall()  # warm
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                runs.append(time.perf_counter() - t0)
            results[name] = {"duckdb_clean": round(sorted(runs)[1], 4),
                             "runs": [round(r, 4) for r in runs]}
        finally:
            con.close()
        print(name, results[name], flush=True)

    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged[key] = {
        "note": ("Standalone DuckDB controls: no Spark JVM alive, 1-min "
                 "load settled < 0.5 before measuring (load_start; "
                 "load_end is AFTER the sweep and includes the sweep's "
                 "own CPU — judge box health by load_start), fresh "
                 "connection per query, warm + median of 3 (CLAUDE.md "
                 "r12 contamination rule)."),
        "sf_dir": sf_dir,
        "load_start": load_start,
        "load_end": [round(x, 3) for x in os.getloadavg()],
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
