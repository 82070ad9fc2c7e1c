"""agg_hash sf10 knob table (VERDICT r7 item 6): measure the TPC-H Q1
aggregate at sf10 under the isolate protocol across Spark conf knobs, plus
the DuckDB control on the same box, and write the evidence JSON.

Usage: python tools/knob_table.py [sf_dir] [out.json]
Defaults: .scratch/sf10, KNOBS_r8.json
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

#: label -> extra env for the isolate child
KNOBS: dict[str, dict[str, str]] = {
    "baseline_auto_splits": {},
    "splits_128m": {"PYCAIM_MAX_PARTITION_BYTES": "134217728"},
    "splits_32m": {"PYCAIM_MAX_PARTITION_BYTES": "33554432"},
    "offheap_4g": {
        "PYCAIM_EXTRA_CONFS": "spark.memory.offHeap.enabled=true;"
        "spark.memory.offHeap.size=4g"
    },
    "vectorized_reader_off": {
        "PYCAIM_EXTRA_CONFS": "spark.sql.parquet.enableVectorizedReader=false"
    },
    "no_cache_direct_scan": {"PYCAIM_BENCH_NO_CACHE": "1"},
    "shuffle_parts_8": {
        "PYCAIM_EXTRA_CONFS": "spark.sql.shuffle.partitions=8"
    },
}


def duckdb_control(sf_dir: str) -> float:
    import duckdb

    sys.path.insert(0, REPO)
    from pycaim_spark.parity import duckdb_connection
    from pycaim_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    con = duckdb_connection(sf_dir)
    oracle = REGISTRY["agg_hash"].oracle
    try:
        con.execute(oracle).fetchall()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            runs.append(time.perf_counter() - t0)
        return round(statistics.median(runs), 4)
    finally:
        con.close()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sf10"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "KNOBS_r8.json"
    )
    duck = duckdb_control(sf_dir)
    print(f"duckdb control: {duck}s", flush=True)
    results: dict[str, dict] = {}
    for label, env_extra in KNOBS.items():
        env = {**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir, **env_extra}
        proc = subprocess.run(
            [sys.executable, BENCH, "--isolate", "agg_hash", "--n", "3"],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        line = proc.stdout.strip().rsplit("\n", 1)[-1] if proc.stdout else ""
        try:
            sec = json.loads(line)["queries"]["agg_hash"]
        except (ValueError, KeyError):
            print(f"{label}: FAILED\n{proc.stderr[-1500:]}", file=sys.stderr)
            continue
        results[label] = {
            "env": env_extra, "spark_sec": sec,
            "ratio_vs_duckdb": round(sec / duck, 2),
        }
        print(f"{label}: {sec}s ({results[label]['ratio_vs_duckdb']}x)",
              flush=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "query": "agg_hash",
                "sf_dir": sf_dir,
                "protocol": "bench.py --isolate --n 3 (fresh JVM per knob)",
                "duckdb_sec": duck,
                "knobs": results,
            },
            f, indent=2,
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
