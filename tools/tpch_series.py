"""TPC-H composite fixed-point A/B: alternating paired rounds of the
SQL-decimal form (PYCAIM_TPCH_FORM=sql) vs the shipped fixed-point
DataFrame form, fresh JVM per query via bench.py --isolate --n 3.

Round-12 protocol upgrade: the ARM ORDER alternates per round (round 0
runs sql first, round 1 runs fixedpoint first, ...) — the r11
reversed-order control measured a ~10-20% penalty on whichever arm runs
second in a round (ISOLATE_r11.json `tpch_fixedpoint_reversed_order`),
so a fixed order is protocol bias, not evidence. CLAUDE.md measurement
rules now require alternation.

The decimal revenue product is DECIMAL(25,4) — precision >18 leaves
Spark's long-backed Decimal representation for per-row BigDecimal (the
agg_hash lesson) — and Q18's SUM(DECIMAL(12,2)) subquery pays a
precision-22 accumulator on every lineitem row; the fixed-point gain
tracks ROWS AGGREGATED, so sf0.1 (600 k lineitem) and sf10 (60 M) can
legitimately disagree.

Usage: python tools/tpch_series.py [sf_dir] [rounds] [out_json] [key]
       [--queries q1,q2,...]
"""
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
DEFAULT_QUERIES = ["tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q18"]


def settle(limit=0.5, max_wait=900):
    waited = 0
    while os.getloadavg()[0] > limit and waited < max_wait:
        time.sleep(30)
        waited += 30
    print("load at start:", os.getloadavg(), flush=True)


def run_bench(form: str, sf_dir: str, queries: list) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "PYCAIM_ISOLATE_TIMEOUT": "1800",
    }
    # Explicit per-arm form, independent of each query's adjudicated
    # default (r12 flipped q3/q5/q10 to SQL-decimal; q6/q18 ship
    # fixed-point) — every form function honors both values.
    env["PYCAIM_TPCH_FORM"] = form
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--isolate", *queries, "--n", "3"],
        capture_output=True, text=True, timeout=7200, env=env,
    )
    line = p.stdout.strip().rsplit("\n", 1)[-1]
    out = json.loads(line)["queries"]
    missing = [q for q in queries if q not in out]
    if missing:
        print(f"MISSING {missing} (form={form}); bench stderr tail:\n"
              f"{p.stderr[-4000:]}", flush=True)
    return out


def main():
    argv = list(sys.argv[1:])
    queries = DEFAULT_QUERIES
    if "--queries" in argv:
        i = argv.index("--queries")
        queries = argv[i + 1].split(",")
        del argv[i:i + 2]
    sf_dir = argv[0] if len(argv) > 0 else os.path.join(REPO, ".scratch", "sf10")
    rounds = int(argv[1]) if len(argv) > 1 else 4
    out_path = argv[2] if len(argv) > 2 else os.path.join(REPO, "ISOLATE_r12.json")
    key = argv[3] if len(argv) > 3 else "tpch_fixedpoint_paired_series"

    series = []
    for i in range(rounds):
        arms = ["sql", "fixedpoint"] if i % 2 == 0 else ["fixedpoint", "sql"]
        result = {"round": i, "order": arms}
        for form in arms:
            settle()
            result["sql_decimal" if form == "sql" else "fixedpoint"] = \
                run_bench(form, sf_dir, queries)
        series.append(result)
        print(series[-1], flush=True)
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged[key] = {
        "note": (
            "TPC-H composite A/B: SQL-decimal form (PYCAIM_TPCH_FORM=sql) "
            "vs the shipped fixed-point DataFrame form, order-ALTERNATING "
            "paired rounds (each round's `order` records which arm ran "
            "first), fresh JVM per query (bench.py --isolate --n 3). Both "
            "forms are hash-identical to the DuckDB oracle at "
            "sf0.01/sf0.001 (parity gate)."
        ),
        "sf_dir": sf_dir,
        "queries": queries,
        "series": series,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
