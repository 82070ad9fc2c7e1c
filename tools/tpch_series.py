"""TPC-H composite fixed-point A/B (round 11): 4 alternating paired
rounds of the SQL-decimal form (PYCAIM_TPCH_FORM=sql — the spelling the
r11 sweep measured) vs the shipped fixed-point DataFrame form, fresh JVM
per query via bench.py --isolate --n 3 at sf10. The decimal revenue
product is DECIMAL(25,4) — precision >18 leaves Spark's long-backed
Decimal representation for per-row BigDecimal (the agg_hash lesson) —
and Q18's SUM(DECIMAL(12,2)) subquery pays a precision-22 accumulator on
every lineitem row. Merges into /root/repo/ISOLATE_r11.json.

Usage: python tools/tpch_series.py [sf_dir] [rounds]
"""
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
QUERIES = ["tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q18"]
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".scratch", "sf10")
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
OUT = os.path.join(REPO, "ISOLATE_r11.json")


def settle(limit=1.0, max_wait=900):
    waited = 0
    while os.getloadavg()[0] > limit and waited < max_wait:
        time.sleep(30)
        waited += 30
    print("load at start:", os.getloadavg(), flush=True)


def run_bench(form: str) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": SF_DIR,
        "PYCAIM_ISOLATE_TIMEOUT": "1800",
    }
    if form == "sql":
        env["PYCAIM_TPCH_FORM"] = "sql"
    else:
        env.pop("PYCAIM_TPCH_FORM", None)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--isolate", *QUERIES, "--n", "3"],
        capture_output=True, text=True, timeout=7200, env=env,
    )
    line = p.stdout.strip().rsplit("\n", 1)[-1]
    out = json.loads(line)["queries"]
    missing = [q for q in QUERIES if q not in out]
    if missing:
        print(f"MISSING {missing} (form={form}); bench stderr tail:\n"
              f"{p.stderr[-4000:]}", flush=True)
    return out


def main():
    series = []
    for i in range(ROUNDS):
        settle()
        a = run_bench("sql")
        settle()
        b = run_bench("fixedpoint")
        series.append({"round": i, "sql_decimal": a, "fixedpoint": b})
        print(series[-1], flush=True)
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged["tpch_fixedpoint_paired_series"] = {
        "note": (
            "Round-11 TPC-H composite A/B at sf10: SQL-decimal form "
            "(PYCAIM_TPCH_FORM=sql) vs the shipped fixed-point DataFrame "
            "form, 4 alternating paired rounds, fresh JVM per query "
            "(bench.py --isolate --n 3). Both forms are hash-identical "
            "to the DuckDB oracle at sf0.01/sf0.001 (parity gate)."
        ),
        "sf_dir": SF_DIR,
        "series": series,
    }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
