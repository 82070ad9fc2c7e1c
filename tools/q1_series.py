"""Paired alternating series for the Q1 cents decision + decomposition.

Each (round, variant) runs /root/repo/tools/q1_probe.py in a FRESH process (fresh JVM,
fresh cache warmup). Variants alternate within each round per the CLAUDE.md
measurement rule. Also records a DuckDB control and the scan/skeleton
decomposition rows. Merges results into /root/repo/ISOLATE_r11.json.
"""
import json
import os
import subprocess
import sys
import time

SF = "/root/repo/.scratch/sf10"
ROUNDS = 4
OUT = "/root/repo/ISOLATE_r11.json"


def probe(variants):
    p = subprocess.run(
        [sys.executable, "/root/repo/tools/q1_probe.py", SF, *variants],
        capture_output=True, text=True, timeout=900,
    )
    line = p.stdout.strip().rsplit("\n", 1)[-1]
    return json.loads(line)["probe"]


def duckdb_q1():
    import duckdb
    sys.path.insert(0, "/root/repo")
    from pycaim_spark.parity import duckdb_connection
    from pycaim_spark.registry import REGISTRY, _ensure_loaded
    _ensure_loaded()
    con = duckdb_connection(SF)
    sql = REGISTRY["agg_hash"].oracle
    con.execute(sql).fetchall()  # warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        runs.append(time.perf_counter() - t0)
    con.close()
    return round(sorted(runs)[1], 4)


def settle(limit=1.0, max_wait=900):
    waited = 0
    while os.getloadavg()[0] > limit and waited < max_wait:
        time.sleep(30)
        waited += 30
    print("load at start:", os.getloadavg(), flush=True)


def main():
    series = []
    for i in range(ROUNDS):
        settle()
        a = probe(["full"])["full"]
        settle()
        b = probe(["fastcents"])["fastcents"]
        series.append({"round": i, "round_cents": a, "floor_cents": b})
        print(series[-1], flush=True)
    settle()
    decomp = probe(["scan", "skeleton", "skeleton7", "fastcents", "fullnosplit"])
    duck = duckdb_q1()
    entry = {
        "note": (
            "agg_hash decomposition + cents-shape decision at sf10 "
            "(VERDICT r10 #1). Protocol: fresh JVM + fresh cache warmup per "
            "probe process, warm + median-of-3 noop-sink runs inside; "
            "variants alternate within each paired round. round_cents = "
            "F.round(x*100).cast(long) (per-row BigDecimal in Spark's "
            "Round-on-double); floor_cents = floor(x*100+0.5), the shipped "
            "form after this round. decomposition rows share one process."
        ),
        "sf_dir": SF,
        "q1_cents_paired_series": series,
        "q1_decomposition": {
            "filtered_scan_only": decomp["scan"],
            "group_skeleton_count_only": decomp["skeleton"],
            "group_skeleton_7_plain_long_sums": decomp["skeleton7"],
            "full_floor_cents": decomp["fastcents"],
            "full_round_cents_no_hi_lo_split": decomp["fullnosplit"],
        },
        "duckdb_full_q1": duck,
    }
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged["agg_hash_sf10_r11"] = entry
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
