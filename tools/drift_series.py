"""r10 bench-drift adjudication (VERDICT r10 #2): 4 alternating paired
rounds of r9-end code (0ba7e60, the tree BENCH_r09 measured) vs current
HEAD for the four biggest r10 movers, fresh JVM per query via
bench.py --isolate --n 3 at sf0.1. Merges into /root/repo/ISOLATE_r11.json.
"""
import json
import os
import subprocess
import sys
import time


def settle(limit=1.0, max_wait=900):
    waited = 0
    while os.getloadavg()[0] > limit and waited < max_wait:
        time.sleep(30)
        waited += 30
    print("load at start:", os.getloadavg(), flush=True)

MOVERS = ["sim_ivf", "text_tfidf", "sim_cosine_exact", "dedup_minhash"]
R9 = "/tmp/r9tree"
HEAD = "/root/repo"
ROUNDS = 4
OUT = "/root/repo/ISOLATE_r11.json"


def run_bench(tree):
    p = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py"),
         "--isolate", *MOVERS, "--n", "3"],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1"},
    )
    line = p.stdout.strip().rsplit("\n", 1)[-1]
    return json.loads(line)["queries"]


def main():
    if not os.path.isdir(R9):
        subprocess.run(["git", "-C", HEAD, "worktree", "add", R9, "0ba7e60"],
                       check=True)
    series = []
    for i in range(ROUNDS):
        settle()
        a = run_bench(R9)
        settle()
        b = run_bench(HEAD)
        series.append({"round": i, "r9_code": a, "head_r11": b})
        print(series[-1], flush=True)
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged["bench_drift_paired_series"] = {
        "note": (
            "VERDICT r10 #2: the +10%% BENCH_r10 drift (sim_ivf +36%%, "
            "text_tfidf +29%%, sim_cosine_exact +23%%, dedup_minhash +18%%) "
            "adjudicated by 4 alternating paired rounds of the r9-end tree "
            "(0ba7e60, the code BENCH_r09 measured) vs HEAD, fresh JVM per "
            "query (bench.py --isolate --n 3) at sf0.1."
        ),
        "series": series,
    }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
