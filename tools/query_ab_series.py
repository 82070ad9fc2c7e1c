"""Paired query-vs-query A/B under the isolate protocol: two REGISTERED
query names (e.g. a production query vs its alternate-layout twin),
order-ALTERNATING paired rounds, fresh JVM per query via
``bench.py --isolate --n 3``. Complements tools/isolate_ab.py (env-knob
configs) and tools/tpch_series.py (form-flag arms): here the arms are two
different registry entries over the same sf_dir.

Protocol per CLAUDE.md measurement rules: settle to 1-min load < 0.5
before each arm (proceeds after 900 s regardless — don't run other work
concurrently), alternate which arm runs first each round (the r11
reversed-order control measured a ~10-20% second-arm penalty), and cite
the whole series, never a single round.

Usage: python tools/query_ab_series.py SF_DIR QUERY_A QUERY_B
       [rounds] [out.json] [key]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"


def settle(limit=0.5, max_wait=900):
    waited = 0
    while os.getloadavg()[0] > limit and waited < max_wait:
        time.sleep(30)
        waited += 30
    print("load at start:", os.getloadavg(), flush=True)


def run_one(query: str, sf_dir: str) -> float | None:
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "PYCAIM_ISOLATE_TIMEOUT": "1800",
    }
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--isolate", query, "--n", "3"],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    line = p.stdout.strip().rsplit("\n", 1)[-1]
    out = json.loads(line)["queries"]
    if query not in out:
        print(f"MISSING {query}; bench stderr tail:\n{p.stderr[-4000:]}",
              flush=True)
        return None
    return out[query]


def main():
    sf_dir = sys.argv[1]
    qa, qb = sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    out_path = sys.argv[5] if len(sys.argv) > 5 else os.path.join(
        REPO, "ISOLATE_r12.json")
    key = sys.argv[6] if len(sys.argv) > 6 else f"{qa}_vs_{qb}_paired_series"

    series = []
    for i in range(rounds):
        arms = [qa, qb] if i % 2 == 0 else [qb, qa]
        result = {"round": i, "order": arms}
        for q in arms:
            settle()
            result[q] = run_one(q, sf_dir)
        series.append(result)
        print(series[-1], flush=True)
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged[key] = {
        "note": (
            f"Registry-query A/B {qa} vs {qb}: order-alternating paired "
            "rounds (each round's `order` records which arm ran first), "
            "fresh JVM per query (bench.py --isolate --n 3)."
        ),
        "sf_dir": sf_dir,
        "series": series,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
