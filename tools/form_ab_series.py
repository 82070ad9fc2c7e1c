"""Generic env-flag form A/B under the isolate protocol: one registered
query, one env var, two arm values, order-ALTERNATING paired rounds with a
fresh JVM per run (bench.py --isolate --n 3). Generalizes
tools/tpch_series.py (hardcoded to PYCAIM_TPCH_FORM) for one-off arms like
PYCAIM_Q10_FORM=semi. Protocol per CLAUDE.md: settle to 1-min load < 0.5
before each arm (proceeds after 900 s), alternate arm order per round,
cite the whole series.

Usage: python tools/form_ab_series.py SF_DIR QUERY ENVVAR ARM_A ARM_B
       [rounds] [out.json] [key]
ARM value "-" unsets the env var (the shipped default).
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


def run_one(query: str, sf_dir: str, envvar: str, arm: str) -> float | None:
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "PYCAIM_ISOLATE_TIMEOUT": "1800",
    }
    if arm == "-":
        env.pop(envvar, None)
    else:
        env[envvar] = arm
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--isolate", query, "--n", "3"],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    line = p.stdout.strip().rsplit("\n", 1)[-1]
    out = json.loads(line)["queries"]
    if query not in out:
        print(f"MISSING {query} (arm={arm}); bench stderr tail:\n"
              f"{p.stderr[-4000:]}", flush=True)
        return None
    return out[query]


def main():
    sf_dir, query, envvar, arm_a, arm_b = sys.argv[1:6]
    rounds = int(sys.argv[6]) if len(sys.argv) > 6 else 4
    out_path = sys.argv[7] if len(sys.argv) > 7 else os.path.join(
        REPO, "ISOLATE_r13.json")
    key = sys.argv[8] if len(sys.argv) > 8 else (
        f"{query}_{envvar.lower()}_paired_series")

    series = []
    for i in range(rounds):
        arms = [arm_a, arm_b] if i % 2 == 0 else [arm_b, arm_a]
        result = {"round": i, "order": arms}
        for arm in arms:
            settle()
            result[arm] = run_one(query, sf_dir, envvar, arm)
        series.append(result)
        print(series[-1], flush=True)
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged[key] = {
        "note": (
            f"Form A/B on {query}: {envvar}={arm_a} vs {arm_b} ('-' = "
            "unset/shipped default), order-alternating paired rounds, "
            "fresh JVM per run (bench.py --isolate --n 3)."
        ),
        "sf_dir": sf_dir,
        "series": series,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
