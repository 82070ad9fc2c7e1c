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


#: Best (minimum) canary observed across the whole series — passed to
#: each bench.py invocation as $PYCAIM_CANARY_REF so the drift gate
#: compares against the series' best box state, not each invocation's own
#: first probe.
_CANARY_MIN: list[float] = []


def run_one(query: str, sf_dir: str, envvar: str, arm: str):
    """Returns (median_sec, canary_probes) — canary per VERDICT r13 #2:
    bench.py --canary runs a fresh-JVM q6 probe before the measurement
    child and retries when it reads >20% above the series' best canary;
    the probes travel with the series so a decayed-box round is visibly
    flagged instead of silently adjudicating a plan shape."""
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "PYCAIM_ISOLATE_TIMEOUT": "1800",
        # This harness settles itself (settle() before each arm); skip
        # bench.py's own r19 settle gate so the series cadence is unchanged.
        "PYCAIM_BENCH_NO_SETTLE": "1",
    }
    if _CANARY_MIN:
        env["PYCAIM_CANARY_REF"] = str(_CANARY_MIN[0])
    if arm == "-":
        env.pop(envvar, None)
    else:
        env[envvar] = arm
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--isolate", query, "--n", "3", "--canary"],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    line = p.stdout.strip().rsplit("\n", 1)[-1]
    payload = json.loads(line)
    out = payload["queries"]
    canary = (payload.get("canary") or {}).get(query)
    if canary:
        best = min(canary + _CANARY_MIN)
        _CANARY_MIN[:] = [best]
    if query not in out:
        print(f"MISSING {query} (arm={arm}); bench stderr tail:\n"
              f"{p.stderr[-4000:]}", flush=True)
        return None, canary
    return out[query], canary


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
            sec, canary = run_one(query, sf_dir, envvar, arm)
            result[arm] = sec
            result[f"{arm}_canary"] = canary
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
            "fresh JVM per run (bench.py --isolate --n 3 --canary). "
            "Per-run `*_canary` lists the fresh-JVM q6 probes taken "
            "before that measurement; a last probe >20% above the "
            "series minimum marks the run decay-suspect (VERDICT r13 "
            "#2 protocol)."
        ),
        "sf_dir": sf_dir,
        "canary_min": (_CANARY_MIN[0] if _CANARY_MIN else None),
        "series": series,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
