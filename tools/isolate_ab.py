"""Guard-shape A/B under the isolate protocol (fresh JVM per query).

Runs ``bench.py --isolate`` once per (label, env) configuration and writes
one JSON artifact mapping label → per-query median seconds. This is the
evidence file that in-code perf comments must cite (VERDICT r7 rule:
every perf number in a comment names a committed JSON).

Usage:  python tools/isolate_ab.py [out.json]   (default ISOLATE_r8.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

#: label -> (extra env, queries)
CONFIGS: dict[str, tuple[dict[str, str], list[str]]] = {
    # dedup guard shapes (operators/dedup.py _banded_pairs_with_guard)
    "dedup_shape_window": (
        {"PYCAIM_LSH_GUARD_SHAPE": "window"},
        ["dedup_minhash", "dedup_simhash"],
    ),
    "dedup_shape_join_r6": (
        {"PYCAIM_LSH_GUARD_SHAPE": "join"},
        ["dedup_minhash", "dedup_simhash"],
    ),
    "dedup_shape_anti_r7": (
        {"PYCAIM_LSH_GUARD_SHAPE": "anti"},
        ["dedup_minhash", "dedup_simhash"],
    ),
    "dedup_shape_nopart": (
        {"PYCAIM_LSH_GUARD_SHAPE": "nopart"},
        ["dedup_minhash", "dedup_simhash"],
    ),
    "dedup_shape_grouped": (
        {"PYCAIM_LSH_GUARD_SHAPE": "grouped"},
        ["dedup_minhash", "dedup_simhash"],
    ),
    "dedup_guard_off": (
        {"PYCAIM_LSH_MAX_BUCKET": "0"},
        ["dedup_minhash", "dedup_simhash"],
    ),
    # sign-LSH guard shapes (operators/similarity.py)
    "sim_shape_window": (
        {"PYCAIM_SIM_GUARD_SHAPE": "window"}, ["sim_lsh_bucketed"],
    ),
    "sim_shape_nopart": (
        {"PYCAIM_SIM_GUARD_SHAPE": "nopart"}, ["sim_lsh_bucketed"],
    ),
    "sim_shape_single": (
        {"PYCAIM_SIM_GUARD_SHAPE": "single"}, ["sim_lsh_bucketed"],
    ),
    "sim_shape_dual_r7": (
        {"PYCAIM_SIM_GUARD_SHAPE": "dual"}, ["sim_lsh_bucketed"],
    ),
    "sim_guard_off": (
        {"PYCAIM_LSH_MAX_BUCKET": "0"}, ["sim_lsh_bucketed"],
    ),
    # mm_decode round-7 slowdown bisection control
    "mm_decode": ({}, ["mm_decode"]),
    # --- round 9 ---
    # join_broadcast adjudication at sf10 (VERDICT r8 #5): pinned hint vs
    # AQE's free choice vs an explicitly DEMOTED broadcast (threshold 1 MiB
    # forces the sort-merge/shuffled-hash path a cluster would take when
    # the dim outgrows broadcast budgets).
    "join_sf10_pinned": (
        {"SPARK_GRAFT_SF_DIR": "/root/repo/.scratch/sf10"},
        ["join_broadcast"],
    ),
    "join_sf10_aqe": (
        {"SPARK_GRAFT_SF_DIR": "/root/repo/.scratch/sf10"},
        ["join_aqe_choice"],
    ),
    "join_sf10_demoted": (
        {
            "SPARK_GRAFT_SF_DIR": "/root/repo/.scratch/sf10",
            "PYCAIM_EXTRA_CONFS":
                "spark.sql.autoBroadcastJoinThreshold=1048576;"
                "spark.sql.adaptive.autoBroadcastJoinThreshold=1048576",
        },
        ["join_aqe_choice"],
    ),
    # Cluster output contract vs pair list at sf10 (VERDICT r8 #1): same
    # corpus, same session protocol — the star-edge clusters query must be
    # materially below the pair query's output-bound wall time.
    "dedup_sf10_pairs_vs_clusters": (
        {
            "SPARK_GRAFT_SF_DIR": "/root/repo/.scratch/sf10",
            "PYCAIM_ISOLATE_TIMEOUT": "1800",
        },
        ["dedup_minhash", "dedup_minhash_clusters"],
    ),
    # ANN family at sf10: the composed IVF-PQ vs both parents.
    "ann_sf10": (
        {"SPARK_GRAFT_SF_DIR": "/root/repo/.scratch/sf10"},
        ["sim_ivf", "sim_pq", "sim_ivf_pq"],
    ),
}


def main() -> None:
    """isolate_ab.py [out.json] [config ...] — with configs given, runs
    only those and merges into an existing out.json (incremental A/B)."""
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "ISOLATE_r8.json"
    )
    only = set(sys.argv[2:])
    results: dict[str, dict] = {}
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f).get("configs", {})
    # PYCAIM_ISOLATE_CANARY=1 turns on bench.py's fresh-JVM q6 canary +
    # drift gate per measurement child (VERDICT r13 #2); the probes are
    # stored per config so decay-suspect runs are flagged in the artifact.
    canary_args = (
        ["--canary"] if os.environ.get("PYCAIM_ISOLATE_CANARY") else []
    )
    for label, (env_extra, queries) in CONFIGS.items():
        if only and label not in only:
            continue
        env = {**os.environ, **env_extra}
        proc = subprocess.run(
            [sys.executable, BENCH, "--isolate", *queries, "--n", "3",
             *canary_args],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = proc.stdout.strip().rsplit("\n", 1)[-1] if proc.stdout else ""
        try:
            payload = json.loads(line)
        except ValueError:
            print(f"{label}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        results[label] = {"env": env_extra, "queries": payload["queries"]}
        for k in ("canary", "canary_drift"):
            if k in payload:
                results[label][k] = payload[k]
        print(f"{label}: {payload['queries']}", flush=True)
    meta = {
        "protocol": "bench.py --isolate --n 3 (fresh JVM + fresh warmup per "
        "query, median of 3 steady-state runs)",
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "configs": results,
    }
    with open(out_path, "w") as f:
        json.dump(meta, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
