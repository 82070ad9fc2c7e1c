"""sim_lsh_bucketed recall-margin grid (VERDICT r13 #4): recall on the
query-touching pair restriction (tools/ann_recall.py's measurement) and an
advisory wall number, across $PYCAIM_SIM_LSH_TABLES arms, at the scaled
corpora that can falsify recall (perturbed sf1/sf10).

Recall is deterministic (seeded hyperplanes, fixed corpus) so a single
evaluation per arm is exact; wall is warm + median-of-3 via the noop sink
in ONE shared process — stage-relative/advisory, NOT a paired-series
decision number (CLAUDE.md measurement rules; quote it as "no regression
observed", not as a bound).

Usage: python tools/lsh_tables_grid.py [out.json] [sf_dir ...]
       PYCAIM_LSH_GRID_TABLES=16,20,24 overrides the arms.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, "SCALING_r14.json")
SF_DIRS = sys.argv[2:] or [
    "/root/testdata/sf0.1",
    os.path.join(REPO, ".scratch", "sf1"),
    os.path.join(REPO, ".scratch", "sf10"),
]
ARMS = [int(t) for t in os.environ.get(
    "PYCAIM_LSH_GRID_TABLES", "16,20,24").split(",")]


def main() -> None:
    from pycaim_spark.registry import REGISTRY, _ensure_loaded
    from pycaim_spark.session import get_spark
    from tools.ann_recall import lsh_pair_recall

    _ensure_loaded()
    spark = get_spark(app_name="lsh-tables-grid")
    results: dict[str, dict] = {}
    for sf_dir in SF_DIRS:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}", file=sys.stderr)
            continue
        row: dict[str, dict] = {}
        for t in ARMS:
            os.environ["PYCAIM_SIM_LSH_TABLES"] = str(t)
            df = REGISTRY["sim_lsh_bucketed"].fn(spark, sf_dir)

            def run():
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0

            run()  # warm
            wall = round(sorted(run() for _ in range(3))[1], 4)
            rec = lsh_pair_recall(spark, sf_dir)
            row[f"tables{t}"] = {**rec, "wall": wall}
            print(sf_dir, f"tables={t}", row[f"tables{t}"], flush=True)
        os.environ.pop("PYCAIM_SIM_LSH_TABLES", None)
        results[sf_dir] = row
    spark.stop()
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged["lsh_tables_grid"] = {
        "note": (
            "sim_lsh_bucketed recall on query-touching pairs vs exact "
            "cos>=0.3 (deterministic) and advisory shared-process wall "
            "(warm + median-of-3, noop sink) across "
            "PYCAIM_SIM_LSH_TABLES arms."
        ),
        "load": [round(x, 3) for x in os.getloadavg()],
        "results": results,
    }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
