"""IVF-PQ n_candidates widening grid (VERDICT r12 #5): recall@5 and wall
time of ivf_pq_topk_neighbors at n_candidates in {256, 512, 1024}, at
unchanged nprobe, vs sim_cosine_exact ground truth — the r12 PQ retune
(nc 256→512) was free at this corpus size; measure whether the same holds
inside the IVF-PQ probe and lifts the sf1 recall off the 0.80 floor.

Usage: python tools/ivfpq_nc_grid.py [sf_dir ...]
Merges into SCALING_r13.json under "ivfpq_nc_grid".
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "SCALING_r13.json")


def main():
    from pycaim_spark.catalog import load_table
    from pycaim_spark.operators.similarity import ivf_pq_topk_neighbors
    from pycaim_spark.registry import REGISTRY, _ensure_loaded
    from pycaim_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from ann_recall import recall_vs, topk_sets

    _ensure_loaded()
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".scratch", "sf1"),
        os.path.join(REPO, ".scratch", "sf10"),
    ]
    spark = get_spark(app_name="ivfpq-nc-grid")
    results: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            continue
        exact = topk_sets(REGISTRY["sim_cosine_exact"].fn(spark, sf_dir))
        emb = load_table(spark, sf_dir, "embeddings")
        row = {}
        for nc in (256, 512, 1024):
            df = ivf_pq_topk_neighbors(
                emb, n_cells=32, nprobe=12, m=8, k_centroids=32, k=5,
                n_queries=10, n_candidates=nc,
            )
            t0 = time.perf_counter()
            got = topk_sets(df)
            wall = round(time.perf_counter() - t0, 3)
            row[f"nc{nc}"] = {"recall": recall_vs(exact, got), "wall": wall}
            print(sf_dir, f"nc{nc}", row[f"nc{nc}"], flush=True)
        results[sf_dir] = row
    spark.stop()
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged["ivfpq_nc_grid"] = {
        "note": ("ivf_pq_topk_neighbors recall@5 vs sim_cosine_exact and "
                 "wall (collect incl. train+encode, single run) across "
                 "n_candidates at unchanged nprobe=12/32 cells."),
        "results": results,
    }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
