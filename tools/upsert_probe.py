"""Scale probe for the bucket-local CDC upsert (r15): at sf10, apply a
SPARSE CDC batch (~8 keys → a fraction of the 32 buckets) through
`_upserted_orderkey_layout` and time it against the full-table rewrite a
bucket-oblivious MERGE would pay (read every bucket file, repartition,
rewrite all 32 buckets — the same physical op as the compaction rewrite).
The registered tpch_q3_layout_upserted keeps its denser fixture batch for
oracle falsifiability; this probe answers the 100 TB question instead:
does upsert cost track TOUCHED buckets, not table size? The demo clone
(copytree of the compacted state — pure scaffolding so the compacted
table keeps serving its own queries; production mutates the layout in
place) is timed separately and excluded from the motion's cost.

Usage: python tools/upsert_probe.py [SF_DIR] [out.json] [key]
Defaults: /root/repo/.scratch/sf10, SCALING_r15.json, upsert_scale_probe_sf10.
Protocol: settles to 1-min load < 0.5 first (CLAUDE.md measurement rules).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

UPD = "o_orderkey % 3000001 = 0 AND o_orderkey % 5000001 <> 0"
DEL = "o_orderkey % 5000001 = 0"
SUFFIX = "probe"


def settle(limit=0.5, max_wait=900):
    waited = 0
    while os.getloadavg()[0] > limit and waited < max_wait:
        time.sleep(30)
        waited += 30
    print("load at start:", os.getloadavg(), flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sf10")
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "SCALING_r15.json")
    key = sys.argv[3] if len(sys.argv) > 3 else "upsert_scale_probe_sf10"

    settle()
    load_start = [round(x, 3) for x in os.getloadavg()]

    from pyspark.sql import SparkSession

    import pyspark.sql.functions as F
    from pycaim_spark.catalog import load_table
    from pycaim_spark.queries import advanced
    from pycaim_spark.queries.relational import _SCRATCH

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    # Warm the compacted layout attach OUTSIDE the timed region and wipe
    # any previous probe state so the motion runs cold.
    advanced._incremental_orderkey_layout(spark, sf_dir, compacted=True)
    import hashlib

    src = os.path.join(sf_dir, "orders.parquet")
    slug = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:32:incr:"
        f"{advanced._layout_fingerprint(src)}".encode()
    ).hexdigest()[:8]
    slug_dir = os.path.join(_SCRATCH, "bucketed_tpch", slug)
    for leftover in (f"orders_u{SUFFIX}", f"orders_u{SUFFIX}_stage"):
        shutil.rmtree(os.path.join(slug_dir, leftover), ignore_errors=True)
    for f in (f"upsert{SUFFIX}_orders.json",):
        p = os.path.join(slug_dir, f)
        if os.path.exists(p):
            os.remove(p)
    spark.sql(f"DROP TABLE IF EXISTS tpch_iu{SUFFIX}_orders_{slug}")

    # Time the clone separately via a wrapping copytree.
    clone_sec = []
    real_copytree = shutil.copytree

    def timed_copytree(*a, **kw):
        t0 = time.perf_counter()
        out = real_copytree(*a, **kw)
        clone_sec.append(time.perf_counter() - t0)
        return out

    shutil.copytree = timed_copytree
    try:
        t0 = time.perf_counter()
        _, ou = advanced._upserted_orderkey_layout(
            spark, sf_dir, upd_pred=UPD, del_pred=DEL, suffix=SUFFIX)
        upsert_total = time.perf_counter() - t0
    finally:
        shutil.copytree = real_copytree

    with open(os.path.join(slug_dir, f"upsert{SUFFIX}_orders.json")) as f:
        touched = json.load(f)["touched_buckets"]

    # Row accounting: full − deletes (updates replace 1:1).
    full = load_table(spark, sf_dir, "orders")
    n_full = full.count()
    n_del = full.filter(DEL).count()
    n_upd = full.filter(UPD).count()
    n_after = ou.count()
    assert n_after == n_full - n_del, (n_after, n_full, n_del)

    # Baseline: the full-table rewrite a bucket-oblivious MERGE pays —
    # read every bucket file of the same compacted state, repartition,
    # rewrite all 32 buckets (identical physical op to the compaction
    # rewrite path).
    cpath = os.path.join(slug_dir, "orders_c")
    bl_path = os.path.join(slug_dir, "orders_fullrw_probe")
    bl_name = f"tpch_fullrw_probe_orders_{slug}"
    spark.sql(f"DROP TABLE IF EXISTS {bl_name}")
    shutil.rmtree(bl_path, ignore_errors=True)
    t0 = time.perf_counter()
    (
        spark.read.parquet(cpath)
        .repartition(32, F.col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(32, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", bl_path)
        .saveAsTable(bl_name)
    )
    full_rewrite = time.perf_counter() - t0
    spark.sql(f"DROP TABLE IF EXISTS {bl_name}")
    shutil.rmtree(bl_path, ignore_errors=True)

    result = {
        "note": (
            "Bucket-local CDC upsert at sf10 vs the full-table rewrite a "
            "bucket-oblivious MERGE pays (same compacted source, same "
            "bucket spec). upsert_motion_sec excludes the demo clone "
            "(copytree scaffolding so the compacted table keeps serving; "
            "production mutates in place). Sparse batch: "
            f"{n_upd} updates + {n_del} deletes."
        ),
        "sf_dir": sf_dir,
        "load_start": load_start,
        "load_end": [round(x, 3) for x in os.getloadavg()],
        "orders_rows": n_full,
        "cdc_updates": n_upd,
        "cdc_deletes": n_del,
        "touched_buckets": len(touched),
        "total_buckets": 32,
        "clone_sec": round(sum(clone_sec), 3),
        "upsert_total_sec": round(upsert_total, 3),
        "upsert_motion_sec": round(upsert_total - sum(clone_sec), 3),
        "full_rewrite_sec": round(full_rewrite, 3),
    }
    print(result, flush=True)

    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged[key] = result
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
