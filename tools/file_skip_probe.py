"""sf10 scale probe for manifest-based file skipping (r18).

Builds the date-clustered orders layout at the given sf_dir (default
``.scratch/sf10``), then times the one-year audit three ways, each
materialized through the noop sink (CLAUDE.md: count() plans can be
optimized down to the bare scan — elimination-proof numbers only):

- ``full``: read every file, filter, aggregate (the no-skipping plan);
- ``pruned``: read only the manifest-qualifying files, filter,
  aggregate (the `layout_file_skipping` plan);
- file/byte accounting: how much of the table the pruned scan never
  opens — the quantity that scales (at 100 TB the skipped bytes are
  the point; wall-clock at sf10 underestimates the win because the
  local page cache hides most of the read cost).

Settles to 1-min load < 0.5 before measuring (the repo's decision
doctrine) and records load in the artifact. Appends/creates
SCALING_r18.json. Usage: ``python tools/file_skip_probe.py [sf_dir]``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _settle(limit: float = 0.5, timeout: float = 900.0) -> float:
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < limit or time.time() - t0 > timeout:
            return load
        time.sleep(10)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, "SCALING_r18.json")

    load_start = _settle()

    from pycaim_spark.session import get_spark

    spark = get_spark(app_name="file-skip-probe", master="local[32]",
                      shuffle_partitions=32)
    import pyspark.sql.functions as F

    from pycaim_spark.operators.layout import prune_layout_files
    from pycaim_spark.queries.advanced import (
        _SKIP_HI,
        _SKIP_LO,
        _date_clustered_orders_layout,
    )

    t0 = time.time()
    slug_dir, ddl = _date_clustered_orders_layout(spark, sf_dir)
    build_s = time.time() - t0
    kept, skipped, ptr = prune_layout_files(
        slug_dir, "orders_d", "o_orderdate", lo=_SKIP_LO, hi=_SKIP_HI
    )

    def _bytes(paths):
        return sum(os.path.getsize(p) for p in paths)

    pred = (
        (F.col("o_orderdate")
         >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate")
           < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )

    def _run(paths):
        df = (
            spark.read.schema(ddl).parquet(*paths)
            .filter(pred)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_totalprice").alias("s"))
        )
        t = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t

    # Warm both paths once (JVM/codegen), then 3 alternating rounds.
    full_paths = kept + skipped
    _run(full_paths); _run(kept)
    fulls, pruneds = [], []
    for _ in range(3):
        fulls.append(_run(full_paths))
        pruneds.append(_run(kept))

    entry = {
        "sf_dir": os.path.abspath(sf_dir),
        "load_start": round(load_start, 2),
        "load_end": round(os.getloadavg()[0], 2),
        "build_s": round(build_s, 2),
        "files_total": len(full_paths),
        "files_kept": len(kept),
        "files_skipped": len(skipped),
        "bytes_total": _bytes(full_paths),
        "bytes_kept": _bytes(kept),
        "bytes_skipped": _bytes(skipped),
        "noop_full_s": [round(x, 3) for x in fulls],
        "noop_pruned_s": [round(x, 3) for x in pruneds],
    }
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    doc["file_skipping_sf10"] = entry
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(entry))
    spark.stop()


if __name__ == "__main__":
    main()
