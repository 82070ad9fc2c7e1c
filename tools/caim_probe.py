"""caim_fit non-monotone curve diagnosis (VERDICT r10 #4).

For each sf dir: events size/split geometry, then warm median-of-3 of
(a) melted-histogram aggregation only (noop sink),
(b) full CaimDiscretizer fit,
(c) the applyInPandas greedy stage alone on the precomputed histogram.
Same protocol as bench_scaling (tuned splits, cached events).
Usage: python tools/caim_probe.py [sf_dir ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402


def med3(fn):
    fn()
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 4)


def main():
    from pycaim_spark.catalog import load_table
    from pycaim_spark.operators.caim import CaimDiscretizer
    from pycaim_spark.operators.caim.estimator import (
        fit_from_histogram,
        melted_histogram,
    )
    from pycaim_spark.session import get_spark

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1", "/root/repo/.scratch/sf1",
        "/root/repo/.scratch/sf10",
    ]
    spark = get_spark(app_name="caim-probe")
    out = {}
    for sf in sf_dirs:
        total = sum(os.path.getsize(os.path.join(sf, f))
                    for f in os.listdir(sf) if f.endswith(".parquet"))
        mpb = max(4 << 20, min(128 << 20, total // 8))
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
        ev = load_table(spark, sf, "events").cache()
        n = ev.count()
        ev_sz = os.path.getsize(os.path.join(sf, "events.parquet"))
        cache_parts = ev.rdd.getNumPartitions()
        hist = melted_histogram(ev, ["value"], "event_type")
        hist_rows = hist.count()
        t_hist = med3(lambda: hist.write.format("noop").mode("overwrite").save())
        t_fit = med3(lambda: CaimDiscretizer(
            inputCols=["value"], labelCol="event_type").fit(ev))
        hist_cached = hist.cache()
        hist_cached.count()
        t_greedy = med3(lambda: fit_from_histogram(hist_cached, 100000))
        hist_cached.unpersist()
        ev.unpersist()
        out[sf] = {
            "rows": n, "events_bytes": ev_sz, "max_partition_bytes": mpb,
            "cache_partitions": cache_parts, "hist_rows": hist_rows,
            "hist_agg_noop": t_hist, "full_fit": t_fit,
            "greedy_on_cached_hist": t_greedy,
        }
        print(sf, out[sf], flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
