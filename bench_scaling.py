"""Scaling bench: Spark vs DuckDB on the same parquet at increasing scale
(VERDICT r2 #1). Runs the five BASELINE-comparable headline queries at each
given sf dir on BOTH engines (warm, median of 3) and prints a per-sf ratio
table, demonstrating whether the sf0.1 gap is Spark's fixed per-action
floor (ratio falls with scale) or an asymptotic defect (ratio holds/grows).

Usage: python bench_scaling.py [--llm] [sf_dir ...]
Defaults: /root/testdata/sf0.01 /root/testdata/sf0.1 .scratch/sf1
(generate the last one with tools/make_scaled_sf.py first).
--llm swaps in the LLM-pipeline set (minhash/LSH/IVF/tfidf/mm/caim —
mostly rows-only, so Spark absolute seconds only; SCALING.md §LLM).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "agg_hash",
    "join_broadcast",
    "topk_per_group",
    "dedup_exact",
    "stream_session",
]

LLM_QUERIES = [
    "dedup_minhash",
    "dedup_simhash",
    "sim_lsh_bucketed",
    "sim_ivf",
    "sim_pq",
    "text_tfidf",
    "text_ngram_lm",
    "text_dup_spans",
    "mm_decode",
    "caim_fit",
    "pipeline_pretrain",
]

HOT_TABLES = (
    "lineitem", "orders", "customer", "nation", "events", "documents",
    "embeddings",
)


def _median3(fn) -> float:
    fn()  # warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return sorted(runs)[1]


def _tune_partitions(spark, sf_dir: str) -> None:
    """Size input splits for ≥8 fat tasks over this dir's data: 4 MiB
    splits (right for 10 MiB fixture files) drown a multi-GiB dir in task
    dispatch, while per-task overhead beats marginal scan parallelism
    locally (KNOBS_r8.json)."""
    total = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir)
        if f.endswith(".parquet")
    )
    # ≥8 fat tasks, capped at the 128 MiB cluster default — same rationale
    # and evidence as bench.py._tune_partitions (KNOBS_r8.json).
    target = max(4 << 20, min(128 << 20, total // 8))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))


def bench_sf(spark, sf_dir: str, names: list[str]) -> dict[str, dict[str, float]]:
    import duckdb

    from pycaim_spark.catalog import load_table
    from pycaim_spark.parity import duckdb_connection
    from pycaim_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    _tune_partitions(spark, sf_dir)
    cached = [load_table(spark, sf_dir, t).cache() for t in HOT_TABLES]
    for df in cached:
        df.count()

    con = duckdb_connection(sf_dir)
    out: dict[str, dict[str, float]] = {}
    try:
        for name in names:
            spec = REGISTRY[name]
            # noop sink, not count(): a count() plan is subject to
            # distinct-key join elimination + column pruning and can skip
            # most of the query (bench.py `_run_once` records the measured
            # case). The noop write consumes every row and column.
            s = _median3(
                lambda: spec.fn(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            out[name] = {"spark": round(s, 4)}
            if spec.oracle is not None:
                d = _median3(lambda: con.execute(spec.oracle).fetchall())
                out[name]["duckdb"] = round(d, 4)
                out[name]["ratio"] = round(s / d, 2)
    finally:
        con.close()
        for df in cached:
            df.unpersist()
    return out


def main() -> None:
    from pycaim_spark.session import get_spark

    repo = os.path.dirname(os.path.abspath(__file__))
    argv = sys.argv[1:]
    names = QUERIES
    if "--llm" in argv:
        argv.remove("--llm")
        names = LLM_QUERIES
    if "--only" in argv:
        # --only a,b,c: sweep a subset (same warm-median protocol) — for
        # adding one operator's scale curve without re-running the family.
        i = argv.index("--only")
        names = argv[i + 1].split(",")
        del argv[i:i + 2]
    sf_dirs = argv or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(repo, ".scratch", "sf1"),
    ]
    spark = get_spark(app_name="pycaim-bench-scaling")
    results = {}
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: not found (tools/make_scaled_sf.py)", file=sys.stderr)
            continue
        results[sf_dir] = bench_sf(spark, sf_dir, names)
        print(f"done {sf_dir}", file=sys.stderr)
    spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
