"""Skew-join A/B: plain shuffle join vs AQE skew-split vs manual salting,
on a DELIBERATELY skewed join (one hot key owns half the fact table).

The fixture corpora are near-uniform, so the repo's skew remedies
(`join_skew_salted`, AQE skewJoin) are demonstrated there but never
*measured to matter*. This tool builds the adversarial case — a fact
table where one key floods a single reducer, the canonical 100 TB
failure — and times the three strategies a cluster operator chooses
between, each in a fresh JVM, alternating rounds per the repo's
measurement doctrine (CLAUDE.md: single isolate runs are not decision
evidence).

Dataset (.scratch/skew/, built once, idempotent):
  fact  16 M rows (rid, key, val): key 0 on 50% of rows, the rest
        uniform over 1..2 M — hot-partition bytes ≈ 200 MB at the
        32-partition local shuffle, vs ~6 MB median.
  dim   2 M rows (key, seg): 20 segments; too big to broadcast at
        cluster budgets, and broadcast is pinned OFF in every config so
        all three strategies pay the same shuffle-join discipline.

Workload: fact ⋈ dim on key → groupBy(seg) → count + exact-cents sum,
noop sink. Every strategy must produce the identical 20-row result —
each child prints a canonical fingerprint and the parent asserts all
fingerprints match before writing the artifact.

Strategies:
  plain   sort-merge join, AQE skew handling OFF — the straggler case.
  aqe     AQE skewJoin ON. The local model scales the trigger to the
          data (threshold 32 MB / advisory 16 MB): AQE's defaults
          (256 MB threshold) are sized for real clusters where a hot
          key is tens of GB; at 16 M rows the hot partition is ~200 MB
          and the PROPORTIONS, not the absolute bytes, are the model.
          forceOptimizeSkewedJoin is set because the join feeds a
          re-shuffling agg anyway, so splitting adds no extra exchange.
  salted  manual salt-16 (the join_skew_salted shape): fact key salted
          by pmod(rid, 16), dim exploded 16× — the pre-AQE remedy, and
          still the right tool when the skewed join feeds an
          aggregation AQE cannot split.

Usage: python tools/skew_ab.py [out.json] [--rounds 4]
Merges under key "skew_join_ab" (ISOLATE_r11.json by default).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SKEW_DIR = os.path.join(REPO, ".scratch", "skew")
FACT_ROWS = 16_000_000
HOT_FRACTION = 0.5
DIM_KEYS = 2_000_000
SALT = 16

#: strategy -> PYCAIM_EXTRA_CONFS (applied on top of get_spark defaults).
#: Broadcast is pinned off everywhere: the scenario under test is the
#: shuffle join a cluster runs when the dim outgrows broadcast budgets.
_NO_BCAST = (
    "spark.sql.autoBroadcastJoinThreshold=-1;"
    "spark.sql.adaptive.autoBroadcastJoinThreshold=-1"
)
STRATEGIES: dict[str, str] = {
    "plain": _NO_BCAST + ";spark.sql.adaptive.skewJoin.enabled=false",
    "aqe": _NO_BCAST + (
        ";spark.sql.adaptive.skewJoin.enabled=true"
        ";spark.sql.adaptive.forceOptimizeSkewedJoin=true"
        ";spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes=33554432"
        ";spark.sql.adaptive.advisoryPartitionSizeInBytes=16777216"
    ),
    "salted": _NO_BCAST + ";spark.sql.adaptive.skewJoin.enabled=false",
}


def _gen(spark) -> None:
    """Build the skewed fact + dim once (idempotent, keyed by a marker)."""
    import pyspark.sql.functions as F

    marker = os.path.join(SKEW_DIR, f"_built_{FACT_ROWS}_{DIM_KEYS}")
    if os.path.exists(marker):
        return
    fact = (
        spark.range(FACT_ROWS)
        .select(
            F.col("id").alias("rid"),
            F.when(
                F.col("id") < int(FACT_ROWS * HOT_FRACTION), F.lit(0)
            )
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(DIM_KEYS - 1)) + 1)
            .alias("key"),
            ((F.col("id") % 1000) / 10.0).alias("val"),
        )
        .repartition(32)
    )
    fact.write.mode("overwrite").parquet(os.path.join(SKEW_DIR, "fact"))
    dim = spark.range(DIM_KEYS).select(
        F.col("id").alias("key"),
        F.concat(F.lit("seg_"), F.pmod(F.xxhash64("id"), F.lit(20)))
        .alias("seg"),
    )
    dim.write.mode("overwrite").parquet(os.path.join(SKEW_DIR, "dim"))
    open(marker, "w").close()


def _query(spark, strategy: str):
    import pyspark.sql.functions as F

    from pycaim_spark.functions.exact import cents, fsum

    fact = spark.read.parquet(os.path.join(SKEW_DIR, "fact"))
    dim = spark.read.parquet(os.path.join(SKEW_DIR, "dim"))
    if strategy == "salted":
        fact = fact.withColumn("salt", F.pmod(F.col("rid"), F.lit(SALT)))
        dim = dim.select(
            "key", "seg",
            F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))).alias("salt"),
        )
        joined = fact.join(dim, ["key", "salt"])
    else:
        joined = fact.join(dim, "key")
    return joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("cnt"),
        fsum(cents("val"), 2, "val_sum"),
    )


def _child(strategy: str) -> None:
    """Fresh-JVM timing of one strategy: warm + median of 3 noop sinks,
    plus a canonical result fingerprint for cross-strategy equality."""
    from pycaim_spark.session import get_spark

    spark = get_spark(app_name=f"skew-ab-{strategy}")
    _gen(spark)

    def run() -> None:
        _query(spark, strategy).write.format("noop").mode("overwrite").save()

    run()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    rows = sorted(
        (r.seg, r.cnt, f"{r.val_sum:.2f}")
        for r in _query(spark, strategy).collect()
    )
    print(json.dumps({
        "strategy": strategy,
        "median": round(sorted(times)[1], 4),
        "runs": [round(t, 4) for t in times],
        "fingerprint": rows,
    }))
    spark.stop()


def main() -> None:
    if "--child" in sys.argv:
        _child(sys.argv[sys.argv.index("--child") + 1])
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--"
    ) else os.path.join(REPO, "ISOLATE_r11.json")
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 4

    series: list[dict] = []
    fingerprints: set[str] = set()
    for rnd in range(rounds):
        row: dict = {"round": rnd}
        for strategy, confs in STRATEGIES.items():
            env = {**os.environ, "PYCAIM_EXTRA_CONFS": confs}
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", strategy],
                capture_output=True, text=True, env=env, timeout=1800,
                cwd=REPO,
            )
            line = proc.stdout.strip().rsplit("\n", 1)[-1] if proc.stdout else ""
            try:
                payload = json.loads(line)
            except ValueError:
                print(f"{strategy} r{rnd}: FAILED\n{proc.stderr[-3000:]}",
                      file=sys.stderr)
                sys.exit(1)
            row[strategy] = payload["median"]
            fingerprints.add(json.dumps(payload["fingerprint"]))
            print(f"r{rnd} {strategy}: {payload['median']}s", flush=True)
        series.append(row)
    assert len(fingerprints) == 1, (
        f"strategies disagree on the result: {len(fingerprints)} distinct "
        "fingerprints"
    )

    entry = {
        "note": (
            "Skew-join A/B on a deliberately skewed join (hot key = 50% of "
            f"a {FACT_ROWS // 1_000_000} M-row fact; dim {DIM_KEYS // 1_000_000} M keys, "
            "broadcast pinned off). Fresh JVM per strategy, warm + "
            "median-of-3 noop runs, strategies alternate within each round. "
            "All strategies assert an identical 20-row result fingerprint. "
            "AQE trigger scaled to the local model (32 MB threshold / 16 MB "
            "advisory): the 256 MB default is sized for cluster-scale skew; "
            "proportions, not absolute bytes, are the model."
        ),
        "fact_rows": FACT_ROWS,
        "hot_fraction": HOT_FRACTION,
        "dim_keys": DIM_KEYS,
        "salt": SALT,
        "series": series,
    }
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            existing = json.load(f)
    existing["skew_join_ab"] = entry
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"wrote {out_path} [skew_join_ab]")


if __name__ == "__main__":
    main()
