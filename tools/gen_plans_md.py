"""Generate PLANS.md + PLANS_BASELINE.json — physical-plan audit of the
registry (VERDICT r8 #6: registry-wide, with a CI-fashion regression gate).

Two layers:

1. A curated detail table for the headline batch queries (scan-pushdown
   lines, codegen spans) — the human-readable audit.
2. A REGISTRY-WIDE sweep: every non-effectful query's static plan is
   audited (shuffle Exchange count, BroadcastExchange count, forbidden
   nodes) and written to PLANS_BASELINE.json. ``--check`` recomputes the
   sweep and exits nonzero if any query's shuffle count EXCEEDS the
   committed baseline, a new forbidden node appears, or a registered
   query is missing from the baseline — the no-new-shuffle-regressions
   gate. A conscious plan change is recorded by re-running the generator
   and committing the refreshed baseline.

Exclusions (documented, single-sourced in pycaim_spark/planaudit.py):
queries whose fn() executes side effects — sinks, streaming replays,
iterative driver fits — are skipped; their plan story lives in their
tests.

Run: python tools/gen_plans_md.py            (regenerate both files)
     python tools/gen_plans_md.py --check    (gate only, no writes)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pycaim_spark.planaudit import (  # noqa: E402
    EXECUTES_AT_BUILD,
    audit_plan,
    is_effectful,
    plan_string,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASELINE_PATH = os.path.join(REPO, "PLANS_BASELINE.json")

#: Lazily-built batch queries worth a standing DETAIL record: the bench
#: HEADLINE's batch subset plus plan-interesting additions.
AUDIT = [
    "agg_hash",
    "agg_histogram",
    "agg_incremental_merge",
    "join_broadcast",
    "join_aqe_choice",
    "topk_per_group",
    "dedup_exact",
    "dedup_minhash",
    # (dedup_minhash_clusters is EXECUTES_AT_BUILD — its CC loop runs at
    # fn() time, so there is no static plan to record)
    "dedup_incremental_exact",
    "dedup_incremental_minhash",
    "sim_cosine_exact",
    "sim_lsh_bucketed",
    "sim_ivf_pq",
    "text_tfidf",
    "text_ngram_lm",
    "text_dup_spans",
    "events_mad_outliers",
    "join_range_bucketed",
    "tpch_q3",
    "tpch_q10",
    "scan_pruned",
    "pipeline_pretrain",
]


def _session():
    from pyspark.sql import SparkSession

    from pycaim_spark.session import configure_session

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        # Some ANN builders collect a small training sample at plan-build;
        # the 1 GiB default driver heap is too tight for a full sweep.
        .config("spark.driver.memory", os.environ.get("PYCAIM_DRIVER_MEM", "8g"))
        .appName("pycaim-plan-audit")
        .getOrCreate()
    )
    configure_session(spark)
    # configure_session turns AQE on (the right default for execution);
    # turn it back off HERE so explain shows the concrete static plan with
    # codegen span ids instead of an unexecuted AdaptiveSparkPlan shell.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return spark


def _audit(spark, name, fn):
    df = fn(spark, SF_DIR)
    # fn() -> load_table -> configure_session re-enables AQE; planning
    # reads the conf at explain time, so flip it back off here.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    return audit_plan(plan_string(df))


def sweep(spark) -> tuple[dict[str, dict], list[str]]:
    """Registry-wide static audit → ({name: {shuffles, broadcasts, bad}},
    [skipped effectful/build-time query names])."""
    from pycaim_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    out, skipped = {}, []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if is_effectful(name, spec.tags) or name in EXECUTES_AT_BUILD:
            skipped.append(name)
            continue
        a = _audit(spark, name, spec.fn)
        out[name] = {
            "shuffle_exchanges": a["shuffle_exchanges"],
            "broadcast_exchanges": a["broadcast_exchanges"],
            "bad_nodes": a["bad_nodes"],
        }
    return out, skipped


def check() -> int:
    """Compare a fresh sweep against the committed baseline; 0 iff clean."""
    with open(BASELINE_PATH) as f:
        baseline = json.load(f)["queries"]
    spark = _session()
    current, _ = sweep(spark)
    spark.stop()
    rc = 0
    for name, cur in current.items():
        base = baseline.get(name)
        if base is None:
            print(f"NEW QUERY not in baseline: {name} — regenerate")
            rc = 1
            continue
        if cur["shuffle_exchanges"] > base["shuffle_exchanges"]:
            print(
                f"SHUFFLE REGRESSION {name}: "
                f"{base['shuffle_exchanges']} -> {cur['shuffle_exchanges']}"
            )
            rc = 1
        new_bad = set(cur["bad_nodes"]) - set(base["bad_nodes"])
        if new_bad:
            print(f"NEW FORBIDDEN NODES {name}: {sorted(new_bad)}")
            rc = 1
    print("plan check:", "CLEAN" if rc == 0 else "REGRESSIONS FOUND")
    return rc


def main() -> None:
    from pycaim_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    spark = _session()
    rows, details = [], []
    for name in AUDIT:
        a = _audit(spark, name, REGISTRY[name].fn)
        rows.append(
            f"| `{name}` | {a['shuffle_exchanges']} | {a['broadcast_exchanges']} "
            f"| {a['codegen_spans']} | "
            f"{'yes' if a['pushed'] or a['partition_filters'] else '—'} | "
            f"{', '.join(a['bad_nodes']) or '—'} |"
        )
        push_lines = a["pushed"] + a["partition_filters"]
        if push_lines:
            details.append(f"- `{name}`:")
            details.extend(f"  - `{p}`" for p in push_lines[:4])
    wide, skipped = sweep(spark)
    spark.stop()

    with open(BASELINE_PATH, "w") as f:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "protocol": "static formatted explain, AQE off, no cache — "
                "tools/gen_plans_md.py; gate with --check",
                "skipped_effectful": skipped,
                "queries": wide,
            },
            f,
            indent=2,
            sort_keys=True,
        )

    wide_rows = [
        f"| `{n}` | {v['shuffle_exchanges']} | {v['broadcast_exchanges']} | "
        f"{', '.join(v['bad_nodes']) or '—'} |"
        for n, v in sorted(wide.items())
    ]
    out = [
        "# PLANS — physical-plan audit",
        "",
        "Generated by `python tools/gen_plans_md.py` on the sf0.1 fixtures",
        "(AQE disabled for the audit so codegen span ids are visible in the",
        "static plan; no cached tables — the cold plan a cluster would compile).",
        "Positive complement to tests/test_plan_audit.py's forbidden-node",
        "gate: shuffles are counted, small sides broadcast, scans pruned,",
        "and expression work sits inside WholeStageCodegen spans.",
        "",
        "Exchange counts are from the static plan; AQE may further coalesce",
        "or convert shuffles at runtime (join_aqe_choice exists to prove it).",
        "`sim_cosine_exact`'s BroadcastNestedLoopJoin is the DELIBERATE",
        "whitelisted design (10 broadcast query vectors × corpus — see",
        "tests/test_plan_audit.py), not an accident.",
        "",
        "## Headline detail",
        "",
        "| query | shuffle Exchange | BroadcastExchange | codegen spans | scan pruning | forbidden nodes |",
        "| --- | --- | --- | --- | --- | --- |",
        *rows,
        "",
        "## Scan-pushdown detail (PushedFilters / PartitionFilters)",
        "",
        *details,
        "",
        "## Registry-wide shuffle budget (PLANS_BASELINE.json)",
        "",
        f"All {len(wide)} statically-auditable queries; the committed",
        "baseline is the regression gate — `python tools/gen_plans_md.py",
        "--check` fails on any shuffle-count increase or new forbidden",
        "node. Effectful queries (sinks/streams/iterative fits,",
        f"{len(skipped)} of them) are excluded by",
        "pycaim_spark/planaudit.py `is_effectful` and audited in their",
        "tests instead.",
        "",
        "| query | shuffle Exchange | BroadcastExchange | forbidden nodes |",
        "| --- | --- | --- | --- |",
        *wide_rows,
        "",
    ]
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(
        f"wrote {path} ({len(AUDIT)} detail + {len(wide)} sweep) and "
        f"{BASELINE_PATH}"
    )


if __name__ == "__main__":
    if "--check" in sys.argv:
        sys.exit(check())
    main()
