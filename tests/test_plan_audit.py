"""Fleet-wide physical-plan audit (SURVEY.md §4): no query may regress into
an accidental cartesian product or row-at-a-time Python evaluation. These
are the two silent 100 TB killers — results stay correct while cost
explodes, so only a plan assertion catches them."""

from __future__ import annotations

import pytest

from pycaim_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

# Queries whose plans legitimately contain the flagged operator.
CARTESIAN_OK = {
    "join_cross",        # the cartesian operator itself
    "join_theta",        # BroadcastNestedLoop is the theta-join plan
    "sim_cosine_exact",  # broadcast query-set × corpus is the intended scan
    "dedup_embedding",   # all-pairs baseline, guarded: raises above
                         # PYCAIM_ALLPAIRS_MAX_ROWS rows instead of running
                         # O(n²) at corpus scale (test_llm_ops.py asserts)
    "ts_resample",       # 1-row bounds × spine explode
    "agg_stats",         # scalar subquery for percentile uses a 1-row BNLJ
}
ROW_PYTHON_OK = {
    "udf_python",        # the deliberately-row-at-a-time surface row
    "udtf_python",       # Python UDTF evaluation is row-based by contract
}

# Plans are built lazily (no execution) — auditing all queries is cheap,
# except those that must RUN a side effect to build their final plan.
SKIP_EFFECTFUL = {
    "sink_parquet", "source_csv", "source_json", "sink_partitioned",
    "join_bucketed", "source_stream", "stream_watermark_agg",
    "stream_dedup_watermark", "stream_stateful", "stream_sink",
    "caim_fit", "caim_transform", "caim_mllib_stage",
}


@pytest.mark.parametrize(
    "name", sorted(n for n in REGISTRY if n not in SKIP_EFFECTFUL)
)
def test_plan_has_no_silent_scale_killers(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: unplanned cartesian"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unplanned nested-loop join"
        )
    if name not in ROW_PYTHON_OK:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python in the plan"
        )
