"""Join plan-shape asserts: the chosen physical strategy is part of the
operator's contract (SURVEY.md §5.3) — a broadcast join that silently
becomes a shuffle join is a 100 TB regression even when results match."""

from __future__ import annotations

from pycaim_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_join_broadcast_uses_broadcast_hash(spark, sf_dir):
    plan = _plan(REGISTRY["join_broadcast"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_join_shuffle_hash_uses_shuffled_hash(spark, sf_dir):
    plan = _plan(REGISTRY["join_shuffle_hash"].fn(spark, sf_dir))
    assert "ShuffledHashJoin" in plan


def test_join_sort_merge_uses_smj(spark, sf_dir):
    plan = _plan(REGISTRY["join_sort_merge"].fn(spark, sf_dir))
    assert "SortMergeJoin" in plan


def test_join_theta_uses_nested_loop(spark, sf_dir):
    plan = _plan(REGISTRY["join_theta"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_join_asof_left_keeps_viewless_purchases(spark, sf_dir):
    """Purchases by users with no prior view must appear with null ts."""
    from pycaim_spark.catalog import load_table
    import pyspark.sql.functions as F

    rows = REGISTRY["join_asof"].fn(spark, sf_dir).collect()

    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(rows) == n_purchases  # exactly one output row per purchase
