"""Relational-op semantics beyond the order-insensitive oracle hash:
sortedness, round-trip equality for sinks/sources, and plan-shape asserts
(pushdown/pruning — the properties that matter at 100 TB)."""

from __future__ import annotations

from pycaim_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_pruned_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = REGISTRY["scan_pruned"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)" in plan
    # ReadSchema must include the filter column + 3 projected, nothing more.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"):
        assert col in read_schema
    assert "l_returnflag" not in read_schema and "l_shipdate" not in read_schema


def test_limit_topk_uses_take_ordered(spark, sf_dir):
    df = REGISTRY["limit_topk"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)


def test_sort_multi_is_actually_sorted(spark, sf_dir):
    rows = REGISTRY["sort_multi"].fn(spark, sf_dir).collect()
    keys = [(r.c_mktsegment, -r.c_acctbal, r.c_custkey) for r in rows]
    assert keys == sorted(keys)


def test_sink_parquet_round_trip(spark, sf_dir):
    from pycaim_spark.catalog import load_table

    reread = {
        (r.l_returnflag, r.cnt)
        for r in REGISTRY["sink_parquet"].fn(spark, sf_dir).collect()
    }
    import pyspark.sql.functions as F

    direct = {
        (r.l_returnflag, r.cnt)
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert reread == direct


def test_csv_json_round_trips_preserve_rows(spark, sf_dir):
    from pycaim_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    expected = {tuple(r) for r in docs.collect()}
    for name in ("source_csv", "source_json"):
        got = {tuple(r) for r in REGISTRY[name].fn(spark, sf_dir).collect()}
        assert got == expected, f"{name} round-trip lost rows"


def test_csv_malformed_quarantines_exactly_the_planted_lines(spark, sf_dir):
    """source_csv_malformed rows-only gate: the three planted corrupt lines
    (bad numeric, short row, garbage) are quarantined — no more, no fewer —
    and every clean events row still parses."""
    from pycaim_spark.catalog import load_table

    out = REGISTRY["source_csv_malformed"].fn(spark, sf_dir).collect()
    total = sum(r.n_rows for r in out)
    quarantined = sum(r.n_quarantined for r in out)
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == n_events + 3
    assert quarantined == 3
    # PERMISSIVE keeps the parseable fields of a corrupt row: the bad-
    # numeric line still carries event_type 'click', the short row
    # 'purchase' — so the quarantine is attributable per source.
    by_type = {r.event_type: r.n_quarantined for r in out}
    assert by_type.get("click", 0) >= 1 and by_type.get("purchase", 0) >= 1
    assert by_type.get(None, 0) == 1  # the garbage line parses nothing
