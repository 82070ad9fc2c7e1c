"""Storage-layout plan assertions: partition pruning actually prunes and
bucketed joins actually avoid the shuffle — checked on the physical plan,
not just on results (SURVEY.md §7.9)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_sink_partitioned_prunes_partitions(spark, sf_dir):
    df = REGISTRY["sink_partitioned"].fn(spark, sf_dir)
    plan = _plan(df)
    # The status predicate must be a partition filter (directory pruning),
    # not a data filter evaluated per row.
    assert "PartitionFilters" in plan
    part_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "o_orderstatus" in part_line
    # Results equal the unpartitioned filter.
    direct = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .count()
    )
    assert df.count() == direct


def test_join_bucketed_has_no_exchange(spark, sf_dir):
    df = REGISTRY["join_bucketed"].fn(spark, sf_dir)
    # Simple-mode plan: formatted mode puts a node's name and its
    # Arguments on separate lines, which made the key-level substring
    # asserts below vacuously true (they never matched anything).
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    # Co-located bucketed join: no shuffle may appear below the join.
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "l_orderkey" not in line, line
            assert "o_orderkey" not in line, line
    # And the result matches the plain-join twin.
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    twin = {
        (r.o_orderstatus, r.n_lines)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .collect()
    }
    got = {(r.o_orderstatus, r.n_lines) for r in df.collect()}
    assert got == twin


def test_join_dpp_injects_runtime_partition_filter(spark, sf_dir):
    """join_dpp plan gate: the fact scan must carry a
    dynamicpruningexpression under PartitionFilters — runtime pruning from
    the dim side, not a static filter and not a full scan."""
    df = REGISTRY["join_dpp"].fn(spark, sf_dir)
    plan = _plan(df)
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "dynamicpruning" in part_lines[0]
    [row] = df.collect()
    expected = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .count()
    )
    assert (row.label, row.n) == ("finished", expected)


def test_sink_compact_collapses_files_and_preserves_rows(spark, sf_dir):
    """sink_compact rows-only gate: the rewrite collapses the 64-shard
    fragmented copy to ceil(bytes / 128 MiB) files (one at fixture scale)
    and every row survives byte-identically."""
    import os

    from pycaim_spark.queries import relational

    df = REGISTRY["sink_compact"].fn(spark, sf_dir)

    def n_parquet(sub):
        # NOT _scratch(): that helper rmtree's the path it returns.
        path = os.path.join(relational._SCRATCH, sub)
        return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))

    assert n_parquet("compact_frag") == 64
    assert n_parquet("compact_out") == 1  # fixture ≪ 128 MiB
    got = sorted(
        (r.o_orderkey, r.o_custkey, r.o_totalprice) for r in df.collect()
    )
    src = load_table(spark, sf_dir, "orders")
    expected = sorted(
        (r.o_orderkey, r.o_custkey, r.o_totalprice) for r in src.collect()
    )
    assert got == expected


def test_sink_orc_round_trip_and_pushdown(spark, sf_dir):
    """sink_orc rows-only gate: ORC round-trip preserves rows exactly and
    the ORC scan pushes the filter down."""
    from pycaim_spark.catalog import load_table

    df = REGISTRY["sink_orc"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderpriority" in plan
    got = sorted((r.o_orderkey, r.o_totalprice) for r in df.collect())
    src = load_table(spark, sf_dir, "orders").filter(
        "o_orderpriority = '1-URGENT'")
    expected = sorted((r.o_orderkey, r.o_totalprice) for r in src.collect())
    assert got == expected


def _bits(rows):
    import struct

    out = []
    for r in rows:
        out.append(tuple(
            struct.pack(">d", v).hex() if isinstance(v, float) else v
            for v in r
        ))
    return sorted(out, key=str)


def test_tpch_bucketed_twins_match_shipped_forms(spark):
    """The bucketed-layout twins (q3/q10/q21, round 12 — q5/q18 landed
    earlier and are parity-gated) are ALTERNATE PHYSICAL FORMS of the
    shipped queries: same oracle SQL, so rows and float bits must match
    the shipped form exactly on every fixture. q21 is the strongest
    check — the bucketed body replaces the EXISTS/NOT-EXISTS pair with
    per-order countDistinct facts, and this asserts that rewrite is
    row-for-row equivalent, not just plausible."""
    for q in ("tpch_q3", "tpch_q10", "tpch_q21"):
        for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            shipped = _bits(REGISTRY[q].fn(spark, d).collect())
            bucketed = _bits(REGISTRY[f"{q}_bucketed"].fn(spark, d).collect())
            assert bucketed == shipped, (q, d)
            assert bucketed, (q, d)  # non-empty at both gate scales


def _plan_simple(df) -> str:
    """Simple-mode physical plan: unlike "formatted" (which splits a
    node's name and its Arguments onto separate detail lines), simple
    mode renders `Exchange hashpartitioning(keys...)` as ONE line, so
    key-level substring asserts actually bite."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_tpch_bucketed_plans_shuffle_nothing_on_orderkey(spark, sf_dir):
    """The point of the orderkey-bucketed layout is that NO plan ever
    exchanges on the order key again — assert it on the physical plan.
    q3 is the zero-shuffle showcase: its grouping set CONTAINS the bucket
    key, so even the aggregate runs bucket-locally and the whole plan's
    only movement is one broadcast + the TakeOrdered top-10. q21's
    stacked per-(order,supplier)→per-order aggregates must both stay
    bucket-local (the countDistinct spelling would re-cluster through
    Expand — the regression this test pins against)."""
    plans = {
        q: _plan_simple(REGISTRY[q].fn(spark, sf_dir))
        for q in ("tpch_q3_bucketed", "tpch_q10_bucketed",
                  "tpch_q21_bucketed")
    }
    for q, plan in plans.items():
        assert "SortMergeJoin" in plan, q
        for line in plan.splitlines():
            if "Exchange hashpartitioning" not in line:
                continue
            assert "l_orderkey" not in line, (q, line)
            assert "o_orderkey" not in line, (q, line)
            assert "q_orderkey" not in line, (q, line)
    # q3: no shuffle exchange AT ALL (the group keys contain the bucket
    # key; the top-10 is TakeOrderedAndProject, not a sort exchange).
    q3 = plans["tpch_q3_bucketed"]
    assert "Exchange hashpartitioning" not in q3
    assert "Exchange rangepartitioning" not in q3
    # q21: exactly one hash exchange (the per-s_name count) plus the
    # output sort — nothing fact-sized moves.
    q21_hash = [l for l in plans["tpch_q21_bucketed"].splitlines()
                if "Exchange hashpartitioning" in l]
    assert len(q21_hash) == 1 and "s_name" in q21_hash[0], q21_hash


def test_bucketed_layout_concurrent_build_regen_gc(
    spark, tmp_path, monkeypatch
):
    """Round 13 (VERDICT r12 #3 + ADVICE r12), GC semantics hardened
    round 14 (ADVICE r13): the bucketed-layout builder is (a) race-safe —
    two concurrent cold builds, serialized by the layout-root flock with
    a double-checked ``_SUCCESS`` re-test, produce ONE valid layout that
    both callers can query; (b) bucket-count-keyed — a different
    ``buckets`` yields a distinct slug and a rebuild, and the superseded
    slug is TOMBSTONED (catalog dropped, ``superseded.json`` written) but
    its files survive the grace period so in-flight readers don't crash
    mid-scan; (c) fingerprint-keyed — in-place regeneration (same bytes,
    new mtime_ns) rebuilds, and a past-grace tombstone is deleted by the
    NEXT cold build's GC pass; (d) marker-less legacy/crashed-build dirs
    are age-collected, while fresh marker-less dirs (a build in progress)
    are kept; (e) the warm attach path is lock-free — it completes while
    another process holds the layout-root flock (ADVICE r13: the locked
    warm path parked every bench child behind any concurrent cold
    build); (f) re-attaching to a tombstoned slug resurrects it."""
    import json
    import os
    import shutil
    import time
    from concurrent.futures import ThreadPoolExecutor

    from pycaim_spark.operators.dedup import _store_write_lock
    from pycaim_spark.queries.advanced import (
        _bucketed_orderkey_layout,
        _layout_fingerprint,
    )
    from pycaim_spark.queries.relational import _SCRATCH

    # Fixed long grace; phase-2 deletion is exercised by AGING one
    # specific tombstone's recorded ts below (grace=0 instead cascades:
    # every pass collects every tombstone laid seconds earlier, including
    # the other table's — which forces rebuilds mid-test).
    monkeypatch.setenv("PYCAIM_LAYOUT_GC_GRACE", "3600")
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    for t in ("lineitem", "orders"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    os.path.join(corpus, f"{t}.parquet"))
    layout_root = os.path.join(_SCRATCH, "bucketed_tpch")

    def slugs_for(table: str, live_only: bool = True) -> list[str]:
        out = []
        for sib in sorted(os.listdir(layout_root)):
            marker = os.path.join(layout_root, sib, "source.json")
            if not os.path.exists(marker):
                continue
            with open(marker) as f:
                meta = json.load(f)
            if (meta["sf_dir"], meta["table"]) == (
                os.path.abspath(corpus), table,
            ) and not (
                live_only
                and os.path.exists(
                    os.path.join(layout_root, sib, "superseded.json"))
            ):
                out.append(sib)
        return out

    fake_aged = os.path.join(layout_root, "zz_aged_markerless")
    fake_fresh = os.path.join(layout_root, "zz_fresh_markerless")
    try:
        src_rows = load_table(spark, corpus, "lineitem").count()

        # (a) concurrent cold builds -> one valid layout, both usable.
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(_bucketed_orderkey_layout, spark, corpus)
                    for _ in range(2)]
            results = [f.result() for f in futs]
        assert results[0][0].count() == src_rows
        assert results[1][0].count() == src_rows
        assert len(slugs_for("lineitem")) == 1
        assert len(slugs_for("orders")) == 1
        slug32 = slugs_for("lineitem")[0]
        orders32 = slugs_for("orders")[0]

        # (b) bucket count is part of the key: buckets=8 is a new slug;
        # the 32-bucket slug is tombstoned (catalog dropped) but its
        # files survive the grace period for in-flight readers.
        lib8, _ = _bucketed_orderkey_layout(spark, corpus, buckets=8)
        assert lib8.count() == src_rows
        assert slugs_for("lineitem") != [slug32]
        assert len(slugs_for("lineitem")) == 1
        assert not spark.catalog.tableExists(f"tpch_b_lineitem_{slug32}")
        assert os.path.exists(
            os.path.join(layout_root, slug32, "superseded.json"))
        assert os.path.exists(os.path.join(layout_root, slug32))

        # (d-setup) marker-less dirs: one aged (legacy/crashed build),
        # one fresh (a concurrent build in progress looks like this).
        os.makedirs(fake_aged)
        os.utime(fake_aged, (time.time() - 7200, time.time() - 7200))
        os.makedirs(fake_fresh)
        # Age the (b) tombstone past the grace so (c)'s GC pass collects
        # exactly this slug and nothing else.
        tomb32 = os.path.join(layout_root, slug32, "superseded.json")
        with open(tomb32, "w") as f:
            json.dump({"ts": time.time() - 7200}, f)

        # (c) in-place regeneration: same bytes, new mtime_ns -> new
        # fingerprint (the r12 two-scalar fingerprint collided here),
        # rebuild; this pass's GC collects the (b) tombstone (aged past
        # grace above) and freshly tombstones the 8-bucket slug.
        slug8 = slugs_for("lineitem")[0]
        fp_before = _layout_fingerprint(
            os.path.join(corpus, "lineitem.parquet"))
        shutil.copy(f"/root/testdata/sf0.001/lineitem.parquet",
                    os.path.join(corpus, "lineitem.parquet"))
        assert _layout_fingerprint(
            os.path.join(corpus, "lineitem.parquet")) != fp_before
        lib_new, _ = _bucketed_orderkey_layout(spark, corpus)
        assert lib_new.count() == src_rows
        assert len(slugs_for("lineitem")) == 1
        assert slugs_for("lineitem") != [slug8]
        assert not os.path.exists(os.path.join(layout_root, slug32))
        assert os.path.exists(
            os.path.join(layout_root, slug8, "superseded.json"))
        assert not spark.catalog.tableExists(f"tpch_b_lineitem_{slug8}")
        # (d) the lineitem cold build's GC pass also swept marker-less
        # dirs: aged collected, fresh kept.
        assert not os.path.exists(fake_aged)
        assert os.path.exists(fake_fresh)
        # (f) the orders pass re-attached to its (b)-tombstoned 32-bucket
        # slug (orders' fingerprint didn't change) and resurrected it:
        # the tombstone is gone and the slug is live again.
        assert orders32 in slugs_for("orders")
        assert spark.catalog.tableExists(f"tpch_b_orders_{orders32}")

        # (e) warm attach is lock-free: with the layout-root flock held
        # by "another process", the already-attached layout still serves.
        with _store_write_lock(layout_root):
            with ThreadPoolExecutor(1) as ex:
                fut = ex.submit(_bucketed_orderkey_layout, spark, corpus)
                lib_warm, _ = fut.result(timeout=60)
        assert lib_warm.count() == src_rows
    finally:
        # tmp_path is unique per run: drop this corpus's tables and slug
        # dirs (tombstoned included) so repeated pytest runs don't
        # accumulate dead layouts.
        for t in ("lineitem", "orders"):
            for sib in slugs_for(t, live_only=False):
                spark.sql(f"DROP TABLE IF EXISTS tpch_b_{t}_{sib}")
                shutil.rmtree(os.path.join(layout_root, sib),
                              ignore_errors=True)
        for fake in (fake_aged, fake_fresh):
            shutil.rmtree(fake, ignore_errors=True)


def test_tpch_q10_bucketed_semi_arm_matches(spark):
    """PYCAIM_Q10_FORM=semi (the broadcast left-semi selective-side
    filter arm, round 13) is an alternate physical form of
    tpch_q10_bucketed: rows and float bits must match the shipped form
    exactly at both gate scales."""
    import os

    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        shipped = _bits(REGISTRY["tpch_q10_bucketed"].fn(spark, d).collect())
        os.environ["PYCAIM_Q10_FORM"] = "semi"
        try:
            semi = _bits(REGISTRY["tpch_q10_bucketed"].fn(spark, d).collect())
        finally:
            del os.environ["PYCAIM_Q10_FORM"]
        assert semi == shipped and shipped, d


def test_incremental_layout_plan_states_and_files(spark, sf_dir):
    """The incremental layout lifecycle's three claims (round 14):

    (a) APPEND preserves co-location — the post-append Q3 plan still has
        zero Exchange on the order key — but forfeits the trusted
        per-bucket sort order (two files per bucket), so Spark
        re-inserts per-task SMJ sorts;
    (b) COMPACTION (one file per bucket, rewritten from the parquet
        files, not the bucketed scan) restores the sort-free merge:
        zero Sort nodes with the outputOrdering conf the layout sets;
    (c) both states return bit-identical Q3 results to the one-shot
        layout (the oracle gate checks them against DuckDB separately).
    File-count invariant: appended dir has exactly 2 files per bucket,
    compacted dir exactly 1."""
    import os
    import re

    from pycaim_spark.queries.advanced import _incremental_orderkey_layout
    from pycaim_spark.queries.relational import _SCRATCH

    ref = _bits(REGISTRY["tpch_q3_bucketed"].fn(spark, sf_dir).collect())
    append_df = REGISTRY["tpch_q3_layout_append"].fn(spark, sf_dir)
    compact_df = REGISTRY["tpch_q3_layout_compacted"].fn(spark, sf_dir)
    assert _bits(append_df.collect()) == ref and ref
    assert _bits(compact_df.collect()) == ref

    sorts = re.compile(r"Sort \[")
    for df, state in ((append_df, "append"), (compact_df, "compact")):
        plan = _plan_simple(df)
        assert "SortMergeJoin" in plan, state
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "l_orderkey" not in line, (state, line)
                assert "o_orderkey" not in line, (state, line)
        n_sorts = len(sorts.findall(plan))
        if state == "append":
            assert n_sorts >= 1, plan
        else:
            assert n_sorts == 0, plan

    # File-count invariant per state (lineitem table of this corpus).
    lib_a, _ = _incremental_orderkey_layout(spark, sf_dir)
    lib_c, _ = _incremental_orderkey_layout(spark, sf_dir, compacted=True)
    import hashlib

    from pycaim_spark.queries.advanced import _layout_fingerprint

    src = os.path.join(sf_dir, "lineitem.parquet")
    slug = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:32:incr:"
        f"{_layout_fingerprint(src)}".encode()
    ).hexdigest()[:8]
    slug_dir = os.path.join(_SCRATCH, "bucketed_tpch", slug)
    n_app = len([f for f in os.listdir(os.path.join(slug_dir, "lineitem"))
                 if f.endswith(".parquet")])
    n_cmp = len([f for f in os.listdir(os.path.join(slug_dir, "lineitem_c"))
                 if f.endswith(".parquet")])
    # The real invariant is ≤2 files per bucket pre-compaction (base +
    # at most one delta file) and exactly 1 after; the delta only lands
    # a file in buckets its `orderkey % 7 == 0` rows hash into, so an
    # alternate corpus with a delta-empty bucket legitimately writes
    # fewer than 64 files (r14 ADVICE — don't pin the corpus accident).
    assert 32 < n_app <= 64, n_app
    assert n_cmp == 32, n_cmp
    # Idempotency: repeated calls attach (marker-guarded), never
    # double-insert the delta — row counts stay at the full corpus.
    full_rows = load_table(spark, sf_dir, "lineitem").count()
    assert lib_a.count() == full_rows
    assert lib_c.count() == full_rows
    lib_a2, _ = _incremental_orderkey_layout(spark, sf_dir)
    assert lib_a2.count() == full_rows


def test_upserted_layout_bucket_local_rewrite(spark, sf_dir):
    """The CDC upsert motion's three claims (round 15):

    (a) BUCKET-LOCAL: only the buckets the CDC keys hash into are
        rewritten. The clone preserves the compacted state's file NAMES,
        and a rewrite installs fresh staged names — so name identity
        between ``orders_c`` and ``orders_u`` is a per-bucket 'was this
        file rewritten?' bit that needs no before/after timing.
    (b) The upserted table keeps ONE sorted file per bucket, so the Q3
        plan over it has zero Exchange on the order key AND zero SMJ
        sorts (the compacted plan's shape — append is the state that
        pays sorts).
    (c) MERGE semantics: full rows = orders − deletes, updates replace
        in place (count unchanged by updates); attach is idempotent.
    Value correctness vs the upsert-CTE DuckDB oracle is the registry
    gate's job (tpch_q3_layout_upserted)."""
    import hashlib
    import json
    import os
    import re

    from pycaim_spark.queries.advanced import (
        _layout_fingerprint,
        _upserted_orderkey_layout,
    )
    from pycaim_spark.queries.relational import _SCRATCH

    upserted_df = REGISTRY["tpch_q3_layout_upserted"].fn(spark, sf_dir)
    assert upserted_df.count() > 0

    src = os.path.join(sf_dir, "orders.parquet")
    slug = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:32:incr:"
        f"{_layout_fingerprint(src)}".encode()
    ).hexdigest()[:8]
    slug_dir = os.path.join(_SCRATCH, "bucketed_tpch", slug)
    with open(os.path.join(slug_dir, "upsert_orders.json")) as f:
        touched = set(json.load(f)["touched_buckets"])
    assert touched, "CDC batch must touch at least one bucket"

    bucket_re = re.compile(r"_(\d{5})\.c\d{3}\.")

    def files_by_bucket(d):
        out = {}
        for fn in os.listdir(d):
            m = bucket_re.search(fn)
            if m and not fn.startswith("."):  # skip .crc sidecars
                out.setdefault(int(m.group(1)), []).append(fn)
        return out

    c_files = files_by_bucket(os.path.join(slug_dir, "orders_c"))
    u_files = files_by_bucket(os.path.join(slug_dir, "orders_u"))
    untouched = set(c_files) - touched
    # Precondition, not a pinned count (r14 ADVICE lesson): the fixture's
    # ~21 CDC keys cannot hash into all 32 buckets for the test to mean
    # anything, but the exact split is the corpus's business.
    assert untouched, "fixture CDC batch unexpectedly touched every bucket"
    for b in sorted(c_files):
        assert len(u_files.get(b, ())) == 1, (b, u_files.get(b))
        if b in touched:
            assert u_files[b] != c_files[b], f"bucket {b} not rewritten"
        else:
            assert u_files[b] == c_files[b], \
                f"untouched bucket {b} was rewritten"

    # (b) plan shape: co-located AND sort-free.
    plan = _plan_simple(upserted_df)
    assert "SortMergeJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "l_orderkey" not in line, line
            assert "o_orderkey" not in line, line
    assert not re.search(r"Sort \[", plan), plan

    # (c) MERGE row accounting + idempotent attach.
    lib, ou = _upserted_orderkey_layout(spark, sf_dir)
    full = load_table(spark, sf_dir, "orders")
    n_del = full.filter("o_orderkey % 503 = 0").count()
    assert ou.count() == full.count() - n_del
    lib2, ou2 = _upserted_orderkey_layout(spark, sf_dir)
    assert ou2.count() == full.count() - n_del


def test_tpch_q21_bucketed_diamond_arm_matches(spark):
    """PYCAIM_Q21_SHAPE=diamond (the r13 two-aggregate shape, demoted to
    the arm when r14's canary-gated series flipped the default to the
    one-pass window form — see tpch_q21_bucketed's docstring) stays
    bit-identical to the shipped window form at both gate scales."""
    import os

    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        shipped = _bits(REGISTRY["tpch_q21_bucketed"].fn(spark, d).collect())
        os.environ["PYCAIM_Q21_SHAPE"] = "diamond"
        try:
            dia = _bits(REGISTRY["tpch_q21_bucketed"].fn(spark, d).collect())
        finally:
            del os.environ["PYCAIM_Q21_SHAPE"]
        assert dia == shipped and shipped, d
