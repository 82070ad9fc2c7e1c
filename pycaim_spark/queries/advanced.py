"""Advanced relational surface: subqueries (Catalyst decorrelation),
TPC-H-shaped composite queries, exact distribution statistics, unpivot,
null semantics, distribution windows, and time-series resampling.

The subquery/composite queries go through ``spark.sql`` over registered
temp views — exercising the SQL entry point of the engine (SURVEY.md §3.1
applies identically; the SQL parser feeds the same Catalyst pipeline).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table, register_temp_views
from pycaim_spark.functions.exact import cents, fsum
from pycaim_spark.registry import register


@register(
    "subq_scalar",
    tags=("subquery",),
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 3 * (SELECT MIN(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
)
def subq_scalar(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates to an aggregate
    + join (SURVEY §4 subquery decorrelation). MIN keeps it float-exact."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 3 * (SELECT MIN(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "subq_in",
    tags=("subquery",),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
      AND c_custkey NOT IN (SELECT user_id FROM events
                            WHERE event_type = 'error')
    """,
)
def subq_in(spark, sf_dir):
    """IN + NOT IN subqueries (rewritten to semi/anti joins by Catalyst).

    Null caveat: NOT IN over a nullable column would be three-valued; both
    key columns here are non-null fixtures, so semantics align.
    """
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
          AND c_custkey NOT IN (SELECT user_id FROM events
                                WHERE event_type = 'error')
        """
    )


_Q3_SQL = """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2)))
                AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@register("tpch_q3", tags=("composite", "flagship"), oracle=_Q3_SQL)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (SURVEY §5: mirrored TPC-H query shapes): shipping
    priority — 3-way join, filtered both sides, group-agg, top-10.

    Plan at scale: customer filter broadcast into orders, SMJ/SHJ to
    lineitem on the shuffled orderkey, partial agg before the final
    TakeOrdered. Ships the SQL-decimal form: the r11 fixed-point
    conversion was a wash at sf10 (ISOLATE_r11.json
    `tpch_fixedpoint_paired_series` — the join, not the aggregate,
    dominates this shape) and a measured REGRESSION at sf0.1, the
    driver's bench scale (ISOLATE_r12.json
    `tpch_fixedpoint_sf01_paired_series`: SQL wins 4/4 order-alternating
    paired rounds, ~1.21 vs ~1.62 s). PYCAIM_TPCH_FORM=fixedpoint keeps
    the losing arm runnable for the A/B harness (tools/tpch_series.py);
    both forms are bit-identical (tests/test_aggregates.py)."""
    register_temp_views(spark, sf_dir)
    if os.environ.get("PYCAIM_TPCH_FORM") == "fixedpoint":
        return _tpch_q3_fixedpoint(spark, sf_dir)
    return spark.sql(_Q3_SQL)


def _tpch_q3_fixedpoint(spark, sf_dir):
    """The r11 fixed-point DataFrame arm, demoted from the production
    body by the r12 sf0.1 adjudication (see tpch_q3's docstring)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate")
        < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate")
        > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    disc_price = cents("l_extendedprice") * (
        F.lit(100).cast("long") - cents("l_discount")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(fsum(disc_price, 4, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q5_SQL = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2)))
                AS DOUBLE) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


@register("tpch_q5", tags=("composite",), oracle=_Q5_SQL)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape: local-supplier volume — 5-way star join with a
    region filter cascading through broadcast dims. Ships the SQL-decimal
    form (see tpch_q3's docstring: fixed-point was a wash at sf10 and a
    4/4 paired regression at sf0.1 — ISOLATE_r12.json
    `tpch_fixedpoint_sf01_paired_series`). For the orderkey-bucketed
    layout that removes this query's dominant 60 M-row shuffle join, see
    tpch_q5_bucketed."""
    register_temp_views(spark, sf_dir)
    if os.environ.get("PYCAIM_TPCH_FORM") == "fixedpoint":
        return _tpch_q5_fixedpoint(spark, sf_dir)
    return spark.sql(_Q5_SQL)


def _tpch_q5_fixedpoint(spark, sf_dir):
    """The r11 fixed-point DataFrame arm, demoted from the production
    body by the r12 sf0.1 adjudication (see tpch_q3's docstring)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate")
           < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = cents("l_extendedprice") * (
        F.lit(100).cast("long") - cents("l_discount")
    )
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == F.col("n_nationkey"))
        .join(o, o.o_custkey == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(fsum(disc_price, 4, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def _layout_fingerprint(path: str) -> str:
    """Digest of the sorted (relative-name, size, mtime_ns) tuples of every
    file under ``path`` (or of the single file). Round 13 (ADVICE r12): the
    previous total-bytes + whole-second-newest-mtime pair collides when a
    deterministic corpus is regenerated in place within the same second at
    an identical byte size — exactly the stale-layout serve the fingerprint
    exists to prevent. st_mtime_ns plus per-file identity makes that
    collision require a byte-for-byte-indistinguishable rewrite."""
    import hashlib

    h = hashlib.md5()
    if os.path.isdir(path):
        entries = []
        for root, _dirs, files in os.walk(path):
            for f in files:
                full = os.path.join(root, f)
                st = os.stat(full)
                entries.append(
                    (os.path.relpath(full, path), st.st_size, st.st_mtime_ns)
                )
        for e in sorted(entries):
            h.update(repr(e).encode())
    else:
        st = os.stat(path)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def _bucketed_orderkey_layout(spark, sf_dir, buckets: int = 32):
    """PERSISTED lineitem/orders layout bucketed (and per-bucket sorted)
    on orderkey — the standard 100 TB answer to a recurring fact-fact
    join: pay one shuffle at ingest, then every orderkey join is a
    co-located merge with ZERO Exchange on either fact. Built once per
    sf_dir under the scratch root (NOT the per-call ``_scratch`` wiper);
    later sessions — including fresh-JVM bench children — re-attach via
    external-table DDL over the existing bucketed files, so steady-state
    timings measure the query path, same convention as the persisted ANN
    index (sim_ivf_pq_stored). ``repartition(buckets, key)`` before the
    write yields exactly one file per bucket, which is the PRECONDITION
    for Spark trusting the per-bucket sort order — but since Spark 3.0
    that trust is additionally gated behind
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` (default
    false), so without it every co-located SMJ still pays a per-task
    sort of the (already sorted) bucket. Round 14 discovered this while
    building the incremental append path: this function now sets the
    conf on the session (runtime-settable, same convention as
    catalog.load_table's nanosAsLong) unless $PYCAIM_BUCKET_SORTED_SCAN
    is "0" — the A/B arm. Spark itself re-checks the one-file-per-bucket
    precondition per scan and re-inserts sorts where it fails (e.g. the
    post-append multi-file state, `_incremental_orderkey_layout`), so
    correctness never rests on the env value. Decision evidence (r15,
    after the r14 series was decay-contaminated): ISOLATE_r15.json
    `q5_sorted_scan_series_r15` — 5 order-alternating canary-gated
    fresh-JVM paired rounds of tpch_q5_bucketed at sf10, conf-ON wins
    3/5 with median 3.45 s vs 4.81 s OFF (−28%), consistent with the
    structural argument (eliding a sort of sorted data).

    Cache key = (sf_dir, buckets, per-file fingerprint of the source
    parquet). ``buckets`` is in the key (ADVICE r12): attaching DDL with a
    bucket count different from the one the files were written with would
    make Spark trust a false hash distribution and silently return wrong
    co-located joins. The fingerprint makes in-place corpus regeneration
    (tools/make_scaled_sf.py) produce a fresh slug instead of serving the
    previous corpus.

    Concurrency + GC (round 13, hardened round 14 per ADVICE r13, reusing
    the signature store's pattern — operators/dedup.py
    `_store_write_lock`): the WARM path (``_SUCCESS`` present and the
    table already in this session's catalog) is lock-free — the slug is
    content-addressed by (sf_dir, buckets, per-file fingerprint), so a
    catalog entry with this name can only ever point at these exact
    files, and taking the root flock on every warm attach would park
    every bench child behind any concurrent multi-minute cold build.
    Cold builds and DDL attaches run under the exclusive root flock with
    a double-checked ``_SUCCESS`` re-test after acquiring, so two
    fresh-JVM bench children hitting a cold layout concurrently produce
    ONE valid build (the loser re-attaches to the winner's files).

    GC is two-phase (`_gc_superseded_layouts`) because flock only
    serializes writers — readers take no lock, and an immediate rmtree
    of a superseded slug would crash any in-flight scan mid-query
    instead of merely letting it return stale rows. Phase 1 (at
    supersede time, under the lock): drop the slug from THIS session's
    catalog and tombstone it with ``superseded.json``. Phase 2 (every
    later cold build, under the lock): rmtree slugs whose tombstone —
    or, for marker-less legacy/crashed-build slugs, whose dir mtime —
    is older than $PYCAIM_LAYOUT_GC_GRACE (default 900 s). Residual
    reader-crash mode: a scan that STARTS against a tombstoned slug
    after its grace expires (only reachable from a session that cached
    the DataFrame across a corpus regeneration — it was serving stale
    rows already) dies mid-scan; other sessions' catalog entries cannot
    be dropped from here, which is why the grace period, not the DROP,
    is the protection. flock is host-local; on an object store the
    build is a table-format snapshot commit and the catalog provides
    the lock (same caveat as the signature store)."""
    import hashlib

    from pycaim_spark.operators.dedup import (
        _store_write_lock,
        _write_json_atomic,
    )
    from pycaim_spark.queries.relational import _SCRATCH

    if os.environ.get("PYCAIM_BUCKET_SORTED_SCAN") != "0":
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )

    layout_root = os.path.join(_SCRATCH, "bucketed_tpch")
    abs_sf = os.path.abspath(sf_dir)
    out = {}
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        src = os.path.join(sf_dir, f"{table}.parquet")
        fp = _layout_fingerprint(src)
        slug = hashlib.md5(
            f"{abs_sf}:{buckets}:{fp}".encode()
        ).hexdigest()[:8]
        name = f"tpch_b_{table}_{slug}"
        slug_dir = os.path.join(layout_root, slug)
        path = os.path.join(slug_dir, table)
        tomb = os.path.join(slug_dir, "superseded.json")
        # Lock-free warm fast path (ADVICE r13): content-addressed slug +
        # immutable files once _SUCCESS exists, so no lock is needed to
        # re-serve an attach this session already made. A visible
        # tombstone (another process superseded this slug — a legacy
        # marker-less supersede, or a stale-fingerprint sweep that raced
        # this caller's regeneration) sends us through the locked path,
        # which resurrects it — the slug came from the CURRENT
        # fingerprint, so its files are valid by construction. Same-bytes
        # bucket-count variants are SIBLINGS since r16 (fp-keyed GC) and
        # no longer tombstone each other.
        if (
            os.path.exists(os.path.join(path, "_SUCCESS"))
            and not os.path.exists(tomb)
            and spark.catalog.tableExists(name)
        ):
            out[table] = spark.table(name)
            continue
        with _store_write_lock(layout_root):
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                # Cold build. A concurrent builder that lost the lock race
                # lands in the re-attach branch below instead (the
                # _SUCCESS re-test above IS the double-check).
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                (
                    load_table(spark, sf_dir, table)
                    .repartition(buckets, F.col(key))
                    .write.mode("overwrite")
                    .bucketBy(buckets, key)
                    .sortBy(key)
                    .option("path", path)
                    .saveAsTable(name)
                )
                _write_json_atomic(
                    os.path.join(slug_dir, "source.json"),
                    {"sf_dir": abs_sf, "table": table, "buckets": buckets,
                     "fp": fp},
                )
                _gc_superseded_layouts(
                    spark, layout_root, slug, abs_sf, table, fp
                )
            if not spark.catalog.tableExists(name):
                df = load_table(spark, sf_dir, table)
                ddl = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in df.schema.fields
                )
                spark.sql(
                    f"CREATE TABLE {name} ({ddl}) USING PARQUET "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                    f"INTO {buckets} BUCKETS LOCATION '{path}'"
                )
                # Backfill the provenance marker for pre-r13 (marker-less)
                # slugs on attach, so GC can reason about them (ADVICE
                # r13: marker-less slugs were otherwise never collected).
                marker = os.path.join(slug_dir, "source.json")
                if not os.path.exists(marker):
                    _write_json_atomic(
                        marker,
                        {"sf_dir": abs_sf, "table": table,
                         "buckets": buckets, "fp": fp},
                    )
            # Resurrect a tombstoned-but-not-yet-collected slug we are
            # (re-)serving (e.g. a raced supersede within the grace
            # period): the slug was computed from the CURRENT
            # fingerprint, so its files are not stale for this caller,
            # and leaving the tombstone would let a later GC pass delete
            # a slug this catalog entry actively serves.
            if os.path.exists(tomb):
                os.remove(tomb)
        out[table] = spark.table(name)
    return out["lineitem"], out["orders"]


def _gc_superseded_layouts(
    spark, layout_root: str, keep_slug: str, abs_sf: str, table: str,
    fp: str | None = None,
) -> None:
    """Two-phase layout GC, called under the layout-root flock from a
    cold build (see `_bucketed_orderkey_layout`'s docstring for the
    reader-safety rationale). Phase 1 tombstones superseded same-source
    slugs (``superseded.json`` + DROP from this session's catalog);
    phase 2 deletes slugs whose tombstone — or dir mtime, for slugs with
    no ``source.json`` marker at all (pre-r13 builds, or builds that
    crashed before writing the marker) — is older than
    $PYCAIM_LAYOUT_GC_GRACE seconds (default 900). The mtime age test is
    what keeps an in-progress concurrent build safe from the marker-less
    sweep: its slug dir is seconds old."""
    import json
    import shutil
    import time

    from pycaim_spark.operators.dedup import _write_json_atomic

    grace = float(os.environ.get("PYCAIM_LAYOUT_GC_GRACE", "900"))
    now = time.time()
    for sib in os.listdir(layout_root):
        sib_dir = os.path.join(layout_root, sib)
        if sib == keep_slug or not os.path.isdir(sib_dir):
            continue
        marker = os.path.join(sib_dir, "source.json")
        tomb = os.path.join(sib_dir, "superseded.json")
        meta = None
        if os.path.exists(marker):
            try:
                with open(marker) as f:
                    meta = json.load(f)
            except (OSError, ValueError):
                meta = None
        # Phase 1: tombstone same-(sf_dir, table) slugs whose source
        # FINGERPRINT is stale (r16). Bucket count alone is NOT staleness:
        # a 512-bucket probe layout over the same bytes is a live SIBLING
        # of the 32-bucket fixture, not a superseded version of it — the
        # pre-r16 rule (supersede on (sf_dir, table) regardless) forced a
        # tombstone/resurrect flip-flop, and a grace-expiry rebuild,
        # whenever two counts were in use at once. A changed fingerprint
        # (corpus regenerated) supersedes EVERY bucket variant — their
        # content-addressed slugs can never be served again, so they are
        # pure garbage. Legacy markers without an ``fp`` field keep the
        # old supersede-on-sight semantics (at worst one tombstone/
        # resurrect round-trip, which the locked path already handles).
        if (
            meta is not None
            and (meta.get("sf_dir"), meta.get("table")) == (abs_sf, table)
            and (fp is None or meta.get("fp") is None or meta["fp"] != fp)
            and not os.path.exists(tomb)
        ):
            # The incremental namespaces ("<table>#<ns>" markers, ns =
            # "incr" for the shared lifecycle fixture, "ip*" for the
            # in-place upsert arm's private layout) attach under
            # tpch_ia_/tpch_ic_/tpch_iu_ names; the one-shot layout under
            # tpch_b_. "#" is not a valid identifier character, so the
            # marker string itself is never used as a table name.
            if "#" in table:
                base = table.split("#", 1)[0]
                drops = [f"tpch_ia_{base}_{sib}", f"tpch_ic_{base}_{sib}",
                         f"tpch_iu_{base}_{sib}"]
            else:
                drops = [f"tpch_b_{table}_{sib}"]
            for t in drops:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            _write_json_atomic(tomb, {"ts": now})
            continue  # freshly tombstoned: full grace ahead of it
        # Phase 2: delete past-grace tombstones and aged marker-less dirs.
        ts = None
        if os.path.exists(tomb):
            try:
                with open(tomb) as f:
                    ts = float(json.load(f).get("ts", now))
            except (OSError, ValueError, TypeError):
                ts = None  # unreadable tombstone: leave for a later pass
        elif meta is None:
            try:
                ts = os.path.getmtime(sib_dir)
            except OSError:
                ts = None
        if ts is not None and now - ts > grace:
            shutil.rmtree(sib_dir, ignore_errors=True)


def _incremental_orderkey_layout(
    spark, sf_dir, buckets: int = 32, compacted: bool = False,
    ns: str = "incr", tables: tuple[str, ...] = ("lineitem", "orders"),
):
    """Incremental lifecycle for the orderkey-bucketed layout (round 14):
    at 100 TB a production layout is never REBUILT when data arrives — a
    delta batch is APPENDED into the same bucket scheme, queries keep
    running co-located, and a background COMPACTION restores the
    one-file-per-bucket invariant. This function demonstrates all three
    states on the fixture corpus, split deterministically into base
    (``orderkey % 7 != 0``, ~86%) and delta (the rest):

    - **base**: bucketBy+sortBy saveAsTable, one file per bucket — the
      same shape `_bucketed_orderkey_layout` builds.
    - **append**: the delta, repartitioned onto the SAME bucket count,
      written with ``mode("append")`` against the existing table — Spark
      validates the bucket spec and hashes the new files into the same
      buckets, so joins stay Exchange-free; but with two files per
      bucket Spark no longer trusts the per-bucket sort order and
      re-inserts per-task SMJ sorts (the measured trade of appending).
      The append is marker-guarded (``append_<table>.json`` under the
      slug, written under the layout flock) so re-runs attach instead of
      double-inserting; a crash between the INSERT and the marker can
      leave a duplicated delta — locally the flock + marker ordering
      makes the window tiny, and on an object store this step is a
      table-format transactional commit (same caveat as the signature
      store).
    - **compacted** (``compacted=True``): rewrite into a sibling table
      with one file per bucket. The rewrite reads the PARQUET FILES
      directly, not the catalog table: reading through the bucketed scan
      lets Spark elide the repartition as already-satisfied and pack
      multiple bucket-files per task, which writes multi-bucket files
      and silently loses the 1:1 task→bucket alignment (measured: 16
      files from an 8-bucket compaction; the file-read path yields
      exactly ``buckets``).

    Slug namespace: ``table#<ns>`` in the provenance marker (``ns`` =
    "incr" for the shared lifecycle fixture; the in-place upsert arm
    passes its own ``ip*`` namespace so its destructive merge never
    mutates the compacted table other queries serve), so the main
    layout's GC never treats these as superseding its slugs and vice
    versa. Returns (lineitem_df, orders_df) for the requested state."""
    import hashlib

    from pycaim_spark.operators.dedup import (
        _store_write_lock,
        _write_json_atomic,
    )
    from pycaim_spark.queries.relational import _SCRATCH

    if os.environ.get("PYCAIM_BUCKET_SORTED_SCAN") != "0":
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
    layout_root = os.path.join(_SCRATCH, "bucketed_tpch")
    abs_sf = os.path.abspath(sf_dir)
    out = {}
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        if table not in tables:
            continue
        src = os.path.join(sf_dir, f"{table}.parquet")
        fp = _layout_fingerprint(src)
        slug = hashlib.md5(
            f"{abs_sf}:{buckets}:{ns}:{fp}".encode()
        ).hexdigest()[:8]
        name = f"tpch_ia_{table}_{slug}"
        cname = f"tpch_ic_{table}_{slug}"
        slug_dir = os.path.join(layout_root, slug)
        path = os.path.join(slug_dir, table)
        cpath = os.path.join(slug_dir, f"{table}_c")
        append_marker = os.path.join(slug_dir, f"append_{table}.json")
        want_name = cname if compacted else name
        want_success = os.path.join(cpath if compacted else path, "_SUCCESS")
        # Lock-free warm fast path, as in _bucketed_orderkey_layout; the
        # appended state additionally requires the append marker (the
        # base build's _SUCCESS alone is the pre-append state). The
        # tombstone check mirrors the one-shot warm path and is
        # load-bearing (r14 ADVICE): a session whose catalog still holds
        # these entries would otherwise keep serving a slug another
        # process tombstoned — never passing through the locked path
        # that resurrects it — until GC deletes the files under the
        # actively-served table; a visible tombstone must route through
        # the locked path below, which clears it.
        if (
            os.path.exists(want_success)
            and os.path.exists(append_marker)
            and not os.path.exists(os.path.join(slug_dir, "superseded.json"))
            and spark.catalog.tableExists(want_name)
        ):
            out[table] = spark.table(want_name)
            continue
        full = load_table(spark, sf_dir, table)
        with _store_write_lock(layout_root):
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                import shutil

                spark.sql(f"DROP TABLE IF EXISTS {name}")
                # A base rebuild invalidates everything DERIVED from the
                # old base (r14 ADVICE): a surviving append marker would
                # make the `not exists(append_marker)` guard below skip
                # re-inserting the delta — the layout would silently
                # serve the ~86% base as the full corpus — and a
                # surviving compacted rewrite would serve the old bytes.
                if os.path.exists(append_marker):
                    os.remove(append_marker)
                spark.sql(f"DROP TABLE IF EXISTS {cname}")
                shutil.rmtree(cpath, ignore_errors=True)
                # ... and the UPSERT derivatives of the compacted state
                # (ADVICE r15): surviving upsert markers would warm-path
                # a stale orders_u* clone (or, in-place, skip re-merging
                # the rebuilt compacted table). Markers first (so a crash
                # mid-cleanup fails closed: no marker → full re-derive),
                # then tables, then dirs; the globs are no-ops for
                # tables that never had an upsert.
                import glob as _glob

                for um in _glob.glob(
                    os.path.join(slug_dir, "upsert*_orders.json")
                ):
                    sfx = os.path.basename(um)[
                        len("upsert"):-len("_orders.json")
                    ]
                    for t in (
                        f"tpch_iu{sfx}_orders_{slug}",
                        f"tpch_iu{sfx}_stage_orders_{slug}",
                    ):
                        spark.sql(f"DROP TABLE IF EXISTS {t}")
                    os.remove(um)
                for ud in _glob.glob(
                    os.path.join(slug_dir, "orders_u*")
                ) + _glob.glob(os.path.join(slug_dir, "orders_c_old-*")):
                    shutil.rmtree(ud, ignore_errors=True)
                (
                    full.filter(F.col(key) % 7 != 0)
                    .repartition(buckets, F.col(key))
                    .write.mode("overwrite")
                    .bucketBy(buckets, key)
                    .sortBy(key)
                    .option("path", path)
                    .saveAsTable(name)
                )
                _write_json_atomic(
                    os.path.join(slug_dir, "source.json"),
                    {"sf_dir": abs_sf, "table": f"{table}#{ns}",
                     "buckets": buckets, "fp": fp},
                )
                _gc_superseded_layouts(
                    spark, layout_root, slug, abs_sf, f"{table}#{ns}",
                    fp,
                )
            if not spark.catalog.tableExists(name):
                ddl = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in full.schema.fields
                )
                spark.sql(
                    f"CREATE TABLE {name} ({ddl}) USING PARQUET "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                    f"INTO {buckets} BUCKETS LOCATION '{path}'"
                )
            if not os.path.exists(append_marker):
                (
                    full.filter(F.col(key) % 7 == 0)
                    .repartition(buckets, F.col(key))
                    .write.mode("append")
                    .bucketBy(buckets, key)
                    .sortBy(key)
                    .option("path", path)
                    .saveAsTable(name)
                )
                _write_json_atomic(append_marker, {"appended": True})
            if compacted:
                if not os.path.exists(os.path.join(cpath, "_SUCCESS")):
                    spark.sql(f"DROP TABLE IF EXISTS {cname}")
                    (
                        spark.read.parquet(path)
                        .repartition(buckets, F.col(key))
                        .write.mode("overwrite")
                        .bucketBy(buckets, key)
                        .sortBy(key)
                        .option("path", cpath)
                        .saveAsTable(cname)
                    )
                if not spark.catalog.tableExists(cname):
                    ddl = ", ".join(
                        f"{f.name} {f.dataType.simpleString()}"
                        for f in full.schema.fields
                    )
                    spark.sql(
                        f"CREATE TABLE {cname} ({ddl}) USING PARQUET "
                        f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                        f"INTO {buckets} BUCKETS LOCATION '{cpath}'"
                    )
            # Same resurrection rule as the one-shot layout: a slug this
            # call re-derived from the CURRENT fingerprint is valid by
            # construction — clear any tombstone so GC can't delete a
            # layout the catalog is actively serving.
            tomb = os.path.join(slug_dir, "superseded.json")
            if os.path.exists(tomb):
                os.remove(tomb)
        out[table] = spark.table(want_name)
    return out.get("lineitem"), out.get("orders")


@register(
    "tpch_q3_layout_append",
    tags=("composite", "storage"),
    oracle=_Q3_SQL,
)
def tpch_q3_layout_append(spark, sf_dir):
    """TPC-H Q3 over the POST-APPEND incremental bucketed layout
    (`_incremental_orderkey_layout`: base built on ~86% of each fact,
    the remaining delta appended into the same bucket scheme). The
    correctness claim the oracle gate checks: base ∪ appended delta ==
    the full corpus, and the appended files land in the right buckets —
    a mis-bucketed append would silently DROP join matches in the
    co-located SMJ, which is exactly what the hash-compare against the
    full-table DuckDB oracle would catch. Plan shape: still zero
    Exchange on either fact (append preserves co-location); per-task
    SMJ sorts reappear because two files per bucket forfeit the trusted
    sort order — the measured cost of the appended state, removed again
    by tpch_q3_layout_compacted (tests/test_storage.py pins both plan
    states)."""
    register_temp_views(spark, sf_dir)
    lib, ob = _incremental_orderkey_layout(spark, sf_dir)
    return _q3_over_layout(spark, sf_dir, lib, ob)


@register(
    "tpch_q3_layout_compacted",
    tags=("composite", "storage"),
    oracle=_Q3_SQL,
)
def tpch_q3_layout_compacted(spark, sf_dir):
    """TPC-H Q3 over the COMPACTED incremental layout: the appended
    two-files-per-bucket state rewritten to one file per bucket
    (`_incremental_orderkey_layout(compacted=True)`), restoring the
    sort-free co-located merge — with
    spark.sql.legacy.bucketedTableScan.outputOrdering set (see
    `_bucketed_orderkey_layout`), the compacted plan carries ZERO Sort
    nodes below the join while the appended plan carries the per-task
    sorts Spark re-inserts for multi-file buckets. Same full-table
    DuckDB oracle as tpch_q3: compaction must be a pure physical
    rewrite."""
    register_temp_views(spark, sf_dir)
    lib, ob = _incremental_orderkey_layout(spark, sf_dir, compacted=True)
    return _q3_over_layout(spark, sf_dir, lib, ob)


#: CDC batch for the layout upsert, derived deterministically from the
#: orders table so Spark and the DuckDB oracle see the identical batch:
#: keys ≡0 (mod 83) are UPDATED (o_orderdate shifted +30 days — chosen
#: because it moves orders across Q3's date predicate and changes the
#: group key, so a missed or double-applied update is visible in the
#: result at both gate scales: 2 updated keys appear in the sf0.001
#: result, 11 at sf0.01), keys ≡0 (mod 503) are DELETED (1 and 3 result
#: rows respectively). Deletes take precedence on the overlap. r16 adds
#: INSERTS — the dominant CDC verb (VERDICT r15 #1): keys ≡0 (mod 113)
#: are cloned with ``o_orderkey + 10^9`` (the fixtures' orderkeys are
#: dense 0..N−1 BIGINTs at every scale incl. the replica-scaled sf10,
#: so the offset can never collide with a live key); 14 inserted rows
#: at sf0.001, 133 at sf0.01. Inserted keys have no lineitem rows, so
#: Q3 can't see them — `layout_upsert_audit` aggregates the upserted
#: table directly (per-priority counts + exact sums + an inserted-row
#: count) so a dropped/double-applied insert batch hash-fails there.
_UPSERT_UPD = "o_orderkey % 83 = 0 AND o_orderkey % 503 <> 0"
_UPSERT_DEL = "o_orderkey % 503 = 0"
_UPSERT_INS = "o_orderkey % 113 = 0"
_UPSERT_INS_OFFSET = 1_000_000_000


def _upserted_orderkey_layout(
    spark,
    sf_dir,
    buckets: int = 32,
    upd_pred: str = _UPSERT_UPD,
    del_pred: str = _UPSERT_DEL,
    ins_pred: str | None = _UPSERT_INS,
    suffix: str = "",
    inplace: bool = False,
    with_lineitem: bool = True,
    base_rel: str = "orders_c",
):
    """CDC-style MERGE (insert + update + delete) applied BUCKET-LOCALLY
    to the compacted incremental layout — the remaining production
    lifecycle motion after r14's append/compact: at 100 TB a CDC batch
    must rewrite only the buckets its keys hash into, never the table.

    Mechanics (all under the layout flock):

    1. Clone the compacted ``orders`` state into an ``orders_u`` sibling
       (file copy — the compacted table keeps serving its own queries).
       With ``inplace=True`` there is NO clone: the merge mutates the
       compacted table of a PRIVATE layout namespace (``ip<suffix>``,
       built identically, so no shared query ever reads the mutated
       table), which is the arm whose bytes accounting is honest at
       scale — the cloned form's ``copytree`` is fixture scaffolding
       that at 100 TB would itself be a full-table rewrite (VERDICT r15
       #2). Measured at sf10 (SCALING_r16.json
       `upsert_inplace_vs_clone_sf10`): the cloned arm copies the full
       242 MB table before merging; the in-place arm writes ONLY the
       touched buckets' staged rewrite (a 15-key batch: 98.3 MB at 32
       buckets, 7.8 MB = 2.9% at 512 — same batch, finer buckets,
       proportionally fewer bytes, the amortization VERDICT r15 #6
       asked to see measured) and renames old files aside with zero
       byte copy.
    2. Compute the touched buckets driver-side as
       ``pmod(hash(key), buckets)`` over the CDC keys — update/delete
       keys AND the insert batch's NEW keys (which hash-route into
       their buckets exactly like resident keys; ``F.hash`` is the same
       Murmur3(seed 42) Spark's ``HashPartitioning`` derives bucket ids
       from, and the staging step ASSERTS that parity: any staged file
       landing outside the predicted set fails loudly rather than
       mis-placing rows). An empty batch (predicates matching nothing
       at this scale) short-circuits: marker with ``touched_buckets:
       []``, table served unmodified (ADVICE r15).
    3. Read ONLY the touched buckets' parquet files, apply the merge in
       DataFrame land (drop update+delete keys, union the new versions
       and the insert rows), and write the result through a STAGING
       bucketed table with the same bucket spec and sort — one sorted
       file per non-empty touched bucket. Inserts therefore land IN
       their buckets' single sorted file, not as extra per-bucket files:
       the upserted table never enters the multi-file state appends
       create.
    4. Swap at file level: remove the touched buckets' old files, rename
       the staged files in (bucket identity travels in the ``_NNNNN``
       filename suffix), refresh the table's file-listing cache. Marker-
       guarded (``upsert_orders.json``, written LAST) so re-runs attach.
       Crash safety differs by arm: the CLONED form self-heals by
       re-cloning from the pristine compacted state and redoing the
       merge; the IN-PLACE form has no pristine copy to re-clone, so the
       swap is journaled — a ``pending`` marker (touched buckets, staged
       file names, undo-dir name) is written before any file moves, old
       files are MOVED to an undo dir (never deleted), and recovery
       rolls an uncommitted swap BACK (staged names out, displaced files
       restored) so the normal path re-merges from pristine state;
       committed undo dirs are tombstoned and collected after
       ``$PYCAIM_LAYOUT_GC_GRACE`` like every other two-phase GC in this
       repo. The residual window in both arms is a CONCURRENT reader
       during the remove/rename instants — the local stand-in for a
       table-format MERGE commit, the same caveat as append (r14).

    Untouched buckets' files are not opened, not rewritten, not renamed —
    pinned by tests/test_storage.py (incl. an insert-only batch touching
    only the inserted keys' buckets). One sorted file per bucket is
    preserved, so unlike the append state the upserted table keeps the
    sort-free co-located merge. Returns (lineitem_df, orders_upserted_df).
    """
    import glob as _glob
    import hashlib
    import json
    import shutil
    import time

    from pycaim_spark.operators.dedup import (
        _store_write_lock,
        _write_json_atomic,
    )
    from pycaim_spark.operators.merge import (
        bucket_files,
        delta_touched_buckets,
        mv_with_crc,
        plan_bucket_local_merge,
        rm_with_crc,
    )
    from pycaim_spark.queries.relational import _SCRATCH

    ns = f"ip{suffix}" if inplace else "incr"
    # lineitem always comes from the SHARED compacted layout (the merge
    # never touches it — the in-place arm's private namespace only needs
    # its own mutable orders; co-located SMJs only require both sides
    # bucketed on the same count, not the same table family). Probes that
    # measure the orders motion alone skip the lineitem scaffolding.
    lib = None
    if with_lineitem:
        lib, _ = _incremental_orderkey_layout(
            spark, sf_dir, buckets=buckets, compacted=True
        )
    _incremental_orderkey_layout(
        spark, sf_dir, buckets=buckets, compacted=True, ns=ns,
        tables=("orders",),
    )
    layout_root = os.path.join(_SCRATCH, "bucketed_tpch")
    abs_sf = os.path.abspath(sf_dir)
    src = os.path.join(sf_dir, "orders.parquet")
    slug = hashlib.md5(
        f"{abs_sf}:{buckets}:{ns}:{_layout_fingerprint(src)}".encode()
    ).hexdigest()[:8]
    slug_dir = os.path.join(layout_root, slug)
    cpath = os.path.join(slug_dir, "orders_c")
    if inplace:
        upath = cpath
        uname = f"tpch_ic_orders_{slug}"
    else:
        upath = os.path.join(slug_dir, f"orders_u{suffix}")
        uname = f"tpch_iu{suffix}_orders_{slug}"
    marker = os.path.join(slug_dir, f"upsert{suffix}_orders.json")
    pending = os.path.join(
        slug_dir, f"upsert_pending{suffix}_orders.json"
    )
    # File-motion helpers live with the merge core (operators/merge.py):
    # bucket_files (data files by bucket id, crc sidecars excluded),
    # rm_with_crc / mv_with_crc (sidecars travel with their data file).
    _files_by_bucket = bucket_files
    _rm_with_crc = rm_with_crc
    _mv_with_crc = mv_with_crc

    batch_spec = [upd_pred, del_pred, ins_pred, base_rel]

    def _marker_current() -> bool:
        """The marker commits a SPECIFIC batch: a marker recording a
        different batch spec (fixture predicates changed between rounds,
        or a probe reusing a suffix with new predicates) is stale — the
        warm path must not serve the old merge, and the locked path
        re-derives from a pristine base. Markerless/legacy markers are
        stale by definition."""
        if not os.path.exists(marker):
            return False
        try:
            with open(marker) as f:
                return json.load(f).get("batch") == batch_spec
        except (OSError, ValueError):
            return False

    if (
        os.path.exists(os.path.join(upath, "_SUCCESS"))
        and _marker_current()
        and not os.path.exists(pending)
        and not os.path.exists(os.path.join(slug_dir, "superseded.json"))
        and spark.catalog.tableExists(uname)
    ):
        return lib, spark.table(uname)

    if inplace and os.path.exists(marker) and not _marker_current():
        # Stale batch spec on the IN-PLACE arm: the mutated table has no
        # pristine copy to re-derive from, so the private namespace is
        # rebuilt from the raw corpus. Wipe under the lock, rebuild
        # outside it (the builder takes the same flock — not reentrant).
        with _store_write_lock(layout_root):
            if os.path.exists(marker) and not _marker_current():
                spark.sql(f"DROP TABLE IF EXISTS {uname}")
                spark.sql(f"DROP TABLE IF EXISTS tpch_ia_orders_{slug}")
                shutil.rmtree(slug_dir, ignore_errors=True)
        _incremental_orderkey_layout(
            spark, sf_dir, buckets=buckets, compacted=True, ns=ns,
            tables=("orders",),
        )

    full = load_table(spark, sf_dir, "orders")
    key = "o_orderkey"
    stage = os.path.join(slug_dir, f"orders_u{suffix}_stage")
    sname = f"tpch_iu{suffix}_stage_orders_{slug}"
    with _store_write_lock(layout_root):
        if os.path.exists(marker) and not _marker_current():
            # Stale batch spec, CLONED arm: drop the commit so the steps
            # below re-clone from the pristine base and re-merge.
            os.remove(marker)
        # Grace-collect committed in-place undo dirs (two-phase GC: the
        # swap tombstones them, later locked passes delete past grace —
        # never under a possible stale lockless reader).
        grace = float(os.environ.get("PYCAIM_LAYOUT_GC_GRACE", "900"))
        now = time.time()
        for od in _glob.glob(os.path.join(slug_dir, "orders_c_old-*")):
            tomb = os.path.join(od, "superseded.json")
            if os.path.exists(tomb):
                try:
                    with open(tomb) as f:
                        ts = float(json.load(f).get("ts", now))
                except (OSError, ValueError, TypeError):
                    continue
                if now - ts > grace:
                    shutil.rmtree(od, ignore_errors=True)
        if os.path.exists(pending):
            # In-place swap journaled but never committed (no final
            # marker) → roll BACK to the pristine compacted state so the
            # normal path below re-merges from scratch; committed (final
            # marker present, crash before the pending unlink) → the swap
            # is complete, just finish the cleanup.
            with open(pending) as f:
                pinfo = json.load(f)
            if not os.path.exists(marker):
                staged_names = set(pinfo.get("staged", ()))
                for fn in list(os.listdir(upath)):
                    if fn in staged_names:
                        _rm_with_crc(os.path.join(upath, fn))
                undo = os.path.join(slug_dir, pinfo["undo_dir"])
                if os.path.isdir(undo):
                    for fn in os.listdir(undo):
                        if fn != "superseded.json":
                            os.rename(
                                os.path.join(undo, fn),
                                os.path.join(upath, fn),
                            )
                    shutil.rmtree(undo, ignore_errors=True)
                if spark.catalog.tableExists(uname):
                    spark.catalog.refreshTable(uname)
            spark.sql(f"DROP TABLE IF EXISTS {sname}")
            shutil.rmtree(stage, ignore_errors=True)
            os.remove(pending)
        if not inplace and not os.path.exists(marker):
            # 1. Clone the base state (upsert mutates the clone).
            # ``base_rel`` defaults to the compacted table; a SUCCESSIVE
            # CDC batch passes the previous batch's ``orders_u*`` so
            # batches compose — the production stream shape, oracle-gated
            # end-to-end by layout_upsert_second_batch.
            if os.path.exists(upath):
                shutil.rmtree(upath)
            shutil.copytree(os.path.join(slug_dir, base_rel), upath)
        if not spark.catalog.tableExists(uname):
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in full.schema.fields
            )
            spark.sql(
                f"CREATE TABLE {uname} ({ddl}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {buckets} BUCKETS LOCATION '{upath}'"
            )
        if not os.path.exists(marker):
            # 2. DEMO SCAFFOLDING: derive the CDC batch from predicates
            # over the raw corpus, so the DuckDB oracle can reproduce the
            # identical batch in SQL. The touched-bucket derivation here
            # (bounded: ≤ `buckets` ids) exists only to let the UPDATE
            # rows be read from the touched files instead of re-scanning
            # the corpus (SCALING_r15.json `upsert_scale_probe_sf10`
            # caught the second scan); the MOTION itself runs through
            # `plan_bucket_local_merge`, whose production contract takes
            # the delta as DataFrames and computes touched buckets from
            # the delta's keys alone.
            cdc_keys = full.filter(
                F.expr(f"({upd_pred}) OR ({del_pred})")
            ).select(key)
            ins_rows = None
            if ins_pred is not None:
                ins_rows = full.filter(F.expr(ins_pred)).withColumn(
                    key, F.col(key) + F.lit(_UPSERT_INS_OFFSET)
                )
                cdc_keys = cdc_keys.unionByName(ins_rows.select(key))
            touched = delta_touched_buckets(cdc_keys, key, buckets)
            if not touched:
                # Empty CDC batch at this scale (ADVICE r15): nothing to
                # merge — commit the no-op so re-runs warm-path.
                _write_json_atomic(
                    marker,
                    {"touched_buckets": [], "batch": batch_spec},
                )
                spark.catalog.refreshTable(uname)
                return lib, spark.table(uname)
            live = _files_by_bucket(upath)
            touched_files = [
                f for b in touched for f in live.get(b, [])
            ]
            cur = (
                spark.read.parquet(*touched_files)
                if touched_files
                else spark.createDataFrame([], full.schema)
            )
            updates = cur.filter(F.expr(upd_pred)).withColumn(
                "o_orderdate",
                F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
            )
            upserts = (
                updates if ins_rows is None
                else updates.unionByName(ins_rows)
            )
            # 3. The motion core (operators/merge.py): anti-join the
            # delta keys out of the touched buckets' rows, add the
            # upserts, stage one sorted file per touched bucket, assert
            # bucket-assignment parity. `touched` is passed through so
            # the scaffolding derivation above isn't re-run, and BOTH
            # delta sides derive from `cur` (every upd/del key's bucket
            # is touched by construction), so the staged job reads only
            # bucket files — no second corpus scan (the r15
            # decomposition lesson). Production callers pass their CDC
            # stream's DataFrames and omit `touched`.
            plan = plan_bucket_local_merge(
                spark,
                path=upath,
                schema=full.schema,
                key=key,
                buckets=buckets,
                upserts=upserts,
                deletes=cur.filter(F.expr(del_pred)).select(key),
                stage_path=stage,
                stage_table=sname,
                touched=touched,
            )
            staged = plan["staged"]
            # 4. Bucket-local swap: only the touched buckets change.
            if inplace:
                # Journal first (undo-dir name + staged file names), move
                # old files ASIDE (the undo log — there is no pristine
                # clone to re-derive from), then rename staged in.
                undo_name = f"orders_c_old-{int(time.time() * 1000)}"
                undo = os.path.join(slug_dir, undo_name)
                os.makedirs(undo, exist_ok=True)
                _write_json_atomic(
                    pending,
                    {
                        "touched": touched,
                        "staged": sorted(
                            os.path.basename(f)
                            for fs in staged.values()
                            for f in fs
                        ),
                        "undo_dir": undo_name,
                    },
                )
                for b in touched:
                    for f in live.get(b, []):
                        _mv_with_crc(f, undo)
                    for f in staged.get(b, []):
                        _mv_with_crc(f, upath)
                _write_json_atomic(
                    os.path.join(undo, "superseded.json"),
                    {"ts": time.time()},
                )
                spark.sql(f"DROP TABLE IF EXISTS {sname}")
                shutil.rmtree(stage, ignore_errors=True)
                spark.catalog.refreshTable(uname)
                _write_json_atomic(
                    marker,
                    {"touched_buckets": touched, "batch": batch_spec},
                )
                os.remove(pending)
            else:
                for b in touched:
                    for f in live.get(b, []):
                        _rm_with_crc(f)
                    for f in staged.get(b, []):
                        _mv_with_crc(f, upath)
                spark.sql(f"DROP TABLE IF EXISTS {sname}")
                shutil.rmtree(stage, ignore_errors=True)
                spark.catalog.refreshTable(uname)
                _write_json_atomic(
                    marker,
                    {"touched_buckets": touched, "batch": batch_spec},
                )
        tomb = os.path.join(slug_dir, "superseded.json")
        if os.path.exists(tomb):
            os.remove(tomb)
    return lib, spark.table(uname)


def _upsert_stream_inplace(
    spark,
    sf_dir,
    batches: list[tuple[str, str, str, str | None]],
    suffix: str = "st",
    buckets: int = 32,
):
    """A STREAM of CDC batches applied IN PLACE to one bucketed table —
    the steady-state production shape the single-batch arms build up to:
    each batch ``(batch_key, upd_pred, del_pred, ins_pred)`` merges
    bucket-locally on top of the previous batches' result, is committed
    by appending its entry to an ordered APPLIED MANIFEST (atomic
    rewrite — the same ingest-key idempotence discipline as the
    signature store's folded-keys manifest), and is individually
    crash-journaled: the per-batch pending journal + undo dir roll an
    uncommitted batch BACK to its pre-batch state, so recovery re-merges
    exactly the interrupted batch and the stream continues. Replaying an
    applied key is a no-op; a manifest whose recorded history DIVERGES
    from the requested batch list (fixture predicates changed between
    rounds) rebuilds the private namespace from the raw corpus and
    replays the requested stream — deterministic, like the single-batch
    marker's batch-spec staleness rule. Runs only in-place (the cloned
    arm composes by chaining clones instead, ``base_rel`` — both
    composition styles are gated against the SAME two-batch oracle:
    `layout_upsert_inplace_stream` vs `layout_upsert_second_batch`).
    Batch semantics per entry match `_upserted_orderkey_layout`: updates
    shift o_orderdate +30 days, inserts clone under key + 10^9, deltas
    derive from the touched buckets' rows so each merge job is
    bucket-file-sized. Returns the orders DataFrame after the whole
    stream."""
    import glob as _glob
    import hashlib
    import json
    import shutil
    import time

    from pycaim_spark.operators.dedup import (
        _store_write_lock,
        _write_json_atomic,
    )
    from pycaim_spark.operators.merge import (
        bucket_files,
        delta_touched_buckets,
        mv_with_crc,
        plan_bucket_local_merge,
        rm_with_crc,
    )
    from pycaim_spark.queries.relational import _SCRATCH

    ns = f"ip{suffix}"
    _incremental_orderkey_layout(
        spark, sf_dir, buckets=buckets, compacted=True, ns=ns,
        tables=("orders",),
    )
    layout_root = os.path.join(_SCRATCH, "bucketed_tpch")
    abs_sf = os.path.abspath(sf_dir)
    src = os.path.join(sf_dir, "orders.parquet")
    slug = hashlib.md5(
        f"{abs_sf}:{buckets}:{ns}:{_layout_fingerprint(src)}".encode()
    ).hexdigest()[:8]
    slug_dir = os.path.join(layout_root, slug)
    tpath = os.path.join(slug_dir, "orders_c")
    tname = f"tpch_ic_orders_{slug}"
    manifest = os.path.join(slug_dir, f"upsertstream{suffix}_orders.json")
    pending = os.path.join(
        slug_dir, f"upsertstream_pending{suffix}_orders.json"
    )
    specs = [list(b) for b in batches]
    key = "o_orderkey"

    def _applied():
        if os.path.exists(manifest):
            try:
                with open(manifest) as f:
                    return json.load(f)
            except (OSError, ValueError):
                return []
        return []

    applied = _applied()
    if (
        [a["batch"] for a in applied] == specs
        and not os.path.exists(pending)
        and not os.path.exists(os.path.join(slug_dir, "superseded.json"))
        and spark.catalog.tableExists(tname)
    ):
        return spark.table(tname)

    # Divergent history → rebuild the namespace pristine (wipe under the
    # lock, rebuild outside it — the builder takes the same flock).
    if applied and [a["batch"] for a in applied] != \
            [s for s in specs[: len(applied)]]:
        with _store_write_lock(layout_root):
            applied = _applied()
            if applied and [a["batch"] for a in applied] != \
                    [s for s in specs[: len(applied)]]:
                spark.sql(f"DROP TABLE IF EXISTS {tname}")
                spark.sql(f"DROP TABLE IF EXISTS tpch_ia_orders_{slug}")
                shutil.rmtree(slug_dir, ignore_errors=True)
        _incremental_orderkey_layout(
            spark, sf_dir, buckets=buckets, compacted=True, ns=ns,
            tables=("orders",),
        )

    full = load_table(spark, sf_dir, "orders")
    stage = os.path.join(slug_dir, f"orders_u{suffix}_stream_stage")
    sname = f"tpch_iu{suffix}_stream_stage_orders_{slug}"
    with _store_write_lock(layout_root):
        grace = float(os.environ.get("PYCAIM_LAYOUT_GC_GRACE", "900"))
        now = time.time()
        for od in _glob.glob(os.path.join(slug_dir, "orders_c_old-*")):
            tomb = os.path.join(od, "superseded.json")
            if os.path.exists(tomb):
                try:
                    with open(tomb) as f:
                        ts = float(json.load(f).get("ts", now))
                except (OSError, ValueError, TypeError):
                    continue
                if now - ts > grace:
                    shutil.rmtree(od, ignore_errors=True)
        if os.path.exists(pending):
            # The manifest entry is written AFTER the swap, so it is the
            # batch's commit record: pending whose key is already in the
            # manifest = crash between commit and cleanup — just finish
            # the cleanup; otherwise the batch is uncommitted — roll back
            # to the pre-batch state and let the loop re-merge it.
            with open(pending) as f:
                pinfo = json.load(f)
            committed = any(
                a.get("key") == pinfo.get("key") for a in _applied()
            )
            if not committed:
                staged_names = set(pinfo.get("staged", ()))
                for fn in list(os.listdir(tpath)):
                    if fn in staged_names:
                        rm_with_crc(os.path.join(tpath, fn))
                undo = os.path.join(slug_dir, pinfo["undo_dir"])
                if os.path.isdir(undo):
                    for fn in os.listdir(undo):
                        if fn != "superseded.json":
                            os.rename(
                                os.path.join(undo, fn),
                                os.path.join(tpath, fn),
                            )
                    shutil.rmtree(undo, ignore_errors=True)
            spark.sql(f"DROP TABLE IF EXISTS {sname}")
            shutil.rmtree(stage, ignore_errors=True)
            os.remove(pending)
            if spark.catalog.tableExists(tname):
                spark.catalog.refreshTable(tname)
        applied = _applied()
        for spec in specs[len(applied):]:
            batch_key, upd_pred, del_pred, ins_pred = spec
            cdc_keys = full.filter(
                F.expr(f"({upd_pred}) OR ({del_pred})")
            ).select(key)
            ins_rows = None
            if ins_pred is not None:
                ins_rows = full.filter(F.expr(ins_pred)).withColumn(
                    key, F.col(key) + F.lit(_UPSERT_INS_OFFSET)
                )
                cdc_keys = cdc_keys.unionByName(ins_rows.select(key))
            touched = delta_touched_buckets(cdc_keys, key, buckets)
            if not touched:
                applied = applied + [
                    {"key": batch_key, "batch": spec, "touched": []}
                ]
                _write_json_atomic(manifest, applied)
                continue
            live = bucket_files(tpath)
            touched_files = [
                f for b in touched for f in live.get(b, [])
            ]
            cur = (
                spark.read.parquet(*touched_files)
                if touched_files
                else spark.createDataFrame([], full.schema)
            )
            updates = cur.filter(F.expr(upd_pred)).withColumn(
                "o_orderdate",
                F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
            )
            upserts = (
                updates if ins_rows is None
                else updates.unionByName(ins_rows)
            )
            plan = plan_bucket_local_merge(
                spark,
                path=tpath,
                schema=full.schema,
                key=key,
                buckets=buckets,
                upserts=upserts,
                deletes=cur.filter(F.expr(del_pred)).select(key),
                stage_path=stage,
                stage_table=sname,
                touched=touched,
            )
            undo_name = f"orders_c_old-{int(time.time() * 1000)}"
            undo = os.path.join(slug_dir, undo_name)
            os.makedirs(undo, exist_ok=True)
            _write_json_atomic(
                pending,
                {
                    "key": batch_key,
                    "touched": touched,
                    "staged": sorted(
                        os.path.basename(f)
                        for fs in plan["staged"].values()
                        for f in fs
                    ),
                    "undo_dir": undo_name,
                },
            )
            for b in touched:
                for f in live.get(b, []):
                    mv_with_crc(f, undo)
                for f in plan["staged"].get(b, []):
                    mv_with_crc(f, tpath)
            _write_json_atomic(
                os.path.join(undo, "superseded.json"), {"ts": time.time()}
            )
            spark.sql(f"DROP TABLE IF EXISTS {sname}")
            shutil.rmtree(stage, ignore_errors=True)
            spark.catalog.refreshTable(tname)
            applied = applied + [
                {"key": batch_key, "batch": spec, "touched": touched}
            ]
            _write_json_atomic(manifest, applied)
            os.remove(pending)
        tomb = os.path.join(slug_dir, "superseded.json")
        if os.path.exists(tomb):
            os.remove(tomb)
    return spark.table(tname)


#: The post-CDC orders view, in SQL, shared by every upsert oracle: base
#: minus update/delete keys, plus the shifted updates, plus the inserted
#: clones (keys + 10^9). DuckDB reproduces the exact batch the layout
#: merge applied, so the hash gates compare full post-MERGE semantics.
_UPSERT_ORDV_SQL = """
    WITH upd AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate + INTERVAL 30 DAY AS o_orderdate,
               o_orderpriority
        FROM orders
        WHERE o_orderkey % 83 = 0 AND o_orderkey % 503 <> 0
    ), ins AS (
        SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders
        WHERE o_orderkey % 113 = 0
    ), ordv AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders
        WHERE o_orderkey % 83 <> 0 AND o_orderkey % 503 <> 0
        UNION ALL
        SELECT * FROM upd
        UNION ALL
        SELECT * FROM ins
    )
"""

_UPSERT_Q3_SQL = _UPSERT_ORDV_SQL + """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2)))
                AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN ordv ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    """


def _q3_upserted_body(spark, sf_dir, lib, ou):
    """TPC-H Q3 over an upserted orders table + the shared compacted
    lineitem — the DataFrame body both upsert arms (cloned / in-place)
    register, so the two gates compare identical query logic over the
    two storage motions."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = ou.filter(
        F.col("o_orderdate")
        < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    ).join(F.broadcast(c), F.col("o_custkey") == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    li = lib.filter(
        F.col("l_shipdate")
        > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    disc_price = cents("l_extendedprice") * (
        F.lit(100).cast("long") - cents("l_discount")
    )
    # No ORDER BY on either side: the gate's value-hash is
    # order-insensitive, and a global sort here would hang an Exchange
    # rangepartitioning + Sort over the otherwise sort-free co-located
    # plan the storage test pins.
    return (
        li.join(o.hint("MERGE"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(fsum(disc_price, 4, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "tpch_q3_layout_upserted",
    tags=("composite", "storage"),
    oracle=_UPSERT_Q3_SQL,
)
def tpch_q3_layout_upserted(spark, sf_dir):
    """TPC-H Q3 over the UPSERTED incremental layout: a deterministic
    CDC batch (updates shift o_orderdate +30 days on keys ≡0 mod 83,
    deletes remove keys ≡0 mod 503, inserts clone keys ≡0 mod 113 under
    o_orderkey + 10^9) MERGEd bucket-locally into a clone of the
    compacted orders state (`_upserted_orderkey_layout`). The oracle
    applies the same batch in SQL over the raw table, so the hash gate
    falsifies the join-visible failure modes of the file surgery: a
    dropped bucket loses ~1/32 of orders, a double-applied delta
    duplicates rows, a missed update leaves result rows on their old
    o_orderdate (2 updated + 1 deleted key land in the sf0.001 result;
    11 + 3 at sf0.01). Full grouped rows, no LIMIT — top-10 would hide
    all of that. Inserted keys have no lineitem rows, so THIS query
    cannot see them — `layout_upsert_audit` aggregates the upserted
    table directly and is the insert-visibility gate. Plan: still zero
    Exchange on either fact, and zero SMJ sorts — the upsert preserves
    one sorted file per bucket, unlike the append state
    (tests/test_storage.py pins files-untouched + plan)."""
    register_temp_views(spark, sf_dir)
    lib, ou = _upserted_orderkey_layout(spark, sf_dir)
    return _q3_upserted_body(spark, sf_dir, lib, ou)


@register(
    "layout_upsert_audit",
    tags=("composite", "storage"),
    oracle=_UPSERT_ORDV_SQL + """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price,
           MAX(o_orderkey) AS max_key,
           COUNT(CASE WHEN o_orderkey >= 1000000000 THEN 1 END)
               AS n_inserted
    FROM ordv
    GROUP BY o_orderpriority
    """,
)
def layout_upsert_audit(spark, sf_dir):
    """Full-table audit of the upserted orders state — the gate that
    makes INSERTS visible (VERDICT r15 #1): Q3 joins lineitem, and the
    inserted clones (o_orderkey + 10^9) have no lineitem rows, so a
    dropped/double-applied insert batch cannot change Q3's result. Here
    every CDC verb lands in the aggregates: per-priority row counts
    (inserts +, deletes −), an exact money sum (any row change moves
    it), MAX(o_orderkey) (≥ 10^9 iff at least one insert survived), and
    the explicit inserted-row count per priority. Exact spelling: the
    Spark side sums fixed-point cents (functions/exact.py — SUM over a
    precision-22 decimal leaves the long-backed fast path,
    ISOLATE_r11.json `tpch_fixedpoint_paired_series`), the oracle keeps
    the bit-identical decimal form."""
    register_temp_views(spark, sf_dir)
    _, ou = _upserted_orderkey_layout(spark, sf_dir, with_lineitem=False)
    return ou.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        fsum(cents("o_totalprice"), 2, "total_price"),
        F.max("o_orderkey").alias("max_key"),
        F.count(
            F.when(F.col("o_orderkey") >= _UPSERT_INS_OFFSET, 1)
        ).alias("n_inserted"),
    )


#: Second CDC batch: delete original keys ≡0 (mod 307). The `< 10^9`
#: clause keeps it derivable from the raw corpus (the fixture's demo
#: derivation scans `orders`; a production MERGE receives the delta) and
#: guarantees batch 1's inserted clones survive into the audit.
_UPSERT_B2_DEL = "o_orderkey % 307 = 0 AND o_orderkey < 1000000000"


@register(
    "layout_upsert_second_batch",
    tags=("composite", "storage"),
    oracle=_UPSERT_ORDV_SQL + f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price,
           MAX(o_orderkey) AS max_key,
           COUNT(CASE WHEN o_orderkey >= 1000000000 THEN 1 END)
               AS n_inserted
    FROM ordv
    WHERE NOT ({_UPSERT_B2_DEL})
    GROUP BY o_orderpriority
    """,
)
def layout_upsert_second_batch(spark, sf_dir):
    """SUCCESSIVE CDC batches composed through the bucket-local motion —
    the production stream shape: batch 2 (deletes on keys ≡0 mod 307)
    clones batch 1's upserted table (``base_rel="orders_u"``) and merges
    on top, so the result carries BOTH batches' effects; the oracle
    applies the same two-batch composition in SQL over the raw table.
    Falsifies the composition failure modes a single-batch gate can't:
    batch 2 re-deriving from the compacted base instead of batch 1's
    state would resurrect batch 1's deletes and lose its updates/inserts
    (counts, sums, max_key and n_inserted all shift). Audit shape, not
    Q3, so every verb of both batches is result-visible. Batch identity
    is COMMITTED in the marker (the ``batch`` spec): re-running with
    different predicates re-derives instead of serving the stale merge."""
    register_temp_views(spark, sf_dir)
    _upserted_orderkey_layout(spark, sf_dir, with_lineitem=False)
    _, ou2 = _upserted_orderkey_layout(
        spark, sf_dir, suffix="b2", base_rel="orders_u",
        upd_pred="1 = 0", del_pred=_UPSERT_B2_DEL, ins_pred=None,
        with_lineitem=False,
    )
    return ou2.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        fsum(cents("o_totalprice"), 2, "total_price"),
        F.max("o_orderkey").alias("max_key"),
        F.count(
            F.when(F.col("o_orderkey") >= _UPSERT_INS_OFFSET, 1)
        ).alias("n_inserted"),
    )


@register(
    "layout_upsert_inplace_stream",
    tags=("composite", "storage"),
    oracle=_UPSERT_ORDV_SQL + f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price,
           MAX(o_orderkey) AS max_key,
           COUNT(CASE WHEN o_orderkey >= 1000000000 THEN 1 END)
               AS n_inserted
    FROM ordv
    WHERE NOT ({_UPSERT_B2_DEL})
    GROUP BY o_orderpriority
    """,
)
def layout_upsert_inplace_stream(spark, sf_dir):
    """The same two-batch CDC composition as `layout_upsert_second_batch`
    executed as an IN-PLACE STREAM (`_upsert_stream_inplace`): batch 1
    (update+delete+insert) and batch 2 (deletes) merge successively into
    ONE table, each batch committed to an ordered applied-manifest and
    individually crash-journaled (pending + undo dir roll an uncommitted
    batch back; a committed batch's cleanup is finished). The cloned
    chain and this stream are the two composition styles a production
    CDC pipeline chooses between, and both gate against the SAME DuckDB
    two-batch oracle — a divergence between them (e.g. batch 2 merging
    against the wrong base state) hash-fails one of the twins."""
    register_temp_views(spark, sf_dir)
    ou = _upsert_stream_inplace(
        spark, sf_dir,
        batches=[
            ("b1", _UPSERT_UPD, _UPSERT_DEL, _UPSERT_INS),
            ("b2", "1 = 0", _UPSERT_B2_DEL, None),
        ],
    )
    return ou.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        fsum(cents("o_totalprice"), 2, "total_price"),
        F.max("o_orderkey").alias("max_key"),
        F.count(
            F.when(F.col("o_orderkey") >= _UPSERT_INS_OFFSET, 1)
        ).alias("n_inserted"),
    )


@register(
    "tpch_q3_layout_upserted_inplace",
    tags=("composite", "storage"),
    oracle=_UPSERT_Q3_SQL,
)
def tpch_q3_layout_upserted_inplace(spark, sf_dir):
    """TPC-H Q3 over the IN-PLACE upsert arm (VERDICT r15 #2): the same
    CDC batch MERGEd directly into the compacted orders table of a
    private layout namespace — no copytree clone anywhere in the motion,
    so its bytes accounting is the one that scales (the cloned arm
    copies the full table as fixture scaffolding before touching ~19% of
    it). Crash safety comes from the journaled undo-log swap instead of
    the pristine-clone re-derive (see `_upserted_orderkey_layout`).
    Identical oracle and query body as tpch_q3_layout_upserted: both
    arms must produce the same post-MERGE table."""
    register_temp_views(spark, sf_dir)
    lib, ou = _upserted_orderkey_layout(spark, sf_dir, inplace=True)
    return _q3_upserted_body(spark, sf_dir, lib, ou)


@register(
    "tpch_q5_bucketed",
    tags=("composite", "storage"),
    oracle=_Q5_SQL,
)
def tpch_q5_bucketed(spark, sf_dir):
    """TPC-H Q5 over the orderkey-bucketed lineitem/orders layout — the
    scale lever the q5 decomposition pointed at (ISOLATE_r11.json
    `q5_decomposition`: the 60 M-row lineitem shuffle join IS the query;
    dims+orders 1.47 s, +lineitem join 5.49 s, group-agg free). Shape:
    region⋈nation⋈customer collapse into one broadcast that enriches the
    bucketed orders scan in place (broadcast joins preserve the probe
    side's bucketing), then orders⋈lineitem runs as a co-located SMJ —
    the only shuffle left in the plan is the 5-row final aggregate.
    Verdicts/rows identical to tpch_q5 (same DuckDB oracle)."""
    register_temp_views(spark, sf_dir)
    lib, ob = _bucketed_orderkey_layout(spark, sf_dir)
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    dims = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    cust = c.join(
        F.broadcast(dims), c.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", "n_name")
    o = ob.filter(
        (F.col("o_orderdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate")
           < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    o_enriched = o.join(
        F.broadcast(cust), o.o_custkey == cust.c_custkey
    ).select("o_orderkey", "n_name")
    disc_price = cents("l_extendedprice") * (
        F.lit(100).cast("long") - cents("l_discount")
    )
    return (
        lib.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            o_enriched.hint("MERGE"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("n_name")
        .agg(fsum(disc_price, 4, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q3_bucketed",
    tags=("composite", "storage"),
    oracle=_Q3_SQL,
)
def tpch_q3_bucketed(spark, sf_dir):
    """TPC-H Q3 over the orderkey-bucketed lineitem/orders layout — the
    ZERO-shuffle form of the shipped tpch_q3's plan: the filtered-segment
    customer keys broadcast into the bucketed orders scan, orders⋈lineitem
    runs as a co-located SMJ on the bucket key, and the group-agg needs no
    Exchange either because its grouping set (l_orderkey, o_orderdate)
    CONTAINS the bucket key — HashPartitioning(l_orderkey) satisfies the
    aggregate's clustered distribution — so the only data movement in the
    whole plan is the customer broadcast and the final TakeOrdered top-10.
    Fixed-point money arithmetic (this is a DataFrame form; the sf0.1
    SQL-vs-fixed-point adjudication in tpch_q3's docstring compared forms
    of the SHUFFLED plan — here the join dominates nothing, so the
    aggregate spelling is on the fast path by construction). Same DuckDB
    oracle as tpch_q3."""
    register_temp_views(spark, sf_dir)
    lib, ob = _bucketed_orderkey_layout(spark, sf_dir)
    return _q3_over_layout(spark, sf_dir, lib, ob)


def _q3_over_layout(spark, sf_dir, lib, ob):
    """The co-located Q3 body over any orderkey-bucketed (lib, ob) pair —
    shared by the one-shot layout and its incremental append/compaction
    twins (`tpch_q3_layout_append` / `_compacted`)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = ob.filter(
        F.col("o_orderdate")
        < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    ).join(F.broadcast(c), F.col("o_custkey") == c.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    li = lib.filter(
        F.col("l_shipdate")
        > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    disc_price = cents("l_extendedprice") * (
        F.lit(100).cast("long") - cents("l_discount")
    )
    return (
        li.join(o.hint("MERGE"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(fsum(disc_price, 4, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "agg_stats",
    tags=("agg",),
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           round(sqrt((CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))
                                * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                       - pow(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2)
                         / COUNT(*))
                      / (COUNT(*) - 1)), 6) AS price_stddev,
           round(quantile_cont(o_totalprice, 0.5), 6) AS price_median
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_stats(spark, sf_dir):
    """Distribution statistics with order-independent arithmetic:
    stddev from exact decimal Σx/Σx² (native stddev accumulates floats in
    partition order), exact interpolated median (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``)."""
    o = load_table(spark, sf_dir, "orders")
    d2 = F.col("o_totalprice").cast("decimal(12,2)")
    sum_sq = F.sum(d2 * d2).cast("double")
    sum_x = F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
    n = F.count(F.lit(1))
    stddev = F.round(
        F.sqrt((sum_sq - F.pow(sum_x, 2) / n) / (n - 1)), 6
    )
    return o.groupBy("o_orderstatus").agg(
        n.alias("n"),
        stddev.alias("price_stddev"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("price_median"),
    )


@register(
    "agg_unpivot",
    tags=("agg",),
    oracle="""
    SELECT c_custkey, metric, CAST(v AS DOUBLE) AS v
    FROM (SELECT c_custkey,
                 CAST(c_acctbal AS DOUBLE) AS acctbal,
                 CAST(c_nationkey AS DOUBLE) AS nationkey
          FROM customer)
    UNPIVOT (v FOR metric IN (acctbal, nationkey))
    """,
)
def agg_unpivot(spark, sf_dir):
    """Unpivot / melt wide → long (Spark DataFrame.unpivot vs SQL UNPIVOT)."""
    c = load_table(spark, sf_dir, "customer")
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "v")


@register(
    "fn_null",
    tags=("function",),
    oracle="""
    SELECT event_id,
           nullif(event_type, 'view') AS type_or_null,
           coalesce(nullif(event_type, 'view'), 'suppressed') AS type_filled,
           CAST(nullif(event_type, 'view') IS NOT DISTINCT FROM NULL AS INTEGER)
               AS is_suppressed,
           CASE WHEN json_extract(props, '$.missing') IS NULL THEN -1
                ELSE 0 END AS missing_marker
    FROM events
    """,
)
def fn_null(spark, sf_dir):
    """Null semantics: nullif/coalesce/null-safe equality (`<=>` ≡
    IS NOT DISTINCT FROM)."""
    ev = load_table(spark, sf_dir, "events")
    type_or_null = F.nullif(F.col("event_type"), F.lit("view"))
    return ev.select(
        "event_id",
        type_or_null.alias("type_or_null"),
        F.coalesce(type_or_null, F.lit("suppressed")).alias("type_filled"),
        type_or_null.eqNullSafe(F.lit(None).cast("string")).cast("int").alias("is_suppressed"),
        F.when(
            F.get_json_object("props", "$.missing").isNull(), -1
        ).otherwise(0).alias("missing_marker"),
    )


@register(
    "win_distribution",
    tags=("window",),
    oracle="""
    SELECT c_custkey,
           round(PERCENT_RANK() OVER w, 6) AS pct_rank,
           round(CUME_DIST() OVER w, 6) AS cume,
           NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                         ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_distribution(spark, sf_dir):
    """Distribution window functions: percent_rank, cume_dist, nth_value."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
    )


@register(
    "ts_resample",
    tags=("timeseries",),
    oracle="""
    WITH bounds AS (
        SELECT time_bucket(INTERVAL 1 HOUR, CAST(MIN(ts) AS TIMESTAMP)) AS lo,
               time_bucket(INTERVAL 1 HOUR, CAST(MAX(ts) AS TIMESTAMP)) AS hi
        FROM events
    ), spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds
    ), counts AS (
        SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS hour_start,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT s.hour_start, COALESCE(c.n_events, 0) AS n_events
    FROM spine s LEFT JOIN counts c USING (hour_start)
    """,
)
def ts_resample(spark, sf_dir):
    """Gap-filled hourly resampling: dense hour spine (sequence+explode)
    left-joined with bucketed counts, gaps coalesced to 0 — the hypertable
    rollup / time-series densification shape. The spine is generated from
    the aggregated min/max (two scalar rows), so it costs one broadcast
    join regardless of data size."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    counts = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return spine.join(counts, "hour_start", "left").select(
        "hour_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
