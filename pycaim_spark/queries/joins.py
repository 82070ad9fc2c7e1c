"""Join operators (SURVEY.md §2.B Joins).

Strategy notes for 100 TB:

- Dimension tables (nation/region/customer at TPC-H ratios) are broadcast —
  no shuffle of the fact side. ``F.broadcast`` pins it; AQE would also
  demote to broadcast at runtime when a side is small.
- Fact-fact joins shuffle on the join key; SHUFFLE_HASH avoids the sort when
  one side is modestly sized per partition, MERGE is the robust default.
- The as-of join is window-emulated (Spark has no native ASOF): equi-join on
  the partition key + range predicate, then keep the latest right row per
  left row via row_number. The oracle uses DuckDB's native ASOF JOIN —
  semantic parity of the emulation is exactly what the hash check proves.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from pycaim_spark.catalog import load_table
from pycaim_spark.functions.exact import cents, fsum
from pycaim_spark.registry import register


@register(
    "join_broadcast",
    tags=("join", "flagship"),
    oracle="""
    SELECT n_name,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_broadcast(spark, sf_dir):
    """Broadcast hash equi-join: fact ⋈ two broadcast dims → group-agg.

    SURVEY §2.B join_broadcast; BASELINE.md headline query. Plan: zero
    shuffles before the final aggregation — both dims ship to every
    executor; asserted BroadcastHashJoin in tests.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            fsum(cents("o_totalprice"), 2, "total_revenue"),
        )
        .orderBy("n_name")
    )


@register(
    "join_aqe_choice",
    tags=("join", "flagship"),
    oracle="""
    SELECT n_name,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_aqe_choice(spark, sf_dir):
    """The same fact ⋈ customer ⋈ nation query as ``join_broadcast`` with
    NO strategy hint — Catalyst + AQE pick the physical join from runtime
    stats. This is the plan a user actually runs at 100 TB: the pinned
    ``F.broadcast(customer)`` demonstrator is knowingly wrong once the dim
    outgrows the broadcast threshold (1.5 M rows at sf10 → 7.2× vs oracle,
    SCALING.md), while AQE demotes to shuffle-hash/sort-merge exactly
    there. Registered beside the pinned row so the bench grades the
    engine on the adaptive plan, not the demonstrator (VERDICT r6 #4).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            fsum(cents("o_totalprice"), 2, "total_revenue"),
        )
        .orderBy("n_name")
    )


@register(
    "join_shuffle_hash",
    tags=("join",),
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS line_cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def join_shuffle_hash(spark, sf_dir):
    """Shuffle-hash equi-join (fact ⋈ fact), pinned via SHUFFLE_HASH hint.

    SURVEY §2.B join_shuffle_hash. Avoids sorting both sides; right choice
    when per-partition build sides fit in memory.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("line_cnt"))
    )


@register(
    "join_sort_merge",
    tags=("join",),
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_sort_merge(spark, sf_dir):
    """Sort-merge equi-join, pinned via MERGE hint (SURVEY §2.B).

    The robust large-large strategy: both sides spill-safe, no build-side
    memory requirement.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o.hint("MERGE"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(fsum(cents("l_quantity"), 2, "sum_qty"))
    )


@register(
    "join_left",
    tags=("join",),
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left(spark, sf_dir):
    """LEFT OUTER join preserving order-less customers (SURVEY §2.B).

    COUNT(col) (not COUNT(*)) so unmatched rows count 0 — null semantics
    are the point of the outer-join check.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "join_right",
    tags=("join",),
    oracle="""
    SELECT o_orderkey, COUNT(l_orderkey) AS line_cnt
    FROM lineitem
    RIGHT JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    """,
)
def join_right(spark, sf_dir):
    """RIGHT OUTER join preserving line-less orders (SURVEY §2.B)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "right")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("line_cnt"))
    )


@register(
    "join_full",
    tags=("join",),
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nkey,
           COALESCE(c.c_cnt, 0) AS customer_cnt,
           COALESCE(s.s_cnt, 0) AS supplier_cnt
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS c_cnt FROM customer GROUP BY 1) c
    FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS s_cnt FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
)
def join_full(spark, sf_dir):
    """FULL OUTER join of two aggregates; COALESCE keeps dtypes stable
    (nullable int would degrade to float in pandas on both sides)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nkey"),
        F.coalesce("c_cnt", F.lit(0)).alias("customer_cnt"),
        F.coalesce("s_cnt", F.lit(0)).alias("supplier_cnt"),
    )


@register(
    "join_semi",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    """LEFT SEMI join = EXISTS (SURVEY §2.B join_semi)."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    tags=("join",),
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark, sf_dir):
    """LEFT ANTI join = NOT EXISTS (SURVEY §2.B join_anti)."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    tags=("join",),
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark, sf_dir):
    """Cartesian product of two tiny dims (SURVEY §2.B join_cross)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_theta",
    tags=("join",),
    oracle="""
    SELECT c_custkey, s_suppkey
    FROM customer
    JOIN supplier ON s_acctbal > c_acctbal
    WHERE c_custkey < 20
    """,
)
def join_theta(spark, sf_dir):
    """Non-equi (theta) join → BroadcastNestedLoopJoin (SURVEY §2.B).

    The 20-customer filter bounds the quadratic blowup: theta joins at
    scale require one broadcastable side, which this plan exhibits.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 20)
    s = load_table(spark, sf_dir, "supplier")
    return c.join(s, s.s_acctbal > c.c_acctbal).select("c_custkey", "s_suppkey")


@register(
    "join_range_interval",
    tags=("join",),
    oracle="""
    SELECT a.event_id AS signup_id, b.event_id AS nearby_id, b.event_type AS nearby_type
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND CAST(b.ts AS TIMESTAMP) BETWEEN CAST(a.ts AS TIMESTAMP) - INTERVAL 2 HOUR
                                     AND CAST(a.ts AS TIMESTAMP) + INTERVAL 2 HOUR
     AND a.event_id <> b.event_id
    WHERE a.event_type = 'signup'
    """,
)
def join_range_interval(spark, sf_dir):
    """Interval/range join: events of the same user within ±2 h of a signup.

    SURVEY §2.B join_range_interval. Equi key (user_id) carries the
    shuffle; the range predicate filters post-join — the scalable shape
    for range joins (never a pure cross product).
    """
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.select(
        F.col("event_id").alias("nearby_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("nearby_type"),
    )
    return a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & F.col("b_ts").between(
            F.col("a_ts") - F.expr("INTERVAL 2 HOURS"),
            F.col("a_ts") + F.expr("INTERVAL 2 HOURS"),
        )
        & (F.col("signup_id") != F.col("nearby_id")),
    ).select("signup_id", "nearby_id", "nearby_type")


@register(
    "join_range_bucketed",
    tags=("join",),
    oracle="""
    SELECT a.event_id AS signup_id,
           b.event_id AS nearby_id,
           b.event_type AS nearby_type,
           epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP))
               AS delta_us
    FROM events a
    JOIN events b
      ON abs(epoch_us(CAST(b.ts AS TIMESTAMP))
              - epoch_us(CAST(a.ts AS TIMESTAMP))) <= 600000000
     AND a.event_id <> b.event_id
    WHERE a.event_type = 'signup'
    """,
)
def join_range_bucketed(spark, sf_dir):
    """Range join with NO equi key — every event within ±10 minutes of a
    signup, across ALL users — via time-axis bucketization. A bare range
    predicate gives Catalyst nothing to hash on, so the naive plan is a
    BroadcastNestedLoopJoin: O(|A|·|B|) compares, the plan that dies first
    at 100 TB. The fix is manufacturing an equi key from the range
    dimension: bucket the time axis at the window width (10 min), explode
    the probe side to its bucket ±1, equi-join on the bucket, and refine
    with the exact predicate. Each B row lives in exactly ONE bucket and
    the ±1 explosion covers every possible match, so the join is exact
    with no dedup — 3× the probe rows buys a hash-partitionable plan
    whose per-bucket work is bounded by temporal density, not corpus size
    (bucket ids by exact integer DIV — no float time arithmetic).
    The plan-audit gate proves the point: this query passes the no-BNLJ
    rule that would flag the naive spelling. Delta is integer microseconds
    (epoch_us both engines — no float time arithmetic).
    """
    bucket_us = 600_000_000  # 10 minutes, == the window width
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    b = ev.select(
        F.col("event_id").alias("nearby_id"),
        F.col("event_type").alias("nearby_type"),
        F.col("us").alias("b_us"),
        F.expr(f"us DIV {bucket_us}").alias("bucket"),
    )
    a = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("us").alias("a_us"),
            F.explode(
                F.array(
                    F.expr(f"us DIV {bucket_us}") - 1,
                    F.expr(f"us DIV {bucket_us}"),
                    F.expr(f"us DIV {bucket_us}") + 1,
                )
            ).alias("bucket"),
        )
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.abs(F.col("b_us") - F.col("a_us")) <= bucket_us)
            & (F.col("signup_id") != F.col("nearby_id"))
        )
        .select(
            "signup_id",
            "nearby_id",
            "nearby_type",
            (F.col("b_us") - F.col("a_us")).alias("delta_us"),
        )
    )


@register(
    "join_asof",
    tags=("join",),
    oracle="""
    SELECT p.event_id AS purchase_id, v.ts AS last_view_ts
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: for each purchase, the latest same-user view at-or-before.

    SURVEY §2.B join_asof. Spark has no native ASOF: emulate with an
    equi+range join and row_number() keeping the latest right row. The
    oracle uses DuckDB's native ASOF LEFT JOIN — the hash match proves the
    emulation's semantics. µs-unique timestamps make the match unambiguous.

    Scale note: the emulation shuffles both sides once on user_id; the
    window is per-purchase and AQE handles user skew. For bounded lookback
    add a range predicate to cut the join fan-out.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    joined = p.join(
        v, (F.col("p_user") == F.col("v_user")) & (F.col("v_ts") <= F.col("p_ts")), "left"
    )
    w = Window.partitionBy("purchase_id").orderBy(F.col("v_ts").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", F.col("v_ts").alias("last_view_ts"))
    )


@register(
    "join_skew_salted",
    tags=("join", "scale"),
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS order_cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_skew_salted(spark, sf_dir):
    """Manually salted skew join: the fact side's join key is salted into
    ``SALT`` sub-keys and the dimension side is exploded ``SALT``× so every
    (key, salt) pair still matches — the classic pre-AQE remedy when one
    hot key floods a single reducer, and still the right tool when the
    skewed join feeds an aggregation AQE cannot split. The oracle is the
    UNsalted join: salting must be invisible in the result.

    Scale shape: shuffle keys become (custkey, salt) → a hot customer's
    rows spread over SALT reducers; the dim side grows SALT×, which is
    noise for a dimension table. Salt is derived from o_orderkey (pmod,
    deterministic), never random — reruns and retries stay identical.

    Measured on a genuinely skewed join (one key = 50% of a 16 M-row
    fact; tools/skew_ab.py, ISOLATE_r11.json `skew_join_ab`): AQE's
    skew-split beats plain sort-merge 2.59 vs 4.68 s median winning all
    4 paired rounds, while this manual-salt shape manages only 4.49 s
    on a 2 M-row dim — the SALT× build-side explosion cancels most of
    the rebalance gain. Salting is the right tool when the build side
    is small or the skewed op is one AQE cannot split; otherwise prefer
    AQE (on by default in session.py, now measured rather than
    asserted).
    """
    SALT = 8
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    salted_o = o.withColumn("salt", F.pmod(F.col("o_orderkey"), F.lit(SALT)))
    salted_c = c.select(
        "c_custkey", "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))).alias("salt"),
    )
    return (
        salted_o.join(
            salted_c,
            (salted_o.o_custkey == salted_c.c_custkey)
            & (salted_o.salt == salted_c.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            fsum(cents("o_totalprice"), 2, "total_price"),
        )
    )
