"""The remaining TPC-H-shaped queries (SURVEY.md §5: mirror TPC-H query
shapes without claiming compliance) — Q2, Q4, Q7, Q8, Q9, Q12, Q13, Q14,
Q15, Q16, Q17, Q19, Q20, Q21, Q22.

The fixtures have no ``partsupp`` table and drop several columns
(l_commitdate/l_receiptdate/l_shipmode, c_phone, p_container, …), so each
query keeps the ORIGINAL's plan shape — the joins, subquery structure, and
aggregate pattern Catalyst must plan — with adapted predicates:

- partsupp-based queries (Q2, Q16, Q20) use lineitem as the part↔supplier
  bridge relation.
- commit/receipt-date lateness (Q4, Q12, Q21) becomes "shipped ≥ N days
  after the order date".
- Q22's phone-prefix country code becomes the market segment.

Spark and the DuckDB oracle run the IDENTICAL SQL string (the dialect
subset is shared), so the hash gate checks the full SQL front-end +
Catalyst + execution pipeline per query. Money aggregates follow the
exact-decimal determinism contract (README): accumulate in DECIMAL(12,2)
products, cast the final aggregate to DOUBLE.

Deliberate scope: these queries keep the decimal spelling ON THE SPARK
SIDE TOO — identical-SQL coverage is their purpose. The five composites
measured at scale (q1/q3/q5/q6/q10/q18 in aggregates.py / advanced.py /
tpch_more.py) instead run the fixed-point fast path (functions/exact.py),
because decimal products past precision 18 leave Spark's long-backed
Decimal representation for per-row BigDecimal (A/B at sf10:
ISOLATE_r11.json `tpch_fixedpoint_paired_series`). A deployment that
benches any query here should apply the same rewrite.
"""

from __future__ import annotations

from pycaim_spark.catalog import register_temp_views
from pycaim_spark.registry import register

# Shared money expression: exact-decimal discounted price.
_VOL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(12,2))"
)


def _sql_query(name: str, sql: str, doc: str):
    # __doc__ must be set BEFORE register() runs: the registry snapshots
    # fn.__doc__ into spec.doc at decoration time, and OPERATORS.md's
    # generator harvests summaries from spec.doc — assigning after left
    # 16 empty summary cells (VERDICT r13 What's-missing #4).
    def fn(spark, sf_dir):
        register_temp_views(spark, sf_dir)
        return spark.sql(sql)

    fn.__name__ = name
    fn.__doc__ = doc
    return register(name, tags=("composite",), oracle=sql)(fn)


_Q2_SQL = """
    SELECT DISTINCT s.s_suppkey, s.s_acctbal, s.s_name, n.n_name,
           p.p_partkey, p.p_name
    FROM part p, supplier s, lineitem l, nation n, region r
    WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
      AND p.p_size <= 15 AND p.p_type = 'LARGE'
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND s.s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM supplier s2, lineitem l2, nation n2, region r2
          WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
      )
    ORDER BY s.s_acctbal, n.n_name, s.s_name, p.p_partkey, s.s_suppkey
    LIMIT 100
"""

tpch_q2 = _sql_query(
    "tpch_q2",
    _Q2_SQL,
    """TPC-H Q2 shape: minimum-cost supplier — 5-way join with a correlated
    scalar MIN subquery per part (Catalyst decorrelates into an aggregate
    + join on p_partkey). partsupp is adapted to the lineitem bridge and
    supply cost to s_acctbal; region/nation chain broadcasts.""",
)

_Q4_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

tpch_q4 = _sql_query(
    "tpch_q4",
    _Q4_SQL,
    """TPC-H Q4 shape: order-priority checking — correlated EXISTS planned
    as a left-semi join against lineitem ("a line shipped ≥60 days after
    ordering" replaces the missing commit/receipt dates). The orders-side
    date filter is pushed to the parquet scan before the semi join.""",
)

_Q7_SQL = f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               {_VOL} AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND n1.n_name < n2.n_name
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""

tpch_q7 = _sql_query(
    "tpch_q7",
    _Q7_SQL,
    """TPC-H Q7 shape: volume shipping between nation pairs — the nation
    table joins TWICE under different roles (supplier vs customer side);
    both broadcast. Nation-pair filter keeps the ordered-pair convention
    (n1 < n2) rather than two fixed nations so every scale factor is
    non-empty.""",
)

_Q8_SQL = f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               {_VOL} AS volume,
               n2.n_name AS supp_nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
             region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""

tpch_q8 = _sql_query(
    "tpch_q8",
    _Q8_SQL,
    """TPC-H Q8 shape: national market share — 8-way star join (customer
    region filtered, supplier nation projected into a conditional
    aggregate). The share is a ratio of two exact-decimal sums divided as
    doubles, rounded to 6 dp on both engines.""",
)

_Q9_SQL = f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               {_VOL} AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""

tpch_q9 = _sql_query(
    "tpch_q9",
    _Q9_SQL,
    """TPC-H Q9 shape: product-type profit — part-name LIKE filter feeds a
    4-way join grouped by supplier nation × order year (the missing
    partsupp supply-cost term drops from the profit expression; the join
    tree and double grouping survive).""",
)

_Q12_SQL = """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

tpch_q12 = _sql_query(
    "tpch_q12",
    _Q12_SQL,
    """TPC-H Q12 shape: shipping-mode priority split — conditional
    count aggregation after an orders⋈lineitem join with a cross-table
    lateness predicate (shipmode → returnflag, commit/receipt lateness →
    shipped ≥90 days after order date).""",
)

_Q13_SQL = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

tpch_q13 = _sql_query(
    "tpch_q13",
    _Q13_SQL,
    """TPC-H Q13 shape: customer order-count distribution — LEFT join with
    an extra join-side predicate (kept in the ON clause, not WHERE — the
    semantics differ), then a two-level aggregate: per-customer counts,
    then the histogram of those counts.""",
)

_Q14_SQL = f"""
    SELECT ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) * 100.0, 6) AS promo_revenue,
           COUNT(*) AS n_rows
    FROM (
        SELECT p_type, {_VOL} AS volume
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    ) x
"""

tpch_q14 = _sql_query(
    "tpch_q14",
    _Q14_SQL,
    """TPC-H Q14 shape: promotion-revenue share — single join, no group
    key, conditional-sum ratio. The p_type = 'PROMO' arm mirrors the
    original's PROMO%% prefix against the fixture's type domain.""",
)

_Q15_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_VOL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""

tpch_q15 = _sql_query(
    "tpch_q15",
    _Q15_SQL,
    """TPC-H Q15 shape: top supplier — a CTE (the original's view) scanned
    twice: once joined to supplier, once re-aggregated for the scalar MAX.
    The equality compare on total_revenue is safe because both sides
    compute it from the same exact-decimal sum.""",
)

_Q16_SQL = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

tpch_q16 = _sql_query(
    "tpch_q16",
    _Q16_SQL,
    """TPC-H Q16 shape: part/supplier relationship — COUNT(DISTINCT) per
    part attributes with a NOT IN anti-join against a filtered supplier
    list (complaints → low account balance), over the lineitem bridge in
    place of partsupp.""",
)

_Q17_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS a_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sq,
               COUNT(*) AS cq
        FROM lineitem GROUP BY l_partkey
    ) pa ON a_partkey = p_partkey
    WHERE p_brand = 'Brand#3' AND (l_quantity * 5.0) * cq < sq
"""

tpch_q17 = _sql_query(
    "tpch_q17",
    _Q17_SQL,
    """TPC-H Q17 shape: small-quantity-order revenue — the original's
    correlated 0.2·AVG(l_quantity) subquery, rewritten as a join against
    the per-part aggregate with the average inequality cross-multiplied
    (l_quantity·5·count < sum) so both engines compare exact decimals
    instead of engine-specific AVG floats.""",
)

_Q19_SQL = f"""
    SELECT CAST(SUM({_VOL}) AS DOUBLE) AS revenue, COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
"""

tpch_q19 = _sql_query(
    "tpch_q19",
    _Q19_SQL,
    """TPC-H Q19 shape: discounted revenue under OR-of-ANDs — three
    disjunctive brand/size/quantity envelopes over the part⋈lineitem
    join. Catalyst extracts the common join key while keeping the
    disjunction as a post-join filter.""",
)

_Q20_SQL = """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
        GROUP BY l_suppkey, l_partkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 50.0
    )
    ORDER BY s_suppkey
"""

tpch_q20 = _sql_query(
    "tpch_q20",
    _Q20_SQL,
    """TPC-H Q20 shape: potential part promotion — nested semi-join chain:
    suppliers that moved >50 units of any 'small%' part (the partsupp
    availqty threshold adapted to shipped quantity over the lineitem
    bridge). Planned as aggregate → left-semi join.""",
)

_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1
          FROM lineitem l3 JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
"""

tpch_q21 = _sql_query(
    "tpch_q21",
    _Q21_SQL,
    """TPC-H Q21 shape: suppliers who kept orders waiting — EXISTS plus
    NOT EXISTS over the same fact table (multi-supplier orders where ONLY
    this supplier shipped late). The inner o2 join keeps every correlation
    predicate an equality, which both Catalyst and DuckDB decorrelate.""",
)

_Q22_SQL = """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM (
        SELECT c_mktsegment AS cntrycode, c_acctbal
        FROM customer
        WHERE c_mktsegment IN ('FURNITURE', 'MACHINERY', 'BUILDING')
          AND c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                     / COUNT(*)
              FROM customer
              WHERE c_acctbal > 0.0
                AND c_mktsegment IN ('FURNITURE', 'MACHINERY', 'BUILDING')
          )
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
"""

tpch_q22 = _sql_query(
    "tpch_q22",
    _Q22_SQL,
    """TPC-H Q22 shape: global sales opportunity — uncorrelated scalar AVG
    subquery (exact sum/count division), anti-join against orders
    ("customers with no urgent orders" keeps the anti side non-empty at
    every scale factor), grouped conditional aggregate. Country code →
    market segment (no c_phone in the fixture).""",
)

_Q11_SQL = """
    SELECT l_partkey, part_value
    FROM (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS part_value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 0
        GROUP BY l_partkey
    ) pv
    WHERE part_value > (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               * 0.001
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 0
    )
    ORDER BY part_value DESC, l_partkey
"""

tpch_q11 = _sql_query(
    "tpch_q11",
    _Q11_SQL,
    """TPC-H Q11 shape: important stock identification — the same join
    tree aggregated twice (per-part value vs an uncorrelated scalar
    fraction of the total), filtered by the share threshold. partsupp
    value maps to shipped extended price over the lineitem bridge;
    the nation filter keeps the original's single-country scope.""",
)
