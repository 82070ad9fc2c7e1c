"""Synthesize a larger scale factor by replicating a fixture dir with key
offsets (VERDICT r2 #1: show the Spark/DuckDB ratio converging with scale).

Each replica r offsets every primary/foreign key by r x (max_key + 1) so FK
joins stay 1:N with the same selectivities; dimension tables (region,
nation) are shared. events.user_id is offset so sessionization scales in
users, not session length; documents get a per-replica text prefix so
distinct-text workloads scale; embeddings keep their vectors (ANN load
scales in corpus size).

Usage: python tools/make_scaled_sf.py [--base /root/testdata/sf0.1]
       [--out .scratch/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb


def scale_dir(base: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{os.path.join(base, t + '.parquet')}')"

    def copy(t: str, select_sql: str) -> None:
        dest = os.path.join(out, f"{t}.parquet")
        con.execute(f"COPY ({select_sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dest}')").fetchone()[0]
        print(f"  {t}: {n} rows")

    off = {
        t: con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
        for t, k in (
            ("customer", "c_custkey"), ("supplier", "s_suppkey"),
            ("part", "p_partkey"), ("orders", "o_orderkey"),
            ("events", "event_id"), ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        )
    }
    off["user"] = con.execute(
        f"SELECT max(user_id) + 1 FROM {src('events')}"
    ).fetchone()[0]
    rep = f"(SELECT unnest(range({factor})) AS r)"

    copy("region", f"SELECT * FROM {src('region')}")
    copy("nation", f"SELECT * FROM {src('nation')}")
    copy(
        "customer",
        f"""SELECT c_custkey + r * {off['customer']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, {rep}""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + r * {off['supplier']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {src('supplier')}, {rep}""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + r * {off['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src('part')}, {rep}""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + r * {off['orders']} AS o_orderkey,
                   o_custkey + r * {off['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {rep}""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + r * {off['orders']} AS l_orderkey,
                   l_partkey + r * {off['part']} AS l_partkey,
                   l_suppkey + r * {off['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {rep}""",
    )
    copy(
        "events",
        f"""SELECT event_id + r * {off['events']} AS event_id,
                   ts,
                   user_id + r * {off['user']} AS user_id,
                   event_type, value, props
            FROM {src('events')}, {rep}""",
    )
    copy(
        "documents",
        f"""SELECT doc_id + r * {off['documents']} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE 'rep' || r || ' ' || text END AS text,
                   lang, source,
                   CASE WHEN r = 0 THEN n_chars
                        ELSE n_chars + len('rep' || r || ' ') END AS n_chars
            FROM {src('documents')}, {rep}""",
    )
    copy(
        "embeddings",
        f"""SELECT vec_id + r * {off['embeddings']} AS vec_id,
                   embedding, label
            FROM {src('embeddings')}, {rep}""",
    )
    con.close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
    ))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    print(f"scaling {args.base} x{args.factor} -> {args.out}")
    scale_dir(args.base, args.out, args.factor)
