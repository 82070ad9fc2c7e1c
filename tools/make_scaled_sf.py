"""Synthesize a larger scale factor by replicating a fixture dir with key
offsets (VERDICT r2 #1: show the Spark/DuckDB ratio converging with scale).

Each replica r offsets every primary/foreign key by r x (max_key + 1) so FK
joins stay 1:N with the same selectivities; dimension tables (region,
nation) are shared. events.user_id is offset so sessionization scales in
users, not session length; documents get a per-replica text prefix so
distinct-text workloads scale; embeddings keep their vectors (ANN load
scales in corpus size).

Round 12: ``--perturb-embeddings LO --perturb-max HI`` replaces the
verbatim embedding replication with seeded Gaussian jitter of per-copy
relative norm s ~ U(LO, HI) on every replica r > 0 (r = 0 stays
verbatim). Verbatim replicas make ANN recall trivially 1.0 at sf1/sf10
— every query has an exact cos≈1 twin per replica (SCALING_r11.json
`ann_recall` caveat) — and SMALL jitter is still trivial (the exact
re-rank recovers near-twins; see perturbed_embeddings's docstring for
why the spread must overlap the natural similarity range — the shipped
scale corpora use LO=1 HI=3). ``--only-embeddings`` rewrites just
embeddings.parquet in an existing scaled dir (the other tables stay
byte-identical for the timing sweeps).

Usage: python tools/make_scaled_sf.py [--base /root/testdata/sf0.1]
       [--out .scratch/sf1] [--factor 10]
       [--perturb-embeddings 1.0 --perturb-max 3.0] [--only-embeddings]
"""

from __future__ import annotations

import argparse
import os

import duckdb


def perturbed_embeddings(base: str, out: str, factor: int, sigma: float,
                         offset: int, sigma_max: float | None = None) -> None:
    """Replicate embeddings with seeded Gaussian jitter. Each copy i of a
    vector draws its own relative-norm scale s_i ~ U(sigma, sigma_max)
    (per-element std = s_i·‖v‖/√d, so E‖noise‖ ≈ s_i·‖v‖; cos to the
    original ≈ 1/√(1+s_i²)). Replica 0 is verbatim — the corpus still
    CONTAINS the original vectors.

    Choosing the range is what makes scale recall a REAL measurement
    (r12, learned twice): verbatim replicas give every query an exact
    twin per replica → recall trivially 1.0; SMALL jitter (s ≤ 0.3,
    cos ≥ 0.95) still leaves every copy in the query's own IVF cell and
    far above the natural similarity range, so the 256-candidate ADC
    shortlist + exact re-rank recover the top-5 perfectly → still 1.0
    (SCALING_r12.json `ann_recall` history). The jitter must OVERLAP the
    corpus's natural neighbor similarities (here cos ≈ 0.3–0.6):
    s ~ U(1, 3) puts copies at cos ≈ 0.32–0.71, so a query's exact top-5
    mixes low-jitter copies with natural neighbors spread across cells —
    which a good index finds and a bad one misses. That is also the
    honest model of a 100× corpus: new draws from the same distribution,
    not photocopies."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(base, "embeddings.parquet"))
    vec_id = tbl["vec_id"].to_numpy()
    emb = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32)
    label = tbl["label"].to_numpy()
    n, d = emb.shape
    rng = np.random.default_rng(20260815)
    hi = sigma_max if sigma_max is not None else 10 * sigma
    norms = np.linalg.norm(emb, axis=1, keepdims=True).astype(np.float32)
    ids_parts, emb_parts, label_parts = [], [], []
    for r in range(factor):
        ids_parts.append(vec_id + r * offset)
        label_parts.append(label)
        if r == 0:
            emb_parts.append(emb)
        else:
            s = rng.uniform(sigma, hi, size=(n, 1)).astype(np.float32)
            noise = rng.standard_normal((n, d)).astype(np.float32)
            emb_parts.append(emb + noise * (s * norms / np.sqrt(d)))
    all_emb = np.concatenate(emb_parts)
    offsets = np.arange(0, (len(all_emb) + 1) * d, d, dtype=np.int64)
    emb_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()),
        pa.array(all_emb.reshape(-1), type=pa.float32()),
    )
    result = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids_parts), type=pa.int64()),
            "embedding": emb_arr,
            "label": pa.array(np.concatenate(label_parts), type=pa.int32()),
        }
    )
    pq.write_table(result, os.path.join(out, "embeddings.parquet"))
    print(f"  embeddings: {len(result)} rows (perturb sigma={sigma})")


def scale_dir(base: str, out: str, factor: int, perturb: float = 0.0,
              perturb_max: float | None = None,
              only_embeddings: bool = False) -> None:
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

    if only_embeddings:
        if perturb > 0:
            perturbed_embeddings(base, out, factor, perturb,
                                 off["embeddings"], perturb_max)
        else:
            copy(
                "embeddings",
                f"""SELECT vec_id + r * {off['embeddings']} AS vec_id,
                           embedding, label
                    FROM {src('embeddings')}, {rep}""",
            )
        con.close()
        return

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
    if perturb > 0:
        perturbed_embeddings(base, out, factor, perturb, off["embeddings"],
                             perturb_max)
    else:
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
    ap.add_argument("--perturb-embeddings", type=float, default=0.0,
                    metavar="SIGMA",
                    help="Gaussian jitter of relative norm SIGMA on "
                         "embedding replicas r>0 (0 = verbatim copies)")
    ap.add_argument("--perturb-max", type=float, default=None,
                    metavar="SIGMA_MAX",
                    help="upper end of the per-copy jitter spread "
                         "(default 10x --perturb-embeddings; use ~1..3 "
                         "to overlap natural similarities and make scale "
                         "recall discriminative)")
    ap.add_argument("--only-embeddings", action="store_true",
                    help="rewrite only embeddings.parquet in an existing "
                         "scaled dir")
    args = ap.parse_args()
    print(f"scaling {args.base} x{args.factor} -> {args.out}")
    scale_dir(args.base, args.out, args.factor,
              perturb=args.perturb_embeddings,
              perturb_max=args.perturb_max,
              only_embeddings=args.only_embeddings)
