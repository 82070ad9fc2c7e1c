"""ANN recall at scale (VERDICT r10 #3): recall@5 of every approximate
top-k family member vs the exact brute-force neighbors, on the SAME scaled
corpus the timing sweeps use — a fast-but-wrong index is the classic
100 TB failure mode, and wall-time rows alone cannot catch it.

For the top-k queries (sim_ivf / sim_pq / sim_ivf_pq / sim_ivf_pq_stored)
recall@5 is averaged over the 10 query vectors against sim_cosine_exact's
top-5 on the same sf dir. For the pair-contract sim_lsh_bucketed, exact
ground truth over all pairs is quadratic in the corpus, so recall is
measured on the restriction to pairs touching the 10 query vectors
(computable exactly with one broadcast pass at any scale).

Usage: python tools/ann_recall.py [sf_dir ...]   (default: sf0.1, sf1, sf10)
Writes/merges the result into SCALING_r11.json under "ann_recall".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, os.environ.get("PYCAIM_SCALING_OUT", "SCALING_r13.json")
)

TOPK_QUERIES = ["sim_ivf", "sim_pq", "sim_ivf_pq", "sim_ivf_pq_stored"]


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall_vs(exact: dict[int, set[int]], approx: dict[int, set[int]]) -> float:
    per_q = [
        len(exact[q] & approx.get(q, set())) / len(exact[q])
        for q in exact
        if exact[q]
    ]
    return round(sum(per_q) / len(per_q), 4) if per_q else 1.0


def lsh_pair_recall(spark, sf_dir: str) -> dict[str, float]:
    """Recall of sim_lsh_bucketed on pairs touching the 10 query vectors,
    vs the exact cos ≥ 0.3 ground truth for those rows (one broadcast
    pass: 10 × |corpus|)."""
    import pyspark.sql.functions as F

    from pycaim_spark.registry import REGISTRY

    # exact ground truth: query-side neighbors with cos >= 0.3 (the
    # operator's min_cos), any rank — one broadcast pass over the corpus
    from pycaim_spark.queries.llm_dedup import dot_expr, norm_expr
    from pycaim_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "embedding", norm_expr(F.col("embedding")).alias("nrm")
    )
    q = v.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_norm"),
    )
    cos = dot_expr(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("nrm")
    )
    exact_pairs = {
        (min(r.qid, r.vec_id), max(r.qid, r.vec_id))
        for r in F.broadcast(q)
        .crossJoin(v)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
        .filter(F.col("cos") >= 0.3)
        .collect()
    }
    got = REGISTRY["sim_lsh_bucketed"].fn(spark, sf_dir)
    cols = got.columns
    a, b = ("vec_a", "vec_b") if "vec_a" in cols else (cols[0], cols[1])
    approx_pairs = {
        (min(r[a], r[b]), max(r[a], r[b]))
        for r in got.filter(
            (F.col(a) < 10) | (F.col(b) < 10)
        ).collect()
    }
    if not exact_pairs:
        return {"recall": 1.0, "exact_pairs": 0}
    return {
        "recall": round(
            len(exact_pairs & approx_pairs) / len(exact_pairs), 4
        ),
        "exact_pairs": len(exact_pairs),
    }


def main() -> None:
    from pycaim_spark.registry import REGISTRY, _ensure_loaded
    from pycaim_spark.session import get_spark

    _ensure_loaded()
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".scratch", "sf1"),
        os.path.join(REPO, ".scratch", "sf10"),
    ]
    spark = get_spark(app_name="ann-recall")
    results: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}", file=sys.stderr)
            continue
        exact = topk_sets(REGISTRY["sim_cosine_exact"].fn(spark, sf_dir))
        row: dict[str, object] = {}
        for name in TOPK_QUERIES:
            row[name] = recall_vs(
                exact, topk_sets(REGISTRY[name].fn(spark, sf_dir))
            )
            print(f"{sf_dir} {name}: recall@5 = {row[name]}", flush=True)
        row["sim_lsh_bucketed"] = lsh_pair_recall(spark, sf_dir)
        print(f"{sf_dir} sim_lsh_bucketed: {row['sim_lsh_bucketed']}",
              flush=True)
        results[sf_dir] = row
    spark.stop()
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged["ann_recall"] = {
        "note": (
            "recall@5 vs sim_cosine_exact top-5 (10 query vectors), same "
            "corpus as the timing sweeps; sim_lsh_bucketed measured on the "
            "pair restriction touching the query vectors vs exact cos>=0.3"
        ),
        "results": results,
    }
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
