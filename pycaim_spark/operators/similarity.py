"""Embedding-similarity primitives (SURVEY.md §2.C).

Column-expression helpers build JVM-side higher-order functions — the dot
product is a ``zip_with`` + left-fold ``aggregate`` in index order, which
both Spark and the DuckDB oracle (``list_reduce``) evaluate identically in
IEEE double, so exact-cosine queries hash-match without tolerance.

Scale design: norms are precomputed per vector (one projection) before any
pair join; the brute-force path crossJoins a small query set against the
corpus (broadcast the queries); the approximate paths bucket the corpus so
the pair space never materializes.
"""

from __future__ import annotations

import os
import sys as _sys

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

try:
    from pyspark import cloudpickle as _cloudpickle
except ImportError:  # pragma: no cover
    import cloudpickle as _cloudpickle


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a left fold in index order (bit-stable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per vector — never inside a pair join."""
    return df.withColumn("_norm", norm_expr(F.col(vec_col)))


# SQL twins of the expressions above, for oracle construction.
DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
)
NORM_SQL = "sqrt(" + DOT_SQL.format(a="{a}", b="{a}") + ")"


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-LSH bucketing."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_signature_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id: bit b set iff dot(v, plane_b) >= 0.

    Cosine-preserving (random hyperplane LSH): vectors with high cosine
    collide with high probability. Evaluated as codegen'd expressions over
    literal plane arrays — no Python, no shuffle.
    """
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot_expr(vec_col, arr) >= 0).cast("long")
        sig = sig + F.shiftleft(bit, b)
    return sig


def bucketed_cosine_neighbors(
    emb: DataFrame,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    min_cos: float = 0.3,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """Approximate near-neighbor pairs via banded sign-LSH: ``n_tables``
    independent ``n_planes``-bit signatures; a pair is a candidate if it
    collides in ANY table (OR-of-bands — the same recall construction as
    MinHash banding). Exact cosine is then evaluated only on candidates.

    Collision probability per table is (1 - θ/π)^n_planes, so recall at
    cos=0.3 with 4×16 is ≈ 1-(1-0.6^4)^16 ≈ 0.89 while the evaluated pair
    space stays a small fraction of all-pairs. Returns (vec_a, vec_b, cos)
    with vec_a < vec_b, bit-identical cosine to the exact operator.

    Dense-clique safeguard: a bucket wider than ``max_bucket_width`` (env
    ``PYCAIM_LSH_MAX_BUCKET``, default 256; 0 disables) degrades to STAR
    candidates against its min-id member — ≤ m−1 pairs instead of m²/2,
    so replica-dense corpora bound the pair list instead of exhausting the
    JVM; connectivity survives for downstream clustering. The guard is
    INPUT-side: bucket widths are counted JVM-side (a window over the
    bucket key) *before* the grouped map, and wide buckets are star-paired
    as a JVM projection, so no pandas group ever materializes more than
    ``max_bucket_width`` embeddings in one Arrow batch — a width-W replica
    clique costs O(W) shuffled rows, never a W×dim single-task matrix.
    The gemm raises if a wider group ever reaches it (fail fast beats a
    silent executor OOM at 100 TB).
    """
    import os

    import numpy as np
    import pandas as pd

    if max_bucket_width is None:
        max_bucket_width = int(os.environ.get("PYCAIM_LSH_MAX_BUCKET", "256"))

    # All-table signatures in ONE Arrow-batched matrix multiply per batch:
    # (batch × dim) @ (dim × n_tables·n_planes) then sign-pack per table.
    # ~64 HOF fold expressions per row would evaluate interpretively; the
    # BLAS path is two orders of magnitude cheaper and equally
    # deterministic on fixed inputs.
    planes_all = np.vstack(
        [random_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )  # (n_tables*n_planes, dim)

    def _signatures(col):
        mat = np.stack(col.to_numpy())  # (batch, dim) float32
        bits = (mat.astype(np.float64) @ planes_all.T) >= 0  # (batch, T*P)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        sigs = bits.reshape(len(mat), n_tables, n_planes) @ weights
        return pd.Series(list(sigs.astype(np.int64)))

    # asNondeterministic: guide-§4.4 single-evaluation pin. posexplode of
    # the signature column makes Catalyst infer a `size(sigs) > 0 AND
    # isnotnull(sigs)` filter and push it below the projection, which
    # DUPLICATES the ArrowEvalPython node — every row paid the BLAS
    # signature pass twice per branch (4× per query with the star branch;
    # plans/r18/sim_lsh_bucketed_before.txt operators 3/6/18/21). The
    # function is pure on fixed inputs; the flag only forbids Catalyst
    # from reordering/duplicating it, so results are unchanged.
    # PYCAIM_SIM_UNIFY arms: "1" (default) = this pin + the exchange-
    # unifying keep-alives below; "nd" = this pin only (each branch keeps
    # its own pruned exchange but evaluates the UDF once); "0" = the r17
    # form (duplicated evaluation under the inferred posexplode filter).
    _sim_unify = os.environ.get("PYCAIM_SIM_UNIFY", "1")
    signatures = F.pandas_udf(_signatures, "array<long>")
    if _sim_unify != "0":
        signatures = signatures.asNondeterministic()

    sig = emb.select(
        F.col("vec_id"),
        F.col("embedding"),
        norm_expr(F.col("embedding")).alias("_norm"),
        signatures(F.col("embedding")).alias("sigs"),
    )
    # (table_id, signature) is the bucket key; posexplode keeps tables
    # independent. Candidate generation runs INSIDE each bucket as one
    # BLAS gemm (applyInPandas): a bucket of m members scores its m²/2
    # pairs in a single matrix multiply and emits only near-threshold ids
    # — the full candidate pair space (the overwhelming majority of which
    # scores below threshold) is never materialized as rows or shuffled.
    # At 100 TB each bucket is one task; oversized buckets are the skew
    # knob (cap bucket size or add planes).
    buckets = sig.select(
        "vec_id", "embedding", "_norm",
        F.posexplode("sigs").alias("table_id", "bucket"),
    )

    # The gemm prefilter keeps a 1e-6 safety margin below min_cos: BLAS
    # summation order differs from the index-order fold by ~1e-14, and
    # HALF_UP rounding at 6 dp can lift a raw cosine by at most 5e-7, so
    # no pair whose EXACT rounded cosine passes the threshold is lost.
    margin = 1.0e-6

    def _bucket_pairs(pdf):
        if max_bucket_width and len(pdf) > max_bucket_width:
            # The JVM-side width filter routes wide buckets to the star
            # path BEFORE this grouped map; reaching here means the
            # input-side guard is broken — fail fast, don't OOM a task.
            raise RuntimeError(
                f"sign-LSH bucket of width {len(pdf)} reached the gemm "
                f"(cap {max_bucket_width}); input-side guard breached"
            )
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype("int64")
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        nrm = pdf["_norm"].to_numpy()
        cos = (mat @ mat.T) / np.outer(nrm, nrm)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = cos[iu, ju] >= min_cos - margin
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {"vec_a": np.minimum(a, b), "vec_b": np.maximum(a, b)}
        ).astype("int64")

    if max_bucket_width:
        # INPUT-side clique guard: bucket widths must be known BEFORE the
        # grouped map so no pandas group ever materializes more than the
        # cap. Four shapes measured under the isolate protocol
        # (ISOLATE_r8.json, sf0.1, fresh JVM, median of 3; guard-off
        # floor 1.25 s; select with env ``PYCAIM_SIM_GUARD_SHAPE``):
        #
        # - ``window`` (default, 1.61 s): one window over the bucket key
        #   tags every exploded row with its width and bucket-min — ONE
        #   exchange + ONE sort total, and the grouped map reuses both the
        #   partitioning and the sort order the window established; the
        #   narrow/star split is a filter, no joins. The signature UDF
        #   runs once, below the exchange.
        # - ``nopart`` (1.89 s): wide stats partial-aggregate into a tiny
        #   shuffle, AQE broadcasts the wide list — embedding rows shuffle
        #   once, but the signature UDF re-evaluates per consumer.
        # - ``single`` (2.53 s): explicit repartition of the exploded
        #   embedding rows, stats/star/anti/gemm all read it via
        #   ReuseExchange — extra exchange reads cost more than they save.
        # - ``dual`` (2.44 s): the round-7 shape — a second skinny
        #   exchange that re-runs the signature UDF for the stats side.
        #
        # All four are pure physical variants of the same semantics: wide
        # buckets star-pair against the bucket min id as a JVM projection,
        # so a width-W replica clique costs O(W) shuffled rows and no
        # W×dim Arrow batch ever reaches a task. The shared exact-scoring
        # join below applies the same min_cos filter to star pairs the
        # gemm prefilter would have.
        n_part = emb.sparkSession.sparkContext.defaultParallelism
        shape = os.environ.get("PYCAIM_SIM_GUARD_SHAPE", "window")
        if shape == "window":
            # ONE exchange + ONE sort total: the window over the bucket
            # key tags every exploded row with its bucket width and min id;
            # the grouped map then reuses both the partitioning AND the
            # sort order the window already established.
            from pyspark.sql import Window

            w = Window.partitionBy("table_id", "bucket")
            tagged = buckets.select(
                "*",
                F.count(F.lit(1)).over(w).alias("_w"),
                F.min("vec_id").over(w).alias("_min_id"),
            )
            star_cond = (F.col("_w") > max_bucket_width) & (
                F.col("vec_id") != F.col("_min_id")
            )
            if _sim_unify not in ("0", "nd"):
                # Canonical-subtree keep-alive (row-level no-op: sizes are
                # ≥ 0 for non-null arrays and _norm is a sqrt): without a
                # reference to embedding/_norm ABOVE the window, column
                # pruning skinnies the star branch's copy of the bucket
                # exchange to (vec_id, table_id, bucket) while the gemm
                # branch carries the vectors — the canonicalized subtrees
                # then differ and ReuseExchange cannot dedup them, so the
                # scan + signature UDF + explode + shuffle all ran TWICE
                # (plans/r18/sim_lsh_bucketed_before.txt operators 1-9 vs
                # 16-24). These predicates sit above the window (they are
                # not partition-key filters, so they cannot be pushed
                # below it) and force the same wide exchange on both
                # branches. PYCAIM_SIM_UNIFY=nd keeps the single-eval UDF
                # pin but drops these keep-alives (thin star exchange);
                # =0 restores the r17 form.
                star_cond = (
                    star_cond
                    & (F.size("embedding") >= 0)
                    & (F.col("_norm") >= 0)
                )
            star = tagged.filter(star_cond).select(
                F.col("_min_id").alias("vec_a"),
                F.col("vec_id").alias("vec_b"),
            )
            narrow = tagged.filter(F.col("_w") <= max_bucket_width).drop(
                "_w", "_min_id"
            )
        elif shape == "nopart":
            # No explicit exchange: wide stats partial-aggregate into a
            # tiny shuffle, AQE broadcasts the wide list, the embedding
            # rows shuffle exactly once (into the grouped map) — at the
            # cost of re-evaluating the signature UDF per consumer.
            stats_wide = (
                buckets.groupBy("table_id", "bucket")
                .agg(
                    F.count(F.lit(1)).alias("_w"),
                    F.min("vec_id").alias("_min_id"),
                )
                .filter(F.col("_w") > max_bucket_width)
            )
            star = (
                buckets.join(stats_wide, ["table_id", "bucket"])
                .filter(F.col("vec_id") != F.col("_min_id"))
                .select(
                    F.col("_min_id").alias("vec_a"),
                    F.col("vec_id").alias("vec_b"),
                )
            )
            narrow = buckets.join(
                stats_wide, ["table_id", "bucket"], "left_anti"
            )
        elif shape == "single":
            bucket_rows = buckets.repartition(
                n_part, F.col("table_id"), F.col("bucket")
            )
            stats_wide = (
                bucket_rows.groupBy("table_id", "bucket")
                .agg(
                    F.count(F.lit(1)).alias("_w"),
                    F.min("vec_id").alias("_min_id"),
                )
                .filter(F.col("_w") > max_bucket_width)
            )
            # _min_id is the bucket minimum, so vec_a < vec_b holds.
            star = (
                bucket_rows.join(stats_wide, ["table_id", "bucket"])
                .filter(F.col("vec_id") != F.col("_min_id"))
                .select(
                    F.col("_min_id").alias("vec_a"),
                    F.col("vec_id").alias("vec_b"),
                )
            )
            narrow = bucket_rows.join(
                stats_wide, ["table_id", "bucket"], "left_anti"
            )
        elif shape == "dual":
            skinny = sig.select(
                "vec_id", F.posexplode("sigs").alias("table_id", "bucket")
            ).repartition(n_part, F.col("table_id"), F.col("bucket"))
            stats_wide = (
                skinny.groupBy("table_id", "bucket")
                .agg(
                    F.count(F.lit(1)).alias("_w"),
                    F.min("vec_id").alias("_min_id"),
                )
                .filter(F.col("_w") > max_bucket_width)
            )
            star = (
                skinny.join(stats_wide, ["table_id", "bucket"])
                .filter(F.col("vec_id") != F.col("_min_id"))
                .select(
                    F.col("_min_id").alias("vec_a"),
                    F.col("vec_id").alias("vec_b"),
                )
            )
            narrow = buckets.repartition(
                n_part, F.col("table_id"), F.col("bucket")
            ).join(stats_wide, ["table_id", "bucket"], "left_anti")
        else:  # pragma: no cover - env misconfiguration
            raise ValueError(f"unknown PYCAIM_SIM_GUARD_SHAPE: {shape!r}")
        candidates = (
            narrow.groupBy("table_id", "bucket")
            .applyInPandas(_bucket_pairs, "vec_a long, vec_b long")
            .unionAll(star)
            .dropDuplicates(["vec_a", "vec_b"])
        )
    else:
        candidates = (
            buckets.groupBy("table_id", "bucket")
            .applyInPandas(_bucket_pairs, "vec_a long, vec_b long")
            .dropDuplicates(["vec_a", "vec_b"])
        )
    # Final score: the SAME index-order fold + HALF_UP round as the exact
    # all-pairs operator, so surviving pairs carry bit-identical cosines.
    # Runs only on the few candidates that pass the prefilter. Built from
    # ``emb`` directly (not ``sig``): the verify side never needs the
    # signature column, and deriving it from the projection that carries
    # the now-non-deterministic UDF would leave Catalyst unable to prune
    # the UDF out of the broadcast subtree.
    vecs = emb.select(
        "vec_id", "embedding", norm_expr(F.col("embedding")).alias("_norm")
    )
    joined = (
        candidates.join(vecs.alias("va"), candidates.vec_a == F.col("va.vec_id"))
        .join(vecs.alias("vb"), candidates.vec_b == F.col("vb.vec_id"))
    )
    cos = F.round(
        dot_expr(F.col("va.embedding"), F.col("vb.embedding"))
        / (F.col("va._norm") * F.col("vb._norm")),
        6,
    )
    return joined.select("vec_a", "vec_b", cos.alias("cos")).filter(
        F.col("cos") >= min_cos
    )


def _kmeanspp_init(x: np.ndarray, n_cells: int, rng) -> np.ndarray:
    """k-means++ seeding on the unit sphere: each next seed is drawn with
    probability ∝ its squared Euclidean distance to the nearest chosen
    seed (for unit vectors, ‖a−b‖² = 2(1−cos), so ∝ 1−cos). Spreads the
    initial centroids across the data's actual modes instead of uniform
    draws that can land several seeds in one dense region — the classic
    fix for k-means landing in a poor local optimum (VERDICT r11 #6:
    improve cell ASSIGNMENT at unchanged nprobe). Measured and DECLINED
    as the default — it lowers fixed-nprobe recall on this corpus (see
    _spherical_kmeans's docstring; SCALING_r12.json `ivf_init_grid`);
    kept selectable via PYCAIM_IVF_INIT=kmeanspp. Deterministic under
    the caller's seeded rng."""
    centroids = np.empty((n_cells, x.shape[1]))
    centroids[0] = x[rng.integers(len(x))]
    d = np.maximum(1.0 - x @ centroids[0], 0.0)
    for i in range(1, n_cells):
        total = d.sum()
        idx = rng.choice(len(x), p=d / total) if total > 0 else rng.integers(len(x))
        centroids[i] = x[idx]
        d = np.minimum(d, np.maximum(1.0 - x @ centroids[i], 0.0))
    return centroids


def _spherical_kmeans(
    sample: np.ndarray, n_cells: int, iters: int, seed: int,
    init: str | None = None,
) -> np.ndarray:
    """Seeded spherical k-means over a driver-side sample — the IVF coarse
    quantizer. Deterministic: seeded init, fixed iteration count, empty
    cells keep their previous centroid. ``init`` is 'uniform' (default)
    or 'kmeanspp' ($PYCAIM_IVF_INIT overrides for the A/B harness).

    Uniform seeding is the MEASURED winner for recall at fixed nprobe
    (VERDICT r11 #6 tried k-means++ and more Lloyd iterations;
    SCALING_r12.json `ivf_init_grid`): k-means++ spreads seeds toward
    outliers, fragmenting the dense regions where the true neighbors
    live across more cells than nprobe covers — sf0.1 recall@5 dropped
    0.72→0.60 (sim_ivf) and 0.80→0.74 (sim_ivf_pq registry settings);
    iters 10→25 moved nothing. Good k-means objective ≠ good
    fixed-nprobe recall."""
    init = init or os.environ.get("PYCAIM_IVF_INIT", "uniform")
    rng = np.random.default_rng(seed)
    x = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    if init == "uniform":
        centroids = x[rng.choice(len(x), size=n_cells, replace=False)].copy()
    else:
        centroids = _kmeanspp_init(x, n_cells, rng)
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / np.linalg.norm(m)
    return centroids


def ivf_topk_neighbors(
    emb: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    k: int = 5,
    n_queries: int = 10,
    sample_size: int = 1024,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine neighbors — the
    FAISS-style scale path next to sign-LSH bucketing:

    1. Train ``n_cells`` coarse centroids by spherical k-means on a
       driver-side sample (standard IVF practice — FAISS trains on a
       sample too; at 100 TB swap the deterministic head sample for
       ``df.sample(fraction)``).
    2. Assign every corpus vector to its nearest centroid — one
       Arrow-batched matrix multiply, no shuffle (centroids travel in the
       UDF closure; ~n_cells·dim·8 bytes).
    3. Each query probes its ``nprobe`` nearest cells; the candidate join
       is an equi-join on cell id, so the scored pair space is
       ``nprobe/n_cells`` of brute force and partitions cleanly by cell.

    Returns (query_id, neighbor_id, cos, rn) — same shape as
    ``sim_cosine_exact`` so recall is directly measurable.
    """
    import pandas as pd
    from pyspark.sql import Window

    sample = np.stack(
        emb.orderBy("vec_id")
        .limit(sample_size)
        .select("embedding")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    centroids = _spherical_kmeans(sample, n_cells, iters, seed)

    def _nearest_cell(col):
        mat = np.stack(col.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(np.argmax(mat @ centroids.T, axis=1).astype(np.int32))

    def _probe_cells(col):
        mat = np.stack(col.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        order = np.argsort(-(mat @ centroids.T), axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    nearest_cell = F.pandas_udf(_nearest_cell, "int")
    probe_cells = F.pandas_udf(_probe_cells, "array<int>")

    v = emb.select(
        "vec_id", "embedding", norm_expr(F.col("embedding")).alias("_norm")
    )
    # Cell-partitioned corpus: the IVF storage layout a cluster would use.
    # Also the local parallelism fix — an embedding table is few BYTES but
    # heavy per ROW (the scoring fold is per-element), so byte-sized input
    # splits under-parallelize it: at sf10 the embeddings file fits one
    # 128 MiB split, serializing assign+probe on one task. Isolate A/B at
    # sf10: 4.66 s unpartitioned → 2.83 s cell-partitioned
    # (ISOLATE_r8.json ivf_*_sf10).
    corpus = v.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("_norm").alias("c_norm"),
        nearest_cell("embedding").alias("cell"),
    ).repartition(
        emb.sparkSession.sparkContext.defaultParallelism, F.col("cell")
    )
    queries = (
        v.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("_norm").alias("q_norm"),
            F.explode(probe_cells("embedding")).alias("cell"),
        )
    )
    cos = F.round(
        dot_expr(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def _pq_train(
    x: np.ndarray, m: int, k_centroids: int, iters: int, seed: int
) -> np.ndarray:
    """Seeded per-subspace L2 k-means codebooks (m, k_centroids, dim/m) —
    shared by flat PQ (raw vectors) and IVF-PQ (cell residuals)."""
    dim = x.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    rng = np.random.RandomState(seed)
    codebooks = np.empty((m, k_centroids, sub))
    for i in range(m):
        xi = x[:, i * sub : (i + 1) * sub]
        cent = xi[rng.choice(len(xi), k_centroids, replace=False)]
        for _ in range(iters):
            d2 = ((xi[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k_centroids):
                mask = assign == c
                if mask.any():
                    cent[c] = xi[mask].mean(0)
        codebooks[i] = cent
    return codebooks


def _exact_rerank(
    emb: DataFrame, cand: DataFrame, q_rows, k: int
) -> DataFrame:
    """Re-rank (query_id, neighbor_id) candidates with the EXACT JVM-side
    cosine (same index-order fold + rounding as sim_cosine_exact), so every
    returned cos is exact and recall is the only approximation. Shared tail
    of the PQ and IVF-PQ operators."""
    from pyspark.sql import Window

    queries_df = F.broadcast(
        emb.sparkSession.createDataFrame(
            [(int(r.vec_id), list(map(float, r.embedding))) for r in q_rows],
            "query_id int, q_emb array<double>",
        ).select(
            "query_id", "q_emb", norm_expr(F.col("q_emb")).alias("q_norm")
        )
    )
    v = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        norm_expr(F.col("embedding")).alias("c_norm"),
    )
    cos = F.round(
        dot_expr(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(queries_df, "query_id")
        .join(v, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def pq_topk_neighbors(
    emb: DataFrame,
    m: int = 8,
    k_centroids: int = 16,
    k: int = 5,
    n_queries: int = 10,
    n_candidates: int = 256,
    sample_size: int = 1024,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Product-quantization (PQ) approximate top-k cosine neighbors — the
    memory-compression scale path next to IVF and sign-LSH: each vector is
    stored as ``m`` one-byte codes (64 float32 → 8 bytes here, 32×), and
    queries scan CODES, not vectors, via asymmetric distance (ADC).

    1. Train ``m`` per-subspace codebooks (``k_centroids`` L2 k-means
       centroids over each dim/m-wide slice) on a driver-side sample —
       standard PQ practice (FAISS trains codebooks on a sample too).
    2. Encode the corpus: nearest centroid per subspace → ``codes``
       (array<int>, the compressed representation) plus the
       reconstruction norm ``Σ_m |centroid|²`` (exact because subspaces
       are orthogonal) — one Arrow-batched pass, no shuffle.
    3. ADC scoring FROM CODES ONLY: per query, a ``m × k_centroids``
       look-up table of subspace dot products travels in the UDF closure;
       a corpus row's approximate cosine is ``Σ lut[i][code_i]`` over its
       codes divided by (query norm · reconstruction norm). No join — the
       scorer emits one score per query via posexplode.
    4. The top ``n_candidates`` per query by ADC are re-ranked with the
       EXACT JVM-side cosine (broadcast equi-join on query id), so every
       returned cos is exact and recall is the only approximation — same
       output shape as ``sim_cosine_exact`` / ``ivf_topk_neighbors``.

    At 100 TB the codes table is ~1/30 the bytes of the vectors, scans
    stay Arrow-batched and shuffle-free, and the only joins are the tiny
    candidate re-rank — combine with the IVF cell layout for the full
    IVF-PQ design.

    ``n_candidates`` defaults to 256 (raised from 32 in r11): on the
    near-isotropic fixture embeddings — the adversarial case for ADC
    ranking — recall@5 at sf0.1 went 0.40 → 0.82 (PQ) and 0.30 → 0.70
    (IVF-PQ) while wall time at sf10 was flat-to-better, because the
    exact re-rank is per-query bounded (256 vectors/query) regardless
    of corpus size (SCALING_r11.json ``ann_candidates_retune``).
    """
    import pandas as pd
    from pyspark.sql import Window

    sample = np.stack(
        emb.orderBy("vec_id")
        .limit(sample_size)
        .select("embedding")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    dim = sample.shape[1]
    sub = dim // m
    codebooks = _pq_train(sample, m, k_centroids, iters, seed)
    cent_sqnorm = (codebooks**2).sum(-1)  # (m, K)

    q_rows = (
        emb.filter(F.col("vec_id") < n_queries)
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    q_mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in q_rows])
    q_norms = np.linalg.norm(q_mat, axis=1)
    # luts[q][i][c] = dot(query_q subspace i, codebook[i][c])
    luts = np.einsum(
        "qis,ics->qic", q_mat.reshape(len(q_rows), m, sub), codebooks
    )

    def _encode(col):
        mat = np.stack(col.to_numpy()).astype(np.float64)
        parts = mat.reshape(len(mat), m, sub)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for i in range(m):
            d2 = ((parts[:, i, None, :] - codebooks[None, i]) ** 2).sum(-1)
            codes[:, i] = d2.argmin(1)
        recon = np.sqrt(cent_sqnorm[np.arange(m), codes].sum(1))
        return pd.DataFrame({"codes": list(codes), "recon_norm": recon})

    encode = F.pandas_udf(_encode, "codes array<int>, recon_norm double")

    def _adc_scores(codes, recon):
        c = np.stack(codes.to_numpy())  # (rows, m)
        # Σ_i lut[q][i][c_i]: gather per subspace, sum — codes only.
        dots = luts[:, np.arange(m), c].sum(-1)  # (q, rows)
        approx = dots / (q_norms[:, None] * recon.to_numpy()[None, :])
        return pd.Series(list(approx.T))

    adc = F.pandas_udf(_adc_scores, "array<double>")

    # The ADC array is positional (row i of q_rows); map position back to
    # the ACTUAL query vec_id so the self-match filter and the re-rank join
    # (both keyed by vec_id) stay correct even if some vec_id < n_queries
    # is absent from the table (position and id would silently diverge).
    query_id_at = F.array(*[F.lit(int(r.vec_id)) for r in q_rows])

    coded = emb.select("vec_id", encode("embedding").alias("_pq")).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("_pq.codes").alias("codes"),
        F.col("_pq.recon_norm").alias("recon_norm"),
    )
    scored = (
        coded.select(
            "neighbor_id",
            F.posexplode(adc("codes", "recon_norm")).alias("_qpos", "approx"),
        )
        .select(
            "neighbor_id",
            "approx",
            F.element_at(query_id_at, F.col("_qpos") + 1).alias("query_id"),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(emb, cand, q_rows, k)


def ivf_pq_topk_neighbors(
    emb: DataFrame,
    n_cells: int = 32,
    nprobe: int = 12,
    m: int = 8,
    k_centroids: int = 32,
    k: int = 5,
    n_queries: int = 10,
    n_candidates: int = 512,
    sample_size: int = 1024,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ approximate top-k cosine neighbors — the composition the two
    parents promise (VERDICT r8 #3): IVF's cell layout prunes WHICH rows a
    query scans (``nprobe/n_cells`` of the corpus), PQ's codes shrink WHAT
    a scan reads (dim float32 → m bytes) — together the standard
    billion-vector index design (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011; FAISS ``IVFx,PQy``).

    1. Train the coarse quantizer (spherical k-means cells) AND the PQ
       codebooks on one driver-side sample; codebooks quantize cell
       RESIDUALS (x − centroid), the classic trick — residuals are small
       so the same 8 bytes carry far less quantization error than raw-PQ.
    2. Encode the corpus in one Arrow pass: cell id + residual codes +
       exact reconstruction norm |centroid + decoded residual|; lay the
       codes out cell-partitioned (the IVF storage layout — and the local
       parallelism fix measured on sim_ivf, ISOLATE_r8.json ivf_*).
    3. A query scores ONLY rows in its ``nprobe`` nearest cells (tiny
       broadcast probe frame joined on cell id), from codes alone:
       dot(q, x) ≈ dot(q, centroid_cell) + Σ lut[i][code_i], both terms
       from closure-resident tables — no vector column is read.
    4. Exact JVM re-rank of the top ``n_candidates`` per query (shared
       ``_exact_rerank`` tail) — returned cosines are bit-exact.

    ``k_centroids`` defaults to 32 (raised from 16 in r11): at nprobe=12
    of 32 cells the cell-coverage cap on the near-isotropic fixture
    corpus is recall 0.80, and the 4-bit codebooks' ADC error was what
    kept IVF-PQ at 0.70 below its own cap — 5-bit codebooks close the
    gap exactly to 0.80 at unchanged scan and re-rank volume
    (SCALING_r11.json ``ivfpq_kc_retune``). Codes stay ≤ 1 byte per
    subquantizer, so the 8-byte-codes storage contract is unchanged.

    ``n_candidates`` defaults to 512 (raised from 256 in r13, matching
    sim_pq's r12 retune): on the perturbed scale corpora the wider ADC
    shortlist lifts recall@5 0.80→0.86 at sf1 and 0.90→0.96 at sf10 with
    no wall regression observed (single-run grid, so the recall lift is
    the supported claim, not a quantified wall bound — ADVICE r13);
    structurally the shortlist only widens the exact re-rank
    (n_candidates×|Q| rows), not the code scan. nc=1024 buys sf1 0.92
    but at +36% wall on the same grid; declined (SCALING_r13.json
    ``ivfpq_nc_grid``).
    n_candidates is a QUERY-time knob: stored indexes' codes are
    unchanged, so persisted stores stay valid across this retune.
    """
    sample = np.stack(
        emb.orderBy("vec_id")
        .limit(sample_size)
        .select("embedding")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    centroids = _spherical_kmeans(sample, n_cells, iters, seed)
    s_normed = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    s_cells = np.argmax(s_normed @ centroids.T, axis=1)
    codebooks = _pq_train(sample - centroids[s_cells], m, k_centroids, iters, seed)

    coded = _ivf_pq_encode(emb, centroids, codebooks)
    return _ivf_pq_query(
        emb, coded, centroids, codebooks, nprobe, k, n_queries, n_candidates
    )


def _ivf_pq_encode(
    emb: DataFrame, centroids: np.ndarray, codebooks: np.ndarray
) -> DataFrame:
    """Corpus → (neighbor_id, cell, codes, recon_norm): one Arrow pass,
    cell-partitioned output (the IVF storage layout)."""
    import pandas as pd

    m, _, sub = codebooks.shape

    def _encode(col):
        mat = np.stack(col.to_numpy()).astype(np.float64)
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cells = np.argmax(mn @ centroids.T, axis=1)
        resid = (mat - centroids[cells]).reshape(len(mat), m, sub)
        codes = np.empty((len(mat), m), dtype=np.int32)
        recon = centroids[cells].copy()
        for i in range(m):
            d2 = ((resid[:, i, None, :] - codebooks[None, i]) ** 2).sum(-1)
            codes[:, i] = d2.argmin(1)
            recon[:, i * sub : (i + 1) * sub] += codebooks[i][codes[:, i]]
        return pd.DataFrame(
            {
                "cell": cells.astype(np.int32),
                "codes": list(codes),
                "recon_norm": np.linalg.norm(recon, axis=1),
            }
        )

    encode = F.pandas_udf(_encode, "cell int, codes array<int>, recon_norm double")
    return (
        emb.select("vec_id", encode("embedding").alias("_e"))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("_e.cell").alias("cell"),
            F.col("_e.codes").alias("codes"),
            F.col("_e.recon_norm").alias("recon_norm"),
        )
        .repartition(
            emb.sparkSession.sparkContext.defaultParallelism, F.col("cell")
        )
    )


def _ivf_pq_query(
    emb: DataFrame,
    coded: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    nprobe: int,
    k: int,
    n_queries: int,
    n_candidates: int,
) -> DataFrame:
    """Query side of IVF-PQ: probe frame → ADC over codes in probed cells
    → exact re-rank. Shared by the inline and stored-index operators."""
    import pandas as pd

    m, _, sub = codebooks.shape
    q_rows = (
        emb.filter(F.col("vec_id") < n_queries)
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    q_mat = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in q_rows])
    q_norms = np.linalg.norm(q_mat, axis=1)
    qn = q_mat / q_norms[:, None]
    q_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    qc_dots = q_mat @ centroids.T  # (n_q, n_cells): the dot(q, centroid) term
    luts = np.einsum(
        "qis,ics->qic", q_mat.reshape(len(q_rows), m, sub), codebooks
    )

    def _adc(qpos, cell, codes, recon):
        qp = qpos.to_numpy()
        c = np.stack(codes.to_numpy())
        dots = qc_dots[qp, cell.to_numpy()] + luts[
            qp[:, None], np.arange(m)[None, :], c
        ].sum(1)
        return pd.Series(dots / (q_norms[qp] * recon.to_numpy()))

    adc = F.pandas_udf(_adc, "double")

    # Tiny probe frame: (query position, ACTUAL query vec_id, probed cell);
    # real ids ride along so no positional/id divergence is possible.
    probes = F.broadcast(
        emb.sparkSession.createDataFrame(
            [
                (pos, int(r.vec_id), int(cell))
                for pos, r in enumerate(q_rows)
                for cell in q_cells[pos]
            ],
            "qpos int, query_id int, cell int",
        )
    )
    from pyspark.sql import Window

    scored = (
        coded.join(probes, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc("qpos", "cell", "codes", "recon_norm").alias("approx"),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(emb, cand, q_rows, k)


# Order of the persisted hyperparameter vector in index.npz["params"].
_INDEX_PARAM_KEYS = (
    "n_cells", "m", "k_centroids", "sample_size", "iters", "seed",
    "algo_version",
)

#: Training-algorithm version persisted with every index. Bump when the
#: TRAINING code changes in a result-affecting way, so a persisted index
#: built by older code is detected instead of silently served (r12: the
#: k-means++ seeding change made every pre-r12 store's centroids stale —
#: caught only because a test compared stored vs inline). A version-only
#: mismatch triggers a deterministic retrain with the same
#: hyperparameters; a genuine hyperparameter mismatch still raises.
#: v2 = k-means++ coarse-centroid seeding (VERDICT r11 #6); v3 = back to
#: uniform seeding after the measured recall decline (SCALING_r12.json
#: `ivf_init_grid`) — distinct from the unversioned v1 stores so that any
#: store built by the short-lived v2 code retrains.
_INDEX_ALGO_VERSION = 3


def _codes_version(store_dir: str) -> int | None:
    """Parse the coded-corpus snapshot pointer ``codes_current.json``
    (r16, VERDICT r15 #3 — the same pointer-commit the minhash store
    base got). ``None`` = legacy/unbuilt store."""
    import json
    import os

    path = os.path.join(store_dir, "codes_current.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            v = json.load(f).get("version")
        return v if isinstance(v, int) else None
    except (OSError, ValueError, AttributeError):
        return None


def _codes_path(store_dir: str) -> str:
    """Resolve the live coded-corpus dir: ``codes_v{N}`` behind the
    pointer, or the legacy unversioned ``codes`` until the next write
    path migrates the store. The resolved dir only ever GROWS (appends
    add part files); replacement happens by publishing a new version and
    flipping the pointer, so a reader's resolved path stays valid for
    ``$PYCAIM_STORE_GC_GRACE`` seconds after any retrain."""
    import os

    v = _codes_version(store_dir)
    if v is not None:
        return os.path.join(store_dir, f"codes_v{v}")
    return os.path.join(store_dir, "codes")


def _recover_codes(store_dir: str) -> None:
    """Write-path reconciliation for the coded corpus (caller holds the
    store write lock): delete uncommitted ``codes_v{>current}`` strays
    and legacy ``codes_next``/``codes_old*`` swap scaffolding, grace-
    collect tombstoned old versions, and MIGRATE a legacy unversioned
    ``codes`` dir to ``codes_v0`` + pointer. Since r18 (VERDICT r17
    #6) the migration LINK-ASSEMBLES v0 from the live ``codes`` dir
    (complete-or-absent: temp dir + atomic rename) and tombstones the
    legacy dir after the pointer commits — the pre-r18 rename of live
    files, and its documented FileNotFoundException window for a
    mid-materialization legacy reader, is gone: the reader's resolved
    path stays on disk for the grace period like any displaced
    version."""
    import json
    import os
    import shutil
    import time

    from pycaim_spark.operators.dedup import _write_json_atomic

    if not os.path.isdir(store_dir):
        return
    v = _codes_version(store_dir)
    grace = float(os.environ.get("PYCAIM_STORE_GC_GRACE", "900"))
    now = time.time()
    for sib in os.listdir(store_dir):
        path = os.path.join(store_dir, sib)
        if sib == "codes_next" or sib.startswith("codes_old") \
                or sib.endswith(".assembling"):
            shutil.rmtree(path, ignore_errors=True)
            continue
        if sib == "codes" and v is not None:
            # Legacy dir on a MIGRATED store (r18 link-assembly keeps
            # it for stale readers): tombstone idempotently — a crash
            # between pointer commit and tombstone re-lays here — and
            # collect past grace like any displaced version.
            tomb = os.path.join(path, "_superseded.json")
            if not os.path.exists(tomb):
                _write_json_atomic(tomb, {"ts": now})
            else:
                try:
                    with open(tomb) as f:
                        ts = float(json.load(f).get("ts", now))
                    if now - ts > grace:
                        shutil.rmtree(path, ignore_errors=True)
                except (OSError, ValueError, TypeError):
                    pass
            continue
        if sib.startswith("codes_v"):
            try:
                n = int(sib[len("codes_v"):])
            except ValueError:
                continue
            if v is not None and n > v:
                shutil.rmtree(path, ignore_errors=True)
            elif v is not None and n < v:
                tomb = os.path.join(path, "_superseded.json")
                if not os.path.exists(tomb):
                    _write_json_atomic(tomb, {"ts": now})
                else:
                    try:
                        with open(tomb) as f:
                            ts = float(json.load(f).get("ts", now))
                        if now - ts > grace:
                            shutil.rmtree(path, ignore_errors=True)
                    except (OSError, ValueError, TypeError):
                        pass
    # Layer swap scaffolding + two-phase retirement (r18) for BOTH
    # layer families (delete layers, append layers), mirroring the
    # minhash store's layer recovery: roll a complete orphaned
    # ``<key>.next`` forward, drop incomplete ones, re-lay missing
    # ``.old-`` tombstones, collect tombstoned layers past grace.
    for root, marker in (("codes_deletes", "ids"),
                         ("codes_append", "codes")):
        layer_root = os.path.join(store_dir, root)
        if not os.path.isdir(layer_root):
            continue
        # One pointer parse per root (it cannot change under the write
        # lock the caller holds), not one per layer key.
        folded = set(
            _codes_del_manifest(store_dir)
            if root == "codes_deletes"
            else _codes_app_manifest(store_dir)
        )
        for k in os.listdir(layer_root):
            d = os.path.join(layer_root, k)
            if k.endswith(".next"):
                layer = d[: -len(".next")]
                if not os.path.exists(layer) and os.path.exists(
                    os.path.join(d, marker, "_SUCCESS")
                ):
                    os.rename(d, layer)
                else:
                    shutil.rmtree(d, ignore_errors=True)
                continue
            tomb = os.path.join(d, "superseded.json")
            if (".old-" in k or k in folded) and not os.path.exists(
                tomb
            ):
                # .old- swap debris, or a layer the pointer has folded
                # whose tombstone write was lost to a crash: re-lay it
                # (the app_folded skip in `_codes_frame` keeps reads
                # correct meanwhile).
                _write_json_atomic(tomb, {"ts": now})
            elif os.path.exists(tomb):
                try:
                    with open(tomb) as f:
                        ts = float(json.load(f).get("ts", now))
                    if now - ts > grace:
                        shutil.rmtree(d, ignore_errors=True)
                except (OSError, ValueError, TypeError):
                    pass
        try:
            if not os.listdir(layer_root):
                os.rmdir(layer_root)
        except OSError:
            pass
    # Legacy append manifest (pre-r18 appends added part files to the
    # live version dir with ``append_keys.json`` as the replay guard —
    # those rows are physically in the base already): fold the keys
    # into the pointer's ``app_folded`` and retire the file, so
    # redelivered keys keep no-op'ing under the new scheme.
    def _fold_legacy_append_manifest():
        legacy_app = os.path.join(store_dir, "append_keys.json")
        if not os.path.exists(legacy_app):
            return
        try:
            with open(legacy_app) as f:
                keys = list(json.load(f))
        except (OSError, ValueError):
            return
        ptr_path = os.path.join(store_dir, "codes_current.json")
        with open(ptr_path) as f:
            doc = json.load(f)
        prior = list(doc.get("app_folded", ()))
        doc["app_folded"] = prior + [k for k in keys if k not in prior]
        _write_json_atomic(ptr_path, doc)
        os.remove(legacy_app)

    if v is not None:
        _fold_legacy_append_manifest()
    # Pointer-less stores: crash-idempotent forward completion (mirrors
    # the minhash base migration). A legacy ``codes`` dir is
    # LINK-ASSEMBLED into ``codes_v0`` (r18 — never renamed); a
    # COMPLETE pointer-less v0 (crashed migration — or a build that
    # crashed between its v0 write and its pointer commit) gets the
    # pointer it was about to receive; an INCOMPLETE one is a build
    # stray — delete it, the next build re-derives. The pre-fix rule
    # deleted every pointer-less codes_v* dir, which turned a crash
    # between the migration and its pointer write into DATA LOSS of
    # the only coded corpus.
    if v is None:
        legacy = os.path.join(store_dir, "codes")
        v0 = os.path.join(store_dir, "codes_v0")
        stray = v0 + ".assembling"
        shutil.rmtree(stray, ignore_errors=True)
        if os.path.exists(legacy) and not os.path.exists(v0):
            os.makedirs(stray)
            for fn in os.listdir(legacy):
                full = os.path.join(legacy, fn)
                if not os.path.isfile(full):
                    continue
                try:
                    os.link(full, os.path.join(stray, fn))
                except OSError:
                    shutil.copy2(full, os.path.join(stray, fn))
            os.rename(stray, v0)
        if os.path.exists(os.path.join(v0, "_SUCCESS")):
            _write_json_atomic(
                os.path.join(store_dir, "codes_current.json"),
                {"version": 0},
            )
            # The legacy manifest's keys are physically in the base —
            # fold them NOW, or the very next append of a redelivered
            # key would layer a duplicate slice on top.
            _fold_legacy_append_manifest()
            if os.path.isdir(legacy):
                _write_json_atomic(
                    os.path.join(legacy, "_superseded.json"),
                    {"ts": now},
                )
        elif os.path.exists(v0):
            shutil.rmtree(v0, ignore_errors=True)


def ivf_pq_index_build(
    emb: DataFrame,
    store_dir: str,
    n_cells: int = 32,
    m: int = 8,
    k_centroids: int = 32,
    sample_size: int = 1024,
    iters: int = 10,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Build (or reuse) a PERSISTED IVF-PQ index at ``store_dir``: the
    coded corpus as parquet plus an ``index.npz`` sidecar holding the
    trained centroids/codebooks. Idempotent — if both artifacts exist the
    build is skipped entirely, which is the deployment shape: at 100 TB
    the index is built once (or incrementally per ingest slice) and every
    query run reads 8-byte codes instead of re-encoding the corpus.
    Training is seeded, so a rebuild reproduces the same index bit-(and
    code-)identically. The build hyperparameters are persisted alongside
    the arrays and re-validated on reuse: a call with different
    n_cells/m/k_centroids/sample_size/iters/seed than the stored build
    raises instead of silently serving the stale index (ADVICE r9); a
    sidecar with no persisted params at all is likewise refused (ADVICE
    r10). Concurrency (r15, hardened r16 — VERDICT r15 #3): write paths
    serialize on the store's flock (`_store_write_lock`, double-checked
    reuse after acquiring it), the npz sidecar and append manifest are
    written atomically (temp + fsync + rename), and a retrain writes the
    re-coded corpus as a NEW VERSION (``codes_v{N+1}``) committed by an
    atomic flip of the ``codes_current.json`` pointer — the superseded
    version is tombstoned in place and collected after
    ``$PYCAIM_STORE_GC_GRACE`` seconds, so a lockless reader that
    resolved the old version keeps every file it resolved for the whole
    grace period (r15's rename-instant residual is gone; this is the
    same snapshot-pointer commit the minhash store base uses). Returns
    (centroids, codebooks)."""
    import os
    import time

    from pycaim_spark.operators.dedup import (
        _store_write_lock,
        _write_json_atomic,
    )

    params = {
        "n_cells": n_cells,
        "m": m,
        "k_centroids": k_centroids,
        "sample_size": sample_size,
        "iters": iters,
        "seed": seed,
        "algo_version": _INDEX_ALGO_VERSION,
    }
    npz = os.path.join(store_dir, "index.npz")

    def _try_reuse():
        """Validate a persisted index against the requested params:
        arrays on a match, None when a (re)build is needed, ValueError on
        params-less or hyperparameter-mismatched stores. Read-only, so
        the common serve path stays lock-free (np reads the whole npz
        eagerly, and atomic replace means it is never torn)."""
        if not (
            os.path.exists(npz)
            and os.path.exists(
                os.path.join(_codes_path(store_dir), "_SUCCESS")
            )
        ):
            return None
        with np.load(npz) as idx:
            if "params" not in idx:
                # ADVICE r10: a params-less sidecar is indistinguishable
                # from a stale index — refuse rather than silently serve.
                raise ValueError(
                    f"IVF-PQ index at {store_dir} has no persisted build "
                    "hyperparameters, so the requested parameters cannot "
                    "be validated against it; delete the store and rebuild"
                )
            stored = dict(zip(_INDEX_PARAM_KEYS, idx["params"].tolist()))
            if stored == params:
                return idx["centroids"], idx["codebooks"]
            diff = {
                key: (stored.get(key, "absent"), params[key])
                for key in _INDEX_PARAM_KEYS
                if key != "algo_version" and stored.get(key) != params[key]
            }
            if diff:
                raise ValueError(
                    f"IVF-PQ index at {store_dir} was built with different "
                    f"hyperparameters (stored vs requested): {diff}; "
                    "delete the store or match the stored build"
                )
            # Only algo_version differs: the training CODE changed, the
            # request didn't — fall through to a deterministic retrain
            # with the same hyperparameters, replacing the stale index.
            return None

    got = _try_reuse()
    if got is not None:
        return got
    with _store_write_lock(store_dir):
        # Double-checked: a concurrent build may have completed while we
        # waited on the lock — seeded training is deterministic, so
        # re-validating and serving its result is exact, not approximate.
        got = _try_reuse()
        if got is not None:
            return got
        # Reconcile crash strays, grace-collect tombstoned versions, and
        # migrate a legacy unversioned store to the pointer layout.
        _recover_codes(store_dir)
        sample = np.stack(
            emb.orderBy("vec_id")
            .limit(sample_size)
            .select("embedding")
            .toPandas()["embedding"]
            .to_numpy()
        ).astype(np.float64)
        centroids = _spherical_kmeans(sample, n_cells, iters, seed)
        s_normed = sample / np.linalg.norm(sample, axis=1, keepdims=True)
        s_cells = np.argmax(s_normed @ centroids.T, axis=1)
        codebooks = _pq_train(
            sample - centroids[s_cells], m, k_centroids, iters, seed
        )
        # A (re)build resets the store to exactly the passed corpus:
        # the pointer flip below supersedes previously appended slices
        # AND pending delete intents, so BOTH layer families are
        # tombstoned (a surviving append layer would re-enter reads
        # and its manifest key would no-op a re-delivered slice the
        # rebuild just discarded — the r12 bug class; a surviving
        # DELETE layer would silently filter, and the next vacuum
        # physically remove, vectors the retrain corpus intentionally
        # contains — deletion intents target the OLD membership and do
        # not survive a retrain: purge the source corpus instead, per
        # ivf_pq_index_delete's scope note) and the fresh pointer
        # carries no app_folded/del_folded. Legacy append_keys.json is
        # retired the same way.
        for layer in _codes_append_dirs(store_dir) + _codes_delete_dirs(
            store_dir
        ):
            _write_json_atomic(
                os.path.join(layer, "superseded.json"),
                {"ts": time.time()},
            )
        manifest = os.path.join(store_dir, "append_keys.json")
        if os.path.exists(manifest):
            os.remove(manifest)
        old_v = _codes_version(store_dir)
        new_v = 0 if old_v is None else old_v + 1
        new_codes = os.path.join(store_dir, f"codes_v{new_v}")
        _ivf_pq_encode(emb, centroids, codebooks).write.mode(
            "overwrite"
        ).parquet(new_codes)
        os.makedirs(store_dir, exist_ok=True)
        tmp = npz + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(
                f,
                centroids=centroids,
                codebooks=codebooks,
                params=np.array([params[key] for key in _INDEX_PARAM_KEYS]),
            )
            # Same durability discipline as _write_json_atomic (ADVICE
            # r15): os.replace of an unsynced tmp can surface an empty or
            # torn npz after power loss, breaking the temp+rename
            # atomicity claim this sidecar family documents.
            f.flush()
            os.fsync(f.fileno())
        # Commit: flip the codes pointer (atomic), publish the matching
        # sidecar, tombstone the superseded version for grace collection.
        # A reader interleaving between the two publishes can pair the
        # old npz with the new codes for one load — benign for a reuse
        # check (params re-validate) and the only sub-instant left; the
        # old VERSION DIR itself now outlives any such reader by the
        # grace period instead of being deleted under it.
        _write_json_atomic(
            os.path.join(store_dir, "codes_current.json"),
            {"version": new_v},
        )
        os.replace(tmp, npz)
        if old_v is not None:
            old_dir = os.path.join(store_dir, f"codes_v{old_v}")
            if os.path.isdir(old_dir):
                _write_json_atomic(
                    os.path.join(old_dir, "_superseded.json"),
                    {"ts": time.time()},
                )
    return centroids, codebooks


def ivf_pq_index_append(
    new_emb: DataFrame,
    store_dir: str,
    ingest_key: str,
) -> None:
    """Append new vectors to a PERSISTED IVF-PQ index WITHOUT retraining:
    encode them with the STORED centroids/codebooks — the standard
    production practice (the codebooks model the corpus distribution, not
    its membership; periodic retraining is a separate offline job). r18:
    the slice commits as an APPEND LAYER ``codes_append/<key>/codes``
    (one atomic dir rename — the key is the idempotence unit), read by
    `_codes_frame` alongside the base and folded into the next codes
    version by `ivf_pq_codes_vacuum`, which records the key in the
    pointer's ``app_folded`` manifest. This retires the pre-r18 shape
    (part files appended into the live version dir + a separate
    ``append_keys.json``), whose documented crash window — codes
    written, manifest write lost — double-indexed a redelivered slice:
    now a crash before the rename leaves only an invisible ``.next``
    stray, and a crash after it leaves a committed layer whose key
    redelivery overwrites in place (write-aside), never duplicates.
    Runs under the store write lock; legacy manifests are folded into
    the pointer by `_recover_codes` on the next write path. The ANN
    half of the daily ingest loop — new documents become searchable as
    soon as their slice is appended, no index rebuild."""
    import os
    import shutil
    import time

    from pycaim_spark.operators.dedup import (
        _store_write_lock,
        _write_json_atomic,
    )

    with _store_write_lock(store_dir):
        _recover_codes(store_dir)
        if ingest_key in _codes_app_manifest(store_dir):
            return  # already folded into a committed codes version
        with np.load(os.path.join(store_dir, "index.npz")) as idx:
            centroids, codebooks = idx["centroids"], idx["codebooks"]
        # r18: the slice lands as an APPEND LAYER
        # ``codes_append/<key>/codes`` committed by one atomic dir
        # rename — the key IS the idempotence unit, so the pre-r18
        # crash window (codes part files appended into the live
        # version dir, manifest write lost to a crash → redelivery
        # double-indexed the slice) is structurally gone. Readers
        # union base + live layers (`_codes_frame`); a vacuum folds
        # layers into the next codes version and records the key in
        # the pointer's ``app_folded`` manifest. Redelivery of an
        # unfolded key overwrites via write-aside, same as every
        # layer family.
        layer = os.path.join(store_dir, "codes_append", ingest_key)
        fresh = layer + ".next"
        shutil.rmtree(fresh, ignore_errors=True)
        _ivf_pq_encode(new_emb, centroids, codebooks).write.mode(
            "overwrite"
        ).parquet(os.path.join(fresh, "codes"))
        if os.path.exists(layer):
            old = f"{layer}.old-{int(time.time() * 1000)}"
            os.rename(layer, old)
            _write_json_atomic(
                os.path.join(old, "superseded.json"),
                {"ts": time.time()},
            )
        os.rename(fresh, layer)


def _codes_append_dirs(store_dir: str) -> list[str]:
    """Live append layers of the coded corpus (r18):
    ``codes_append/<key>/codes`` — complete and untombstoned."""
    root = os.path.join(store_dir, "codes_append")
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, k)
        for k in os.listdir(root)
        if not k.endswith(".next")
        and ".old-" not in k
        and os.path.exists(os.path.join(root, k, "codes", "_SUCCESS"))
        and not os.path.exists(os.path.join(root, k, "superseded.json"))
    )


def _codes_app_manifest(store_dir: str) -> list[str]:
    """Append keys a vacuum has folded into a committed codes version —
    carried in ``codes_current.json`` as ``app_folded``."""
    import json

    path = os.path.join(store_dir, "codes_current.json")
    if not os.path.exists(path):
        return []
    try:
        with open(path) as f:
            return list(json.load(f).get("app_folded", ()))
    except (OSError, ValueError, AttributeError):
        return []


def _codes_frame(spark, store_dir: str):
    """The live coded corpus: the pointed base version UNIONED with
    every live append layer whose key the pointer has NOT folded — the
    read view every stored probe and vacuum uses. The ``app_folded``
    skip is load-bearing independently of the tombstones (same rule as
    the minhash read view): a vacuum that crashed between its pointer
    flip and its layer tombstoning leaves a folded layer looking live,
    and unioning it against the base that already contains its rows
    would double-count the slice."""
    folded = set(_codes_app_manifest(store_dir))
    coded = spark.read.parquet(_codes_path(store_dir))
    for layer in _codes_append_dirs(store_dir):
        if os.path.basename(layer) in folded:
            continue
        coded = coded.unionByName(
            spark.read.parquet(os.path.join(layer, "codes"))
        )
    return coded


def _codes_delete_dirs(store_dir: str) -> list[str]:
    """Live delete layers of the coded corpus (r18):
    ``codes_deletes/<key>/ids`` — complete and untombstoned, same
    liveness rule as every layer family in the repo."""
    root = os.path.join(store_dir, "codes_deletes")
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, k)
        for k in os.listdir(root)
        if not k.endswith(".next")
        and ".old-" not in k
        and os.path.exists(os.path.join(root, k, "ids", "_SUCCESS"))
        and not os.path.exists(os.path.join(root, k, "superseded.json"))
    )


def _codes_deleted_ids(spark, store_dir: str):
    """Union of live delete layers' ids as a one-column
    ``neighbor_id`` DataFrame (the codes table's id column), or None.
    Bounded by deletions since the last vacuum."""
    dirs = _codes_delete_dirs(store_dir)
    if not dirs:
        return None
    out = None
    for d in dirs:
        ids = spark.read.parquet(os.path.join(d, "ids"))
        out = ids if out is None else out.unionByName(ids)
    return out.distinct()


def _codes_del_manifest(store_dir: str) -> list[str]:
    """Delete keys a vacuum has applied physically — the
    replay-idempotency manifest, carried in ``codes_current.json``."""
    import json

    path = os.path.join(store_dir, "codes_current.json")
    if not os.path.exists(path):
        return []
    try:
        with open(path) as f:
            return list(json.load(f).get("del_folded", ()))
    except (OSError, ValueError, AttributeError):
        return []


def ivf_pq_index_delete(
    spark,
    store_dir: str,
    vec_ids: DataFrame,
    delete_key: str,
    id_col: str = "vec_id",
) -> None:
    """DELETE vectors from a persisted IVF-PQ index (r18) — the ANN
    twin of `operators/dedup.minhash_signature_store_delete`: after
    this commit the vectors are never returned as neighbors. The ids
    land as a keyed delete layer (write-aside + rename, ADVICE r15
    discipline); probes apply them logically (anti-join the codes
    scan), `ivf_pq_codes_vacuum` applies them physically and records
    the key in the pointer's ``del_folded`` manifest so a replayed
    delete is a no-op. Note the scope: this guards the STORE — a
    later RETRAIN re-encodes whatever corpus it is given, so purge the
    source corpus too (the layout's CDC delete) before retraining."""
    import shutil
    import time

    from pycaim_spark.operators.dedup import (
        _store_write_lock,
        _write_json_atomic,
    )

    with _store_write_lock(store_dir):
        _recover_codes(store_dir)
        if delete_key in _codes_del_manifest(store_dir):
            return
        layer = os.path.join(store_dir, "codes_deletes", delete_key)
        fresh = layer + ".next"
        shutil.rmtree(fresh, ignore_errors=True)
        (
            vec_ids.select(
                F.col(id_col).cast("long").alias("neighbor_id")
            )
            .distinct()
            .write.mode("overwrite")
            .parquet(os.path.join(fresh, "ids"))
        )
        if os.path.exists(layer):
            old = f"{layer}.old-{int(time.time() * 1000)}"
            os.rename(layer, old)
            _write_json_atomic(
                os.path.join(old, "superseded.json"),
                {"ts": time.time()},
            )
        os.rename(fresh, layer)


def ivf_pq_codes_vacuum(spark, store_dir: str) -> None:
    """The codes COMPACTION (r18): publish ``codes_v{N+1}`` = (base ∪
    live append layers) minus every live delete layer's ids, flip the
    pointer with BOTH applied manifests folded inside (``app_folded``
    append keys, ``del_folded`` delete keys — replay of either is a
    no-op), then tombstone the displaced version and the applied
    layers (two-phase grace GC, collected by `_recover_codes` on later
    write passes). A lockless reader that resolved version N keeps its
    files for the grace period — the same snapshot-commit contract as
    every store."""
    import time

    from pycaim_spark.operators.dedup import (
        _store_write_lock,
        _write_json_atomic,
    )

    with _store_write_lock(store_dir):
        _recover_codes(store_dir)
        del_layers = _codes_delete_dirs(store_dir)
        app_layers = _codes_append_dirs(store_dir)
        if not del_layers and not app_layers:
            return
        v = _codes_version(store_dir)
        if v is None:
            raise RuntimeError(
                f"IVF-PQ store at {store_dir} has pending layers but no "
                "committed codes pointer — build the index first"
            )
        cur = _codes_frame(spark, store_dir)
        if del_layers:
            dels = None
            for d in del_layers:
                ids = spark.read.parquet(os.path.join(d, "ids"))
                dels = ids if dels is None else dels.unionByName(ids)
            cur = cur.join(
                F.broadcast(dels.distinct()), "neighbor_id", "left_anti"
            )
        cur.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"codes_v{v + 1}")
        )

        def _keys(layers):
            return [
                os.path.basename(d)
                for d in sorted(
                    layers, key=lambda p: (os.path.getmtime(p), p)
                )
            ]

        prior_del = _codes_del_manifest(store_dir)
        prior_app = _codes_app_manifest(store_dir)
        doc = {"version": v + 1}
        del_folded = prior_del + [
            k for k in _keys(del_layers) if k not in prior_del
        ]
        app_folded = prior_app + [
            k for k in _keys(app_layers) if k not in prior_app
        ]
        if del_folded:
            doc["del_folded"] = del_folded
        if app_folded:
            doc["app_folded"] = app_folded
        _write_json_atomic(
            os.path.join(store_dir, "codes_current.json"), doc
        )
        now = time.time()
        _write_json_atomic(
            os.path.join(
                store_dir, f"codes_v{v}", "_superseded.json"
            ),
            {"ts": now},
        )
        for d in del_layers + app_layers:
            _write_json_atomic(
                os.path.join(d, "superseded.json"), {"ts": now}
            )


def ivf_pq_topk_stored(
    emb: DataFrame,
    store_dir: str,
    n_cells: int = 32,
    nprobe: int = 12,
    m: int = 8,
    k_centroids: int = 32,
    k: int = 5,
    n_queries: int = 10,
    n_candidates: int = 512,
    sample_size: int = 1024,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ top-k over a PERSISTED index (``ivf_pq_index_build``) — the
    deployment shape of the composition. The inline ``ivf_pq_topk_
    neighbors`` re-encodes the corpus every run, so its wall time is
    BUILD-dominated and sits at ≈ flat-PQ cost (ISOLATE_r9.json ann_sf10:
    ivf_pq 4.92 vs pq 4.99 vs ivf 2.70 at sf10); here the steady-state
    query touches only the probed cells' 8-byte codes plus the exact
    re-rank — the stage the IVF×PQ composition actually accelerates.
    Same seeded training → identical results to the inline operator
    (asserted in tests/test_llm_ops.py)."""
    centroids, codebooks = ivf_pq_index_build(
        emb, store_dir, n_cells, m, k_centroids, sample_size, iters, seed
    )
    # r18 read view: base version ∪ live append layers; pending
    # deletions apply logically until a vacuum folds them — a deleted
    # vector filtered from the codes scan can never be a candidate,
    # whatever version the pointer serves.
    coded = _codes_frame(emb.sparkSession, store_dir)
    dels = _codes_deleted_ids(emb.sparkSession, store_dir)
    if dels is not None:
        coded = coded.join(F.broadcast(dels), "neighbor_id", "left_anti")
    return _ivf_pq_query(
        emb, coded, centroids, codebooks, nprobe, k, n_queries, n_candidates
    )


# Ship by value: Spark workers cannot import pycaim_spark (driver-only
# sys.path); nested UDF closures resolve module globals through this.
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
