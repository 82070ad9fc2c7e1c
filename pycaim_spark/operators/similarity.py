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
) -> DataFrame:
    """Approximate near-neighbor pairs via banded sign-LSH: ``n_tables``
    independent ``n_planes``-bit signatures; a pair is a candidate if it
    collides in ANY table (OR-of-bands — the same recall construction as
    MinHash banding). Exact cosine is then evaluated only on candidates.

    Collision probability per table is (1 - θ/π)^n_planes, so recall at
    cos=0.3 with 4×16 is ≈ 1-(1-0.6^4)^16 ≈ 0.89 while the evaluated pair
    space stays a small fraction of all-pairs. Returns (vec_a, vec_b, cos)
    with vec_a < vec_b, bit-identical cosine to the exact operator.
    """
    import numpy as np
    import pandas as pd

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

    signatures = F.pandas_udf(_signatures, "array<long>")

    sig = emb.select(
        F.col("vec_id"),
        F.col("embedding"),
        norm_expr(F.col("embedding")).alias("_norm"),
        signatures(F.col("embedding")).alias("sigs"),
    )
    # (table_id, signature) is the bucket key; posexplode keeps tables
    # independent. Candidates are deduped before the exact-cosine pass.
    buckets = sig.select(
        "vec_id", "embedding", "_norm",
        F.posexplode("sigs").alias("table_id", "bucket"),
    )
    a = buckets.select(
        F.col("table_id"), F.col("bucket"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("_norm").alias("norm_a"),
    )
    b = buckets.select(
        F.col("table_id"), F.col("bucket"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("_norm").alias("norm_b"),
    )
    pairs = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "emb_a", "emb_b", "norm_a", "norm_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cos = F.round(
        dot_expr(F.col("emb_a"), F.col("emb_b"))
        / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
    return pairs.select("vec_a", "vec_b", cos.alias("cos")).filter(
        F.col("cos") >= min_cos
    )


# Ship by value: Spark workers cannot import pycaim_spark (driver-only
# sys.path); nested UDF closures resolve module globals through this.
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
