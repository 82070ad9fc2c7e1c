"""Near-duplicate detection operators (SURVEY.md §2.C; LLM-pipeline core).

- MinHash+LSH: shingle → MinHashLSH banding via Spark ML (JVM-side, seeded)
  — the standard web-scale near-dup pipeline (shuffle is bucket-join sized,
  never all-pairs).
- SimHash: 64-bit sign-summed token hashes via an Arrow-batched pandas UDF
  (md5-based token hashing — deterministic across processes, unlike
  Python's salted ``hash``); candidate pairs by Hamming distance with
  JVM-side xor/bit_count.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

try:
    from pyspark import cloudpickle as _cloudpickle
except ImportError:  # pragma: no cover
    import cloudpickle as _cloudpickle

import sys as _sys


def minhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    # Word trigrams: the fixture vocabulary is tiny (~31 words), so bigram
    # shingles collide pathologically (≤961 distinct shingles → giant
    # min-hash buckets → near-quadratic join). Trigrams restore shingle
    # diversity.
    shingle_n: int = 3,
    # 8 one-row bands (OR-amplification): a pair with Jaccard J is a
    # candidate with prob 1-(1-J)^8 — ≥0.96 at J≥0.33, matching the
    # ≤0.8-distance target.
    num_hashes: int = 8,
    max_jaccard_dist: float = 0.8,
    seed: int = 42,
    max_bucket_width: int | None = None,
    return_wide_buckets: bool = False,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (id_a < id_b, jaccard_dist).

    Pure-DataFrame pipeline — every step is a codegen'd JVM expression,
    no ML-pipeline sparse vectors and no per-pair UDF distance:

    1. lowercase → whitespace tokens → word ``shingle_n``-grams →
       ``xxhash64`` each shingle → distinct 64-bit shingle set per doc.
    2. per-table minhash = ``array_min`` of ``xxhash64(shingle, table,
       seed)`` — ``num_hashes`` independent hash functions, evaluated as
       one pass over the shingle array each.
    3. candidates = equi-self-join on (table, minhash) — at 100 TB the
       shuffle moves only (id, long) rows and touches only colliding
       buckets, never all-pairs.
    4. exact Jaccard on the hashed shingle sets (``array_intersect``,
       JVM-side) filters candidates to ``jaccard_dist ≤ max_jaccard_dist``.

    Dense-clique safeguard: a K-deep duplicate clique collides into one
    bucket in EVERY band and would emit K²/2 candidates per band — a real
    boilerplate corpus (and the ×100-replica scale fixture) OOMs on the
    pair list alone. Buckets wider than ``max_bucket_width`` (default env
    ``PYCAIM_LSH_MAX_BUCKET``, 256; 0 disables) therefore degrade to STAR
    pairing — every member pairs with the bucket's min id only — bounding
    a width-W bucket at W−1 candidates while preserving clique
    connectivity, so connected-components clustering (dedup_clusters_star,
    split_leakage_safe_neardup) still merges the full clique. Pair-level
    recall inside wide buckets is intentionally sacrificed; exact-duplicate
    cliques should be collapsed by a dedup_exact pre-pass first. With
    ``return_wide_buckets=True`` returns ``(pairs, wide_buckets)`` where
    ``wide_buckets`` is the (table_id, mh, width) frame of degraded
    buckets — the counted skip metric.
    """
    if max_bucket_width is None:
        max_bucket_width = int(os.environ.get("PYCAIM_LSH_MAX_BUCKET", "256"))
    # Each stage materializes through its own projection: an outer column
    # referenced INSIDE a HOF lambda is re-evaluated per array element by
    # Catalyst (no CSE across lambda scopes) — inlining the regex split
    # into the shingle lambda costs ~3 regex splits per shingle per row,
    # measured 40× slower than this layered form.
    # trim first: split(r"\s+") keeps an empty leading token for
    # whitespace-prefixed docs (trailing empties are already dropped).
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_sh = F.size(F.col("_toks")) - (shingle_n - 1)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731 — 1-based token index
        " ", *[F.element_at(F.col("_toks"), i + j) for j in range(shingle_n)]
    )
    shingles = F.when(
        n_sh > 0, F.transform(F.sequence(F.lit(1), n_sh), shingle_at)
    ).otherwise(F.array().cast("array<string>"))
    # Shingle-set emptiness == "fewer than shingle_n tokens": filter on the
    # raw text BEFORE the projections. A filter on the derived array would
    # be pushed below the projects and re-inline the whole (uncached)
    # shingle expression into the predicate — measured 30× slower.
    base = (
        docs.filter(F.size(toks) >= shingle_n)
        .select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .select("id", shingles.alias("_sh"))
        .select(
            "id",
            F.array_distinct(
                F.transform(F.col("_sh"), lambda s: F.xxhash64(s))
            ).alias("hs"),
        )
        # Four plan branches consume the shingle sets (both band-join
        # sides, both Jaccard re-join sides). The repartition inserts an
        # exchange whose output ReuseExchange dedups, so shingling runs
        # ONCE instead of four times — measured 1.7× on the whole query.
        # The partition count MUST be explicit: the exchange moves few
        # bytes (ids + hashed shingle sets) but feeds the CPU-bound
        # shingle/minhash stage, and AQE's coalescePartitions sizes by
        # shuffled bytes — without an explicit N it collapses this
        # exchange to ~1 partition and serializes the whole stage
        # (measured 1.5×–1.8× slower at sf0.1; explicit N opts the
        # exchange out of coalescing).
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism, F.col("id")
        )
    )
    def _table_hash(t):
        # Factory, not a default arg: PySpark infers HOF lambda arity from
        # the signature, so the closure must stay single-parameter.
        return lambda h: F.xxhash64(h, F.lit(t), F.lit(seed))

    minhashes = F.array(
        *[
            F.array_min(F.transform(F.col("hs"), _table_hash(t)))
            for t in range(num_hashes)
        ]
    )
    bands = base.select(
        "id", F.posexplode(minhashes).alias("table_id", "mh")
    )
    wide_buckets = None
    if max_bucket_width:
        # Guard plan shape (ISOLATE_r7 bisection): ONE explicit skinny
        # exchange on the bucket key that every guard branch hangs off.
        # The r4–r6 stats-aggregate+JOIN form had no exchange directly
        # above the join, so the join — and the 8-table minhash evaluation
        # feeding it — re-ran for each of its three consumers: 6.27 s vs
        # 1.76 s guard-off isolate. Here the minhashes are computed once
        # (into the repartition below, explicit N to opt out of AQE
        # coalescing); the wide-stats aggregate, the narrow anti-join, the
        # narrow self-join, and the star join all read that one shuffle
        # co-partitioned, with no further exchange. The wide list is tiny
        # in practice (0 on a healthy corpus) so AQE demotes those joins
        # to broadcast at runtime — but nothing REQUIRES it to fit in
        # driver memory, unlike a pinned broadcast.
        bands = bands.repartition(
            docs.sparkSession.sparkContext.defaultParallelism,
            F.col("table_id"),
            F.col("mh"),
        )
        stats_wide = (
            bands.groupBy("table_id", "mh")
            .agg(F.count(F.lit(1)).alias("_w"), F.min("id").alias("_min_id"))
            .filter(F.col("_w") > max_bucket_width)
        )
        narrow = bands.join(stats_wide, ["table_id", "mh"], "left_anti")
        pairs = (
            narrow.alias("a")
            .join(narrow.alias("b"), ["table_id", "mh"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        star = (
            bands.join(stats_wide, ["table_id", "mh"])
            .filter(F.col("id") != F.col("_min_id"))
            .select(F.col("_min_id").alias("id_a"), F.col("id").alias("id_b"))
        )
        pairs = pairs.unionAll(star).dropDuplicates(["id_a", "id_b"])
        wide_buckets = stats_wide.select(
            "table_id", "mh", F.col("_w").alias("width")
        )
    else:
        pairs = (
            bands.alias("a")
            .join(bands.alias("b"), ["table_id", "mh"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    sets = base.select("id", "hs")
    inter = F.size(F.array_intersect(F.col("sa.hs"), F.col("sb.hs")))
    union = F.size(F.col("sa.hs")) + F.size(F.col("sb.hs")) - inter
    jd = F.lit(1.0) - inter.cast("double") / union.cast("double")
    result = (
        pairs.join(sets.alias("sa"), pairs.id_a == F.col("sa.id"))
        .join(sets.alias("sb"), pairs.id_b == F.col("sb.id"))
        .select("id_a", "id_b", F.round(jd, 6).alias("jaccard_dist"))
        .filter(F.col("jaccard_dist") <= max_jaccard_dist)
    )
    if return_wide_buckets:
        if wide_buckets is None:
            spark = docs.sparkSession
            wide_buckets = spark.createDataFrame(
                [], "table_id int, mh long, width long"
            )
        return result, wide_buckets
    return result


def _simhash_series(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text: md5-hash each whitespace token, sign-sum
    the bit columns. Pure function of the text — process-independent."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for token in (text or "").split():
            h = np.uint64(
                int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        sig = np.uint64(0)
        for b in range(64):
            if acc[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = sig
    return pd.Series(out.astype(np.int64))  # two's complement into long


def with_simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``simhash`` long column (Arrow-batched pandas UDF)."""
    simhash_udf = F.pandas_udf(_simhash_series, "long")
    return docs.withColumn("simhash", simhash_udf(F.col(text_col)))


def simhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 7,
    n_bands: int = 8,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs by SimHash Hamming distance, band-blocked.

    The 64-bit signature splits into ``n_bands`` chunks; candidates are
    pairs that agree EXACTLY on at least one band (equi-join per band —
    shuffle-based, never an all-pairs nested loop). By pigeonhole, a pair
    with hamming ≤ n_bands−1 must agree on some band, so recall is exact
    for ``max_hamming < n_bands`` (the defaults: ≤7 with 8 bands);
    beyond that it degrades gracefully like MinHash banding. The hamming
    check itself is JVM-side xor + bit_count.

    Dense-clique safeguard (same as ``minhash_candidate_pairs``): buckets
    wider than ``max_bucket_width`` (env ``PYCAIM_LSH_MAX_BUCKET``,
    default 256; 0 disables) emit star pairs against the bucket's min-id
    member instead of all-pairs — W−1 candidates instead of W²/2,
    connectivity preserved for downstream clustering.
    """
    if max_bucket_width is None:
        max_bucket_width = int(os.environ.get("PYCAIM_LSH_MAX_BUCKET", "256"))
    width = 64 // n_bands
    sigs = with_simhash(docs, text_col).select(
        F.col(id_col).alias("id"), F.col("simhash").alias("sig")
    )
    bands = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    if max_bucket_width:
        # Same guard plan shape as minhash_candidate_pairs: one explicit
        # skinny exchange on the bucket key; wide-stats aggregate, narrow
        # anti-join, self-join, and star join all read it co-partitioned
        # (the r4–r6 stats+join form re-ran its input per consumer —
        # ISOLATE_r7 measured the restructure at 13.7 → 8.6 s, the rest
        # being the SimHash pandas UDF itself).
        bands = bands.repartition(
            docs.sparkSession.sparkContext.defaultParallelism,
            F.col("band_id"),
            F.col("band_val"),
        )
        stats_wide = (
            bands.groupBy("band_id", "band_val")
            .agg(
                F.count(F.lit(1)).alias("_w"),
                # min by id, sig rides along
                F.min(F.struct("id", "sig")).alias("_min"),
            )
            .filter(F.col("_w") > max_bucket_width)
        )
        narrow = bands.join(stats_wide, ["band_id", "band_val"], "left_anti")
        a = narrow.select(
            "band_id", "band_val",
            F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
        )
        b = narrow.select(
            "band_id", "band_val",
            F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
        )
        star = (
            bands.join(stats_wide, ["band_id", "band_val"])
            .filter(F.col("id") != F.col("_min.id"))
            .select(
                F.col("_min.id").alias("id_a"), F.col("id").alias("id_b"),
                F.col("_min.sig").alias("sig_a"), F.col("sig").alias("sig_b"),
            )
        )
        pairs = (
            a.join(b, ["band_id", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sig_a", "sig_b")
            .unionAll(star)
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        a = bands.select(
            "band_id", "band_val",
            F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
        )
        b = bands.select(
            "band_id", "band_val",
            F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
        )
        pairs = (
            a.join(b, ["band_id", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sig_a", "sig_b")
            .dropDuplicates(["id_a", "id_b"])
        )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# Ship these functions by value: Spark workers cannot import pycaim_spark
# (the driver harness adds it to sys.path only in the driver process).
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
