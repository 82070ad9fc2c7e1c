"""Near-duplicate detection operators (SURVEY.md §2.C; LLM-pipeline core).

- MinHash+LSH: shingle → MinHashLSH banding via Spark ML (JVM-side, seeded)
  — the standard web-scale near-dup pipeline (shuffle is bucket-join sized,
  never all-pairs).
- SimHash: 64-bit sign-summed token hashes computed entirely JVM-side
  (explode → ``xxhash64`` → 64 per-bit SUM aggregates — deterministic
  across processes, unlike Python's salted ``hash``); candidate pairs by
  Hamming distance with JVM-side xor/bit_count.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

try:
    from pyspark import cloudpickle as _cloudpickle
except ImportError:  # pragma: no cover
    import cloudpickle as _cloudpickle

import sys as _sys


def _banded_pairs_with_guard(
    bands: DataFrame,
    keys: list[str],
    max_bucket_width: int,
    with_sig: bool = False,
    shape: str | None = None,
    pair_filter=None,
) -> tuple[DataFrame, DataFrame]:
    """Bucket self-join with the dense-clique STAR guard, in one of five
    measured plan shapes (A/B evidence: ISOLATE_r8.json; select with env
    ``PYCAIM_LSH_GUARD_SHAPE`` ∈ {grouped, window, join, anti, nopart}).

    Input ``bands`` has columns ``keys… , id`` (+ ``sig`` when
    ``with_sig``). Returns ``(pairs, wide_buckets)`` where ``pairs`` is
    (id_a, id_b[, sig_a, sig_b]) — all-pairs inside buckets of width ≤
    ``max_bucket_width``, star pairs against the bucket min id beyond it —
    and ``wide_buckets`` is (keys…, width) for the degraded buckets.

    Decision evidence — 4 alternating paired rounds at sf0.1
    (ISOLATE_r8.json ``dedup_shape_paired_series``; single A/B runs
    bounced with box noise, the paired series is the citable result), as
    (dedup_minhash, dedup_simhash) median seconds:

    - ``grouped`` (default; 2.67, 3.65): ONE groupBy collects each
      bucket's sorted members; pair expansion is a codegen'd HOF over the
      array — no window sort, no self-join, a single read of the bands
      exchange, and the narrow/star guard is a per-row ``when`` on
      ``size()``. Wins dedup_minhash in 4/4 pairs (~16% vs window) with
      visibly lower variance; dedup_simhash is a wash.
    - ``window`` (3.19, 3.73): tag every band row with bucket width and
      bucket-min via one window over the bucket key; narrow/star split is
      a filter, pairs via self-join.
    - ``join`` / ``anti`` / ``nopart``: the round-6/7 historical shapes
      (groupBy stats + tagging join; explicit repartition + left-anti;
      AQE-broadcast anti) — all measured slower (earlier ISOLATE_r8.json
      rows: minhash 2.92 / 3.82 / 3.51, simhash 11.89 / 7.54 / 13.55,
      different session, same protocol).

    Guard-off control: 1.75 minhash (ISOLATE_r8.json dedup_guard_off,
    same session as the series) — the residual guard cost is the
    collect_list vs plain self-join delta, paid for bounding per-task
    memory at W ≤ cap; on simhash the guard is a net WIN (guard-off 4.84,
    star pairing prunes the homogeneous fixture's wide buckets). All
    shapes are pure physical variants; a parametrized test asserts
    identical output (tests/test_llm_ops.py test_guard_shapes_equivalent).
    """
    if shape is None:
        shape = os.environ.get("PYCAIM_LSH_GUARD_SHAPE", "grouped")
    cap = max_bucket_width
    min_expr = F.min(F.struct("id", "sig")) if with_sig else F.min("id")

    def _narrow_pairs(narrow):
        cols = [
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        ] + (
            [F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b")]
            if with_sig else []
        )
        return (
            narrow.alias("a")
            .join(narrow.alias("b"), keys)
            .filter(F.col("a.id") < F.col("b.id"))
            .select(*cols)
        )

    def _star_pairs(wide_rows):
        # _min is the bucket minimum, so id_a < id_b by construction.
        min_id = F.col("_min.id") if with_sig else F.col("_min")
        cols = [min_id.alias("id_a"), F.col("id").alias("id_b")] + (
            [F.col("_min.sig").alias("sig_a"), F.col("sig").alias("sig_b")]
            if with_sig else []
        )
        return wide_rows.filter(F.col("id") != min_id).select(*cols)

    if shape == "grouped":
        # ONE groupBy collects each bucket's (sorted) members; pair
        # expansion is a pure codegen'd HOF over the array — no window
        # sort, no self-join, no second read of the bands exchange. The
        # narrow/star split is a per-row ``when`` on the array size, so
        # the guard costs a size() check instead of a plan branch, and the
        # cap bounds the expanded array at cap²/2 structs (~512 KB at the
        # default 256) — per-ROW memory, which is what actually protects a
        # 100 TB run from a W² clique blowup.
        elem = F.struct("id", "sig") if with_sig else F.struct("id")
        grouped = bands.groupBy(*keys).agg(
            F.sort_array(F.collect_list(elem)).alias("_ids")
        )
        n = F.size("_ids")
        pair = lambda a, b: F.struct(a.alias("_a"), b.alias("_b"))  # noqa: E731
        all_pairs = F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.slice(F.col("_ids"), (i + F.lit(1)).cast("int"), n),
                    lambda x: pair(F.element_at(F.col("_ids"), i), x),
                ),
            )
        )
        star_pairs = F.transform(
            F.slice(F.col("_ids"), 2, n - 1),
            lambda x: pair(F.element_at(F.col("_ids"), 1), x),
        )
        # n >= 2 filter BEFORE the expansion: width-1 buckets (the vast
        # majority) emit nothing, and sequence(1, 0) would DESCEND into an
        # element_at(_ids, 0) error (same Spark gotcha as the n-gram ops).
        exploded = grouped.filter(n >= 2).select(
            F.explode(
                F.when(n <= cap, all_pairs).otherwise(star_pairs)
            ).alias("_p")
        )
        cols = [
            F.col("_p._a.id").alias("id_a"), F.col("_p._b.id").alias("id_b"),
        ] + (
            [F.col("_p._a.sig").alias("sig_a"), F.col("_p._b.sig").alias("sig_b")]
            if with_sig else []
        )
        pairs = exploded.select(*cols)
        star = pairs.limit(0)  # star pairs are already inside `pairs`
        wide_buckets = grouped.filter(n > cap).select(
            *keys, n.cast("long").alias("width")
        )
    elif shape == "window":
        w = Window.partitionBy(*keys)
        tagged = bands.select(
            "*",
            F.count(F.lit(1)).over(w).alias("_w"),
            min_expr.over(w).alias("_min"),
        )
        narrow = tagged.filter(F.col("_w") <= cap).drop("_w", "_min")
        pairs = _narrow_pairs(narrow)
        star = _star_pairs(tagged.filter(F.col("_w") > cap))
        wide_buckets = (
            tagged.filter(F.col("_w") > cap)
            .groupBy(*keys)
            .agg(F.max("_w").alias("width"))
        )
    elif shape == "join":
        stats = bands.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("_w"), min_expr.alias("_min")
        )
        tagged = bands.join(stats, keys)
        narrow = tagged.filter(F.col("_w") <= cap).drop("_w", "_min")
        pairs = _narrow_pairs(narrow)
        star = _star_pairs(tagged.filter(F.col("_w") > cap))
        wide_buckets = stats.filter(F.col("_w") > cap).select(
            *keys, F.col("_w").alias("width")
        )
    elif shape in ("anti", "nopart"):
        if shape == "anti":
            n_part = bands.sparkSession.sparkContext.defaultParallelism
            bands = bands.repartition(n_part, *[F.col(k) for k in keys])
        # "nopart": no explicit exchange — the wide-stats aggregate partial-
        # aggregates map-side into a tiny shuffle, AQE demotes the wide
        # list to broadcast at runtime, so the band rows shuffle exactly
        # once (the narrow self-join) at the cost of re-evaluating the
        # band expressions per consumer.
        stats_wide = (
            bands.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_w"), min_expr.alias("_min"))
            .filter(F.col("_w") > cap)
        )
        narrow = bands.join(stats_wide, keys, "left_anti")
        pairs = _narrow_pairs(narrow)
        star = _star_pairs(bands.join(stats_wide, keys))
        wide_buckets = stats_wide.select(*keys, F.col("_w").alias("width"))
    else:  # pragma: no cover - env misconfiguration
        raise ValueError(f"unknown PYCAIM_LSH_GUARD_SHAPE: {shape!r}")
    if pair_filter is not None:
        # Row-local predicate (e.g. the Hamming cut) applied BEFORE the
        # dedup shuffle: candidates that fail it never leave their map
        # task, so the dropDuplicates exchange carries only survivors.
        pairs = pairs.filter(pair_filter)
        star = star.filter(pair_filter)
    id_cols = ["id_a", "id_b"]
    return pairs.unionAll(star).dropDuplicates(id_cols), wide_buckets


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
    # into the shingle lambda would cost ~shingle_n regex splits per
    # shingle per row; the layered form evaluates each once per row.
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
    # shingle expression into the predicate, evaluating it twice per row.
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
        # ONCE instead of four times. Removing it measured NEUTRAL at
        # sf0.1 (ISOLATE_r8.json base_repartition_off 2.62 s vs
        # dedup_shape_window 2.62 s — the quadruplicated scan hits the
        # local page cache); it stays because at 100 TB the trade is one
        # skinny-row shuffle against 4× recomputation of the CPU-bound
        # shingle/minhash stage over remote storage. The partition count
        # MUST be explicit: the exchange moves few bytes but feeds a
        # CPU-bound stage, and AQE's coalescePartitions sizes by shuffled
        # bytes — without an explicit N it collapses this exchange to ~1
        # partition and serializes the stage.
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
        pairs, wide_buckets = _banded_pairs_with_guard(
            bands, ["table_id", "mh"], max_bucket_width
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


def with_simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Add a ``simhash`` long column, computed entirely JVM-side.

    64-bit SimHash: hash each whitespace token (``xxhash64`` — seeded,
    process-independent), sign-sum each bit position over the document's
    tokens, set bit b iff its sum is positive. Expressed as explode →
    hash → 64 per-bit SUM aggregates → bit reassembly: every stage is
    whole-stage-codegen'd, the shuffle is one doc-keyed exchange of
    (id, 64 longs) partial aggregates, and no Python runs at all. (The
    previous implementation md5-hashed every token inside a Python loop
    in an Arrow UDF; identical band/Hamming semantics — the token hash is
    equally arbitrary. Full-query local timing at sf0.1 is within noise
    of the UDF form — candidate-pair volume dominates there, see
    ISOLATE_r8.json — but the hot path no longer serializes text through
    Arrow or runs per-token Python, which is the cost that grows with
    corpus size at 100 TB.)

    Tokenless documents get signature 0, matching the sign-sum identity.
    """
    tok = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_tok"),
        )
        .filter(F.col("_tok") != "")
        .select("_id", F.xxhash64("_tok").alias("_h"))
    )
    bit_sums = tok.groupBy("_id").agg(
        *[
            F.sum(
                F.shiftrightunsigned(F.col("_h"), b).bitwiseAND(F.lit(1))
                * 2 - 1
            ).alias(f"_b{b}")
            for b in range(64)
        ]
    )
    sig = None
    for b in range(64):
        term = F.when(
            F.col(f"_b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    sigs = bit_sums.select("_id", sig.alias("simhash"))
    return (
        docs.join(sigs, docs[id_col] == sigs["_id"], "left")
        .drop("_id")
        .withColumn("simhash", F.coalesce("simhash", F.lit(0).cast("long")))
    )


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
    sigs = with_simhash(docs, text_col, id_col).select(
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
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    if max_bucket_width:
        # Same measured guard shapes as minhash_candidate_pairs (evidence:
        # ISOLATE_r8.json); sig rides along through the min-struct, and
        # the Hamming cut runs as the helper's pair_filter — BEFORE the
        # dedup shuffle, so failed candidates never leave their map task.
        pairs, _ = _banded_pairs_with_guard(
            bands, ["band_id", "band_val"], max_bucket_width, with_sig=True,
            pair_filter=ham <= max_hamming,
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
            .filter(ham <= max_hamming)
            .select("id_a", "id_b", "sig_a", "sig_b")
            .dropDuplicates(["id_a", "id_b"])
        )
    return pairs.select("id_a", "id_b", ham.alias("hamming"))


# Ship these functions by value: Spark workers cannot import pycaim_spark
# (the driver harness adds it to sys.path only in the driver process).
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
