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
import time

import numpy as np
import pandas as pd
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
    """Bucket self-join with the dense-clique STAR guard, in one of six
    measured plan shapes (select with env ``PYCAIM_LSH_GUARD_SHAPE`` ∈
    {grouped, grouped_unbounded, window, join, anti, nopart}).

    Input ``bands`` has columns ``keys… , id`` (+ ``sig`` when
    ``with_sig``). Returns ``(pairs, wide_buckets)`` where ``pairs`` is
    (id_a, id_b[, sig_a, sig_b]) — all-pairs inside buckets of width ≤
    ``max_bucket_width``, star pairs against the bucket min id beyond it —
    and ``wide_buckets`` is (keys…, width) for the degraded buckets.

    - ``window`` (default since round 9): tag every band row with bucket
      width and bucket-min via one window over the bucket key; narrow/star
      split is a filter, pairs via self-join. Window partition buffers
      SPILL (ExternalAppendOnlyUnsafeRowArray), so per-task state is
      bounded no matter the clique width. Decision evidence —
      ISOLATE_r9.json, two independent 4-round alternating paired series
      run outside the round-8 session that picked ``grouped``: the round-8
      "grouped wins minhash 4/4, ~16%" result did NOT replicate
      (``dedup_shape_paired_series_r9`` rounds 1-3: grouped 2/3, medians
      2.99 vs 3.19; ``dedup_shape_bounded_paired_series``: minhash
      pairwise TIES 2-2 across all three shapes, medians window 3.38 /
      grouped 3.39 / grouped_unbounded 2.79 with ±40% round bounce, while
      simhash prefers window 4-0 vs grouped and 3-1 vs unbounded). With
      no decisive speed winner, the state-bounded spillable shape wins on
      structure.
    - ``grouped``: the round-9 BOUNDED-state revision of the grouped
      shape (ADVICE r8) — streaming (count, min) stats find wide buckets,
      which are star-paired as a broadcast-join projection and anti-joined
      OUT before any collect_list, so no aggregation buffer ever holds
      more than ``cap`` structs. Measured a wash with window on minhash
      and slower on simhash (ISOLATE_r9.json
      ``dedup_shape_bounded_paired_series``). NOTE: assumes the wide set
      is small — do not use with cap ≈ 1 (star-everything callers), where
      "wide" is every bucket and the broadcast anti degenerates.
    - ``grouped_unbounded``: the round-8 single-groupBy form — one read of
      the bands exchange, narrow/star split as a per-row ``when`` on
      ``size()``; best minhash median in the r9 series (2.79) but within
      the tie, and its collect_list buffer is O(bucket width) per-group
      NON-spillable state — the W-deep-clique exposure that made round 9
      demote it from default.
    - ``join`` / ``anti`` / ``nopart``: the round-6/7 historical shapes
      (groupBy stats + tagging join; explicit repartition + left-anti;
      AQE-broadcast anti) — all measured slower (earlier ISOLATE_r8.json
      rows: minhash 2.92 / 3.82 / 3.51, simhash 11.89 / 7.54 / 13.55,
      different session, same protocol).

    Guard-off control: 1.75 minhash (ISOLATE_r8.json dedup_guard_off) —
    the residual guard cost is the collect_list vs plain self-join delta,
    paid for bounding per-task memory at W ≤ cap; on simhash the guard is
    a net WIN (guard-off 4.84, star pairing prunes the homogeneous
    fixture's wide buckets). All shapes are pure physical variants; a
    parametrized test asserts identical output (tests/test_llm_ops.py
    test_guard_shapes_equivalent).
    """
    if shape is None:
        shape = os.environ.get("PYCAIM_LSH_GUARD_SHAPE", "window")
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

    if shape in ("grouped", "grouped_unbounded"):
        # Grouped collect_list + HOF pair expansion: no window sort, no
        # narrow self-join. Two variants:
        #
        # - ``grouped`` (default, BOUNDED state — ADVICE r8): a streaming
        #   (count, min) aggregate finds wide buckets first (hash-agg
        #   partial state, spillable, map-side combined); the wide set is
        #   tiny post-filter so AQE broadcasts it, and narrow rows reach
        #   the collect_list through a map-side anti join — so no
        #   aggregation buffer ever holds more than ``cap`` structs.
        #   Wide buckets never enter collect_list at all: their star
        #   pairs stream as a broadcast-join projection, O(1) memory per
        #   row. This is what actually survives a W-deep clique at 100 TB
        #   — collect_list buffers are per-group and NON-spillable, so
        #   the previous single-groupBy form held O(W) structs for the
        #   clique bucket (the expansion was capped at cap²/2 structs
        #   per row, but the _ids buffer itself was not).
        # - ``grouped_unbounded``: the round-8 single-groupBy form (ONE
        #   read of the bands exchange, narrow/star split as a per-row
        #   ``when`` on size()) — kept for A/B; its collect_list state is
        #   O(bucket width).
        elem = F.struct("id", "sig") if with_sig else F.struct("id")

        def _hof_pairs(grouped_df, width_guard):
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
            # n >= 2 filter BEFORE the expansion: width-1 buckets (the
            # vast majority) emit nothing, and sequence(1, 0) would
            # DESCEND into an element_at(_ids, 0) error (same Spark
            # gotcha as the n-gram ops).
            expanded = (
                F.when(n <= cap, all_pairs).otherwise(star_pairs)
                if width_guard else all_pairs
            )
            exploded = grouped_df.filter(n >= 2).select(
                F.explode(expanded).alias("_p")
            )
            cols = [
                F.col("_p._a.id").alias("id_a"),
                F.col("_p._b.id").alias("id_b"),
            ] + (
                [F.col("_p._a.sig").alias("sig_a"),
                 F.col("_p._b.sig").alias("sig_b")]
                if with_sig else []
            )
            return exploded.select(*cols)

        if shape == "grouped":
            stats_wide = (
                bands.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("_w"), min_expr.alias("_min"))
                .filter(F.col("_w") > cap)
            )
            narrow = bands.join(stats_wide, keys, "left_anti")
            grouped = narrow.groupBy(*keys).agg(
                F.sort_array(F.collect_list(elem)).alias("_ids")
            )
            pairs = _hof_pairs(grouped, width_guard=False)
            star = _star_pairs(bands.join(stats_wide, keys))
            wide_buckets = stats_wide.select(
                *keys, F.col("_w").alias("width")
            )
        else:
            grouped = bands.groupBy(*keys).agg(
                F.sort_array(F.collect_list(elem)).alias("_ids")
            )
            n = F.size("_ids")
            pairs = _hof_pairs(grouped, width_guard=True)
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
        narrow_cond = F.col("_w") <= cap
        if os.environ.get("PYCAIM_BAND_UNIFY", "1") != "0":
            # Row-level no-op (the bucket min is an aggregate over the
            # row's own non-null bucket, so it can never be null) that
            # keeps `_min` referenced in the NARROW branch: without it,
            # column pruning drops `_min` from the narrow window, and for
            # the with_sig callers the star window's min(struct(id, sig))
            # pre-projects a `_w0` struct column BELOW the exchange that
            # the narrow side then lacks — the two band exchanges
            # canonicalize differently and the whole signature+explode
            # subtree executes twice (dedup_simhash before: Exchange (16)
            # vs (36), plans/r18). With the reference, both windows
            # compute [count, min] over one shared exchange.
            narrow_cond = narrow_cond & F.col("_min").isNotNull()
        narrow = tagged.filter(narrow_cond).drop("_w", "_min")
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


def _shingle_sets(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    repartition: bool = True,
) -> DataFrame:
    """(id, hs) — distinct xxhash64'd word-``shingle_n``-gram set per doc.

    Each stage materializes through its own projection: an outer column
    referenced INSIDE a HOF lambda is re-evaluated per array element by
    Catalyst (no CSE across lambda scopes) — inlining the regex split
    into the shingle lambda would cost ~shingle_n regex splits per
    shingle per row; the layered form evaluates each once per row.
    trim first: split(r"\\s+") keeps an empty leading token for
    whitespace-prefixed docs (trailing empties are already dropped).
    """
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
    #
    # The explicit IsNotNull(id) is a row-level no-op (fixture ids are
    # never null) whose job is EXCHANGE REUSE: the Jaccard-verify joins
    # key on id, so Catalyst pushes an inferred isnotnull(id) into THEIR
    # copy of this subtree — without the same filter here, the band-side
    # and verify-side repartition exchanges canonicalize differently and
    # ReuseExchange cannot dedup them, so the CPU-bound shingle stage ran
    # TWICE per query (plans/r18/dedup_minhash_before.txt operators 1-6
    # vs 33-38: two full scan→tokenize→shingle→hash chains).
    # PYCAIM_BAND_UNIFY=0 restores the r17 asymmetric form (A/B arm).
    base_filter = F.size(toks) >= shingle_n
    if os.environ.get("PYCAIM_BAND_UNIFY", "1") != "0":
        base_filter = base_filter & F.col(id_col).isNotNull()
    base = (
        docs.filter(base_filter)
        .select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .select("id", shingles.alias("_sh"))
        .select(
            "id",
            F.array_distinct(
                F.transform(F.col("_sh"), lambda s: F.xxhash64(s))
            ).alias("hs"),
        )
    )
    if repartition:
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
        base = base.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, F.col("id")
        )
    return base


def _band_rows(base: DataFrame, num_hashes: int, seed: int) -> DataFrame:
    """(id, table_id, mh) band rows: per-table minhash = ``array_min`` of
    ``xxhash64(shingle, table, seed)`` — ``num_hashes`` independent hash
    functions, one pass over the shingle array each."""

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
    rows = base.select("id", F.posexplode(minhashes).alias("table_id", "mh"))
    # Row-level no-op (hs is non-empty by _shingle_sets' length filter, so
    # array_min never yields null) that exists for EXCHANGE REUSE: the
    # narrow bucket self-join infers isnotnull(mh) from its join key and
    # the star branch does not, so the two (table_id, mh) exchanges over
    # these band rows canonicalized differently and the explode+shuffle
    # ran twice (plans/r18/dedup_minhash_before.txt operators 7-9 vs
    # 23-24). PYCAIM_BAND_UNIFY=0 restores the r17 form (A/B arm).
    if os.environ.get("PYCAIM_BAND_UNIFY", "1") != "0":
        rows = rows.filter(F.col("mh").isNotNull())
    return rows


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
    guard_shape: str | None = None,
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
    base = _shingle_sets(
        docs, text_col, id_col, shingle_n, repartition=True
    )
    bands = _band_rows(base, num_hashes, seed)
    wide_buckets = None
    if max_bucket_width:
        pairs, wide_buckets = _banded_pairs_with_guard(
            bands, ["table_id", "mh"], max_bucket_width, shape=guard_shape
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


def minhash_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    max_jaccard_dist: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Per-document near-dup CLUSTER assignments from MinHash banding —
    the scale OUTPUT CONTRACT (VERDICT r8 #1): ``(doc_id, cluster_id,
    is_canonical)`` over all documents, never a materialized pair list.

    SCALING.md measured ``dedup_minhash`` at sf10 to be output-bound:
    85.6 s dominated by materializing ~Σ w²/2 candidate PAIRS whose only
    consumer is connected-components. When clusters are the product, pair-
    level output is waste: per band bucket, STAR edges (member ↔ bucket-min)
    preserve exactly the connectivity CC needs at w−1 edges per width-w
    bucket instead of w²/2 — the same degradation the clique guard applies
    beyond its cap, here applied to EVERY bucket because no consumer wants
    the pairs. Candidate volume drops from quadratic-in-bucket-width to
    linear in band rows (≤ num_hashes · n docs), which is what survives a
    boilerplate-dense 100 TB corpus.

    Semantics: star edges are verified with the SAME exact-Jaccard filter
    as the pair operator before clustering, so every merge is a true
    near-dup link; clusters are unions of verified links. Because each
    star edge is itself a pair ``minhash_candidate_pairs`` would emit,
    the clusters REFINE the pair-graph clusters (each cluster sits inside
    exactly one pair-graph cluster — asserted in tests/test_llm_ops.py,
    with planted-clique equality). Recall beyond that relies on OR-
    amplification: a doc gets one star edge per band, so num_hashes
    independent chances to connect.

    Output: every input document labeled; ``cluster_id`` = min doc_id
    reachable, singletons label themselves, ``is_canonical`` marks the
    keeper a dedup pipeline retains.
    """
    from pycaim_spark.operators.graph import connected_components_star

    # max_bucket_width=1 routes EVERY bucket (width ≥ 2) down the star
    # path of the measured guard shapes — reusing the A/B'd plan machinery
    # rather than a sixth bespoke plan. The shape is PINNED to ``window``
    # (not the env knob): with cap=1 "wide" means every bucket, so the
    # grouped shape's tiny-broadcast-wide-set assumption degenerates —
    # the window tag streams regardless of how many buckets are wide.
    pairs = minhash_candidate_pairs(
        docs,
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        max_jaccard_dist=max_jaccard_dist,
        seed=seed,
        max_bucket_width=1,
        guard_shape="window",
    )
    comp = connected_components_star(pairs, src="id_a", dst="id_b")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return (
        docs.join(comp, docs[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            cluster.alias("cluster_id"),
            (cluster == F.col(id_col)).cast("int").alias("is_canonical"),
        )
    )


def incremental_minhash_dedup(
    base_docs: DataFrame,
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    max_jaccard_dist: float = 0.8,
    seed: int = 42,
    max_candidates_per_doc: int = 64,
) -> DataFrame:
    """Cross-snapshot incremental dedup: probe a NEW slice (``delta_docs``)
    against an EXISTING corpus's minhash signature store (``base_docs``) —
    the pattern a production pretraining pipeline runs daily, where the
    corpus never re-shuffles (VERDICT r8 #2).

    Returns one row per delta document: ``(doc_id, dup_of, best_dist,
    is_new)`` — ``dup_of`` = smallest base doc verified as a near-dup
    (exact Jaccard ≤ ``max_jaccard_dist``), NULL when the doc is new.

    Plan shape (the point of the operator): the base corpus is SCANNED but
    never SHUFFLED —

    1. delta band rows (small, the daily slice) are BROADCAST; the base
       band store streams map-side through a broadcast hash join to find
       colliding candidates — one hit row per (delta doc, band) carrying
       the bucket's member ARRAY, never a row per collision (a dense
       corpus makes per-collision rows |delta|×bands×bucket_width; see
       ``_incremental_matches``). At 100 TB the bucket store is a
       persisted parquet table keyed by (table_id, mh)
       (``minhash_signature_store_build``); here it is derived inline
       from ``base_docs`` with identical hash functions — the one
       exchange of 8-per-doc band rows that builds the buckets is the
       inline stand-in for the store build, and base TEXT still never
       shuffles.
    2. Each delta doc ranks its candidates IN-ROW: flatten the ≤ bands
       bucket arrays, count occurrences (= number of colliding bands ≈
       highest Jaccard — the standard LSH collision-count ranking), keep
       the ``max_candidates_per_doc`` strongest. The only shuffle is
       bands-per-doc rows — delta-sized — and the per-bucket slice bounds
       probe cost against boilerplate buckets the same way the clique
       guard bounds pair emission.
    3. Verification re-reads base shingle sets map-side (broadcast of the
       capped candidate list) and exact-Jaccards only the capped pairs.

    tests/test_llm_ops.py asserts the plan contains no sort-merge join and
    the verdicts match a full-corpus pair run restricted to base×delta.
    """
    b_sets = _shingle_sets(
        base_docs, text_col, id_col, shingle_n, repartition=False
    )
    store_buckets = _band_buckets(_band_rows(b_sets, num_hashes, seed))
    return _incremental_probe(
        b_sets, store_buckets, delta_docs, text_col, id_col, shingle_n,
        num_hashes, max_jaccard_dist, seed, max_candidates_per_doc,
    )


#: Per-bucket member cap at signature-store build time — the probe-side
#: density guard, mirroring ``max_bucket_width`` in the self-join dedup.
#: A boilerplate shingle whose band bucket holds millions of docs would
#: otherwise make every probe of that bucket emit millions of candidates;
#: the store keeps the ``BUCKET_STORE_CAP`` smallest doc ids (plus the
#: true ``width`` for observability) and probes degrade deterministically
#: on wider buckets, exactly like the clique guard's star degradation.
BUCKET_STORE_CAP = 1024


def _band_buckets(store_bands: DataFrame, bucket_cap: int = BUCKET_STORE_CAP) -> DataFrame:
    """Aggregate (id, table_id, mh) band rows into per-bucket member
    arrays ``(table_id, mh, width, ids)`` — ids ascending, capped at
    ``bucket_cap`` (width records the UNCAPPED bucket size). The window
    pre-truncates wide buckets row-wise BEFORE collect_list, so no
    aggregation buffer ever holds more than ``bucket_cap`` ids (the
    ADVICE-r8 memory rule); the groupBy reuses the window's hash
    partitioning, so the whole build is ONE exchange of 8-per-doc band
    rows."""
    from pyspark.sql import Window

    bucket = Window.partitionBy("table_id", "mh")
    return (
        store_bands.withColumn("_r", F.row_number().over(bucket.orderBy("id")))
        .withColumn("width", F.count(F.lit(1)).over(bucket))
        .filter(F.col("_r") <= bucket_cap)
        .groupBy("table_id", "mh")
        .agg(
            F.sort_array(F.collect_list("id")).alias("ids"),
            F.max("width").alias("width"),
        )
    )


def _with_top_candidates(df: DataFrame, cands_col: str, cap: int) -> DataFrame:
    """Add ``top_cands``: the top-``cap`` elements of array column
    ``cands_col`` by (occurrence count desc, value asc) — the LSH
    collision-count ranking, computed per row with no shuffle.

    Arrow-batched numpy on purpose — this is one of the rare spots where
    the built-ins genuinely can't express the semantics efficiently.
    Three JVM-side shapes were built and measured on the sf10 probe
    (ISOLATE_r9.json ``incremental_probe_shape``): a row-per-collision
    groupBy+window ranks exactly but materializes |delta|×bands×width
    rows (155 M rows, 73 s); an aggregate-HOF run-length encoder stays
    in-row but grows its accumulator via concat — a copy per element,
    O(n²) (14.7 s); an index-based HOF chain is O(n log n) on paper but
    Catalyst's project collapse inlines the sorted array into the lambda
    bodies and re-evaluates it per element (minutes). numpy's
    unique+argsort over the ≤ bands × cap array is exact, and the input
    frame is one bounded row per delta doc — batch count is
    |delta| / 10k, not corpus-sized."""

    @F.pandas_udf("array<bigint>")
    def _top(cands: pd.Series) -> pd.Series:
        def one(arr):
            ids, cnt = np.unique(np.asarray(arr, dtype=np.int64),
                                 return_counts=True)
            # lexsort: last key is primary → (-cnt, then ids asc for ties)
            order = np.lexsort((ids, -cnt))[:cap]
            return ids[order]
        return cands.map(one)

    return df.withColumn("top_cands", _top(F.col(cands_col)))


def _incremental_matches(
    b_sets: DataFrame,
    store_buckets: DataFrame,
    delta_docs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    num_hashes: int,
    max_jaccard_dist: float,
    seed: int,
    max_candidates_per_doc: int,
    extra_buckets: DataFrame | None = None,
    deleted_ids: list[int] | None = None,
) -> DataFrame:
    """ALL verified capped (delta_id, base_id, jd) matches of the delta
    probe, over ANY signature store representation — inline-derived frames
    (incremental_minhash_dedup) or parquet read back from a persisted
    store (incremental_minhash_dedup_stored). ``b_sets`` is (id, hs);
    ``store_buckets`` is ``_band_buckets``'s (table_id, mh, width, ids).

    The probe never materializes per-collision rows: a dense corpus
    (every doc ~100 near-dups) would turn a row-per-collision plan into
    |delta| × bands × bucket_width rows — measured at 155 M rows / 73 s
    for the 50 k-doc sf10 delta, ISOLATE_r9.json ``incremental_probe_shape``
    — while the bucket-array form carries the same information in
    |delta| × bands rows and ranks candidates with in-row array ops."""
    if max_candidates_per_doc > BUCKET_STORE_CAP:
        # The layered-probe merge (extra_buckets path below) is only
        # equivalent to a compacted-store probe when the probe cap fits
        # inside the store cap: a wider probe would see ids the stored
        # per-bucket prefix already dropped, so its verdicts silently
        # diverge from the post-compaction ones (ADVICE r11). Fail loud.
        raise ValueError(
            f"max_candidates_per_doc={max_candidates_per_doc} exceeds "
            f"BUCKET_STORE_CAP={BUCKET_STORE_CAP}: probe verdicts would "
            "diverge between layered and compacted store states"
        )
    d_sets = _shingle_sets(
        delta_docs, text_col, id_col, shingle_n, repartition=False
    )
    delta_bands = _band_rows(d_sets, num_hashes, seed).select(
        F.col("id").alias("delta_id"), "table_id", "mh"
    )

    def _cands(ids_col):
        """The per-bucket candidate prefix: DELETED ids are removed
        BEFORE the cap is applied (r18 self-review #4) — a deleted id
        ranking inside the min-id prefix would otherwise displace a
        genuine near-duplicate out of the capped candidate list and
        flip its verdict to novel until compaction physically frees
        the slot (the sets-side anti-join alone only guarantees a
        deleted id never VERIFIES; it cannot give its slot back).
        array_except preserves the first array's (ascending) order, so
        the slice stays the deterministic min-id prefix. ``deleted_ids``
        is driver-bounded by the callers (deletes since the last
        compaction, literal-array threshold enforced there)."""
        col = F.col(ids_col)
        if deleted_ids:
            col = F.array_except(
                col,
                F.array(
                    *[F.lit(int(i)) for i in deleted_ids]
                ).cast("array<bigint>"),
            )
        return F.slice(col, 1, max_candidates_per_doc).alias("ids")
    # (1) broadcast the delta probe: the base store streams through a BHJ,
    # one hit row per (delta doc, band) with the bucket's member array
    # sliced to the probe cap (ids are stored ascending, so the slice is
    # the deterministic min-id prefix).
    hits = store_buckets.join(
        F.broadcast(delta_bands), ["table_id", "mh"]
    ).select("delta_id", "table_id", "mh", _cands("ids"))
    if extra_buckets is not None:
        # Un-compacted append-layer buckets probe the SAME broadcast and
        # merge per HIT, not per store row: base and layer bucket rows for
        # one (band, delta doc) concat → sort → re-slice, which equals the
        # compacted store's merged min-id prefix (merge-stable cap, the
        # _merge_bucket_layers argument; requires probe cap ≤ store cap,
        # true by construction: 64 ≤ BUCKET_STORE_CAP). The base bucket
        # index therefore NEVER shuffles on a layered probe — the r11 fix
        # for the full-outer SortMergeJoin the per-batch stream plan
        # assert exposed; the merge shuffle is delta-hit-sized.
        hits = (
            hits.unionByName(
                extra_buckets.join(
                    F.broadcast(delta_bands), ["table_id", "mh"]
                ).select("delta_id", "table_id", "mh", _cands("ids"))
            )
            .groupBy("delta_id", "table_id", "mh")
            .agg(
                F.slice(
                    F.sort_array(F.flatten(F.collect_list("ids"))),
                    1,
                    max_candidates_per_doc,
                ).alias("ids")
            )
        )
    hits = hits.select("delta_id", "ids")
    # (2) collision-count ranking + per-delta-doc cap, all in-row: a doc's
    # ≤ bands arrays flatten to one bounded array; occurrences of a base
    # id across it = number of colliding bands (each band contributes one
    # bucket), the standard LSH ranking. The only shuffle is bands-per-doc
    # rows — delta-sized, never collision-sized.
    ranked = _with_top_candidates(
        hits.groupBy("delta_id").agg(
            F.flatten(F.collect_list("ids")).alias("cands")
        ),
        "cands",
        max_candidates_per_doc,
    ).select("delta_id", F.explode("top_cands").alias("base_id"))
    # (3) exact-Jaccard verify, base side map-side again (broadcast the
    # capped candidates, ≤ cap × |delta| rows). At a 100 TB deployment
    # with a multi-million-doc daily slice the candidate list outgrows a
    # broadcast; the scale path is an id-bucketed sets/ store so this
    # join shuffles ONLY the candidate side into the store's bucketing —
    # base sets still never shuffle. The hint is right at bench scales.
    matched = (
        b_sets.select(F.col("id").alias("base_id"), F.col("hs").alias("b_hs"))
        .join(F.broadcast(ranked), "base_id")
        .join(
            F.broadcast(
                d_sets.select(
                    F.col("id").alias("delta_id"), F.col("hs").alias("d_hs")
                )
            ),
            "delta_id",
        )
    )
    inter = F.size(F.array_intersect(F.col("b_hs"), F.col("d_hs")))
    union = F.size(F.col("b_hs")) + F.size(F.col("d_hs")) - inter
    jd = F.round(
        F.lit(1.0) - inter.cast("double") / union.cast("double"), 6
    )
    return matched.select("delta_id", "base_id", jd.alias("jd")).filter(
        F.col("jd") <= max_jaccard_dist
    )


def _incremental_probe(
    b_sets: DataFrame,
    store_buckets: DataFrame,
    delta_docs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    num_hashes: int,
    max_jaccard_dist: float,
    seed: int,
    max_candidates_per_doc: int,
    extra_buckets: DataFrame | None = None,
    deleted_ids: list[int] | None = None,
) -> DataFrame:
    """Per-delta-doc verdict frame (doc_id, dup_of, best_dist, is_new)
    over the verified matches of ``_incremental_matches``."""
    verified = (
        _incremental_matches(
            b_sets, store_buckets, delta_docs, text_col, id_col, shingle_n,
            num_hashes, max_jaccard_dist, seed, max_candidates_per_doc,
            extra_buckets=extra_buckets, deleted_ids=deleted_ids,
        )
        .groupBy("delta_id")
        .agg(
            F.min("base_id").alias("dup_of"),
            F.min("jd").alias("best_dist"),
        )
    )
    return (
        delta_docs.select(F.col(id_col))
        # verified is ≤ |delta| rows; broadcast it so the final left join
        # stays map-side (the static planner can't estimate a post-agg
        # frame and would otherwise fall back to a sort-merge join).
        .join(F.broadcast(verified), F.col(id_col) == verified.delta_id, "left")
        .select(
            F.col(id_col),
            "dup_of",
            "best_dist",
            F.col("dup_of").isNull().cast("int").alias("is_new"),
        )
    )


def incremental_cluster_assignments(
    base_docs: DataFrame,
    delta_docs: DataFrame,
    base_assignments: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    max_jaccard_dist: float = 0.8,
    seed: int = 42,
    max_candidates_per_doc: int = 64,
    b_sets: DataFrame | None = None,
    store_buckets: DataFrame | None = None,
) -> DataFrame:
    """Incremental CLUSTER maintenance: fold a new ingest slice into an
    EXISTING corpus's near-dup cluster assignments without re-clustering
    the corpus — the daily companion to ``minhash_clusters`` the way
    ``incremental_minhash_dedup`` is to ``dedup_minhash``. Pass
    ``b_sets``/``store_buckets`` (e.g. read back from
    ``minhash_signature_store_build``'s parquet) to skip re-shingling the
    base corpus — the steady-state daily shape.

    ``base_assignments`` is (doc_id, cluster_id) for the existing corpus
    (from ``minhash_clusters`` or a stored assignment table; cluster ids
    are min-member doc ids). The computation is DELTA-sized throughout:

    1. Verified delta→base matches (the incremental probe — base store
       streams map-side, candidates capped per delta doc).
    2. Each matched base doc is replaced by its CLUSTER id (one map-side
       join of the delta-sized match list against the assignment table),
       so base-side connectivity is inherited through the cluster reps
       instead of re-walking base-base edges.
    3. Delta-internal near-dup pairs (full minhash banding over the slice
       alone — identical hash functions, so the pair set equals the
       full-corpus run's delta×delta pairs).
    4. Connected components over this delta-sized graph (delta ids ∪
       touched cluster-rep ids); labels are min ids, which REPRODUCES the
       full re-clustering labels: a cluster rep IS its cluster's min
       member, so min over {reps, delta ids} in a component equals min
       over the merged member set.

    Output: one row per delta doc ``(doc_id, cluster_id, kind='delta')``
    — singletons label themselves — plus one row per TOUCHED base cluster
    whose label changed ``(old_rep_id, new_cluster_id, kind='base_remap')``:
    the remap a pipeline applies to the stored assignment table (base
    labels are not rewritten here; a delta doc bridging two base clusters
    yields remap rows merging them, exactly what full re-clustering would
    do). Planted-corpus equality with full re-clustering is asserted in
    tests/test_llm_ops.py.
    """
    from pycaim_spark.operators.graph import connected_components_star

    if b_sets is None:
        b_sets = _shingle_sets(
            base_docs, text_col, id_col, shingle_n, repartition=False
        )
    if store_buckets is None:
        store_buckets = _band_buckets(_band_rows(b_sets, num_hashes, seed))
    matches = _incremental_matches(
        b_sets, store_buckets, delta_docs, text_col, id_col, shingle_n,
        num_hashes, max_jaccard_dist, seed, max_candidates_per_doc,
    )
    assign = base_assignments.select(
        F.col(id_col).alias("base_id"), F.col("cluster_id").alias("_bc")
    )
    # matches is delta-sized → broadcast; the assignment table streams.
    # anchored is consumed twice (the CC edge set AND touched_reps below);
    # without the eager checkpoint each consumer re-runs the whole probe —
    # measured as ~2× the query's sf10 wall (ISOLATE_r9.json
    # incremental_clusters_anchor_ckpt).
    anchored = (
        assign.join(F.broadcast(matches), "base_id")
        .select(F.col("delta_id").alias("src"), F.col("_bc").alias("dst"))
        .localCheckpoint(eager=True)
    )
    dd = minhash_candidate_pairs(
        delta_docs,
        text_col=text_col,
        id_col=id_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        max_jaccard_dist=max_jaccard_dist,
        seed=seed,
        guard_shape="window",
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components_star(anchored.unionByName(dd), "src", "dst")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    delta_rows = (
        delta_docs.join(comp, delta_docs[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            cluster.alias("cluster_id"),
            F.lit("delta").alias("kind"),
        )
    )
    touched_reps = anchored.select(F.col("dst").alias("node")).distinct()
    remap_rows = (
        comp.join(touched_reps, "node")
        .filter(F.col("component") != F.col("node"))
        .select(
            F.col("node").alias(id_col),
            F.col("component").alias("cluster_id"),
            F.lit("base_remap").alias("kind"),
        )
    )
    return delta_rows.unionByName(remap_rows)


def minhash_signature_store_build(
    base_docs: DataFrame,
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    seed: int = 42,
) -> None:
    """Build (or reuse) a PERSISTED minhash signature store for an
    existing corpus: ``sets_v{N}/`` (id, hs — the hashed shingle sets,
    for exact-Jaccard verification) and ``buckets_v{N}/`` (table_id, mh,
    width, ids — the LSH band index pre-aggregated into per-bucket
    member arrays by ``_band_buckets``, so a probe joins one row per
    bucket and never expands per-collision rows), committed behind the
    ``current.json`` snapshot pointer (r16). Idempotent: if the pointed-
    to version's parquet dirs carry a _SUCCESS marker the build is
    skipped — the deployment shape,
    where the corpus's text is shingled ONCE and every daily delta
    probes the store without touching base text again. After each ingest
    the accepted delta's signatures are appended as band-row deltas and
    folded into the bucket arrays at the periodic compaction (at 100 TB:
    partition the store by ingest date — the LSM pattern).
    """
    with _store_write_lock(store_dir):
        _recover_store_swap(store_dir)
        _store_gc_superseded(store_dir)
        ptr = _load_pointer(store_dir)
        if ptr is not None:
            sets_dir = _versioned(store_dir, "sets", ptr["version"])
            buckets_dir = _versioned(store_dir, "buckets", ptr["version"])
            if os.path.exists(
                os.path.join(sets_dir, "_SUCCESS")
            ) and os.path.exists(os.path.join(buckets_dir, "_SUCCESS")):
                return
        # Fresh build (or a corrupted current version — rebuild beside
        # it): write the base under the NEXT version and commit by
        # pointer flip, folded reset to the passed corpus's truth.
        v = ptr["version"] + 1 if ptr is not None else 0
        sets_dir = _versioned(store_dir, "sets", v)
        buckets_dir = _versioned(store_dir, "buckets", v)
        b_sets = _shingle_sets(
            base_docs, text_col, id_col, shingle_n, repartition=False
        )
        b_sets.write.mode("overwrite").parquet(sets_dir)
        spark = base_docs.sparkSession
        (
            _band_buckets(
                _band_rows(spark.read.parquet(sets_dir), num_hashes, seed)
            )
            .write.mode("overwrite")
            .parquet(buckets_dir)
        )
        _commit_pointer(store_dir, v, [])


def incremental_minhash_dedup_stored(
    spark,
    store_dir: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    max_jaccard_dist: float = 0.8,
    seed: int = 42,
    max_candidates_per_doc: int = 64,
) -> DataFrame:
    """Incremental near-dup dedup against a PERSISTED signature store
    (``minhash_signature_store_build``) — the steady-state daily-ingest
    query: the base corpus's TEXT is never read, only its stored band
    index and shingle sets stream map-side against the broadcast delta.
    Same probe, same verdicts as ``incremental_minhash_dedup`` (asserted
    in tests/test_llm_ops.py); what changes is what the run touches.
    Read-only: resolves a consistent view even of a mid-swap store
    (``_store_read_view``) instead of mutating it (ADVICE r10)."""
    sets_path, buckets_path, _ = _store_read_view(store_dir)
    b_sets = spark.read.parquet(sets_path)
    store_buckets = spark.read.parquet(buckets_path)
    # Pending deletions (r18) apply logically, in two layers: the
    # sets-side anti-join guarantees a deleted id never VERIFIES as a
    # match, and the pre-cap candidate filter (deleted_ids) keeps a
    # deleted id from occupying a capped candidate slot that would
    # displace a genuine near-duplicate until compaction. Broadcast/
    # literal-bounded by deletes since the last compaction.
    dels = _store_deleted_ids(spark, store_dir)
    if dels is not None:
        b_sets = b_sets.join(F.broadcast(dels), "id", "left_anti")
    return _incremental_probe(
        b_sets, store_buckets, delta_docs, text_col, id_col, shingle_n,
        num_hashes, max_jaccard_dist, seed, max_candidates_per_doc,
        deleted_ids=_deleted_ids_for_probe(dels),
    )


def _store_delete_dirs(store_dir: str) -> list[str]:
    """Live DELETE layers (r18): ``deletes/<key>/ids`` parquet dirs,
    complete (``ids/_SUCCESS``) and not tombstoned — same liveness rule
    as the append layers, same write-aside swap scaffolding exclusions."""
    del_dir = os.path.join(store_dir, "deletes")
    if not os.path.isdir(del_dir):
        return []
    return sorted(
        os.path.join(del_dir, k)
        for k in os.listdir(del_dir)
        if not k.endswith(".next")
        and ".old-" not in k
        and os.path.exists(os.path.join(del_dir, k, "ids", "_SUCCESS"))
        and not os.path.exists(
            os.path.join(del_dir, k, "superseded.json")
        )
    )


def _store_deleted_ids(spark, store_dir: str):
    """The union of every live delete layer's ids as a one-column
    ``id`` DataFrame, or None when no deletes are pending. Bounded by
    deletions since the last compaction (compaction applies them
    physically and retires the layers), so probes can broadcast it."""
    dirs = _store_delete_dirs(store_dir)
    if not dirs:
        return None
    out = None
    for d in dirs:
        ids = spark.read.parquet(os.path.join(d, "ids"))
        out = ids if out is None else out.unionByName(ids)
    return out.distinct()


#: Above this many pending deleted ids the probes skip the exact
#: pre-cap candidate filter (a literal array that large would bloat
#: the plan) and fall back to the sets-side anti-join alone — deleted
#: ids then cost candidate slots until compaction. Compaction restores
#: exactness at any size.
_DELETE_CANDIDATE_FILTER_MAX = 4096


def _deleted_ids_for_probe(dels) -> list[int] | None:
    """Driver-side deleted-id list for the probe's exact pre-cap
    candidate filter, or None past `_DELETE_CANDIDATE_FILTER_MAX`
    (bounded: deletes since the last compaction)."""
    if dels is None:
        return None
    rows = dels.limit(_DELETE_CANDIDATE_FILTER_MAX + 1).collect()
    if len(rows) > _DELETE_CANDIDATE_FILTER_MAX:
        return None
    return [r.id for r in rows]


def _store_del_manifest(store_dir: str) -> list[str]:
    """Delete keys already APPLIED by a compaction, in fold order —
    the replay-idempotency manifest for deletions, carried inside the
    snapshot pointer (``del_folded``) like the append manifest."""
    ptr = _load_pointer(store_dir)
    if ptr is not None:
        return list(ptr.get("del_folded", ()))
    return []


def minhash_signature_store_delete(
    spark,
    store_dir: str,
    doc_ids: DataFrame,
    delete_key: str,
    id_col: str = "doc_id",
) -> None:
    """DELETE documents from a persisted signature store (r18) — the
    right-to-be-forgotten motion a production corpus needs: after this
    commit, deleted docs are never again returned as dedup targets, and
    a new document identical to a deleted one is NOVEL.

    LSM shape, mirroring the append path: the ids land as a DELETE
    LAYER ``deletes/<key>/ids`` (write-aside + rename swap, ADVICE r15
    discipline — a redelivered key never mutates files a lockless
    reader resolved). Probes apply live delete layers LOGICALLY in two
    interlocking layers: the sets-side anti-join guarantees a deleted
    id never VERIFIES as a match, and the pre-cap candidate filter
    (`_incremental_matches` ``deleted_ids``) removes deleted ids from
    the stored bucket arrays BEFORE the per-doc candidate cap, so a
    deleted id cannot displace a genuine near-duplicate out of the
    capped prefix. Past `_DELETE_CANDIDATE_FILTER_MAX` pending ids the
    second layer falls back to slot-loss-until-compaction (documented
    approximation; verification correctness is never affected — run
    the compaction). The next compaction
    applies deletions PHYSICALLY — sets rows dropped, bucket member
    arrays filtered — retires the layers (two-phase tombstone+grace),
    and records the key in the pointer's ``del_folded`` manifest so a
    replayed delete is a no-op, the same batch-key discipline as every
    other sink in the repo. Idempotent before compaction too: the
    layer is keyed, and deletion is monotone.

    Deleting an id that was never in the store is a harmless no-op
    row. Cost: O(delete batch) now, O(store) at the next compaction
    (the physical pass — at 100 TB the same rewrite a table-format
    purge pays)."""
    import shutil

    with _store_write_lock(store_dir):
        _recover_store_swap(store_dir)
        _store_gc_superseded(store_dir)
        if delete_key in _store_del_manifest(store_dir):
            return  # already physically applied by a compaction
        layer = os.path.join(store_dir, "deletes", delete_key)
        fresh = layer + ".next"
        shutil.rmtree(fresh, ignore_errors=True)
        (
            doc_ids.select(F.col(id_col).cast("long").alias("id"))
            .distinct()
            .write.mode("overwrite")
            .parquet(os.path.join(fresh, "ids"))
        )
        if os.path.exists(layer):
            old = f"{layer}.old-{int(time.time() * 1000)}"
            os.rename(layer, old)
            _write_json_atomic(
                os.path.join(old, "superseded.json"), {"ts": time.time()}
            )
        os.rename(fresh, layer)


def _store_manifest_ordered(store_dir: str) -> list[str]:
    """Ingest keys already folded into the base layer, in FOLD ORDER
    (oldest first) — the order the compactor wrote them, which is layer
    append-time order, NOT lexicographic key order. Recency decisions
    (``minhash_store_manifest_gc``) must use this order: arbitrary ingest
    keys don't sort chronologically ('day10' < 'day2' lexicographically),
    and GC'ing the wrong end shrinks the replay-idempotency window
    (ADVICE r11). Since r16 the manifest travels INSIDE the snapshot
    pointer (one atomic document with the base version — see
    `_commit_pointer`); ``folded_keys.json`` is read only for legacy
    stores the next write path hasn't migrated yet."""
    import json as _json

    ptr = _load_pointer(store_dir)
    if ptr is not None:
        return list(ptr.get("folded", ()))
    path = os.path.join(store_dir, "folded_keys.json")
    if os.path.exists(path):
        with open(path) as f:
            return list(_json.load(f))
    return []


def _store_manifest(store_dir: str) -> set[str]:
    """Ingest keys already folded into the base layer by compaction."""
    return set(_store_manifest_ordered(store_dir))


def minhash_signature_store_append(
    spark,
    store_dir: str,
    accepted_docs: DataFrame,
    ingest_key: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    seed: int = 42,
) -> None:
    """Append an ACCEPTED ingest slice's signatures to a persisted store
    as a new LAYER ``append/<ingest_key>/{sets,bands}`` — the write half
    of the daily loop: probe the slice, keep the survivors, append them
    so TOMORROW's slice dedups against today's. Idempotent per
    ``ingest_key``: the layer dir is overwritten on re-delivery, and a
    key the compactor has already folded into the base (the manifest,
    ``folded_keys.json``) is skipped entirely — replaying a processed
    day is a no-op, the same batch-id discipline as the streaming upsert
    sink (streaming/runner.py). Layers hold RAW band rows (the LSM log);
    ``minhash_signature_store_compact`` folds them into the
    bucket-aggregated base."""
    import shutil

    with _store_write_lock(store_dir):
        _recover_store_swap(store_dir)
        _store_gc_superseded(store_dir)
        if ingest_key in _store_manifest(store_dir):
            return
        layer = os.path.join(store_dir, "append", ingest_key)
        # Write-ASIDE, never in place (ADVICE r15): a redelivered key may
        # land on an existing layer dir — live (unfolded redelivery) or
        # tombstoned-in-grace (folded, manifest-GC-trimmed, redelivered) —
        # and mode("overwrite") would delete part files a stale lockless
        # reader already resolved: the exact crash class the two-phase GC
        # exists to prevent. The fresh content goes to ``<key>.next``; the
        # swap renames the old dir away (tombstoned for grace collection,
        # every resolved path still valid) and the new one into place — a
        # fresh dir carries no tombstone, so this also resurrects a
        # trimmed-and-redelivered key without touching the old files.
        # Crash anywhere mid-swap is healed by ``_recover_store_swap``'s
        # layer pass (roll a complete orphaned .next forward, tombstone an
        # untombstoned .old, delete an incomplete .next).
        fresh = layer + ".next"
        shutil.rmtree(fresh, ignore_errors=True)
        a_sets = _shingle_sets(
            accepted_docs, text_col, id_col, shingle_n, repartition=False
        )
        a_sets.write.mode("overwrite").parquet(os.path.join(fresh, "sets"))
        (
            _band_rows(
                spark.read.parquet(os.path.join(fresh, "sets")), num_hashes, seed
            )
            .write.mode("overwrite")
            .parquet(os.path.join(fresh, "bands"))
        )
        if os.path.exists(layer):
            old = f"{layer}.old-{int(time.time() * 1000)}"
            os.rename(layer, old)
            _write_json_atomic(
                os.path.join(old, "superseded.json"), {"ts": time.time()}
            )
        os.rename(fresh, layer)


def _store_layer_dirs(store_dir: str) -> list[str]:
    """Live append layers: complete (``bands/_SUCCESS``) and not
    tombstoned. The tombstone check is load-bearing independently of the
    folded-keys manifest: a folded layer awaits grace-period deletion on
    disk (two-phase GC, r15) and its key can be TRIMMED from the manifest
    by ``minhash_store_manifest_gc`` before the dir is collected — without
    this check the trimmed-but-undeleted layer would re-enter probes and
    compactions as a live layer and double-count its rows."""
    append_dir = os.path.join(store_dir, "append")
    if not os.path.isdir(append_dir):
        return []
    return sorted(
        os.path.join(append_dir, k)
        for k in os.listdir(append_dir)
        # ``<key>.next`` (in-progress write-aside) and ``<key>.old-<ts>``
        # (swapped-out content awaiting grace collection) are swap
        # scaffolding, never live layers, even when a crash left them
        # complete-looking (ADVICE r15 redelivery write-aside).
        if not k.endswith(".next")
        and ".old-" not in k
        and os.path.exists(os.path.join(append_dir, k, "bands", "_SUCCESS"))
        and not os.path.exists(
            os.path.join(append_dir, k, "superseded.json")
        )
    )


def _tombstone_folded_layers(
    store_dir: str, keys: set[str] | None = None
) -> None:
    """Phase 1 of the store's two-phase layer GC (r15 — ports the
    bucketed layout's reader-grace pattern, advanced.py
    `_gc_superseded_layouts`, after a live cross-process crash: a
    lockless reader that resolved its view pre-compaction took
    PATH_NOT_FOUND mid-scan when the old compaction ``rmtree``'d the
    append layers it was still reading). Folded layers are tombstoned IN
    PLACE (``superseded.json`` with a timestamp) so every file path a
    stale reader already resolved stays valid; enumeration
    (`_store_layer_dirs`) hides tombstoned layers from new readers and
    compactions. ``keys`` limits the sweep to the named ingest keys —
    REQUIRED when called from recovery (r16): recovery replays the last
    commit's phase 1 from the pointer's folded list, and an unrestricted
    sweep there would tombstone live layers appended after that commit.
    Caller holds the store write lock."""
    append_dir = os.path.join(store_dir, "append")
    if not os.path.isdir(append_dir):
        return
    now = time.time()
    for k in os.listdir(append_dir):
        if keys is not None and k not in keys:
            continue
        layer = os.path.join(append_dir, k)
        tomb = os.path.join(layer, "superseded.json")
        if os.path.isdir(layer) and not os.path.exists(tomb):
            _write_json_atomic(tomb, {"ts": now})


def _store_gc_superseded(store_dir: str) -> None:
    """Phase 2: delete tombstoned layers AND superseded base versions
    older than ``$PYCAIM_STORE_GC_GRACE`` seconds (default 900 — same
    default as the layout's ``$PYCAIM_LAYOUT_GC_GRACE``; any reader that
    resolved its view more than a grace period ago has finished or was
    abandoned). Runs from every write path under the store write lock;
    an unreadable tombstone is left for a later pass rather than guessed
    at. Old base versions carry their tombstone INSIDE the parquet dir
    as ``_superseded.json`` — the underscore prefix keeps it invisible
    to a stale reader's parquet scan of that very dir."""
    import json as _json
    import shutil

    grace = float(os.environ.get("PYCAIM_STORE_GC_GRACE", "900"))
    now = time.time()

    def _aged(tomb):
        try:
            with open(tomb) as f:
                return now - float(_json.load(f).get("ts", now)) > grace
        except (OSError, ValueError, TypeError):
            return False

    for _kind, _n, path in _version_dirs(store_dir):
        tomb = os.path.join(path, "_superseded.json")
        if os.path.exists(tomb) and _aged(tomb):
            shutil.rmtree(path, ignore_errors=True)
    # Tombstoned LEGACY dirs (r18: the migration link-assembles v0 and
    # tombstones the unversioned base instead of renaming it) collect
    # on the same grace as any displaced version.
    for d in ("sets", "buckets"):
        base = os.path.join(store_dir, d)
        for legacy in (base, base + "_next", base + "_old"):
            tomb = os.path.join(legacy, "_superseded.json")
            if os.path.exists(tomb) and _aged(tomb):
                shutil.rmtree(legacy, ignore_errors=True)
    for root in ("append", "deletes"):
        layer_root = os.path.join(store_dir, root)
        if not os.path.isdir(layer_root):
            continue
        for k in os.listdir(layer_root):
            tomb = os.path.join(layer_root, k, "superseded.json")
            if os.path.exists(tomb) and _aged(tomb):
                shutil.rmtree(
                    os.path.join(layer_root, k), ignore_errors=True
                )
        # Drop the parent once everything under it is collected, so "no
        # layer dir at all" stays the fully-quiesced steady state.
        try:
            if not os.listdir(layer_root):
                os.rmdir(layer_root)
        except OSError:
            pass


def _merge_bucket_layers(
    base_buckets: DataFrame, pending_bands: DataFrame,
    bucket_cap: int = BUCKET_STORE_CAP,
) -> DataFrame:
    """Fold raw pending band rows into bucket-aggregated base buckets.

    The min-id-prefix cap is MERGE-STABLE: the cap smallest ids of
    (cap-smallest-of-base ∪ new) equal the cap smallest of
    (all-base ∪ new), because the base prefix already contains every
    base id that could make the merged prefix. So compaction produces
    byte-identical buckets to a from-scratch rebuild over the union
    corpus — asserted in tests/test_llm_ops.py. Widths add exactly."""
    pend = _band_buckets(pending_bands, bucket_cap)
    b = base_buckets.select(
        "table_id", "mh",
        F.col("ids").alias("_bi"), F.col("width").alias("_bw"),
    )
    p = pend.select(
        "table_id", "mh",
        F.col("ids").alias("_pi"), F.col("width").alias("_pw"),
    )
    empty = F.array().cast("array<bigint>")
    return b.join(p, ["table_id", "mh"], "full_outer").select(
        "table_id",
        "mh",
        F.slice(
            F.sort_array(
                F.concat(
                    F.coalesce(F.col("_bi"), empty),
                    F.coalesce(F.col("_pi"), empty),
                )
            ),
            1,
            bucket_cap,
        ).alias("ids"),
        (
            F.coalesce(F.col("_bw"), F.lit(0)) + F.coalesce(F.col("_pw"), F.lit(0))
        ).alias("width"),
    )


class _store_write_lock:
    """Exclusive advisory lock on a signature store, held for the whole
    body of every WRITE path (build/append/compact, each of which starts
    with crash recovery). Serializes two concurrent compactions — the
    second blocks, then finds nothing to fold and no-ops — and keeps a
    concurrent append from racing the swap renames. Read paths (the
    probes) take no lock: they never mutate the store (recovery runs
    only under this lock) and resolve a consistent snapshot via
    ``_store_read_view`` — since r16 the pointer commit plus grace-period
    tombstoning of old versions means a commit landing between a probe's
    resolution and its lazy materialization leaves every resolved path
    on disk for $PYCAIM_STORE_GC_GRACE seconds. flock is
    per-open-file, so this also
    serializes threads inside one driver process. Cross-HOST writers are
    NOT serialized (flock is host-local) — on an object store the swap
    below is a table-format commit and the catalog provides the lock."""

    def __init__(self, store_dir: str):
        os.makedirs(store_dir, exist_ok=True)
        self._path = os.path.join(store_dir, "store.lock")

    def __enter__(self):
        import fcntl

        self._f = open(self._path, "w")
        fcntl.flock(self._f, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc):
        import fcntl

        fcntl.flock(self._f, fcntl.LOCK_UN)
        self._f.close()
        return False


def _write_json_atomic(path: str, obj) -> None:
    """Write JSON durably: temp file, fsync, rename into place, fsync the
    directory entry — a reader (or crash recovery) sees the old content,
    the new content, or nothing, never a truncated file (ADVICE r10)."""
    import json as _json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    dfd = os.open(os.path.dirname(path), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _load_pointer(store_dir: str) -> dict | None:
    """Parse the store's snapshot pointer ``current.json`` —
    ``{"version": N, "folded": [...]}`` — the single atomic commit point
    of the versioned base (r16, VERDICT r15 #3). Written only via
    ``_write_json_atomic``, so a reader sees the old snapshot, the new
    snapshot, or (pre-first-build / legacy store) nothing — never a torn
    state. ``None`` if absent or unparseable (unparseable ⇒ pre-atomic
    artifact ⇒ treat as legacy/unbuilt, same doctrine as
    ``_load_journal``)."""
    import json as _json

    path = os.path.join(store_dir, "current.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            ptr = _json.load(f)
        return ptr if isinstance(ptr.get("version"), int) else None
    except (OSError, ValueError, AttributeError):
        return None


def _commit_pointer(
    store_dir: str, version: int, folded: list[str],
    del_folded: list[str] | None = None,
) -> None:
    """Atomically publish a new base snapshot: one fsynced rename flips
    every reader from (sets_v{N}, buckets_v{N}, folded_N) to version
    N+1's triple — base paths and the folded-layer skip set travel in
    the SAME document, so no interleaving can pair a new base with a
    stale skip set (the double-count mode the old journal stability loop
    defended against). ``del_folded`` (r18) is the applied-deletion
    manifest — delete keys a compaction has folded physically, the
    replay-idempotency guard for `minhash_signature_store_delete` —
    carried in the same atomic document; omitted while empty so
    pre-r18 pointer shapes stay bit-stable."""
    doc = {"version": version, "folded": list(folded)}
    if del_folded:
        doc["del_folded"] = list(del_folded)
    _write_json_atomic(os.path.join(store_dir, "current.json"), doc)


def _versioned(store_dir: str, name: str, version: int) -> str:
    return os.path.join(store_dir, f"{name}_v{version}")


def _version_dirs(store_dir: str) -> list[tuple[str, int, str]]:
    """All on-disk versioned base dirs as (kind, version, path)."""
    out = []
    if not os.path.isdir(store_dir):
        return out
    for d in os.listdir(store_dir):
        for kind in ("sets", "buckets"):
            prefix = f"{kind}_v"
            if d.startswith(prefix):
                try:
                    out.append(
                        (kind, int(d[len(prefix):]),
                         os.path.join(store_dir, d))
                    )
                except ValueError:
                    pass
    return out


def _load_journal(store_dir: str) -> list[str] | None:
    """Parse the compaction commit journal; ``None`` if absent OR
    unparseable. The journal is written atomically (temp + rename), so a
    truncated file can only be a pre-atomic-write artifact or torn
    storage — and treating it as absent is SAFE: the swap renames only
    start after the journal is durably in place, so no journal ⇒ the old
    base and every append layer are intact ⇒ roll back (ADVICE r10: a
    truncated journal must not strand the store)."""
    import json as _json

    journal = os.path.join(store_dir, "compact_journal.json")
    if not os.path.exists(journal):
        return None
    try:
        with open(journal) as f:
            return _json.load(f)
    except ValueError:
        return None


def _recover_layer_swaps(store_dir: str) -> None:
    """Heal a crashed per-layer write-aside swap (the redelivery path of
    ``minhash_signature_store_append``, ADVICE r15). Deterministic from
    the on-disk shapes alone: a COMPLETE orphaned ``<key>.next``
    (``bands/_SUCCESS`` present, no live ``<key>`` sibling) is the
    committed content of a crash between the two swap renames — roll it
    forward; an incomplete or non-orphaned ``.next`` is an uncommitted
    write — delete it (the old layer, live or already renamed aside, is
    intact); an ``<key>.old-<ts>`` that missed its tombstone gets one so
    grace GC collects it. Caller holds the store write lock."""
    import shutil

    for root, marker in (("append", "bands"), ("deletes", "ids")):
        layer_root = os.path.join(store_dir, root)
        if not os.path.isdir(layer_root):
            continue
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
            elif ".old-" in k and not os.path.exists(
                os.path.join(d, "superseded.json")
            ):
                _write_json_atomic(
                    os.path.join(d, "superseded.json"),
                    {"ts": time.time()},
                )


def _recover_store_swap(store_dir: str) -> None:
    """Reconcile a store's on-disk state after any crash (runs at the
    top of every WRITE path, under ``_store_write_lock`` — probes stay
    read-only, ADVICE r10).

    Since r16 the base is VERSIONED (``sets_v{N}``/``buckets_v{N}``)
    behind the atomic ``current.json`` snapshot pointer, so recovery is
    a pure reconciliation with no roll-forward/roll-back decision tree:

    - version dirs NEWER than the pointer are uncommitted compactor
      output (the pointer flip is the commit) — delete them; the
      compaction re-derives them bit-identically;
    - version dirs OLDER than the pointer that missed their tombstone
      (crash between pointer commit and phase-1 GC) get one, so grace
      collection proceeds;
    - append layers named in the pointer's ``folded`` list that missed
      their tombstone get one (same crash window).

    LEGACY stores (pre-r16: unversioned ``sets``/``buckets`` plus the
    journal/next/old swap machinery) are first healed by the old
    protocol — journal present → the ``*_next`` base is authoritative,
    finish the renames; absent → delete strays — and then MIGRATED in
    place: base dirs renamed to ``*_v0``, the folded manifest folded
    into a version-0 pointer, ``folded_keys.json`` retired."""
    import shutil

    _recover_layer_swaps(store_dir)
    ptr = _load_pointer(store_dir)
    if ptr is None:
        journal = os.path.join(store_dir, "compact_journal.json")
        folded = _load_journal(store_dir)
        dirs = [os.path.join(store_dir, d) for d in ("sets", "buckets")]
        if folded is None:
            # No (or torn) journal: ADVICE r10 doctrine — renames only
            # started after an atomic journal write, so the unversioned
            # base + layers are intact and *_next/*_old are debris.
            if os.path.exists(journal):
                os.remove(journal)
            for cur in dirs:
                for stray in (cur + "_next", cur + "_old"):
                    if os.path.exists(stray):
                        shutil.rmtree(stray)
        else:
            # Valid journal: the folded base is authoritative, but the
            # legacy binary may have crashed at ANY point of its rename
            # sequence, so per dir the folded content is in *_next
            # (rename not yet executed) or already in the unversioned
            # dir (rename consumed the next). The per-dir source rule
            # below handles every mix — including one-renamed-one-not,
            # where choosing next-if-complete-else-cur yields the
            # consistent POST-fold pair. An incomplete *_next (no
            # _SUCCESS — impossible under the legacy protocol's
            # write-journal-after-next-completes invariant, so only a
            # corrupted store) is treated as absent: the unversioned
            # dir serves, strictly safer than the legacy heal's rename
            # of the torn dir over it. The journal itself is consumed
            # only after the migration commits (below), preserving the
            # folded-keys manifest the r17 heal wrote to
            # folded_keys.json — dropping it would leave the
            # physically-folded layers live with an empty skip set and
            # double-count their rows through the layered probe.
            for cur in dirs:
                nxt = cur + "_next"
                if os.path.exists(nxt) and not os.path.exists(
                    os.path.join(nxt, "_SUCCESS")
                ):
                    shutil.rmtree(nxt)
        # Migrate a healed legacy base to the versioned layout, written
        # as a crash-idempotent FORWARD COMPLETION (a crash anywhere
        # must not strand or delete data). r18 (VERDICT r17 #6): v0 is
        # LINK-ASSEMBLED from the live legacy dir — with a journal,
        # from its *_next twin, which the legacy commit point made
        # authoritative — never renamed (layout.py's pattern), so a
        # lockless reader mid-materialization on a legacy store keeps
        # scanning intact files; the legacy dirs are TOMBSTONED after
        # the pointer commits and grace-collected. The assembly is
        # complete-or-absent (temp dir + atomic rename), so a
        # pointer-less COMPLETE v0 pair is a crashed migration →
        # commit it; an incomplete pair can only be a direct v0 build
        # that crashed before its pointer → delete the strays, the
        # next build re-derives. Legacy READERS resolve through
        # `_store_read_view`'s fallback + stability loop and settle on
        # the pointer once it lands; their resolved legacy paths stay
        # on disk for the grace period. The pre-r18 honesty note (the
        # one-time migration rename window) is gone — there is no
        # rename of live files anywhere in this store family.
        v0 = [d + "_v0" for d in dirs]
        for cur, nxt in zip(dirs, v0):
            stray = nxt + ".assembling"
            shutil.rmtree(stray, ignore_errors=True)
            src = (
                cur + "_next"
                if folded is not None
                and os.path.exists(os.path.join(cur + "_next", "_SUCCESS"))
                else cur
            )
            if os.path.exists(src) and not os.path.exists(nxt):
                os.makedirs(stray)
                for fn in os.listdir(src):
                    full = os.path.join(src, fn)
                    if not os.path.isfile(full):
                        continue
                    try:
                        os.link(full, os.path.join(stray, fn))
                    except OSError:
                        shutil.copy2(full, os.path.join(stray, fn))
                os.rename(stray, nxt)
        manifest = os.path.join(store_dir, "folded_keys.json")
        if all(
            os.path.exists(os.path.join(d, "_SUCCESS")) for d in v0
        ):
            legacy_folded = list(folded) if folded is not None else []
            if folded is None and os.path.exists(manifest):
                import json as _json

                with open(manifest) as f:
                    legacy_folded = list(_json.load(f))
            _commit_pointer(store_dir, 0, legacy_folded)
            if os.path.exists(manifest):
                os.remove(manifest)
            if folded is not None:
                _tombstone_folded_layers(store_dir, keys=set(folded))
                if os.path.exists(journal):
                    os.remove(journal)
            # Phase-1 GC of the superseded legacy dirs (underscore
            # marker: invisible to a stale reader's parquet scan of
            # that very dir); `_store_gc_superseded` collects them
            # after grace, like any displaced version.
            for cur in dirs:
                for d in (cur, cur + "_next", cur + "_old"):
                    if os.path.isdir(d):
                        _write_json_atomic(
                            os.path.join(d, "_superseded.json"),
                            {"ts": time.time()},
                        )
        else:
            for d in v0:
                if os.path.exists(d):
                    shutil.rmtree(d)
        return
    v = ptr["version"]
    for _kind, n, path in _version_dirs(store_dir):
        if n > v:
            shutil.rmtree(path, ignore_errors=True)
        elif n < v and not os.path.exists(
            os.path.join(path, "_superseded.json")
        ):
            _write_json_atomic(
                os.path.join(path, "_superseded.json"),
                {"ts": time.time()},
            )
    # Delete layers the pointer has folded (``del_folded``) whose
    # tombstone write was lost to a crash: re-lay it so grace
    # collection proceeds — probes stay correct meanwhile (re-filtering
    # already-removed ids is a no-op).
    for dl in _store_delete_dirs(store_dir):
        if os.path.basename(dl) in set(ptr.get("del_folded", ())):
            _write_json_atomic(
                os.path.join(dl, "superseded.json"),
                {"ts": time.time()},
            )
    # Legacy scaffolding outliving a crash between the migration's
    # pointer commit and its phase-1 tombstoning (r18): the pointer
    # supersedes the unversioned dirs by definition — re-lay their
    # tombstones idempotently; `.assembling` strays are unpublished.
    for d in ("sets", "buckets"):
        base = os.path.join(store_dir, d)
        shutil.rmtree(base + "_v0.assembling", ignore_errors=True)
        for legacy in (base, base + "_next", base + "_old"):
            tomb = os.path.join(legacy, "_superseded.json")
            if os.path.isdir(legacy) and not os.path.exists(tomb):
                _write_json_atomic(tomb, {"ts": time.time()})
    _tombstone_folded_layers(store_dir, keys=set(ptr.get("folded", ())))


def _store_read_view(store_dir: str) -> tuple[str, str, set[str]]:
    """Resolve a CONSISTENT read-only view of the store: returns
    (sets_path, buckets_path, folded_keys_to_skip).

    Since r16 (VERDICT r15 #3) this is a SNAPSHOT-POINTER read: one
    atomic parse of ``current.json`` yields the base version AND the
    folded-layer skip set together, and the resolved ``sets_v{N}``/
    ``buckets_v{N}`` dirs are IMMUTABLE once published — a compaction
    that commits version N+1 while this reader is still materializing
    only flips the pointer and tombstones version N, whose files stay on
    disk for ``$PYCAIM_STORE_GC_GRACE`` seconds (the version tombstone
    lives INSIDE the dir as underscore-prefixed ``_superseded.json``,
    invisible to the parquet scan). That closes the last lockless-reader
    window this store family had: pre-r16 the base swap renamed the
    CURRENT dirs, so a reader that resolved before a commit could take
    FileNotFoundException mid-scan and needed a documented re-plan
    remedy; now every resolved path outlives the reader by a grace
    period, the same contract the append layers have had since r15 —
    the exact lifetime semantics a table-format snapshot commit provides
    in deployment. A reader stale by MORE than the grace period (scan
    paused ~15 min across a commit) is the residual, governed by the
    grace knob like every two-phase GC in this repo.

    Legacy stores (no pointer yet — migrated lazily by the next write
    path's `_recover_store_swap`) fall back to the pre-r16 resolution:
    journal present → the ``*_next`` base is authoritative and its
    folded layers are skipped; absent → the unversioned dirs, with a
    stability loop re-resolving until the journal state and dir
    existence agree (a mid-migration reader re-enters here and settles
    on the post-migration pointer). Since r18 (VERDICT r17 #6) the
    one-time legacy→versioned migration LINK-ASSEMBLES ``*_v0`` from
    the live unversioned dirs and tombstones them after the pointer
    commits — the pre-r18 rename of live files (and its documented
    FileNotFoundException window for a mid-materialization legacy
    reader) is gone: a legacy reader's resolved paths now outlive the
    migration by the grace period, so the "no reader-visible rename
    anywhere" claim holds for EVERY store, born versioned or legacy."""
    for attempt in range(20):
        ptr = _load_pointer(store_dir)
        if ptr is not None:
            v = ptr["version"]
            return (
                _versioned(store_dir, "sets", v),
                _versioned(store_dir, "buckets", v),
                set(ptr.get("folded", ())),
            )
        folded = _load_journal(store_dir)
        paths = []
        for d in ("sets", "buckets"):
            cur = os.path.join(store_dir, d)
            nxt = cur + "_next"
            paths.append(
                nxt if folded is not None and os.path.exists(nxt) else cur
            )
        # Stability check: a swap that landed mid-resolution could pair
        # one pre-swap path with one post-swap path (old sets + new
        # buckets double-counts folded layers through skip_keys=∅).
        # Accept only a resolution whose journal state is unchanged and
        # whose dirs all exist after resolving.
        if all(os.path.exists(p) for p in paths) and \
                _load_journal(store_dir) == folded:
            break
        time.sleep(0.05)
    return paths[0], paths[1], set(folded or ())


def minhash_signature_store_compact(spark, store_dir: str) -> None:
    """Fold every live append layer into a NEW base version and commit
    it with one atomic pointer flip — the LSM compaction, re-based on
    the r16 snapshot-pointer layout (VERDICT r15 #3). The merged base is
    written to ``sets_v{N+1}``/``buckets_v{N+1}`` beside the live
    version; ``current.json`` is then rewritten atomically with the new
    version AND the updated folded-keys manifest in one document (so no
    reader can pair the new base with a stale skip set); finally the
    folded layers and the old version dirs are TOMBSTONED in place and
    collected by `_store_gc_superseded` after ``$PYCAIM_STORE_GC_GRACE``
    seconds — a lockless reader that resolved version N keeps every one
    of its files for the whole grace period (r15 reproduced the crash
    this prevents for layers; r16 extends the same lifetime to the base,
    deleting the FileNotFoundException window the journal-era swap had).
    A process crash anywhere is reconciled by `_recover_store_swap`: the
    pointer flip IS the commit, so pre-flip crashes leave uncommitted
    ``*_v{N+1}`` strays (deleted, re-derived next time) and post-flip
    crashes leave missing tombstones (re-laid idempotently). Scope
    (ADVICE r10): the pointer is fsynced, the parquet part files are the
    filesystem's durability contract, not this function's. Concurrency:
    runs under the store's exclusive write lock, so a second concurrent
    compaction blocks and then no-ops (no layers left to fold)."""
    with _store_write_lock(store_dir):
        _recover_store_swap(store_dir)
        _store_gc_superseded(store_dir)
        layers = _store_layer_dirs(store_dir)
        del_layers = _store_delete_dirs(store_dir)
        if not layers and not del_layers:
            return
        ptr = _load_pointer(store_dir)
        if ptr is None:
            # Live append layers but no committed base snapshot (a base
            # build that never completed, or a legacy migration that
            # removed incomplete v0 dirs): there is nothing to fold
            # INTO. Fail with the actual condition instead of the
            # opaque 'NoneType not subscriptable' (ADVICE r16).
            raise RuntimeError(
                f"signature store at {store_dir} has append layers but "
                "no committed base snapshot (current.json missing) — "
                "build the base (minhash_signature_store) before "
                "compacting"
            )
        v = ptr["version"]
        sets_dir = _versioned(store_dir, "sets", v)
        buckets_dir = _versioned(store_dir, "buckets", v)
        merged_sets = spark.read.parquet(sets_dir)
        pending = None
        for l in layers:
            merged_sets = merged_sets.unionByName(
                spark.read.parquet(os.path.join(l, "sets"))
            )
            bands = spark.read.parquet(os.path.join(l, "bands"))
            pending = bands if pending is None else pending.unionByName(bands)
        merged_buckets = (
            _merge_bucket_layers(spark.read.parquet(buckets_dir), pending)
            if pending is not None
            else spark.read.parquet(buckets_dir)
        )
        if del_layers:
            # PHYSICAL deletion fold (r18): drop deleted docs from the
            # sets side and filter them out of every bucket's member
            # array (explode → anti-mark → re-aggregate under the same
            # merge-stable min-id-prefix cap; width decremented by the
            # members actually removed — beyond-cap width remains the
            # conservative collision count it always was). A bucket
            # whose members are all deleted vanishes. After this pass
            # the store is byte-equivalent to one built without the
            # deleted docs, except where a deleted id had evicted
            # another past BUCKET_STORE_CAP (cap 1024 — a documented,
            # fixture-unreachable approximation).
            dels = None
            for dl in del_layers:
                ids = spark.read.parquet(os.path.join(dl, "ids"))
                dels = ids if dels is None else dels.unionByName(ids)
            dels = dels.distinct()
            merged_sets = merged_sets.join(
                F.broadcast(dels), "id", "left_anti"
            )
            mark = dels.select(F.col("id").alias("_did")).withColumn(
                "_del", F.lit(1)
            )
            merged_buckets = (
                merged_buckets.select(
                    "table_id", "mh", "width",
                    F.explode("ids").alias("_did"),
                )
                .join(F.broadcast(mark), "_did", "left")
                .groupBy("table_id", "mh")
                .agg(
                    F.slice(
                        F.sort_array(
                            F.collect_list(
                                F.when(
                                    F.col("_del").isNull(),
                                    F.col("_did"),
                                )
                            )
                        ),
                        1,
                        BUCKET_STORE_CAP,
                    ).alias("ids"),
                    (
                        F.first("width")
                        - F.coalesce(F.sum("_del"), F.lit(0))
                    ).cast("long").alias("width"),
                )
                .filter(F.size("ids") > 0)
            )
        merged_sets.write.mode("overwrite").parquet(
            _versioned(store_dir, "sets", v + 1)
        )
        merged_buckets.write.mode("overwrite").parquet(
            _versioned(store_dir, "buckets", v + 1)
        )
        # The manifest is kept in FOLD order (oldest first): prior order,
        # then this compaction's layers ordered by append time (layer dir
        # mtime, name tiebreak). GC recency must not depend on key
        # spelling — 'day10' sorts before 'day2' lexicographically
        # (ADVICE r11).
        new_keys = [
            os.path.basename(l)
            for l in sorted(layers, key=lambda p: (os.path.getmtime(p), p))
        ]
        prior = _store_manifest_ordered(store_dir)
        folded = prior + [k for k in new_keys if k not in prior]
        new_del_keys = [
            os.path.basename(l)
            for l in sorted(
                del_layers, key=lambda p: (os.path.getmtime(p), p)
            )
        ]
        prior_del = _store_del_manifest(store_dir)
        del_folded = prior_del + [
            k for k in new_del_keys if k not in prior_del
        ]
        # THE commit: new base + both manifests become visible together.
        _commit_pointer(store_dir, v + 1, folded, del_folded=del_folded)
        # Two-phase GC (r15): the old immediate `rmtree(append)` here
        # crashed a concurrent lockless reader mid-scan (reproduced:
        # pytest's dedup_stream_ingest PATH_NOT_FOUND while verify_sweep
        # compacted the shared store). Tombstone in place — folded layers
        # AND the superseded base version; collect past grace on later
        # write passes.
        _tombstone_folded_layers(store_dir, keys=set(new_keys))
        now = time.time()
        # Applied delete layers retire on the same two-phase contract.
        for dl in del_layers:
            _write_json_atomic(
                os.path.join(dl, "superseded.json"), {"ts": now}
            )
        for old in (sets_dir, buckets_dir):
            _write_json_atomic(
                os.path.join(old, "_superseded.json"), {"ts": now}
            )
        _store_gc_superseded(store_dir)
        # Housekeeping on the compaction cadence (VERDICT r11 #5): trim
        # the manifest to the newest $PYCAIM_STORE_GC_KEEP folded keys
        # (default 128 — generous vs. any sane upstream redelivery
        # horizon; 0 disables). Still under this compaction's write lock.
        keep = int(os.environ.get("PYCAIM_STORE_GC_KEEP", "128"))
        if keep > 0:
            _manifest_gc_locked(store_dir, keep)


def minhash_store_manifest_gc(store_dir: str, keep_last: int = 32) -> int:
    """Trim the folded-keys manifest to its ``keep_last`` most recently
    FOLDED ingest keys and return how many were dropped. Recency is fold
    order (the order the compactor appended them — layer append-time
    order, ``_store_manifest_ordered``), never lexicographic key order:
    arbitrary keys don't sort chronologically ('day10' < 'day2'), and
    dropping the wrong end would shrink the replay-idempotency window
    for the keys most likely to be redelivered (ADVICE r11).
    The manifest's only job is replay idempotency (a re-delivered,
    already-folded ingest key no-ops in ``minhash_signature_store_append``),
    so GC trades manifest size for replay window: a key older than the
    retained window would re-append on replay and re-introduce its rows
    as duplicates — run GC with ``keep_last`` ≥ the upstream redelivery
    horizon (e.g. a few times the ingest pipeline's max retry age). At
    one key per daily ingest the un-GC'd manifest grows ~4 KB/decade, so
    this is housekeeping, not a scale requirement. Runs automatically at
    the end of every compaction with ``$PYCAIM_STORE_GC_KEEP`` (default
    128, generous vs. any sane redelivery horizon); this standalone entry
    point exists for explicit housekeeping with a tighter window."""
    with _store_write_lock(store_dir):
        _recover_store_swap(store_dir)
        _store_gc_superseded(store_dir)
        return _manifest_gc_locked(store_dir, keep_last)


def _manifest_gc_locked(store_dir: str, keep_last: int) -> int:
    """GC body, caller holds the write lock (compaction tail-calls this
    inside its own lock — flock on the same fd is not reentrant). On a
    pointer-committed store the trim rewrites the pointer in place
    (same base version, shorter folded list — still one atomic doc);
    the legacy-file branch only runs for unmigrated stores."""
    keys = _store_manifest_ordered(store_dir)
    if len(keys) <= keep_last:
        return 0
    kept = keys[-keep_last:] if keep_last > 0 else []
    ptr = _load_pointer(store_dir)
    if ptr is not None:
        _commit_pointer(store_dir, ptr["version"], kept)
    else:
        _write_json_atomic(
            os.path.join(store_dir, "folded_keys.json"), kept
        )
    return len(keys) - len(kept)


def incremental_minhash_dedup_layered(
    spark,
    store_dir: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 8,
    max_jaccard_dist: float = 0.8,
    seed: int = 42,
    max_candidates_per_doc: int = 64,
) -> DataFrame:
    """The stored probe, but against base + any un-compacted append
    layers — so a slice ingested this morning dedups against a slice
    appended an hour ago without waiting for compaction. Layer band rows
    are bucket-aggregated on the fly and probed ALONGSIDE the base
    buckets — both sides stream through broadcast hash joins against the
    delta and merge per hit (``_incremental_matches`` ``extra_buckets``;
    merge-stable cap), so the base bucket index never shuffles here (the
    old pre-join ``_merge_bucket_layers`` full-outer reshuffled the
    whole base index per probe — caught by the r11 per-batch stream plan
    assert; that merge now runs only inside compaction, where it
    belongs). Verdicts equal a probe of the compacted store, asserted in
    tests/test_llm_ops.py. Read-only: a mid-swap store resolves via
    ``_store_read_view`` — the new base plus only the layers it does NOT
    already contain — instead of being healed in place (ADVICE r10)."""
    sets_path, buckets_path, skip_keys = _store_read_view(store_dir)
    b_sets = spark.read.parquet(sets_path)
    store_buckets = spark.read.parquet(buckets_path)
    pending = None
    for l in _store_layer_dirs(store_dir):
        if os.path.basename(l) in skip_keys:
            continue
        b_sets = b_sets.unionByName(
            spark.read.parquet(os.path.join(l, "sets"))
        )
        bands = spark.read.parquet(os.path.join(l, "bands"))
        pending = bands if pending is None else pending.unionByName(bands)
    # Pending deletions (r18): sets-side anti-join + pre-cap candidate
    # filter — see `incremental_minhash_dedup_stored`. Applies to base
    # AND layer signatures (a doc appended then deleted must not match
    # either).
    dels = _store_deleted_ids(spark, store_dir)
    if dels is not None:
        b_sets = b_sets.join(F.broadcast(dels), "id", "left_anti")
    return _incremental_probe(
        b_sets, store_buckets, delta_docs, text_col, id_col, shingle_n,
        num_hashes, max_jaccard_dist, seed, max_candidates_per_doc,
        extra_buckets=None if pending is None else _band_buckets(pending),
        deleted_ids=_deleted_ids_for_probe(dels),
    )


def stream_ingest_dedup(
    spark,
    base_docs: DataFrame,
    slices: list[DataFrame],
    work_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    plan_sink: list | None = None,
) -> DataFrame:
    """The signature-store ingestion loop AS A STREAM: stage each slice
    as a file with ordered mtimes, consume one file per trigger under
    availableNow, and inside ``foreachBatch`` probe the store (base +
    every earlier batch's append layer), write verdicts to a per-batch
    dir (idempotent on replay), and append the batch's accepted docs'
    signatures so the NEXT batch dedups against this one — cross-batch
    state no pure per-batch job carries. Returns all verdicts
    ``(doc_id, dup_of, best_dist, is_new, batch_id)`` re-read from the
    sink. foreachBatch runs driver-side, so the store helpers close over
    the live SparkSession safely. ``plan_sink``, when given, collects
    each micro-batch probe's formatted plan so tests can assert the
    per-batch shape (base side broadcast-probed, never shuffle-joined —
    the same steady-state contract as the stored probe)."""
    import shutil

    shutil.rmtree(work_dir, ignore_errors=True)
    store = os.path.join(work_dir, "store")
    minhash_signature_store_build(
        base_docs, store, text_col=text_col, id_col=id_col
    )

    src = os.path.join(work_dir, "incoming")
    for i, sl in enumerate(slices):
        sub = os.path.join(src, f"slice{i}")
        sl.coalesce(1).write.mode("overwrite").parquet(sub)
        # FileStreamSource orders by modification time: pin mtimes so
        # slices become micro-batches in list order.
        t0 = 1_000_000_000 + i * 1_000_000
        for f in os.listdir(sub):
            if f.endswith(".parquet"):
                os.utime(os.path.join(sub, f), (t0, t0))

    verdicts_dir = os.path.join(work_dir, "verdicts")

    def _probe_and_append(batch_df, batch_id):
        v = incremental_minhash_dedup_layered(
            spark, store, batch_df, text_col=text_col, id_col=id_col
        )
        if plan_sink is not None:
            plan_sink.append(
                v._sc._jvm.PythonSQLUtils.explainString(
                    v._jdf.queryExecution(), "formatted"
                )
            )
        v.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(os.path.join(verdicts_dir, f"batch{batch_id}"))
        accepted = batch_df.join(
            v.filter(F.col("is_new") == 1).select(id_col), id_col
        )
        minhash_signature_store_append(
            spark, store, accepted, f"batch{batch_id}",
            text_col=text_col, id_col=id_col,
        )

    stream = (
        spark.readStream.schema(slices[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "slice*"))
    )
    q = (
        stream.writeStream.foreachBatch(_probe_and_append)
        .option("checkpointLocation", os.path.join(work_dir, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.option("basePath", verdicts_dir).parquet(
        os.path.join(verdicts_dir, "batch*")
    )


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
