"""Distributed connected components — the clustering step that turns
near-duplicate candidate PAIRS into dedup GROUPS (pick one canonical doc
per group, drop the rest).

Algorithm: iterative min-label propagation over the symmetrized edge set.
Every node starts labeled with its own id; each round replaces a node's
label with the minimum label in its closed neighborhood. Converges to
"label = min node id in my component" within graph-diameter rounds —
near-dup clusters are almost-cliques (diameter ≤ ~3), so 3-4 rounds in
practice. Deterministic regardless of partitioning: min is associative and
commutative.

Scale posture: each round is one equi-join + one groupBy on node id (two
shuffles over (long, long) rows — no payload columns). Lineage is
truncated per round with localCheckpoint, the standard guard for
iterative DataFrame algorithms (without it the plan doubles every round).
The driver only ever sees one scalar per round (the changed-label count);
labels never collect. For graphs with giant skewed components, swap the
propagation step for the large-star/small-star variant — the loop
skeleton stays the same.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` may be directed/deduped or not — it is symmetrized and
    deduplicated here. Nodes with no edges are absent from the output
    (callers coalesce to self-labels).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        # A component with eccentricity > max_iter would otherwise return
        # silently-wrong labels (long near-dup chains at production scale).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or use "
            "connected_components_star for high-diameter graphs"
        )
    return labels.select("node", F.col("label").alias("component"))


def _min_neighbor(sym: DataFrame) -> DataFrame:
    """m(u) = min(Γ(u) ∪ {u}) for every node of a symmetrized edge set."""
    return (
        sym.groupBy("a")
        .agg(F.min("b").alias("nmin"))
        .select("a", F.least(F.col("a"), F.col("nmin")).alias("m"))
    )


def _star_round(sym: DataFrame, keep_larger: bool) -> DataFrame:
    """One large-star (keep_larger) or small-star step.

    large-star: for each u, rewire every neighbor v > u to m(u).
    small-star: for each u, rewire every neighbor v ≤ u, and u itself,
    to m(u). Both emit (child, parent) with child > parent, deduped.
    """
    m = _min_neighbor(sym)
    joined = sym.join(m, "a")
    if keep_larger:
        moved = joined.filter(F.col("b") > F.col("a")).select(
            F.col("b").alias("child"), F.col("m").alias("parent")
        )
    else:
        moved = (
            joined.filter(F.col("b") <= F.col("a"))
            .select(F.col("b").alias("child"), F.col("m").alias("parent"))
            .union(joined.select(F.col("a").alias("child"), F.col("m").alias("parent")))
        )
    return (
        moved.filter(F.col("child") != F.col("parent"))
        .distinct()
        .select(F.col("child").alias("a"), F.col("parent").alias("b"))
        .union(
            moved.filter(F.col("child") != F.col("parent"))
            .distinct()
            .select(F.col("parent").alias("a"), F.col("child").alias("b"))
        )
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the 100 TB scale path.

    Converges in O(log² n) rounds regardless of graph DIAMETER, unlike
    min-label propagation's O(diameter): a million-node chain finishes in
    ~20 rounds instead of a million. Each round is two small shuffles over
    (long, long) edge rows — per-node neighborhood minima via groupBy
    (never a collect_list, so hub nodes cannot blow up a task) and an
    equi-join to rewire children to their star root. Same output contract
    as :func:`connected_components`: (node, component=min reachable id);
    isolated nodes absent.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = sym.select(F.col("a").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    prev_sig = None
    for _ in range(max_iter):
        sym = _star_round(sym, keep_larger=True)
        sym = _star_round(sym, keep_larger=False).localCheckpoint(eager=True)
        # Convergence: the edge set is a fixed point (stars pointing at
        # roots). One tiny agg per round; deterministic order-free check.
        sig = sym.agg(
            F.count(F.lit(1)).alias("n"),
            # XOR-fold, not SUM: order-free like sum but cannot overflow
            # (ANSI mode makes bigint-sum overflow a runtime error).
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds (theoretical bound is O(log² n) ≈ a few dozen)"
        )
    # Converged edge set is a star forest: every edge (child, root) with
    # root = component min. Children label from their root; roots label
    # themselves.
    child_labels = sym.filter(F.col("a") > F.col("b")).select(
        F.col("a").alias("node"), F.col("b").alias("component")
    )
    root_labels = all_nodes.join(
        child_labels.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return child_labels.union(root_labels)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 8,
) -> DataFrame:
    """PageRank over the symmetrized edge set: (node, rank) after a fixed
    ``n_iter`` power iterations, rank mass summing to 1.

    The iterative-algorithm pattern beyond connected components: per
    round, every node's rank splits evenly among its neighbors and each
    node collects base + damping · Σ incoming — one equi-join plus one
    groupBy on node id per round, lineage truncated with localCheckpoint
    (same skeleton and 100 TB posture as ``connected_components``; the
    driver never sees a row). Symmetrization means no dangling nodes
    (every node in the edge set has degree ≥ 1), so no dangling-mass
    redistribution term is needed. Fixed iteration count, not a
    convergence test: deterministic round structure and one less
    driver-side scalar per round; 8 rounds bound the power-iteration
    error at damping 0.85 to ~0.85⁸ ≈ 0.27 of the initial gap, plenty to
    rank near-dup hubs (exact tolerances asserted against the NumPy twin
    in tests/test_llm_ops.py).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("a").alias("node"), "deg")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        rd = ranks.join(nodes, "node")
        contribs = (
            sym.join(rd, sym.b == rd.node)
            .groupBy("a")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            nodes.select("node")
            .join(contribs, nodes.node == contribs.a, "left")
            .select(
                "node",
                (F.lit(base) + damping * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
