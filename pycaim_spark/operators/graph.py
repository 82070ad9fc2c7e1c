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
            f"({changed} labels still changing); raise max_iter or switch "
            "to the large-star/small-star variant for high-diameter graphs"
        )
    return labels.select("node", F.col("label").alias("component"))
