"""CAIM fit Strategy A: driver-orchestrated, fully distributed greedy
(SURVEY.md §3.2) — for features whose (value × class) histogram must NOT be
collected to a single worker (ultra-high cardinality at 100 TB).

Per greedy round, ONE Spark job scores every remaining candidate boundary:

1. The distributed histogram (value, c_class0..c_classS, cnt) — built once,
   cached — is bucketed by the current cuts (literal broadcast).
2. Within each bucket ordered by value, per-class running sums give the
   left-part quanta of the split after each value; bucket totals (window)
   give the right part by subtraction.
3. The candidate's CAIM = (Σ other-bucket terms + left_term + right_term)
   / (k+1); other-bucket terms are a k-row aggregate collected to the
   driver (k = current interval count, always tiny).
4. argmax+tie-break = orderBy(score DESC, value ASC).limit(1) — one row
   back to the driver per round.

Driver round-trips = accepted cuts (≈ #classes), each a linear scan of the
histogram — never O(candidates²) and never a single-node histogram.

Numerical note: scores here are computed with a different float-addition
order than the NumPy core, so in exact-tie cases the chosen cut could
differ; ties require bit-equal CAIM scores across distinct candidates,
which the property tests show does not occur on the fixtures (cuts match
Strategy B exactly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _bucket_expr(cuts: list[float]):
    if not cuts:
        return F.lit(0)
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    return F.size(F.filter(arr, lambda c: c < F.col("value")))


def fit_feature_distributed(
    melted: DataFrame,
    min_intervals: int | None = None,
    max_rounds: int = 64,
) -> list[float]:
    """Fit CAIM cuts for one feature from (value double, label string) rows
    without ever collecting the value histogram.

    Returns sorted interior cut points.
    """
    labels = sorted(
        r["label"] for r in melted.select("label").distinct().collect()
    )
    n_classes = len(labels)
    if min_intervals is None:
        min_intervals = n_classes

    # Distributed histogram, pivoted to one column per class; built once.
    # Pivoted columns come out in the order of the `labels` list after the
    # groupBy key; they are re-selected by backtick-QUOTED name so a label
    # containing '.' or '`' cannot mis-parse as a nested-field reference.
    pivoted = melted.groupBy("value").pivot("label", labels).count().na.fill(0)

    def _quoted(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    hist = (
        pivoted.select(
            "value",
            *[
                _quoted(pivoted.columns[i + 1]).cast("long").alias(f"c{i}")
                for i in range(len(labels))
            ],
        )
        .cache()
    )
    ccols = [f"c{i}" for i in range(n_classes)]
    try:
        m = hist.count()  # materializes the cache
        if m < 2:
            return []

        cuts: list[float] = []
        global_caim = 0.0
        for _ in range(max_rounds):
            k = len(cuts) + 1
            bucketed = hist.withColumn("b", _bucket_expr(cuts))

            # Per-bucket class totals → per-bucket terms (tiny: k rows).
            # Sorted by bucket id so the float fold order of `base` is fixed
            # regardless of partitioning/collect order (determinism contract:
            # an exact CAIM-score tie must break identically across reruns).
            seg = sorted(
                bucketed.groupBy("b").agg(
                    *[F.sum(c).alias(c) for c in ccols]
                ).collect(),
                key=lambda r: r["b"],
            )
            seg_tot = {r["b"]: sum(r[c] for c in ccols) for r in seg}
            seg_term = {
                r["b"]: float(max(r[c] for c in ccols)) ** 2 / sum(r[c] for c in ccols)
                for r in seg
            }
            base = sum(seg_term.values())

            w_run = Window.partitionBy("b").orderBy("value").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            w_all = Window.partitionBy("b")
            run = bucketed.select(
                "value",
                "b",
                *[F.sum(c).over(w_run).alias(f"l{i}") for i, c in enumerate(ccols)],
                *[F.sum(c).over(w_all).alias(f"t{i}") for i, c in enumerate(ccols)],
            )
            lcols = [f"l{i}" for i in range(n_classes)]
            tcols = [f"t{i}" for i in range(n_classes)]
            ltot = sum(F.col(c) for c in lcols)
            ttot = sum(F.col(c) for c in tcols)
            rtot = ttot - ltot
            lmax = F.greatest(*lcols) if n_classes > 1 else F.col(lcols[0])
            rmax = (
                F.greatest(*[F.col(t) - F.col(l) for t, l in zip(tcols, lcols)])
                if n_classes > 1
                else F.col(tcols[0]) - F.col(lcols[0])
            )
            term_new = (
                lmax.cast("double") * lmax.cast("double") / ltot.cast("double")
                + rmax.cast("double") * rmax.cast("double") / rtot.cast("double")
            )
            # Subtract the current bucket's own term via a literal map.
            base_minus = F.lit(base) - F.element_at(
                F.create_map(
                    *[x for b, t in seg_term.items() for x in (F.lit(b), F.lit(t))]
                ),
                F.col("b"),
            )
            scored = (
                run.filter(rtot > 0)  # last row of a bucket is not a split
                .select(
                    "value",
                    ((base_minus + term_new) / F.lit(float(k + 1))).alias("caim"),
                )
            )
            best = scored.orderBy(F.col("caim").desc(), F.col("value")).limit(1).collect()
            if not best:
                break
            best_caim = float(best[0]["caim"])
            best_value = float(best[0]["value"])
            if best_caim > global_caim or k < min_intervals:
                # Cut = midpoint between best_value and the next distinct
                # value (one more tiny job: min value above the boundary).
                nxt = (
                    hist.filter(F.col("value") > best_value)
                    .agg(F.min("value"))
                    .collect()[0][0]
                )
                if nxt is None:
                    break
                cuts.append((best_value + float(nxt)) / 2.0)
                cuts.sort()
                global_caim = best_caim
            else:
                break
        return cuts
    finally:
        hist.unpersist()
