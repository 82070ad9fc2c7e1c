"""CAIM decomposed into oracle-checkable dataflow operators (SURVEY.md §2.A)
plus the end-to-end estimator queries (rows-only; property-tested against
the paper-literal NumPy oracle in tests/test_caim.py).

Fixture mapping: feature = events.value, supervised label = events.event_type
(FIXTURES.md). The fixed demo cut scheme {100, 200, 300} exercises the
bucketize/quanta/criterion pipeline with stable, hash-checkable results.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pycaim_spark.catalog import load_table
from pycaim_spark.registry import register

_CUTS = [100.0, 200.0, 300.0]

# bucket id = 1 + #{cuts < v}: value exactly on a cut falls LEFT, matching
# the paper's (prev, cut] intervals and core.bucketize_value.
_BUCKET_SQL = """
    CASE WHEN value <= 100.0 THEN 1
         WHEN value <= 200.0 THEN 2
         WHEN value <= 300.0 THEN 3
         ELSE 4 END
"""


def _bucket_col():
    arr = F.array(*[F.lit(c) for c in _CUTS])
    return F.size(F.filter(arr, lambda c: c < F.col("value"))) + F.lit(1)


@register(
    "caim_distinct_sorted",
    tags=("caim",),
    oracle="SELECT DISTINCT value AS v FROM events ORDER BY v",
)
def caim_distinct_sorted(spark, sf_dir):
    """Sorted distinct feature values — CAIM step 1 (SURVEY §2.A)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(F.col("value").alias("v")).distinct().orderBy("v")


@register(
    "caim_candidates",
    tags=("caim",),
    oracle="""
    SELECT (v + prev_v) / 2 AS midpoint
    FROM (SELECT v, LAG(v) OVER (ORDER BY v) AS prev_v
          FROM (SELECT DISTINCT value AS v FROM events))
    WHERE prev_v IS NOT NULL
    """,
)
def caim_candidates(spark, sf_dir):
    """Candidate boundaries = midpoints of consecutive distinct values —
    CAIM step 2 (SURVEY §2.A), via a lag window.

    The global-order window runs on one partition — fine here because the
    input is already the deduplicated value domain (bounded), never raw
    rows; the estimator's fit path never materializes this globally.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    distinct = ev.select(F.col("value").alias("v")).distinct()
    w = Window.orderBy("v")
    return (
        distinct.withColumn("prev_v", F.lag("v").over(w))
        .filter(F.col("prev_v").isNotNull())
        .select(((F.col("v") + F.col("prev_v")) / 2).alias("midpoint"))
    )


@register(
    "caim_bucketize",
    tags=("caim",),
    oracle=f"SELECT event_id, {_BUCKET_SQL} AS bucket FROM events",
)
def caim_bucketize(spark, sf_dir):
    """Interval assignment for a fixed cut scheme (SURVEY §2.A).

    Implemented as a higher-order filter over the literal cut array —
    identical codegen shape to CaimDiscretizerModel.transform.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", _bucket_col().cast("int").alias("bucket"))


@register(
    "caim_quanta",
    tags=("caim",),
    oracle=f"""
    SELECT {_BUCKET_SQL} AS bucket, event_type, COUNT(*) AS q
    FROM events
    GROUP BY bucket, event_type
    """,
)
def caim_quanta(spark, sf_dir):
    """Quanta matrix q_ir in long form: (interval, class) → count
    (SURVEY §2.A caim_quanta)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(_bucket_col().cast("int").alias("bucket"), "event_type")
        .groupBy("bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("q"))
    )


@register(
    "caim_criterion",
    tags=("caim",),
    oracle=f"""
    WITH q AS (
        SELECT {_BUCKET_SQL} AS bucket, event_type, COUNT(*) AS c
        FROM events GROUP BY bucket, event_type
    ), seg AS (
        SELECT bucket, MAX(c) AS mx, SUM(c) AS tot FROM q GROUP BY bucket
    )
    SELECT CAST(SUM(CAST(round(CAST(mx * mx AS DOUBLE) / tot, 6)
                         AS DECIMAL(18,6))) AS DOUBLE) / 4 AS caim_value
    FROM seg
    """,
)
def caim_criterion(spark, sf_dir):
    """CAIM(C,D|F) = (1/n)·Σ max_r²/M_+r for the fixed scheme (SURVEY §2.A).

    n is the TOTAL interval count of the scheme (literal 4 for cuts
    {100,200,300}), matching paper eq. 2 and core.caim_value — an empty
    interval contributes a zero term but still counts in the denominator.
    Per-interval terms are rounded then decimal-summed so the tiny final
    reduction is order-independent (exact-decimal policy).
    """
    ev = load_table(spark, sf_dir, "events")
    q = (
        ev.select(_bucket_col().cast("int").alias("bucket"), "event_type")
        .groupBy("bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    seg = q.groupBy("bucket").agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
    term = F.round((F.col("mx") * F.col("mx")).cast("double") / F.col("tot"), 6)
    n_intervals = len(_CUTS) + 1
    return seg.select(term.cast("decimal(18,6)").alias("term")).agg(
        (F.sum("term").cast("double") / F.lit(n_intervals)).alias("caim_value")
    )


@register(
    "caim_fit",
    tags=("caim", "flagship"),
    rows_only_reason="iterative greedy fit (one Spark job per round family) is "
    "not a single SQL query; correctness is property-tested against the "
    "paper-literal NumPy oracle in tests/test_caim.py",
)
def caim_fit(spark, sf_dir):
    """End-to-end distributed CAIM fit on events(value | event_type):
    returns the learned cut points as rows (SURVEY §2.A caim_fit)."""
    from pycaim_spark.operators.caim import CaimDiscretizer

    ev = load_table(spark, sf_dir, "events")
    model = CaimDiscretizer(inputCols=["value"], labelCol="event_type").fit(ev)
    cuts = model.cuts["value"]
    if not cuts:
        return spark.createDataFrame([], "cut_index int, cut_value double")
    # VALUES → LocalRelation: materializing the tiny result is one local
    # task, not a defaultParallelism-wide parallelize job. repr(float)
    # round-trips exactly through Spark's double parser.
    rows = ", ".join(
        f"({i + 1}, CAST('{float(c)!r}' AS DOUBLE))" for i, c in enumerate(cuts)
    )
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(cut_index, cut_value)")


@register(
    "caim_incremental_fit",
    tags=("caim", "incremental", "sink"),
    rows_only_reason="iterative greedy over a persisted side-effect "
    "histogram store; tests/test_caim.py asserts cut IDENTITY with a "
    "full refit over base ∪ delta (histogram merging is exact)",
)
def caim_incremental_fit(spark, sf_dir):
    """Incremental CAIM refit: the (feature, value, label, cnt) histogram
    — Strategy B's mergeable pre-aggregation state — is persisted once
    for the base corpus (event_id % 10 != 0); the daily slice merges its
    delta histogram in (union + groupBy SUM, exact) and the greedy reruns
    on merged state whose size tracks distinct values, never corpus rows
    (operators/caim/estimator.py caim_incremental_fit). Cuts are
    identical to a full refit over all events. The reference-core
    operator in the same daily-ingest shape as the dedup family."""
    import os
    import shutil

    from pycaim_spark.catalog import parquet_row_count
    from pycaim_spark.operators.caim.estimator import caim_incremental_fit
    from pycaim_spark.streaming.runner import _SCRATCH

    ev = load_table(spark, sf_dir, "events")
    store = os.path.join(
        _SCRATCH,
        f"caimhist_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{parquet_row_count(sf_dir, 'events')}",
    )
    # The registered query must be idempotent across runs, but a merge
    # mutates the store — rebuild the base state each run (cheap: the
    # histogram build is one aggregation over the fixture).
    shutil.rmtree(store, ignore_errors=True)
    cuts = caim_incremental_fit(
        spark,
        store,
        ev.filter(F.col("event_id") % 10 != 0),
        ev.filter(F.col("event_id") % 10 == 0),
        ["value"],
        "event_type",
    )["value"]
    if not cuts:
        return spark.createDataFrame([], "cut_index int, cut_value double")
    rows = ", ".join(
        f"({i + 1}, CAST('{float(c)!r}' AS DOUBLE))" for i, c in enumerate(cuts)
    )
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(cut_index, cut_value)")


@register(
    "caim_transform",
    tags=("caim",),
    rows_only_reason="output depends on the iteratively-fitted cuts; bucket "
    "semantics are property-tested vs NumPy searchsorted in tests/test_caim.py",
)
def caim_transform(spark, sf_dir):
    """Fit + transform: ordinal interval ids for every event (SURVEY §2.A)."""
    from pycaim_spark.operators.caim import CaimDiscretizer

    ev = load_table(spark, sf_dir, "events")
    model = CaimDiscretizer(inputCols=["value"], labelCol="event_type").fit(ev)
    return model.transform(ev).select("event_id", "value", "value_bin")


@register(
    "caim_mllib_stage",
    tags=("caim",),
    rows_only_reason="MLlib Pipeline integration demo over embedding dims; "
    "cut semantics covered by the caim_fit property tests",
)
def caim_mllib_stage(spark, sf_dir):
    """CAIM inside a pyspark.ml Pipeline, discretizing the first four
    embedding dimensions against the supervised label (SURVEY §2.C
    caim_mllib_stage; BASELINE.json's 'MLlib custom transformer')."""
    from pyspark.ml import Pipeline

    from pycaim_spark.operators.caim import CaimDiscretizer

    emb = load_table(spark, sf_dir, "embeddings")
    dims = [F.col("embedding")[i].cast("double").alias(f"dim_{i}") for i in range(4)]
    flat = emb.select("vec_id", *dims, "label")
    pipe = Pipeline(
        stages=[
            CaimDiscretizer(
                inputCols=[f"dim_{i}" for i in range(4)], labelCol="label"
            )
        ]
    )
    fitted = pipe.fit(flat)
    return fitted.transform(flat).select(
        "vec_id", *[f"dim_{i}_bin" for i in range(4)]
    )
