"""CAIM property tests (SURVEY.md §5.2): the vectorized histogram greedy and
the distributed Spark estimator must reproduce the paper-literal naive
implementation exactly, and documented invariants must hold."""

from __future__ import annotations

import numpy as np
import pytest

from pycaim_spark.operators.caim.core import (
    bucketize_value,
    caim_greedy,
    caim_value,
    histogram_from_arrays,
)
from pycaim_spark.operators.caim.estimator import (
    CaimDiscretizer,
    _compress_histogram,
)
from pycaim_spark.operators.caim.reference import naive_caim_fit


def _random_dataset(rng, n, n_classes, grid):
    """Small datasets on a coarse value grid — forces ties and duplicate
    values, the hard determinism cases."""
    x = rng.choice(grid, size=n)
    y = rng.integers(0, n_classes, size=n)
    return x.astype(float), y


@pytest.mark.parametrize("seed", range(12))
def test_vectorized_greedy_matches_naive_reference(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 120))
    n_classes = int(rng.integers(2, 5))
    grid = np.arange(int(rng.integers(3, 25))) * 0.5
    x, y = _random_dataset(rng, n, n_classes, grid)
    expected = naive_caim_fit(x, y)
    values, counts, _ = histogram_from_arrays(x, y)
    got = caim_greedy(values, counts)
    assert np.array_equal(got, expected), f"seed={seed}: {got} vs {expected}"


@pytest.mark.parametrize("seed", range(6))
def test_invariants(seed):
    rng = np.random.default_rng(100 + seed)
    x, y = _random_dataset(rng, 200, 3, np.linspace(0, 10, 40))
    values, counts, _ = histogram_from_arrays(x, y)
    cuts = caim_greedy(values, counts)
    # cuts strictly increasing, interior to the value range
    assert np.all(np.diff(cuts) > 0)
    if len(cuts):
        assert values[0] < cuts[0] and cuts[-1] < values[-1]
    # at least S intervals when enough distinct values exist
    n_classes = counts.shape[1]
    if len(values) >= n_classes:
        assert len(cuts) + 1 >= n_classes
    # the accepted scheme has positive CAIM
    buckets = np.searchsorted(cuts, values, side="left")
    q = np.zeros((len(cuts) + 1, n_classes), dtype=np.int64)
    for b, row in zip(buckets, counts):
        q[b] += row
    assert caim_value(q) > 0


def test_single_distinct_value_yields_no_cuts():
    values, counts, _ = histogram_from_arrays(np.array([5.0] * 10), np.array([0, 1] * 5))
    assert len(caim_greedy(values, counts)) == 0


def test_bucketize_edges():
    cuts = np.array([1.0, 2.0, 3.0])
    # value exactly on a cut falls LEFT: (prev, cut]
    assert bucketize_value(1.0, cuts) == 1
    assert bucketize_value(2.0, cuts) == 2
    assert bucketize_value(1.5, cuts) == 2
    assert bucketize_value(0.0, cuts) == 1   # clamp below
    assert bucketize_value(99.0, cuts) == 4  # clamp above


def test_compress_histogram_preserves_mass():
    rng = np.random.default_rng(7)
    values = np.sort(rng.uniform(0, 100, 5000))
    counts = rng.integers(1, 10, size=(5000, 3))
    cv, cc = _compress_histogram(values, counts, 100)
    assert cc.sum() == counts.sum()
    assert len(cv) <= 100
    assert np.all(np.diff(cv) > 0)


def test_spark_estimator_matches_numpy_on_events(spark, sf_dir):
    from pycaim_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    pdf = ev.select("value", "event_type").toPandas()
    values, counts, _ = histogram_from_arrays(
        pdf["value"].to_numpy(), pdf["event_type"].to_numpy()
    )
    expected = caim_greedy(values, counts)

    model = CaimDiscretizer(inputCols=["value"], labelCol="event_type").fit(ev)
    got = np.array(model.cuts["value"])
    assert np.array_equal(got, expected), f"{got} vs {expected}"

    # transform parity with NumPy searchsorted on every row
    rows = model.transform(ev).select("value", "value_bin").collect()
    for r in rows:
        assert r.value_bin == bucketize_value(r.value, got)


def test_strategy_a_matches_strategy_b_and_numpy(spark, sf_dir):
    """The fully-distributed Strategy A greedy (one Spark job per round)
    must learn the same cuts as the histogram Strategy B and the NumPy
    core on the events fixture."""
    from pycaim_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    pdf = ev.select("value", "event_type").toPandas()
    values, counts, _ = histogram_from_arrays(
        pdf["value"].to_numpy(), pdf["event_type"].to_numpy()
    )
    expected = caim_greedy(values, counts)

    model_a = CaimDiscretizer(
        inputCols=["value"], labelCol="event_type", strategy="jobs"
    ).fit(ev)
    assert np.array_equal(np.array(model_a.cuts["value"]), expected), (
        f"{model_a.cuts['value']} vs {expected}"
    )


def test_model_cuts_persistence_roundtrip(spark, sf_dir, tmp_path):
    from pycaim_spark.catalog import load_table
    from pycaim_spark.operators.caim.estimator import CaimDiscretizerModel

    ev = load_table(spark, sf_dir, "events")
    model = CaimDiscretizer(inputCols=["value"], labelCol="event_type").fit(ev)
    path = str(tmp_path / "cuts.json")
    model.save_cuts(path)
    loaded = CaimDiscretizerModel.load_cuts(path)
    assert loaded.cuts == model.cuts
    a = model.transform(ev).select("event_id", "value_bin").collect()
    b = loaded.transform(ev).select("event_id", "value_bin").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_spark_estimator_multifeature_pipeline(spark, sf_dir):
    from pycaim_spark.catalog import load_table
    import pyspark.sql.functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        F.col("embedding")[0].cast("double").alias("d0"),
        F.col("embedding")[1].cast("double").alias("d1"),
        "label",
    )
    model = CaimDiscretizer(inputCols=["d0", "d1"], labelCol="label").fit(flat)
    assert set(model.cuts) == {"d0", "d1"}
    for feature in ("d0", "d1"):
        pdf = flat.select(feature, "label").toPandas()
        values, counts, _ = histogram_from_arrays(
            pdf[feature].to_numpy(), pdf["label"].to_numpy()
        )
        assert np.array_equal(np.array(model.cuts[feature]), caim_greedy(values, counts))
