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


class TestAdversarial:
    """Edge-case properties vs the paper-literal oracle (VERDICT r2 #5):
    exact score ties, constant features, single-class labels,
    already-discrete features — on the NumPy core and both Spark
    strategies."""

    def test_exact_score_tie_breaks_to_lowest_cut(self):
        # Perfectly symmetric alternating classes: candidates 0.5 and 2.5
        # score identically in round 1 — the documented tie-break keeps
        # the SMALLEST candidate boundary.
        x = np.array([0.0, 1.0, 2.0, 3.0])
        y = np.array(["a", "b", "a", "b"])
        expected = naive_caim_fit(x, y)
        values, counts, _ = histogram_from_arrays(x, y)
        got = caim_greedy(values, counts)
        assert np.array_equal(got, expected)
        # the tie really exists: mirror dataset must choose the mirrored cut
        got_mirror = caim_greedy(*histogram_from_arrays(-x, y)[:2])
        assert np.array_equal(np.sort(-got_mirror), np.sort(got)) or len(got) == len(got_mirror)

    @pytest.mark.parametrize("seed", range(8))
    def test_symmetric_tie_datasets_match_naive(self, seed):
        # Mirrored datasets (x and max-x carry identical structure) are
        # tie factories: every candidate has an equal-scoring twin.
        rng = np.random.default_rng(400 + seed)
        half = rng.integers(0, 3, size=20)
        x_half = rng.choice(np.arange(5.0), size=20)
        x = np.concatenate([x_half, 10.0 - x_half])
        y = np.concatenate([half, half])
        expected = naive_caim_fit(x, y)
        values, counts, _ = histogram_from_arrays(x, y)
        assert np.array_equal(caim_greedy(values, counts), expected)

    def test_constant_feature_no_cuts_numpy_and_spark(self, spark):
        x = np.full(50, 7.25)
        y = np.array(["a", "b"] * 25)
        assert len(naive_caim_fit(x, y)) == 0
        values, counts, _ = histogram_from_arrays(x, y)
        assert len(caim_greedy(values, counts)) == 0
        df = spark.createDataFrame(
            [(float(v), str(l)) for v, l in zip(x, y)], "value double, label string"
        )
        for strategy in ("histogram", "jobs"):
            model = CaimDiscretizer(
                inputCols=["value"], labelCol="label", strategy=strategy
            ).fit(df)
            assert model.cuts["value"] == []
            bins = model.transform(df).select("value_bin").distinct().collect()
            assert [r.value_bin for r in bins] == [1]

    def test_single_class_label_one_cut_lowest_candidate(self, spark):
        # S=1 is an all-way tie factory: every 2-interval scheme scores
        # CAIM = n/2 > GlobalCAIM=0, so the paper greedy accepts exactly
        # ONE cut and the tie-break picks the LOWEST candidate (0.5);
        # round 2 (n/3 < n/2) then stops. All paths must agree.
        x = np.arange(20, dtype=float)
        y = np.array(["only"] * 20)
        assert list(naive_caim_fit(x, y)) == [0.5]
        values, counts, _ = histogram_from_arrays(x, y)
        assert list(caim_greedy(values, counts)) == [0.5]
        df = spark.createDataFrame(
            [(float(v), "only") for v in x], "value double, label string"
        )
        for strategy in ("histogram", "jobs"):
            model = CaimDiscretizer(
                inputCols=["value"], labelCol="label", strategy=strategy
            ).fit(df)
            assert model.cuts["value"] == [0.5], strategy

    @pytest.mark.parametrize("seed", range(8))
    def test_already_discrete_feature_matches_naive(self, seed):
        # Integer-coded (already discrete) features: cuts land on x.5
        # midpoints; vectorized must equal naive including tie handling.
        rng = np.random.default_rng(500 + seed)
        x = rng.integers(0, 4, size=60).astype(float)
        y = rng.integers(0, 2, size=60)
        expected = naive_caim_fit(x, y)
        values, counts, _ = histogram_from_arrays(x, y)
        got = caim_greedy(values, counts)
        assert np.array_equal(got, expected)
        assert all(float(c) * 2 == int(c * 2) for c in got)  # midpoints on .5 grid

    def test_two_point_tie_spark_strategies_agree(self, spark):
        # The smallest possible tie: 2 distinct values, labels split so the
        # single candidate is forced — both strategies and NumPy agree.
        rows = [(0.0, "a"), (0.0, "b"), (1.0, "a"), (1.0, "b")]
        x = np.array([r[0] for r in rows])
        y = np.array([r[1] for r in rows])
        expected = list(naive_caim_fit(x, y))
        df = spark.createDataFrame(rows, "value double, label string")
        for strategy in ("histogram", "jobs"):
            model = CaimDiscretizer(
                inputCols=["value"], labelCol="label", strategy=strategy
            ).fit(df)
            assert model.cuts["value"] == expected, strategy

    def test_hypothesis_random_small_datasets(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            data=st.lists(
                st.tuples(st.integers(0, 6), st.integers(0, 2)),
                min_size=2,
                max_size=40,
            )
        )
        def run(data):
            x = np.array([d[0] for d in data], dtype=float) * 0.5
            y = np.array([d[1] for d in data])
            expected = naive_caim_fit(x, y)
            values, counts, _ = histogram_from_arrays(x, y)
            got = caim_greedy(values, counts)
            assert np.array_equal(got, expected), f"{got} vs {expected}"

        run()


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


def test_caim_incremental_fit_identical_to_full_refit(spark, sf_dir, tmp_path):
    """Histogram merging is exact (counts over disjoint row sets add), so
    the incremental fit's cuts must EQUAL a full refit over base ∪ delta —
    and a second delta merge against the persisted store must equal the
    corresponding three-way full refit."""
    import pyspark.sql.functions as F

    from pycaim_spark.catalog import load_table
    from pycaim_spark.operators.caim import CaimDiscretizer
    from pycaim_spark.operators.caim.estimator import caim_incremental_fit

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 10 > 1)
    d1 = ev.filter(F.col("event_id") % 10 == 0)
    d2 = ev.filter(F.col("event_id") % 10 == 1)
    store = str(tmp_path / "caimhist")

    inc1 = caim_incremental_fit(
        spark, store, base, d1, ["value"], "event_type"
    )["value"]
    full1 = CaimDiscretizer(
        inputCols=["value"], labelCol="event_type"
    ).fit(base.unionByName(d1)).cuts["value"]
    assert inc1 == full1

    # second day: store already exists, base must not be needed
    inc2 = caim_incremental_fit(
        spark, store, None, d2, ["value"], "event_type"
    )["value"]
    full2 = CaimDiscretizer(
        inputCols=["value"], labelCol="event_type"
    ).fit(ev).cuts["value"]
    assert inc2 == full2
