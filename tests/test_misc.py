"""Misc-op properties: seeded sampling determinism + bounds, plus a
hypothesis fuzz of the CAIM core against the paper-literal reference."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from pycaim_spark.operators.caim.core import caim_greedy, histogram_from_arrays
from pycaim_spark.operators.caim.reference import naive_caim_fit
from pycaim_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_sample_seeded_is_deterministic_and_bounded(spark, sf_dir):
    a = REGISTRY["sample_seeded"].fn(spark, sf_dir).collect()
    b = REGISTRY["sample_seeded"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from pycaim_spark.catalog import load_table

    total = load_table(spark, sf_dir, "lineitem").count()
    # Bernoulli(0.1): 3σ bound on the sample size.
    sigma = (total * 0.1 * 0.9) ** 0.5
    assert abs(len(a) - total * 0.1) < 4 * sigma


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # value on a coarse grid
            st.integers(min_value=0, max_value=2),   # class label
        ),
        min_size=2,
        max_size=60,
    )
)
def test_caim_core_matches_reference_fuzzed(data):
    """Fuzzed equivalence: the vectorized greedy must equal the naive
    paper implementation on arbitrary coarse-grid datasets (duplicates and
    exact score ties included)."""
    x = np.array([v for v, _ in data], dtype=float) * 0.5
    y = np.array([c for _, c in data])
    expected = naive_caim_fit(x, y)
    values, counts, _ = histogram_from_arrays(x, y)
    got = caim_greedy(values, counts)
    assert np.array_equal(got, expected), f"{got} vs {expected} on {data}"
