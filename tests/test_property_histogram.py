"""Property-based reference-parity: for ANY float data, the engine's
fixed-width histogram must match ``np.histogram`` (whose half-open /
last-bucket-closed semantics equal the reference's ``rdd.histogram`` for
evenly spaced buckets — pyspark core/rdd.py:2214-2366)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_dist_explore_spark.operators.histogram import compute_histogram

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(finite, min_size=1, max_size=60),
    bins=st.integers(min_value=1, max_value=12),
)
def test_histogram_matches_numpy(spark, values, bins):
    df = spark.createDataFrame([(float(v),) for v in values], ["v"])
    rows = compute_histogram([("v", df, "v")], bins=bins).collect()
    got = {r["bucket"]: r["cnt"] for r in rows}

    arr = np.array(values, dtype=float)
    lo, hi = arr.min(), arr.max()
    if lo == hi:
        # degenerate: engine uses RDD semantics — single bucket [lo, hi]
        assert got == {0: len(values)}
        return
    expected_counts, _ = np.histogram(arr, bins=bins, range=(lo, hi))
    expected = {i: int(c) for i, c in enumerate(expected_counts) if c}
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.one_of(finite, st.none(), st.just(float("nan"))), min_size=1, max_size=40
    ),
)
def test_nulls_and_nans_always_dropped(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v double")
    clean = [v for v in values if v is not None and not math.isnan(v)]
    rows = compute_histogram([("v", df, "v")], bins=5).collect()
    assert sum(r["cnt"] for r in rows) == len(clean)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(finite, min_size=2, max_size=40),
    lo=st.floats(min_value=-100, max_value=0),
    hi=st.floats(min_value=1, max_value=100),
)
def test_user_range_matches_numpy(spark, values, lo, hi):
    df = spark.createDataFrame([(float(v),) for v in values], ["v"])
    rows = compute_histogram([("v", df, "v")], bins=4, range=(lo, hi)).collect()
    got = {r["bucket"]: r["cnt"] for r in rows}
    arr = np.array([v for v in values if lo <= v <= hi], dtype=float)
    expected_counts, _ = np.histogram(arr, bins=4, range=(lo, hi))
    expected = {i: int(c) for i, c in enumerate(expected_counts) if c}
    assert got == expected
