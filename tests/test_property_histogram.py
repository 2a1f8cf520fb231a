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

# Integer-valued floats in a modest range sit far from fractional bin
# edges, so every bucket-assignment arithmetic agrees — the right data
# for comparing against numpy's DIFFERENT float formula (edge array +
# searchsorted vs our floor((v-lo)*n/(hi-lo))); at boundary-ulp cases
# the two legitimately differ by one bucket.
safe = st.integers(min_value=-1000, max_value=1000).map(float)


def _spec_bucket(v: float, lo: float, hi: float, n: int) -> int:
    """Pure-Python rendering of functions/numeric.bucket_col — the spec."""
    if hi == lo:
        return 0
    if v == hi:
        return n - 1
    return min(int(math.floor((v - lo) * float(n) / (hi - lo))), n - 1)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(finite, min_size=1, max_size=60),
    bins=st.integers(min_value=1, max_value=12),
)
def test_histogram_matches_spec_on_arbitrary_floats(spark, values, bins):
    """Distributed execution == the scalar spec formula, ANY floats."""
    df = spark.createDataFrame([(float(v),) for v in values], ["v"])
    rows = compute_histogram([("v", df, "v")], bins=bins).collect()
    got = {r["bucket"]: r["cnt"] for r in rows}
    lo, hi = min(values), max(values)
    expected: dict[int, int] = {}
    for v in values:
        b = _spec_bucket(v, lo, hi, bins)
        expected[b] = expected.get(b, 0) + 1
    assert got == expected


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(safe, min_size=1, max_size=60),
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
    values=st.lists(safe, min_size=2, max_size=40),
    lo=st.integers(min_value=-100, max_value=0).map(float),
    hi=st.integers(min_value=1, max_value=100).map(float),
)
def test_user_range_matches_numpy(spark, values, lo, hi):
    df = spark.createDataFrame([(float(v),) for v in values], ["v"])
    rows = compute_histogram([("v", df, "v")], bins=4, range=(lo, hi)).collect()
    got = {r["bucket"]: r["cnt"] for r in rows}
    arr = np.array([v for v in values if lo <= v <= hi], dtype=float)
    expected_counts, _ = np.histogram(arr, bins=4, range=(lo, hi))
    expected = {i: int(c) for i, c in enumerate(expected_counts) if c}
    assert got == expected


# -- BMP codec property: encode/decode round-trips any RGB image ----------

@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=17),
    h=st.integers(min_value=1, max_value=13),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_codec_roundtrip_property(w, h, seed):
    from pyspark_dist_explore_spark.operators import multimodal

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = multimodal.encode_bmp(px)
    assert np.array_equal(multimodal.decode_bmp(data), px)
    # concatenated frames always split back on declared lengths
    frames = multimodal.split_bmp_frames(data + data + data)
    assert len(frames) == 3 and all(f == data for f in frames)


# --------------------------------------------------------------------------
# int8 quantization properties (X15): for ANY finite vectors, codes are
# bounded, the pack round-trips, and dequantization error <= step/2
# --------------------------------------------------------------------------


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_quantize_properties(spark, vecs):
    from pyspark_dist_explore_spark.operators.similarity import (
        dimension_minmax,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, embedding array<double>"
    )
    mm = dimension_minmax(df)
    mm_rows = sorted(mm.collect(), key=lambda r: r.dim)
    lo = np.array([r.lo for r in mm_rows])
    hi = np.array([r.hi for r in mm_rows])
    step = (hi - lo) / 255.0
    for r in quantize_embeddings(df, mm).collect():
        assert all(0 <= c <= 255 for c in r.codes)
        assert list(np.frombuffer(r.packed, dtype=np.uint8)) == r.codes
        x = np.array(vecs[r.vec_id], dtype=np.float64)
        xq = lo + np.array(r.codes, dtype=np.float64) * step
        # degenerate dims (lo==hi, step 0) reconstruct lo exactly
        tol = step / 2 + np.abs(x) * 1e-12 + 1e-12
        assert np.all(np.abs(x - xq) <= tol), (x, xq, step)
