"""Plotting-surface tests (SURVEY §2.1 R1/R2/R12) without matplotlib.

The container has no matplotlib, so a stub Axes records the calls the
reference-compatible API makes (``bar``/``plot``/``legend``/formatter).
This exercises the full client path — data shaping, bar geometry,
density overlay — everything short of actual rendering, which is the
only thing matplotlib itself adds.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark_dist_explore_spark.viz import Histogram, distplot, hist, pandas_histogram


class StubYAxis:
    def __init__(self):
        self.formatter = None

    def set_major_formatter(self, f):  # pragma: no cover - matplotlib-only
        self.formatter = f


class StubAxes:
    """Duck-typed matplotlib Axes recording every draw call."""

    def __init__(self):
        self.bars = []  # (xs, heights, width, label)
        self.lines = []  # (xs, ys, label)
        self.legend_called = 0
        self.yaxis = StubYAxis()

    def bar(self, x, height, width=None, label=None, **kw):
        self.bars.append((list(x), list(height), width, label))

    def plot(self, x, y, label=None, **kw):
        self.lines.append((list(x), list(y), label))

    def legend(self, *a, **kw):
        self.legend_called += 1


@pytest.fixture()
def two_series(spark):
    a = spark.createDataFrame([(float(i),) for i in range(1, 11)], ["a"])
    b = spark.createDataFrame([(float(i),) for i in range(5, 15)], ["b"])
    return a, b


def test_hist_draws_grouped_bars(spark, two_series):
    a, b = two_series
    ax = StubAxes()
    out = hist(ax, [a, b], bins=5)
    assert out is ax
    assert len(ax.bars) == 2  # one bar series per column
    assert ax.legend_called == 1
    # grouped (non-overlapping) mode: each series' bars are width/ncols wide
    full_width = ax.bars[0][2] * 2
    xs_a, heights_a, _, label_a = ax.bars[0]
    assert label_a == "a"
    assert len(xs_a) == 5
    # counts preserved: 10 values per series
    assert sum(heights_a) == 10
    assert full_width == pytest.approx((14.0 - 1.0) / 5)


def test_plot_hist_overlapping_mode(spark, two_series):
    a, b = two_series
    h = Histogram(bins=4)
    h.add_data([a, b])
    ax = StubAxes()
    h.plot_hist(ax, overlapping=True)
    assert len(ax.bars) == 2
    # overlapping bars use the FULL bin width for both series
    assert ax.bars[0][2] == ax.bars[1][2] == pytest.approx((14.0 - 1.0) / 4)
    assert {ax.bars[0][3], ax.bars[1][3]} == {"a", "b"}


def test_distplot_density_bars_plus_kde_line(spark, two_series):
    a, _ = two_series
    ax = StubAxes()
    distplot(ax, a, bins=5)
    # one density bar series + one KDE line
    assert len(ax.bars) == 1
    assert len(ax.lines) == 1
    xs, ys, label = ax.lines[0]
    assert label == "a"
    assert len(xs) == 300  # reference num=300 grid
    # the bars integrate to ~1 (density normalization)
    _, heights, width, _ = ax.bars[0]
    assert sum(h * width for h in heights) == pytest.approx(1.0, abs=1e-9)


def test_plot_density_multi_series_lines(spark, two_series):
    a, b = two_series
    h = Histogram(bins=5)
    h.add_data([a, b])
    ax = StubAxes()
    h.plot_density(ax, num=50)
    assert {line[2] for line in ax.lines} == {"a", "b"}
    assert all(len(line[0]) == 50 for line in ax.lines)


def test_to_pandas_cache_invalidated_on_param_change(spark, two_series):
    a, _ = two_series
    h = Histogram(bins=5)
    h.add_column(a, "a")
    first = h.to_pandas()
    assert len(first) == 5
    h.bins = 10  # mutate AFTER build — must not return stale 5-bin counts
    second = h.to_pandas()
    assert len(second) == 10
    assert second["a"].sum() == first["a"].sum() == 10
    h.range = (1.0, 6.0)  # range changes invalidate too
    third = h.to_pandas()
    assert third["a"].sum() == 6  # values 1..6 inside the range
    # unchanged params hit the cache (same object back)
    assert h.to_pandas()["a"].sum() == 6


def test_to_pandas_cache_invalidated_on_added_series(spark, two_series):
    a, b = two_series
    h = Histogram(bins=5)
    h.add_column(a, "a")
    first = h.to_pandas()
    assert list(first.columns) == ["a"]
    h.add_column(b, "b")  # add AFTER a build — cache must not omit "b"
    second = h.to_pandas()
    assert list(second.columns) == ["a", "b"]
    assert second["b"].sum() == b.count()


def test_pandas_histogram_matches_numpy(spark):
    vals = [float(v) for v in np.r_[np.arange(0, 50), np.arange(0, 10)]]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    pdf = pandas_histogram(df, bins=10)
    expected, _ = np.histogram(vals, bins=10)
    assert list(pdf["x"]) == list(expected)
