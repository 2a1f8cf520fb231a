"""Reference-API-compatible surface (SURVEY.md §2 R1–R4, R12–R13).

Mirrors the public API of ``pyspark_dist_explore/pyspark_dist_explore.py``
(``hist(ax, x)``, ``distplot(ax, x)``, ``pandas_histogram(x)``, class
``Histogram`` with ``add_data``/``add_column``/``build``/``plot_hist``/
``plot_density``/``to_pandas``) as a thin client over the distributed
operators in ``operators/histogram.py``.  matplotlib is optional: only
the ``plot_*`` methods need it, the engine and tests never do.

Differences from the reference, by design (SURVEY §3.2):
- ``build()`` runs ONE Spark job for global min/max across every added
  series (reference: one min job + one max job per frame) and ONE
  aggregation job for all counts (reference: one RDD-histogram job per
  column with per-row pickling).
- Duplicate series labels are deduplicated as ``name``, ``name (1)``, …
  (SURVEY §7.4.6 — exact upstream suffix unverified, cosmetic).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pyspark_dist_explore_spark.operators.histogram import (
    Series,
    compute_histogram_dense,
    compute_kde,
)


class Histogram:
    """Accumulate named single-column frames; shared fixed-width binning.

    Reference: ``class Histogram(range=None, bins=10)`` with ``add_data``
    accepting a DataFrame (all numeric columns become series) or a list
    of DataFrames, and ``add_column`` accepting a single-column frame.
    """

    def __init__(self, bins: int = 10, range: tuple[float, float] | None = None):
        self.bins = int(bins)
        self.range = range
        self.series: list[Series] = []
        self._result: pd.DataFrame | None = None
        self._result_key: tuple | None = None  # (bins, range) the cache was built with
        self._edges: np.ndarray | None = None  # numeric bin edges of the last build

    # -- registration (driver-side metadata only; no Spark job) ------------
    def _dedup_label(self, label: str) -> str:
        existing = {lbl for lbl, _, _ in self.series}
        if label not in existing:
            return label
        i = 1
        while f"{label} ({i})" in existing:
            i += 1
        return f"{label} ({i})"

    def add_column(self, df: DataFrame, col: str | None = None, name: str | None = None) -> None:
        if col is None:
            if len(df.columns) != 1:
                raise ValueError("add_column needs a single-column frame or an explicit col")
            col = df.columns[0]
        self.series.append((self._dedup_label(name or col), df, col))
        self._result = None

    def add_data(self, data: DataFrame | Iterable[DataFrame]) -> None:
        if isinstance(data, DataFrame):
            numeric = [
                f.name
                for f in data.schema.fields
                if f.dataType.typeName()
                in ("byte", "short", "integer", "long", "float", "double", "decimal")
            ]
            if not numeric:
                raise ValueError("no numeric columns to add")
            for c in numeric:
                self.add_column(data, c)
        else:
            # strings are iterable-of-str — without this guard a stray
            # label/tuple argument recurses char-by-char until the
            # recursion limit instead of failing with a usable message
            if isinstance(data, (str, bytes)) or not hasattr(data, "__iter__"):
                raise TypeError(
                    "add_data takes a DataFrame or an iterable of DataFrames, "
                    f"got {type(data).__name__!s}"
                )
            for frame in data:
                self.add_data(frame)

    # -- execution ----------------------------------------------------------
    def build(self) -> DataFrame:
        """The lazy result plan: dense ``(series, bucket, cnt)``."""
        return compute_histogram_dense(self.series, bins=self.bins, range=self.range)

    def _boundaries(self, pdf_lohi: tuple[float, float]) -> np.ndarray:
        lo, hi = pdf_lohi
        if lo == hi:  # RDD degenerate semantics: single bucket [minv, maxv]
            return np.array([lo, hi])
        return np.linspace(lo, hi, self.bins + 1)

    def to_pandas(self, kind: str = "hist") -> pd.DataFrame:
        """R13: counts (or densities) as pandas, bin-label index ``"lo - hi"``.

        Degenerate all-constant data yields ONE bucket ``[minv, maxv]``
        (the reference's RDD-histogram semantics).  Note ``build()``
        intentionally differs: its dense grid is a fixed ``bins``-length
        shape callers index positionally, so constant data appears there
        as ``bins`` buckets with the count in bucket 0.

        The cached result is keyed on ``(bins, range, #series)`` —
        mutating any of them (including ``add_column``/``add_data`` after
        a build) transparently recomputes instead of returning stale
        counts that omit the new series.
        """
        key = (self.bins, self.range, len(self.series))
        if self._result is None or self._result_key != key:
            from pyspark_dist_explore_spark.operators.histogram import compute_histogram

            self._result = compute_histogram(
                self.series, bins=self.bins, range=self.range
            ).toPandas()
            self._result_key = key
        sparse = self._result
        if sparse.empty:
            return pd.DataFrame()
        if self.range is not None:
            # the true binning range — sparse min/max would be wrong when
            # the extreme buckets happen to be empty
            lo, hi = float(self.range[0]), float(self.range[1])
        else:
            # data-derived range: global min/max always occupy the first
            # and last non-empty positions of the sparse result
            lo = float(sparse["bin_lo"].min())
            hi = float(sparse["bin_hi"].max())
        edges = self._boundaries((lo, hi))
        self._edges = edges
        nb = len(edges) - 1
        labels = [f"{edges[i]:.2f} - {edges[i + 1]:.2f}" for i in range(nb)]
        out = pd.DataFrame(index=pd.Index(labels))
        for label, _, _ in self.series:
            s = sparse[sparse["series"] == label].set_index("bucket")["cnt"]
            counts = np.array([int(s.get(b, 0)) for b in range(nb)], dtype=float)
            if kind == "density":
                total = counts.sum()
                width = (hi - lo) / nb if hi > lo else 1.0
                counts = counts / total / width if total else counts
            out[label] = counts
        return out

    # -- plotting (optional matplotlib) -------------------------------------
    def plot_hist(self, ax, overlapping: bool = False, formatted_yaxis: bool = True, **kwargs):
        pdf = self.to_pandas("hist")
        # numeric edges from the build — parsing the "%.2f" display labels
        # would collapse any bin narrower than 0.01
        edges = self._edges if self._edges is not None else np.array([0.0, 1.0])
        centers = [(edges[i] + edges[i + 1]) / 2 for i in range(len(pdf))]
        width = float(edges[1] - edges[0]) if len(edges) > 1 else 1.0
        ncols = max(len(pdf.columns), 1)
        for j, colname in enumerate(pdf.columns):
            if overlapping:
                ax.bar(centers, pdf[colname], width=width, alpha=0.5, label=colname, **kwargs)
            else:
                offs = (j - (ncols - 1) / 2) * (width / ncols)
                ax.bar(
                    [c + offs for c in centers],
                    pdf[colname],
                    width=width / ncols,
                    label=colname,
                    **kwargs,
                )
        if formatted_yaxis:
            try:
                from matplotlib.ticker import FuncFormatter
            except ImportError:  # matplotlib-free ax stand-ins skip formatting
                FuncFormatter = None
            if FuncFormatter is not None:

                def fmt(x, _pos):
                    for div, suf in ((1e9, "B"), (1e6, "M"), (1e3, "K")):
                        if abs(x) >= div:
                            return f"{x / div:.1f}{suf}"
                    return f"{x:.0f}"

                ax.yaxis.set_major_formatter(FuncFormatter(fmt))
        ax.legend()
        return ax

    def plot_density(self, ax, num: int = 300, **kwargs):
        pdf = (
            compute_kde(self.series, num=num)
            .toPandas()
            .sort_values(["series", "i"])
        )
        for label, grp in pdf.groupby("series"):
            ax.plot(grp["x"], grp["density"], label=label, **kwargs)
        ax.legend()
        return ax


def _as_histogram(x, bins: int = 10, range: tuple[float, float] | None = None) -> Histogram:
    h = Histogram(bins=bins, range=range)
    h.add_data(x if not isinstance(x, DataFrame) else x)
    return h


def hist(axes, x, **kwargs):
    """R1: one-shot histogram bars (reference ``hist(axes, x, **kwargs)``)."""
    h = _as_histogram(x, bins=kwargs.pop("bins", 10), range=kwargs.pop("range", None))
    return h.plot_hist(axes, **kwargs)


def distplot(axes, x, **kwargs):
    """R2: normalized histogram + smoothed density curve."""
    h = _as_histogram(x, bins=kwargs.pop("bins", 10), range=kwargs.pop("range", None))
    pdf = h.to_pandas("density")
    edges = h._edges if h._edges is not None else np.array([0.0, 1.0])
    centers = [(edges[i] + edges[i + 1]) / 2 for i in range(len(pdf))]
    width = float(edges[1] - edges[0]) if len(edges) > 1 else 1.0
    for colname in pdf.columns:
        axes.bar(centers, pdf[colname], width=width, alpha=0.4, label=colname)
    h.plot_density(axes, **kwargs)
    return axes


def pandas_histogram(x, bins: int = 10, range: tuple[float, float] | None = None) -> pd.DataFrame:
    """R3: histogram counts as a pandas DataFrame with bin-label index."""
    return _as_histogram(x, bins=bins, range=range).to_pandas("hist")
