"""Distributed histogram / density / KDE operators (SURVEY.md §2 R5–R11).

Replaces the reference's eager, driver-orchestrated pipeline
(``pyspark_dist_explore/pyspark_dist_explore.py`` ``Histogram.build()``:
per-frame min job + max job + ``df.rdd.flatMap(...).histogram(bins)``,
every row crossing the JVM→Python pickle boundary) with a fully lazy
Catalyst plan:

1. UNION ALL of per-series single-column projections (column pruning
   reaches the parquet scan).
2. One global min/max aggregate over the union → a 1-row stats frame,
   attached via broadcast cross join (2 scalar values — safe at any
   scale, never ``collect()``-ed by the engine).
3. One bucket-index expression (functions/numeric.py) + one
   ``groupBy(series, bucket).count()`` — partial+final hash aggregate,
   ≤ series×bins groups, a single tiny shuffle, whole-stage-codegen'd.

100 TB notes: the data side is scanned exactly twice (once for stats,
once for counts) and once when ``range`` is given; shuffle payload is
≤ series×bins rows regardless of input size; no Python UDFs anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_dist_explore_spark.functions.numeric import (
    bucket_col,
    in_range,
    valid_value,
)

#: (label, frame, column-name) — one histogram series.
Series = tuple[str, DataFrame, str]


@dataclass(frozen=True)
class HistogramSpec:
    """Binning parameters (reference ``Histogram(range=None, bins=10)``)."""

    bins: int = 10
    range: tuple[float, float] | None = None

    def __post_init__(self) -> None:
        if self.bins < 1:
            raise ValueError(f"bins must be >= 1, got {self.bins}")
        if self.range is not None and not self.range[0] <= self.range[1]:
            raise ValueError(f"range must be (lo, hi) with lo <= hi, got {self.range}")


def _as_numeric(df: DataFrame, col: str):
    """Column as double; timestamps/dates become epoch seconds.

    Temporal casts are session-timezone-free: TIMESTAMP uses its UTC
    micros, TIMESTAMP_NTZ/DATE decompose into date/time parts (a plain
    cast would shift with the session tz and DST).  Sub-second precision
    on NTZ is dropped (binning granularity is the use case).
    """
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype == "date":
        return F.unix_date(c).cast("bigint").cast("double") * 86400.0
    if dtype == "timestamp_ntz":
        return (
            F.unix_date(c.cast("date")).cast("bigint") * 86400
            + F.hour(c) * 3600
            + F.minute(c) * 60
            + F.second(c)
        ).cast("double")
    if dtype == "timestamp":
        return c.cast("double")
    return c.cast("double")


def _union_series(series: Sequence[Series]) -> DataFrame:
    """(series, v:double) union of all inputs, nulls/NaN dropped (R14)."""
    if not series:
        raise ValueError("at least one (label, df, column) series is required")
    frames = [
        df.select(
            F.lit(label).alias("series"),
            _as_numeric(df, col).alias("v"),
        )
        for label, df, col in series
    ]
    out = reduce(DataFrame.unionAll, frames)
    return out.where(valid_value(F.col("v")))


def _with_stats(data: DataFrame, spec: HistogramSpec) -> DataFrame:
    """Attach global (lo, hi) columns — literals, or one broadcast agg (R5/R6)."""
    if spec.range is not None:
        lo, hi = spec.range
        return data.withColumn("lo", F.lit(float(lo))).withColumn("hi", F.lit(float(hi)))
    stats = data.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    return data.crossJoin(F.broadcast(stats))


def _normalize(series, cols) -> list[Series]:
    if isinstance(series, DataFrame):
        if not cols:
            raise ValueError("cols is required when passing a single DataFrame")
        return [(c, series, c) for c in cols]
    return list(series)


def _sparse_hist(series: Sequence[Series], spec: HistogramSpec) -> DataFrame:
    """(series, bucket, cnt, lo, hi) — lo/hi kept for derived measures."""
    data = _with_stats(_union_series(series), spec)
    v, lo, hi = F.col("v"), F.col("lo"), F.col("hi")
    binned = data.where(in_range(v, lo, hi)).select(
        "series",
        bucket_col(v, lo, hi, spec.bins).alias("bucket"),
        lo,
        hi,
    )
    return binned.groupBy("series", "bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )


def compute_histogram(
    series: Sequence[Series] | DataFrame,
    cols: Sequence[str] | None = None,
    *,
    bins: int = 10,
    range: tuple[float, float] | None = None,
) -> DataFrame:
    """Core histogram (R8): ``(series, bucket, bin_lo, bin_hi, cnt)``.

    ``series`` is either a list of (label, df, col) triples or a single
    DataFrame with ``cols`` naming the columns to histogram (each column
    becomes one series, sharing the global bin boundaries — reference
    ``add_data`` semantics).
    """
    series = _normalize(series, cols)
    spec = HistogramSpec(bins=bins, range=range)
    width = (F.col("hi") - F.col("lo")) / F.lit(float(spec.bins))
    return _sparse_hist(series, spec).select(
        "series",
        "bucket",
        (F.col("lo") + F.col("bucket") * width).alias("bin_lo"),
        F.when(F.col("hi") == F.col("lo"), F.col("hi"))
        .otherwise(F.col("lo") + (F.col("bucket") + 1) * width)
        .alias("bin_hi"),
        "cnt",
    )


def compute_histogram_dense(
    series: Sequence[Series] | DataFrame,
    cols: Sequence[str] | None = None,
    *,
    bins: int = 10,
    range: tuple[float, float] | None = None,
) -> DataFrame:
    """R9: dense output — every (series, bucket) pair present, zero-filled.

    The grid side is built from the DRIVER-KNOWN series labels (a local
    literal frame × ``spark.range(bins)``), not ``sparse.select('series')
    .distinct()`` — the latter would re-execute the whole histogram plan
    (including the min/max stats scan) just to enumerate labels already
    held as Python strings.  A series with zero valid rows therefore
    still appears, all-zero — the shape a caller indexes by.

    Degenerate note: for all-constant data (min == max) the sparse
    histogram follows the reference's RDD semantics — ONE bucket holding
    every count — so the dense grid shows that count in bucket 0 and
    zeros in buckets 1..bins-1.  The grid stays ``bins``-long by design
    (it is driver-known and shape-stable; degeneracy is data-dependent);
    the reference-shaped single-bucket form lives in
    ``viz.Histogram.to_pandas``.
    """
    series = _normalize(series, cols)
    sparse = compute_histogram(series, bins=bins, range=range)
    spark = sparse.sparkSession
    labels = spark.createDataFrame([(lbl,) for lbl, _, _ in series], ["series"]).distinct()
    grid = labels.crossJoin(spark.range(bins).select(F.col("id").alias("bucket")))
    return (
        grid.join(sparse, ["series", "bucket"], "left")
        .select(
            "series",
            "bucket",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )


def compute_equidepth_histogram(
    series: Sequence[Series] | DataFrame,
    cols: Sequence[str] | None = None,
    *,
    buckets: int = 10,
) -> DataFrame:
    """Equi-DEPTH histogram (the quantile complement of the reference's
    fixed-WIDTH R7/R8 core): per series, ``buckets`` bins holding
    ~equal row counts — ``(series, bucket, bin_lo, bin_hi, cnt)`` with
    boundaries at the exact percentiles ``i/buckets``.  The form every
    skew question wants ("where does the mass actually sit?") and what
    fixed-width bins hide when one outlier stretches the range.

    Scale shape: ONE per-series exact-percentile aggregate
    (``F.percentile`` over the ``buckets+1``-point grid — map-side
    partial digests, never a global sort; ≤ series rows out), broadcast
    back, bucket = the count of interior boundaries strictly below the
    value (closed left, like :func:`perplexity_buckets` — a value ON a
    boundary lands in the lower bucket; the last bucket is closed on
    both ends by construction).  Duplicate-heavy columns yield FEWER
    than ``buckets`` distinct buckets (coincident boundaries collapse —
    equi-depth's honest answer, not an error).  DuckDB twin:
    ``quantile_cont`` shares Spark's linear interpolation (the
    `summary_stats` precedent), pinned in pytest.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    series = _normalize(series, cols)
    data = _union_series(series)
    grid = [i / buckets for i in range(buckets + 1)]
    th = data.groupBy("series").agg(
        F.percentile(F.col("v"), F.lit(grid)).alias("__th")
    )
    joined = data.join(F.broadcast(th), "series")
    # interior boundaries only (grid[1..buckets-1]): below the first
    # interior boundary -> bucket 0, above all -> bucket buckets-1
    bucket = reduce(
        lambda a, b: a + b,
        [
            (F.col("v") > F.element_at(F.col("__th"), i + 1)).cast("int")
            for i in range(1, buckets)
        ],
        F.lit(0),
    )
    binned = joined.select("series", bucket.alias("bucket"), "__th")
    return (
        binned.groupBy("series", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), F.first("__th").alias("__th"))
        .select(
            "series",
            "bucket",
            F.element_at(F.col("__th"), F.col("bucket") + 1).alias("bin_lo"),
            F.element_at(F.col("__th"), F.col("bucket") + 2).alias("bin_hi"),
            "cnt",
        )
    )


def equidepth_histogram_sql(src: str, *, buckets: int = 10) -> str:
    """DuckDB twin of :func:`compute_equidepth_histogram` — same
    ``quantile_cont`` grid, same closed-left interior-boundary bucket
    sum.  ``src`` must yield ``(series, v)`` with nulls already valid
    (the caller spells the same WHERE as the engine's ``valid_value``).
    """
    grid = ", ".join(repr(i / buckets) for i in range(buckets + 1))
    bucket = " + ".join(
        f"CASE WHEN v > th[{i + 1}] THEN 1 ELSE 0 END" for i in range(1, buckets)
    )
    bucket = bucket or "0"
    return f"""
WITH ed_src AS ({src}),
ed_th AS (
  SELECT series, quantile_cont(v, [{grid}]) AS th
  FROM ed_src GROUP BY series
),
ed_b AS (
  SELECT ed_src.series, CAST({bucket} AS INT) AS bucket, th
  FROM ed_src JOIN ed_th ON ed_src.series = ed_th.series
)
SELECT series, bucket,
       th[bucket + 1] AS bin_lo,
       th[bucket + 2] AS bin_hi,
       CAST(count(*) AS BIGINT) AS cnt
FROM ed_b
GROUP BY series, bucket, th
"""


def compute_density(
    series: Sequence[Series] | DataFrame,
    cols: Sequence[str] | None = None,
    *,
    bins: int = 10,
    range: tuple[float, float] | None = None,
) -> DataFrame:
    """R10: per-series density — ``cnt / total / bin_width`` integrates to 1.

    Bin width is computed as ``(hi - lo) / bins`` in ONE operation order
    (matching the oracle SQL exactly) rather than ``bin_hi - bin_lo``,
    which differs in the last ulp.
    """
    series = _normalize(series, cols)
    spec = HistogramSpec(bins=bins, range=range)
    sparse = _sparse_hist(series, spec)
    w = Window.partitionBy("series")
    width = (F.col("hi") - F.col("lo")) / F.lit(float(spec.bins))
    # Degenerate single-bucket range has zero width; fall back to relative freq.
    density = F.when(
        F.col("hi") > F.col("lo"),
        F.col("cnt") / F.sum("cnt").over(w) / width,
    ).otherwise(F.col("cnt").cast("double") / F.sum("cnt").over(w))
    return sparse.select(
        "series",
        "bucket",
        (F.col("lo") + F.col("bucket") * width).alias("bin_lo"),
        F.when(F.col("hi") == F.col("lo"), F.col("hi"))
        .otherwise(F.col("lo") + (F.col("bucket") + 1) * width)
        .alias("bin_hi"),
        "cnt",
        density.alias("density"),
    )


def compute_kde(
    series: Sequence[Series] | DataFrame,
    cols: Sequence[str] | None = None,
    *,
    num: int = 300,
    pre_bins: int = 1024,
    bandwidth: float | None = None,
    stage: bool = False,
) -> DataFrame:
    """R11: smoothed density curve — Gaussian KDE over ``num`` grid points.

    Scale design: a naive KDE is a ``num×`` row blow-up (every row scored
    against every grid point).  Instead we first reduce the data to a
    ``pre_bins``-bucket weighted histogram (one pass, tiny), then evaluate
    the kernel on bin centers × grid — O(pre_bins × num) work on ≤ a few
    thousand rows, independent of input size.  Matches the reference's
    ``plot_density`` intent (smoothed curve, ``num=300``) without scipy;
    kernel math follows pandas-on-Spark ``KdePlotBase.compute_kde_col``
    ($PYSPARK/pandas/plot/core.py:421-463).

    ``stage=True`` ``localCheckpoint``s the ``pre_bins``-bucket weighted
    histogram (lazily, ≤ pre_bins × series rows): the lazy lineage
    otherwise re-executes that corpus scan + aggregate once per
    consumer — the bandwidth stats, the variance join and the final
    kernel join each re-derive it (the repo staging pattern; default
    False keeps construction job-free).
    """
    if num < 2:
        raise ValueError(f"num must be >= 2 grid points, got {num}")
    if isinstance(series, DataFrame):
        if not cols:
            raise ValueError("cols is required when passing a single DataFrame")
        series = [(c, series, c) for c in cols]

    data = _with_stats(_union_series(series), HistogramSpec(bins=pre_bins))
    v, lo, hi = F.col("v"), F.col("lo"), F.col("hi")
    width = (hi - lo) / F.lit(float(pre_bins))
    centers = (
        data.where(in_range(v, lo, hi))
        .select(
            "series",
            bucket_col(v, lo, hi, pre_bins).alias("bucket"),
            lo,
            hi,
        )
        .groupBy("series", "bucket")
        .agg(F.count(F.lit(1)).alias("w"), F.first("lo").alias("lo"), F.first("hi").alias("hi"))
        .select(
            "series",
            (F.col("lo") + (F.col("bucket") + F.lit(0.5)) * width).alias("center"),
            "w",
            "lo",
            "hi",
        )
    )
    if stage:
        centers = centers.localCheckpoint(eager=False)
    # Per-series stats for Silverman bandwidth + total weight, from the binned data.
    stats = centers.groupBy("series").agg(
        F.sum("w").alias("n"),
        (F.sum(F.col("center") * F.col("w")) / F.sum("w")).alias("mean"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
    )
    # (d*d), not pow(d, 2): pow is not bit-identical across engines, and
    # the DuckDB oracle mirrors this arithmetic term for term
    d = F.col("center") - F.col("mean")
    var = (
        centers.join(stats, "series")
        .groupBy("series")
        .agg((F.sum(d * d * F.col("w")) / F.sum("w")).alias("var"))
    )
    stats = stats.join(var, "series")
    bw = (
        F.lit(float(bandwidth))
        if bandwidth is not None
        else F.greatest(
            F.lit(1.06) * F.sqrt("var") * F.pow(F.col("n"), F.lit(-0.2)),
            F.lit(1e-9),
        )
    )
    grid = stats.select(
        "series",
        "n",
        "lo",
        "hi",
        bw.alias("h"),
    ).select(
        "series",
        "n",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(num - 1))).alias("i"),
        ((F.col("hi") - F.col("lo")) / F.lit(float(num - 1))).alias("step"),
        "lo",
    ).select(
        "series", "n", "h", "i", (F.col("lo") + F.col("i") * F.col("step")).alias("x")
    )
    u = (F.col("x") - F.col("center")) / F.col("h")
    kernel = F.exp(F.lit(-0.5) * u * u) / (
        F.col("h") * F.lit(2.5066282746310002)  # sqrt(2*pi); u*u not pow (engine-portable)
    )
    return (
        grid.join(centers.select("series", "center", "w"), "series")
        .groupBy("series", "i", "x")
        .agg((F.sum(kernel * F.col("w")) / F.first("n")).alias("density"))
    )


def compute_ecdf(
    series: Sequence[Series] | DataFrame,
    cols: Sequence[str] | None = None,
    *,
    points: int = 100,
) -> DataFrame:
    """Empirical CDF sampled on an evenly spaced grid — the quantile
    view of the reference's distribution-exploration core: per series,
    ``(series, i, x, cdf)`` at ``points`` grid values over the shared
    global [min, max].  Boundary semantics (strict at interior points):
    ``cdf = P(v < x)`` for every grid point except the last — a value
    exactly on a grid boundary is attributed to the NEXT point — and
    ``cdf = P(v <= hi) = 1.0`` exactly at the final point.

    Same scale recipe as the KDE: reduce the corpus to a dense
    ``points``-bucket histogram first (ONE count pass after the shared
    min/max job), then the CDF is a cumulative window sum over ≤
    ``points × series`` rows — driver-independent of corpus size, and
    the cumsum sort touches only those tiny rows, never the data.
    Bucket semantics make this exact at the grid points: bucket i holds
    ``[lo + i·w, lo + (i+1)·w)`` (last closed), so the cumulative count
    through bucket i IS ``count(v <= lo + (i+1)·w)`` up to the
    open-boundary values, which a grid sampler attributes to the next
    point — the DuckDB twin (a direct ``count(v <= x)`` per grid
    point) hash-matches exactly (pinned in pytest).
    """
    from pyspark.sql.window import Window

    if points < 2:
        raise ValueError(f"points must be >= 2, got {points}")
    series = _normalize(series, cols)
    spec = HistogramSpec(bins=points, range=None)
    sparse = _sparse_hist(series, spec)  # (series, bucket, cnt, lo, hi)
    spark = sparse.sparkSession
    labels = spark.createDataFrame([(lbl,) for lbl, _, _ in series], ["series"]).distinct()
    grid = labels.crossJoin(spark.range(points).select(F.col("id").alias("bucket")))
    dense = (
        grid.join(sparse, ["series", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        # lo/hi ride only on non-empty buckets — spread them per series
        .withColumn("lo", F.max("lo").over(Window.partitionBy("series")))
        .withColumn("hi", F.max("hi").over(Window.partitionBy("series")))
    )
    w = (
        Window.partitionBy("series")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("series")
    return (
        dense.withColumn("__cum", F.sum("cnt").over(w))
        .withColumn("__n", F.sum("cnt").over(tot))
        .select(
            "series",
            F.col("bucket").alias("i"),
            F.round(
                F.col("lo")
                + (F.col("bucket") + 1) * (F.col("hi") - F.col("lo")) / F.lit(float(points)),
                10,
            ).alias("x"),
            F.round(
                F.when(F.col("__n") > 0, F.col("__cum") / F.col("__n")).otherwise(
                    F.lit(0.0)
                ),
                10,
            ).alias("cdf"),
        )
    )
