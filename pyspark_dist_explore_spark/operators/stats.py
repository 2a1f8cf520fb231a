"""Summary statistics operators (SURVEY.md §2.2 X7): exact describe,
approximate sketches.

``describe_exact`` reproduces ``df.describe()``'s shape with hash-stable
arithmetic: counts and min/max are exact; mean and variance come from
scaled-integer / exact-decimal power sums, so the final double values are
bit-identical across engines and parallelism (see functions/agg.py for
the technique).  Variance uses the power-sum identity
``var = (Σx² − (Σx)²/n) / (n−1)`` with Σ computed exactly — the one
subtraction happens once, in double, identically everywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def describe_exact(df: DataFrame, cols: Sequence[str], *, scale: int = 4) -> DataFrame:
    """(col_name, cnt, mean, stddev, vmin, vmax), one row per column.

    Values are scaled to ``10^scale`` fixed-point before summing: Σx as
    BIGINT (exact), Σx² as DECIMAL(38,0) (exact — BIGINT would overflow:
    a 1e5 value scaled by 1e4 squares to 1e18, one row from the edge).

    ONE scan for any number of columns: per-column validity becomes a
    ``when(valid, x)`` null-out (aggregates skip NULLs), all power sums
    land in a single aggregate row, and ``stack`` pivots it long.  The
    per-column-job alternative multiplies the dominant I/O cost by
    ``len(cols)`` at scale.
    """
    m = float(10**scale)
    aggs = []
    for i, c in enumerate(cols):
        x = F.col(c).cast("double")
        xv = F.when(x.isNotNull() & ~F.isnan(x), x)
        scaled = F.round(xv * F.lit(m)).cast("bigint")
        dec = scaled.cast("decimal(19,0)")
        aggs += [
            F.count(xv).alias(f"cnt_{i}"),
            F.sum(scaled).alias(f"sx_{i}"),
            F.sum(dec * dec).alias(f"sxx_{i}"),
            F.min(xv).alias(f"vmin_{i}"),
            F.max(xv).alias(f"vmax_{i}"),
        ]
    row = df.agg(*aggs)
    derived = []
    for i, c in enumerate(cols):
        n = F.col(f"cnt_{i}")
        sx_d = F.col(f"sx_{i}").cast("double")
        sxx_d = F.col(f"sxx_{i}").cast("double")
        mean = F.when(n >= 1, sx_d / F.lit(m) / n)
        # n < 2 → sample stddev undefined (and (n-1)=0 divides by zero);
        # the guard wraps the whole sqrt so the result is NULL, not 0.0
        # (greatest(NULL, 0.0) would fold back to 0.0)
        stddev = F.when(
            n >= 2,
            F.round(
                F.sqrt(
                    F.greatest(
                        (sxx_d / F.lit(m * m) - (sx_d / F.lit(m)) * (sx_d / F.lit(m)) / n)
                        / (n - 1),
                        F.lit(0.0),
                    )
                ),
                6,
            ),
        )
        derived += [
            F.col(f"cnt_{i}"),
            F.round(mean, 6).alias(f"mean_{i}"),
            stddev.alias(f"stddev_{i}"),
            F.col(f"vmin_{i}"),
            F.col(f"vmax_{i}"),
        ]
    wide = row.select(*derived)
    stack_terms = ", ".join(
        f"'{c}', cnt_{i}, mean_{i}, stddev_{i}, vmin_{i}, vmax_{i}"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_terms}) AS (col_name, cnt, mean, stddev, vmin, vmax)"
        )
    )


def describe_exact_sql(table: str, cols: Sequence[str], *, scale: int = 4) -> str:
    """DuckDB rendering of :func:`describe_exact` — identical arithmetic."""
    m = f"{float(10 ** scale)!r}"
    selects = []
    for c in cols:
        x = f"CAST({c} AS DOUBLE)"
        scaled = f"CAST(round({x} * {m}) AS BIGINT)"
        dec = f"CAST({scaled} AS DECIMAL(19,0))"
        selects.append(
            f"""
SELECT '{c}' AS col_name, count(*) AS cnt,
       round(CASE WHEN count(*) >= 1
                  THEN CAST(sum({scaled}) AS DOUBLE) / {m} / count(*) END, 6) AS mean,
       CASE WHEN count(*) >= 2 THEN round(sqrt(greatest(
         (CAST(sum({dec} * {dec}) AS DOUBLE) / ({m} * {m})
          - (CAST(sum({scaled}) AS DOUBLE) / {m}) * (CAST(sum({scaled}) AS DOUBLE) / {m}) / count(*))
         / (count(*) - 1), 0.0)), 6) END AS stddev,
       min({x}) AS vmin, max({x}) AS vmax
FROM {table} WHERE {x} IS NOT NULL AND NOT isnan({x})"""
        )
    return " UNION ALL ".join(selects)


def histogram_approx(df: DataFrame, col: str, *, bins: int = 10) -> DataFrame:
    """One-scan approximate histogram via ``histogram_numeric`` (SURVEY
    §4.2): no min/max pre-pass, NON-uniform data-adaptive bin centers —
    deliberately a separate operator from the exact fixed-width path, and
    excluded from the value-hash oracle (sketch-based).
    """
    x = F.col(col).cast("double")
    return (
        df.where(x.isNotNull() & ~F.isnan(x))
        .agg(F.histogram_numeric(x, F.lit(bins)).alias("h"))
        .select(F.posexplode("h").alias("bucket", "bc"))
        .select("bucket", F.col("bc.x").alias("center"), F.col("bc.y").alias("weight"))
    )


def histogram_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    *,
    cur_col: str | None = None,
    bins: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """Distribution drift between two corpus snapshots — per-bin PSI
    (population stability index) over a SHARED-range histogram:
    ``(bucket, ref_cnt, cur_cnt, p, q, psi)`` with
    ``psi = (p − q) · ln(p/q)``; sum the column for the headline score
    (rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

    This is the reference's multi-series histogram core (ONE global
    min/max job across BOTH frames → shared fixed-width bins → per-bin
    counts → dense zero-fill) applied to the pipeline question "did this
    crawl/quality-score/length distribution move since the last
    snapshot?".  Zero-count bins are clamped to ``eps`` before the log —
    the standard PSI smoothing, and what keeps the expression total; an
    entirely EMPTY snapshot clamps every ratio to ``eps`` (maximal
    drift) instead of tripping ANSI division-by-zero.

    Scale: the same 2-scans-total shape as any multi-series histogram
    (stats job + count job, map-side partials, ≤ bins-row grid), so two
    100 TB snapshots cost two scans, no extra shuffle.  Deterministic
    double arithmetic, identical expression order on the DuckDB twin —
    pinned in pytest (rounded to 10 dp to absorb libm ulp differences
    in ``ln``).
    """
    from pyspark_dist_explore_spark.operators.histogram import compute_histogram_dense

    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1) (the PSI zero-bin clamp), got {eps}")
    dense = compute_histogram_dense(
        [("ref", ref, col), ("cur", cur, cur_col or col)], bins=bins
    )
    pivoted = (
        dense.groupBy("bucket")
        .pivot("series", ["ref", "cur"])
        .sum("cnt")
        .select(
            "bucket",
            F.coalesce("ref", F.lit(0)).alias("ref_cnt"),
            F.coalesce("cur", F.lit(0)).alias("cur_cnt"),
        )
    )
    totals = pivoted.groupBy().agg(
        F.sum("ref_cnt").alias("__tr"), F.sum("cur_cnt").alias("__tc")
    )
    # an EMPTY snapshot (total 0) is maximal drift, not a crash: its
    # ratios all clamp to eps (ANSI division by zero would error)
    p = F.greatest(
        F.when(F.col("__tr") > 0, F.col("ref_cnt") / F.col("__tr")).otherwise(0.0),
        F.lit(eps),
    )
    q = F.greatest(
        F.when(F.col("__tc") > 0, F.col("cur_cnt") / F.col("__tc")).otherwise(0.0),
        F.lit(eps),
    )
    return (
        pivoted.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "ref_cnt",
            "cur_cnt",
            F.round(p, 10).alias("p"),
            F.round(q, 10).alias("q"),
            F.round((p - q) * F.log(p / q), 10).alias("psi"),
        )
    )


def histogram_drift_by_group(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    group_col: str,
    *,
    cur_col: str | None = None,
    cur_group_col: str | None = None,
    bins: int = 20,
    eps: float = 1e-6,
) -> DataFrame:
    """WHICH groups drifted: per-group PSI between two snapshots —
    ``(group, n_ref, n_cur, psi)``, one row per group present in either
    side.  The per-corpus :func:`histogram_drift` says *that* the mix
    moved; this says *where* (which source, which language, which
    domain), which is what a curation run actually acts on.

    Each group gets its own shared [min, max] across BOTH snapshots
    (computed in ONE grouped aggregate — at most |groups| rows, keyed
    by group, never a global sort) and its own fixed-width bins; PSI
    arithmetic matches :func:`histogram_drift` exactly, including the
    eps clamp and empty-side-means-max-drift semantics.  A group
    present in only one snapshot therefore scores maximal drift rather
    than disappearing.  ``n_ref``/``n_cur`` count VALID (non-NULL,
    non-NaN) values; a group whose rows are all NULL/NaN on BOTH sides
    still gets its row — ``(group, 0, 0, 0.0)`` — because presence is
    taken before the validity filter, so a group that degraded to
    all-NULL shows up as ``n_cur = 0`` instead of vanishing.

    Scale shape — exactly TWO passes over the corpus (the lazy-DAG
    trap of deriving presence/minmax/totals from the same frame would
    otherwise re-scan it per reference; plan-pinned in
    tests/test_plans.py):

    1. stats pass: one grouped aggregate over the tagged union — per
       group, min/max over VALID values (NULL when the group has none).
       ≤ |groups| rows; also the presence list.
    2. bucket pass: re-scan, join the stats frame keyed by group (AQE
       broadcasts when small), bucket valid rows — INVALID rows keep a
       NULL bucket so they carry group presence through the same
       aggregate — then one (group, bucket) count aggregate.

    Everything after is ≤ |groups|·(bins+1) rows: per-group totals via
    a window over the cells, PSI arithmetic, final per-group sum.  No
    collect, no per-group jobs, no extra corpus scans.
    """
    from pyspark_dist_explore_spark.functions.numeric import bucket_col, valid_value

    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1) (the PSI zero-bin clamp), got {eps}")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    # NULL group coalesces to '' — a plain equi-join on group would
    # otherwise silently drop NULL-group rows at the minmax join
    r = ref.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("group"),
        F.col(col).cast("double").alias("v"),
        F.lit("ref").alias("src"),
    )
    c = cur.select(
        F.coalesce(F.col(cur_group_col or group_col).cast("string"), F.lit("")).alias(
            "group"
        ),
        F.col(cur_col or col).cast("double").alias("v"),
        F.lit("cur").alias("src"),
    )
    u0 = r.unionByName(c)
    valid = valid_value(F.col("v"))
    # pass 1: per-group stats over valid values; the row itself is the
    # presence record (a group whose values are all NULL/NaN in both
    # snapshots keeps NULL lo/hi and still reports (0, 0, 0.0))
    stats = u0.groupBy("group").agg(
        F.min(F.when(valid, F.col("v"))).alias("__lo"),
        F.max(F.when(valid, F.col("v"))).alias("__hi"),
    )
    # pass 2: bucket valid rows; invalid rows keep bucket NULL so group
    # presence rides the same (group, bucket) aggregate
    bucketed = u0.join(stats, "group").select(
        "group",
        "src",
        F.when(
            valid & F.col("__lo").isNotNull(),
            bucket_col(F.col("v"), F.col("__lo"), F.col("__hi"), bins),
        ).alias("bucket"),
    )
    cells = bucketed.groupBy("group", "bucket").agg(
        F.sum(F.when(F.col("src") == "ref", 1).otherwise(0)).alias("ref_cnt"),
        F.sum(F.when(F.col("src") == "cur", 1).otherwise(0)).alias("cur_cnt"),
    )
    # per-group totals over the ≤ |groups|·(bins+1)-row cells frame — a
    # window, not a join, so the cells subtree is computed once
    vcell = F.col("bucket").isNotNull()
    w = Window.partitionBy("group")
    cells = cells.withColumn(
        "__tr", F.sum(F.when(vcell, F.col("ref_cnt")).otherwise(0)).over(w)
    ).withColumn(
        "__tc", F.sum(F.when(vcell, F.col("cur_cnt")).otherwise(0)).over(w)
    )
    p = F.greatest(
        F.when(F.col("__tr") > 0, F.col("ref_cnt") / F.col("__tr")).otherwise(0.0),
        F.lit(eps),
    )
    q = F.greatest(
        F.when(F.col("__tc") > 0, F.col("cur_cnt") / F.col("__tc")).otherwise(0.0),
        F.lit(eps),
    )
    psi_term = F.when(vcell, (p - q) * F.log(p / q)).otherwise(F.lit(0.0))
    return (
        cells.withColumn("__psi", psi_term)
        .groupBy("group")
        .agg(
            F.sum(F.when(vcell, F.col("ref_cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_ref"),
            F.sum(F.when(vcell, F.col("cur_cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_cur"),
            F.round(F.sum("__psi"), 10).alias("psi"),
        )
    )
