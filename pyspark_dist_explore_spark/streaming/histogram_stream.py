"""Structured Streaming operators (SURVEY.md §2.2 X2/X8).

The streaming histogram is the same bucket expression as the batch path
(functions/numeric.py) grouped by a tumbling/sliding event-time window —
state per window is ≤ bins counters, trivially bounded; the watermark
closes windows and bounds late data.  ``range`` must be supplied (a
stream has no global min/max); pick it from a batch profile or a
domain bound.

Sinks: any ``writeStream`` target works; tests use the memory sink with
append mode so only watermark-finalized windows emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_dist_explore_spark.functions.numeric import bucket_col, in_range, valid_value


def stream_windowed_histogram(
    events: DataFrame,
    *,
    value_col: str = "value",
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    bins: int = 10,
    range: tuple[float, float] = (0.0, 500.0),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-window fixed-width histogram of a streaming value column.

    Works identically on a batch DataFrame (drop the watermark no-op) —
    the oracle-checked batch twin in plans/ is literally this plan.
    """
    if not range[0] <= range[1]:
        raise ValueError(f"range must be (lo, hi) with lo <= hi, got {range}")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    lo, hi = F.lit(float(range[0])), F.lit(float(range[1]))
    v = F.col(value_col).cast("double")
    source = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        source.where(valid_value(v) & in_range(v, lo, hi))
        .groupBy(
            F.window(ts_col, window_duration).alias("w"),
            bucket_col(v, lo, hi, bins).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "cnt",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """X2: streaming-safe exact dedup — state bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` keeps each key's state only until
    the watermark passes it, so unbounded streams don't accumulate
    unbounded dedup state (plain ``dropDuplicates`` on a stream would).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
