"""Streaming-shaped query registrations (X8).

The driver's oracle harness collects a batch DataFrame.  Since round 8
the registered ``events_stream_hist`` runs the REAL Structured
Streaming engine against it (``readStream`` file source →
``availableNow`` trigger → memory sink, complete output mode — the
final state of a complete-mode aggregation over a finite source equals
the batch aggregate, so the DuckDB oracle hash-checks actual streaming
execution).  The other entries remain batch twins: their plan shape
(window expression, session gap logic, interval condition) is identical
to what ``readStream`` executes, but append-mode semantics (watermark
never closing the tail windows of a finite source) make their streaming
results differ from batch by construction — those paths stay
pytest-pinned in tests/test_streaming.py (micro-batches, watermark,
late-data drop, state plateaus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_dist_explore_spark.functions.numeric import bucket_sql
from pyspark_dist_explore_spark.plans.queries import register
from pyspark_dist_explore_spark.sources.tables import load_events_stream, load_table
from pyspark_dist_explore_spark.streaming.histogram_stream import (
    stream_interval_join,
    stream_windowed_histogram,
)

_BINS = 10
_LO, _HI = 0.0, 500.0


_STREAM_HIST_ORACLE = f"""
SELECT CAST(floor(epoch(ts) / 21600.0) AS BIGINT) * 21600 AS window_start,
       {bucket_sql('value', repr(_LO), repr(_HI), _BINS)} AS bucket,
       count(*) AS cnt
FROM events
WHERE value IS NOT NULL AND NOT isnan(value) AND value >= {_LO!r} AND value <= {_HI!r}
GROUP BY 1, 2
"""

#: memory-sink table name for the registered streaming execution — fixed
#: (restarting a stopped query under the same name replaces the table,
#: so repeat builds in one session do not accumulate sinks)
_STREAM_HIST_SINK = "pyspark_dist_explore_events_stream_hist_sink"


def q_events_stream_hist(
    spark: SparkSession, sf_dir: str, *, streaming: bool = False
) -> DataFrame:
    """X8: the streaming windowed histogram — 6-hour tumbling windows,
    fixed range [0, 500] (streams can't take a global min/max pre-pass),
    same bucket expression as the batch histogram; ``window_start``
    emitted as epoch seconds (tz-free).

    ``streaming=True`` (the REGISTERED form, round-8 promotion) executes
    the REAL Structured Streaming engine: ``readStream`` over the same
    parquet bytes (:func:`load_events_stream`), ``availableNow``
    trigger, complete-output memory sink, blocking until the source is
    drained.  A complete-mode aggregation's final state over a finite
    source equals the batch aggregate, so the driver's DuckDB oracle now
    hash-checks actual micro-batch execution — watermark wiring, state
    store and all — not just the shared plan shape.  Default False keeps
    the lazy batch twin (identical plan, job-free construction)."""
    if streaming:
        e = load_events_stream(spark, sf_dir)
    else:
        e = load_table(spark, sf_dir, "events")
    out = stream_windowed_histogram(
        e, window_duration="6 hours", bins=_BINS, range=(_LO, _HI)
    )
    out = out.select(
        F.col("window_start").cast("double").cast("bigint").alias("window_start"),
        "bucket",
        "cnt",
    )
    if not streaming:
        return out
    q = (
        out.writeStream.format("memory")
        .queryName(_STREAM_HIST_SINK)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(_STREAM_HIST_SINK)


@register("events_stream_hist", _STREAM_HIST_ORACLE)
def _q_events_stream_hist_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`q_events_stream_hist` — executes the
    real Structured Streaming path (``streaming=True``)."""
    return q_events_stream_hist(spark, sf_dir, streaming=True)


@register(
    "events_interval_join",
    """
SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
""",
)
def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8d: the stream-stream interval join's batch twin — click events
    attribute to same-user view events within 30 minutes after the view.
    The PLAN here (key equi-join + event-time interval condition) is the
    one ``readStream`` executes; the streaming path itself (dual
    watermark, bounded state, late-data eviction) is pytest-pinned in
    tests/test_streaming.py.  Registered round 4 so the last round-3
    flagship gains a driver oracle row."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    j = stream_interval_join(views, clicks, "user_id", within="30 minutes")
    return j.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("event_id_r").alias("click_id"),
    )


@register(
    "events_session_window",
    """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
),
flagged AS (
  SELECT user_id, sec,
         CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT user_id, sec,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY sec
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, min(sec) AS session_start, max(sec) AS session_last, count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
""",
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — ``session_window`` is the
    Structured Streaming primitive; the DuckDB oracle is the classic
    gaps-and-islands rewrite of the same semantics.

    Second-granularity epochs on both sides (sub-second event spacing
    within one user never straddles the 30-min gap test).
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000000000").alias("sec")
    )
    flagged = e.select(
        "user_id",
        "sec",
        F.when(
            F.col("sec")
            - F.lag("sec").over(Window.partitionBy("user_id").orderBy("sec"))
            > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "sec",
        F.sum("new_session")
        .over(
            Window.partitionBy("user_id")
            .orderBy("sec")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("sec").alias("session_start"),
        F.max("sec").alias("session_last"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("session_id")
