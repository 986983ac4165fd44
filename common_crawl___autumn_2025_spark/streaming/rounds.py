"""Streaming-shaped queries (SURVEY.md §2.9).

The crawl loop's micro-batch semantics live in crawl/frontier.py
(deterministic, checkpointed rounds — the engine's own state store).
This module adds the relational streaming surface: tumbling windows,
sessionization, and a true Structured Streaming runner used by tests
(parquet source → watermarked windowed agg → availableNow trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import load, register


@register(
    "st01_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def st01_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour window aggregation — the batch expression of
    the streaming windowed count (identical plan under readStream;
    see stream_events_windowed + tests/test_streaming.py)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "st02_sessionization",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id,
           event_id
    FROM gaps
    """,
)
def st02_sessionization(spark, sf_dir):
    """Session windows via gap detection (30-min inactivity): the
    relational form of session_window / applyInPandasWithState —
    deterministic and oracle-checkable."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        load(spark, sf_dir, "events")
        .withColumn("is_new", is_new)
        .select(
            "user_id",
            F.sum("is_new").over(cum).cast("long").alias("session_id"),
            "event_id",
        )
    )


def stream_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming: parquet source, 10-min watermark,
    tumbling 1-hour windowed count, availableNow trigger draining to a
    memory sink. Returns the sink contents (tests compare to batch)."""
    import os
    import shutil
    import tempfile

    batch = load(spark, sf_dir, "events")
    # the file stream source requires a directory; expose the events
    # parquet through a temp dir (read-only testdata stays untouched)
    stage_dir = tempfile.mkdtemp(prefix="stream_events_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(stage_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir)
    )
    # watermarks require TIMESTAMP (tz-aware); the parquet column is
    # NTZ — cast in (UTC session), cast the window back out so the
    # result aligns with the batch (NTZ) twin.
    agg = (
        stream.withColumn("ts_utc", F.col("ts").cast("timestamp"))
        .withWatermark("ts_utc", "10 minutes")
        .groupBy(F.window("ts_utc", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
        )
    )
    name = "stream_events_windowed_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
    return spark.sql(f"SELECT * FROM {name}")
