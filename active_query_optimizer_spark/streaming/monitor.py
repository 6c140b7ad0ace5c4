"""Online ingest-volume anomaly monitor — the streaming form of
``operators/analytics.py::events_anomaly_days``.

Shape: a watermarked 1-day tumbling aggregation finalizes one count row
per (event_type, day) in append mode (state bounded by the watermark), and
a ``foreachBatch`` sink folds each finalized day into per-type running
moments ``(n, s, ss)`` — integer, additive, reaggregable — and flags the
day against the history accumulated *before* it using the same
all-integer z-test as the batch operator:

    (n*cnt - s)^2  >  z^2 * n * (n*ss - s^2)

The online semantics differ from the batch op on purpose: the batch form
tests each day against the FULL corpus moments (retrospective audit);
this form tests against PRIOR days only (what a live monitor can know),
after a warm-up of ``MIN_HISTORY_DAYS``.

Scale: the stream state is one (count) row per in-flight day per type;
the driver-side moments dict is 3 ints per event type. The raw events
stream collapses to daily partials map-side before any state is touched —
the same "shuffle aggregates, never rows" discipline as the batch op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.analytics import ANOMALY_Z
from .windowed import ensure_event_time

#: days of history required before the monitor starts flagging
MIN_HISTORY_DAYS = 7


def daily_counts_stream(events: DataFrame,
                        watermark: str = "0 seconds") -> DataFrame:
    """Finalized (event_type, day, cnt) rows: watermarked 1-day tumbling
    counts in append mode. On a batch source, the same plan is a plain
    grouped count (used by the tests' sequential replica)."""
    src = events
    if events.isStreaming:
        src = ensure_event_time(events).withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("win.start").alias("day"), "event_type", "cnt"))


class AnomalyMonitor:
    """foreachBatch sink: fold finalized daily counts into per-type
    moments and flag volume anomalies against prior history."""

    def __init__(self) -> None:
        self.moments: dict[str, tuple[int, int, int]] = {}
        self.flags: dict[tuple[str, object], bool] = {}

    def observe(self, event_type: str, day, cnt: int) -> None:
        n, s, ss = self.moments.get(event_type, (0, 0, 0))
        flag = False
        if n >= MIN_HISTORY_DAYS:
            dev = n * cnt - s
            flag = dev * dev > ANOMALY_Z * ANOMALY_Z * n * (n * ss - s * s)
        self.flags[(event_type, day)] = flag
        self.moments[event_type] = (n + 1, s + cnt, ss + cnt * cnt)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # finalized daily aggregates only — a bounded collect by
        # construction (one row per type per closed day in this batch)
        rows = batch_df.collect()
        # fold in day order so a batch carrying several days replays
        # deterministically
        for r in sorted(rows, key=lambda r: (r["day"], r["event_type"])):
            self.observe(r["event_type"], r["day"], r["cnt"])


def run_monitor_stream(events_stream: DataFrame, checkpoint: str,
                       watermark: str = "0 seconds"):
    """Wire the watermarked daily aggregation into an ``AnomalyMonitor``
    via foreachBatch; returns ``(query, monitor)``. Callers await the
    query, then read ``monitor.flags``."""
    monitor = AnomalyMonitor()
    q = (daily_counts_stream(events_stream, watermark)
         .writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint)
         .foreachBatch(monitor.process_batch)
         .trigger(availableNow=True).start())
    return q, monitor
