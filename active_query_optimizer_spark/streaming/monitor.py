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

import datetime
import json
import os
import re

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
    moments and flag volume anomalies against prior history.

    With ``state_dir`` set, the per-type ``(n, s, ss)`` moments are
    snapshotted to ``state_dir/batch-<id>.json`` after every batch and the
    newest snapshot is reloaded on construction. That makes restarts
    against an *existing* streaming checkpoint correct: Spark skips the
    already-committed batches, and the reloaded moments mean subsequent
    days are flagged against the full prior history instead of an empty
    one. A batch re-delivered after a pre-commit crash is folded onto the
    PREDECESSOR snapshot (never double-counted). Without ``state_dir``
    the monitor is in-memory only and the checkpoint dir must be fresh
    per instance. Snapshot cost: one tiny JSON (3 ints per event type,
    plus the flag log) per batch — bounded by event-type cardinality, not
    by stream volume."""

    def __init__(self, state_dir: str | None = None) -> None:
        self.moments: dict[str, tuple[int, int, int]] = {}
        self.flags: dict[tuple[str, object], bool] = {}
        self.state_dir = state_dir
        self._last_batch = -1
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._restore(self._latest_snapshot_id())

    # --- snapshot plumbing (local/driver filesystem — the monitor itself
    # is a driver-side singleton, so driver-local durable storage is the
    # right layer; point state_dir at shared storage for driver failover)
    def _snap_path(self, batch_id: int) -> str:
        return os.path.join(self.state_dir, f"batch-{batch_id}.json")

    def _latest_snapshot_id(self) -> int:
        ids = [int(m.group(1)) for f in os.listdir(self.state_dir)
               if (m := re.fullmatch(r"batch-(\d+)\.json", f))]
        return max(ids, default=-1)

    def _restore(self, batch_id: int) -> None:
        self.moments, self.flags, self._last_batch = {}, {}, -1
        if batch_id < 0 or not self.state_dir:
            return
        with open(self._snap_path(batch_id)) as fh:
            snap = json.load(fh)
        self.moments = {t: tuple(v) for t, v in snap["moments"].items()}
        self.flags = {(t, datetime.datetime.fromisoformat(d)): bool(f)
                      for t, d, f in snap["flags"]}
        self._last_batch = snap["batch_id"]

    def _snapshot(self, batch_id: int) -> None:
        snap = {"batch_id": batch_id,
                "moments": {t: list(v) for t, v in self.moments.items()},
                "flags": [[t, d.isoformat(), f]
                          for (t, d), f in self.flags.items()]}
        tmp = self._snap_path(batch_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(snap, fh)
        os.replace(tmp, self._snap_path(batch_id))

    def observe(self, event_type: str, day, cnt: int) -> None:
        n, s, ss = self.moments.get(event_type, (0, 0, 0))
        flag = False
        if n >= MIN_HISTORY_DAYS:
            dev = n * cnt - s
            flag = dev * dev > ANOMALY_Z * ANOMALY_Z * n * (n * ss - s * s)
        self.flags[(event_type, day)] = flag
        self.moments[event_type] = (n + 1, s + cnt, ss + cnt * cnt)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.state_dir and batch_id <= self._last_batch:
            # re-delivery (crash between snapshot and checkpoint commit):
            # rewind to the state BEFORE this batch, then fold it once
            self._restore(batch_id - 1)
        # finalized daily aggregates only — a bounded collect by
        # construction (one row per type per closed day in this batch)
        rows = batch_df.collect()
        # fold in day order so a batch carrying several days replays
        # deterministically
        for r in sorted(rows, key=lambda r: (r["day"], r["event_type"])):
            self.observe(r["event_type"], r["day"], r["cnt"])
        if self.state_dir:
            self._snapshot(batch_id)
            self._last_batch = batch_id


def run_monitor_stream(events_stream: DataFrame, checkpoint: str,
                       watermark: str = "0 seconds",
                       state_dir: str | None = None):
    """Wire the watermarked daily aggregation into an ``AnomalyMonitor``
    via foreachBatch; returns ``(query, monitor)``. Callers await the
    query, then read ``monitor.flags``. Pass ``state_dir`` whenever
    ``checkpoint`` may be reused across restarts — it persists the
    monitor's moment history so skipped (already-committed) batches don't
    restart the warm-up from zero."""
    monitor = AnomalyMonitor(state_dir)
    q = (daily_counts_stream(events_stream, watermark)
         .writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint)
         .foreachBatch(monitor.process_batch)
         .trigger(availableNow=True).start())
    return q, monitor
