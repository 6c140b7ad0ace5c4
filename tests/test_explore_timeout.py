"""Unit tests for the hardened labeling watchdog (``_time_execution``).

The live zombie incident (round 6: one variant pinned a stage for 18+
minutes through its 30 s watchdog) is hard to reproduce on demand, so
these tests drive the escalation state machine with a stub DataFrame
whose ``collect()`` behavior is scripted — no SparkSession involved.
"""

from __future__ import annotations

import threading
import time

import pytest

from active_query_optimizer_spark.plans.explore import (
    ZombieExecutionError, _time_execution)
from active_query_optimizer_spark.plans import explore as X


class _FakeSC:
    def __init__(self, cancel_unblocks: threading.Event | None = None,
                 cancel_all_unblocks: threading.Event | None = None):
        self.group_cancels = 0
        self.all_cancels = 0
        self._cancel_unblocks = cancel_unblocks
        self._cancel_all_unblocks = cancel_all_unblocks

    def setJobGroup(self, *a, **k):
        pass

    def cancelJobGroup(self, group):
        self.group_cancels += 1
        if self._cancel_unblocks is not None:
            self._cancel_unblocks.set()

    def cancelAllJobs(self):
        self.all_cancels += 1
        if self._cancel_all_unblocks is not None:
            self._cancel_all_unblocks.set()


class _FakeDF:
    """collect() runs `behavior(stop_event)`; the stop event is set by
    whichever cancel level the scenario wires it to."""

    def __init__(self, sc: _FakeSC, behavior):
        self._behavior = behavior
        self.sparkSession = type("S", (), {"sparkContext": sc})()

    def collect(self):
        return self._behavior()


@pytest.fixture(autouse=True)
def _fast_escalation(monkeypatch):
    monkeypatch.setattr(X, "_CANCEL_RETRY_WAIT_S", 0.2)
    monkeypatch.setattr(X, "_CANCEL_ALL_WAIT_S", 0.3)


def test_fast_success_measures_wall_clock():
    sc = _FakeSC()
    df = _FakeDF(sc, lambda: time.sleep(0.05))
    ms = _time_execution(df, timeout_s=5.0)
    assert ms is not None and 30 <= ms < 2000
    assert sc.group_cancels == 0 and sc.all_cancels == 0


def test_real_error_before_deadline_reraises():
    sc = _FakeSC()

    def boom():
        raise ValueError("analysis error")

    with pytest.raises(ValueError):
        _time_execution(_FakeDF(sc, boom), timeout_s=5.0)


def test_timeout_cancel_lands_returns_none():
    """The normal penalty path: the group cancel makes collect() raise."""
    cancelled = threading.Event()
    sc = _FakeSC(cancel_unblocks=cancelled)

    def hang_until_cancel():
        assert cancelled.wait(10.0)
        raise RuntimeError("job cancelled")  # what py4j surfaces

    assert _time_execution(_FakeDF(sc, hang_until_cancel),
                           timeout_s=0.2) is None
    assert sc.group_cancels >= 1


def test_escalates_to_cancel_all_then_returns_none():
    """Group cancels ignored (the AQE follow-on-job hole); cancelAllJobs
    finally lands."""
    all_cancelled = threading.Event()
    sc = _FakeSC(cancel_all_unblocks=all_cancelled)

    def hang_until_cancel_all():
        assert all_cancelled.wait(10.0)
        raise RuntimeError("job cancelled")

    assert _time_execution(_FakeDF(sc, hang_until_cancel_all),
                           timeout_s=0.2) is None
    assert sc.group_cancels == X._CANCEL_RETRIES
    assert sc.all_cancels == 1


def test_interrupt_immune_action_raises_zombie():
    sc = _FakeSC()
    never = threading.Event()

    def ignore_everything():
        never.wait(30.0)  # longer than the whole escalation window

    with pytest.raises(ZombieExecutionError):
        _time_execution(_FakeDF(sc, ignore_everything), timeout_s=0.2)
    assert sc.group_cancels == X._CANCEL_RETRIES
    assert sc.all_cancels == 1


def test_finish_inside_cancel_window_keeps_real_label():
    """collect() completes AFTER the deadline but BEFORE a cancel lands —
    the measured wall clock is still a valid (slow) label."""
    sc = _FakeSC()
    df = _FakeDF(sc, lambda: time.sleep(0.35))
    ms = _time_execution(df, timeout_s=0.2)
    assert ms is not None and ms >= 300
