"""Label-cache unit tests (``plans/labelcache`` — round-5 verdict #2).

The end-to-end cold/warm behavior is pinned in
``test_pipeline.py::test_optimizer_results_regenerate_sf001``; these
tests pin the key/serialization contracts that make a stale label
impossible: key sensitivity to every input including the code
fingerprint, exact Candidate round-trip, and the hit path never
touching the cluster.
"""

from __future__ import annotations

import gzip
import json
import os

from active_query_optimizer_spark.plans.explore import Candidate
from active_query_optimizer_spark.plans.featurize import PlanNode
from active_query_optimizer_spark.plans import labelcache as LC


def _cand() -> Candidate:
    plan = PlanNode(op="Hash Join", rows=10.0, width=2.0, children=[
        PlanNode(op="Seq Scan", relation="orders", rows=100.0, width=3.0),
        PlanNode(op="Seq Scan", relation="customer", rows=50.0, width=2.0),
    ])
    return Candidate(variant="shuffle_hash", sql="SELECT 1",
                     fingerprint="fp1", plan=plan, exec_time_ms=123.5,
                     conf={"spark.sql.adaptive.enabled": "false"},
                     realized_joins=("ShuffledHashJoin",),
                     hint_realized=True)


def test_bundle_key_sensitive_to_every_input(monkeypatch):
    base = LC.bundle_key("SELECT 1", ("A", "B"), 30.0, "/data/sf0.1")
    assert LC.bundle_key("SELECT 1", ("A", "B"), 30.0, "/data/sf0.1") == base
    assert LC.bundle_key("SELECT 2", ("A", "B"), 30.0, "/data/sf0.1") != base
    assert LC.bundle_key("SELECT 1", ("A",), 30.0, "/data/sf0.1") != base
    assert LC.bundle_key("SELECT 1", ("A", "B"), 60.0, "/data/sf0.1") != base
    assert LC.bundle_key("SELECT 1", ("A", "B"), 30.0, "/data/sf1") != base
    # code-fingerprint invalidation: any labeling-code change re-keys
    monkeypatch.setattr(LC, "code_fingerprint", lambda: "deadbeef")
    assert LC.bundle_key("SELECT 1", ("A", "B"), 30.0, "/data/sf0.1") != base


def test_candidate_roundtrip_exact():
    c = _cand()
    [back] = LC._decode(LC._encode([c]))
    assert back.variant == c.variant and back.sql == c.sql
    assert back.fingerprint == c.fingerprint
    assert back.exec_time_ms == c.exec_time_ms
    assert back.conf == c.conf
    assert back.realized_joins == c.realized_joins
    assert back.hint_realized is True
    assert back.plan.preorder_ops() == c.plan.preorder_ops()
    assert back.plan.children[0].relation == "orders"
    assert back.plan.rows == 10.0 and back.plan.width == 2.0


def test_hit_path_never_touches_the_cluster(tmp_path):
    """A present cache file must satisfy the call without a SparkSession
    (spark=None would explode on any live-labeling path)."""
    cache = str(tmp_path)
    key = LC.bundle_key("SELECT 1", ("A",), 30.0, "/data/sf0.1")
    with gzip.open(os.path.join(cache, f"{key}.json.gz"), "wt") as fh:
        json.dump(LC._encode([_cand()]), fh)
    out = LC.cached_label_query(None, "SELECT 1", ("A",), 30.0,
                                "/data/sf0.1", cache)
    assert len(out) == 1 and out[0].exec_time_ms == 123.5
