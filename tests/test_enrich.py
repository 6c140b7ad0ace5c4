"""Realized-strategy feature enrichment (``plans/enrich`` — round-10
verdict item #4). Pure driver-side logic: no SparkSession fixture."""

from __future__ import annotations

import numpy as np

from active_query_optimizer_spark.plans import enrich as E
from active_query_optimizer_spark.plans.featurize import (
    OP_TYPES, FeatureGenerator, PlanNode, from_pg_json, to_pg_json)


def _two_join_tree() -> PlanNode:
    scan = lambda r: PlanNode(op="Seq Scan", relation=r, rows=100.0,  # noqa: E731
                              width=2.0)
    inner = PlanNode(op="Hash Join", rows=50.0, width=4.0,
                     children=[scan("orders"), scan("customer")])
    return PlanNode(op="Hash Join", rows=10.0, width=6.0,
                    children=[inner, scan("lineitem")])


def test_annotate_refines_preorder_joins():
    tree = E.annotate_join_subtypes(
        _two_join_tree(), ("BroadcastHashJoin", "ShuffledHashJoin"))
    assert tree.op == "Broadcast Hash Join"
    assert tree.children[0].op == "Shuffled Hash Join"
    # non-join nodes untouched
    assert tree.children[0].children[0].op == "Seq Scan"


def test_annotate_refuses_on_mismatch():
    base = _two_join_tree()
    # timed-out candidate shape: pre-exec plan, empty realized tuple
    assert E.annotate_join_subtypes(base, ()) is base
    # count mismatch
    assert E.annotate_join_subtypes(base, ("BroadcastHashJoin",)) is base
    # projection mismatch (SortMergeJoin stored as Merge Join, not Hash)
    assert E.annotate_join_subtypes(
        base, ("SortMergeJoin", "BroadcastHashJoin")) is base


def test_enrich_candidates_never_mutates_originals():
    from active_query_optimizer_spark.plans.explore import Candidate

    c = Candidate(variant="default", sql="s", fingerprint="f",
                  plan=_two_join_tree(), exec_time_ms=1.0,
                  realized_joins=("BroadcastHashJoin", "ShuffledHashJoin"))
    [out] = E.enrich_candidates([c])
    assert out.plan.op == "Broadcast Hash Join"
    assert c.plan.op == "Hash Join"  # original untouched
    assert out.exec_time_ms == c.exec_time_ms


def test_enriched_parser_preserves_vocabulary_base_folds_it():
    refined = E.annotate_join_subtypes(
        _two_join_tree(), ("BroadcastHashJoin", "ShuffledHashJoin"))
    blob = to_pg_json(refined, 42.0)
    back, t = E.from_pg_json_enriched(blob)
    assert back.op == "Broadcast Hash Join" and t == 42.0
    # the base parser folds out-of-vocabulary ops to Unknown — the very
    # reason the enriched scoring path needs its own parser
    folded, _ = from_pg_json(blob)
    assert folded.op == "Unknown"


def test_enriched_generator_distinguishes_broadcast_from_shuffle():
    """Two candidates identical except broadcast-vs-shuffled hash join
    must produce DIFFERENT feature trees under the enriched generator
    (under the base one they are identical — the q64-class blindness)."""
    a = E.annotate_join_subtypes(_two_join_tree(),
                                 ("BroadcastHashJoin", "BroadcastHashJoin"))
    b = E.annotate_join_subtypes(_two_join_tree(),
                                 ("ShuffledHashJoin", "ShuffledHashJoin"))
    base = FeatureGenerator().fit([_two_join_tree()], [1.0])
    va = base.transform_tree(_two_join_tree()).vec
    assert va is not None  # base path sanity
    fg = E.EnrichedFeatureGenerator().fit([a, b], [1.0, 2.0])
    assert fg.input_feature_dim == (len(OP_TYPES) + len(E.EXTRA_OPS)
                                    + len(fg.relations) + 1 + 2)
    ta, tb = fg.transform_tree(a), fg.transform_tree(b)
    assert not np.allclose(ta.vec, tb.vec)
    # unrefined (e.g. timed-out) trees still featurize: coarse op one-hot
    tc = fg.transform_tree(_two_join_tree())
    assert tc.vec.shape == ta.vec.shape


def test_enriched_state_roundtrip_through_model_rebuild():
    from active_query_optimizer_spark.model.infer import (_parser_of,
                                                          _rebuild)
    from active_query_optimizer_spark.model.lero import (
        train_pairwise_from_bundles)

    a = E.annotate_join_subtypes(_two_join_tree(),
                                 ("BroadcastHashJoin", "ShuffledHashJoin"))
    b = _two_join_tree()
    model = train_pairwise_from_bundles(
        [("q0", [(a, 10.0), (b, 20.0)])], epochs=2, seed=0,
        feature_generator=E.EnrichedFeatureGenerator())
    state = {"fg": model.fg.state_dict(),
             "weights": model._ensure_net().state_arrays(),
             "hidden": tuple(layer.c_out for layer in model.net.tree
                             if hasattr(layer, "c_out"))}
    assert state["fg"]["kind"] == "enriched"
    local = _rebuild(state)
    assert isinstance(local.fg, E.EnrichedFeatureGenerator)
    parse = _parser_of(local.fg)
    tree = parse(to_pg_json(a))
    assert tree.op == "Broadcast Hash Join"
    # base models keep the base parser
    base_model = train_pairwise_from_bundles(
        [("q0", [(b, 10.0), (_two_join_tree(), 20.0)])], epochs=2, seed=0)
    assert "kind" not in base_model.fg.state_dict()
