"""Realized-strategy plan enrichment (round-10 verdict item #4).

The PG-vocabulary projection (``featurize.py`` ↔ ``Lero/feature.py``)
collapses Spark's physical join strategies: ``BroadcastHashJoin`` and
``ShuffledHashJoin`` both featurize as ``Hash Join``, and
``BroadcastNestedLoopJoin``/``CartesianProduct`` both as ``Nested Loop``
— so two candidates that differ ONLY in which side broadcasts vs
shuffles present near-identical feature trees, and the ranker cannot
learn the (large, systematic) runtime difference between them. That is
precisely the q64-class pick documented in ``PRETRAIN_AB.md``: no
training objective flips a pick the features cannot see.

The information needed to refine the ops is ALREADY RECORDED per
candidate: ``Candidate.realized_joins`` holds the preorder join-node
names of the AQE-final executed plan (``explore.py::
realized_join_strategies`` — the round-7 "hints are requests" audit
trail), and ``capture_plan`` walks the same tree in the same preorder.
Zipping the stored tree's join nodes against ``realized_joins``
therefore recovers the realized per-node strategy without relabeling a
single query — the labels and the committed cache are untouched.

This module deliberately lives OUTSIDE the label cache's fingerprinted
set (``labelcache._FINGERPRINT_FILES``): it changes how cached plans
are FEATURIZED for training/scoring, not what the labels mean.

Pieces:

- :func:`annotate_join_subtypes` — a new tree whose join ops carry the
  realized subtype (consistency-checked against the preorder zip; any
  mismatch — e.g. a timed-out candidate labeled with its pre-execution
  plan and an empty ``realized_joins`` — returns the tree unchanged, so
  enrichment degrades to the baseline featurization, never corrupts);
- :func:`enrich_candidates` — bundle-level convenience over Candidates;
- :class:`EnrichedFeatureGenerator` — ``FeatureGenerator`` with the
  extended op vocabulary (+ a plan-JSON parser that preserves it), used
  by ``train_pairwise_from_bundles(feature_generator=...)`` and rebuilt
  on executors via the ``kind`` marker in its state dict.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from .featurize import OP_TYPES, FeatureGenerator, Normalizer, PlanNode

#: executed-plan join node name → (PG-projected op it was stored as,
#: refined op the enriched featurizer sees). SortMergeJoin is already
#: uniquely ``Merge Join`` — refined for uniformity of the mechanism.
REFINEMENTS: dict[str, tuple[str, str]] = {
    "BroadcastHashJoin": ("Hash Join", "Broadcast Hash Join"),
    "ShuffledHashJoin": ("Hash Join", "Shuffled Hash Join"),
    "SortMergeJoin": ("Merge Join", "Merge Join"),
    "BroadcastNestedLoopJoin": ("Nested Loop", "Broadcast Nested Loop"),
    "CartesianProduct": ("Nested Loop", "Cartesian Product"),
}

#: ops a refined tree may carry beyond the base PG vocabulary
EXTRA_OPS = ["Broadcast Hash Join", "Shuffled Hash Join",
             "Broadcast Nested Loop", "Cartesian Product"]

ENRICHED_OP_TYPES = OP_TYPES + EXTRA_OPS
_ENRICHED_OP_INDEX = {t: i for i, t in enumerate(ENRICHED_OP_TYPES)}

_JOIN_OPS = {"Hash Join", "Merge Join", "Nested Loop"}


def annotate_join_subtypes(tree: PlanNode,
                           realized_joins: tuple[str, ...]) -> PlanNode:
    """A new tree whose k-th preorder join node carries the refined op of
    ``realized_joins[k]``. Returns ``tree`` UNCHANGED when the zip is
    inconsistent — count mismatch (timed-out candidate: pre-exec plan,
    empty ``realized_joins``) or a PG-projection mismatch at any node
    (would mean the preorders diverged; refusing is the safe direction).
    """
    joins: list[PlanNode] = []

    def collect(n: PlanNode) -> None:
        if n.op in _JOIN_OPS:
            joins.append(n)
        for c in n.children:
            collect(c)

    collect(tree)
    if len(joins) != len(realized_joins):
        return tree
    for node, name in zip(joins, realized_joins):
        ref = REFINEMENTS.get(name)
        if ref is None or ref[0] != node.op:
            return tree

    it = iter(realized_joins)

    def rebuild(n: PlanNode) -> PlanNode:
        op = n.op
        if n.op in _JOIN_OPS:
            op = REFINEMENTS[next(it)][1]
        return dataclasses.replace(
            n, op=op, children=[rebuild(c) for c in n.children])

    return rebuild(tree)


def enrich_candidates(cands: list) -> list:
    """Candidates with annotated plans (``dataclasses.replace`` — the
    originals, and therefore the label cache they came from, are never
    mutated)."""
    return [dataclasses.replace(
        c, plan=annotate_join_subtypes(c.plan, c.realized_joins))
        for c in cands]


def from_pg_json_enriched(plan: str | dict) -> tuple[PlanNode, float | None]:
    """``from_pg_json`` that preserves the ENRICHED op vocabulary (the
    base parser folds any op outside the PG set to ``Unknown``, which
    would erase the refinement exactly where it matters — the
    distributed scoring path parses plan JSON on executors)."""
    if isinstance(plan, str):
        plan = json.loads(plan)
    if isinstance(plan, list):
        plan = plan[0]
    exec_time = plan.get("Execution Time")
    root = plan["Plan"] if "Plan" in plan else plan

    def build(node: dict) -> PlanNode:
        children = [build(c) for c in node.get("Plans", [])]
        assert len(children) <= 2, "plan node with >2 children"
        op = node.get("Node Type", "Unknown")
        if op not in _ENRICHED_OP_INDEX:
            op = "Unknown"
        cost = node.get("Total Cost")
        return PlanNode(
            op=op,
            relation=node.get("Relation Name"),
            rows=float(node.get("Plan Rows", 0) or 0),
            width=float(node.get("Plan Width", 0) or 0),
            children=children,
            total_cost=float(cost) if cost is not None else None,
        )

    return build(root), exec_time


class EnrichedFeatureGenerator(FeatureGenerator):
    """``FeatureGenerator`` over the extended op vocabulary. Unrefined
    trees (plain PG ops) featurize exactly as before on their shared
    dims — the extra one-hot slots are simply zero — so a bundle mixing
    refined (completed) and unrefined (timed-out) candidates is
    consistent."""

    @property
    def input_feature_dim(self) -> int:
        return len(ENRICHED_OP_TYPES) + len(self.relations) + 1 + 2

    def _node_vec(self, n: PlanNode, rel_counts: np.ndarray) -> np.ndarray:
        one_hot = np.zeros(len(ENRICHED_OP_TYPES))
        one_hot[_ENRICHED_OP_INDEX.get(n.op, 0)] = 1.0
        assert self.row_norm is not None
        return np.concatenate(
            [one_hot, rel_counts, [n.width, self.row_norm.norm(n.rows)]])

    def parse_plan(self, plan_json: str | dict) -> PlanNode:
        """Vocabulary-preserving parser for the executor-side scoring
        path (``infer._rebuild`` dispatches on it when present)."""
        return from_pg_json_enriched(plan_json)[0]

    def state_dict(self) -> dict:
        d = super().state_dict()
        d["kind"] = "enriched"
        return d

    @classmethod
    def from_state(cls, state: dict) -> "EnrichedFeatureGenerator":
        fg = cls()
        fg.row_norm = Normalizer(*state["row_norm"])
        fg.label_norm = Normalizer(*state["label_norm"])
        fg.relations = list(state["relations"])
        fg._rel_index = {r: i for i, r in enumerate(fg.relations)}
        return fg


__all__ = ["annotate_join_subtypes", "enrich_candidates",
           "from_pg_json_enriched", "EnrichedFeatureGenerator",
           "ENRICHED_OP_TYPES", "EXTRA_OPS", "REFINEMENTS"]
