"""Learned plan choice at query time — the system's user-facing payoff.

The reference's test path scores each query's candidate plans and executes
the argmin (``Lero/lero_test.py:82-112``); this module is that loop as an
API: given SQL and a trained ranker, enumerate Spark hint variants
(``plans/explore``), featurize each *un-executed* physical plan (estimates,
no timing), score with the tree-conv net, and return/execute the winner.

Planning cost is a few Catalyst plan compilations + one tiny net forward —
milliseconds against queries that run seconds; and unlike the labeling
path, nothing here executes more than the chosen plan.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from ..model.lero import LeroModel
from ..plans.explore import (HINT_STRATEGIES, Candidate, _conf_overrides,
                             plan_variants)


def choose_plan(spark: SparkSession, sql: str, model: LeroModel,
                strategies: tuple[str, ...] = HINT_STRATEGIES
                ) -> tuple[Candidate, list[tuple[Candidate, float]]]:
    """Score every distinct variant of ``sql``; return the predicted
    cheapest (deterministic tie-break on variant order) plus all scored
    candidates.

    The candidate space is hints + rotations + conf knobs — and, when the
    compiled Catalyst extension is loaded in this session, the injected
    rule's whole-plan modes AND its per-join-index strategy deviations
    (``plans/extension.py``, the reference's per-join-operator
    granularity), deduplicated against the hint variants by plan
    fingerprint: one ranker, every steering mechanism."""
    cands = plan_variants(spark, sql, strategies)
    from ..plans import extension as _ext
    if _ext.is_extension_loaded(spark):
        seen = {c.fingerprint for c in cands}
        for c in (_ext.plan_mode_candidates(spark, sql)
                  + _ext.per_join_candidates(spark, sql, seen=set(seen))):
            if c.fingerprint not in seen:
                seen.add(c.fingerprint)
                cands.append(c)
    if not cands:
        raise ValueError("query produced no plannable variants")
    assert model.fg is not None
    trees = [model.fg.transform_tree(c.plan) for c in cands]
    scores = model.predict(trees)
    order = int(np.argmin(scores))
    return cands[order], list(zip(cands, [float(s) for s in scores]))


def run_optimized(spark: SparkSession, sql: str, model: LeroModel,
                  strategies: tuple[str, ...] = HINT_STRATEGIES) -> DataFrame:
    """Execute ``sql`` under the learned-best join-strategy hints (and the
    candidate's session-conf knobs, when the winner is a conf variant)."""
    best, _ = choose_plan(spark, sql, model, strategies)
    with _conf_overrides(spark, best.conf):
        return spark.sql(best.sql)
