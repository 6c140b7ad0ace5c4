"""Stable pipeline: label → train pairwise → select → evaluate.

Rebuilds the reference's primary entry point (``stable.py:13-30``,
``Lero/stable.py:11-28``; lifecycle trace in SURVEY.md §3.1), with the PG
plan-explorer stage replaced by Spark hint-variant exploration
(``plans.explore``):

1. label each training query's candidate plans (timed execution);
2. fit ``FeatureGenerator`` + pairwise tree-conv ranker on all candidate
   pairs;
3. score the test queries' candidates (distributed pandas-UDF path when
   given a bundle DataFrame; driver path for lists);
4. report chosen-plan latency dict (``lero_dict.json`` shape) and the
   Spearman ranking loss.

The reference's root ``stable.py:24-26`` divides the summed seconds by 1000
twice (catalogued bug, SURVEY §2.G) — not replicated.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..evaluation.metrics import ranking_loss, selection_report
from ..model.infer import score_plans
from ..model.lero import LeroModelPairWise, train_pairwise_from_bundles
from ..plans.explore import label_workload
from ..plans.featurize import to_pg_json


def run_stable(spark: SparkSession, train_queries: list[tuple[str, str]],
               test_queries: list[tuple[str, str]] | None = None,
               model_dir: str | None = None, epochs: int = 50,
               seed: int = 0) -> dict:
    """Label + train on ``train_queries`` (``(qid, sql)`` against already
    registered views), evaluate on ``test_queries`` (defaults to the train
    set — the reference evaluates a held-out file when present)."""
    labeled = label_workload(spark, train_queries)
    bundles = [(qid, [(c.plan, c.exec_time_ms) for c in cands])
               for qid, cands in labeled]
    model = train_pairwise_from_bundles(bundles, epochs=epochs, seed=seed)

    eval_bundles = bundles
    if test_queries is not None:
        eval_labeled = label_workload(spark, test_queries)
        eval_bundles = [(qid, [(c.plan, c.exec_time_ms) for c in cands])
                        for qid, cands in eval_labeled]

    rows = [(qid, i, to_pg_json(p, t), float(t))
            for qid, cands in eval_bundles
            for i, (p, t) in enumerate(cands)]
    df = spark.createDataFrame(
        rows,
        "qid string, candidate_idx int, plan_json string, exec_time_ms double")
    scored = score_plans(df, model).cache()
    report = selection_report(scored)
    loss = ranking_loss(scored)
    scored.unpersist()

    if model_dir:
        model.save(model_dir)
        with open(os.path.join(model_dir, "lero_dict.json"), "w") as f:
            json.dump(report, f)
    return {"model": model, "lero_dict": report, "ranking_loss": loss,
            "bundles": eval_bundles}
