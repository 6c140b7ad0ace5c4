"""Distributed plan scoring + plan selection.

The reference scores candidates in a driver loop (``Lero/lero_test.py:
82-112``); at fleet scale (millions of plan candidates logged per day) the
scoring must run where the plans live. Here:

- ``score_plans``: Arrow-batched pandas UDF over a ``plan_json`` column;
  the numpy net weights + featurizer state broadcast once per job (KB-MB),
  each batch re-hydrates the net locally and scores a few thousand trees
  vectorized — no per-row Python round trips.
- ``choose_best``: per-query argmin of predicted score =
  ``row_number() over (partition by qid order by score, idx)`` — one
  shuffle on qid; the idx tie-break keeps the winner deterministic
  (``lero_test.py:97`` argmin takes the first minimum the same way).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.featurize import FeatureGenerator, from_pg_json, prepare_trees
from .lero import LeroModel
from .tcnn import LeroNet


def _model_state(model: LeroModel) -> dict:
    net = model._ensure_net()
    assert model.fg is not None
    return {
        "fg": model.fg.state_dict(),
        "weights": {k: v.copy() for k, v in net.state_arrays().items()},
        "hidden": tuple(layer.c_out for layer in net.tree
                        if hasattr(layer, "c_out")),
    }


def _rebuild(state: dict) -> LeroModel:
    if state["fg"].get("kind") == "enriched":
        from ..plans.enrich import EnrichedFeatureGenerator

        fg = EnrichedFeatureGenerator.from_state(state["fg"])
    else:
        fg = FeatureGenerator.from_state(state["fg"])
    model = LeroModel(fg)
    model.net = LeroNet(fg.input_feature_dim, hidden=state["hidden"])
    model.net.load_state_arrays(state["weights"])
    return model


def _parser_of(fg: FeatureGenerator):
    """The featurizer's plan-JSON parser: an enriched generator preserves
    its extended op vocabulary (``parse_plan``); the base generator keeps
    the reference's Unknown-folding ``from_pg_json``."""
    custom = getattr(fg, "parse_plan", None)
    return custom if custom is not None else (lambda p: from_pg_json(p)[0])


def score_plans(df: DataFrame, model: LeroModel,
                plan_col: str = "plan_json",
                score_col: str = "score") -> DataFrame:
    """Append ``score_col`` = learned cost of each plan-JSON row."""
    spark = df.sparkSession
    b_state = spark.sparkContext.broadcast(_model_state(model))

    @F.pandas_udf("double")
    def _score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        local = _rebuild(b_state.value)
        for s in batches:
            if s.empty:
                yield pd.Series([], dtype=float)
                continue
            parse = _parser_of(local.fg)
            trees = [local.fg.transform_tree(parse(p)) for p in s]
            feats, idx, nn = prepare_trees(trees)
            scores, _ = local.net.forward(feats, idx, nn)
            yield pd.Series(np.asarray(scores, dtype=float))

    return df.withColumn(score_col, _score(F.col(plan_col)))


def plan_embeddings(df: DataFrame, model: LeroModel,
                    plan_col: str = "plan_json",
                    emb_col: str = "embedding") -> DataFrame:
    """Append the 64-d pooled plan embedding (feeds coreset selection —
    reference ``lero_train.py:224-241``)."""
    spark = df.sparkSession
    b_state = spark.sparkContext.broadcast(_model_state(model))

    @F.pandas_udf("array<double>")
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        local = _rebuild(b_state.value)
        for s in batches:
            if s.empty:
                yield pd.Series([], dtype=object)
                continue
            parse = _parser_of(local.fg)
            trees = [local.fg.transform_tree(parse(p)) for p in s]
            feats, idx, nn = prepare_trees(trees)
            _, emb = local.net.forward(feats, idx, nn)
            yield pd.Series(list(np.asarray(emb, dtype=float)))

    return df.withColumn(emb_col, _embed(F.col(plan_col)))


def choose_best(df: DataFrame, qid_col: str = "qid",
                score_col: str = "score",
                idx_col: str = "candidate_idx",
                default_margin: float | None = None,
                variant_col: str = "variant") -> DataFrame:
    """One row per query: the candidate with the lowest predicted score
    (deterministic tie-break on candidate index).

    ``default_margin`` (NON-REFERENCE, opt-in — the reference argmins
    unconditionally, ``lero_test.py:97``) enables the default-prior
    near-tie guard from the round-13 q180 anatomy (SCALE.md): when the
    default plan's predicted score is within the given RELATIVE margin
    of the argmin candidate's, keep the default plan — the
    plan-regression posture (don't deviate from Catalyst's own choice
    without predicted-confidence). Requires ``variant_col``; queries
    whose bundle has no default row fall back to plain argmin. All
    window-side, no driver loop — the guard scales with the scoring
    fan-out."""
    w = Window.partitionBy(qid_col).orderBy(F.col(score_col).asc(),
                                            F.col(idx_col).asc())
    ranked = df.withColumn("__rn", F.row_number().over(w))
    if not default_margin:
        return ranked.where(F.col("__rn") == 1).drop("__rn")
    part = Window.partitionBy(qid_col)
    is_def = F.col(variant_col) == "default"
    guarded = (
        ranked
        .withColumn("__min_s", F.min(score_col).over(part))
        .withColumn("__def_s", F.min(F.when(is_def, F.col(score_col)))
                    .over(part))
        # relative margin, clamped so a ~0 argmin score can't make the
        # guard vacuous; scores are latency-scale positives after the
        # pointwise pretrain
        .withColumn("__keep_default",
                    F.col("__def_s").isNotNull()
                    & (F.col("__def_s") <= F.col("__min_s")
                       + F.lit(float(default_margin))
                       * F.greatest(F.abs(F.col("__min_s")),
                                    F.lit(1e-9)))))
    return (guarded
            .where((F.col("__keep_default") & is_def)
                   | (~F.col("__keep_default") & (F.col("__rn") == 1)))
            .drop("__rn", "__min_s", "__def_s", "__keep_default"))
