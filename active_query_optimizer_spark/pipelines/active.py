"""Active-learning loop: choose which pool queries to label next.

This is the composition the reference exists for (its README workflow:
generate a pool → label a seed → train → embed → coreset-select the next
labeling batch → retrain): ``coreset.py`` supplies the selection,
``lero_train.get_feaure`` the embeddings, and the PG explorer the labels.
Here each piece is the Spark-native rebuild:

  pool workload (DataFrame)            workload/generate
  seed labeling (hint exploration)     plans/explore
  pairwise ranker                      model/lero
  pool plan embeddings                 model/infer.plan_embeddings (UDF)
  MinHash-LSH + greedy k-center        select/coreset
  next labeling batch                  ← selected ids

Labeling cost is the scarce resource (each label = executing every
candidate plan); everything else is cheap Spark jobs — which is why the
embeddings and selection run distributed over the *unlabeled* pool and only
the selected handful of queries ever reach the timed-execution stage.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.infer import plan_embeddings
from ..model.lero import LeroModelPairWise, train_pairwise_from_bundles
from ..plans.explore import label_workload, plan_variants
from ..plans.featurize import to_pg_json
from ..select.coreset import coreset_select


def pool_default_plans(spark: SparkSession,
                       pool: list[tuple[str, str]]) -> DataFrame:
    """Each pool query's Catalyst-default plan as a bundle row
    ``[qid, plan_json]`` — the cheap (un-executed, estimate-based)
    representation the embeddings are computed from."""
    rows = []
    for qid, sql in pool:
        cands = plan_variants(spark, sql, strategies=(),
                              join_order_rotations=0, conf_variants=())
        if cands:
            rows.append((qid, to_pg_json(cands[0].plan)))
    return spark.createDataFrame(rows, "qid string, plan_json string")


def select_next_batch(spark: SparkSession, model: LeroModelPairWise,
                      pool: list[tuple[str, str]], k: int,
                      labeled_qids: set[str],
                      num_groups: int = 4, seed: int = 42) -> list[str]:
    """Coreset-select ``k``-ish pool queries most distant (in plan-embedding
    space) from everything already labeled (reference ``coreset.py:91-98``:
    LSH partition → per-group greedy k-center against the labeled set)."""
    unlabeled = [(q, s) for q, s in pool if q not in labeled_qids]
    if not unlabeled:
        return []
    pool_df = pool_default_plans(spark, unlabeled)
    emb = plan_embeddings(pool_df, model).select(
        F.col("qid"), F.col("embedding"))

    labeled_pool = [(q, s) for q, s in pool if q in labeled_qids]
    labeled_mat = None
    if labeled_pool:
        ldf = pool_default_plans(spark, labeled_pool)
        lemb = plan_embeddings(ldf, model).select("embedding").collect()
        if lemb:
            mat = np.stack([np.array(r["embedding"]) for r in lemb])
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            labeled_mat = mat / norms

    k_per_bucket = max(1, round(k / num_groups))
    sel = coreset_select(emb, k_per_bucket=k_per_bucket, labeled=labeled_mat,
                         id_col="qid", vec_col="embedding",
                         num_groups=num_groups, seed=seed)
    return [r["qid"] for r in sel.collect()]


def run_active_loop(spark: SparkSession, pool: list[tuple[str, str]],
                    seed_batch: int = 4, batch_size: int = 4,
                    rounds: int = 2, epochs: int = 15,
                    seed: int = 0) -> dict:
    """Bootstrap-label ``seed_batch`` queries, then for each round: train,
    embed the pool, coreset-select ``batch_size`` new queries, label them,
    fold into the training set. Returns the model + labeling history."""
    by_qid = dict(pool)
    labeled: list = []
    labeled_qids: set[str] = set()

    first = [q for q, _ in pool[:seed_batch]]
    labeled += label_workload(spark, [(q, by_qid[q]) for q in first])
    labeled_qids |= set(first)
    history = [sorted(first)]

    model = None
    for r in range(rounds):
        bundles = [(qid, [(c.plan, c.exec_time_ms) for c in cands])
                   for qid, cands in labeled if len(cands) >= 2]
        model = train_pairwise_from_bundles(bundles, epochs=epochs,
                                            seed=seed + r)
        picked = select_next_batch(spark, model, pool, batch_size,
                                   labeled_qids, seed=seed)
        if not picked:
            break
        labeled += label_workload(spark, [(q, by_qid[q]) for q in picked])
        labeled_qids |= set(picked)
        history.append(sorted(picked))

    return {"model": model, "labeled_qids": labeled_qids,
            "history": history, "bundles": labeled}
