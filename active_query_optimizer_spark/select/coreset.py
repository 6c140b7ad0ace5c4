"""MinHash-LSH partitioning + greedy k-center coreset selection.

Rebuilds ``coreset.py:5-131`` Spark-natively (the reference runs datasketch
MinHash + torch matmuls in one process; we reproduce *intent* — its
``coreset()`` even has an undefined-variable bug, ``coreset.py:93``,
SURVEY §2.G):

- ``standardize_and_normalize`` (``coreset.py:100-131``): z-score per
  feature over the full set, then L2 row normalization. Means/stds come
  from one Spark aggregate over the exploded vector; the row transform is a
  vectorized pandas UDF with the tiny (mean, std) state broadcast.
- ``lsh_partition`` (``coreset.py:5-46``): MinHash over the *set of
  positive feature indices* (the reference binarizes exactly this way),
  via ``pyspark.ml.feature.MinHashLSH`` on a sparse binary vector; bucket
  id = first hash value mod ``num_groups``.
- ``greedy_k_center`` (``coreset.py:48-89``): per bucket, repeatedly pick
  the unlabeled point whose max cosine similarity to (labeled ∪ selected)
  is smallest. Greedy selection is sequential *within* a bucket by
  definition — ``applyInPandas`` runs every bucket in parallel, with the
  (small) labeled matrix broadcast; the per-bucket matmuls are numpy.

Scale: buckets are the unit of parallelism — LSH keeps them
similarity-coherent and bounded, so 100 M unlabeled plan embeddings spread
over thousands of buckets, each solved independently. Nothing but the
selected ids ever reaches the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def standardize_and_normalize(df: DataFrame, vec_col: str = "embedding",
                              out_col: str = "norm_vec") -> DataFrame:
    """z-score each dimension over the whole set, then L2-normalize each
    row (``coreset.py:100-131``)."""
    stats = (df.select(F.posexplode(vec_col).alias("dim", "v"))
               .groupBy("dim")
               .agg(F.avg("v").alias("mean"), F.stddev_pop("v").alias("std"))
               .orderBy("dim").collect())
    means = np.array([r["mean"] for r in stats])
    stds = np.array([r["std"] if r["std"] else 1.0 for r in stats])
    stds[stds == 0] = 1.0
    b_stats = df.sparkSession.sparkContext.broadcast((means, stds))

    @F.pandas_udf("array<double>")
    def _norm(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        mu, sd = b_stats.value
        for s in batches:
            if s.empty:
                yield pd.Series([], dtype=object)
                continue
            mat = np.stack(s.to_numpy())
            mat = (mat - mu) / sd
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            yield pd.Series(list(mat / norms))

    return df.withColumn(out_col, _norm(F.col(vec_col)))


def lsh_partition(df: DataFrame, vec_col: str = "norm_vec",
                  num_groups: int = 16, num_hash_tables: int = 8,
                  seed: int = 42, bucket_col: str = "bucket") -> DataFrame:
    """Bucket rows by MinHash over their positive-dimension index set
    (``coreset.py:5-46``: MinHash of ``np.where(vec > 0)``)."""
    from pyspark.ml.feature import MinHashLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array

    # binarize JVM-side (positive dims → 1.0) — a higher-order function,
    # not a Python UDF, so the whole pre-LSH stage stays in codegen
    binarized = F.transform(
        F.col(vec_col), lambda v: F.when(v > 0, 1.0).otherwise(0.0))
    with_bin = df.withColumn("__bin", array_to_vector(binarized))
    mh = MinHashLSH(inputCol="__bin", outputCol="__hashes",
                    numHashTables=num_hash_tables, seed=seed)
    hashed = mh.fit(with_bin).transform(with_bin)
    first_hash = F.element_at(
        vector_to_array(F.element_at(F.col("__hashes"), 1)), 1).cast("long")
    return (hashed
            .withColumn(bucket_col, F.pmod(first_hash, F.lit(num_groups)))
            .drop("__bin", "__hashes"))


def greedy_k_center(df: DataFrame, labeled: np.ndarray | None,
                    k_per_bucket: int, id_col: str = "vec_id",
                    vec_col: str = "norm_vec",
                    bucket_col: str = "bucket") -> DataFrame:
    """Per-bucket greedy k-center (``coreset.py:48-89``): each step selects
    the unlabeled point minimizing max cosine similarity to
    labeled ∪ already-selected; rows are pre-sorted by id so ties break
    deterministically (np.argmin takes the first minimum)."""
    spark = df.sparkSession
    b_labeled = spark.sparkContext.broadcast(
        labeled if labeled is not None and len(labeled) else None)
    id_field = df.schema[id_col]

    def select(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        U = np.stack(pdf[vec_col].to_numpy())        # (n, d), L2-normalized
        L = b_labeled.value
        n = len(pdf)
        k = min(k_per_bucket, n)
        # running max cosine similarity of each unlabeled point to the
        # reference set (labeled ∪ selected); matmul-based like the
        # reference's torch.mm on normalized rows
        max_sim = (U @ L.T).max(axis=1) if L is not None else np.full(n, -np.inf)
        chosen: list[int] = []
        mask = np.zeros(n, dtype=bool)
        for _ in range(k):
            cand = np.where(~mask, max_sim, np.inf)
            pick = int(np.argmin(cand))
            mask[pick] = True
            chosen.append(pick)
            max_sim = np.maximum(max_sim, U @ U[pick])
        return pdf.iloc[chosen][[bucket_col, id_col]]

    schema = StructType([df.schema[bucket_col], StructField(
        id_col, id_field.dataType, id_field.nullable)])
    return df.groupBy(bucket_col).applyInPandas(select, schema)


def coreset_select(df: DataFrame, k_per_bucket: int,
                   labeled: np.ndarray | None = None,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   num_groups: int = 16, seed: int = 42) -> DataFrame:
    """Compose: standardize → LSH partition → per-bucket greedy
    (``coreset.py:91-98``). Returns ``[bucket, id]`` of selected points."""
    normed = standardize_and_normalize(df, vec_col, "norm_vec")
    bucketed = lsh_partition(normed, "norm_vec", num_groups, seed=seed)
    return greedy_k_center(bucketed, labeled, k_per_bucket, id_col,
                           "norm_vec")
