"""Similarity search over the ``embeddings`` table (``array<float>``, 64-d).

Brute-force exact cosine top-k is the correctness baseline (and the oracle);
a random-hyperplane LSH bucketed variant is the 100 TB path — candidates come
from a bucket join instead of a full cross product, then are re-ranked
exactly. The reference's k-center coreset selection (``coreset.py:48-89``)
consumes exactly these cosine primitives.
"""

from __future__ import annotations

import random
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_for_compute, load_table
from ..functions import vector as vec
from .registry import register

TOP_K = 5
N_QUERIES = 10          # query set: vec_id < 10
LSH_TABLES = 8          # independent hash tables
BITS_PER_TABLE = 8      # hyperplane sign bits per table
EMB_DIM = 64

_rng = random.Random(7)
HYPERPLANES = [
    [[_rng.gauss(0.0, 1.0) for _ in range(EMB_DIM)] for _ in range(BITS_PER_TABLE)]
    for _ in range(LSH_TABLES)
]


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {vec.cosine_sql('q.qe', 'e.embedding')} AS cos_sim
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the full
    embedding table, score with JVM-side folds, take per-query top-k with a
    window. One pass over the big side, no shuffle of the corpus — at scale
    the corpus stays partitioned and only per-partition top-k rows move
    (Spark's WindowExec sees N_QUERIES × corpus rows; for large query sets
    switch to the LSH variant)."""
    e = load_for_compute(spark, sf_dir, "embeddings", "vec_id")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                vec.cosine(F.col("qe"), F.col("embedding")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


def _lsh_table_buckets(emb_col) -> F.Column:
    """All ``LSH_TABLES`` bucket ids per embedding, via ONE Arrow-batched
    numpy matmul (rows × 64 planes). Deliberately a pandas UDF, like the
    OPH MinHash signatures: unrolling 8 tables × 8 planes × 64 dims into
    Catalyst fold expressions builds a ~10k-node tree whose per-plan
    analysis + codegen costs seconds — orders of magnitude above the
    actual math. Each bucket id is tagged with its table index
    (``table << BITS_PER_TABLE``) so tables never collide on the join key.
    (UDF constructed per call: ``pandas_udf`` needs an active session.)
    """
    @F.pandas_udf("array<long>")
    def _buckets(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        planes = np.asarray(HYPERPLANES, dtype=np.float64)    # (T, B, D)
        mat = planes.reshape(-1, EMB_DIM).T                   # (D, T*B)
        tags = (np.arange(LSH_TABLES, dtype=np.int64) << BITS_PER_TABLE)
        weights = (1 << np.arange(BITS_PER_TABLE, dtype=np.int64))
        for s in batches:
            if s.empty:
                yield pd.Series([], dtype=object)
                continue
            emb = np.stack(s.to_numpy()).astype(np.float64)   # (n, D)
            bits = (emb @ mat) > 0                            # (n, T*B)
            bits = bits.reshape(len(emb), LSH_TABLES, BITS_PER_TABLE)
            buckets = tags + (bits * weights).sum(axis=2)     # (n, T)
            yield pd.Series(list(buckets))

    return _buckets(emb_col)


@register("ann_lsh_bucketed")
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH
    (8 tables × 8 sign bits, Hamming-1 multiprobe), exact re-rank within
    candidates. Approximate → no SQL oracle; recall vs ``ann_cosine_topk``
    is asserted in tests. At 100 TB each table's bucket id is a shuffle
    key — a query probes 9 of 256 buckets per table instead of scanning
    the corpus, and table count tunes the recall/cost curve."""
    e = load_for_compute(spark, sf_dir, "embeddings", "vec_id")
    base = e.select("vec_id", "embedding",
                    F.explode(_lsh_table_buckets(F.col("embedding")))
                    .alias("bucket"))
    q = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < N_QUERIES)
    # probe set per table: own bucket + every 1-bit flip — 9 cheap XORs
    # over the materialized bucket array per table
    qb = q.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qe"),
                  _lsh_table_buckets(F.col("embedding")).alias("bks"))
    probe_arrays = F.flatten(F.transform(
        F.col("bks"),
        lambda b: F.array(*([b] + [b.bitwiseXOR(F.lit(1 << i))
                                   for i in range(BITS_PER_TABLE)]))))
    qp = qb.select("query_id", "qe", F.explode(probe_arrays).alias("probe"))
    cand = (
        qp.join(base.hint("shuffle_hash"), F.col("probe") == F.col("bucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qe", "embedding")
        .distinct()
        .select("query_id", "neighbor_id",
                vec.cosine(F.col("qe"), F.col("embedding")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.select("query_id", "neighbor_id", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


IVF_K = 16           # coarse-quantizer centroids
IVF_NPROBE = 5       # probed cells per query


def _ivf_fit(spark: SparkSession, sf_dir: str):
    """Shared IVF coarse-quantizer fit: L2-normalized corpus k-means
    (seeded — deterministic) → per-vector cell assignment plus the
    centroid list. Returns ``(assigned, centers)`` where ``assigned``
    carries vec_id, embedding, nemb (normalized), cell."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_for_compute(spark, sf_dir, "embeddings", "vec_id")
    # L2-normalize before clustering: k-means is Euclidean, and on the unit
    # sphere Euclidean ≈ cosine ordering — unnormalized magnitudes would
    # skew the centroids away from angular structure
    norm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"),
                    lambda x: (x * x).cast("double")),
        F.lit(0.0), lambda a, x: a + x))
    e = e.withColumn(
        "nemb", F.transform(F.col("embedding"),
                            lambda x: x / F.greatest(norm, F.lit(1e-12))))
    ev = e.withColumn("fv", array_to_vector(
        F.col("nemb").cast("array<double>")))
    km = KMeans(k=IVF_K, seed=42, featuresCol="fv", predictionCol="cell")
    model = km.fit(ev)
    assigned = model.transform(ev).select("vec_id", "embedding", "nemb",
                                          "cell")
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centers


def _probe_cells(emb_col, centers):
    """nprobe nearest centroids by cosine, as a literal-array expression."""
    cents = np.array(centers)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True),
                            1e-12)
    dots = [vec.dot(emb_col, F.array(*[F.lit(float(x)) for x in row]))
            for row in cn]
    arr = F.array(*[F.struct(d.alias("d"), F.lit(i).alias("i"))
                    for i, d in enumerate(dots)])
    top = F.slice(F.reverse(F.array_sort(arr)), 1, IVF_NPROBE)
    return F.transform(top, lambda s: s["i"])


@register("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    (``pyspark.ml.clustering.KMeans``, seeded) assigns every vector to its
    nearest of ``IVF_K`` centroids; a query scores exact cosine only inside
    its ``IVF_NPROBE`` nearest cells. The classic FAISS-style scale shape:
    the corpus is *partitioned by cell id* — probing is a semi-join on
    cell id + per-cell exact re-rank, touching nprobe/k of the data.
    Approximate → rows-only; recall vs ``ann_cosine_topk`` is pinned in
    tests."""
    assigned, centers = _ivf_fit(spark, sf_dir)
    assigned = assigned.select("vec_id", "embedding", "cell")

    q = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qe")))
    qp = q.select("query_id", "qe",
                  F.explode(_probe_cells(F.col("qe"), centers))
                  .alias("cell"))
    cand = (
        qp.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                vec.cosine(F.col("qe"), F.col("embedding")).alias("cos_sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (cand.select("query_id", "neighbor_id",
                        F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= TOP_K))


@register(
    "knn_label_vote",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
             {vec.cosine_sql('q.qe', 'e.embedding')} AS cos_sim
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ), topk AS (
      SELECT query_id, label FROM (
        SELECT query_id, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id ASC)
                 AS rank
        FROM scored
      ) WHERE rank <= {TOP_K}
    ), votes AS (
      SELECT query_id, label, COUNT(*) AS n_votes FROM topk
      GROUP BY query_id, label
    )
    SELECT v.query_id, v.label AS predicted_label,
           CAST(v.n_votes AS BIGINT) AS n_votes, e.label AS true_label
    FROM (
      SELECT query_id, label, n_votes,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY n_votes DESC, label ASC) AS r
      FROM votes
    ) v JOIN embeddings e ON e.vec_id = v.query_id
    WHERE v.r = 1
    """,
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding table: each query point takes
    the majority label of its ``TOP_K`` exact-cosine neighbors (ties broken
    toward the smaller label, deterministically). Composes the exact top-k
    search with a vote aggregate — the label join touches only k rows per
    query, so the heavy side remains the single scan ``ann_cosine_topk``
    already does; everything after it is k×|queries| rows."""
    e = load_table(spark, sf_dir, "embeddings")
    topk = ann_cosine_topk(spark, sf_dir)
    votes = (topk.join(e.select(F.col("vec_id").alias("neighbor_id"), "label"),
                       "neighbor_id")
             .groupBy("query_id", "label")
             .agg(F.count(F.lit(1)).alias("n_votes")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc())
    best = (votes.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("query_id", F.col("label").alias("predicted_label"),
                    "n_votes"))
    truth = e.select(F.col("vec_id").alias("query_id"),
                     F.col("label").alias("true_label"))
    return best.join(truth, "query_id")


PQ_M = 8            # product-quantizer subspaces (64/8 = 8 dims each)
PQ_KS = 16          # codes per subspace (4-bit codes)
PQ_TRAIN_MAX = 4096  # absolute cap on driver-collected PQ training vectors
PQ_ITERS = 12       # Lloyd iterations per subspace
PQ_RERANK = 100     # ADC shortlist size re-ranked with exact cosine —
#                     sized so PQ recall tracks plain IVF (4-bit codes on
#                     near-uniform sphere data rank coarsely; the exact
#                     re-rank is cheap relative to the probe join, so a
#                     generous shortlist buys recall at ~zero cost)


def _pq_train(sample: "np.ndarray") -> "np.ndarray":
    """Deterministic per-subspace Lloyd k-means on residual samples:
    init = evenly spaced points of the vec_id-sorted sample (no RNG), a
    fixed iteration count, empty clusters re-seeded from the farthest
    point. Returns codebooks of shape (PQ_M, PQ_KS, sub_dim)."""
    n, d = sample.shape
    sub = d // PQ_M
    books = np.empty((PQ_M, PQ_KS, sub))
    for m in range(PQ_M):
        x = sample[:, m * sub:(m + 1) * sub]
        cb = x[np.linspace(0, n - 1, PQ_KS).astype(int)].copy()
        for _ in range(PQ_ITERS):
            d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            code = d2.argmin(1)
            for kk in range(PQ_KS):
                mask = code == kk
                if mask.any():
                    cb[kk] = x[mask].mean(0)
                else:  # re-seed a dead centroid at the worst-served point
                    cb[kk] = x[d2.min(1).argmax()]
        books[m] = cb
    return books


@register("ann_ivf_pq_topk")  # rows-only: approximate (quantized scores);
# recall vs the exact oracle is pinned in tests, like ann_ivf/ann_lsh
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k — the memory-bound 100 TB shape: the IVF
    coarse quantizer routes queries to ``IVF_NPROBE`` cells, but instead
    of exact per-cell scoring the corpus is stored as ``PQ_M`` 4-bit
    codes of the *residual* (vector − cell centroid); candidates are
    scored by asymmetric distance (one ``PQ_M × PQ_KS`` lookup table per
    query, built once driver-side) and only the top ``PQ_RERANK`` ADC
    hits are re-ranked with exact cosine. 64 floats/vector become
    ``PQ_M`` nibbles + a cell id — a ~60× index-size cut, which is what
    lets a 100 TB corpus' index stay in cluster memory.

    Spark shape: encode = ONE Arrow batch per partition (argmin matmul
    against broadcast codebooks, map-only); search = semi-join on cell id
    + an Arrow table-lookup gather per batch; the only shuffles are the
    candidate join and the two tiny top-k windows. Training is
    driver-side Lloyd on a hash-ordered ``LIMIT PQ_TRAIN_MAX`` residual
    sample — a distributed TakeOrdered, so the collect is a fixed
    ``PQ_TRAIN_MAX`` vectors (O(1) in corpus rows) and deterministic
    under any partitioning (xxhash64 order with vec_id tiebreak)."""
    assigned, centers = _ivf_fit(spark, sf_dir)
    cents = np.array(centers)

    # --- train: hash-ordered absolute-size sample (TakeOrdered — the
    # driver receives exactly min(N, PQ_TRAIN_MAX) rows regardless of
    # corpus size), then vec_id-sorted for a partitioning-independent
    # codebook
    samp = (assigned
            .orderBy(F.xxhash64(F.col("vec_id")).asc(),
                     F.col("vec_id").asc())
            .limit(PQ_TRAIN_MAX)
            .select("vec_id", "nemb", "cell").collect())
    samp.sort(key=lambda r: r["vec_id"])
    res = np.stack([np.asarray(r["nemb"]) - cents[r["cell"]] for r in samp])
    books = _pq_train(res)
    b_books = spark.sparkContext.broadcast(books)
    b_cents = spark.sparkContext.broadcast(cents)

    # --- encode the corpus: residual -> PQ_M argmin codes, map-only
    sub = cents.shape[1] // PQ_M

    def encode(batches):
        cb, cc = b_books.value, b_cents.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["nemb"].to_numpy()).astype(np.float64)
            r = v - cc[pdf["cell"].to_numpy()]
            out = {"vec_id": pdf["vec_id"].to_numpy(),
                   "cell": pdf["cell"].to_numpy()}
            for m in range(PQ_M):
                x = r[:, m * sub:(m + 1) * sub]
                d2 = ((x[:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
                out[f"c{m}"] = d2.argmin(1).astype(np.int32)
            yield pd.DataFrame(out)

    code_schema = ("vec_id bigint, cell int, "
                   + ", ".join(f"c{m} int" for m in range(PQ_M)))
    codes = assigned.select("vec_id", "nemb", "cell").mapInPandas(
        encode, code_schema)

    # --- queries: normalized vectors + per-query ADC lookup tables,
    # driver-built (N_QUERIES × PQ_M × PQ_KS floats — trivially bounded)
    qrows = (load_table(spark, sf_dir, "embeddings")
             .filter(F.col("vec_id") < N_QUERIES)
             .select("vec_id", "embedding").collect())
    qrows.sort(key=lambda r: r["vec_id"])
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                     for r in qrows])
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = np.array([r["vec_id"] for r in qrows])
    # lut[q, m, k] = q_sub · codebook[m][k]  (inner-product ADC);
    # score(q, cand) = q·centroid[cell] + Σ_m lut[q, m, code_m]
    lut = np.einsum("qmd,mkd->qmk",
                    qmat.reshape(len(qids), PQ_M, sub), books)
    qdotc = qmat @ cents.T
    b_lut = spark.sparkContext.broadcast(
        {int(q): (lut[i], qdotc[i]) for i, q in enumerate(qids)})

    q = (load_table(spark, sf_dir, "embeddings")
         .filter(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qe")))
    qp = q.select("query_id",
                  F.explode(_probe_cells(F.col("qe"), centers))
                  .alias("cell"))

    cand = qp.join(codes, "cell").filter(
        F.col("vec_id") != F.col("query_id"))

    def adc(batches):
        tables = b_lut.value
        for pdf in batches:
            if not len(pdf):
                continue
            qarr = pdf["query_id"].to_numpy()
            codes_m = np.stack([pdf[f"c{m}"].to_numpy()
                                for m in range(PQ_M)], axis=1)
            score = np.empty(len(pdf))
            for qv in np.unique(qarr):
                l, dc = tables[int(qv)]
                rows = qarr == qv
                score[rows] = (dc[pdf["cell"].to_numpy()[rows]]
                               + l[np.arange(PQ_M)[None, :],
                                   codes_m[rows]].sum(1))
            yield pd.DataFrame({"query_id": qarr,
                                "neighbor_id": pdf["vec_id"].to_numpy(),
                                "adc": score})

    scored = cand.mapInPandas(
        adc, "query_id bigint, neighbor_id bigint, adc double")
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc())
    shortlist = (scored.withColumn("r", F.row_number().over(w_adc))
                 .filter(F.col("r") <= PQ_RERANK)
                 .select("query_id", "neighbor_id"))

    # --- exact re-rank of the ADC shortlist only
    emb = load_table(spark, sf_dir, "embeddings")
    exact = (shortlist
             .join(q, "query_id")
             .join(emb.select(F.col("vec_id").alias("neighbor_id"),
                              F.col("embedding").alias("ne")),
                   "neighbor_id")
             .select("query_id", "neighbor_id",
                     vec.cosine(F.col("qe"), F.col("ne")).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (exact.select("query_id", "neighbor_id",
                         F.row_number().over(w).alias("rank"))
            .filter(F.col("rank") <= TOP_K))
