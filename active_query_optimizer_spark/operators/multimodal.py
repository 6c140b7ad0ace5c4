"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is stubbed: the
default ``fake`` decoder derives deterministic per-payload features (so the
Spark-side plumbing — schema, batching, partitioning — is real and tested);
``real`` raises ``NotImplementedError`` at the exact point a codec would
plug in. The oracle-checked query covers the deterministic byte-level
features; the mapInPandas pipeline is exercised by tests and the rows-only
driver check.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import register

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("last_byte", T.IntegerType()),
    T.StructField("byte_sum_mod", T.LongType()),
])


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the multimodal shape from ``documents``: payload as an opaque
    binary column + typed metadata struct — the schema an image/audio table
    would have (payload would be JPEG/PCM bytes instead of UTF-8 text)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col("text")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, kind: str = "fake"):
    """Decode stub. ``real`` is where PIL/librosa/pyav would decode into an
    ndarray — unavailable in this container by design."""
    if kind == "real":
        raise NotImplementedError(
            "media codecs are not installed; plug PIL/librosa/pyav in here")
    # deterministic fake: byte-level summary features
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "last_byte": payload[-1] if payload else -1,
        "byte_sum_mod": sum(payload) % 100_000_007,
    }


def extract_features(df: DataFrame, kind: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. This is the
    pattern for any decode/resize/frame-sample stage: ``mapInPandas`` keeps
    the transfer vectorized and the operation partition-parallel — no
    driver-side loop, no per-row Python overhead."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_payload(p, kind) for p in pdf["payload"]]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "kind": kind,
                "n_bytes": [f["n_bytes"] for f in feats],
                "first_byte": [f["first_byte"] for f in feats],
                "last_byte": [f["last_byte"] for f in feats],
                "byte_sum_mod": [f["byte_sum_mod"] for f in feats],
            })
            yield out

    return df.mapInPandas(batches, FEATURE_SCHEMA)


@register(
    "multimodal_bytes_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           greatest(ord(text[1:1]), -1) AS first_byte,
           greatest(ord(text[len(text):len(text)]), -1) AS last_byte
    FROM documents
    """,
)
def multimodal_bytes_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level payload features via pure Column ops (oracle-checked
    twin of the mapInPandas pipeline; ASCII corpus ⇒ first/last byte ==
    first/last char code)."""
    b = binary_table(spark, sf_dir)
    s = F.col("payload").cast("string")
    empty = F.octet_length(s) == 0
    return b.select(
        "doc_id",
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
        F.when(empty, -1).otherwise(F.ascii(F.substring(s, 1, 1))).alias("first_byte"),
        F.when(empty, -1).otherwise(F.ascii(F.substring(s, -1, 1))).alias("last_byte"),
    )


@register("multimodal_feature_extract")
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real mapInPandas decode pipeline with the deterministic fake
    decoder (rows-only driver check; exact values asserted in tests against
    the Column-op twin)."""
    return extract_features(binary_table(spark, sf_dir), kind="fake")


# ---------------------------------------------------------------------------
# Resize / frame-sample pipeline shapes (codecs stubbed; plumbing real)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("pixels", T.ArrayType(T.FloatType())),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_ts_ms", T.LongType()),
    T.StructField("frame_bytes", T.BinaryType()),
])


def resize_images(df: DataFrame, width: int = 8, height: int = 8,
                  kind: str = "fake") -> DataFrame:
    """Image-resize stage shape: binary payload → fixed (width×height)
    float grid. ``real`` is the PIL/cv2 plug point; the ``fake`` decoder
    derives a deterministic grid from payload bytes so the batch shape,
    schema, and partition-parallelism are fully exercised. One output row
    per image; array column sized width·height (Arrow keeps it columnar).
    """
    if kind == "real":
        raise NotImplementedError(
            "image codecs are not installed; plug PIL/cv2 in here")
    n_px = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for p in pdf["payload"]:
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(b) == 0:
                    rows.append(np.zeros(n_px, dtype=np.float32))
                    continue
                # deterministic fake "resize": average-pool the byte stream
                # into n_px buckets, normalized to [0, 1]
                idx = (np.arange(len(b)) * n_px) // len(b)
                sums = np.zeros(n_px); counts = np.zeros(n_px)
                np.add.at(sums, idx, b)
                np.add.at(counts, idx, 1)
                counts[counts == 0] = 1
                rows.append((sums / counts / 255.0).astype(np.float32))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": width, "height": height,
                "pixels": [r for r in rows],
            })

    return df.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 4,
                  kind: str = "fake") -> DataFrame:
    """Video frame-sampling stage shape: one input row (video payload) →
    up to ``max_frames`` output rows, each a (frame_idx, timestamp, bytes)
    — the row-expanding mapInPandas pattern (output cardinality ≠ input
    cardinality is why this is mapInPandas, not a UDF). ``real`` is the
    pyav plug point; ``fake`` slices the payload deterministically."""
    if kind == "real":
        raise NotImplementedError(
            "video codecs are not installed; plug pyav in here")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                n = min(max_frames, max(1, len(p) // 64))
                for i in range(n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(p[i * 64:(i + 1) * 64])
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_ts_ms": pd.Series(tss, dtype="int64"),
                "frame_bytes": frames,
            })

    return df.mapInPandas(batches, FRAME_SCHEMA)


@register("multimodal_resize_grid")
def multimodal_resize_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pipeline shape over binary payloads (rows-only: fake
    decoder; grid values pinned by unit tests)."""
    return resize_images(binary_table(spark, sf_dir))


@register("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline shape: row-expanding mapInPandas (rows-only;
    expansion counts pinned by unit tests)."""
    return sample_frames(binary_table(spark, sf_dir))
