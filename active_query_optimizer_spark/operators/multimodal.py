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
