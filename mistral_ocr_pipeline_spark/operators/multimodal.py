"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested, while the actual codec work is stubbed —
the container ships no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless ``deterministic_fake=True``, which swaps in
a seeded, content-addressed fake decoder (byte-checksum features) that
keeps every downstream operator testable.

This mirrors how the reference treats PDF bytes: an opaque payload in
flight (base64 str, reference utils/utils.py:53-75), interpreted only
inside the extraction boundary."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic, content-addressed stand-in for a real decoder:
    features = normalized byte-histogram moments seeded by the payload
    digest.  REPLACE with a real codec (PIL/torchvision/ffmpeg) off-sandbox."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
    feats = arr.reshape(dim, -1).mean(axis=1) / 255.0
    return [float(round(x, 6)) for x in feats]


def decode_features(
    df: DataFrame, deterministic_fake: bool = False, feature_dim: int = 8
) -> DataFrame:
    """media table → per-item feature rows, one Arrow-batched pass.

    Real decode is NOT available in this container; the plumbing
    (mapInPandas batch shape, binary handling, output schema) is the
    production path and is what this function tests."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            checks = []
            sizes = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                checks.append(hashlib.sha256(raw).hexdigest())
                if deterministic_fake:
                    feats.append(_fake_features(raw, feature_dim))
                else:
                    raise NotImplementedError(
                        "media decode requires an image/audio codec library; "
                        "not available in this container — pass "
                        "deterministic_fake=True for the test double"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "checksum": checks,
                    "features": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads — lets the
    multimodal path exercise real data in this sandbox."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
