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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized", T.BooleanType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    max_side: int = 512,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Image resize plumbing: one Arrow pass, metadata-driven short-circuit
    (images already within ``max_side`` pass through untouched WITHOUT
    decoding — at 100 TB most of the win is the rows you never decode).

    The decode+resample kernel itself is stubbed (no PIL/libjpeg in this
    container): ``deterministic_fake`` substitutes a content-addressed
    payload transform + exact integer box-fit dimensions, which keeps the
    batch shape, the metadata math, and the pass-through logic — the parts
    that ARE Spark's concern — fully tested."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "payload", "width",
                                   "height", "resized")}
            for _, row in pdf.iterrows():
                w, h = row["w"], row["h"]
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                out["media_id"].append(row["media_id"])
                out["kind"].append(row["kind"])
                known = pd.notna(w) and pd.notna(h)
                if known and max(int(w), int(h)) <= max_side:
                    # metadata says in-bounds: pass through, no decode
                    out["payload"].append(payload)
                    out["width"].append(int(w))
                    out["height"].append(int(h))
                    out["resized"].append(False)
                    continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "image resize requires a codec library; not available "
                        "in this container — pass deterministic_fake=True "
                        "for the test double"
                    )
                if known:
                    scale = max_side / max(int(w), int(h))
                    nw, nh = max(1, int(int(w) * scale)), max(1, int(int(h) * scale))
                else:
                    nw = nh = max_side
                digest = hashlib.sha256(payload).digest()
                out["payload"].append(digest * 4)  # fixed-size fake raster
                out["width"].append(nw)
                out["height"].append(nh)
                out["resized"].append(True)
            yield pd.DataFrame(out)

    src = df.select(
        "media_id",
        "kind",
        "payload",
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
    )
    return src.mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Video frame sampling plumbing: each video row fans out to
    ≤``max_frames`` frame rows at ``every_ms`` spacing — the fan-out count
    comes from ``meta.duration_ms`` (no decode needed to PLAN the frames),
    and only the frame-extraction kernel is codec work.

    Spark shape: the explode happens INSIDE the Arrow kernel (one pass,
    no generator node duplicating the parent payload per frame — same
    pitfall as the minhash band explode); output is a per-frame table
    keyed (media_id, frame_idx) ready for the image feature path."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_ts_ms", "payload")}
            for _, row in pdf.iterrows():
                dur = row["duration_ms"]
                if pd.isna(dur):
                    continue  # not a timed medium
                n = min(max_frames, max(1, int(dur) // every_ms))
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                for i in range(n):
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "frame extraction requires a video codec; not "
                            "available in this container — pass "
                            "deterministic_fake=True for the test double"
                        )
                    ts = i * every_ms
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["payload"].append(
                        hashlib.sha256(payload + ts.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_ts_ms": pd.Series(out["frame_ts_ms"], dtype="int32"),
                    "payload": out["payload"],
                }
            )

    src = df.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.mapInPandas(kernel, FRAME_SCHEMA)


def media_fingerprint(
    df: DataFrame,
    deterministic_fake: bool = False,
    gram: int = 4,
) -> DataFrame:
    """(media_id, fp) — 64-bit perceptual-hash fingerprint per media item,
    the image-dedup index column.

    The REAL kernel (decode → grayscale → 32×32 DCT → top-left 8×8 sign
    bits — classic pHash) needs image codecs this container doesn't ship,
    so like every decode in this module it raises unless
    ``deterministic_fake=True``.  The fake is not a checksum, though —
    dedup needs LOCALITY: it computes a simhash over character
    ``gram``-grams of the payload decoded as UTF-8, so near-identical
    payloads land at small hamming distance exactly as near-identical
    images would under real pHash.  The fake path is all-JVM gram
    hashing (md5 big-endian basis — SQL-replayable) + the shared
    batch-vectorized majority kernel (`dedup._simhash_udf`); payloads
    shorter than ``gram`` characters are dropped (no grams → a shared
    all-zero fingerprint would cross-match every short payload)."""
    if not deterministic_fake:
        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "perceptual hashing requires an image codec library; not "
                "available in this container — pass deterministic_fake=True "
                "for the locality-preserving test double"
            )
            yield  # pragma: no cover

        return df.select("media_id", "payload").mapInPandas(
            kernel,
            T.StructType(
                [
                    T.StructField("media_id", T.LongType(), False),
                    T.StructField("fp", T.LongType(), False),
                ]
            ),
        )
    from mistral_ocr_pipeline_spark.operators.dedup import (
        _md5_be_long,
        _simhash_udf,
    )

    decoded = F.decode(F.col("payload"), "UTF-8")
    n_grams = F.length(decoded) - (gram - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: decoded.substr(i, F.lit(gram))
    )
    hs = F.array_distinct(F.transform(grams, _md5_be_long))
    return (
        df.filter(F.length(F.decode(F.col("payload"), "UTF-8")) >= gram)
        .select(F.col("media_id").alias("id"), hs.alias("_hs"))
        .select("id", _simhash_udf()(F.col("_hs")).alias("fp"))
        .withColumnRenamed("id", "media_id")
    )


def media_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    max_bucket: int = 64,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Image/media near-duplicate pairs: `media_fingerprint` + the shared
    `dedup.fingerprint_pairs` band/verify machinery (4×16-bit band
    blocking, salted bounded buckets, exact bit_count(xor)) — the
    re-encoded/resized-copy dedup step of a multimodal training pipeline,
    with the same scale bounds as text SimHash."""
    from mistral_ocr_pipeline_spark.operators.dedup import fingerprint_pairs

    fps = media_fingerprint(df, deterministic_fake=deterministic_fake).select(
        F.col("media_id").alias("id"), "fp"
    )
    return fingerprint_pairs(fps, max_hamming, max_bucket)
