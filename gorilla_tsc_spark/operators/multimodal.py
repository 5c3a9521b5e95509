"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; transformation stages (decode, feature-extract,
resize, frame-sample) are Arrow-batched ``mapInPandas`` kernels. The
image/audio codec libraries are not in this container, so the actual
pixel/sample decode is STUBBED: ``decode_real`` raises
``NotImplementedError`` and the pipeline uses ``fake_decode`` — a
deterministic byte-level stand-in — so the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real and tested end-to-end.

Scale notes: payload rows never shuffle — every stage is a narrow
mapInPandas over the scan; metadata-only queries prune the payload
column entirely at the parquet reader (column pruning), which is the
point of keeping metadata in plain columns beside the blob.
"""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("frames", T.IntegerType()),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("crc", T.LongType()),
    T.StructField("byte_mean", T.DoubleType()),
    T.StructField("byte_entropy", T.DoubleType()),
    T.StructField("feat", T.ArrayType(T.DoubleType())),
])


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic binary payload per document.

    Stand-in for reading real blobs: payload = utf8 text bytes; typed
    metadata (media_type/width/height/frames) derived from doc_id so
    the downstream plumbing sees realistic variety.
    """
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 2, (F.col("doc_id") % 30 + 1))
         .otherwise(F.lit(1)).cast("int").alias("frames"),
    )


def decode_real(payload: bytes, media_type: str):
    """Real decode hook — requires PIL/ffmpeg/soundfile, absent here."""
    raise NotImplementedError(
        "media decode libraries are not available in this environment; "
        "wire PIL/av here on a real cluster and keep fake_decode for tests")


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes as a uint8 array."""
    return np.frombuffer(payload, dtype=np.uint8)


def _feature_iter(pdf_iter):
    for pdf in pdf_iter:
        rows = []
        for r in pdf.itertuples(index=False):
            buf = fake_decode(bytes(r.payload))
            n = len(buf)
            if n:
                hist = np.bincount(buf, minlength=256).astype(np.float64)
                p = hist[hist > 0] / n
                entropy = float(-(p * np.log2(p)).sum())
                mean = float(buf.mean())
                # 4-bucket byte histogram as the stand-in feature vector
                feat = [float(x) for x in hist.reshape(4, 64).sum(axis=1) / n]
            else:
                entropy, mean, feat = 0.0, 0.0, [0.0] * 4
            rows.append((int(r.doc_id), r.media_type, n,
                         zlib.crc32(bytes(r.payload)), mean, entropy, feat))
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction (narrow; payloads never shuffle)."""
    return media.select("doc_id", "media_type", "payload").mapInPandas(
        _feature_iter, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: one row per kept frame index.

    JVM-side (sequence+explode) — the expensive per-frame decode stays
    stubbed, but the fan-out shape and pruning are the real plan.
    """
    return (
        media.where(F.col("media_type") == "video")
        .select("doc_id", "frames",
                F.explode(F.sequence(
                    F.lit(0), F.col("frames") - 1, F.lit(every))).alias("frame_idx"))
    )
