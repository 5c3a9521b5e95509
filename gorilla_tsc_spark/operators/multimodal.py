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
    T.StructField("fingerprint", T.LongType()),
    T.StructField("byte_sum", T.LongType()),
    T.StructField("distinct_bytes", T.LongType()),
    T.StructField("byte_mean", T.DoubleType()),
    T.StructField("byte_entropy", T.DoubleType()),
    T.StructField("feat_0", T.DoubleType()),
    T.StructField("feat_1", T.DoubleType()),
    T.StructField("feat_2", T.DoubleType()),
    T.StructField("feat_3", T.DoubleType()),
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


#: modulus shared with functions/portable.py's rolling hashes
_HASH_P = 1_000_000_007

#: descending powers of 31 mod P for the vectorized Horner fold; sized
#: to the fold chunk (255 * (P-1) * 65536 < 2^63, so an int64 dot
#: product over one chunk cannot overflow)
_FP_CHUNK = 65_536
_POW31_DESC = np.empty(_FP_CHUNK, dtype=np.int64)
_POW31_DESC[-1] = 1
for _i in range(_FP_CHUNK - 2, -1, -1):
    _POW31_DESC[_i] = (_POW31_DESC[_i + 1] * 31) % _HASH_P


def _fingerprint(buf: np.ndarray) -> int:
    """Rolling hash fp = fold(fp*31 + byte) mod P, vectorized.

    Chunked modular Horner: each 64 KiB chunk folds as one int64 dot
    product against descending powers of 31 (exact — see _POW31_DESC),
    and chunks combine with fp = fp * 31^len(chunk) + fold(chunk).
    Bit-identical to the scalar per-byte loop (and to the DuckDB
    list_reduce oracle) at ~1000x the speed."""
    fp = 0
    b64 = buf.astype(np.int64)
    for off in range(0, len(b64), _FP_CHUNK):
        chunk = b64[off:off + _FP_CHUNK]
        m = len(chunk)
        fold = int(np.dot(chunk, _POW31_DESC[_FP_CHUNK - m:])) % _HASH_P
        fp = (fp * int(_POW31_DESC[_FP_CHUNK - 1 - m]
                       if m < _FP_CHUNK else
                       (_POW31_DESC[0] * 31) % _HASH_P) + fold) % _HASH_P
    return fp


def _feature_iter(pdf_iter):
    """Per-payload byte features with oracle-exact arithmetic.

    Every emitted value is either an exact integer, or a single IEEE-754
    division / sequential left-fold over exact integers — the same
    operations (in the same order) the DuckDB oracle in
    ``queries.MULTIMODAL_SQL`` performs, so value hashes match
    bit-for-bit.  Rounding is deliberately NOT done here: Python's
    ``round`` is banker's while Spark/DuckDB round half-up, so the
    query wrapper applies ``F.round(..., 6)`` on the Spark side.
    """
    import math

    for pdf in pdf_iter:
        rows = []
        for r in pdf.itertuples(index=False):
            raw = bytes(r.payload)
            buf = fake_decode(raw)
            n = len(buf)
            if n:
                hist = np.bincount(buf, minlength=256)
                byte_sum = int(buf.sum(dtype=np.int64))
                distinct = int((hist > 0).sum())
                mean = byte_sum / n
                # sequential fold in ascending byte order == oracle's
                # list_reduce over list(c*log2(c) ORDER BY byte)
                s = 0.0
                for c in hist[hist > 0].tolist():
                    s += c * math.log2(c)
                entropy = math.log2(n) - s / n
                feat = [int(x) / n for x in hist.reshape(4, 64).sum(axis=1)]
                fp = _fingerprint(buf)
            else:
                byte_sum = distinct = fp = 0
                mean = entropy = 0.0
                feat = [0.0] * 4
            rows.append((int(r.doc_id), r.media_type, n, fp, byte_sum,
                         distinct, mean, entropy, *feat))
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
