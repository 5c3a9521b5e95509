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
    """Real decode hook: dispatches to PIL (image) / soundfile (audio)
    / PyAV (video) when the library is importable — the operator is
    production-complete the day the cluster image ships codecs.  None
    are present in this sandbox, so the pipeline and tests use
    ``fake_decode`` (a deterministic byte-level stand-in) and this
    raises ``NotImplementedError``."""
    import importlib.util
    import io

    if media_type == "image" and importlib.util.find_spec("PIL"):
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(payload)))
    if media_type == "audio" and importlib.util.find_spec("soundfile"):
        import soundfile
        data, _rate = soundfile.read(io.BytesIO(payload))
        return np.asarray(data)
    if media_type == "video" and importlib.util.find_spec("av"):
        import av
        with av.open(io.BytesIO(payload)) as container:
            frames = [f.to_ndarray(format="rgb24")
                      for f in container.decode(video=0)]
        return np.stack(frames) if frames else np.empty((0,), np.uint8)
    raise NotImplementedError(
        f"no decoder available for media_type={media_type!r}: install "
        "PIL (image) / soundfile (audio) / av (video) on the cluster "
        "image; this sandbox and the tests use fake_decode")


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes as a uint8 array."""
    return np.frombuffer(payload, dtype=np.uint8)


#: modulus shared with functions/portable.py's rolling hashes
_HASH_P = 1_000_000_007

#: descending powers of 31 mod P for the vectorized Horner fold; sized
#: to the fold chunk (255 * (P-1) * 65536 < 2^63, so an int64 dot
#: product over one chunk cannot overflow)
_FP_CHUNK = 65_536


def _pow31_desc(n: int) -> np.ndarray:
    """[31^(n-1), ..., 31^1, 1] mod P by blockwise doubling — 16 NumPy
    ops instead of a 65k-iteration Python loop at worker import.
    Exact in int64: both factors are < P ≈ 2^30, so products stay
    under 2^60 < 2^63."""
    out = np.array([1], dtype=np.int64)
    while len(out) < n:
        # prefix block = existing block shifted up by 31^len(out)
        mult = pow(31, len(out), _HASH_P)
        out = np.concatenate([(out * mult) % _HASH_P, out])
    return out[-n:]


_POW31_DESC = _pow31_desc(_FP_CHUNK)


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
    """Batch-columnar byte features with oracle-exact arithmetic.

    Every emitted value is either an exact integer, or a single IEEE-754
    division / sequential left-fold over exact integers — the same
    operations (in the same order) the DuckDB oracle in
    ``queries.MULTIMODAL_SQL`` performs, so value hashes match
    bit-for-bit.  Rounding is deliberately NOT done here: Python's
    ``round`` is banker's while Spark/DuckDB round half-up, so the
    query wrapper applies ``F.round(..., 6)`` on the Spark side.

    Shape: the batch's payloads concatenate into ONE uint8 buffer with
    offsets; the per-row byte histogram is a single bincount over
    (row_id*256 + byte); entropy is a column-by-column accumulation
    over the (rows × 256) matrix — a vectorized-across-rows version of
    the same ascending-byte sequential fold (adding a 0.0 term is an
    exact IEEE no-op, so including empty cells preserves bit identity);
    ``math.log2`` is applied through a unique-count LUT because NumPy's
    SIMD log2 is not guaranteed ulp-identical to libm's.  No per-row
    Python iteration remains except the (already vectorized-inside)
    fingerprint Horner fold per payload.
    """
    import math

    cols = [f.name for f in FEATURES_SCHEMA.fields]
    for pdf in pdf_iter:
        n_rows = len(pdf)
        if n_rows == 0:
            continue
        payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
        lens = np.fromiter((len(p) for p in payloads), np.int64, count=n_rows)
        offs = np.concatenate(([0], np.cumsum(lens)))
        buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        seg = np.repeat(np.arange(n_rows, dtype=np.int64), lens)

        hist = np.bincount(seg * 256 + buf,
                           minlength=n_rows * 256).reshape(n_rows, 256)
        byte_sum = hist @ np.arange(256, dtype=np.int64)
        distinct = (hist > 0).sum(axis=1).astype(np.int64)
        nz = lens > 0
        denom = np.maximum(lens, 1).astype(np.float64)
        mean = np.where(nz, byte_sum / denom, 0.0)

        # c * log2(c) per cell, log2 via a libm LUT over the (few)
        # distinct counts so every term is bit-equal to the scalar path
        pos = hist > 0
        uniq = np.unique(hist[pos]) if pos.any() else np.array([], np.int64)
        lut = np.array([math.log2(c) for c in uniq.tolist()], np.float64)
        terms = np.zeros((n_rows, 256), np.float64)
        if len(uniq):
            terms[pos] = hist[pos].astype(np.float64) \
                * lut[np.searchsorted(uniq, hist[pos])]
        s = np.zeros(n_rows, np.float64)
        for k in range(256):        # ascending-byte sequential fold
            s = s + terms[:, k]
        log2n = np.array([math.log2(n) if n else 0.0 for n in lens.tolist()])
        entropy = np.where(nz, log2n - s / denom, 0.0)

        quad = hist.reshape(n_rows, 4, 64).sum(axis=2)
        feat = np.where(nz[:, None], quad / denom[:, None], 0.0)

        fps = np.fromiter(
            (_fingerprint(buf[offs[i]:offs[i + 1]]) for i in range(n_rows)),
            np.int64, count=n_rows)

        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(np.int64),
            "media_type": pdf["media_type"].to_numpy(),
            "n_bytes": lens,
            "fingerprint": fps,
            "byte_sum": byte_sum,
            "distinct_bytes": distinct,
            "byte_mean": mean,
            "byte_entropy": entropy,
            "feat_0": feat[:, 0],
            "feat_1": feat[:, 1],
            "feat_2": feat[:, 2],
            "feat_3": feat[:, 3],
        }, columns=cols)


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
