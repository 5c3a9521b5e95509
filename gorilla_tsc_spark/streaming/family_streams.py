"""Streaming twins for the remaining round-4 tier families.

Correlation needs NO state operator: its summary is six plain sums per
(series, bucket) — order-insensitive — so the streaming build is a
watermarked windowed aggregation (pure JVM, append mode), the same
shape as `stream_rollup_1m`.  Rows bit-equal the batch `corr_tier`.

Time-weighted average DOES need ordering (the LOCF integral walks
consecutive in-bucket pairs), so it follows the heartbeat/encoder
pattern: buffer one (series, bucket)'s points in `applyInPandasWithState`,
seal the exact batch `twa_tier` row when the event-time watermark
passes the bucket's end.  Like heartbeat, the family's summary is
within-bucket by design (seams belong to the cascade), so no
cross-bucket state exists to lose.

Counter rate (operators/rate.py) is the same class as time-weight —
the reset-corrected pair walk is order-dependent within the bucket —
so `stream_rate_tier` reuses the buffer-and-seal shape.  It takes a
POINT stream (series, ts, v) where v is the measured counter sample:
in production the counter IS the wire channel; the driver gate's
cumulative-sum derivation from transcripts exists only to synthesize
a counter deterministically from the test corpus.

The fixed-bin histogram (operators/histogram.py) is the corr class —
bin counts are order-insensitive sums — so `stream_hist_tier` is a
watermarked windowed aggregation too, bit-equal to the batch build.

State-duration (operators/statetier.py) is the time-weight class — the
LOCF time-in-state walk is order-dependent within the bucket — so
`stream_state_tier` reuses the buffer-and-seal shape, carrying the
state index through the shared float buffer (small non-negative ints
are exact in float64, and the (ts, v) lexsort reproduces the family's
(ts_ms, s) tie rule).

The OHLCV candle (operators/candle.py) looks order-dependent (open and
close) but is NOT: open/close are `min_by`/`max_by` over the (ts, v)
struct — declarative aggregates — so `stream_candle_tier` is a
watermarked windowed aggregation like corr/hist, bit-equal to batch.

Lag-1 autocorrelation (operators/autocorr.py) is the time-weight class
— the adjacency-product walk is order-dependent within the bucket — so
`stream_autocorr_tier` reuses the buffer-and-seal shape; all sums are
integer-valued-double arithmetic, so the sealed row bit-equals batch.

The exponential histogram (operators/exphist.py) is the corr/hist
class — bin counts are order-insensitive sums — so
`stream_exphist_tier` is a watermarked windowed aggregation, bit-equal
to the batch build.

The linear trend (operators/trend.py) is also the corr/hist class:
its regressor x is the point's minute offset within its OWN bucket —
computable per point with no neighbor context — and all eight summary
columns are order-insensitive sums, so `stream_trend_tier` is a
watermarked windowed aggregation, bit-equal to the batch build.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_corr_tier(transcripts_stream: DataFrame, window: str = "1 hour",
                     watermark: str = "10 minutes") -> DataFrame:
    """Transcript stream → watermark-sealed correlation tier rows
    (x = chars per turn, y = whitespace tokens per turn), bit-equal to
    the batch `corr_tier` at the same grain: every statistic is a sum
    of integer-valued doubles, exact in any arrival order."""
    x = F.length("text").cast("double")
    y = F.size(F.split("text", r"\s+")).cast("double")
    # mirror the batch corr_tier's paired-observation filter: both x
    # and y derive from text, so a null text row must not count in n
    # while the sums skip it (that would skew cov/r vs the batch tier)
    pts = (transcripts_stream
           .where(F.col("text").isNotNull())
           .select("conv_id", F.col("ts").cast("timestamp").alias("ts"),
                   x.alias("x"), y.alias("y")))
    agg = (pts.withWatermark("ts", watermark)
           .groupBy("conv_id", F.window("ts", window).alias("w"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy")))
    return agg.select("conv_id",
                      F.unix_millis(F.col("w.start")).alias("bucket"),
                      "n", "sx", "sy", "sxx", "syy", "sxy")


def stream_hist_tier(points_stream: DataFrame, lo: float, width: float,
                     nbins: int, window: str = "1 hour",
                     watermark: str = "10 minutes") -> DataFrame:
    """Point stream (conv_id, ts, v) → watermark-sealed histogram tier
    rows, bit-equal to the batch `histogram_tier` at the same grain:
    every component (n, below, above, each bin count) is a sum, exact
    in any arrival order — pure JVM, append mode, no state operator."""
    from ..operators.histogram import _bin_expr, _hist_aggs

    v = F.col("v").cast("double")
    pts = (points_stream
           .where(v.isNotNull())
           .select("conv_id", F.col("ts").cast("timestamp").alias("ts"),
                   v.alias("v")))
    b = _bin_expr(F.col("v"), lo, width, nbins)
    agg = (pts.withWatermark("ts", watermark)
           .groupBy("conv_id", F.window("ts", window).alias("w"))
           .agg(*_hist_aggs(b, nbins)))
    return agg.select("conv_id",
                      F.unix_millis(F.col("w.start")).alias("bucket"),
                      "n", "below", "above", "counts")


def stream_exphist_tier(points_stream: DataFrame, nbins: int,
                        window: str = "1 hour",
                        watermark: str = "10 minutes") -> DataFrame:
    """Point stream (conv_id, ts, v) → watermark-sealed exponential-
    histogram tier rows, bit-equal to the batch `exphist_tier` at the
    same grain: every component (n, below, above, each power-of-two
    bin count) is a sum, exact in any arrival order — pure JVM,
    append mode, no state operator."""
    from ..operators.exphist import _exp_bin_expr
    from ..operators.histogram import _hist_aggs

    v = F.col("v").cast("double")
    pts = (points_stream
           .where(v.isNotNull())
           .select("conv_id", F.col("ts").cast("timestamp").alias("ts"),
                   v.alias("v")))
    b = _exp_bin_expr(F.col("v"), nbins)
    agg = (pts.withWatermark("ts", watermark)
           .groupBy("conv_id", F.window("ts", window).alias("w"))
           .agg(*_hist_aggs(b, nbins)))
    return agg.select("conv_id",
                      F.unix_millis(F.col("w.start")).alias("bucket"),
                      "n", "below", "above", "counts")


def stream_trend_tier(points_stream: DataFrame, bucket_ms: int,
                      watermark: str = "10 minutes") -> DataFrame:
    """Point stream (conv_id, ts, v) → watermark-sealed linear-trend
    tier rows, bit-equal to the batch `trend_tier` at the same grain:
    the regressor x = floor((ts_ms % bucket_ms) / 60000) is per-point
    (no neighbor context), and every summary column is a sum of small
    integers / integer-valued doubles — exact in any arrival order —
    so this is pure JVM, append mode, no state operator."""
    from ..operators.rollup import MINUTE_MS
    from ..operators.trend import _trend_aggs, _x_expr

    assert bucket_ms % MINUTE_MS == 0, "grain must align to minutes"
    v = F.col("v").cast("double")
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    pts = (points_stream
           .where(v.isNotNull())
           .select("conv_id", F.col("ts").cast("timestamp").alias("ts"),
                   ts_ms.alias("ts_ms"),
                   _x_expr(ts_ms, bucket_ms).alias("x"), v.alias("v")))
    agg = (pts.withWatermark("ts", watermark)
           .groupBy("conv_id",
                    F.window("ts", f"{bucket_ms // 1000} seconds")
                    .alias("w"))
           .agg(*_trend_aggs(F.col("x"), F.col("v"))))
    return agg.select("conv_id",
                      F.unix_millis(F.col("w.start")).alias("bucket"),
                      "n", "first_ts", "last_ts", "sx", "sv", "sxx",
                      "svv", "sxv")


STREAM_TWA_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("first_ts", T.LongType()),
    T.StructField("first_v", T.DoubleType()),
    T.StructField("last_ts", T.LongType()),
    T.StructField("last_v", T.DoubleType()),
    T.StructField("wsum", T.DoubleType()),
])

TWA_STATE_SCHEMA = T.StructType([
    T.StructField("ts", T.ArrayType(T.LongType())),
    T.StructField("v", T.ArrayType(T.DoubleType())),
])


def _sorted_ts_v(ts_l: list, v_l: list):
    """(ts, v)-lexsorted arrays — the families' shared tie order."""
    a = np.lexsort((np.asarray(v_l, np.float64),
                    np.asarray(ts_l, np.int64)))
    return np.asarray(ts_l, np.int64)[a], np.asarray(v_l, np.float64)[a]


def _make_buffering_state_fn(seal_row, schema: T.StructType,
                             bucket_ms: int):
    """The order-dependent families' shared buffer-and-seal state
    machine: accumulate one (series, bucket)'s (ts, v) points across
    microbatches, seal the exact batch-operator row via `seal_row`
    when the event-time watermark passes the bucket end.  One place to
    fix timeout/extend semantics for every family that needs ordering."""
    cols = [f.name for f in schema.fields]

    def fn(key, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id, bucket = key[0], int(key[1])
        if state.hasTimedOut:
            ts_l, v_l = state.get
            state.remove()
            if ts_l:
                yield pd.DataFrame([seal_row(conv_id, bucket, ts_l, v_l)],
                                   columns=cols)
            return
        ts_l, v_l = (state.get if state.exists else ([], []))
        ts_l, v_l = list(ts_l), list(v_l)
        for pdf in pdf_iter:
            ts_l.extend(pdf["ts_ms"].astype("int64").tolist())
            v_l.extend(pdf["v"].astype("float64").tolist())
        state.update((ts_l, v_l))
        state.setTimeoutTimestamp(
            max(bucket + bucket_ms, state.getCurrentWatermarkMs() + 1))

    return fn


def _seal_twa_row(conv_id: str, bucket: int, ts_l: list, v_l: list) -> dict:
    ts, v = _sorted_ts_v(ts_l, v_l)
    wsum = float((v[:-1] * np.diff(ts)).sum()) if len(ts) > 1 else 0.0
    return {"conv_id": conv_id, "bucket": bucket, "n": int(len(ts)),
            "first_ts": int(ts[0]), "first_v": float(v[0]),
            "last_ts": int(ts[-1]), "last_v": float(v[-1]), "wsum": wsum}


def make_twa_state_fn(bucket_ms: int):
    return _make_buffering_state_fn(_seal_twa_row, STREAM_TWA_SCHEMA,
                                    bucket_ms)


def stream_twa_tier(transcripts_stream: DataFrame, bucket_ms: int,
                    delay: str = "10 minutes") -> DataFrame:
    """Transcript stream → watermark-sealed time-weight tier rows over
    the turn-length channel, bit-equal to the batch `twa_tier`."""
    # batch twa_tier drops null v before integrating; a null text row
    # would become NaN in _seal_twa_row and poison the whole bucket
    pts = (transcripts_stream
           .where(F.col("text").isNotNull())
           .withWatermark("ts", delay)
           .select(
               "conv_id",
               (F.floor(F.unix_millis(F.col("ts").cast("timestamp"))
                        / bucket_ms) * bucket_ms)
               .cast("long").alias("bucket"),
               F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
               F.length("text").cast("double").alias("v"),
               "ts"))
    return pts.groupBy("conv_id", "bucket").applyInPandasWithState(
        make_twa_state_fn(bucket_ms),
        outputStructType=STREAM_TWA_SCHEMA,
        stateStructType=TWA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


STREAM_RATE_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("first_ts", T.LongType()),
    T.StructField("first_v", T.DoubleType()),
    T.StructField("last_ts", T.LongType()),
    T.StructField("last_v", T.DoubleType()),
    T.StructField("increase", T.DoubleType()),
    T.StructField("resets", T.LongType()),
])


def _seal_rate_row(conv_id: str, bucket: int, ts_l: list, v_l: list) -> dict:
    """Exact batch `rate_tier` row for one sealed (series, bucket):
    (ts, v)-sorted reset-corrected pair walk, vectorized."""
    ts, v = _sorted_ts_v(ts_l, v_l)
    if len(v) > 1:
        d = np.diff(v)
        drops = d < 0
        increase = float(np.where(drops, v[1:], d).sum())
        resets = int(drops.sum())
    else:
        increase, resets = 0.0, 0
    return {"conv_id": conv_id, "bucket": bucket, "n": int(len(ts)),
            "first_ts": int(ts[0]), "first_v": float(v[0]),
            "last_ts": int(ts[-1]), "last_v": float(v[-1]),
            "increase": increase, "resets": resets}


def make_rate_state_fn(bucket_ms: int):
    return _make_buffering_state_fn(_seal_rate_row, STREAM_RATE_SCHEMA,
                                    bucket_ms)


def stream_candle_tier(points_stream: DataFrame,
                       vol_col: str | None = None,
                       window: str = "1 hour",
                       watermark: str = "10 minutes") -> DataFrame:
    """Point stream (conv_id, ts, v[, vol]) → watermark-sealed OHLCV
    candle rows, bit-equal to the batch `candle_tier` at the same
    grain: every component is a min/max/sum or a min_by/max_by over
    the (event-time, value) struct — all order-insensitive."""
    from ..operators.candle import _build_aggs

    v = F.col("v").cast("double")
    cols = ["conv_id", F.col("ts").cast("timestamp").alias("ts"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            v.alias("v")]
    if vol_col is not None:
        cols.append(F.col(vol_col).cast("double").alias("vol"))
    pts = points_stream.where(v.isNotNull()).select(*cols)
    order = F.struct("ts_ms", "v")
    vol = F.col("vol") if vol_col is not None else None
    agg = (pts.withWatermark("ts", watermark)
           .groupBy("conv_id", F.window("ts", window).alias("w"))
           .agg(*_build_aggs(F.col("v"), order, vol)))
    out = ["conv_id", F.unix_millis(F.col("w.start")).alias("bucket"),
           "n", "first_ts", "open", "last_ts", "close", "high", "low",
           "vsum"]
    if vol_col is not None:
        out += ["vol", "pvsum"]
    return agg.select(*out)


STREAM_STATE_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("first_ts", T.LongType()),
    T.StructField("first_s", T.IntegerType()),
    T.StructField("last_ts", T.LongType()),
    T.StructField("last_s", T.IntegerType()),
    T.StructField("durs", T.ArrayType(T.LongType())),
    T.StructField("trans", T.LongType()),
])


def _make_seal_state_row(nstates: int):
    """Exact batch `state_tier` row for one sealed (series, bucket):
    (ts, s)-sorted LOCF walk — every consecutive pair's interval is
    attributed to the earlier point's state (all pairs are in-bucket
    here by construction; seams belong to the cascade)."""
    def seal(conv_id: str, bucket: int, ts_l: list, v_l: list) -> dict:
        ts, v = _sorted_ts_v(ts_l, v_l)
        s = v.astype(np.int64)
        durs = np.zeros(nstates, np.int64)
        trans = 0
        if len(ts) > 1:
            np.add.at(durs, s[:-1], np.diff(ts))
            trans = int((np.diff(s) != 0).sum())
        return {"conv_id": conv_id, "bucket": bucket, "n": int(len(ts)),
                "first_ts": int(ts[0]), "first_s": int(s[0]),
                "last_ts": int(ts[-1]), "last_s": int(s[-1]),
                "durs": durs.tolist(), "trans": trans}
    return seal


def make_state_duration_state_fn(bucket_ms: int, nstates: int):
    return _make_buffering_state_fn(_make_seal_state_row(nstates),
                                    STREAM_STATE_SCHEMA, bucket_ms)


def stream_state_tier(points_stream: DataFrame, bucket_ms: int,
                      nstates: int, delay: str = "10 minutes") -> DataFrame:
    """State-point stream (conv_id, ts, s) → watermark-sealed
    state-duration tier rows, bit-equal to the batch `state_tier` at
    the same grain (integer-ms duration vector per declared state)."""
    s = F.col("s").cast("int")
    pts = (points_stream
           .where(s.isNotNull())
           .withWatermark("ts", delay)
           .select(
               "conv_id",
               (F.floor(F.unix_millis(F.col("ts").cast("timestamp"))
                        / bucket_ms) * bucket_ms)
               .cast("long").alias("bucket"),
               F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
               s.cast("double").alias("v"),
               "ts"))
    return pts.groupBy("conv_id", "bucket").applyInPandasWithState(
        make_state_duration_state_fn(bucket_ms, nstates),
        outputStructType=STREAM_STATE_SCHEMA,
        stateStructType=TWA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


STREAM_AUTOCORR_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("first_ts", T.LongType()),
    T.StructField("first_v", T.DoubleType()),
    T.StructField("last_ts", T.LongType()),
    T.StructField("last_v", T.DoubleType()),
    T.StructField("sx", T.DoubleType()),
    T.StructField("sxx", T.DoubleType()),
    T.StructField("sadj", T.DoubleType()),
    T.StructField("n_pairs", T.LongType()),
])


def _seal_autocorr_row(conv_id: str, bucket: int, ts_l: list,
                       v_l: list) -> dict:
    """Exact batch `autocorr_tier` row for one sealed (series, bucket):
    (ts, v)-sorted adjacency-product walk, vectorized; all in-bucket
    pairs by construction (seams belong to the cascade)."""
    ts, v = _sorted_ts_v(ts_l, v_l)
    sadj = float((v[:-1] * v[1:]).sum()) if len(v) > 1 else 0.0
    return {"conv_id": conv_id, "bucket": bucket, "n": int(len(ts)),
            "first_ts": int(ts[0]), "first_v": float(v[0]),
            "last_ts": int(ts[-1]), "last_v": float(v[-1]),
            "sx": float(v.sum()), "sxx": float((v * v).sum()),
            "sadj": sadj, "n_pairs": int(len(ts)) - 1}


def make_autocorr_state_fn(bucket_ms: int):
    return _make_buffering_state_fn(_seal_autocorr_row,
                                    STREAM_AUTOCORR_SCHEMA, bucket_ms)


def stream_autocorr_tier(points_stream: DataFrame, bucket_ms: int,
                         delay: str = "10 minutes") -> DataFrame:
    """Point stream (conv_id, ts, v) → watermark-sealed autocorrelation
    tier rows, bit-equal to the batch `autocorr_tier` at the same grain
    (integer-valued-double sums/products over the in-bucket adjacency
    walk; seams belong to the cascade, so state is per-bucket)."""
    pts = (points_stream
           .where(F.col("v").isNotNull())
           .withWatermark("ts", delay)
           .select(
               "conv_id",
               (F.floor(F.unix_millis(F.col("ts").cast("timestamp"))
                        / bucket_ms) * bucket_ms)
               .cast("long").alias("bucket"),
               F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
               F.col("v").cast("double").alias("v"),
               "ts"))
    return pts.groupBy("conv_id", "bucket").applyInPandasWithState(
        make_autocorr_state_fn(bucket_ms),
        outputStructType=STREAM_AUTOCORR_SCHEMA,
        stateStructType=TWA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_rate_tier(points_stream: DataFrame, bucket_ms: int,
                     delay: str = "10 minutes") -> DataFrame:
    """Counter-point stream (conv_id, ts, v) → watermark-sealed rate
    tier rows, bit-equal to the batch `rate_tier` at the same grain
    (every statistic is integer-valued arithmetic over the in-bucket
    pair walk; seams belong to the cascade, so state is per-bucket)."""
    pts = (points_stream
           .where(F.col("v").isNotNull())
           .withWatermark("ts", delay)
           .select(
               "conv_id",
               (F.floor(F.unix_millis(F.col("ts").cast("timestamp"))
                        / bucket_ms) * bucket_ms)
               .cast("long").alias("bucket"),
               F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
               F.col("v").cast("double").alias("v"),
               "ts"))
    return pts.groupBy("conv_id", "bucket").applyInPandasWithState(
        make_rate_state_fn(bucket_ms),
        outputStructType=STREAM_RATE_SCHEMA,
        stateStructType=TWA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
