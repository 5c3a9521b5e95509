"""OHLC/candlestick tier: the twelfth mergeable summary family.

"What did the channel open/close at, and how far did it swing?" — the
classic downsampled view of any gauge: price bars in finance
(TimescaleDB's `candlestick_agg` — public docs; no code consulted),
token-rate bars in fleet telemetry, per-bucket swing of any per-turn
numeric channel here.

The per-bucket summary is EXACTLY mergeable and — unlike the LOCF
families — fully DISTRIBUTIVE over point sets:

    (n, first_ts, open, last_ts, close, high, high_ts, low, low_ts,
     vsum[, vol, pvsum])

open/close are the values at the bucket's first/last timestamp (ties on
ts_ms break by value — the (ts, v) rule every order-dependent family
here uses), high/low/vsum are plain max/min/sum, and high_ts/low_ts
record WHEN the extremes happened (TimescaleDB's high_at/low_at —
public docs): the timestamp of the max/min (v, ts) pair, ties on v
resolved to the latest/earliest occurrence respectively — themselves
plain max_by/min_by aggregates, so the family stays distributive.  Merging two summaries
of the same bucket needs no seam term at all: take the open of the
earlier first_ts (tie: the smaller open), the close of the later
last_ts, and sum/min/max the rest.  So the cascade is one groupBy and
the late-data refresh is a pure delta-merge (candle(late) merged onto
the stored tier — the histogram family's rule, never a rebuild).

With a volume column (OHLCV), `vol` = Σ volume and `pvsum` = Σ v·volume
ride along as two more sums, serving the VWAP exactly.

Scale shape: build = ONE groupBy with map-side partial aggregation (no
window at all — cheaper than every LOCF family); cascade/refresh = the
same groupBy over tier rows.  Whole-stage codegen end to end; no Python
on the data path.  Streaming twin: all components are order-insensitive
aggregates, so the stream build is a watermarked windowed aggregation
(the corr/hist class), bit-equal to batch.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import bucket_col

SUMMARY_COLS = ("n", "first_ts", "open", "last_ts", "close", "high",
                "high_ts", "low", "low_ts", "vsum")
VOL_COLS = ("vol", "pvsum")


def _build_aggs(v, order, vol):
    aggs = [F.count(F.lit(1)).alias("n"),
            F.min("ts_ms").alias("first_ts"),
            F.min_by(v, order).alias("open"),
            F.max("ts_ms").alias("last_ts"),
            F.max_by(v, order).alias("close"),
            F.max(v).alias("high"),
            F.max_by("ts_ms", F.struct(v.alias("v"), F.col("ts_ms")))
            .alias("high_ts"),
            F.min(v).alias("low"),
            F.min_by("ts_ms", F.struct(v.alias("v"), F.col("ts_ms")))
            .alias("low_ts"),
            F.sum(v).alias("vsum")]
    if vol is not None:
        aggs += [F.sum(vol).alias("vol"),
                 F.sum(v * vol).alias("pvsum")]
    return aggs


def candle_tier(points: DataFrame, bucket_ms: int, value_col: str = "v",
                vol_col: str | None = None,
                keys=("conv_id",)) -> DataFrame:
    """Build the fine-grain candlestick tier from (ts_ms, v[, vol])
    points — one groupBy, no window."""
    v = F.col(value_col).cast("double")
    cols = [*keys, F.col("ts_ms").cast("long").alias("ts_ms"),
            v.alias("v")]
    if vol_col is not None:
        cols.append(F.col(vol_col).cast("double").alias("vol"))
    pts = points.where(v.isNotNull()).select(*cols)
    bkt = bucket_col(F.col("ts_ms"), bucket_ms)
    order = F.struct("ts_ms", "v")
    vol = F.col("vol") if vol_col is not None else None
    return (pts.groupBy(*keys, bkt.alias("bucket"))
            .agg(*_build_aggs(F.col("v"), order, vol)))


def _merge_aggs(has_vol: bool):
    """Merge candle rows sharing a (series, bucket) key — the one
    order-insensitive rule used by both cascade and refresh: open
    follows the earliest first_ts (tie: smaller open), close the
    latest last_ts (tie: larger close) — exactly the point-level
    (ts, v) rule lifted to summaries."""
    aggs = [F.sum("n").alias("n"),
            F.min("first_ts").alias("first_ts"),
            F.min_by("open", F.struct("first_ts", "open")).alias("open"),
            F.max("last_ts").alias("last_ts"),
            F.max_by("close", F.struct("last_ts", "close")).alias("close"),
            F.max("high").alias("high"),
            F.max_by("high_ts", F.struct("high", "high_ts"))
            .alias("high_ts"),
            F.min("low").alias("low"),
            F.min_by("low_ts", F.struct("low", "low_ts"))
            .alias("low_ts"),
            F.sum("vsum").alias("vsum")]
    if has_vol:
        aggs += [F.sum("vol").alias("vol"), F.sum("pvsum").alias("pvsum")]
    return aggs


def cascade_candle_tier(tier: DataFrame, from_ms: int, to_ms: int,
                        keys=("conv_id",)) -> DataFrame:
    """Merge a finer candle tier into a coarser one — exact and
    seam-free (the family is distributive)."""
    assert to_ms % from_ms == 0, "coarser tier must align"
    coarse = bucket_col(F.col("bucket"), to_ms)
    return (tier.groupBy(*keys, coarse.alias("bucket"))
            .agg(*_merge_aggs("vol" in tier.columns)))


def refresh_candle_tier(tier: DataFrame, late_points: DataFrame,
                        bucket_ms: int, value_col: str = "v",
                        vol_col: str | None = None,
                        keys=("conv_id",)) -> DataFrame:
    """Fold a late batch in as a pure delta-merge: candle the late
    points alone, union with the stored tier, re-merge touched keys.
    Cost ∝ the late batch — no stored bucket is ever rebuilt from raw
    (the distributive families' refresh rule, like the histogram)."""
    delta = candle_tier(late_points, bucket_ms, value_col, vol_col, keys)
    return (tier.unionByName(delta)
            .groupBy(*keys, "bucket")
            .agg(*_merge_aggs("vol" in tier.columns)))


def candle_gap_estimates(tier: DataFrame,
                         keys=("conv_id",)) -> DataFrame:
    """Serve the opening gap — this bar's open minus the PREVIOUS
    bar's close (the classic gap-up/gap-down signal; NULL on a series'
    first bar).  Pure lag over tier rows, like the other families'
    interpolated serves."""
    from pyspark.sql.window import Window
    w = Window.partitionBy(*keys).orderBy("bucket")
    return tier.withColumn("gap", F.col("open") - F.lag("close").over(w))


def candle_estimates(tier: DataFrame) -> DataFrame:
    """Serve: bar change (close − open), spread (high − low), plain
    mean, and — when volume rode along — the exact VWAP.  All inputs
    are integer-valued doubles, so change/spread are exact; the
    quotients are the only floats a gate needs to round."""
    out = (tier
           .withColumn("change", F.col("close") - F.col("open"))
           .withColumn("spread", F.col("high") - F.col("low"))
           .withColumn("vavg", F.col("vsum") / F.col("n")))
    if "vol" in tier.columns:
        out = out.withColumn(
            "vwap", F.when(F.col("vol") != 0,
                           F.col("pvsum") / F.col("vol")))
    return out
