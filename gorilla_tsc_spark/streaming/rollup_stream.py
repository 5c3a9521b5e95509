"""Streaming continuous aggregates (the 1m tier as a stream).

The batch engine's 1m rollup is ``groupBy(conv_id, bucket)``; the
streaming twin is ``withWatermark + groupBy(window(ts, '1 minute'))``
in append mode: a bucket's row is emitted once its watermark passes,
so late rows inside the watermark fold into the right bucket and rows
later than the watermark are dropped (counted by Spark's state-store
metrics). Downstream tiers (1h/1d) cascade from this output exactly as
in batch — the (cnt, vmin, vmax, vsum) summary is associative.

Scale: state is one row per (conv_id, active bucket); the watermark
bounds state size. Partitioning follows groupBy's hash exchange on
(conv_id, window) — the same key the batch tier shuffles on.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_rollup_1m(transcripts_stream: DataFrame,
                     watermark: str = "2 minutes",
                     value_col: str = "len") -> DataFrame:
    """transcripts stream → per-minute (conv_id, bucket) aggregates.

    ``transcripts_stream`` must carry the input_hint schema. Returns a
    streaming DataFrame; write with
    ``df.writeStream.outputMode('append')``.
    """
    v = F.length("text").cast("double") if value_col == "len" else F.col(value_col)
    pts = transcripts_stream.select(
        "conv_id", F.col("ts").cast("timestamp").alias("ts"), v.alias("v"))
    agg = (
        pts.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.min("v").alias("vmin"),
             F.max("v").alias("vmax"),
             F.sum("v").alias("vsum"))
    )
    return agg.select(
        "conv_id", F.unix_millis(F.col("w.start")).alias("bucket"),
        "cnt", "vmin", "vmax", "vsum")


def stream_distinct_sketch_1m(transcripts_stream: DataFrame,
                              watermark: str = "2 minutes",
                              key_col: str = "conv_id",
                              lgk: int = 12) -> DataFrame:
    """Streaming twin of operators/sketches.distinct_sketch_tier: one
    HLL sketch of distinct ``key_col`` per emitted minute bucket.

    HLL insertion is order-insensitive, so the streamed sketch of a
    bucket equals the batch sketch of the same rows — coarser windows
    union the emitted sketches exactly as in batch
    (sketches.merge_sketch_tier).  State per bucket is one ~2.5 KB
    sketch, bounded by the watermark.
    """
    pts = transcripts_stream.select(
        F.col("ts").cast("timestamp").alias("ts"), key_col)
    agg = (pts.withWatermark("ts", watermark)
           .groupBy(F.window("ts", "1 minute").alias("w"))
           .agg(F.hll_sketch_agg(key_col, F.lit(lgk)).alias("sketch")))
    return agg.select(
        F.unix_millis(F.col("w.start")).alias("bucket"), "sketch")


def stream_item_counts_1m(transcripts_stream: DataFrame,
                          item_expr: str = "coalesce(tool, 'none')",
                          watermark: str = "2 minutes") -> DataFrame:
    """Streaming feeder of the top-k heavy-hitters tier: exact
    (bucket, item, cnt_lb) counts per emitted minute window.

    Truncation (sketches._truncate_topk) is a ranking window — not
    expressible inside a streaming aggregation — so the stream emits
    the EXACT fine counts (watermark-final, append mode) and the serve
    side truncates the sink in batch: topk over the streamed tier =
    sketches merge path with err=0 inputs, identical to the batch
    topk_tier of the same rows.  State per bucket is one counter per
    distinct item, bounded by the watermark.
    """
    pts = transcripts_stream.select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.expr(item_expr).alias("item"))
    agg = (pts.withWatermark("ts", watermark)
           .groupBy(F.window("ts", "1 minute").alias("w"), "item")
           .agg(F.count(F.lit(1)).alias("cnt_lb")))
    return agg.select(
        F.unix_millis(F.col("w.start")).alias("bucket"), "item", "cnt_lb",
        F.lit(0).cast("long").alias("err"),
        F.lit(0).cast("long").alias("bucket_err"))
