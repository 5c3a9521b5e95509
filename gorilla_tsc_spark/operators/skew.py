"""Explicit skew handling for hot conversations.

Two mechanisms, used together:

1. Deterministic sub-blocking (operators/encode.py ``seq``): the encode
   group key is (conv_id, day, seq) so one conversation's day splits
   into bounded chunks — removes stragglers WITHOUT breaking block
   decodability. This is the primary fix and needs no statistics.
2. Salted repartitioning for generic wide ops on conv_id (joins,
   per-conv aggregates that can recombine): detect hot keys from a
   cheap count, spread them over S salt buckets, recombine after.

AQE's skew-join splitting (enabled in session.py) is the backstop for
joins we don't hand-salt.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str = "conv_id", threshold_rows: int = 100_000) -> DataFrame:
    """One-pass histogram; tiny result (only keys above threshold)."""
    return (
        df.groupBy(key).count()
        .where(F.col("count") > threshold_rows)
        .select(key, F.col("count").alias("_hot_rows"))
    )


def with_salt(df: DataFrame, hot: DataFrame, key: str = "conv_id",
              salt_buckets: int = 16, order_col: str = "turn_idx") -> DataFrame:
    """Add a `salt` column: 0 for cold keys, hash-spread for hot keys.

    The hot-key list is broadcast (it is tiny by construction), so this
    adds no shuffle of the big side.
    """
    joined = df.join(F.broadcast(hot), on=key, how="left")
    return joined.withColumn(
        "salt",
        F.when(F.col("_hot_rows").isNotNull(),
               F.pmod(F.xxhash64(F.col(order_col)), F.lit(salt_buckets)))
         .otherwise(F.lit(0)).cast("int"),
    ).drop("_hot_rows")


def salted_repartition(df: DataFrame, n_partitions: int, key: str = "conv_id",
                       threshold_rows: int = 100_000, salt_buckets: int = 16) -> DataFrame:
    hot = hot_keys(df, key, threshold_rows)
    return with_salt(df, hot, key, salt_buckets).repartition(n_partitions, key, "salt")


def salted_rollup(points: DataFrame, bucket_ms: int,
                  threshold_rows: int = 100_000,
                  salt_buckets: int = 16) -> DataFrame:
    """Skew-safe two-phase rollup: the partial aggregate is keyed
    (conv_id, bucket, salt) — a hot conversation's rows spread over
    ``salt_buckets`` reducers — then the tiny partials merge on
    (conv_id, bucket).  Exact because (cnt, min, max, sum) recombine
    associatively (the same property the tier cascade relies on).

    This is the hand-salted twin of what AQE's skew handling does for
    joins; use it when one conversation dominates a bucket's row count
    (threshold_rows tunes hot-key detection; 0 salts every key)."""
    from .rollup import bucket_col
    hot = hot_keys(points, "conv_id", threshold_rows)
    salted = with_salt(points, hot, "conv_id", salt_buckets,
                       order_col="ts_ms")
    partial = (salted.groupBy(
        "conv_id", bucket_col(F.col("ts_ms"), bucket_ms).alias("bucket"),
        "salt")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.min("v").alias("vmin"),
             F.max("v").alias("vmax"),
             F.sum("v").alias("vsum")))
    return (partial.groupBy("conv_id", "bucket")
            .agg(F.sum("cnt").alias("cnt"),
                 F.min("vmin").alias("vmin"),
                 F.max("vmax").alias("vmax"),
                 F.sum("vsum").alias("vsum")))
