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
