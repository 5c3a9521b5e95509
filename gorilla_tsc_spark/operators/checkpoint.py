"""Per-partition lineage + metrics checkpointing with resume.

Every pipeline stage appends one row per completed unit of work (a
block, a tier partition) to an append-only checkpoint table. Resuming a
killed job anti-joins the work list against completed keys BEFORE the
encode kernel runs, so completed blocks are never re-encoded (north
rule). The completed-keys side is tiny (one row per block) and is
broadcast, so pruning never shuffles the big side.

Crash window note: a failure between "blocks written" and "checkpoint
row appended" re-encodes that group on resume; encode is deterministic,
and ``read_blocks`` dedupes on block identity, so the pipeline stays
idempotent (on Iceberg the write+log pair becomes one transaction).
"""
from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKPOINT_SCHEMA = T.StructType([
    T.StructField("stage", T.StringType()),
    T.StructField("part_key", T.StringType()),   # encode: conv|day|seq group
    T.StructField("detail", T.StringType()),     # encode: channel name
    T.StructField("n_points", T.LongType()),
    T.StructField("bytes", T.LongType()),
    T.StructField("crc", T.LongType()),
    T.StructField("wall_ms", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("run_id", T.StringType()),
])

BLOCK_ID_COLS = ["conv_id", "channel", "block_start", "seq"]


def group_key_col():
    """Encode-unit identity: one applyInPandas group (all its channels)."""
    return F.concat_ws("|", "conv_id", F.col("block_start").cast("string"), "seq")


def points_group_key_col(day_ms: int = 86_400_000):
    """Same identity computed on pre-encode point rows (day column)."""
    return F.concat_ws(
        "|", "conv_id", (F.col("day") * day_ms).cast("string"), "seq")


class CheckpointLog:
    def __init__(self, spark: SparkSession, warehouse: str, name: str = "checkpoints") -> None:
        self.spark = spark
        self.path = os.path.join(warehouse, name)
        self.run_id = uuid.uuid4().hex[:12]

    def _exists(self) -> bool:
        return os.path.exists(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path))

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return self.spark.read.parquet(self.path)

    def completed_keys(self, stage: str) -> DataFrame:
        return (
            self.read()
            .where((F.col("stage") == stage) & (F.col("status") == "ok"))
            .select("part_key")
            .distinct()
        )

    def pending(self, work: DataFrame, stage: str, key_col: str = "part_key") -> DataFrame:
        done = self.completed_keys(stage).withColumnRenamed("part_key", key_col)
        return work.join(F.broadcast(done), on=key_col, how="left_anti")

    def log_blocks(self, blocks: DataFrame, stage: str = "encode") -> None:
        """Append lineage rows for freshly written block rows."""
        t0 = int(time.time() * 1000)
        rows = blocks.select(
            F.lit(stage).alias("stage"),
            group_key_col().alias("part_key"),
            F.col("channel").alias("detail"),
            F.col("n_points").cast("long").alias("n_points"),
            F.length("payload").cast("long").alias("bytes"),
            F.col("crc").alias("crc"),
            F.lit(t0).alias("wall_ms"),
            F.lit("ok").alias("status"),
            F.lit(self.run_id).alias("run_id"),
        )
        rows.write.mode("append").parquet(self.path)

    def log_rows(self, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [(r["stage"], r["part_key"], r.get("detail"), r.get("n_points", 0),
              r.get("bytes", 0), r.get("crc", 0),
              r.get("wall_ms", int(time.time() * 1000)),
              r.get("status", "ok"), self.run_id)
             for r in rows],
            CHECKPOINT_SCHEMA,
        )
        df.write.mode("append").parquet(self.path)
