"""Retention tiers: raw blocks + 1m/1h/1d rollups with age-based expiry.

Policy model (TimescaleDB-style): each tier keeps data newer than its
horizon relative to a reference "now" (default: max ts in the data, so
tests are deterministic). Expiry is a partition-pruned filter here; on
Iceberg it is a metadata-only `DELETE FROM tier WHERE bucket < cutoff`
or a partition drop — never a rewrite of surviving data.

``serve_union`` answers "give me the best-resolution data at every age"
— the continuous-aggregate read path: 1m for the recent window, 1h for
the mid window, 1d beyond.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import DAY_MS


@dataclass(frozen=True)
class RetentionPolicy:
    # horizons in days; tier keeps buckets with age < horizon
    keep_1m_days: int = 7
    keep_1h_days: int = 30
    keep_1d_days: int = 3650
    keep_blocks_days: int = 30


def cutoff_ms(now_ms: int, days: int) -> int:
    return (now_ms // DAY_MS) * DAY_MS - days * DAY_MS


def apply_retention(tier: DataFrame, now_ms: int, keep_days: int,
                    ts_col: str = "bucket") -> DataFrame:
    """Prunes whole partitions when the tier is partitioned by day."""
    return tier.where(F.col(ts_col) >= F.lit(cutoff_ms(now_ms, keep_days)))


def serve_union(t1m: DataFrame, t1h: DataFrame, t1d: DataFrame,
                now_ms: int, policy: RetentionPolicy = RetentionPolicy()) -> DataFrame:
    """Best-available-resolution view across the retention cascade."""
    c1m = cutoff_ms(now_ms, policy.keep_1m_days)
    c1h = cutoff_ms(now_ms, policy.keep_1h_days)
    parts = [
        t1m.where(F.col("bucket") >= c1m).withColumn("tier", F.lit("1m")),
        t1h.where((F.col("bucket") >= c1h) & (F.col("bucket") < c1m)).withColumn("tier", F.lit("1h")),
        t1d.where(F.col("bucket") < c1h).withColumn("tier", F.lit("1d")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
