"""As-of join: for each probe row, the latest tier row at or before it.

The classic time-series lookup (TimescaleDB/QuestDB/kdb ``asof``),
absent from Spark's built-ins.  Expressed Spark-first as the
union + ordered-window merge:

1. tag tier rows 0 and probe rows 1, union them on the key columns;
2. one window per key ordered by (ts, tag) — a tier row at the same
   timestamp sorts before the probe, so ``>=`` semantics hold;
3. ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..
   CURRENT ROW carries the most recent tier values forward;
4. keep the probe rows.

Plan properties: ONE shuffle keyed by the join keys (the window's
hash exchange), a per-partition sort, no range-join row blowup and no
cartesian — the same merge an MPP engine runs for ASOF JOIN, which is
why this survives a 1000-executor scale-up: probes and tier co-locate
by key, and skewed keys can pre-split by time range if ever needed.

The DuckDB oracle is the native ``ASOF JOIN`` (queries.ASOF_TIER_SQL),
so the operator is driver-gated against an independent implementation.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probes: DataFrame, tier: DataFrame,
              keys: tuple[str, ...] = ("conv_id",),
              probe_ts: str = "ts_ms", tier_ts: str = "bucket",
              value_cols: tuple[str, ...] = ("cnt", "vmin", "vmax", "vsum"),
              ) -> DataFrame:
    """probes ⟕ₐₛₒ tier — inner as-of semantics (probes with no earlier
    tier row are dropped, like DuckDB's ASOF JOIN)."""
    t = (tier.select(*keys, F.col(tier_ts).alias("_t"),
                     *[F.col(c) for c in value_cols])
         .withColumn("_tag", F.lit(0))
         .withColumn("_tier_t", F.col("_t")))
    p = (probes.select(*keys, F.col(probe_ts).alias("_t"))
         .withColumn("_tag", F.lit(1)))
    u = t.unionByName(p, allowMissingColumns=True)
    w = (Window.partitionBy(*keys).orderBy("_t", "_tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        *keys, "_t", "_tag",
        F.last("_tier_t", ignorenulls=True).over(w).alias(tier_ts),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols])
    return (filled.where((F.col("_tag") == 1) & F.col(tier_ts).isNotNull())
            .select(*keys, F.col("_t").alias(probe_ts), tier_ts, *value_cols))
