"""Gap-fill: densify rollup tiers onto a regular bucket grid.

Grid generation is sequence()+explode per series (JVM-side, no Python);
fill policies: 'null' (mark gaps), 'locf' (last-observation-carried-
forward via last(ignorenulls) over an ordered window), 'zero' (cnt=0).

Scale: the grid join is keyed (conv_id, channel, bucket) — co-
partitioned with the rollup output, so AQE usually plans it without an
extra exchange of the big side; the window for locf partitions by
series, never globally.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill(tier: DataFrame, bucket_ms: int, how: str = "locf",
            keys=("conv_id", "channel")) -> DataFrame:
    keys = list(keys)
    spans = tier.groupBy(*keys).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("_b0"), F.col("_b1"), F.lit(bucket_ms).cast("long"))
        ).alias("bucket"),
    )
    joined = grid.join(tier, on=keys + ["bucket"], how="left")
    filled = joined.withColumn("is_gap", F.col("cnt").isNull())
    if how == "null":
        return filled
    if how == "zero":
        return filled.fillna({"cnt": 0, "vsum": 0.0})
    if how == "locf":
        w = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in ("vmin", "vmax", "vsum"):
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
        return filled.fillna({"cnt": 0})
    if how == "linear":
        # TimescaleDB-style interpolate(): gap values lie on the line
        # between the surrounding observed buckets; boundary gaps (none
        # here — the grid spans observed min..max) would stay null.
        # Exact cross-engine: the tier values are integer-valued
        # doubles, and the expression multiplies BEFORE dividing —
        # (nv-pv)*(bucket-pb) is an exact product, then one division,
        # then one rounding — the same order SQL's left-associative
        # (nv-pv)*(bucket-pb)/(nb-pb) evaluates, so both engines round
        # the same double.
        wb = Window.partitionBy(*keys).orderBy("bucket")
        wprev = wb.rowsBetween(Window.unboundedPreceding, 0)
        wnext = wb.rowsBetween(0, Window.unboundedFollowing)
        obs_b = F.when(~F.col("is_gap"), F.col("bucket"))
        filled = (filled
                  .withColumn("_pb", F.last(obs_b, ignorenulls=True).over(wprev))
                  .withColumn("_nb", F.first(obs_b, ignorenulls=True).over(wnext)))
        for c in ("vmin", "vmax", "vsum"):
            pv = F.last(c, ignorenulls=True).over(wprev)
            nv = F.first(c, ignorenulls=True).over(wnext)
            lerp = pv + ((nv - pv) * (F.col("bucket") - F.col("_pb"))
                         / (F.col("_nb") - F.col("_pb")))
            filled = filled.withColumn(
                c, F.when(~F.col("is_gap"), F.col(c))
                    .otherwise(F.round(lerp, 6)))
        return filled.drop("_pb", "_nb").fillna({"cnt": 0})
    if how == "locf_linear":
        # Both fill families from ONE densified grid + one ordered
        # window pass per direction — the serving profile that wants
        # carry-forward for min/max alongside interpolated sums reads
        # them side by side without re-densifying.
        wb = Window.partitionBy(*keys).orderBy("bucket")
        wprev = wb.rowsBetween(Window.unboundedPreceding, 0)
        wnext = wb.rowsBetween(0, Window.unboundedFollowing)
        obs_b = F.when(~F.col("is_gap"), F.col("bucket"))
        filled = (filled
                  .withColumn("_pb", F.last(obs_b, ignorenulls=True).over(wprev))
                  .withColumn("_nb", F.first(obs_b, ignorenulls=True).over(wnext)))
        for c in ("vmin", "vmax", "vsum"):
            pv = F.last(c, ignorenulls=True).over(wprev)
            nv = F.first(c, ignorenulls=True).over(wnext)
            lerp = pv + ((nv - pv) * (F.col("bucket") - F.col("_pb"))
                         / (F.col("_nb") - F.col("_pb")))
            filled = (filled
                      .withColumn(f"{c}_locf", pv)
                      .withColumn(f"{c}_lin",
                                  F.when(~F.col("is_gap"), F.col(c))
                                   .otherwise(F.round(lerp, 6))))
        return (filled.drop("_pb", "_nb", "vmin", "vmax", "vsum")
                .fillna({"cnt": 0}))
    raise ValueError(f"unknown fill policy {how!r}")
