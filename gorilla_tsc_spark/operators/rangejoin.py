"""Range (point-in-interval) join — points annotated with the interval
containing them.

Spark plans ``pt.ts BETWEEN iv.start AND iv.end`` as a
BroadcastNestedLoopJoin (or a cartesian when both sides are large) —
the classic missing operator the round brief names alongside as-of
join.  The scalable decomposition is bucketization (the same trick
behind Databricks' range-join hints, here as a plain public-API
composition): explode each interval into the fixed-grain buckets it
overlaps, bucket the points, EQUIJOIN on (keys…, bucket), then apply
the exact containment predicate.

Cost model: the equijoin shuffles on (keys…, bucket) with normal hash
partitioning; each interval contributes ``ceil(len / bucket_ms)`` rows,
so pick ``bucket_ms`` near the TYPICAL interval length — one to a few
rows per interval, and each point meets only the handful of intervals
sharing its bucket, never the whole interval table.  Results are exact
regardless of the choice; only the row-amplification changes.

The natural pairing is ``sessionize`` (which emits per-conversation
session intervals) → range_join raw points onto their session.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame, bucket_ms: int,
               point_ts: str = "ts_ms", start_col: str = "start_ms",
               end_col: str = "end_ms", keys=("conv_id",),
               how: str = "inner") -> DataFrame:
    """Join each point to the interval(s) with
    ``start <= point_ts < end`` (half-open, the engine's bucket
    convention) sharing the same ``keys``.

    ``how='inner'`` drops unmatched points; ``'left'`` keeps them with
    null interval columns (interval columns other than the bounds are
    carried through).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = list(keys)
    b = F.lit(bucket_ms)
    # Guard before the explode: an inverted interval (end <= start,
    # e.g. a 0-sentinel end on a corrupt row) would make sequence()
    # DESCEND — one bad row amplifying into ~start/bucket_ms junk rows
    # (or a "Too long sequence" crash) that the exact predicate would
    # discard anyway.  Dropping them here is a semantic no-op.
    intervals = intervals.where(F.col(end_col) > F.col(start_col))
    # every bucket the interval overlaps: floor(start/B)..floor((end-1)/B)
    iv = (intervals
          .withColumn("_bidx", F.explode(F.sequence(
              F.floor(F.col(start_col) / b).cast("long"),
              F.floor((F.col(end_col) - 1) / b).cast("long"))))
          .withColumn("_bucket", F.col("_bidx") * b)
          .drop("_bidx"))
    pt = points.withColumn(
        "_bucket", F.floor(F.col(point_ts) / b).cast("long") * b)
    on = keys + ["_bucket"]
    matched = (pt.join(iv, on, "inner")
               .where((F.col(point_ts) >= F.col(start_col))
                      & (F.col(point_ts) < F.col(end_col)))
               .drop("_bucket"))
    if how == "inner":
        return matched
    missing = pt.drop("_bucket").join(
        matched.select(*keys, point_ts).distinct(),
        keys + [point_ts], "left_anti")
    return matched.unionByName(missing, allowMissingColumns=True)
