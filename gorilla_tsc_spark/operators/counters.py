"""Counter and time-weighted aggregates over irregular point streams.

Two families every production TSDB ships alongside plain rollups (cf.
PromQL ``increase``/``rate`` and TimescaleDB's ``counter_agg`` /
``time_weight`` hyperfunctions — public semantics, reimplemented here
from their documented definitions):

- ``counter_increase``: per-series monotonic-counter delta with RESET
  handling — when a counter drops (process restart), the new value is
  counted as the increase since the reset, not a negative delta.
- ``rate_per_sec``: increase divided by the elapsed seconds of each
  step, as a per-point column (consumers bucket it with rollup_points).
- ``time_weighted_avg``: per-bucket mean weighted by how LONG each
  value was current (LOCF weighting), not by sample count — the right
  average for irregularly-sampled gauges, where plain avg over-weights
  bursts of samples.
- ``anomaly_zscore``: trailing-window z-score per tier row with a
  TIME-based frame (``rangeBetween`` on the bucket column), so sparse
  series don't smear old history into the baseline the way a row-count
  frame would.

Scale shape: everything here is a window function partitioned by
series + one groupBy keyed (series, bucket) — the same
partial-aggregate-then-shuffle profile as rollup_points; no Python in
the hot path, whole-stage codegen end to end.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import bucket_col


def counter_increase(points: DataFrame, value_col: str = "v",
                     keys=("conv_id",)) -> DataFrame:
    """Per-point counter increase with reset handling.

    increase = v - lag(v) when the counter moved forward, else v (the
    counter restarted from ~0; everything since the reset counts).
    The first point of a series has no baseline → increase 0.
    """
    w = Window.partitionBy(*keys).orderBy("ts_ms")
    prev = F.lag(value_col).over(w)
    inc = (F.when(prev.isNull(), F.lit(0.0))
           .when(F.col(value_col) >= prev, F.col(value_col) - prev)
           .otherwise(F.col(value_col)))
    return points.withColumn("increase", inc)


def rate_per_sec(points: DataFrame, value_col: str = "v",
                 keys=("conv_id",)) -> DataFrame:
    """Per-point rate: increase / elapsed seconds since the previous
    sample (null for a series' first point — no interval exists)."""
    w = Window.partitionBy(*keys).orderBy("ts_ms")
    dt_ms = F.col("ts_ms") - F.lag("ts_ms").over(w)
    out = counter_increase(points, value_col, keys)
    return out.withColumn(
        "rate",
        F.when(dt_ms.isNull() | (dt_ms <= 0), F.lit(None).cast("double"))
         .otherwise(F.col("increase") / (dt_ms / 1000.0)))


def time_weighted_avg(points: DataFrame, bucket_ms: int,
                      value_col: str = "v", keys=("conv_id",)) -> DataFrame:
    """LOCF time-weighted average per (series, bucket).

    Each sample's value is weighted by the time until the NEXT sample
    (clipped to the bucket end; the bucket's last interval extends to
    the bucket boundary so the full bucket duration is covered once the
    first sample arrives). Matches TimescaleDB's time_weight('LOCF')
    up to the boundary convention, which is pinned by the tests.

    One window (lead ts per series) + one groupBy (series, bucket):
    shuffle profile identical to a plain rollup.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy("ts_ms")
    bucket = bucket_col(F.col("ts_ms"), bucket_ms)
    next_ts = F.lead("ts_ms").over(w)
    bucket_end = bucket + F.lit(bucket_ms)
    # weight: time this value is current inside ITS OWN bucket
    weight = (F.least(F.coalesce(next_ts, bucket_end), bucket_end)
              - F.col("ts_ms")).cast("double")
    pts = points.select(
        *keys, "ts_ms", F.col(value_col).alias("_v"),
        bucket.alias("bucket"), weight.alias("_w"))
    return (pts.groupBy(*keys, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("_w").alias("weight_ms"),
                 (F.sum(F.col("_v") * F.col("_w")) / F.sum("_w"))
                 .alias("twavg")))


def anomaly_zscore(tier: DataFrame, bucket_ms: int, value_col: str,
                   window_buckets: int = 24, tau: float = 3.0,
                   min_baseline: int = 3, keys=("conv_id",),
                   season_ms: int | None = None) -> DataFrame:
    """Trailing-window z-score anomaly flags over a rollup tier.

    Baseline = mean/stddev of ``value_col`` over the PRECEDING
    ``window_buckets`` buckets (the current row excluded), using a
    range frame on the bucket timestamps — a gap in the series narrows
    the baseline rather than silently reaching further into the past.
    Rows with fewer than ``min_baseline`` baseline points, or a zero
    baseline deviation, get a null z (never a spurious flag).

    ``season_ms`` switches to a SEASONAL baseline: the window partition
    gains a phase key (``bucket % season_ms``) and the frame steps in
    season multiples, so an hourly tier with ``season_ms=DAY_MS``
    compares each bucket against the same hour of the preceding
    ``window_buckets`` days — the right baseline for daily-cyclic
    metrics where "3σ above the last 24 hours" would flag every
    morning ramp.

    Same shuffle profile as every tier op: one window partitioned by
    series (plus phase), ordered by bucket — whole-stage codegen, no
    Python.
    """
    if season_ms and season_ms % bucket_ms:
        # a misaligned season silently starves every baseline below
        # min_baseline (phases only re-align at lcm), disabling
        # detection with no error — reject it like the tier merges do
        raise ValueError(
            f"season_ms={season_ms} must be a multiple of "
            f"bucket_ms={bucket_ms}")
    step = season_ms if season_ms else bucket_ms
    parts = [F.col(k) for k in keys]
    if season_ms:
        parts.append((F.col("bucket") % season_ms).alias("_phase"))
    w = (Window.partitionBy(*parts).orderBy("bucket")
         .rangeBetween(-window_buckets * step, -step))
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when((n >= min_baseline) & (sd > 0),
               (F.col(value_col) - mu) / sd)
    return (tier
            .withColumn("baseline_n", n)
            .withColumn("z", z)
            .withColumn("anomaly", F.coalesce(F.abs(z) > tau,
                                              F.lit(False))))
