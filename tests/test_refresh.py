"""Incremental tier refresh: late-data merge equals full recompute
(operators/rollup.py merge_tiers / refresh_tier)."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.rollup import (
    HOUR_MS,
    MINUTE_MS,
    cascade,
    merge_tiers,
    refresh_tier,
    rollup_points,
)
from gorilla_tsc_spark.queries import _len_points


def _split(spark):
    """Deterministically split sf0.001 points into an 'on-time' batch
    and a 'late' batch that lands inside already-rolled-up buckets."""
    pts = _len_points(spark, "/root/testdata/sf0.001").cache()
    late = pts.where(F.xxhash64("conv_id", "ts_ms") % 10 == 0)
    ontime = pts.where(F.xxhash64("conv_id", "ts_ms") % 10 != 0)
    return pts, ontime, late


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_refresh_equals_full_recompute(spark):
    pts, ontime, late = _split(spark)
    assert late.count() > 0 and ontime.count() > 0
    full = rollup_points(pts, MINUTE_MS, F.col("v"), keys=("conv_id",))
    t0 = rollup_points(ontime, MINUTE_MS, F.col("v"), keys=("conv_id",))
    refreshed = refresh_tier(t0, late, MINUTE_MS, keys=("conv_id",))
    assert _rows(refreshed) == _rows(full)


def test_refreshed_tier_cascades_exactly(spark):
    pts, ontime, late = _split(spark)
    full_1h = rollup_points(pts, HOUR_MS, F.col("v"), keys=("conv_id",))
    t0 = rollup_points(ontime, MINUTE_MS, F.col("v"), keys=("conv_id",))
    refreshed = refresh_tier(t0, late, MINUTE_MS, keys=("conv_id",))
    assert _rows(cascade(refreshed, MINUTE_MS, HOUR_MS, keys=("conv_id",))) \
        == _rows(full_1h)


def test_merge_disjoint_passthrough(spark):
    pts, ontime, late = _split(spark)
    t_on = rollup_points(ontime, MINUTE_MS, F.col("v"), keys=("conv_id",))
    t_late = rollup_points(late, MINUTE_MS, F.col("v"), keys=("conv_id",))
    merged = merge_tiers(t_on, t_late, keys=("conv_id",))
    # merged bucket set is the union; counts add up globally
    assert merged.agg(F.sum("cnt")).first()[0] == pts.count()
