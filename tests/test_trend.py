"""Linear-trend tier (operators/trend.py): pure-Python ground truth
per bucket, the cascade's x-origin shift algebra vs a direct coarse
build, delta-merge refresh ≡ rebuild, fleet-wide series merge, and the
served OLS fit vs an independent least-squares computation (incl. the
NULL rules: singleton, one-minute, and constant-value buckets)."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS
from gorilla_tsc_spark.operators.trend import (
    cascade_trend_tier,
    merge_trend_series,
    refresh_trend_tier,
    trend_estimates,
    trend_tier,
)

M = 60_000


def _pts(spark):
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, "/root/testdata/sf0.001")
    return t.select("conv_id", F.unix_millis("ts").alias("ts_ms"),
                    F.length("text").cast("double").alias("v"))


def _truth(rows, bucket_ms):
    by_bucket = {}
    for conv, ts, v in rows:
        by_bucket.setdefault((conv, ts // bucket_ms * bucket_ms),
                             []).append((ts, v))
    out = {}
    for k, pl in by_bucket.items():
        xs = [(ts % bucket_ms) // M for ts, _ in pl]
        vs = [v for _, v in pl]
        out[k] = (len(pl), min(ts for ts, _ in pl),
                  max(ts for ts, _ in pl),
                  sum(xs), sum(vs), sum(x * x for x in xs),
                  sum(v * v for v in vs),
                  sum(x * v for x, v in zip(xs, vs)))
    return out


def _collect(tier):
    return {(r["conv_id"], r["bucket"]):
            (r["n"], r["first_ts"], r["last_ts"], r["sx"], r["sv"],
             r["sxx"], r["svv"], r["sxv"])
            for r in tier.collect()}


def test_trend_tier_matches_reference(spark):
    pts = _pts(spark).cache()
    rows = [tuple(r) for r in pts.collect()]
    got = _collect(trend_tier(pts, HOUR_MS))
    assert got == _truth(rows, HOUR_MS)
    pts.unpersist()


def test_cascade_shift_algebra_equals_direct(spark):
    pts = _pts(spark).cache()
    fine = trend_tier(pts, HOUR_MS)
    merged = _collect(cascade_trend_tier(fine, HOUR_MS, DAY_MS))
    direct = _collect(trend_tier(pts, DAY_MS))
    assert merged == direct        # exact, incl. the float sums
    pts.unpersist()


def test_refresh_is_delta_merge_and_equals_rebuild(spark):
    pts = _pts(spark).cache()
    tagged = pts.withColumn(
        "late", (F.xxhash64("conv_id", "ts_ms") % 5 == 0))
    on_time = tagged.where(~F.col("late")).drop("late").cache()
    late = tagged.where("late").drop("late").cache()
    assert late.count() > 0 and on_time.count() > 0
    refreshed = _collect(refresh_trend_tier(
        trend_tier(on_time, HOUR_MS), late, HOUR_MS))
    rebuilt = _collect(trend_tier(pts, HOUR_MS))
    assert refreshed == rebuilt
    for df in (pts, on_time, late):
        df.unpersist()


def test_merge_series_equals_pooled_build(spark):
    pts = _pts(spark).cache()
    merged = {r["bucket"]: (r["n"], r["sx"], r["sv"], r["sxx"],
                            r["svv"], r["sxv"])
              for r in merge_trend_series(
                  trend_tier(pts, DAY_MS)).collect()}
    pooled = {r["bucket"]: (r["n"], r["sx"], r["sv"], r["sxx"],
                            r["svv"], r["sxv"])
              for r in trend_tier(
                  pts.withColumn("conv_id", F.lit("all")),
                  DAY_MS).collect()}
    assert merged == pooled
    pts.unpersist()


def test_serve_ols_and_null_rules(spark):
    rows = [
        # c1: v = 2·minute + 1 exactly → slope 2, intercept 1, r² 1
        ("c1", 0, 1.0), ("c1", 3 * M, 7.0), ("c1", 10 * M, 21.0),
        # c2: constant v → slope 0, r² NULL (denv = 0)
        ("c2", 0, 5.0), ("c2", 4 * M, 5.0),
        # c3: singleton → slope/intercept/r² NULL
        ("c3", 2 * M, 9.0),
        # c4: two points inside ONE minute → den = 0 → all NULL
        ("c4", 1_000, 3.0), ("c4", 2_000, 8.0),
    ]
    pts = spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")
    est = {r["conv_id"]: r
           for r in trend_estimates(trend_tier(pts, DAY_MS)).collect()}
    c1 = est["c1"]
    assert (c1["tslope"], c1["tintercept"], c1["tr2"]) == (2.0, 1.0, 1.0)
    assert abs(c1["tmean"] - 29.0 / 3.0) < 1e-12
    c2 = est["c2"]
    assert c2["tslope"] == 0.0 and c2["tr2"] is None
    for conv in ("c3", "c4"):
        r = est[conv]
        assert r["tslope"] is None and r["tintercept"] is None \
            and r["tr2"] is None
    # against an independent least-squares fit on a non-trivial bucket
    import numpy as np
    xs = np.array([0.0, 3.0, 10.0])
    vs = np.array([1.0, 7.0, 21.5])
    pts2 = spark.createDataFrame(
        [("c", int(x) * M, float(v)) for x, v in zip(xs, vs)],
        "conv_id string, ts_ms long, v double")
    got = trend_estimates(trend_tier(pts2, DAY_MS)).collect()[0]
    slope, intercept = np.polyfit(xs, vs, 1)
    assert abs(got["tslope"] - slope) < 1e-9
    assert abs(got["tintercept"] - intercept) < 1e-9
    r = np.corrcoef(xs, vs)[0, 1]
    assert abs(got["tr2"] - r * r) < 1e-9


def test_forecast_predict_linear(spark):
    from gorilla_tsc_spark.operators.trend import trend_forecast
    rows = [
        # exact line v = 2·minute + 1: the forecast must sit ON the line
        ("c1", 0, 1.0), ("c1", 3 * M, 7.0), ("c1", 10 * M, 21.0),
        # singleton: fit is NULL → forecast must be NULL, never a point
        ("c3", 2 * M, 9.0),
    ]
    pts = spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")
    horizon = 30 * M
    fc = {r["conv_id"]: r
          for r in trend_forecast(trend_tier(pts, HOUR_MS), HOUR_MS,
                                  horizon).collect()}
    # x* = (60 + 30) minutes from bucket start → v = 2·90 + 1
    assert fc["c1"]["tforecast"] == 2.0 * 90.0 + 1.0
    assert fc["c3"]["tforecast"] is None
    # forecast at horizon 0 = fitted value at the bucket's right edge
    fc0 = trend_forecast(trend_tier(pts, HOUR_MS), HOUR_MS, 0) \
        .where(F.col("conv_id") == "c1").collect()[0]
    assert fc0["tforecast"] == 2.0 * 60.0 + 1.0
