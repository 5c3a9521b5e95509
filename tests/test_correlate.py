"""Cross-channel correlation tier (operators/correlate.py): NumPy
ground truth per bucket, cascade exactness, late-refresh ≡ recompute,
degenerate-bucket guards."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.correlate import (
    cascade_corr_tier,
    corr_estimates,
    corr_tier,
    refresh_corr_tier,
)
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS


def _points(spark):
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, "/root/testdata/sf0.001")
    return t.select(
        "conv_id", F.unix_millis("ts").alias("ts_ms"),
        F.length("text").cast("double").alias("x"),
        F.size(F.split("text", r"\s+")).cast("double").alias("y"))


def _truth(rows, bucket_ms):
    by_bucket = {}
    for conv, ts, x, y in rows:
        by_bucket.setdefault((conv, ts // bucket_ms * bucket_ms),
                             []).append((x, y))
    out = {}
    for k, xy in by_bucket.items():
        a = np.asarray(xy, dtype=np.float64)
        x, y = a[:, 0], a[:, 1]
        n = len(x)
        cov = float(np.mean(x * y) - x.mean() * y.mean())
        r = slope = intercept = None
        if n >= 2 and x.var() > 0:
            slope = cov / float(x.var())
            intercept = float(y.mean() - slope * x.mean())
            if y.var() > 0:
                r = cov / float(np.sqrt(x.var() * y.var()))
        out[k] = (n, cov, r, slope, intercept)
    return out


def test_corr_tier_matches_numpy(spark):
    pts = _points(spark).cache()
    rows = [tuple(r) for r in pts.collect()]
    want = _truth(rows, HOUR_MS)
    got = {(r["conv_id"], r["bucket"]):
           (r["n"], r["cov"], r["r"], r["slope"], r["intercept"])
           for r in corr_estimates(corr_tier(pts, HOUR_MS)).collect()}
    assert got.keys() == want.keys() and got
    for k, (n, cov, r, slope, intercept) in want.items():
        gn, gcov, gr, gslope, gintercept = got[k]
        assert gn == n
        assert abs(gcov - cov) < 1e-9 * max(1.0, abs(cov))
        for a, b in ((gr, r), (gslope, slope), (gintercept, intercept)):
            if b is None:
                assert a is None, (k, a, b)
            else:
                assert abs(a - b) < 1e-6 * max(1.0, abs(b)), (k, a, b)
    # correlated-by-construction channels: r must skew positive
    rs = [v[2] for v in got.values() if v[2] is not None]
    assert rs and np.median(rs) > 0.5
    pts.unpersist()


def test_corr_cascade_equals_direct_build(spark):
    pts = _points(spark).cache()
    fine = corr_tier(pts, HOUR_MS)
    got = {tuple(r) for r in
           cascade_corr_tier(fine, HOUR_MS, DAY_MS).collect()}
    want = {tuple(r) for r in corr_tier(pts, DAY_MS).collect()}
    assert _close(got) == _close(want) and got
    pts.unpersist()


def test_corr_refresh_equals_recompute(spark):
    pts = _points(spark).cache()
    ontime = pts.where(F.col("ts_ms") % 5 != 2)
    late = pts.where(F.col("ts_ms") % 5 == 2)
    tier = corr_tier(ontime, HOUR_MS)
    got = {tuple(r) for r in
           refresh_corr_tier(tier, late, HOUR_MS).collect()}
    want = {tuple(r) for r in corr_tier(pts, HOUR_MS).collect()}
    assert _close(got) == _close(want) and got
    # untouched buckets pass through bit-identically
    late_buckets = {(r["conv_id"], r["bucket"]) for r in
                    corr_tier(late, HOUR_MS).collect()}
    tier_rows = {(r["conv_id"], r["bucket"]): tuple(r)
                 for r in tier.collect()}
    got_rows = {(r[0], r[1]): r for r in got}
    for k, row in tier_rows.items():
        if k not in late_buckets:
            assert got_rows[k] == row
    pts.unpersist()


def _close(rows, nd=6):
    return {tuple(round(v, nd) if isinstance(v, float) else v
                  for v in r) for r in rows}


def test_corr_degenerate_buckets_serve_null(spark):
    rows = [("c1", 0, 1.0, 2.0),                      # n=1
            ("c2", 0, 3.0, 1.0), ("c2", 1, 3.0, 9.0),  # zero var(x)
            ("c3", 0, 1.0, 5.0), ("c3", 1, 2.0, 5.0)]  # zero var(y)
    pts = spark.createDataFrame(
        rows, "conv_id string, ts_ms long, x double, y double")
    got = {r["conv_id"]: r for r in
           corr_estimates(corr_tier(pts, HOUR_MS)).collect()}
    assert got["c1"]["r"] is None and got["c1"]["slope"] is None
    assert got["c2"]["r"] is None and got["c2"]["slope"] is None
    assert got["c3"]["r"] is None          # zero y-variance: no r ...
    assert got["c3"]["slope"] == 0.0       # ... but a flat OLS fit
    assert got["c3"]["intercept"] == 5.0
    # null on either side excludes the pair, not the bucket
    pts2 = spark.createDataFrame(
        [("c4", 0, 1.0, 2.0), ("c4", 1, None, 9.0), ("c4", 2, 2.0, 4.0)],
        "conv_id string, ts_ms long, x double, y double")
    assert corr_tier(pts2, HOUR_MS).first()["n"] == 2
