"""Time-weighted average tier (operators/timeweight.py): pure-Python
LOCF ground truth per bucket, cascade exactness vs a direct coarse
build, late-refresh ≡ full rebuild, zero-duration and tie edges."""
from __future__ import annotations

import math

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS
from gorilla_tsc_spark.operators.timeweight import (
    cascade_twa_tier,
    refresh_twa_tier,
    twa_estimates,
    twa_tier,
)


def _points(spark):
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, "/root/testdata/sf0.001")
    return t.select(
        "conv_id", F.unix_millis("ts").alias("ts_ms"),
        F.length("text").cast("double").alias("v"))


def _truth(rows, bucket_ms):
    """Reference: per (conv, bucket), sort by (ts, v), integrate the
    LOCF step over consecutive in-bucket pairs, divide by duration."""
    by_bucket = {}
    for conv, ts, v in rows:
        by_bucket.setdefault((conv, ts // bucket_ms * bucket_ms),
                             []).append((ts, v))
    out = {}
    for k, tv in by_bucket.items():
        tv.sort()
        wsum = sum(v * (tv[i + 1][0] - ts)
                   for i, (ts, v) in enumerate(tv[:-1]))
        dur = tv[-1][0] - tv[0][0]
        twa = wsum / dur if dur > 0 else tv[-1][1]
        out[k] = (len(tv), tv[0][0], tv[0][1], tv[-1][0], tv[-1][1],
                  wsum, twa)
    return out


def _collect(tier):
    return {(r["conv_id"], r["bucket"]):
            (r["n"], r["first_ts"], r["first_v"], r["last_ts"],
             r["last_v"], r["wsum"])
            for r in tier.collect()}


def test_twa_tier_matches_reference(spark):
    pts = _points(spark).cache()
    rows = [tuple(r) for r in pts.collect()]
    truth = _truth(rows, HOUR_MS)
    got = _collect(twa_tier(pts, HOUR_MS))
    assert set(got) == set(truth)
    for k, (n, fts, fv, lts, lv, wsum) in got.items():
        tn, tfts, tfv, tlts, tlv, twsum, _ = truth[k]
        assert (n, fts, lts) == (tn, tfts, tlts), k
        assert fv == tfv and lv == tlv, k
        assert math.isclose(wsum, twsum, rel_tol=1e-9, abs_tol=1e-6), k
    # serve: twa matches, and zero-duration buckets serve last_v
    est = {(r["conv_id"], r["bucket"]): (r["twa"], r["duration_ms"])
           for r in twa_estimates(twa_tier(pts, HOUR_MS)).collect()}
    for k, (twa, dur) in est.items():
        assert math.isclose(twa, truth[k][6], rel_tol=1e-9, abs_tol=1e-6)
        assert dur == truth[k][3] - truth[k][1]
    pts.unpersist()


def test_cascade_exactness(spark):
    pts = _points(spark).cache()
    fine = twa_tier(pts, HOUR_MS)
    merged = _collect(cascade_twa_tier(fine, HOUR_MS, DAY_MS))
    direct = _collect(twa_tier(pts, DAY_MS))
    assert set(merged) == set(direct)
    for k, m in merged.items():
        d = direct[k]
        assert m[:5] == d[:5], k
        assert math.isclose(m[5], d[5], rel_tol=1e-9, abs_tol=1e-6), k
    pts.unpersist()


def test_refresh_equals_rebuild(spark):
    pts = _points(spark).cache()
    # late = every 7th point — interleaves inside existing buckets
    tagged = pts.withColumn(
        "late", (F.xxhash64("conv_id", "ts_ms") % 7 == 0))
    on_time = tagged.where(~F.col("late")).drop("late").cache()
    late = tagged.where("late").drop("late").cache()
    assert late.count() > 0 and on_time.count() > 0
    tier = twa_tier(on_time, HOUR_MS)
    refreshed = _collect(refresh_twa_tier(tier, late, on_time, HOUR_MS))
    rebuilt = _collect(twa_tier(pts, HOUR_MS))
    assert set(refreshed) == set(rebuilt)
    for k, a in refreshed.items():
        b = rebuilt[k]
        assert a[:5] == b[:5], k
        assert math.isclose(a[5], b[5], rel_tol=1e-9, abs_tol=1e-6), k
    for df in (pts, on_time, late):
        df.unpersist()


def test_degenerate_and_ties(spark):
    rows = [
        ("c1", 1000, 5.0),                       # single point: twa = v
        ("c2", 1000, 1.0), ("c2", 1000, 9.0),    # all on one ts: last_v
        ("c3", 0, 2.0), ("c3", 1000, 4.0),       # plain two-point step
    ]
    pts = spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")
    est = {r["conv_id"]: r for r in
           twa_estimates(twa_tier(pts, HOUR_MS)).collect()}
    assert est["c1"]["twa"] == 5.0 and est["c1"]["duration_ms"] == 0
    # tie on ts: (ts, v) order makes 9.0 the last value deterministically
    assert est["c2"]["twa"] == 9.0 and est["c2"]["n"] == 2
    # LOCF: value 2.0 held for the full 1000 ms → twa = 2.0
    assert est["c3"]["twa"] == 2.0 and est["c3"]["duration_ms"] == 1000


def test_interpolated_estimates(spark):
    from gorilla_tsc_spark.operators.timeweight import (
        twa_interpolated_estimates)
    H = HOUR_MS
    rows = [
        # c1: two adjacent hour buckets + a later third, values step 2→4→8
        ("c1", 0, 2.0), ("c1", H - 600_000, 4.0),      # bucket 0
        ("c1", H + 600_000, 8.0),                      # bucket H
        ("c1", 3 * H + 600_000, 6.0),                  # bucket 3H (isolated tail)
        # c2: single isolated bucket — must equal plain twa_estimates
        ("c2", 10 * H + 100, 5.0), ("c2", 10 * H + 1100, 7.0),
    ]
    pts = spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")
    tier = twa_tier(pts, H)
    est = {(r["conv_id"], r["bucket"]): r for r in
           twa_interpolated_estimates(tier, H).collect()}

    # c1 bucket 0: no prev (head falls back to first_ts) but has next →
    # covered [0, H); integral = 2*(H-600k) (in-bucket) + 4*600k (tail)
    b0 = est[("c1", 0)]
    assert b0["covered_ms"] == H
    want0 = (2.0 * (H - 600_000) + 4.0 * 600_000) / H
    assert math.isclose(b0["twa_interp"], want0, rel_tol=1e-12)

    # c1 bucket H: prev exists (head: 4.0 held for 600k) and next exists
    # (tail: 8.0 held for H-600k) → covered the full hour
    b1 = est[("c1", H)]
    assert b1["covered_ms"] == H
    want1 = (4.0 * 600_000 + 0.0 + 8.0 * (H - 600_000)) / H
    assert math.isclose(b1["twa_interp"], want1, rel_tol=1e-12)

    # c1 bucket 3H: prev exists, no next → covered [3H, last_ts];
    # single point, wsum 0, head = 8.0 * 600k over 600k → 8.0
    b3 = est[("c1", 3 * H)]
    assert b3["covered_ms"] == 600_000
    assert math.isclose(b3["twa_interp"], 8.0, rel_tol=1e-12)

    # c2: isolated bucket ≡ plain twa_estimates (LOCF 5.0 over 1000 ms)
    c2 = est[("c2", 10 * H)]
    assert c2["covered_ms"] == 1000
    assert math.isclose(c2["twa_interp"], 5.0, rel_tol=1e-12)
