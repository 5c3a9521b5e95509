"""Heartbeat/uptime tier (operators/heartbeat.py): pure-Python ground
truth per bucket, cascade exactness vs a direct coarse build, late
refresh ≡ rebuild (a late beat can split a gap and un-count an
interruption), duplicate-beat and single-beat edges."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.heartbeat import (
    cascade_heartbeat_tier,
    heartbeat_estimates,
    heartbeat_tier,
    refresh_heartbeat_tier,
)
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS

HB = 5 * 60_000  # declared beat interval: 5 minutes


def _beats(spark):
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, "/root/testdata/sf0.001")
    return t.select("conv_id", F.unix_millis("ts").alias("ts_ms"))


def _truth(rows, bucket_ms, hb_ms):
    by_bucket = {}
    for conv, ts in set(rows):          # dedupe beats, like the operator
        by_bucket.setdefault((conv, ts // bucket_ms * bucket_ms),
                             []).append(ts)
    out = {}
    for k, ts_list in by_bucket.items():
        ts_list.sort()
        gaps = [b - a for a, b in zip(ts_list, ts_list[1:])]
        out[k] = (len(ts_list), ts_list[0], ts_list[-1],
                  sum(min(g, hb_ms) for g in gaps),
                  max(gaps, default=0),
                  sum(1 for g in gaps if g > hb_ms))
    return out


def _collect(tier):
    return {(r["conv_id"], r["bucket"]):
            (r["n"], r["first_ts"], r["last_ts"], r["live_ms"],
             r["max_gap_ms"], r["interruptions"])
            for r in tier.collect()}


def test_heartbeat_tier_matches_reference(spark):
    beats = _beats(spark).cache()
    rows = [tuple(r) for r in beats.collect()]
    truth = _truth(rows, HOUR_MS, HB)
    got = _collect(heartbeat_tier(beats, HOUR_MS, HB))
    assert got == truth
    # at least some buckets must actually have gaps > HB for the test
    # to exercise the interruption path
    assert any(v[5] > 0 for v in truth.values())
    beats.unpersist()


def test_cascade_exactness(spark):
    beats = _beats(spark).cache()
    fine = heartbeat_tier(beats, HOUR_MS, HB)
    merged = _collect(cascade_heartbeat_tier(fine, HOUR_MS, DAY_MS, HB))
    direct = _collect(heartbeat_tier(beats, DAY_MS, HB))
    assert merged == direct
    beats.unpersist()


def test_refresh_equals_rebuild(spark):
    beats = _beats(spark).cache()
    tagged = beats.withColumn(
        "late", (F.xxhash64("conv_id", "ts_ms") % 5 == 0))
    on_time = tagged.where(~F.col("late")).drop("late").cache()
    late = tagged.where("late").drop("late").cache()
    assert late.count() > 0 and on_time.count() > 0
    tier = heartbeat_tier(on_time, HOUR_MS, HB)
    refreshed = _collect(
        refresh_heartbeat_tier(tier, late, on_time, HOUR_MS, HB))
    rebuilt = _collect(heartbeat_tier(beats, HOUR_MS, HB))
    assert refreshed == rebuilt
    for df in (beats, on_time, late):
        df.unpersist()


def test_edges_and_serve(spark):
    m = 60_000
    rows = [
        ("c1", 0), ("c1", 2 * m), ("c1", 20 * m),   # 2m live + 18m gap
        ("c1", 20 * m),                             # duplicate beat
        ("c2", 7 * m),                              # single beat
    ]
    beats = spark.createDataFrame(rows, "conv_id string, ts_ms long")
    est = {r["conv_id"]: r for r in
           heartbeat_estimates(heartbeat_tier(beats, DAY_MS, HB)).collect()}
    c1 = est["c1"]
    assert c1["n"] == 3                              # dup collapsed
    # live = min(2m,5m) + min(18m,5m) = 7m over a 20m span
    assert c1["live_ms"] == 7 * m and c1["span_ms"] == 20 * m
    assert c1["max_gap_ms"] == 18 * m and c1["interruptions"] == 1
    assert c1["uptime_ratio"] == 7 / 20
    assert c1["downtime_ms"] == 13 * m
    c2 = est["c2"]
    assert c2["n"] == 1 and c2["uptime_ratio"] == 1.0
    assert c2["span_ms"] == 0 and c2["interruptions"] == 0


def test_interpolated_uptime(spark):
    from gorilla_tsc_spark.operators.heartbeat import (
        heartbeat_interpolated_estimates)
    m, H = 60_000, HOUR_MS
    rows = [
        # c1 bucket 0: beats at 50m and 58m; bucket H: beat at 10m past
        ("c1", 50 * m), ("c1", 58 * m), ("c1", H + 10 * m),
        # c2: single bucket, single beat at minute 30 — no prev
        ("c2", 3 * H + 30 * m),
    ]
    beats = spark.createDataFrame(rows, "conv_id string, ts_ms long")
    tier = heartbeat_tier(beats, H, HB)   # HB = 5m
    est = {(r["conv_id"], r["bucket"]): r for r in
           heartbeat_interpolated_estimates(tier, H, HB).collect()}

    # c1 bucket 0: no prev → window [50m, 60m) = 10m;
    # in-bucket live = min(8m, 5m) = 5m; tail = min(5m, 60m-58m) = 2m
    b0 = est[("c1", 0)]
    assert b0["window_ms"] == 10 * m
    assert b0["live_interp_ms"] == 5 * m + 2 * m
    assert b0["uptime_interp"] == (7 * m) / (10 * m)

    # c1 bucket H: prev exists → full 60m window; head: prev_last 58m
    # + 5m = 63m > first_ts(70m)? no — min(63m, 70m) − 60m = 3m;
    # in-bucket live = 0 (single beat); tail = min(5m, 60m−10m) = 5m
    b1 = est[("c1", H)]
    assert b1["window_ms"] == H
    assert b1["live_interp_ms"] == 3 * m + 5 * m
    assert b1["downtime_interp_ms"] == H - 8 * m

    # c2: no prev, single beat → window [30m, 60m), live = tail = 5m
    c2 = est[("c2", 3 * H)]
    assert c2["window_ms"] == 30 * m
    assert c2["live_interp_ms"] == 5 * m
    assert c2["uptime_interp"] == (5 * m) / (30 * m)
