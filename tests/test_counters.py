"""Counter increase/rate and time-weighted average vs a NumPy reference
(operators/counters.py)."""
from __future__ import annotations

import numpy as np

from gorilla_tsc_spark.operators.counters import (
    counter_increase,
    rate_per_sec,
    time_weighted_avg,
)

BUCKET = 60_000


def _pts(spark):
    # two series: a monotonic counter with one reset, and a gauge with
    # irregular sampling (bursts + long quiet stretches)
    rows = []
    t0 = 1_700_000_000_000
    vals_a = [0.0, 10.0, 25.0, 3.0, 9.0, 50.0]      # reset at idx 3
    ts_a = [t0, t0 + 10_000, t0 + 40_000, t0 + 70_000, t0 + 95_000,
            t0 + 200_000]
    rows += [("a", t, v) for t, v in zip(ts_a, vals_a)]
    ts_b = [t0 + 1_000, t0 + 2_000, t0 + 3_000, t0 + 59_000, t0 + 130_000]
    vals_b = [100.0, 0.0, 50.0, 80.0, 20.0]
    rows += [("b", t, v) for t, v in zip(ts_b, vals_b)]
    return spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")


def test_counter_increase_and_rate(spark):
    got = {(r.conv_id, r.ts_ms): (r.increase, r.rate)
           for r in rate_per_sec(_pts(spark)).collect()}

    def ref(ts, vs):
        out = {}
        for i, (t, v) in enumerate(zip(ts, vs)):
            if i == 0:
                out[t] = (0.0, None)
            else:
                inc = v - vs[i - 1] if v >= vs[i - 1] else v
                out[t] = (inc, inc / ((t - ts[i - 1]) / 1000.0))
        return out

    t0 = 1_700_000_000_000
    ra = ref([t0, t0 + 10_000, t0 + 40_000, t0 + 70_000, t0 + 95_000,
              t0 + 200_000], [0.0, 10.0, 25.0, 3.0, 9.0, 50.0])
    for t, (inc, rate) in ra.items():
        ginc, grate = got[("a", t)]
        assert ginc == inc
        assert (grate is None) == (rate is None)
        if rate is not None:
            assert abs(grate - rate) < 1e-12
    # the reset row: increase == post-reset value, not negative
    assert got[("a", t0 + 70_000)][0] == 3.0


def test_time_weighted_avg(spark):
    got = {(r.conv_id, r.bucket): (r.twavg, r.weight_ms, r.cnt)
           for r in time_weighted_avg(_pts(spark), BUCKET).collect()}

    def ref(ts, vs):
        acc = {}
        for i, (t, v) in enumerate(zip(ts, vs)):
            b = (t // BUCKET) * BUCKET
            nxt = ts[i + 1] if i + 1 < len(ts) else b + BUCKET
            w = min(nxt, b + BUCKET) - t
            wsum, vw = acc.get(b, (0.0, 0.0))
            acc[b] = (wsum + w, vw + v * w)
        return {b: (vw / wsum, wsum) for b, (wsum, vw) in acc.items()}

    t0 = 1_700_000_000_000
    rb = ref([t0 + 1_000, t0 + 2_000, t0 + 3_000, t0 + 59_000, t0 + 130_000],
             [100.0, 0.0, 50.0, 80.0, 20.0])
    for b, (tw, wsum) in rb.items():
        gtw, gw, _ = got[("b", b)]
        assert abs(gtw - tw) < 1e-9, (b, gtw, tw)
        assert gw == wsum
    # burst of 3 samples in 2 s must NOT dominate the bucket: t0 sits
    # 20 s into its bucket (t0 % 60_000 == 20_000), so the bucket holds
    # the 3-sample burst with the 50.0 sample current for the remaining
    # 37 s — LOCF weighting pins ~50, where a plain avg of (100,0,50)
    # would say 50 by luck but (100,0,50,80) sample-weighted says 57.5
    b0 = ((t0 + 1_000) // BUCKET) * BUCKET
    assert abs(got[("b", b0)][0]
               - (100 * 1 + 0 * 1 + 50 * 37) / 39.0) < 1e-9


def test_twavg_on_decoded_channel(spark):
    """The operator composes with the codec path: time-weighted average
    over a decoded 'len' channel runs without reshaping."""
    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.encode import decode_blocks, encode_blocks
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, "/root/testdata/sf0.001")
    pts = (decode_blocks(encode_blocks(t))
           .where(F.col("channel") == "len")
           .select("conv_id", "ts_ms", F.col("v_double").alias("v")))
    out = time_weighted_avg(pts, 3_600_000)
    row = out.agg(F.count(F.lit(1)), F.min("weight_ms")).first()
    assert row[0] > 0 and row[1] > 0


def test_anomaly_zscore_vs_numpy(spark):
    """Time-ranged trailing z-score vs a NumPy reference, including a
    gap that must NARROW the baseline (range frame, not row frame), a
    planted spike, and the min-baseline guard."""
    from gorilla_tsc_spark.operators.counters import anomaly_zscore

    t0 = 1_700_000_000_000
    # series a: 10 steady buckets, a spike, 2 more; one 3-bucket gap
    buckets_a = [0, 1, 2, 3, 4, 5, 6, 10, 11, 12, 13, 14]
    vals_a = [5.0, 5.1, 4.9, 5.0, 5.2, 4.8, 5.0, 5.1, 4.9, 5.0, 5.2, 50.0]
    rows = [("a", t0 + b * BUCKET, v) for b, v in zip(buckets_a, vals_a)]
    # series b: too few points for any baseline
    rows += [("b", t0 + b * BUCKET, 1.0) for b in range(2)]
    tier = spark.createDataFrame(
        rows, "conv_id string, bucket long, v double")

    W = 5
    got = {(r["conv_id"], r["bucket"]): r
           for r in anomaly_zscore(tier, BUCKET, "v", window_buckets=W,
                                   tau=3.0, min_baseline=3).collect()}

    for i, (b, v) in enumerate(zip(buckets_a, vals_a)):
        base = [vals_a[j] for j in range(len(buckets_a))
                if b - W <= buckets_a[j] <= b - 1]
        r = got[("a", t0 + b * BUCKET)]
        if len(base) < 3 or np.std(base, ddof=1) == 0:
            assert r["z"] is None and not r["anomaly"], (b, r)
        else:
            want = (v - np.mean(base)) / np.std(base, ddof=1)
            assert abs(r["z"] - want) < 1e-9, (b, r["z"], want)
            assert r["anomaly"] == (abs(want) > 3.0), b
            assert r["baseline_n"] == len(base)
    # exactly one anomaly: the planted spike
    flagged = [k for k, r in got.items() if r["anomaly"]]
    assert flagged == [("a", t0 + 14 * BUCKET)]
    # series b never has a baseline
    assert all(got[("b", t0 + b * BUCKET)]["z"] is None for b in range(2))


def test_anomaly_zscore_seasonal(spark):
    """Seasonal baseline: an hourly tier with a strong daily cycle — a
    morning ramp is NOT anomalous vs the same hour of prior days, but a
    spike at a normally-quiet hour is; the trailing (non-seasonal)
    baseline gets the ramp wrong, which is the point of the mode."""
    from gorilla_tsc_spark.operators.counters import anomaly_zscore

    HOUR = 3_600_000
    DAY = 24 * HOUR
    t0 = 1_700_000_000_000 - (1_700_000_000_000 % DAY)
    rows = []
    rng = np.random.default_rng(3)
    for d in range(8):
        for h in range(24):
            v = (100.0 if 8 <= h <= 18 else 5.0) + rng.normal(0, 1.0)
            # day 7, 03:00 — a spike at a quiet hour, same size as the
            # NORMAL daytime level (invisible to a level-based check)
            if d == 7 and h == 3:
                v = 100.0
            rows.append(("a", t0 + d * DAY + h * HOUR, float(v)))
    tier = spark.createDataFrame(rows, "conv_id string, bucket long, v double")

    got = {r["bucket"]: r for r in anomaly_zscore(
        tier, HOUR, "v", window_buckets=6, tau=5.0,
        min_baseline=5, season_ms=DAY).collect()}
    spike = t0 + 7 * DAY + 3 * HOUR
    assert got[spike]["anomaly"], got[spike]
    # the morning ramp (08:00 of day 7) is normal vs prior 08:00s
    assert not got[t0 + 7 * DAY + 8 * HOUR]["anomaly"]
    # exactly one seasonal anomaly across the whole series
    flagged = [b for b, r in got.items() if r["anomaly"]]
    assert flagged == [spike]
    # day 0 has no seasonal history -> null z everywhere
    assert all(got[t0 + h * HOUR]["z"] is None for h in range(24))


def test_anomaly_zscore_rejects_misaligned_season(spark):
    import pytest
    from gorilla_tsc_spark.operators.counters import anomaly_zscore
    tier = spark.createDataFrame(
        [("a", 0, 1.0)], "conv_id string, bucket long, v double")
    with pytest.raises(ValueError, match="multiple of"):
        anomaly_zscore(tier, 3_600_000, "v", season_ms=5_000_000)
