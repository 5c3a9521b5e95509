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
