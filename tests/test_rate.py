"""Counter rate/increase tier (operators/rate.py): golden hand cases
for the reset-corrected pair walk, the two family laws (cascade ≡
direct, refresh ≡ rebuild — also stressed per-seed in
test_tier_family_random.py), the interpolated-serve conservation
invariant, and the streaming twin's bit-equality to the batch tier."""
from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.rate import (cascade_rate_tier,
                                              rate_estimates,
                                              rate_interpolated_estimates,
                                              rate_tier, refresh_rate_tier)
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS

RCOLS = ("n", "first_ts", "first_v", "last_ts", "last_v",
         "increase", "resets")

# one series: climb, reset, a same-ts tie pair, another reset
GOLDEN = [("a", 1000, 10.0), ("a", 2000, 25.0), ("a", 3000, 5.0),
          ("a", 3000, 7.0), ("a", 4000, 1.0)]


def _pts(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")


def _rows(df):
    return {(r["conv_id"], r["bucket"]):
            tuple(r[c] for c in RCOLS) for r in df.collect()}


def test_rate_tier_golden_single_bucket(spark):
    t = rate_tier(_pts(spark, GOLDEN), 60_000).collect()
    assert len(t) == 1
    r = t[0]
    # pairs in (ts, v) order: 10→25 (+15), 25→5 (reset, +5),
    # 5→7 (+2), 7→1 (reset, +1)
    assert (r["n"], r["first_ts"], r["first_v"], r["last_ts"],
            r["last_v"]) == (5, 1000, 10.0, 4000, 1.0)
    assert r["increase"] == 23.0 and r["resets"] == 2


def test_rate_tier_golden_bucketed_and_cascade(spark):
    pts = _pts(spark, GOLDEN)
    fine = rate_tier(pts, 2000)
    got = _rows(fine)
    assert got[("a", 0)] == (1, 1000, 10.0, 1000, 10.0, 0.0, 0)
    assert got[("a", 2000)] == (3, 2000, 25.0, 3000, 7.0, 7.0, 1)
    assert got[("a", 4000)] == (1, 4000, 1.0, 4000, 1.0, 0.0, 0)
    # cascade re-derives the direct coarse build: the 0→2000 seam pair
    # (10 → 25) is growth no fine bucket counted
    assert _rows(cascade_rate_tier(fine, 2000, 4000)) == \
        _rows(rate_tier(pts, 4000))


def test_rate_estimates_and_interp(spark):
    fine = rate_tier(_pts(spark, GOLDEN), 2000)
    est = {r["bucket"]: r for r in
           rate_estimates(rate_interpolated_estimates(fine)).collect()}
    assert est[0]["duration_ms"] == 0 and est[0]["rate_per_s"] is None
    assert est[2000]["duration_ms"] == 1000
    assert math.isclose(est[2000]["rate_per_s"], 7.0)
    # seam growth attributed to the LATER bucket; a seam drop is a reset
    assert est[0]["increase_interp"] == 0.0
    assert est[2000]["increase_interp"] == 22.0  # 7 + (25 - 10)
    assert est[4000]["increase_interp"] == 1.0   # 0 + reset-to-1
    assert est[4000]["resets_interp"] == 1
    # conservation: Σ increase_interp ≡ the unbucketed series increase
    assert sum(r["increase_interp"] for r in est.values()) == 23.0


def test_rate_interp_conservation_randomized(spark):
    """Σ increase_interp over a series' tier rows must equal the
    whole-series increase (computed independently in NumPy), for
    counters that wrap, jitter, and go silent for days."""
    rng = np.random.RandomState(7)
    rows = []
    base = 1_700_000_000_000
    for s in range(6):
        n = int(rng.randint(2, 150))
        gaps = rng.choice([0, 1_000, HOUR_MS, DAY_MS], size=n,
                          p=[.1, .5, .3, .1])
        ts = base + np.cumsum(gaps).astype(np.int64)
        v = np.cumsum(rng.randint(0, 900, size=n)) % 10_000
        rows += [(f"r{s}", int(t), float(x)) for t, x in zip(ts, v)]
    pts = _pts(spark, rows)
    tier = rate_interpolated_estimates(rate_tier(pts, HOUR_MS))
    got = {r["conv_id"]: r["inc"] for r in
           tier.groupBy("conv_id")
               .agg(F.sum("increase_interp").alias("inc")).collect()}
    pdf = pts.toPandas()
    for s, g in pdf.groupby("conv_id"):
        v = g.sort_values(["ts_ms", "v"])["v"].to_numpy()
        d = np.diff(v)
        want = float(np.where(d < 0, v[1:], d).sum())
        assert math.isclose(got[s], want), s


def test_rate_refresh_matches_rebuild(spark):
    """Late points interleave with the pair walk (can flip resets), so
    refresh must reproduce the full rebuild exactly."""
    rng = np.random.RandomState(3)
    rows = []
    base = 1_700_000_000_000
    for s in range(5):
        n = int(rng.randint(3, 100))
        ts = base + np.cumsum(rng.randint(1, HOUR_MS, size=n)).astype(np.int64)
        v = np.cumsum(rng.randint(0, 500, size=n)) % 20_000
        rows += [(f"f{s}", int(t), float(x)) for t, x in zip(ts, v)]
    pts = _pts(spark, rows).cache()
    late = pts.where(F.xxhash64("conv_id", "ts_ms") % 3 == 0)
    on_time = pts.exceptAll(late).cache()
    refreshed = refresh_rate_tier(rate_tier(on_time, HOUR_MS), late,
                                  on_time, HOUR_MS)
    assert _rows(refreshed) == _rows(rate_tier(pts, HOUR_MS))
    pts.unpersist()
    on_time.unpersist()


def test_stream_rate_matches_batch(spark, tmp_path):
    """Every watermark-sealed streaming rate row must bit-equal the
    batch rate_tier row; the far-future sentinel seals every bucket
    under the bounded replay → full-set equality."""
    from datetime import timedelta

    from gorilla_tsc_spark.sources.transcripts import synthesize_transcripts
    from gorilla_tsc_spark.streaming import stream_rate_tier

    t = synthesize_transcripts(spark, n_convs=12, max_turns=200)
    pts = t.select("conv_id", "ts", F.length("text").cast("double").alias("v"))
    replay = str(tmp_path / "replay_rate")
    pts.write.parquet(replay)
    max_ts = pts.agg(F.max("ts")).first()[0]
    spark.createDataFrame(
        [("__sentinel__", max_ts + timedelta(days=3), 0.0)],
        "conv_id string, ts timestamp, v double") \
        .write.mode("append").parquet(replay)

    stream = spark.readStream.schema(
        "conv_id string, ts timestamp, v double").parquet(replay)
    q = (stream_rate_tier(stream, HOUR_MS).writeStream.format("memory")
         .queryName("rate_stream").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_rate"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = (spark.sql("SELECT * FROM rate_stream")
           .where(F.col("conv_id") != "__sentinel__"))
    want = rate_tier(
        pts.select("conv_id", F.unix_millis("ts").alias("ts_ms"), "v"),
        HOUR_MS)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
