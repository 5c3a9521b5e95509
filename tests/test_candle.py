"""Candlestick tier (operators/candle.py): pure-Python ground truth
per bucket, cascade exactness vs a direct coarse build (seam-free —
the family is distributive), delta-merge refresh ≡ rebuild, the
(ts, v) tie rule for open/close, and the serve math incl. exact VWAP."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.candle import (
    candle_estimates,
    candle_tier,
    cascade_candle_tier,
    refresh_candle_tier,
)
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS


def _pts(spark):
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, "/root/testdata/sf0.001")
    return t.select("conv_id", F.unix_millis("ts").alias("ts_ms"),
                    F.length("text").cast("double").alias("v"),
                    F.size(F.split("text", r"\s+")).cast("double")
                    .alias("vol"))


def _truth(rows, bucket_ms):
    by_bucket = {}
    for conv, ts, v, vol in rows:
        by_bucket.setdefault((conv, ts // bucket_ms * bucket_ms),
                             []).append((ts, v, vol))
    out = {}
    for k, pl in by_bucket.items():
        pl.sort()                       # (ts, v) tie order
        vs = [v for _, v, _ in pl]
        out[k] = (len(pl), pl[0][0], pl[0][1], pl[-1][0], pl[-1][1],
                  max(vs), min(vs), sum(vs),
                  sum(vol for _, _, vol in pl),
                  sum(v * vol for _, v, vol in pl))
    return out


def _collect(tier):
    return {(r["conv_id"], r["bucket"]):
            (r["n"], r["first_ts"], r["open"], r["last_ts"], r["close"],
             r["high"], r["low"], r["vsum"], r["vol"], r["pvsum"])
            for r in tier.collect()}


def test_candle_tier_matches_reference(spark):
    pts = _pts(spark).cache()
    rows = [tuple(r) for r in pts.collect()]
    truth = _truth(rows, HOUR_MS)
    got = _collect(candle_tier(pts, HOUR_MS, vol_col="vol"))
    assert got == truth
    pts.unpersist()


def test_cascade_exactness(spark):
    pts = _pts(spark).cache()
    fine = candle_tier(pts, HOUR_MS, vol_col="vol")
    merged = _collect(cascade_candle_tier(fine, HOUR_MS, DAY_MS))
    direct = _collect(candle_tier(pts, DAY_MS, vol_col="vol"))
    assert merged == direct
    pts.unpersist()


def test_refresh_is_delta_merge_and_equals_rebuild(spark):
    pts = _pts(spark).cache()
    tagged = pts.withColumn(
        "late", (F.xxhash64("conv_id", "ts_ms") % 5 == 0))
    on_time = tagged.where(~F.col("late")).drop("late").cache()
    late = tagged.where("late").drop("late").cache()
    assert late.count() > 0 and on_time.count() > 0
    tier = candle_tier(on_time, HOUR_MS, vol_col="vol")
    refreshed = _collect(refresh_candle_tier(tier, late, HOUR_MS,
                                             vol_col="vol"))
    rebuilt = _collect(candle_tier(pts, HOUR_MS, vol_col="vol"))
    assert refreshed == rebuilt
    for df in (pts, on_time, late):
        df.unpersist()


def test_ties_serve_and_vwap(spark):
    m = 60_000
    rows = [
        # c1: a tie at ts 0 — (0, v=5) and (0, v=3): the (ts, v) rule
        # opens at 3 (min v on the earliest ts); closes at 4
        ("c1", 0, 5.0, 2.0), ("c1", 0, 3.0, 1.0),
        ("c1", 2 * m, 9.0, 4.0), ("c1", 5 * m, 4.0, 3.0),
        ("c2", 7 * m, 6.0, 0.0),       # single point, zero volume
    ]
    pts = spark.createDataFrame(
        rows, "conv_id string, ts_ms long, v double, vol double")
    est = {r["conv_id"]: r for r in candle_estimates(
        candle_tier(pts, DAY_MS, vol_col="vol")).collect()}
    c1 = est["c1"]
    assert (c1["open"], c1["close"], c1["high"], c1["low"]) == \
        (3.0, 4.0, 9.0, 3.0)
    assert (c1["change"], c1["spread"]) == (1.0, 6.0)
    assert c1["vavg"] == 21.0 / 4
    # VWAP = (5·2 + 3·1 + 9·4 + 4·3) / (2+1+4+3) = 61/10
    assert c1["vwap"] == 61.0 / 10
    c2 = est["c2"]
    assert c2["open"] == c2["close"] == 6.0 and c2["change"] == 0.0
    assert c2["vwap"] is None          # zero volume serves NULL


def test_gap_serve(spark):
    from gorilla_tsc_spark.operators.candle import candle_gap_estimates
    H = HOUR_MS
    rows = [
        ("c1", 10, 5.0), ("c1", 20, 8.0),          # bucket 0: close 8
        ("c1", H + 5, 6.0), ("c1", H + 9, 7.0),     # bucket H: open 6
        ("c1", 3 * H, 2.0),                         # bucket 3H: open 2
    ]
    pts = spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")
    got = {r["bucket"]: r["gap"] for r in candle_gap_estimates(
        candle_tier(pts, H)).collect()}
    assert got[0] is None                 # first bar has no prior close
    assert got[H] == 6.0 - 8.0            # gap-down vs bucket-0 close
    assert got[3 * H] == 2.0 - 7.0        # prior TIER row, not prior hour


def test_without_volume_columns_absent(spark):
    pts = _pts(spark)
    tier = candle_tier(pts, HOUR_MS)
    assert "vol" not in tier.columns and "pvsum" not in tier.columns
    served = candle_estimates(cascade_candle_tier(tier, HOUR_MS, DAY_MS))
    assert "vwap" not in served.columns
    assert served.count() > 0
