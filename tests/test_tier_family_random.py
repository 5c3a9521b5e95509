"""Randomized adversarial-shape gate for the round-4/5 tier families
(correlate / timeweight / heartbeat / rate / histogram / state /
candle / autocorr / exphist / trend): per
seed, a
synthetic corpus with
timestamp TIES, multi-day silences, bursts, and singleton series —
shapes the transcript-derived corpus doesn't stress — must satisfy the
two family laws on every run:

  cascade law:  merge(fine 1h tier → 1d)  ≡  direct 1d build
  refresh law:  refresh(tier(on_time), late) ≡ rebuild(all points)

(the repo's "8 random corpora" house pattern, cf. test_topk_tier.py)."""
from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.autocorr import (autocorr_tier,
                                                  cascade_autocorr_tier,
                                                  refresh_autocorr_tier)
from gorilla_tsc_spark.operators.exphist import (cascade_exphist_tier,
                                                 exphist_tier,
                                                 refresh_exphist_tier)
from gorilla_tsc_spark.operators.candle import (candle_tier,
                                                cascade_candle_tier,
                                                refresh_candle_tier)
from gorilla_tsc_spark.operators.correlate import (cascade_corr_tier,
                                                   corr_tier,
                                                   refresh_corr_tier)
from gorilla_tsc_spark.operators.heartbeat import (cascade_heartbeat_tier,
                                                   heartbeat_tier,
                                                   refresh_heartbeat_tier)
from gorilla_tsc_spark.operators.histogram import (cascade_hist_tier,
                                                   histogram_tier,
                                                   refresh_hist_tier)
from gorilla_tsc_spark.operators.rate import (cascade_rate_tier,
                                              rate_tier,
                                              refresh_rate_tier)
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS
from gorilla_tsc_spark.operators.statetier import (cascade_state_tier,
                                                   refresh_state_tier,
                                                   state_tier)
from gorilla_tsc_spark.operators.timeweight import (cascade_twa_tier,
                                                    refresh_twa_tier,
                                                    twa_tier)
from gorilla_tsc_spark.operators.trend import (cascade_trend_tier,
                                               refresh_trend_tier,
                                               trend_tier)

HB = 5 * 60_000
BASE = 1_700_000_000_000


def _corpus(seed: int):
    """~8 series of 1..120 points: bursts (Δ≈seconds), silences
    (Δ up to 3 days), exact ts ties, integer-valued channels."""
    rng = np.random.RandomState(seed)
    rows = []
    for s in range(8):
        n = int(rng.randint(1, 120))
        gaps = rng.choice(
            [0, 0, 1_000, 47_000, HOUR_MS, DAY_MS, 3 * DAY_MS],
            size=n, p=[.15, .1, .3, .2, .15, .07, .03])
        ts = BASE + np.cumsum(gaps).astype(np.int64)
        x = rng.randint(0, 2_000, size=n).astype(np.float64)
        y = rng.randint(0, 500, size=n).astype(np.float64)
        rows += [(f"s{seed}_{s}", int(t), float(a), float(b))
                 for t, a, b in zip(ts, x, y)]
    return rows


def _key(df, cols):
    out = {}
    for r in df.collect():
        out[(r["conv_id"], r["bucket"])] = tuple(r[c] for c in cols)
    return out


def _assert_close(a, b, label):
    assert set(a) == set(b), label
    for k, va in a.items():
        for x, y in zip(va, b[k]):
            if isinstance(x, float):
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6), \
                    (label, k)
            else:
                assert x == y, (label, k)


def test_family_laws_on_adversarial_corpora(spark):
    for seed in (0, 1, 2, 3):
        pts = spark.createDataFrame(
            _corpus(seed),
            "conv_id string, ts_ms long, x double, y double").cache()
        late = pts.where(F.xxhash64("conv_id", "ts_ms", "x") % 4 == 0)
        on_time = pts.exceptAll(late).cache()
        beats = pts.select("conv_id", "ts_ms")

        # --- correlate: sums merge, refresh is pure sum-merge
        ccols = ("n", "sx", "sy", "sxx", "syy", "sxy")
        fine = corr_tier(pts, HOUR_MS, "x", "y")
        _assert_close(_key(cascade_corr_tier(fine, HOUR_MS, DAY_MS), ccols),
                      _key(corr_tier(pts, DAY_MS, "x", "y"), ccols),
                      f"corr cascade seed={seed}")
        _assert_close(
            _key(refresh_corr_tier(corr_tier(on_time, HOUR_MS, "x", "y"),
                                   late, HOUR_MS, "x", "y"), ccols),
            _key(fine, ccols), f"corr refresh seed={seed}")

        # --- timeweight: seam bridges, bucket rebuild on refresh
        tcols = ("n", "first_ts", "first_v", "last_ts", "last_v", "wsum")
        pv = pts.withColumnRenamed("x", "v")
        fine = twa_tier(pv, HOUR_MS)
        _assert_close(_key(cascade_twa_tier(fine, HOUR_MS, DAY_MS), tcols),
                      _key(twa_tier(pv, DAY_MS), tcols),
                      f"twa cascade seed={seed}")
        _assert_close(
            _key(refresh_twa_tier(
                twa_tier(on_time.withColumnRenamed("x", "v"), HOUR_MS),
                late.withColumnRenamed("x", "v"),
                on_time.withColumnRenamed("x", "v"), HOUR_MS), tcols),
            _key(fine, tcols), f"twa refresh seed={seed}")

        # --- rate: reset-corrected seam pairs; x as the "counter" is
        # deliberately NON-monotone chaos — the algebra never assumes
        # monotonicity, so resets fire constantly and must still merge
        rcols = ("n", "first_ts", "first_v", "last_ts", "last_v",
                 "increase", "resets")
        pv = pts.withColumnRenamed("x", "v")
        fine = rate_tier(pv, HOUR_MS)
        _assert_close(_key(cascade_rate_tier(fine, HOUR_MS, DAY_MS), rcols),
                      _key(rate_tier(pv, DAY_MS), rcols),
                      f"rate cascade seed={seed}")
        _assert_close(
            _key(refresh_rate_tier(
                rate_tier(on_time.withColumnRenamed("x", "v"), HOUR_MS),
                late.withColumnRenamed("x", "v"),
                on_time.withColumnRenamed("x", "v"), HOUR_MS), rcols),
            _key(fine, rcols), f"rate refresh seed={seed}")

        # --- histogram: element-wise vector-sum merges; band chosen so
        # the chaos corpus populates both overflow counters
        gcols = ("n", "below", "above", "counts")
        pv = pts.withColumnRenamed("x", "v")
        fine = histogram_tier(pv, HOUR_MS, 100.0, 50.0, 8)
        _assert_close(
            _key(cascade_hist_tier(fine, HOUR_MS, DAY_MS, 8), gcols),
            _key(histogram_tier(pv, DAY_MS, 100.0, 50.0, 8), gcols),
            f"hist cascade seed={seed}")
        _assert_close(
            _key(refresh_hist_tier(
                histogram_tier(on_time.withColumnRenamed("x", "v"),
                               HOUR_MS, 100.0, 50.0, 8),
                late.withColumnRenamed("x", "v"),
                HOUR_MS, 100.0, 50.0, 8), gcols),
            _key(fine, gcols), f"hist refresh seed={seed}")

        # --- state durations: seam bridge attributed to the earlier
        # bucket's last state; refresh rebuilds (a late sample can move
        # held time BETWEEN states); Σ durs = span must survive merges
        scols = ("n", "first_ts", "first_s", "last_ts", "last_s", "durs",
                 "trans")
        ps = pts.select("conv_id", "ts_ms",
                        (F.col("x").cast("long") % 3).cast("int").alias("s"))
        fine = state_tier(ps, HOUR_MS, 3)
        merged = _key(cascade_state_tier(fine, HOUR_MS, DAY_MS, 3), scols)
        _assert_close(merged, _key(state_tier(ps, DAY_MS, 3), scols),
                      f"state cascade seed={seed}")
        for (n, first_ts, _, last_ts, _, durs, _t) in merged.values():
            assert sum(durs) == last_ts - first_ts, f"state inv seed={seed}"
        ps_on = on_time.select(
            "conv_id", "ts_ms",
            (F.col("x").cast("long") % 3).cast("int").alias("s"))
        ps_late = late.select(
            "conv_id", "ts_ms",
            (F.col("x").cast("long") % 3).cast("int").alias("s"))
        _assert_close(
            _key(refresh_state_tier(state_tier(ps_on, HOUR_MS, 3),
                                    ps_late, ps_on, HOUR_MS, 3), scols),
            _key(fine, scols), f"state refresh seed={seed}")

        # --- candle: distributive OHLCV — no seams at all; refresh is
        # a pure delta-merge; ts ties pin the (ts, v) open/close rule
        kcols = ("n", "first_ts", "open", "last_ts", "close", "high",
                 "low", "vsum", "vol", "pvsum")
        pvv = pts.select("conv_id", "ts_ms", F.col("x").alias("v"),
                         F.col("y").alias("vol"))
        fine = candle_tier(pvv, HOUR_MS, vol_col="vol")
        _assert_close(
            _key(cascade_candle_tier(fine, HOUR_MS, DAY_MS), kcols),
            _key(candle_tier(pvv, DAY_MS, vol_col="vol"), kcols),
            f"candle cascade seed={seed}")
        on_v = on_time.select("conv_id", "ts_ms", F.col("x").alias("v"),
                              F.col("y").alias("vol"))
        late_v = late.select("conv_id", "ts_ms", F.col("x").alias("v"),
                             F.col("y").alias("vol"))
        _assert_close(
            _key(refresh_candle_tier(
                candle_tier(on_v, HOUR_MS, vol_col="vol"),
                late_v, HOUR_MS, vol_col="vol"), kcols),
            _key(fine, kcols), f"candle refresh seed={seed}")

        # --- exponential histogram: same distributive vector-sum laws
        # as the fixed-bin family, under the power-of-two bin rule
        pv = pts.withColumnRenamed("x", "v")
        fine = exphist_tier(pv, HOUR_MS, 9)
        _assert_close(
            _key(cascade_exphist_tier(fine, HOUR_MS, DAY_MS, 9), gcols),
            _key(exphist_tier(pv, DAY_MS, 9), gcols),
            f"exphist cascade seed={seed}")
        _assert_close(
            _key(refresh_exphist_tier(
                exphist_tier(on_time.withColumnRenamed("x", "v"),
                             HOUR_MS, 9),
                late.withColumnRenamed("x", "v"), HOUR_MS, 9), gcols),
            _key(fine, gcols), f"exphist refresh seed={seed}")

        # --- autocorr: seam products; n_pairs = n − 1 contiguity must
        # survive every merge even with ties and multi-day silences
        acols = ("n", "first_ts", "first_v", "last_ts", "last_v",
                 "sx", "sxx", "sadj", "n_pairs")
        pv = pts.withColumnRenamed("x", "v")
        fine = autocorr_tier(pv, HOUR_MS)
        merged_ac = _key(cascade_autocorr_tier(fine, HOUR_MS, DAY_MS),
                         acols)
        _assert_close(merged_ac, _key(autocorr_tier(pv, DAY_MS), acols),
                      f"autocorr cascade seed={seed}")
        for va in merged_ac.values():
            assert va[-1] == va[0] - 1, f"autocorr n_pairs inv seed={seed}"
        _assert_close(
            _key(refresh_autocorr_tier(
                autocorr_tier(on_time.withColumnRenamed("x", "v"), HOUR_MS),
                late.withColumnRenamed("x", "v"),
                on_time.withColumnRenamed("x", "v"), HOUR_MS), acols),
            _key(fine, acols), f"autocorr refresh seed={seed}")

        # --- trend: the x-origin shift algebra (bucket-relative
        # minute offsets) must make the 1h→1d merge EXACTLY equal the
        # direct 1d sums; refresh is a pure delta-merge (off = 0)
        dcols = ("n", "first_ts", "last_ts", "sx", "sv", "sxx", "svv",
                 "sxv")
        pv = pts.withColumnRenamed("x", "v")
        fine = trend_tier(pv, HOUR_MS)
        _assert_close(
            _key(cascade_trend_tier(fine, HOUR_MS, DAY_MS), dcols),
            _key(trend_tier(pv, DAY_MS), dcols),
            f"trend cascade seed={seed}")
        _assert_close(
            _key(refresh_trend_tier(
                trend_tier(on_time.withColumnRenamed("x", "v"), HOUR_MS),
                late.withColumnRenamed("x", "v"), HOUR_MS), dcols),
            _key(fine, dcols), f"trend refresh seed={seed}")

        # --- heartbeat: seam gaps, interruption un-counting on refresh
        hcols = ("n", "first_ts", "last_ts", "live_ms", "max_gap_ms",
                 "interruptions")
        fine = heartbeat_tier(beats, HOUR_MS, HB)
        _assert_close(
            _key(cascade_heartbeat_tier(fine, HOUR_MS, DAY_MS, HB), hcols),
            _key(heartbeat_tier(beats, DAY_MS, HB), hcols),
            f"hb cascade seed={seed}")
        _assert_close(
            _key(refresh_heartbeat_tier(
                heartbeat_tier(on_time.select("conv_id", "ts_ms"),
                               HOUR_MS, HB),
                late.select("conv_id", "ts_ms"),
                on_time.select("conv_id", "ts_ms"), HOUR_MS, HB), hcols),
            _key(fine, hcols), f"hb refresh seed={seed}")

        pts.unpersist()
        on_time.unpersist()
