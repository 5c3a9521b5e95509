"""The tier-family lifecycle is ONE contract: every DataFrame-level
family module exposes build/cascade/refresh(+estimates), and the
retention serve path (`serve_union`) is schema-agnostic — a family
cascade slots into the best-available-resolution view with zero
special-casing.  This test pins both claims so a future family can't
silently drift from the house shape."""
from __future__ import annotations

import inspect

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators import (autocorr, candle, correlate,
                                         exphist, heartbeat, histogram,
                                         rate, statetier, timeweight,
                                         trend)
from gorilla_tsc_spark.operators.retention import (RetentionPolicy,
                                                   serve_union)
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS, MINUTE_MS

FAMILIES = {
    "autocorr": (autocorr, "autocorr_tier", "cascade_autocorr_tier",
                 "refresh_autocorr_tier", "autocorr_estimates"),
    "candle": (candle, "candle_tier", "cascade_candle_tier",
               "refresh_candle_tier", "candle_estimates"),
    "corr": (correlate, "corr_tier", "cascade_corr_tier",
             "refresh_corr_tier", "corr_estimates"),
    "exphist": (exphist, "exphist_tier", "cascade_exphist_tier",
                "refresh_exphist_tier", "exphist_estimates"),
    "heartbeat": (heartbeat, "heartbeat_tier", "cascade_heartbeat_tier",
                  "refresh_heartbeat_tier", "heartbeat_estimates"),
    "hist": (histogram, "histogram_tier", "cascade_hist_tier",
             "refresh_hist_tier", "hist_estimates"),
    "rate": (rate, "rate_tier", "cascade_rate_tier",
             "refresh_rate_tier", "rate_estimates"),
    "state": (statetier, "state_tier", "cascade_state_tier",
              "refresh_state_tier", "state_estimates"),
    "twa": (timeweight, "twa_tier", "cascade_twa_tier",
            "refresh_twa_tier", "twa_estimates"),
    "trend": (trend, "trend_tier", "cascade_trend_tier",
              "refresh_trend_tier", "trend_estimates"),
}


def test_every_family_exposes_the_lifecycle():
    for name, (mod, *fns) in FAMILIES.items():
        for fn in fns:
            assert hasattr(mod, fn), (name, fn)
            assert callable(getattr(mod, fn)), (name, fn)
        # build and cascade share the (…, keys=…) series-key convention
        build = inspect.signature(getattr(mod, fns[0]))
        casc = inspect.signature(getattr(mod, fns[1]))
        assert "keys" in build.parameters, name
        assert "keys" in casc.parameters, name
        # every cascade takes (tier, from_ms, to_ms, …) so grains chain
        casc_pos = list(casc.parameters)
        assert casc_pos[1:3] == ["from_ms", "to_ms"], name


def test_serve_union_is_family_agnostic(spark):
    """A candle cascade (1m→1h→1d) slots into serve_union unchanged:
    the view serves each age band from its best surviving tier, with
    the family's own columns intact."""
    rows = [("c", int(ts), float(v))
            for ts, v in ((0, 5.0), (MINUTE_MS, 7.0),
                          (40 * DAY_MS, 9.0), (40 * DAY_MS + 1, 3.0),
                          (3649 * DAY_MS, 4.0))]
    pts = spark.createDataFrame(
        rows, "conv_id string, ts_ms long, v double")
    t1m = candle.candle_tier(pts, MINUTE_MS)
    t1h = candle.cascade_candle_tier(t1m, MINUTE_MS, HOUR_MS)
    t1d = candle.cascade_candle_tier(t1h, HOUR_MS, DAY_MS)
    now = 3650 * DAY_MS
    out = serve_union(t1m, t1h, t1d, now,
                      RetentionPolicy(keep_1m_days=1, keep_1h_days=3630,
                                      keep_1d_days=3650))
    got = {(r["tier"], r["bucket"]): (r["n"], r["open"], r["close"])
           for r in out.collect()}
    # fresh minute buckets from the 1m tier, mid-age from 1h, old from 1d
    assert got[("1m", 3649 * DAY_MS)] == (1, 4.0, 4.0)
    assert got[("1h", 40 * DAY_MS)] == (2, 9.0, 3.0)
    assert got[("1d", 0)] == (2, 5.0, 7.0)
    assert len(got) == 3
