"""Lag-1 autocorrelation tier (operators/autocorr.py): golden hand
cases for the adjacency walk, the two family laws (cascade ≡ direct,
refresh ≡ rebuild — also stressed per-seed in
test_tier_family_random.py), the n_pairs = n − 1 contiguity invariant,
and the served estimator against an independent NumPy computation."""
from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.autocorr import (SUMMARY_COLS,
                                                  autocorr_estimates,
                                                  autocorr_tier,
                                                  cascade_autocorr_tier,
                                                  refresh_autocorr_tier)
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS

# one series: a same-ts tie pair in the middle, integer-valued floats
GOLDEN = [("a", 1000, 3.0), ("a", 2000, 5.0), ("a", 3000, 2.0),
          ("a", 3000, 4.0), ("a", 4000, 6.0)]


def _pts(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")


def _rows(df):
    return {(r["conv_id"], r["bucket"]):
            tuple(r[c] for c in SUMMARY_COLS) for r in df.collect()}


def _np_r1(x: np.ndarray):
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    if len(x) < 2 or den == 0:
        return None
    return float(((x[:-1] - mu) * (x[1:] - mu)).sum() / den)


def test_autocorr_tier_golden_single_bucket(spark):
    t = autocorr_tier(_pts(spark, GOLDEN), 60_000).collect()
    assert len(t) == 1
    r = t[0]
    # (ts, v) order: 3, 5, 2, 4, 6 — the ts=3000 tie orders 2 before 4
    assert (r["n"], r["first_ts"], r["first_v"], r["last_ts"],
            r["last_v"]) == (5, 1000, 3.0, 4000, 6.0)
    assert r["sx"] == 20.0 and r["sxx"] == 90.0
    # adjacent products: 3·5 + 5·2 + 2·4 + 4·6 = 15 + 10 + 8 + 24
    assert r["sadj"] == 57.0 and r["n_pairs"] == 4


def test_autocorr_cascade_equals_direct_golden(spark):
    pts = _pts(spark, GOLDEN)
    fine = autocorr_tier(pts, 2000)
    got = _rows(fine)
    # bucket 2000 holds ts 2000,3000,3000: pairs 5·2 + 2·4
    assert got[("a", 2000)] == (3, 2000, 5.0, 3000, 4.0, 11.0, 45.0, 18.0, 2)
    # the 0→2000 seam pair (3·5) and 2000→4000 seam pair (4·6) are
    # adjacencies no fine bucket counted
    assert _rows(cascade_autocorr_tier(fine, 2000, 4000)) == \
        _rows(autocorr_tier(pts, 4000))


def test_autocorr_estimates_match_numpy(spark):
    rng = np.random.RandomState(11)
    rows = []
    for conv in ("s", "t", "u"):
        ts = np.cumsum(rng.randint(1, 90_000, size=300)).astype("int64")
        # integer-valued doubles, AR(1)-ish so r1 is materially nonzero
        v, lvl = [], 50.0
        for _ in range(300):
            lvl = 0.8 * lvl + rng.randint(-10, 11)
            v.append(float(int(lvl)))
        rows += [(conv, int(t), x) for t, x in zip(ts, v)]
    tier = autocorr_tier(_pts(spark, rows), HOUR_MS)
    est = autocorr_estimates(tier).collect()
    by_key = {}
    for conv, t, x in rows:
        by_key.setdefault((conv, t // HOUR_MS * HOUR_MS), []).append((t, x))
    checked = 0
    for r in est:
        pts = sorted(by_key[(r["conv_id"], r["bucket"])])
        x = np.array([p[1] for p in pts])
        want = _np_r1(x)
        if want is None:
            assert r["lag1"] is None
        else:
            assert math.isclose(r["lag1"], want, rel_tol=1e-9, abs_tol=1e-9)
            checked += 1
        assert math.isclose(r["mean"], float(x.mean()), rel_tol=1e-12)
        assert math.isclose(r["var_pop"], float(x.var()), rel_tol=1e-9,
                            abs_tol=1e-9)
    assert checked >= 10  # the corpus must actually exercise the serve


def test_autocorr_npairs_invariant_and_degenerate(spark):
    rows = GOLDEN + [("b", 500, 7.0),               # single point
                     ("c", 100, 4.0), ("c", 900, 4.0), ("c", 1700, 4.0)]
    tier = autocorr_tier(_pts(spark, rows), 2000)
    coarse = cascade_autocorr_tier(tier, 2000, DAY_MS)
    for r in coarse.collect():
        assert r["n_pairs"] == r["n"] - 1  # contiguity survives merges
    est = {r["conv_id"]: r for r in autocorr_estimates(coarse).collect()}
    assert est["b"]["lag1"] is None        # no pair
    assert est["b"]["var_pop"] == 0.0
    assert est["c"]["lag1"] is None        # constant run: zero variance
    assert est["a"]["lag1"] is not None


def test_autocorr_refresh_equals_rebuild(spark):
    rng = np.random.RandomState(23)
    rows = []
    for conv in ("x", "y"):
        ts = np.cumsum(rng.randint(1, 2 * HOUR_MS, size=240)).astype("int64")
        vs = rng.randint(0, 400, size=240).astype("float64")
        rows += [(conv, int(t), float(v)) for t, v in zip(ts, vs)]
    pts = _pts(spark, rows)
    late_pred = F.xxhash64("conv_id", "ts_ms") % 5 == 0
    on_time, late = pts.where(~late_pred), pts.where(late_pred)
    refreshed = refresh_autocorr_tier(autocorr_tier(on_time, HOUR_MS),
                                      late, on_time, HOUR_MS)
    assert _rows(refreshed) == _rows(autocorr_tier(pts, HOUR_MS))
    # and the refreshed fine tier cascades to the direct coarse build
    assert _rows(cascade_autocorr_tier(refreshed, HOUR_MS, DAY_MS)) == \
        _rows(autocorr_tier(pts, DAY_MS))
