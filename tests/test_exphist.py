"""Exponential-bucket histogram tier (operators/exphist.py): exact
power-of-two binning (no floating-point log), the two family laws, and
the quantile serve against an independent NumPy walk."""
from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.exphist import (cascade_exphist_tier,
                                                 exphist_estimates,
                                                 exphist_tier,
                                                 refresh_exphist_tier)
from gorilla_tsc_spark.operators.histogram import STAT_COLS
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS

NB = 9  # band [1, 512)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")


def _rows(df):
    return {(r["conv_id"], r["bucket"]):
            (r["n"], r["below"], r["above"], tuple(r["counts"]))
            for r in df.collect()}


def test_exp_binning_golden(spark):
    # 0 → below; 1 → bin 0; 2,3 → bin 1; 511 → bin 8; 512 → above;
    # 3.9 shares 3's bucket (floor lands in the same power-of-two bin)
    rows = [("a", 0, 0.0), ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.9),
            ("a", 4, 511.0), ("a", 5, 512.0), ("a", 6, 100000.0)]
    t = exphist_tier(_pts(spark, rows), DAY_MS, NB).collect()
    assert len(t) == 1
    r = t[0]
    assert (r["n"], r["below"], r["above"]) == (7, 1, 2)
    want = [0] * NB
    want[0], want[1], want[8] = 1, 2, 1
    assert list(r["counts"]) == want


def test_exp_cascade_and_refresh_laws(spark):
    rng = np.random.RandomState(31)
    rows = []
    for conv in ("x", "y", "z"):
        ts = np.cumsum(rng.randint(1, 2 * HOUR_MS, size=300)).astype("int64")
        # span the band and both overflows, several orders of magnitude
        vs = np.exp(rng.uniform(-1, 8, size=300))
        rows += [(conv, int(t), float(v)) for t, v in zip(ts, vs)]
    pts = _pts(spark, rows)
    fine = exphist_tier(pts, HOUR_MS, NB)
    assert _rows(cascade_exphist_tier(fine, HOUR_MS, DAY_MS, NB)) == \
        _rows(exphist_tier(pts, DAY_MS, NB))
    late_pred = F.xxhash64("conv_id", "ts_ms") % 4 == 0
    assert _rows(refresh_exphist_tier(
        exphist_tier(pts.where(~late_pred), HOUR_MS, NB),
        pts.where(late_pred), HOUR_MS, NB)) == _rows(fine)


def test_exp_quantile_serve_matches_numpy_walk(spark):
    rng = np.random.RandomState(43)
    rows = [("q", int(i), float(v)) for i, v in
            enumerate(np.exp(rng.uniform(-0.5, 9.5, size=800)))]
    tier = exphist_tier(_pts(spark, rows), DAY_MS, NB)
    est = exphist_estimates(tier, NB).collect()[0]

    def walk(q):
        n, below = est["n"], est["below"]
        rank = q * n
        if rank <= below:
            return 1.0
        cum = float(below)
        for i, c in enumerate(est["counts"]):
            if c > 0 and cum < rank <= cum + c:
                lo = float(1 << i)
                return lo + lo * (rank - cum) / c
            cum += c
        return float(2 ** NB)

    for q, name in ((0.5, "ep50"), (0.9, "ep90"), (0.99, "ep99")):
        assert math.isclose(est[name], walk(q), rel_tol=1e-12), name
        # the served quantile brackets the true one within its bucket
        vs = sorted(v for _, _, v in rows)
        true_q = vs[min(len(vs) - 1, int(q * len(vs)))]
        if 1.0 <= true_q < 2 ** NB and est["below"] < q * est["n"]:
            assert est[name] / 2 <= true_q <= est[name] * 2, name


def test_exp_overflow_clamps(spark):
    rows = [("u", i, 0.5) for i in range(10)] + \
           [("u", 100 + i, 4096.0) for i in range(10)]
    est = exphist_estimates(
        exphist_tier(_pts(spark, rows), DAY_MS, NB), NB).collect()[0]
    assert est["below"] == 10 and est["above"] == 10
    assert est["ep50"] == 1.0          # rank inside the underflow mass
    assert est["ep99"] == float(2 ** NB)  # rank past the band


def test_exp_fraction_above(spark):
    from gorilla_tsc_spark.operators.exphist import exphist_fraction_above

    # 20 points: 10 at v=2 (bin 1), 10 at v=6 (bin 2)
    rows = [("f", i, 2.0) for i in range(10)] + \
           [("f", 100 + i, 6.0) for i in range(10)]
    tier = exphist_tier(_pts(spark, rows), DAY_MS, NB)
    # power-of-two threshold: exact — everything in bins >= 2 counts
    r4 = exphist_fraction_above(tier, 4.0, NB).collect()[0]
    assert math.isclose(r4["frac_above"], 0.5)
    # mid-bucket threshold 6 straddles bin 2 [4, 8): the bin's 10
    # points contribute the (8-6)/4 = 0.5 interpolated share
    r6 = exphist_fraction_above(tier, 6.0, NB).collect()[0]
    assert math.isclose(r6["frac_above"], (10 * 0.5) / 20)
    # below-band and past-band clamps
    assert math.isclose(
        exphist_fraction_above(tier, 0.5, NB).collect()[0]["frac_above"],
        1.0)
    assert math.isclose(
        exphist_fraction_above(tier, 4096.0, NB).collect()[0]["frac_above"],
        0.0)
