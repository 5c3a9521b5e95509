"""Histogram tier (operators/histogram.py): NumPy ground truth for
bin/overflow counts, histogram_quantile serve semantics (within one
bin width of the exact quantile inside the band, edge clamps outside
it), exact cascade vs a direct coarse build, refresh ≡ rebuild
(distributive delta-merge), null handling, fp bin-edge clamp."""
from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.histogram import (
    hist_fraction_above,
    merge_hist_series,
    cascade_hist_tier,
    hist_estimates,
    histogram_tier,
    refresh_hist_tier,
)
from gorilla_tsc_spark.operators.rollup import DAY_MS, HOUR_MS

LO, W, NBINS = 32.0, 8.0, 8   # HI=96: sf0.001 lengths populate both overflows
HI = LO + W * NBINS


def _pts(spark):
    from gorilla_tsc_spark.queries import _len_points
    return _len_points(spark, "/root/testdata/sf0.001")


def _truth(rows, bucket_ms):
    """Pure-Python histogram per (conv, bucket)."""
    out = {}
    for conv, ts, v in rows:
        if v is None:
            continue
        k = (conv, ts // bucket_ms * bucket_ms)
        n, below, above, counts = out.setdefault(
            k, [0, 0, 0, [0] * NBINS])
        out[k][0] += 1
        if v < LO:
            out[k][1] += 1
        elif v >= HI:
            out[k][2] += 1
        else:
            counts[min(int((v - LO) // W), NBINS - 1)] += 1
    return {k: (v[0], v[1], v[2], tuple(v[3])) for k, v in out.items()}


def _collect(tier):
    return {(r["conv_id"], r["bucket"]):
            (r["n"], r["below"], r["above"], tuple(r["counts"]))
            for r in tier.collect()}


def _quantile_truth(n, below, above, counts, q):
    """Reference cumulative walk (module convention)."""
    rank = q * n
    if rank <= below:
        return LO
    cum = float(below)
    for i, c in enumerate(counts):
        if c > 0 and cum + c >= rank and cum < rank:
            return LO + i * W + W * (rank - cum) / c
        cum += c
    return HI


def test_histogram_tier_matches_reference(spark):
    pts = _pts(spark).cache()
    rows = [tuple(r) for r in pts.collect()]
    truth = _truth(rows, HOUR_MS)
    got = _collect(histogram_tier(pts, HOUR_MS, LO, W, NBINS))
    assert got == truth
    # the fixture must exercise both overflow paths
    assert any(v[1] > 0 for v in truth.values())
    assert any(v[2] > 0 for v in truth.values())
    pts.unpersist()


def test_cascade_equals_direct_build(spark):
    pts = _pts(spark).cache()
    fine = histogram_tier(pts, HOUR_MS, LO, W, NBINS)
    cascaded = _collect(cascade_hist_tier(fine, HOUR_MS, DAY_MS, NBINS))
    direct = _collect(histogram_tier(pts, DAY_MS, LO, W, NBINS))
    assert cascaded == direct
    pts.unpersist()


def test_refresh_equals_rebuild(spark):
    pts = _pts(spark).cache()
    late_pred = F.xxhash64("conv_id", "ts_ms") % 4 == 0
    on_time, late = pts.where(~late_pred), pts.where(late_pred)
    refreshed = _collect(refresh_hist_tier(
        histogram_tier(on_time, HOUR_MS, LO, W, NBINS),
        late, HOUR_MS, LO, W, NBINS))
    rebuilt = _collect(histogram_tier(pts, HOUR_MS, LO, W, NBINS))
    assert refreshed == rebuilt
    pts.unpersist()


def test_quantile_serve_matches_walk_and_bounds_exact(spark):
    pts = _pts(spark).cache()
    tier = hist_estimates(histogram_tier(pts, DAY_MS, LO, W, NBINS),
                          LO, W, NBINS)
    rows = [tuple(r) for r in pts.collect()]
    by_key = {}
    for conv, ts, v in rows:
        if v is not None:
            by_key.setdefault((conv, ts // DAY_MS * DAY_MS),
                              []).append(float(v))
    truth = _truth(rows, DAY_MS)
    for r in tier.collect():
        k = (r["conv_id"], r["bucket"])
        n, below, above, counts = truth[k]
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            want = _quantile_truth(n, below, above, counts, q)
            assert abs(r[name] - want) < 1e-9, (k, name)
            # the served value shares a bin with the order statistic
            # at rank ceil(q*n), so it is within one bin width of it
            # whenever that order statistic lands inside the band
            rank = q * n
            j = min(int(np.ceil(rank)), n)
            if below < j <= n - above:
                stat = sorted(by_key[k])[j - 1]
                assert abs(r[name] - stat) <= W + 1e-9, (k, name)
    pts.unpersist()


def test_edge_clamps_and_nulls(spark):
    rows = ([Row(conv_id="c", ts_ms=1_000 + i, v=1.0) for i in range(5)]
            + [Row(conv_id="c", ts_ms=2_000 + i, v=10_000.0)
               for i in range(3)]
            + [Row(conv_id="c", ts_ms=3_000, v=None)])
    df = spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")
    got = hist_estimates(histogram_tier(df, HOUR_MS, LO, W, NBINS),
                         LO, W, NBINS).first()
    assert (got["n"], got["below"], got["above"]) == (8, 5, 3)
    assert got["counts"] == [0] * NBINS
    assert got["p50"] == LO          # rank 4 <= below
    assert got["p90"] == HI          # rank 7.2 past the band
    # a value epsilon under the band edge stays in the last bin
    edge = spark.createDataFrame(
        [Row(conv_id="e", ts_ms=0, v=float(np.nextafter(HI, 0)))],
        "conv_id string, ts_ms long, v double")
    ge = _collect(histogram_tier(edge, HOUR_MS, LO, W, NBINS))
    (_, _, _, counts), = ge.values()
    assert counts[NBINS - 1] == 1


def test_randomized_merge_law(spark):
    rng = np.random.default_rng(7)
    rows = [Row(conv_id=f"c{int(c)}", ts_ms=int(ts), v=float(v))
            for c, ts, v in zip(rng.integers(0, 6, 4000),
                                rng.integers(0, 3 * DAY_MS, 4000),
                                rng.normal(80, 120, 4000))]
    df = spark.createDataFrame(rows, "conv_id string, ts_ms long, v double")
    df = df.cache()
    fine = histogram_tier(df, HOUR_MS, LO, W, NBINS)
    assert (_collect(cascade_hist_tier(fine, HOUR_MS, DAY_MS, NBINS))
            == _collect(histogram_tier(df, DAY_MS, LO, W, NBINS)))
    split = F.xxhash64("conv_id", "ts_ms") % 3 == 0
    assert (_collect(refresh_hist_tier(
        histogram_tier(df.where(~split), HOUR_MS, LO, W, NBINS),
        df.where(split), HOUR_MS, LO, W, NBINS))
        == _collect(histogram_tier(df, HOUR_MS, LO, W, NBINS)))
    df.unpersist()


def test_merge_series_and_fraction_above(spark):
    pts = _pts(spark).cache()
    per_series = histogram_tier(pts, DAY_MS, LO, W, NBINS)
    # fleet-wide merge == building with no series key at all
    merged = merge_hist_series(per_series, NBINS)
    direct = histogram_tier(pts.withColumn("conv_id", F.lit("all")),
                            DAY_MS, LO, W, NBINS).drop("conv_id")
    a = {r["bucket"]: (r["n"], r["below"], r["above"], tuple(r["counts"]))
         for r in merged.collect()}
    b = {r["bucket"]: (r["n"], r["below"], r["above"], tuple(r["counts"]))
         for r in direct.collect()}
    assert a == b

    rows = [tuple(r) for r in pts.collect()]
    vals = {}
    for conv, ts, v in rows:
        if v is not None:
            vals.setdefault((conv, ts // DAY_MS * DAY_MS),
                            []).append(float(v))
    # bin-edge threshold: exact; mid-bin: within the straddled bin's
    # share of mass; out-of-band thresholds use the documented clamps
    for t in (LO, LO + 3 * W, HI, LO + 2.5 * W, LO - 10, HI + 10):
        served = {(r["conv_id"], r["bucket"]): r["frac_above"]
                  for r in hist_fraction_above(per_series, t,
                                               LO, W, NBINS).collect()}
        for k, vs in vals.items():
            exact = sum(1 for v in vs if v >= t) / len(vs)
            if t <= LO:
                want = sum(1 for v in vs if v >= LO) / len(vs)
                assert abs(served[k] - want) < 1e-9, (k, t)
            elif t >= HI:
                want = sum(1 for v in vs if v >= HI) / len(vs)
                assert abs(served[k] - want) < 1e-9, (k, t)
            elif (t - LO) % W == 0:
                assert abs(served[k] - exact) < 1e-9, (k, t)
            else:
                bin_lo = LO + ((t - LO) // W) * W
                straddle = sum(1 for v in vs
                               if bin_lo <= v < bin_lo + W) / len(vs)
                assert served[k] <= exact + straddle + 1e-9, (k, t)
                assert served[k] >= exact - straddle - 1e-9, (k, t)
    pts.unpersist()
