"""Range (point-in-interval) join: exactness vs a direct
cross-join-filter ground truth, left semantics, bucket-size
independence, and the no-nested-loop plan guarantee."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.rangejoin import range_join


def _fixture(spark, seed=11, n_keys=4, n_pts=300, n_iv=40):
    rng = np.random.default_rng(seed)
    pts = [(f"k{rng.integers(0, n_keys)}", int(t))
           for t in rng.integers(0, 100_000, size=n_pts)]
    ivs = []
    for i in range(n_iv):
        s = int(rng.integers(0, 95_000))
        ln = int(rng.integers(1, 20_000))
        ivs.append((f"k{rng.integers(0, n_keys)}", s, s + ln, f"iv{i}"))
    p = spark.createDataFrame(pts, "conv_id string, ts_ms long")
    iv = spark.createDataFrame(
        ivs, "conv_id string, start_ms long, end_ms long, label string")
    return p, iv, pts, ivs


def _truth(pts, ivs):
    return {(k, t, lab) for k, t in pts
            for k2, s, e, lab in ivs if k == k2 and s <= t < e}


def test_range_join_exact_and_bucket_independent(spark):
    p, iv, pts, ivs = _fixture(spark)
    want = _truth(pts, ivs)
    for bucket_ms in (500, 5_000, 50_000):
        got = {(r["conv_id"], r["ts_ms"], r["label"])
               for r in range_join(p, iv, bucket_ms).collect()}
        assert got == want, bucket_ms


def test_range_join_left_keeps_unmatched(spark):
    p, iv, pts, ivs = _fixture(spark)
    out = range_join(p, iv, 5_000, how="left").collect()
    matched_pts = {(k, t) for k, t, _ in _truth(pts, ivs)}
    got_matched = [r for r in out if r["label"] is not None]
    got_null = [r for r in out if r["label"] is None]
    assert {(r["conv_id"], r["ts_ms"]) for r in got_null} == (
        {(k, t) for k, t in pts} - matched_pts)
    # every point appears: matched rows (possibly several intervals)
    # plus exactly one null row per unmatched point
    assert len(got_matched) == len(_truth(pts, ivs))
    # a point list may contain duplicates; null rows dedupe to the set
    assert len({(r["conv_id"], r["ts_ms"]) for r in got_null}) == len(
        {(k, t) for k, t in pts} - matched_pts)


def test_range_join_plan_no_nested_loop(spark):
    p, iv, _, _ = _fixture(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = range_join(p, iv, 5_000)._jdf.queryExecution() \
            .executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_on_sessions(spark):
    """Pairing with sessionize: every event lands in exactly one of its
    user's sessions (sessions partition the event stream)."""
    from pyspark.sql import Window
    from gorilla_tsc_spark.sources.tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    pts = ev.select(
        F.col("user_id").cast("string").alias("conv_id"), "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"))
    w = Window.partitionBy("conv_id").orderBy("ts_ms", "event_id")
    GAP = 30 * 60_000
    flagged = pts.withColumn(
        "new_s", F.when(F.col("ts_ms") - F.lag("ts_ms").over(w) > GAP, 1)
        .otherwise(0))
    sessions = (flagged
                .withColumn("sid", F.sum("new_s").over(w))
                .groupBy("conv_id", "sid")
                .agg(F.min("ts_ms").alias("start_ms"),
                     (F.max("ts_ms") + 1).alias("end_ms")))
    joined = range_join(pts, sessions, 3_600_000)
    n_pts = pts.count()
    assert joined.count() == n_pts  # exactly one session per event
    assert joined.select("conv_id", "event_id").distinct().count() == n_pts


def test_range_join_inverted_interval_guard(spark):
    """A corrupt interval (end <= start) must be dropped BEFORE the
    explode — no row amplification, no descending-sequence crash — and
    negative timestamps bucket by floor, not trunc."""
    p = spark.createDataFrame(
        [("k0", 100), ("k0", -4_999)], "conv_id string, ts_ms long")
    iv = spark.createDataFrame(
        [("k0", 1_000_000_000, 0, "corrupt"),     # inverted: dropped
         ("k0", 50, 200, "good"),
         ("k0", -5_000, -1, "negative")],
        "conv_id string, start_ms long, end_ms long, label string")
    got = {(r["ts_ms"], r["label"])
           for r in range_join(p, iv, 5_000).collect()}
    assert got == {(100, "good"), (-4_999, "negative")}
