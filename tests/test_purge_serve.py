"""Targeted purge (operators/purge.py), pruned range reads
(retention.read_range), and the HLL distinct sketch tier
(operators/sketches.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.encode import decode_blocks, encode_blocks
from gorilla_tsc_spark.operators.purge import (
    purge_conversations,
    purge_range,
)
from gorilla_tsc_spark.operators.retention import read_range
from gorilla_tsc_spark.operators.rollup import (
    DAY_MS,
    rollup_from_day_subaggs,
    rollup_points,
)
from gorilla_tsc_spark.operators.sketches import (
    distinct_sketch_tier,
    estimate,
    merge_quantile_tier,
    merge_sketch_tier,
    quantile_estimates,
    quantile_sketch_tier,
    theta_overlap,
    theta_sketch_tier,
)


def _blocks(spark):
    from gorilla_tsc_spark.queries import _transcripts
    return encode_blocks(_transcripts(spark, "/root/testdata/sf0.001"))


def _point_set(blocks):
    return {tuple(r) for r in decode_blocks(blocks)
            .select("conv_id", "channel", "ts_ms", "v_double", "v_long")
            .collect()}


def _some_convs(blocks, n=3):
    return [r[0] for r in
            blocks.select("conv_id").distinct().orderBy("conv_id")
            .limit(n).collect()]


def test_purge_conversations_blocks_and_tier(spark):
    blocks = _blocks(spark).cache()
    victims = _some_convs(blocks)
    survived = purge_conversations(blocks, victims).cache()
    # metadata-only delete: surviving blocks are byte-identical rows
    assert survived.where(F.col("conv_id").isin(victims)).count() == 0
    assert (survived.count()
            == blocks.where(~F.col("conv_id").isin(victims)).count())
    before = blocks.agg(F.sum(F.crc32(F.col("payload")))).first()[0]
    after = (survived.agg(F.sum(F.crc32(F.col("payload")))).first()[0]
             + blocks.where(F.col("conv_id").isin(victims))
             .agg(F.sum(F.crc32(F.col("payload")))).first()[0])
    assert before == after
    # the same operator purges a rollup tier (any conv_id-keyed table)
    tier = rollup_from_day_subaggs(blocks)
    tier_purged = purge_conversations(tier, victims)
    assert tier_purged.where(F.col("conv_id").isin(victims)).count() == 0
    blocks.unpersist()
    survived.unpersist()


def test_purge_range_copy_on_write(spark):
    blocks = _blocks(spark).cache()
    victims = _some_convs(blocks)
    lo, hi = (blocks.agg(F.min("first_ts"), F.max("last_ts")).first())
    t0 = (lo // DAY_MS + 1) * DAY_MS       # purge the second day onward
    t1 = t0 + 2 * DAY_MS
    assert t1 < hi, "fixture spans too few days for a mid-range purge"

    out = purge_range(blocks, victims, t0, t1).cache()

    # expected point set: everything except victims' points in [t0, t1)
    pts = decode_blocks(blocks).cache()
    expect = {tuple(r) for r in pts.where(
        ~(F.col("conv_id").isin(victims)
          & (F.col("ts_ms") >= t0) & (F.col("ts_ms") < t1)))
        .select("conv_id", "channel", "ts_ms", "v_double", "v_long")
        .collect()}
    assert _point_set(out) == expect

    # non-matched conversations pass through byte-identical
    untouched_crc = (blocks.where(~F.col("conv_id").isin(victims))
                     .agg(F.sum(F.crc32("payload"))).first()[0])
    out_untouched_crc = (out.where(~F.col("conv_id").isin(victims))
                         .agg(F.sum(F.crc32("payload"))).first()[0])
    assert untouched_crc == out_untouched_crc

    # rewritten blocks still carry metadata the day tier can use with
    # zero decode: tier-from-metadata == tier recomputed from points
    # (integer-valued channels only — float sums of the 2^63-magnitude
    # text_hash channel are order-dependent, same carve-out as
    # tests/test_compact.py)
    from gorilla_tsc_spark.functions.channels import agg_channel_names
    from gorilla_tsc_spark.operators.encode import block_value_column
    keep = agg_channel_names()
    got_tier = {tuple(r) for r in rollup_from_day_subaggs(out)
                .where(F.col("channel").isin(keep))
                .select("conv_id", "channel", "bucket", "cnt",
                        "vmin", "vmax", "vsum").collect()}
    want_tier = {tuple(r) for r in rollup_points(
        decode_blocks(out).withColumn("v", block_value_column()),
        DAY_MS, "v", keys=("conv_id", "channel"))
        .where(F.col("channel").isin(keep))
        .select("conv_id", "channel", "bucket", "cnt",
                "vmin", "vmax", "vsum").collect()}
    assert got_tier == want_tier
    blocks.unpersist()
    pts.unpersist()
    out.unpersist()


def test_purge_range_no_overlap_passthrough(spark):
    """A matched conversation whose blocks never intersect the window
    must pass through byte-identical — no rewrite, no re-layout."""
    blocks = _blocks(spark).cache()
    victims = _some_convs(blocks)
    hi = blocks.agg(F.max("last_ts")).first()[0]
    out = purge_range(blocks, victims, hi + DAY_MS, hi + 2 * DAY_MS)
    got = {tuple(r) for r in out.select(
        "conv_id", "channel", "block_start", "seq",
        F.crc32("payload").alias("pc")).collect()}
    want = {tuple(r) for r in blocks.select(
        "conv_id", "channel", "block_start", "seq",
        F.crc32("payload").alias("pc")).collect()}
    assert got == want
    blocks.unpersist()


def test_purge_range_full_conversation_disappears(spark):
    blocks = _blocks(spark).cache()
    victims = _some_convs(blocks, n=1)
    lo, hi = (blocks.where(F.col("conv_id") == victims[0])
              .agg(F.min("first_ts"), F.max("last_ts")).first())
    out = purge_range(blocks, victims, lo, hi + 1)
    assert out.where(F.col("conv_id") == victims[0]).count() == 0
    assert (out.count()
            == blocks.where(F.col("conv_id") != victims[0]).count())
    blocks.unpersist()


def test_read_range_prunes_blocks_and_trims_points(spark):
    blocks = _blocks(spark).cache()
    lo, hi = blocks.agg(F.min("first_ts"), F.max("last_ts")).first()
    t0 = (lo // DAY_MS + 1) * DAY_MS
    t1 = t0 + DAY_MS
    got = {tuple(r) for r in read_range(blocks, t0, t1)
           .select("conv_id", "channel", "ts_ms", "v_double", "v_long")
           .collect()}
    want = {tuple(r) for r in decode_blocks(blocks)
            .where((F.col("ts_ms") >= t0) & (F.col("ts_ms") < t1))
            .select("conv_id", "channel", "ts_ms", "v_double", "v_long")
            .collect()}
    assert got == want and got
    # the metadata prune must actually skip blocks (day-aligned blocks
    # outside the window never reach the decode kernel)
    pruned = blocks.where((F.col("last_ts") >= t0)
                          & (F.col("first_ts") < t1)).count()
    assert pruned < blocks.count() / 2, (pruned, blocks.count())
    # conv_id narrowing composes
    one = _some_convs(blocks, n=1)
    ids = spark.createDataFrame([(one[0],)], ["conv_id"])
    got_one = {tuple(r) for r in read_range(blocks, t0, t1, conv_ids=ids)
               .select("conv_id", "channel", "ts_ms", "v_double", "v_long")
               .collect()}
    assert got_one == {r for r in want if r[0] == one[0]}
    blocks.unpersist()


def test_distinct_sketch_tier_bounds_and_merge(spark):
    from gorilla_tsc_spark.queries import _transcripts
    t = (_transcripts(spark, "/root/testdata/sf0.001")
         .withColumn("ts_ms", F.unix_millis("ts")).cache())

    tier_1d = distinct_sketch_tier(t, DAY_MS).cache()
    exact = {r["bucket"]: r["n"] for r in t.groupBy(
        (F.floor(F.col("ts_ms") / DAY_MS) * DAY_MS).alias("bucket"))
        .agg(F.count_distinct("conv_id").alias("n")).collect()}
    got = {r["bucket"]: r["approx_distinct"]
           for r in estimate(tier_1d).collect()}
    assert got.keys() == exact.keys()
    for b, n in exact.items():
        assert abs(got[b] - n) <= max(0.05 * n, 2.0), (b, n, got[b])

    # merge cascade: 1d sketches → 30d buckets without touching raw keys
    tier_30d = merge_sketch_tier(tier_1d, DAY_MS, 30 * DAY_MS)
    exact_30 = {r["bucket"]: r["n"] for r in t.groupBy(
        (F.floor(F.col("ts_ms") / (30 * DAY_MS)) * 30 * DAY_MS)
        .alias("bucket"))
        .agg(F.count_distinct("conv_id").alias("n")).collect()}
    got_30 = {r["bucket"]: r["approx_distinct"]
              for r in estimate(tier_30d).collect()}
    assert got_30.keys() == exact_30.keys()
    for b, n in exact_30.items():
        assert abs(got_30[b] - n) <= max(0.05 * n, 2.0), (b, n, got_30[b])
    t.unpersist()
    tier_1d.unpersist()


def test_quantile_sketch_tier_rank_error(spark):
    """KLL quantile tier: merged-month p50/p90/p99 must sit within
    ±2.5 % RANK of the exact order statistics (k=200 gives ~1.7 %)."""
    from gorilla_tsc_spark.queries import _transcripts
    t = (_transcripts(spark, "/root/testdata/sf0.001")
         .select("conv_id", F.unix_millis("ts").alias("ts_ms"),
                 F.length("text").cast("double").alias("v")).cache())

    tier = quantile_sketch_tier(t, DAY_MS)
    month = quantile_estimates(
        merge_quantile_tier(tier, DAY_MS, 30 * DAY_MS))
    rows = {r["bucket"]: r for r in month.collect()}
    for b, r in rows.items():
        vals = sorted(x["v"] for x in t.where(
            (F.floor(F.col("ts_ms") / (30 * DAY_MS)) * 30 * DAY_MS) == b)
            .select("v").collect())
        n = len(vals)
        assert int(r["n"]) == n
        for q in (0.5, 0.9, 0.99):
            got = r[f"p{int(q * 100)}"]
            lo = vals[max(0, int((q - 0.025) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.025) * n))]
            assert lo <= got <= hi, (b, q, got, lo, hi)
    t.unpersist()


def test_theta_tier_set_algebra(spark):
    """Theta tier: retained/churned/new between two consecutive days
    must track the exact set sizes within 5 %."""
    from gorilla_tsc_spark.queries import _transcripts
    t = (_transcripts(spark, "/root/testdata/sf0.001")
         .select("conv_id", F.unix_millis("ts").alias("ts_ms")).cache())

    tier = theta_sketch_tier(t, DAY_MS).cache()
    days = sorted(r["bucket"] for r in tier.select("bucket").collect())
    # pick the densest adjacent pair so the exact sets are non-trivial
    d1, d2 = days[len(days) // 2], days[len(days) // 2 + 1]
    got = theta_overlap(tier, d1, d2).first()

    def day_set(d):
        return {r[0] for r in t.where(
            (F.floor(F.col("ts_ms") / DAY_MS) * DAY_MS) == d)
            .select("conv_id").distinct().collect()}

    s1, s2 = day_set(d1), day_set(d2)
    for name, exact in (("retained", len(s1 & s2)),
                        ("churned", len(s1 - s2)),
                        ("new", len(s2 - s1))):
        assert abs(got[name] - exact) <= max(0.05 * exact, 2.0), (
            name, got[name], exact)
    tier.unpersist()
    t.unpersist()


def test_patch_tier_after_range_purge(spark):
    """After a range purge the patched 1m tier must equal a full tier
    rebuild from the purged store — and only matched conversations'
    rows may differ from the original tier."""
    from gorilla_tsc_spark.functions.channels import agg_channel_names
    from gorilla_tsc_spark.operators.encode import block_value_column
    from gorilla_tsc_spark.operators.purge import (
        patch_tier_after_range_purge,
        purge_range,
    )
    from gorilla_tsc_spark.operators.rollup import MINUTE_MS, rollup_points

    blocks = _blocks(spark).cache()
    victims = _some_convs(blocks)
    lo, hi = blocks.agg(F.min("first_ts"), F.max("last_ts")).first()
    t0 = (lo // DAY_MS + 1) * DAY_MS
    t1 = t0 + 2 * DAY_MS
    assert t1 < hi

    def tier_of(b):
        pts = decode_blocks(b).where(
            F.col("channel").isin(agg_channel_names()))
        return rollup_points(pts, MINUTE_MS, block_value_column())

    before = tier_of(blocks).cache()
    purged = purge_range(blocks, victims, t0, t1).cache()
    patched = patch_tier_after_range_purge(
        before, purged, victims, MINUTE_MS).cache()
    want = tier_of(purged)

    assert patched.exceptAll(want).count() == 0
    assert want.exceptAll(patched).count() == 0
    # untouched conversations' tier rows are literally the old rows
    diff = patched.exceptAll(before)
    assert diff.where(~F.col("conv_id").isin(victims)).count() == 0
    # and the purged window is really gone from the tier
    assert patched.where(
        F.col("conv_id").isin(victims)
        & (F.col("bucket") >= t0) & (F.col("bucket") < t1)).count() == 0
    for df in (blocks, before, purged, patched):
        df.unpersist()


def test_sketch_tier_refresh(spark):
    """Late-data refresh of HLL and KLL tiers equals a full rebuild:
    HLL sketches exactly (set-union identity), KLL estimates within
    the sketch's own rank error."""
    from gorilla_tsc_spark.operators.sketches import (
        distinct_sketch_tier,
        estimate,
        quantile_estimates,
        quantile_sketch_tier,
        refresh_distinct_tier,
        refresh_quantile_tier,
    )
    from gorilla_tsc_spark.queries import _transcripts

    t = (_transcripts(spark, "/root/testdata/sf0.001")
         .select("conv_id", F.unix_millis("ts").alias("ts_ms"),
                 F.length("text").cast("double").alias("v")).cache())
    late = t.where(F.abs(F.hash("conv_id", "ts_ms")) % 4 == 0)
    base = t.where(F.abs(F.hash("conv_id", "ts_ms")) % 4 != 0)

    # HLL: estimates must be IDENTICAL to a full rebuild (union identity)
    refreshed = estimate(refresh_distinct_tier(
        distinct_sketch_tier(base, DAY_MS), late, DAY_MS))
    full = estimate(distinct_sketch_tier(t, DAY_MS))
    got = {r["bucket"]: r["approx_distinct"] for r in refreshed.collect()}
    want = {r["bucket"]: r["approx_distinct"] for r in full.collect()}
    assert got == want

    # KLL: refreshed month percentiles track exact order stats within
    # the same +-2.5% rank tolerance as the merge gate
    refq = quantile_estimates(refresh_quantile_tier(
        quantile_sketch_tier(base, DAY_MS), late, DAY_MS))
    rows = {r["bucket"]: r for r in refq.collect()}
    for b, r in rows.items():
        vals = sorted(x["v"] for x in t.where(
            (F.floor(F.col("ts_ms") / DAY_MS) * DAY_MS) == b)
            .select("v").collect())
        n = len(vals)
        assert int(r["n"]) == n
        for q in (0.5, 0.9, 0.99):
            lo = vals[max(0, int((q - 0.025) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.025) * n))]
            assert lo <= r[f"p{int(q * 100)}"] <= hi, (b, q)
    t.unpersist()


def test_theta_tier_merge_and_refresh(spark):
    """Theta tier cascade (1d -> 30d union) and same-grain late-data
    refresh: distinct estimates within 5 % of exact, and cohort algebra
    still works on the refreshed tier."""
    from gorilla_tsc_spark.operators.sketches import (
        merge_theta_tier,
        refresh_theta_tier,
        theta_sketch_tier,
    )
    from gorilla_tsc_spark.queries import _transcripts

    t = (_transcripts(spark, "/root/testdata/sf0.001")
         .select("conv_id", F.unix_millis("ts").alias("ts_ms")).cache())
    late = t.where(F.abs(F.hash("conv_id", "ts_ms")) % 4 == 0)
    base = t.where(F.abs(F.hash("conv_id", "ts_ms")) % 4 != 0)

    refreshed = refresh_theta_tier(
        theta_sketch_tier(base, DAY_MS), late, DAY_MS)
    month = merge_theta_tier(refreshed, DAY_MS, 30 * DAY_MS)
    got = {r["bucket"]: r["n"] for r in month.select(
        "bucket", F.theta_sketch_estimate("tsketch").alias("n")).collect()}
    exact = {r["bucket"]: r["n"] for r in t.groupBy(
        (F.floor(F.col("ts_ms") / (30 * DAY_MS)) * 30 * DAY_MS)
        .alias("bucket"))
        .agg(F.count_distinct("conv_id").alias("n")).collect()}
    assert got.keys() == exact.keys()
    for b, n in exact.items():
        assert abs(got[b] - n) <= max(0.05 * n, 2.0), (b, got[b], n)
    t.unpersist()


def test_theta_overlap_rejects_missing_bucket(spark):
    import pytest
    from gorilla_tsc_spark.operators.sketches import (
        theta_overlap,
        theta_sketch_tier,
    )
    from gorilla_tsc_spark.queries import _transcripts
    t = (_transcripts(spark, "/root/testdata/sf0.001")
         .select("conv_id", F.unix_millis("ts").alias("ts_ms")))
    tier = theta_sketch_tier(t, DAY_MS)
    with pytest.raises(ValueError, match="0 tier rows"):
        theta_overlap(tier, 123, 456)  # bucket not in the tier


def test_quantile_label_safety(spark):
    import pytest
    from gorilla_tsc_spark.operators.sketches import (
        quantile_estimates,
        quantile_sketch_tier,
    )
    from gorilla_tsc_spark.queries import _transcripts
    t = (_transcripts(spark, "/root/testdata/sf0.001")
         .select(F.unix_millis("ts").alias("ts_ms"),
                 F.length("text").cast("double").alias("v")))
    tier = quantile_sketch_tier(t, DAY_MS)
    out = quantile_estimates(tier, qs=(0.29, 0.999))
    assert "p29" in out.columns and "p99_9" in out.columns
    with pytest.raises(ValueError, match="duplicate quantile label"):
        quantile_estimates(tier, qs=(0.5, 0.5))


def test_read_value_range_zone_map_prunes_and_matches(spark):
    from gorilla_tsc_spark.operators.retention import read_value_range
    blocks = _blocks(spark).cache()
    # threshold at the 90th percentile of per-block maxima on the len
    # channel: only ~10 % of its blocks have an envelope that crosses
    # it, so the zone-map prune must skip the rest before the decode
    # kernel runs
    lens = blocks.where(F.col("channel") == "len")
    v_lo = lens.agg(F.expr("percentile(agg_max, 0.9)")).first()[0]
    cols = ("conv_id", "channel", "ts_ms", "v_double", "v_long")
    got = {tuple(r) for r in
           read_value_range(blocks, v_lo, channel="len")
           .select(*cols).collect()}
    want = {tuple(r) for r in decode_blocks(lens)
            .where(F.col("v_double") >= v_lo).select(*cols).collect()}
    assert got == want and got
    candidates = lens.where(F.col("agg_max") >= v_lo).count()
    assert candidates <= lens.count() * 0.2, (candidates, lens.count())
    # two-sided band + time window composes
    lo, hi = blocks.agg(F.min("first_ts"), F.max("last_ts")).first()
    t0 = (lo // DAY_MS + 1) * DAY_MS
    t1 = t0 + 2 * DAY_MS
    v_hi = v_lo * 1.5
    got2 = {tuple(r) for r in
            read_value_range(blocks, v_lo, v_hi, t0_ms=t0, t1_ms=t1)
            .select(*cols).collect()}
    want2 = {r for r in want
             if t0 <= r[2] < t1 and v_lo <= r[3] <= v_hi}
    assert got2 == want2
    blocks.unpersist()
