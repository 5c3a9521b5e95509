"""Backfill ingest: late/out-of-order turns merged into a sealed block
store (operators/backfill.py) — point-set identity, byte-identity of
untouched conversations, last-write-wins conflict policy, metadata-tier
consistency, and the empty-batch no-op."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.backfill import ingest_backfill
from gorilla_tsc_spark.operators.encode import decode_blocks, encode_blocks
from gorilla_tsc_spark.operators.rollup import (
    DAY_MS,
    rollup_from_day_subaggs,
    rollup_points,
)

SF = "/root/testdata/sf0.001"


def _split(spark):
    """Deterministic on-time / late split of the fixture transcripts:
    every 5th turn (by turn_idx) arrives late."""
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, SF)
    late = t.where(F.col("turn_idx") % 5 == 2)
    ontime = t.where(F.col("turn_idx") % 5 != 2)
    return t, ontime, late


def _point_set(blocks):
    return {tuple(r) for r in decode_blocks(blocks)
            .select("conv_id", "channel", "ts_ms", "v_double", "v_long")
            .collect()}


def test_backfill_merges_to_full_point_set(spark):
    t, ontime, late = _split(spark)
    store = encode_blocks(ontime)
    merged = ingest_backfill(store, late)
    assert _point_set(merged) == _point_set(encode_blocks(t))


def test_backfill_untouched_conversations_byte_identical(spark):
    t, ontime, late = _split(spark)
    # restrict the late batch to ONE conversation: every other
    # conversation's blocks must come back bit-for-bit
    one = late.select("conv_id").distinct().orderBy("conv_id").limit(1)
    late1 = late.join(one, "conv_id", "left_semi")
    store = encode_blocks(ontime).cache()
    merged = ingest_backfill(store, late1).cache()
    victim = late1.select("conv_id").first()[0]

    def crcs(df):
        return sorted(
            tuple(r) for r in df.where(F.col("conv_id") != victim)
            .select("conv_id", "channel", "block_start", "seq", "crc")
            .collect())

    assert crcs(merged) == crcs(store)
    # and the victim's points are the union of its on-time + late turns
    got = {tuple(r) for r in decode_blocks(
        merged.where(F.col("conv_id") == victim))
        .select("channel", "ts_ms", "v_double").collect()}
    want = {tuple(r) for r in decode_blocks(
        encode_blocks(t.where(F.col("conv_id") == victim)))
        .select("channel", "ts_ms", "v_double").collect()}
    assert got == want


def test_backfill_last_write_wins(spark):
    """A late point at an existing timestamp replaces the on-time value
    under on_conflict='last', and both survive under the default."""
    base = 1_700_000_000_000
    mk = spark.createDataFrame
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    ontime = mk([("c1", i, "user", "x" * (i + 1), "",)
                 + (None,) for i in range(20)], schema).withColumn(
        "ts", F.timestamp_millis(F.lit(base) + F.col("turn_idx") * 1000))
    # late rows revise turns 5 and 7: same conv, same ts, longer text
    late = mk([("c1", 105, "user", "y" * 50, "", None),
               ("c1", 107, "user", "y" * 60, "", None)], schema)
    late = late.withColumn(
        "ts", F.timestamp_millis(
            F.lit(base) + (F.col("turn_idx") - 100) * 1000))
    store = encode_blocks(ontime)

    both = decode_blocks(ingest_backfill(store, late))
    both_rows = (both.where(F.col("channel") == "len")
                 .groupBy("ts_ms").agg(F.count("*").alias("n"),
                                       F.max("v_double").alias("vmax"))
                 .collect())
    by_ts = {r.ts_ms: (r.n, r.vmax) for r in both_rows}
    assert by_ts[base + 5000][0] == 2  # keep_both: collision kept twice
    assert by_ts[base + 7000][0] == 2

    lww = decode_blocks(ingest_backfill(store, late, on_conflict="last"))
    lww_rows = (lww.where(F.col("channel") == "len")
                .groupBy("ts_ms").agg(F.count("*").alias("n"),
                                      F.max("v_double").alias("vmax"))
                .collect())
    by_ts = {r.ts_ms: (r.n, r.vmax) for r in lww_rows}
    assert by_ts[base + 5000] == (1, 50.0)  # late value won
    assert by_ts[base + 7000] == (1, 60.0)
    # untouched timestamps: exactly one point, original value
    assert by_ts[base + 3000] == (1, 4.0)
    assert sum(n for n, _ in by_ts.values()) == 20


def test_backfill_day_tier_from_metadata_matches_recompute(spark):
    """After a backfill the day tier must still roll up from block
    METADATA (compaction recomputes day sub-aggregates for rewritten
    series; untouched blocks keep theirs)."""
    t, ontime, late = _split(spark)
    merged = ingest_backfill(encode_blocks(ontime), late).cache()
    meta = rollup_from_day_subaggs(merged)
    pts = decode_blocks(merged).withColumnRenamed("v_double", "v")
    direct = rollup_points(pts.where(F.col("channel") == "len"),
                           DAY_MS, "v", keys=["conv_id", "channel"])
    m = {(r.conv_id, r.channel, r.bucket): (r.cnt, r.vmin, r.vmax, r.vsum)
         for r in meta.where(F.col("channel") == "len").collect()}
    d = {(r.conv_id, r.channel, r.bucket): (r.cnt, r.vmin, r.vmax, r.vsum)
         for r in direct.collect()}
    assert m == d


def test_backfill_empty_late_batch_is_identity(spark):
    _, ontime, late = _split(spark)
    store = encode_blocks(ontime).cache()
    merged = ingest_backfill(store, late.limit(0))
    key = ["conv_id", "channel", "block_start", "seq", "crc"]
    assert sorted(map(tuple, merged.select(*key).collect())) == \
        sorted(map(tuple, store.select(*key).collect()))


def test_backfill_entirely_new_conversation(spark):
    """A conversation that exists ONLY in the late batch appears in the
    merged store."""
    t, _, _ = _split(spark)
    convs = [r[0] for r in
             t.select("conv_id").distinct().orderBy("conv_id").limit(2)
             .collect()]
    ontime = t.where(F.col("conv_id") == convs[0])
    late = t.where(F.col("conv_id") == convs[1])
    merged = ingest_backfill(encode_blocks(ontime), late)
    assert _point_set(merged) == _point_set(
        encode_blocks(t.where(F.col("conv_id").isin(convs))))


def test_backfill_replay_idempotent_under_lww(spark):
    """Re-delivering the SAME late batch (an at-least-once upstream)
    must be a no-op under on_conflict='last': every replayed point
    lands on an equal (series, ts) and LWW keeps exactly one."""
    t, ontime, late = _split(spark)
    store = encode_blocks(ontime)
    once = ingest_backfill(store, late,
                           on_conflict="last").localCheckpoint()
    twice = ingest_backfill(once, late, on_conflict="last")
    assert _point_set(twice) == _point_set(once)
