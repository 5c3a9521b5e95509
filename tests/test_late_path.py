"""Streaming late-data path (streaming/late_path.py): frontier split
semantics, per-batch ingest behavior, staging-merge identity, and the
real writeStream wiring."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.encode import decode_blocks, encode_blocks
from gorilla_tsc_spark.queries import LEN_CHANNEL
from gorilla_tsc_spark.sources.transcripts import synthesize_transcripts
from gorilla_tsc_spark.streaming.late_path import (
    make_ingest_batch_fn,
    merge_late_staging,
    split_by_frontier,
)

DELAY_MS = 60_000


@pytest.fixture(scope="module")
def transcripts(spark):
    return synthesize_transcripts(spark, n_convs=12, max_turns=200).cache()


def _point_set(blocks):
    return {tuple(r) for r in decode_blocks(blocks)
            .select("conv_id", "channel", "ts_ms", "v_double")
            .collect()}


def test_split_by_frontier(spark, transcripts):
    ts = [r[0] for r in transcripts.select(
        F.unix_millis("ts").alias("m")).collect()]
    frontier = sorted(ts)[len(ts) // 2]
    on_time, late = split_by_frontier(transcripts, frontier)
    assert on_time.count() == sum(1 for t in ts if t >= frontier)
    assert late.count() == sum(1 for t in ts if t < frontier)
    # boundary row (ts == frontier) is ON TIME, matching Spark's
    # "drop iff event time < watermark" rule
    assert on_time.where(
        F.unix_millis("ts") == frontier).count() == ts.count(frontier)


def test_ingest_batches_divert_late_rows(spark, transcripts, tmp_path):
    """Replay the corpus as two manual microbatches where batch 2
    carries rows OLDER than batch 1's frontier: they must land in
    staging, not the store; the store must hold exactly the on-time
    encode; the merge must restore the full point set."""
    store, late_dir = str(tmp_path / "store"), str(tmp_path / "late")
    fpath = str(tmp_path / "frontier.json")
    fn = make_ingest_batch_fn(store, late_dir, fpath, DELAY_MS,
                              channels=LEN_CHANNEL)

    cut = transcripts.agg(F.expr(
        "percentile_approx(unix_millis(ts), 0.5, 10000)")).first()[0]
    early = transcripts.where(F.unix_millis("ts") < cut)
    recent = transcripts.where(F.unix_millis("ts") >= cut)

    # batch 1: the recent half — establishes a frontier near max(ts)
    fn(recent, 0)
    # batch 2: the early half — all of it is far behind the frontier
    fn(early, 1)

    staged = spark.read.parquet(late_dir)
    assert staged.count() == early.count()
    assert set(r.epoch_id for r in
               staged.select("epoch_id").distinct().collect()) == {1}

    store_blocks = spark.read.parquet(store)
    assert _point_set(store_blocks.drop("epoch_id")) == _point_set(
        encode_blocks(recent, LEN_CHANNEL))

    merged = merge_late_staging(spark, store, late_dir,
                                channels=LEN_CHANNEL)
    assert _point_set(merged) == _point_set(
        encode_blocks(transcripts, LEN_CHANNEL))


def test_ingest_in_order_batches_stage_nothing(spark, transcripts,
                                               tmp_path):
    """In-order replay (each batch newer than the last, gaps under the
    allowed delay) must divert nothing."""
    store, late_dir = str(tmp_path / "store"), str(tmp_path / "late")
    fpath = str(tmp_path / "frontier.json")
    fn = make_ingest_batch_fn(store, late_dir, fpath, DELAY_MS,
                              channels=LEN_CHANNEL)
    cut = transcripts.agg(F.expr(
        "percentile_approx(unix_millis(ts), 0.5, 10000)")).first()[0]
    fn(transcripts.where(F.unix_millis("ts") < cut), 0)
    fn(transcripts.where(F.unix_millis("ts") >= cut), 1)
    late_rows = spark.read.parquet(late_dir)
    assert late_rows.count() == 0
    merged = merge_late_staging(spark, store, late_dir,
                                channels=LEN_CHANNEL)
    assert _point_set(merged) == _point_set(
        encode_blocks(transcripts, LEN_CHANNEL))


def test_ingest_empty_batch_is_noop(spark, transcripts, tmp_path):
    store, late_dir = str(tmp_path / "store"), str(tmp_path / "late")
    fpath = str(tmp_path / "frontier.json")
    fn = make_ingest_batch_fn(store, late_dir, fpath, DELAY_MS,
                              channels=LEN_CHANNEL)
    fn(transcripts.limit(0), 0)
    import os
    assert not os.path.exists(fpath)       # frontier untouched
    assert not os.path.exists(store)


def test_writestream_wiring(spark, transcripts, tmp_path):
    """The batch fn runs under a real writeStream.foreachBatch: one
    availableNow pass over a parquet source encodes everything (single
    batch → nothing can be late) and the store decodes to the full
    point set."""
    src = str(tmp_path / "src")
    transcripts.write.parquet(src)
    store, late_dir = str(tmp_path / "store"), str(tmp_path / "late")
    fpath = str(tmp_path / "frontier.json")
    stream = spark.readStream.schema(transcripts.schema).parquet(src)
    q = (stream.writeStream
         .foreachBatch(make_ingest_batch_fn(store, late_dir, fpath,
                                            DELAY_MS,
                                            channels=LEN_CHANNEL))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    merged = merge_late_staging(spark, store, late_dir,
                                channels=LEN_CHANNEL)
    assert _point_set(merged) == _point_set(
        encode_blocks(transcripts, LEN_CHANNEL))
