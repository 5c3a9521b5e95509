"""Streaming late-data path: divert watermark-late rows to a staging
sink instead of silently dropping them.

Structured Streaming's stateful operators DROP rows older than the
watermark — correct for the operator's exactly-once contract, fatal for
an ingest pipeline: a replayed queue or a delayed export would silently
lose turns.  The production pattern (the kappa-architecture "late
path") is a ``foreachBatch`` ingest that splits every microbatch
against the stream's event-time frontier:

- on-time rows → the normal batch encoder (``encode_blocks``), blocks
  appended to the store;
- late rows → an append-only STAGING table, merged into the sealed
  store later by ``operators/backfill.py::ingest_backfill`` (the
  copy-on-write merge whose cost ∝ the late batch).

The frontier mirrors Spark's own watermark semantics exactly: before
batch N is processed, ``frontier = max(event time over batches < N)
− delay`` — the same "max event time seen so far minus allowed
lateness, advanced at batch boundaries" rule (Spark docs, Structured
Streaming watermarking).  We track it ourselves because
``foreachBatch`` hands us a plain batch DataFrame with no watermark
attached; the frontier lives in a one-line JSON file next to the
checkpoint (driver-side IO, same durability domain as the checkpoint —
on a cluster this is a table property / checkpoint asset).

Delivery: ``foreachBatch`` is at-least-once across restarts.  Every
output row carries ``epoch_id``, so a replayed epoch is removable with
one partition-pruned anti-filter (``WHERE epoch_id != replayed``) —
the standard idempotent-sink recipe; on Iceberg/Delta the whole batch
fn is one atomic MERGE keyed on epoch.

Reference parity note: gorilla-tsc's encoder requires in-order inserts
(README.adoc:150); this module is the engine-level answer to "what if
the stream violates that" — divert, stage, backfill-merge.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.channels import Channel
from ..operators.backfill import ingest_backfill
from ..operators.encode import encode_blocks


def split_by_frontier(batch_df: DataFrame, frontier_ms: int
                      ) -> tuple[DataFrame, DataFrame]:
    """(on_time, late) split of one microbatch against the event-time
    frontier.  A row is LATE iff its event time is strictly below the
    frontier — the row a watermarked stateful operator would drop.
    One scan-side predicate each; no shuffle."""
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    return (batch_df.where(ts_ms >= F.lit(frontier_ms)),
            batch_df.where(ts_ms < F.lit(frontier_ms)))


def _read_frontier(path: str) -> int:
    try:
        with open(path) as f:
            return int(json.load(f)["frontier_ms"])
    except (OSError, ValueError, KeyError):
        return 0


def _write_frontier(path: str, frontier_ms: int) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"frontier_ms": int(frontier_ms)}, f)
    os.replace(tmp, path)


def make_ingest_batch_fn(store_dir: str, late_dir: str, frontier_path: str,
                         delay_ms: int,
                         channels: list[Channel] | None = None,
                         points_per_block: int = 65_536):
    """Build the ``foreachBatch`` callable for
    ``transcripts.writeStream.foreachBatch(fn)``.

    Per microbatch: split against the persisted frontier, append late
    rows (+``epoch_id``) to ``late_dir``, encode on-time rows and
    append the blocks (+``epoch_id``) to ``store_dir``, then advance
    the frontier to ``max(frontier, max batch event time − delay_ms)``.
    """
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        frontier = _read_frontier(frontier_path)
        on_time, late = split_by_frontier(batch_df, frontier)
        # one job over the batch: max event time + late row presence
        agg = batch_df.agg(
            F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("mx")
        ).first()
        if agg["mx"] is None:          # empty batch
            return
        (late.withColumn("epoch_id", F.lit(int(epoch_id)))
             .write.mode("append").parquet(late_dir))
        blocks = encode_blocks(on_time, channels,
                               points_per_block=points_per_block)
        (blocks.withColumn("epoch_id", F.lit(int(epoch_id)))
               .write.mode("append").parquet(store_dir))
        _write_frontier(frontier_path,
                        max(frontier, int(agg["mx"]) - delay_ms))

    return fn


def merge_late_staging(spark, store_dir: str, late_dir: str,
                       channels: list[Channel] | None = None,
                       predictor: str | None = None,
                       on_conflict: str = "keep_both") -> DataFrame:
    """Merge the accumulated late staging rows into the block store via
    ``ingest_backfill`` and return the updated store (epoch bookkeeping
    column dropped; the caller owns the write+swap).  Empty staging →
    the store unchanged."""
    store = spark.read.parquet(store_dir).drop("epoch_id")
    try:
        late = spark.read.parquet(late_dir).drop("epoch_id")
    except Exception:
        return store                       # staging never materialized
    return ingest_backfill(store, late, channels=channels,
                           predictor=predictor, on_conflict=on_conflict)
