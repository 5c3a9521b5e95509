"""Streaming heartbeat/uptime tier via applyInPandasWithState.

The liveness question is natively a streaming one ("is this agent
alive RIGHT NOW?"), and the batch family's summary is by design
within-bucket only (cross-bucket seams are the cascade's job —
operators/heartbeat.py), so the streaming build needs no cross-bucket
state: each (conv_id, bucket) group buffers its beat timestamps and
seals EXACTLY the batch tier row when the event-time watermark passes
the end of its bucket — the same sealing policy as the event-time
block encoder (encode_stream.make_eventtime_state_fn).

Sealed rows are bit-identical to `heartbeat_tier` over the same beats
(sorted + deduped on seal, gap clipping at hb_ms), so downstream
cascade / serve / refresh are shared with batch — the streamed fine
tier slots straight into `cascade_heartbeat_tier`.

State per open group is the beat array of ONE series-bucket (bounded:
one conversation-hour), checkpointed by the state store like the
streaming encoder's raw-point buffer.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STREAM_HB_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("first_ts", T.LongType()),
    T.StructField("last_ts", T.LongType()),
    T.StructField("live_ms", T.LongType()),
    T.StructField("max_gap_ms", T.LongType()),
    T.StructField("interruptions", T.LongType()),
])

HB_STATE_SCHEMA = T.StructType([
    T.StructField("ts", T.ArrayType(T.LongType())),
])


def _seal_row(conv_id: str, bucket: int, ts_l: list, hb_ms: int) -> dict:
    ts = np.unique(np.asarray(ts_l, dtype=np.int64))  # sort + dedupe
    gaps = np.diff(ts)
    return {
        "conv_id": conv_id, "bucket": bucket, "n": int(len(ts)),
        "first_ts": int(ts[0]), "last_ts": int(ts[-1]),
        "live_ms": int(np.minimum(gaps, hb_ms).sum()) if len(gaps) else 0,
        "max_gap_ms": int(gaps.max()) if len(gaps) else 0,
        "interruptions": int((gaps > hb_ms).sum()),
    }


def make_heartbeat_state_fn(bucket_ms: int, hb_ms: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id, bucket = key[0], int(key[1])
        if state.hasTimedOut:
            (ts_l,) = state.get
            state.remove()
            if ts_l:
                yield pd.DataFrame(
                    [_seal_row(conv_id, bucket, ts_l, hb_ms)],
                    columns=[f.name for f in STREAM_HB_SCHEMA.fields])
            return
        ts_l = list(state.get[0]) if state.exists else []
        for pdf in pdf_iter:
            ts_l.extend(pdf["ts_ms"].astype("int64").tolist())
        state.update((ts_l,))
        # seal when event time provably passed the bucket's end; late
        # stragglers under the watermark delay still land first
        bucket_end = bucket + bucket_ms
        state.setTimeoutTimestamp(
            max(bucket_end, state.getCurrentWatermarkMs() + 1))

    return fn


def stream_heartbeat_tier(transcripts_stream: DataFrame, bucket_ms: int,
                          hb_ms: int, delay: str = "10 minutes") -> DataFrame:
    """Transcript stream → watermark-sealed heartbeat tier rows, each
    bit-identical to the batch `heartbeat_tier` row for the same beats."""
    from pyspark.sql import functions as F
    beats = (transcripts_stream
             .withWatermark("ts", delay)
             .select(
                 "conv_id",
                 (F.floor(F.unix_millis(F.col("ts").cast("timestamp"))
                          / bucket_ms) * bucket_ms)
                 .cast("long").alias("bucket"),
                 F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
                 "ts"))
    return beats.groupBy("conv_id", "bucket").applyInPandasWithState(
        make_heartbeat_state_fn(bucket_ms, hb_ms),
        outputStructType=STREAM_HB_SCHEMA,
        stateStructType=HB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
