"""Block compaction: many small blocks → few span-auto blocks.

Why this operator exists at 100 TB: both the streaming encoder (one
block per (conv, day) seal) and day-aligned batch encode of sparse
conversations produce LOTS of small blocks, and every block pays the
~190-bit header/terminator plus a parquet row of metadata.  Compaction
is the background maintenance job every block store runs (the same role
as Iceberg rewrite_data_files or a TSDB's chunk merge): decode each
(conv_id, channel)'s blocks, merge the points, and re-encode under the
span='auto' profile — splitting only where a timestamp step would
overflow the 32-bit delta-of-delta bucket (>= GAP_SPLIT_MS, the same
rule as the batch auto profile; dod buckets per
ValueCompressor.java/README format, see operators/encode.py).

Plan shape: ONE shuffle keyed (conv_id, channel) + partition-local
sort, then a partition-batched mapInPandas kernel that decodes every
payload in one native call and re-encodes every output block in one
native call.  Compacted blocks carry the same per-UTC-day sub-aggregate
arrays as batch span-auto blocks, so the day tier still rolls up from
block METADATA with zero decode after compaction.

Identity contract (pytest-gated): decode(compact(B)) == decode(B) as a
point set, and the day tier from compacted metadata equals the day tier
from the original blocks.
"""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..codec.batch import encode_partition
from .encode import BLOCKS_SCHEMA, DAY_MS, GAP_SPLIT_MS, _day_cols, _day_runs


def _compact_iter(pdf_iter, drop_range=None, predictor=None, lww_seq=None):
    """mapInPandas kernel.  Arrow may split one partition into many
    batches; a (conv_id, channel) series straddling a batch boundary
    would otherwise emit two compacted blocks with the SAME identity
    (conv, channel, block_start, seq=0) — so each batch holds back its
    final series and prepends it to the next batch (flushed at end)."""
    carry = None
    for pdf in pdf_iter:
        if carry is not None:
            pdf = pd.concat((carry, pdf), ignore_index=True)
            carry = None
        if len(pdf) == 0:
            continue
        conv = pdf["conv_id"].to_numpy()
        chan = pdf["channel"].to_numpy()
        last = (conv == conv[-1]) & (chan == chan[-1])
        # rows of the final series = the contiguous True tail of `last`
        tail0 = len(pdf) - int(last[::-1].argmin()) if not last.all() else 0
        carry = pdf.iloc[tail0:].reset_index(drop=True)
        head = pdf.iloc[:tail0]
        if len(head):
            yield from _compact_pdf(head, drop_range, predictor, lww_seq)
    if carry is not None and len(carry):
        yield from _compact_pdf(carry, drop_range, predictor, lww_seq)


def _compact_pdf(pdf, drop_range=None, predictor=None, lww_seq=None):
    from ..codec import native
    from ..codec.fastdecode import decode_payload
    from ..codec.gorilla import GorillaDecoder, dfcm_table_size

    pred_size = dfcm_table_size(predictor)  # validates the spec
    cols = [f.name for f in BLOCKS_SCHEMA.fields]
    payloads = [bytes(p) for p in pdf["payload"]]
    expected = pdf["n_points"].to_numpy(np.int64)
    res = native.decode_many(payloads, expected, pred_size=pred_size)
    if res is not None:
        ts, bits, _ = res
    else:
        ts_l: list[int] = []
        v_l: list[int] = []
        for p in payloads:
            if pred_size:
                t, v = GorillaDecoder(p, predictor).read_all()
            else:
                t, v = decode_payload(p)
            ts_l.extend(t)
            v_l.extend(v)
        ts = np.array(ts_l, dtype=np.int64)
        bits = np.array(v_l, dtype=np.uint64)

    # runs of (conv_id, channel) over the decoded point stream —
    # the partition is sorted by (conv_id, channel, first_ts, seq)
    # so each series is one contiguous run of blocks
    conv_b = pdf["conv_id"].to_numpy()
    chan_b = pdf["channel"].to_numpy()
    kind_b = pdf["kind"].to_numpy()
    blk_of_pt = np.repeat(np.arange(len(pdf)), expected)
    series_change = np.zeros(len(pdf), dtype=bool)
    series_change[0] = True
    series_change[1:] = (conv_b[1:] != conv_b[:-1]) | (chan_b[1:] != chan_b[:-1])
    series_id_b = np.cumsum(series_change) - 1
    series_id = series_id_b[blk_of_pt]

    # canonical in-series order: blocks arrive first_ts-sorted, but
    # seq sub-blocks of one day may interleave in time — a stable
    # per-series ts sort restores the canonical stream.  Under
    # last-write-wins backfill, late points (their staging blocks are
    # marked seq == lww_seq) sort after on-time points at equal ts so
    # "keep the last of each conflict run" keeps the late value.
    if lww_seq is not None:
        pri = (pdf["seq"].to_numpy(np.int64) == lww_seq)[blk_of_pt]
        order = np.lexsort((pri, ts, series_id))
        pri = pri[order]
    else:
        order = np.lexsort((ts, series_id))
    ts = ts[order]
    bits = bits[order]
    series_id = series_id[order]

    if drop_range is not None:
        # targeted purge: drop points with t0 <= ts < t1 before the
        # re-split, so a fully-purged series emits no block at all
        t0, t1 = drop_range
        keep = (ts < t0) | (ts >= t1)
        ts, bits, series_id = ts[keep], bits[keep], series_id[keep]
        if lww_seq is not None:
            pri = pri[keep]

    if lww_seq is not None and len(ts):
        # last-write-wins: within each equal-(series, ts) run that
        # contains at least one LATE point, keep only the run's last
        # point (a late one, by the sort above).  Runs with no late
        # member — pre-existing duplicate timestamps the caller never
        # touched — pass through intact.
        new_run = np.ones(len(ts), dtype=bool)
        new_run[1:] = ((series_id[1:] != series_id[:-1])
                       | (ts[1:] != ts[:-1]))
        run_id = np.cumsum(new_run) - 1
        run_has_late = np.zeros(run_id[-1] + 1, dtype=bool)
        run_has_late[run_id[pri]] = True
        last_of_run = np.ones(len(ts), dtype=bool)
        last_of_run[:-1] = new_run[1:]
        keep = ~run_has_late[run_id] | last_of_run
        ts, bits, series_id = ts[keep], bits[keep], series_id[keep]

    n = len(ts)
    if n == 0:
        return
    is_start = np.zeros(n, dtype=bool)
    is_start[0] = True
    is_start[1:] = series_id[1:] != series_id[:-1]
    gap = np.zeros(n, dtype=bool)
    gap[1:] = (ts[1:] - ts[:-1]) >= GAP_SPLIT_MS
    brk = is_start | gap
    starts = np.flatnonzero(brk).astype(np.int64)
    counts = np.diff(np.concatenate((starts, [n]))).astype(np.int64)
    ends = starts + counts - 1

    first_block_of_series = np.flatnonzero(series_change)
    blk_series = series_id[starts]
    conv_arr = conv_b[first_block_of_series[blk_series]]
    chan_arr = chan_b[first_block_of_series[blk_series]]
    kind_arr = kind_b[first_block_of_series[blk_series]]
    g_bts = (ts[starts] // DAY_MS) * DAY_MS

    new_payloads, nbits = encode_partition(starts, counts, g_bts, ts, bits,
                                           predictor)

    is_double = kind_arr == "double"
    vals = np.where(np.repeat(is_double, counts),
                    bits.view(np.float64),
                    bits.view(np.int64).astype(np.float64))
    sub_s, sub_c, split, bkt = _day_runs(ts, starts, counts)
    yield pd.DataFrame({
        "conv_id": conv_arr,
        "channel": chan_arr,
        "kind": kind_arr,
        "block_start": g_bts,
        "seq": np.zeros(len(starts), dtype=np.int32),
        "n_points": counts.astype(np.int32),
        "n_bits": nbits,
        "payload": new_payloads,
        "first_ts": ts[starts],
        "last_ts": ts[ends],
        "agg_cnt": counts,
        "agg_min": np.minimum.reduceat(vals, starts),
        "agg_max": np.maximum.reduceat(vals, starts),
        "agg_sum": np.add.reduceat(vals, starts),
        **_day_cols(vals, sub_s, sub_c, split, bkt),
        "crc": [zlib.crc32(p) for p in new_payloads],
    }, columns=cols)


def compact_blocks(blocks: DataFrame,
                   shuffle_partitions: int | None = None,
                   drop_range: tuple[int, int] | None = None,
                   predictor: str | None = None,
                   lww_late_seq: int | None = None) -> DataFrame:
    """gorilla_blocks (any mix of day/auto/streaming blocks) →
    compacted span-auto blocks, one shuffle keyed (conv_id, channel).
    ``predictor`` must match the store's encode-time predictor (as for
    decode_blocks/audit) — decoding a DFCM store as last_value would
    silently rewrite garbage.

    At warehouse scale this runs as a maintenance job over one
    partition of the block store at a time (e.g. per conv_id bucket);
    block metadata (first_ts/n_points) is all the planner needs — the
    payload bytes move exactly once.

    ``drop_range=(t0_ms, t1_ms)`` additionally drops every decoded
    point with t0 <= ts < t1 before re-encoding — the copy-on-write
    rewrite step of a targeted purge (see ``operators/purge.py``).  A
    series whose points are all inside the range emits no block.

    ``lww_late_seq=S`` enables last-write-wins conflict resolution for
    backfill ingest (see ``operators/backfill.py``): input blocks whose
    ``seq`` equals S are LATE staging blocks, and wherever a late point
    shares a timestamp with an on-time point of the same series, only
    the late value survives.  Equal-ts runs with no late member pass
    through untouched.
    """
    n = shuffle_partitions or int(
        blocks.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    arranged = (blocks
                .select(*[f.name for f in BLOCKS_SCHEMA.fields])
                .repartition(n, "conv_id", "channel")
                .sortWithinPartitions("conv_id", "channel", "first_ts", "seq"))
    return arranged.mapInPandas(
        lambda it: _compact_iter(it, drop_range, predictor, lww_late_seq),
        schema=BLOCKS_SCHEMA)


def promote_stream_blocks(sealed: DataFrame, kind: str = "double") -> DataFrame:
    """Streaming-sealed block rows (STREAM_BLOCKS_SCHEMA) → the batch
    BLOCKS_SCHEMA shape, so the compaction maintenance job can sweep
    the streaming tier directly (the end-to-end lifecycle: watermark
    seal → small (conv, day) blocks → compact to span-auto blocks).

    Aggregate and day_* cells are left NULL — compaction recomputes
    every output aggregate from the decoded points; n_bits is the byte
    length upper bound (exact bit count is not carried by the stream
    schema and is not read by the compactor).
    """
    from pyspark.sql import functions as F

    return sealed.select(
        "conv_id", "channel", F.lit(kind).alias("kind"), "block_start",
        F.lit(0).cast("int").alias("seq"), "n_points",
        (F.length("payload").cast("long") * 8).alias("n_bits"),
        "payload", "first_ts", "last_ts",
        F.col("n_points").cast("long").alias("agg_cnt"),
        F.lit(None).cast("double").alias("agg_min"),
        F.lit(None).cast("double").alias("agg_max"),
        F.lit(None).cast("double").alias("agg_sum"),
        F.lit(None).cast("array<long>").alias("day_buckets"),
        F.lit(None).cast("array<long>").alias("day_cnt"),
        F.lit(None).cast("array<double>").alias("day_min"),
        F.lit(None).cast("array<double>").alias("day_max"),
        F.lit(None).cast("array<double>").alias("day_sum"),
        "crc",
    )
