"""End-to-end pipeline: transcripts → gorilla blocks → rollup tiers →
gap-fill → retention, with per-stage checkpoint lineage and resume.

This is the spark-submit entry path (SURVEY.md §3.4):
read → sub-blocked shuffle → applyInPandas encode → write blocks +
checkpoints → tier cascade → gap-fill → write tiers + checkpoints →
retention expiry. A killed job rerun with the same warehouse resumes:
completed encode groups are anti-joined away BEFORE the kernel runs.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.channels import Channel, default_channels
from .operators.checkpoint import BLOCK_ID_COLS, CheckpointLog, points_group_key_col
from .operators.encode import (
    BLOCKS_SCHEMA,
    block_value_column,
    decode_blocks,
    encode_points,
    points_for_encode,
)
from .operators.gapfill import gapfill
from .operators.retention import RetentionPolicy, apply_retention
from .operators.rollup import TIER_MS, cascade, rollup_points, with_mean
from .sources.tables import read_tier, write_tier


def read_blocks(spark: SparkSession, warehouse: str) -> DataFrame:
    """Blocks tier, deduped on block identity (crash-window idempotency)."""
    return read_tier(spark, warehouse, "gorilla_blocks").dropDuplicates(BLOCK_ID_COLS)


@dataclass
class PipelineResult:
    blocks_path: str
    tier_paths: dict
    n_blocks: int
    n_points: int
    payload_bytes: int
    wall_sec: float


def encode_stage(
    spark: SparkSession,
    transcripts: DataFrame,
    warehouse: str,
    channels: list[Channel],
    predictor: str | None,
    points_per_block: int,
    resume: bool,
) -> DataFrame:
    log = CheckpointLog(spark, warehouse)
    pts = points_for_encode(transcripts, channels, points_per_block)
    if resume:
        pts = log.pending(
            pts.withColumn("part_key", points_group_key_col()), "encode"
        ).drop("part_key")
    blocks = encode_points(pts, channels, predictor)
    blocks.write.mode("append").parquet(f"{warehouse}/gorilla_blocks")
    # lineage for exactly the rows this run appended = written minus done
    written = read_blocks(spark, warehouse)
    from .operators.checkpoint import group_key_col
    fresh = log.pending(written.withColumn("part_key", group_key_col()), "encode")
    log.log_blocks(fresh.drop("part_key"), "encode")
    return read_blocks(spark, warehouse)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    warehouse: str,
    channels: list[Channel] | None = None,
    predictor: str | None = None,
    points_per_block: int = 65_536,
    gapfill_how: str = "locf",
    policy: RetentionPolicy = RetentionPolicy(),
    resume: bool = True,
) -> PipelineResult:
    t0 = time.time()
    channels = channels or default_channels()
    log = CheckpointLog(spark, warehouse)

    written = encode_stage(spark, transcripts, warehouse, channels,
                           predictor, points_per_block, resume)

    # stage A: rollup tiers from decoded blocks (self-verifying path);
    # fingerprint channels are decodable but not tier-aggregated
    from .functions.channels import agg_channel_names
    points = decode_blocks(written, predictor).where(
        F.col("channel").isin(agg_channel_names(channels)))
    t1m = rollup_points(points, TIER_MS["1m"], block_value_column())
    write_tier(t1m, warehouse, "rollup_1m", mode="overwrite")
    t1m = read_tier(spark, warehouse, "rollup_1m")
    t1h = cascade(t1m, TIER_MS["1m"], TIER_MS["1h"])
    write_tier(t1h, warehouse, "rollup_1h", mode="overwrite")
    t1h = read_tier(spark, warehouse, "rollup_1h")
    t1d = cascade(t1h, TIER_MS["1h"], TIER_MS["1d"])
    write_tier(t1d, warehouse, "rollup_1d", mode="overwrite")
    t1d = read_tier(spark, warehouse, "rollup_1d")
    log.log_rows([{"stage": "rollup", "part_key": t} for t in ("1m", "1h", "1d")])

    # stage G: gap-fill the serving tier
    filled = gapfill(with_mean(t1m), TIER_MS["1m"], how=gapfill_how)
    write_tier(filled, warehouse, "rollup_1m_filled", mode="overwrite")
    log.log_rows([{"stage": "gapfill", "part_key": "1m"}])

    # stage R: retention expiry (deterministic 'now' = max data ts);
    # an empty store has no 'now' and nothing to expire
    now_ms = written.agg(F.max("last_ts")).first()[0]
    if now_ms is None:
        now_ms = 0
    for tier_name, keep in (("rollup_1m", policy.keep_1m_days),
                            ("rollup_1h", policy.keep_1h_days),
                            ("rollup_1d", policy.keep_1d_days)):
        pruned = apply_retention(read_tier(spark, warehouse, tier_name), now_ms, keep)
        write_tier(pruned, warehouse, f"{tier_name}_retained", mode="overwrite")
    log.log_rows([{"stage": "retention", "part_key": "all"}])

    stats = written.agg(
        F.count(F.lit(1)), F.sum("n_points"), F.sum(F.length("payload"))).first()
    return PipelineResult(
        blocks_path=f"{warehouse}/gorilla_blocks",
        tier_paths={t: f"{warehouse}/{t}" for t in
                    ("rollup_1m", "rollup_1h", "rollup_1d", "rollup_1m_filled")},
        n_blocks=stats[0], n_points=stats[1] or 0, payload_bytes=stats[2] or 0,
        wall_sec=time.time() - t0,
    )


def register_views(spark: SparkSession, warehouse: str,
                   prefix: str = "gorilla_",
                   predictor: str | None = None) -> list[str]:
    """Expose the warehouse to plain ``spark.sql`` users.

    Registers temp views over every tier table present plus a lazily
    DECODED point view (``<prefix>points``) built on the block store —
    ad hoc SQL like

        SELECT conv_id, avg(v_double) FROM gorilla_points
        WHERE channel = 'len' GROUP BY conv_id

    Caveat (verified against the physical plan): predicates on the
    points view sit ABOVE the decode kernel — Catalyst cannot push a
    filter through mapInPandas — so the view decodes every block it
    scans.  Fine for tier-wide SQL; for narrow time windows use
    ``operators.retention.read_range`` (or ``jobs/export_job.py``),
    which prunes on block metadata BEFORE decoding, or filter the
    ``<prefix>blocks`` view on first_ts/last_ts/channel and decode the
    result.  Returns the view names registered.  On Iceberg the tables
    are already SQL-addressable; this is the parquet-sandbox
    equivalent.
    """
    from .operators.encode import decode_blocks

    names = []
    blocks = read_blocks(spark, warehouse)
    blocks.createOrReplaceTempView(f"{prefix}blocks")
    names.append(f"{prefix}blocks")
    # predictor must match the store's encode-time predictor — the
    # points view would otherwise serve silently mis-decoded values
    decode_blocks(blocks, predictor).createOrReplaceTempView(
        f"{prefix}points")
    names.append(f"{prefix}points")
    for tier in ("rollup_1m", "rollup_1h", "rollup_1d", "rollup_1m_filled",
                 "checkpoints"):
        try:
            read_tier(spark, warehouse, tier).createOrReplaceTempView(
                f"{prefix}{tier}")
            names.append(f"{prefix}{tier}")
        except Exception:
            continue  # tier not materialized in this warehouse
    return names


def register_tier_views(spark: SparkSession, tiers_dir: str,
                        prefix: str = "tier_") -> list[str]:
    """Expose a ``jobs/tiers_job.py`` output directory to plain
    ``spark.sql`` users: every family tier table present (corr_fine,
    twa_coarse, hb/rate/hist/state/candle …) becomes a
    ``<prefix><table>`` temp view.  Discovery is by directory listing,
    so new families need no registration code; on Iceberg the tables
    are already SQL-addressable and this is the parquet-sandbox
    equivalent.  Returns the view names registered."""
    import os

    names = []
    try:
        entries = sorted(os.listdir(tiers_dir))
    except OSError:
        return names
    for entry in entries:
        path = os.path.join(tiers_dir, entry)
        if not os.path.isdir(path):
            continue
        try:
            spark.read.parquet(path).createOrReplaceTempView(
                f"{prefix}{entry}")
        except Exception:
            continue  # not a parquet table
        names.append(f"{prefix}{entry}")
    return names
