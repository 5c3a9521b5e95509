"""Block compaction: decode identity, block-count reduction, and
metadata-tier equality (operators/compact.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.compact import compact_blocks
from gorilla_tsc_spark.operators.encode import decode_blocks, encode_blocks
from gorilla_tsc_spark.operators.rollup import rollup_from_day_subaggs


def _small_blocks(spark):
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, "/root/testdata/sf0.001")
    # points_per_block=16 fragments every conversation into many tiny
    # blocks — the streaming-seal / sparse-day shape compaction exists for
    return encode_blocks(t, points_per_block=16)


def _point_set(blocks):
    return {tuple(r) for r in decode_blocks(blocks)
            .select("conv_id", "channel", "ts_ms", "v_double", "v_long")
            .collect()}


def test_compact_decode_identity_and_reduction(spark):
    blocks = _small_blocks(spark).cache()
    compacted = compact_blocks(blocks).cache()
    n_before = blocks.count()
    n_after = compacted.count()
    assert n_after < n_before / 4, (n_before, n_after)
    # every compacted block is one series, seq reset, payload consistent
    bad = compacted.where(
        (F.col("seq") != 0)
        | (F.length("payload") != F.ceil(F.col("n_bits") / 8.0))).count()
    assert bad == 0
    assert _point_set(compacted) == _point_set(blocks)
    # compression must not get WORSE per point (header amortization)
    b = blocks.agg(F.sum(F.length("payload"))).first()[0]
    c = compacted.agg(F.sum(F.length("payload"))).first()[0]
    assert c < b


def test_compact_day_tier_matches(spark):
    # tier equality over the AGG channels only (as the pipeline serves
    # them): text_hash is agg=False exactly because float64 sums of
    # 2^63-magnitude hashes are order-dependent (channels.py)
    from gorilla_tsc_spark.functions.channels import agg_channel_names
    blocks = _small_blocks(spark)
    compacted = compact_blocks(blocks)
    keep = agg_channel_names()

    def tier(b):
        return {tuple(r) for r in rollup_from_day_subaggs(b)
                .where(F.col("channel").isin(keep)).collect()}

    assert tier(compacted) == tier(blocks)
