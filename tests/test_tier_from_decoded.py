"""Codec composition for the round-4 tier families: tiers built from
DECODED Gorilla blocks must equal tiers built from the raw points (the
lossless roundtrip means the families slot into the pipeline's
encode → store → decode → tier path exactly like `rollup_from_decoded`
does for the numeric family)."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.functions.channels import Channel
from gorilla_tsc_spark.operators.correlate import corr_tier
from gorilla_tsc_spark.operators.encode import decode_blocks, encode_blocks
from gorilla_tsc_spark.operators.heartbeat import heartbeat_tier
from gorilla_tsc_spark.operators.rollup import HOUR_MS
from gorilla_tsc_spark.operators.timeweight import twa_tier

SF = "/root/testdata/sf0.001"
HB = 5 * 60_000


def _rows(df):
    cols = [c for c in df.columns]
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_new_families_from_decoded_blocks(spark):
    from gorilla_tsc_spark.queries import _transcripts
    t = _transcripts(spark, SF).cache()
    raw = t.select("conv_id", F.unix_millis("ts").alias("ts_ms"),
                   F.length("text").cast("double").alias("x"),
                   F.size(F.split("text", r"\s+")).cast("double")
                    .alias("y")).cache()

    # encode both channels, decode, pivot back to (ts, x, y) per turn
    blocks = encode_blocks(t, [Channel("len", "double"),
                               Channel("words", "long"),
                               Channel("role_idx", "long", agg=False)])
    dec = (decode_blocks(blocks)
           .groupBy("conv_id", "ts_ms")
           .pivot("channel", ["len", "words"])
           .agg(F.first(F.when(F.col("kind") == "double",
                               F.col("v_double"))
                        .otherwise(F.col("v_long").cast("double"))))
           .select("conv_id", "ts_ms",
                   F.col("len").alias("x"), F.col("words").alias("y"))
           .cache())
    assert dec.count() == raw.count()

    # correlation tier: decoded ≡ raw
    assert _rows(corr_tier(dec, HOUR_MS)) == _rows(corr_tier(raw, HOUR_MS))
    # time-weight tier over the len channel
    assert (_rows(twa_tier(dec.withColumnRenamed("x", "v"), HOUR_MS))
            == _rows(twa_tier(raw.withColumnRenamed("x", "v"), HOUR_MS)))
    # heartbeat tier over the decoded timestamps
    assert (_rows(heartbeat_tier(dec.select("conv_id", "ts_ms"),
                                 HOUR_MS, HB))
            == _rows(heartbeat_tier(raw.select("conv_id", "ts_ms"),
                                    HOUR_MS, HB)))
    # candle tier (with words as volume): decoded ≡ raw
    from gorilla_tsc_spark.operators.candle import candle_tier
    assert (_rows(candle_tier(dec.select(
                "conv_id", "ts_ms", F.col("x").alias("v"),
                F.col("y").alias("vol")), HOUR_MS, vol_col="vol"))
            == _rows(candle_tier(raw.select(
                "conv_id", "ts_ms", F.col("x").alias("v"),
                F.col("y").alias("vol")), HOUR_MS, vol_col="vol")))
    # state-duration tier: the state-code channel survives the codec
    # round trip and the tier built from decoded codes ≡ raw
    from gorilla_tsc_spark.operators.statetier import state_tier
    sidx = (F.when(F.col("role") == "user", 0)
            .when(F.col("role") == "assistant", 1)
            .otherwise(2).cast("int"))
    sraw = t.select("conv_id", F.unix_millis("ts").alias("ts_ms"),
                    sidx.alias("s"))
    sdec = (decode_blocks(blocks.where(F.col("channel") == "role_idx"))
            .select("conv_id", "ts_ms", F.col("v_long").cast("int")
                    .alias("s")))
    assert (_rows(state_tier(sdec, HOUR_MS, 3)
                  .withColumn("durs", F.col("durs").cast("string")))
            == _rows(state_tier(sraw, HOUR_MS, 3)
                     .withColumn("durs", F.col("durs").cast("string"))))
    for df in (t, raw, dec):
        df.unpersist()
