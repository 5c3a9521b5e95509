"""jobs/tiers_job.py end-to-end: against a run_pipeline warehouse the
job's written tier tables must equal direct operator builds over the
decoded points (guards the job's channel pivot and cascade wiring)."""
from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.autocorr import autocorr_tier
from gorilla_tsc_spark.operators.candle import candle_tier
from gorilla_tsc_spark.operators.exphist import exphist_tier
from gorilla_tsc_spark.operators.correlate import corr_tier
from gorilla_tsc_spark.operators.encode import (block_value_column,
                                                decode_blocks)
from gorilla_tsc_spark.operators.heartbeat import heartbeat_tier
from gorilla_tsc_spark.operators.histogram import histogram_tier
from gorilla_tsc_spark.operators.rate import rate_tier
from gorilla_tsc_spark.operators.rollup import HOUR_MS
from gorilla_tsc_spark.operators.statetier import state_tier
from gorilla_tsc_spark.operators.timeweight import twa_tier
from gorilla_tsc_spark.operators.trend import trend_tier
from gorilla_tsc_spark.pipeline import read_blocks, run_pipeline


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tiers_job_end_to_end(spark, tmp_path_factory, capsys, monkeypatch):
    from gorilla_tsc_spark.queries import _transcripts
    wh = str(tmp_path_factory.mktemp("wh"))
    out = str(tmp_path_factory.mktemp("tiers"))
    t = _transcripts(spark, "/root/testdata/sf0.001")
    from gorilla_tsc_spark.functions.channels import (Channel,
                                                      default_channels)
    run_pipeline(spark, t, wh, points_per_block=256,
                 channels=default_channels()
                 + [Channel("role_idx", "long", agg=False)])

    import jobs.tiers_job as job
    monkeypatch.setattr(sys, "argv", [
        "tiers_job.py", "--warehouse", wh, "--out", out, "--cores", "8",
        "--rate-channel", "len", "--hist-band", "24:4:16",
        "--state-channel", "role_idx", "--nstates", "3",
        "--candle-channel", "len", "--candle-vol-channel", "words",
        "--autocorr-channel", "len", "--exphist-nbins", "9",
        "--trend-channel", "len",
        "--smooth-halflife-ms", str(6 * HOUR_MS)])
    # the job ends with spark.stop(); it shares the pytest session via
    # getOrCreate, so neuter stop for the in-process invocation
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    job.main()
    counters = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counters["points_decoded"] > 0

    pts = (decode_blocks(read_blocks(spark, wh)
                         .where(F.col("channel").isin("len", "words",
                                                      "role_idx")))
           .select("conv_id", "channel", "ts_ms",
                   block_value_column().alias("v")).cache())
    xy = (pts.groupBy("conv_id", "ts_ms").pivot("channel", ["len", "words"])
          .agg(F.max("v"))
          .select("conv_id", "ts_ms", F.col("len").alias("x"),
                  F.col("words").alias("y")))
    lenpts = pts.where(F.col("channel") == "len")

    assert (_rows(spark.read.parquet(f"{out}/corr_fine"))
            == _rows(corr_tier(xy, HOUR_MS)))
    assert (_rows(spark.read.parquet(f"{out}/twa_fine"))
            == _rows(twa_tier(lenpts, HOUR_MS)))
    assert (_rows(spark.read.parquet(f"{out}/hb_fine"))
            == _rows(heartbeat_tier(lenpts.select("conv_id", "ts_ms"),
                                    HOUR_MS, 5 * 60_000)))
    # the rate family treats the gauge channel as a (chaotic) counter —
    # its algebra never assumes monotonicity, so the equality still pins
    # the job's wiring exactly
    assert (_rows(spark.read.parquet(f"{out}/rate_fine"))
            == _rows(rate_tier(lenpts, HOUR_MS)))
    assert (_rows(spark.read.parquet(f"{out}/hist_fine")
                  .withColumn("counts", F.col("counts").cast("string")))
            == _rows(histogram_tier(lenpts, HOUR_MS, 24.0, 4.0, 16)
                     .withColumn("counts", F.col("counts").cast("string"))))
    spts = (pts.where(F.col("channel") == "role_idx")
            .select("conv_id", "ts_ms", F.col("v").cast("int").alias("s")))
    assert (_rows(spark.read.parquet(f"{out}/state_fine")
                  .withColumn("durs", F.col("durs").cast("string")))
            == _rows(state_tier(spts, HOUR_MS, 3)
                     .withColumn("durs", F.col("durs").cast("string"))))
    cpts = (lenpts.select("conv_id", "ts_ms", "v")
            .join(pts.where(F.col("channel") == "words")
                  .select("conv_id", "ts_ms", F.col("v").alias("vol")),
                  ["conv_id", "ts_ms"], "left"))
    assert (_rows(spark.read.parquet(f"{out}/candle_fine"))
            == _rows(candle_tier(cpts, HOUR_MS, vol_col="vol")))
    assert (_rows(spark.read.parquet(f"{out}/autocorr_fine"))
            == _rows(autocorr_tier(lenpts, HOUR_MS)))
    assert (_rows(spark.read.parquet(f"{out}/exphist_fine")
                  .withColumn("counts", F.col("counts").cast("string")))
            == _rows(exphist_tier(lenpts, HOUR_MS, 9)
                     .withColumn("counts", F.col("counts").cast("string"))))
    assert (_rows(spark.read.parquet(f"{out}/trend_fine"))
            == _rows(trend_tier(lenpts, HOUR_MS)))
    from gorilla_tsc_spark.operators.rollup import rollup_points
    from gorilla_tsc_spark.operators.smoothing import ewma_serve, holt_serve
    want_smooth = holt_serve(
        ewma_serve(rollup_points(lenpts, HOUR_MS, F.col("v")), "vsum",
                   6 * HOUR_MS, var_col="ewma_var"),
        "vsum", 6 * HOUR_MS)
    assert (_rows(spark.read.parquet(f"{out}/smooth_fine"))
            == _rows(want_smooth))
    for name in ("corr_coarse", "twa_coarse", "hb_coarse", "rate_coarse",
                 "hist_coarse", "state_coarse", "candle_coarse",
                 "autocorr_coarse", "exphist_coarse", "trend_coarse"):
        assert counters[name] > 0

    # the job's output is SQL-addressable via register_tier_views, and
    # SQL over a view serves exactly the written table
    from gorilla_tsc_spark.pipeline import register_tier_views
    views = register_tier_views(spark, out)
    for name in ("tier_corr_fine", "tier_candle_coarse",
                 "tier_state_fine"):
        assert name in views
    assert (spark.sql("SELECT count(*) AS c FROM tier_candle_coarse")
            .first()["c"] == counters["candle_coarse"])
    pts.unpersist()
