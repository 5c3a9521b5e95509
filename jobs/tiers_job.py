"""spark-submit entry point building the tier families from a
block-store warehouse: cross-channel correlation, time-weighted
average, heartbeat/uptime, (optionally) counter rate, (optionally)
a fixed-bin histogram, (optionally) state-duration, (optionally)
an OHLCV candle, (optionally) a lag-1 autocorrelation tier,
(optionally) an exponential histogram, and (optionally) a linear-trend
tier — each at a fine grain plus one cascaded coarse grain, written as
parquet tier tables under --out.

Decode happens ONCE (all families share the exploded points),
optionally narrowed to the channels actually used; every downstream
step is tier-sized.  Prints one JSON line of per-tier row counters.

Usage (cluster):
    spark-submit --py-files engine.zip jobs/tiers_job.py \\
        --warehouse s3://lake/gorilla --out s3://lake/gorilla_tiers \\
        [--x-channel len --y-channel words] [--twa-channel len] \\
        [--rate-channel bytes_total] \\
        [--hist-band 24:4:16]  # lo:width:nbins over the twa channel \\
        [--state-channel phase --nstates 4] \\
        [--candle-channel len [--candle-vol-channel words]] \\
        [--autocorr-channel len] [--exphist-nbins 12] \\
        [--trend-channel len] [--smooth-halflife-ms 21600000] \\
        [--hb-ms 300000] [--bucket-ms 3600000] [--coarse-ms 86400000]

Usage (sandbox):
    python jobs/tiers_job.py --warehouse /tmp/wh --out /tmp/tiers
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--x-channel", default="len")
    ap.add_argument("--y-channel", default="words")
    ap.add_argument("--twa-channel", default="len")
    ap.add_argument("--rate-channel", default=None,
                    help="counter channel for the rate tier; omitted "
                         "= skip the rate family (gauges don't have a "
                         "natural counter)")
    ap.add_argument("--hist-band", default=None,
                    help="lo:width:nbins — value band for the fixed-bin "
                         "histogram tier over the twa channel; omitted "
                         "= skip the histogram family")
    ap.add_argument("--state-channel", default=None,
                    help="channel carrying small integer state codes "
                         "in [0, nstates); omitted = skip the "
                         "state-duration family")
    ap.add_argument("--nstates", type=int, default=None,
                    help="declared state-domain size for "
                         "--state-channel")
    ap.add_argument("--candle-channel", default=None,
                    help="price channel for the OHLCV candle tier; "
                         "omitted = skip the candle family")
    ap.add_argument("--candle-vol-channel", default=None,
                    help="optional volume channel riding along the "
                         "candle tier (adds vol/pvsum → exact VWAP)")
    ap.add_argument("--autocorr-channel", default=None,
                    help="channel for the lag-1 autocorrelation tier; "
                         "omitted = skip the autocorr family")
    ap.add_argument("--trend-channel", default=None,
                    help="gauge channel for the linear-trend (OLS "
                         "drift) tier; omitted = skip the trend family")
    ap.add_argument("--smooth-halflife-ms", type=int, default=None,
                    help="half-life for an EWMA+Holt smoothed serve "
                         "table over the twa channel's fine rollup; "
                         "omitted = skip the smoothing serve")
    ap.add_argument("--exphist-nbins", type=int, default=None,
                    help="power-of-two bucket count for the exponential "
                         "histogram over the twa channel (band "
                         "[1, 2^nbins)); omitted = skip the family")
    ap.add_argument("--hb-ms", type=int, default=5 * 60_000)
    ap.add_argument("--bucket-ms", type=int, default=3_600_000)
    ap.add_argument("--coarse-ms", type=int, default=86_400_000)
    ap.add_argument("--predictor", default=None,
                    help="store's encode-time predictor; must match")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if args.x_channel == args.y_channel:
        ap.error("--x-channel and --y-channel must differ (the corr "
                 "tier pivots both out of one channel column; equal "
                 "names would yield an ambiguous duplicate column)")
    if args.candle_vol_channel and not args.candle_channel:
        ap.error("--candle-vol-channel requires --candle-channel")
    if bool(args.state_channel) != bool(args.nstates):
        ap.error("--state-channel and --nstates go together (the state "
                 "domain is a declaration, not something to infer)")
    if args.nstates is not None and args.nstates <= 0:
        ap.error("--nstates must be positive")
    hist_band = None
    if args.hist_band:
        try:
            lo_s, w_s, nb_s = args.hist_band.split(":")
            hist_band = (float(lo_s), float(w_s), int(nb_s))
            if hist_band[1] <= 0 or hist_band[2] <= 0:
                raise ValueError
        except ValueError:
            ap.error("--hist-band must be lo:width:nbins with width > 0 "
                     "and nbins > 0 (e.g. 24:4:16)")

    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.correlate import (cascade_corr_tier,
                                                       corr_tier)
    from gorilla_tsc_spark.operators.encode import (block_value_column,
                                                    decode_blocks)
    from gorilla_tsc_spark.operators.heartbeat import (
        cascade_heartbeat_tier, heartbeat_tier)
    from gorilla_tsc_spark.operators.timeweight import (cascade_twa_tier,
                                                        twa_tier)
    from gorilla_tsc_spark.pipeline import read_blocks
    from gorilla_tsc_spark.session import get_spark

    spark = get_spark("tiers-job", cores=args.cores)
    chans = {args.x_channel, args.y_channel, args.twa_channel}
    if args.rate_channel:
        chans.add(args.rate_channel)
    if args.state_channel:
        chans.add(args.state_channel)
    if args.candle_channel:
        chans.add(args.candle_channel)
    if args.candle_vol_channel:
        chans.add(args.candle_vol_channel)
    if args.autocorr_channel:
        chans.add(args.autocorr_channel)
    if args.trend_channel:
        chans.add(args.trend_channel)
    blocks = read_blocks(spark, args.warehouse).where(
        F.col("channel").isin(*chans))
    pts = (decode_blocks(blocks, args.predictor)
           .select("conv_id", "channel", "ts_ms",
                   block_value_column().alias("v"))
           .persist())

    counters: dict[str, int] = {"points_decoded": pts.count()}

    def write(name: str, df) -> None:
        path = os.path.join(args.out, name)
        df.write.mode("overwrite").parquet(path)
        counters[name] = spark.read.parquet(path).count()

    # correlation: pivot the two channels to per-turn (x, y) pairs.
    # max() (not first()) keeps the pairing deterministic if two turns
    # ever share (conv_id, ts_ms) — first() is partition-order-dependent
    xy = (pts.where(F.col("channel").isin(args.x_channel, args.y_channel))
          .groupBy("conv_id", "ts_ms").pivot(
              "channel", [args.x_channel, args.y_channel]).agg(F.max("v"))
          .select("conv_id", "ts_ms",
                  F.col(args.x_channel).alias("x"),
                  F.col(args.y_channel).alias("y")))
    corr_fine = corr_tier(xy, args.bucket_ms)
    write("corr_fine", corr_fine)
    write("corr_coarse", cascade_corr_tier(
        spark.read.parquet(os.path.join(args.out, "corr_fine")),
        args.bucket_ms, args.coarse_ms))

    # time-weighted average over the chosen channel
    twa_pts = pts.where(F.col("channel") == args.twa_channel)
    write("twa_fine", twa_tier(twa_pts, args.bucket_ms))
    write("twa_coarse", cascade_twa_tier(
        spark.read.parquet(os.path.join(args.out, "twa_fine")),
        args.bucket_ms, args.coarse_ms))

    # heartbeat/uptime over the turn timestamps (any one channel's
    # points carry every turn's ts; pick the twa channel)
    write("hb_fine", heartbeat_tier(twa_pts.select("conv_id", "ts_ms"),
                                    args.bucket_ms, args.hb_ms))
    write("hb_coarse", cascade_heartbeat_tier(
        spark.read.parquet(os.path.join(args.out, "hb_fine")),
        args.bucket_ms, args.coarse_ms, args.hb_ms))

    # counter rate over a monotone-counter channel, when the store has
    # one (reset-corrected increase/resets per bucket)
    if args.rate_channel:
        from gorilla_tsc_spark.operators.rate import (cascade_rate_tier,
                                                      rate_tier)
        rate_pts = pts.where(F.col("channel") == args.rate_channel)
        write("rate_fine", rate_tier(rate_pts, args.bucket_ms))
        write("rate_coarse", cascade_rate_tier(
            spark.read.parquet(os.path.join(args.out, "rate_fine")),
            args.bucket_ms, args.coarse_ms))

    # fixed-bin histogram over the twa channel, when a band is declared
    # (the band is an operator decision — an SLO threshold grid, a
    # latency budget — not something to infer from data)
    if hist_band:
        from gorilla_tsc_spark.operators.histogram import (cascade_hist_tier,
                                                           histogram_tier)
        lo, w, nb = hist_band
        write("hist_fine", histogram_tier(twa_pts, args.bucket_ms,
                                          lo, w, nb))
        write("hist_coarse", cascade_hist_tier(
            spark.read.parquet(os.path.join(args.out, "hist_fine")),
            args.bucket_ms, args.coarse_ms, nb))

    # state-duration over a declared small state domain, when the store
    # carries a state-code channel (LOCF time-in-state per bucket)
    if args.state_channel:
        from gorilla_tsc_spark.operators.statetier import (
            cascade_state_tier, state_tier)
        spts = (pts.where(F.col("channel") == args.state_channel)
                .select("conv_id", "ts_ms",
                        F.col("v").cast("int").alias("s")))
        write("state_fine", state_tier(spts, args.bucket_ms,
                                       args.nstates))
        write("state_coarse", cascade_state_tier(
            spark.read.parquet(os.path.join(args.out, "state_fine")),
            args.bucket_ms, args.coarse_ms, args.nstates))

    # OHLCV candle over a declared price (and optional volume) channel
    if args.candle_channel:
        from gorilla_tsc_spark.operators.candle import (candle_tier,
                                                        cascade_candle_tier)
        cpts = pts.where(F.col("channel") == args.candle_channel)
        if args.candle_vol_channel:
            volp = (pts.where(F.col("channel") == args.candle_vol_channel)
                    .select("conv_id", "ts_ms", F.col("v").alias("vol")))
            cpts = (cpts.select("conv_id", "ts_ms", "v")
                    .join(volp, ["conv_id", "ts_ms"], "left"))
            write("candle_fine", candle_tier(cpts, args.bucket_ms,
                                             vol_col="vol"))
        else:
            write("candle_fine", candle_tier(cpts, args.bucket_ms))
        write("candle_coarse", cascade_candle_tier(
            spark.read.parquet(os.path.join(args.out, "candle_fine")),
            args.bucket_ms, args.coarse_ms))

    # exponential histogram over the twa channel, when a bucket count
    # is declared (band [1, 2^nbins) — the unbounded-range complement
    # to --hist-band's fixed linear band)
    if args.exphist_nbins:
        from gorilla_tsc_spark.operators.exphist import (
            cascade_exphist_tier, exphist_tier)
        write("exphist_fine", exphist_tier(twa_pts, args.bucket_ms,
                                           args.exphist_nbins))
        write("exphist_coarse", cascade_exphist_tier(
            spark.read.parquet(os.path.join(args.out, "exphist_fine")),
            args.bucket_ms, args.coarse_ms, args.exphist_nbins))

    # lag-1 autocorrelation (smoothness/compressibility regime) over a
    # declared channel, when requested
    if args.autocorr_channel:
        from gorilla_tsc_spark.operators.autocorr import (
            autocorr_tier, cascade_autocorr_tier)
        apts = pts.where(F.col("channel") == args.autocorr_channel)
        write("autocorr_fine", autocorr_tier(apts, args.bucket_ms))
        write("autocorr_coarse", cascade_autocorr_tier(
            spark.read.parquet(os.path.join(args.out, "autocorr_fine")),
            args.bucket_ms, args.coarse_ms))

    # EWMA + Holt smoothed serve over the twa channel's fine numeric
    # rollup, when a half-life is declared (serve-time transform, not
    # a family: order-dependent, so it materializes as its own table)
    if args.smooth_halflife_ms:
        from gorilla_tsc_spark.operators.rollup import rollup_points
        from gorilla_tsc_spark.operators.smoothing import (ewma_serve,
                                                           holt_serve)
        t_fine = rollup_points(twa_pts, args.bucket_ms, F.col("v"))
        write("smooth_fine", holt_serve(
            ewma_serve(t_fine, "vsum", args.smooth_halflife_ms,
                       var_col="ewma_var"),
            "vsum", args.smooth_halflife_ms))

    # linear trend (per-bucket OLS drift) over a declared gauge
    # channel, when requested
    if args.trend_channel:
        from gorilla_tsc_spark.operators.trend import (cascade_trend_tier,
                                                       trend_tier)
        tpts = pts.where(F.col("channel") == args.trend_channel)
        write("trend_fine", trend_tier(tpts, args.bucket_ms))
        write("trend_coarse", cascade_trend_tier(
            spark.read.parquet(os.path.join(args.out, "trend_fine")),
            args.bucket_ms, args.coarse_ms))

    pts.unpersist()
    print(json.dumps(counters))
    spark.stop()


if __name__ == "__main__":
    main()
