"""Value-only (v1/32-bit) and Lossy32 operators over the events table."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.lossy_ops import lossy32_bound
from gorilla_tsc_spark.operators.valueonly_ops import (decode_valueonly,
                                                       encode_valueonly)

SF = "/root/testdata/sf0.001"


def test_v1_roundtrip_exact(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    dec = decode_valueonly(encode_valueonly(ev, 64), 64)
    got = {(r.series, r.idx): r.v for r in dec.collect()}
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {(f"u{r.user_id}", r.i - 1): r.value for r in ev.select(
        "user_id", "value", F.row_number().over(w).alias("i")).collect()}
    assert got == want


def test_lossy32_error_bounded(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = lossy32_bound(ev, log_of_error=-3).collect()
    assert rows
    for r in rows:
        assert r.max_err <= r.eps + 1e-9, (r.series, r.max_err, r.eps)
        assert 0 < r.bits_per_value <= 40
