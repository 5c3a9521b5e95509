"""v1 (64-bit) and 32-bit value-only Gorilla codecs as Spark operators.

The reference fork's ``Compressor``/``Compressor32`` strip timestamps
entirely and terminate the stream with a canonical NaN
(Compressor.java:63-67, Compressor32.java:133-137) — so these channels
cannot store NaN payloads (SURVEY.md §1.2). The engine exposes them as
per-series value-stream blocks: order is pinned by (ts, event_id) at
encode time and reproduced as an explicit ``idx`` on decode, which is
what makes the round trip SQL-checkable against a row_number() oracle.

One shuffle keyed by series; blocks are tiny rows; decode is narrow.
"""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codec.valueonly import (Compressor32, Compressor64, Decompressor32,
                               Decompressor64)

V1_BLOCKS_SCHEMA = T.StructType([
    T.StructField("series", T.StringType()),
    T.StructField("word", T.IntegerType()),
    T.StructField("n_points", T.IntegerType()),
    T.StructField("n_bits", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("crc", T.LongType()),
])

V1_POINTS_SCHEMA = T.StructType([
    T.StructField("series", T.StringType()),
    T.StructField("idx", T.LongType()),
    T.StructField("v", T.DoubleType()),
])

V32_POINTS_SCHEMA = T.StructType([
    T.StructField("series", T.StringType()),
    T.StructField("idx", T.LongType()),
    T.StructField("v", T.FloatType()),
])


def _series_values(events: DataFrame) -> DataFrame:
    return events.select(
        F.concat(F.lit("u"), F.col("user_id")).alias("series"),
        F.col("ts"), F.col("event_id"), F.col("value"))


def _encode_kernel(word: int):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        enc = Compressor64() if word == 64 else Compressor32()
        vals = pdf["value"].to_numpy(np.float64)
        if word == 64:
            for b in vals.view(np.uint64).tolist():
                enc.add_bits(b)
        else:
            for b in vals.astype(np.float32).view(np.uint32).tolist():
                enc.add_bits(b)
        enc.close()
        payload = enc.to_bytes()
        return pd.DataFrame([(pdf["series"].iloc[0], word, enc.n_points,
                              enc.out.total_bits, payload, zlib.crc32(payload))],
                            columns=[f.name for f in V1_BLOCKS_SCHEMA.fields])
    return kernel


def encode_valueonly(events: DataFrame, word: int = 64) -> DataFrame:
    """events → one value-only block per user series (v1 format)."""
    assert word in (64, 32)
    return _series_values(events).groupBy("series").applyInPandas(
        _encode_kernel(word), schema=V1_BLOCKS_SCHEMA)


def _decode_iter(pdf_iter, word: int):
    for pdf in pdf_iter:
        rows_s, rows_i, rows_v = [], [], []
        for r in pdf.itertuples(index=False):
            dec = (Decompressor64 if word == 64 else Decompressor32)(
                bytes(r.payload))
            vals = dec.read_all()
            v = vals.view(np.float64 if word == 64 else np.float32)
            rows_s.append(np.repeat(r.series, len(v)))
            rows_i.append(np.arange(len(v), dtype=np.int64))
            rows_v.append(v)
        if not rows_s:
            continue
        yield pd.DataFrame({
            "series": np.concatenate(rows_s),
            "idx": np.concatenate(rows_i),
            "v": np.concatenate(rows_v),
        })


def decode_valueonly(blocks: DataFrame, word: int = 64) -> DataFrame:
    schema = V1_POINTS_SCHEMA if word == 64 else V32_POINTS_SCHEMA
    return blocks.select("series", "payload").mapInPandas(
        lambda it: _decode_iter(it, word), schema=schema)
