"""Compression ratios on the reference's real-world datasets.

Replicates the reference's empirical headline gate
(``CompressTest.java:33-67,83,100`` and the Lossy32 sweep at
``CompressTest.java:248-292``): basel-temp / basel-wind-speed hourly
weather values (124,079 rows each, public data shipped as
``src/test/resources/*.csv.gz``), split into 1000-value blocks with the
partial tail block dropped, bits/value = total_bits / (blocks * 1000).

Because the repo's codecs are bit-exact against the compiled reference
(golden-vector suite), the numbers printed here ARE the reference's
numbers; tests/test_basel_ratios.py pins them as regression constants.

Usage: python tools/basel_ratios.py [--markdown]
"""
from __future__ import annotations

import csv
import gzip
import sys

import numpy as np

sys.path.insert(0, ".")

from gorilla_tsc_spark.codec.lossy import LossyCompressor32  # noqa: E402
from gorilla_tsc_spark.codec.valueonly import (Compressor32,  # noqa: E402
                                               Compressor64, Decompressor32)

BLOCK = 1_000
DATA = {
    "basel-temp": "/root/reference/src/test/resources/basel-temp.csv.gz",
    "basel-wind-speed":
        "/root/reference/src/test/resources/basel-wind-speed.csv.gz",
}


def blocks_of(path: str, blocksize: int = BLOCK):
    """1000-value blocks, partial tail dropped (TimeseriesFileReader)."""
    vals: list[float] = []
    with gzip.open(path, "rt") as f:
        for row in csv.reader(f):
            vals.append(float(row[2]))
            if len(vals) == blocksize:
                yield np.array(vals, dtype=np.float64)
                vals = []


def bits_per_value_64(path: str) -> float:
    total = blocks = 0
    for v in blocks_of(path):
        enc = Compressor64()
        enc.add_array(v.view(np.uint64))
        enc.close()
        total += enc.size
        blocks += 1
    return total / (blocks * BLOCK)


def bits_per_value_32(path: str) -> float:
    total = blocks = 0
    for v in blocks_of(path):
        enc = Compressor32()
        enc.add_array(v.astype(np.float32).view(np.uint32))
        enc.close()
        total += enc.size
        blocks += 1
    return total / (blocks * BLOCK)


def lossy32_sweep(path: str, logs=(-5, -3, 0, 3)):
    """(log_of_error → (bits/value, max_err)); asserts the ε bound."""
    out = {}
    for log in logs:
        total = blocks = 0
        max_err = 0.0
        for v in blocks_of(path):
            enc = LossyCompressor32(log)
            for x in v.astype(np.float32).tolist():
                enc.add_float(x)
            enc.close()
            total += enc.size
            blocks += 1
            got = Decompressor32(enc.out.to_bytes()).read_all()
            got = got.view(np.float32).astype(np.float64)
            err = float(np.max(np.abs(got - v.astype(np.float32)
                                      .astype(np.float64))))
            max_err = max(max_err, err)
        out[log] = (total / (blocks * BLOCK), max_err)
    return out


def pmc_sweep(path: str, logs=(-5, -3, 0, 3)):
    """PMC-MR: size = segments * 2 * 32 bits (CompressTest.java:359);
    timestamps run GLOBALLY across blocks like the reference's
    ``timestamp++`` counter."""
    from gorilla_tsc_spark.codec.lossy import pmc_mr_filter
    out = {}
    for log in logs:
        eps = 2.0 ** log
        total_bits = blocks = 0
        max_err = 0.0
        t0 = 0
        for v in blocks_of(path):
            ts = np.arange(t0, t0 + len(v), dtype=np.int64)
            t0 += len(v)
            segs = pmc_mr_filter(ts, v.astype(np.float32), eps)
            total_bits += len(segs) * 2 * 32
            blocks += 1
            recon = np.concatenate([
                np.full(s.t1 - s.t0 + 1, np.float32(s.value), np.float64)
                for s in segs])
            max_err = max(max_err, float(np.max(np.abs(recon - v))))
        assert max_err <= eps, (path, log, max_err, eps)
        out[log] = (total_bits / (blocks * BLOCK), max_err)
    return out


def swing_sweep(path: str, logs=(-5, -3, 0, 3)):
    """Swing: size = segments * 3 * 32 bits (CompressTest.java:439);
    reconstruction evaluates float32(a*t + b) like LinearFunction."""
    from gorilla_tsc_spark.codec.lossy import swing_filter
    out = {}
    for log in logs:
        eps = 2.0 ** log
        total_bits = blocks = 0
        max_err = 0.0
        t0 = 0
        for v in blocks_of(path):
            ts = np.arange(t0, t0 + len(v), dtype=np.int64)
            t0 += len(v)
            segs = swing_filter(ts, v.astype(np.float32), eps)
            total_bits += len(segs) * 3 * 32
            blocks += 1
            recon = np.concatenate([
                (np.float64(s.line.a) * np.arange(s.t0, s.t1 + 1)
                 + np.float64(s.line.b)).astype(np.float32).astype(np.float64)
                for s in segs])
            max_err = max(max_err, float(np.max(np.abs(recon - v))))
        assert max_err <= eps, (path, log, max_err, eps)
        out[log] = (total_bits / (blocks * BLOCK), max_err)
    return out


def main(markdown: bool = False):
    rows = []
    for name, path in DATA.items():
        r64 = bits_per_value_64(path)
        r32 = bits_per_value_32(path)
        rows.append((name, "gorilla-v1-64", f"{r64:.2f}", ""))
        rows.append((name, "gorilla-32", f"{r32:.2f}", ""))
        for log, (bpv, err) in lossy32_sweep(path).items():
            eps = 2.0 ** log
            assert err <= eps, (name, log, err, eps)
            rows.append((name, f"lossy32(2^{log})", f"{bpv:.2f}",
                         f"max_err={err:.3g} ≤ {eps:.3g}"))
        for codec, sweep in (("pmc-mr", pmc_sweep), ("swing", swing_sweep)):
            for log, (bpv, err) in sweep(path).items():
                rows.append((name, f"{codec}(2^{log})", f"{bpv:.2f}",
                             f"max_err={err:.3g} ≤ {2.0 ** log:.3g}"))
    if markdown:
        print("| dataset | codec | bits/value | bound |")
        print("|---|---|---|---|")
        for r in rows:
            print("| " + " | ".join(r) + " |")
    else:
        for r in rows:
            print("\t".join(r))


if __name__ == "__main__":
    main(markdown="--markdown" in sys.argv)
