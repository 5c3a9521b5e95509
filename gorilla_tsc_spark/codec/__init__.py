"""Bit-exact Gorilla codec kernels (pure Python/NumPy, no Spark imports).

Byte-identity with the reference (panagiotisl/gorilla-tsc) is pinned by
tests/fixtures/*.json.gz, generated from the reference itself.
"""
from .bits import BitReader, BitWriter, clz64, ctz64, popcount64
from .gorilla import (
    DifferentialFCM,
    GorillaDecoder,
    GorillaEncoder,
    LastValuePredictor,
    encode_block,
)
from .lossy import (
    Constant,
    LinearFunction,
    LossyCompressor32,
    SwingSegment,
    pmc_mr_filter,
    reconstruct_pmc,
    reconstruct_swing,
    swing_filter,
)
from .valueonly import (
    Compressor32,
    Compressor64,
    Decompressor32,
    Decompressor64,
)

__all__ = [
    "BitReader", "BitWriter", "clz64", "ctz64", "popcount64",
    "GorillaEncoder", "GorillaDecoder", "encode_block",
    "LastValuePredictor", "DifferentialFCM",
    "Compressor64", "Decompressor64", "Compressor32", "Decompressor32",
    "LossyCompressor32", "pmc_mr_filter", "swing_filter",
    "Constant", "SwingSegment", "LinearFunction",
    "reconstruct_pmc", "reconstruct_swing",
]
