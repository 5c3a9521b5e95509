"""Bit-level I/O with the exact semantics of the reference sinks/sources.

The write side collects (value, width) fields and packs them into 64-bit
words in one vectorized NumPy pass — MSB-first within each word, identical
bit layout to the reference's on-heap long-array sink
(/root/reference/src/main/java/fi/iki/yak/ts/compression/gorilla/LongArrayOutput.java:115-131).
``long_array`` reproduces the reference's snapshot semantics including the
trailing in-progress word (LongArrayOutput.java:141-145): after ``flush``
one extra all-zero word is appended (two when the stream ended exactly on
a word boundary, because flush pushes a fresh empty word).

The read side mirrors LongArrayInput.java:55-91 (``get_long`` one/two-word
paths, ``next_clear_bit`` unary prefix reader).
"""
from __future__ import annotations

import numpy as np

U64 = (1 << 64) - 1

# popcount lookup for exact vectorized clz/ctz (no float log2 — boundary-exact)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Exact per-element popcount of a uint64 array."""
    b = x.astype(np.uint64).reshape(-1).view(np.uint8)
    return _POP8[b].reshape(-1, 8).sum(axis=1).astype(np.int64)


def clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of each uint64 (64 for 0), exact."""
    v = x.astype(np.uint64).copy()
    for s in (1, 2, 4, 8, 16, 32):
        v |= v >> np.uint64(s)
    return 64 - popcount64(v)


def ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of each uint64 (64 for 0), exact."""
    x = x.astype(np.uint64)
    low = x & (~x + np.uint64(1))  # isolate lowest set bit (two's complement)
    return np.where(x == 0, 64, popcount64(low - np.uint64(1))).astype(np.int64)


class BitWriter:
    """Append-only bit stream as (value, width) fields; vectorized packing."""

    __slots__ = ("vals", "widths", "total_bits")

    def __init__(self) -> None:
        self.vals: list[int] = []
        self.widths: list[int] = []
        self.total_bits = 0

    def write(self, value: int, bits: int) -> None:
        self.vals.append(value & U64)
        self.widths.append(bits)
        self.total_bits += bits

    def write_bit(self) -> None:
        self.write(1, 1)

    def skip_bit(self) -> None:
        self.write(0, 1)

    def extend(self, vals: list[int], widths: list[int]) -> None:
        self.vals.extend(vals)
        self.widths.extend(widths)
        self.total_bits += sum(widths)

    def pack_words(self) -> np.ndarray:
        """Pack fields MSB-first into uint64 words (no trailing-word padding)."""
        total = self.total_bits
        nwords = (total + 63) // 64
        if not self.vals:
            return np.zeros(0, dtype=np.uint64)
        vals = np.array(self.vals, dtype=np.uint64)
        widths = np.array(self.widths, dtype=np.int64)
        ends = np.cumsum(widths)
        starts = ends - widths
        # mask values to their declared width (width 64 needs the full mask)
        wmod = np.where(widths == 64, 0, widths).astype(np.uint64)
        mask = np.where(widths == 64, np.uint64(U64), (np.uint64(1) << wmod) - np.uint64(1))
        vals &= mask
        word = (starts >> 6).astype(np.int64)
        avail = 64 - (starts & 63)
        shift = avail - widths  # >=0: fits this word; <0: spans into next
        lsh = np.maximum(shift, 0).astype(np.uint64)
        rsh = np.maximum(-shift, 0).astype(np.uint64)
        part1 = np.where(shift >= 0, vals << lsh, vals >> rsh)
        buf = np.zeros(nwords + 1, dtype=np.uint64)
        np.bitwise_or.at(buf, word, part1)
        spans = shift < 0
        if spans.any():
            rem = rsh[spans]  # bits that go into the next word, 1..63
            part2 = vals[spans] << (np.uint64(64) - rem)
            np.bitwise_or.at(buf, word[spans] + 1, part2)
        return buf[:nwords]

    def long_array(self, flushed: bool = True) -> list[int]:
        """Words exactly as the reference's ``getLongArray()`` returns them."""
        words = self.pack_words().tolist()
        boundary = self.total_bits % 64 == 0
        if flushed:
            words.append(0)
            if boundary:
                words.append(0)
        elif boundary:
            words.append(0)
        return words

    def to_bytes(self) -> bytes:
        """Big-endian byte view of the exact data bits (no trailing word)."""
        nbytes = (self.total_bits + 7) // 8
        return self.pack_words().byteswap().tobytes()[:nbytes]


class BitReader:
    """Bit reader over 64-bit words (list of Python ints or uint64 array)."""

    __slots__ = ("words", "pos", "cur", "bits_left")

    def __init__(self, words) -> None:
        if isinstance(words, np.ndarray):
            words = words.astype(np.uint64).tolist()
        elif isinstance(words, (bytes, bytearray)):
            pad = (-len(words)) % 8
            arr = np.frombuffer(bytes(words) + b"\x00" * pad, dtype=np.uint64)
            words = arr.byteswap().tolist()
        self.words = [w & U64 for w in words]
        self.pos = 0
        self.cur = self.words[0]
        self.pos = 1
        self.bits_left = 64

    def read_bit(self) -> int:
        bit = (self.cur >> (self.bits_left - 1)) & 1
        self.bits_left -= 1
        if self.bits_left == 0:
            self.cur = self.words[self.pos]
            self.pos += 1
            self.bits_left = 64
        return bit

    def get_long(self, bits: int) -> int:
        if bits <= self.bits_left:
            value = (self.cur >> (self.bits_left - bits)) & ((1 << bits) - 1)
            self.bits_left -= bits
            if self.bits_left == 0:
                self.cur = self.words[self.pos]
                self.pos += 1
                self.bits_left = 64
        else:
            value = self.cur & ((1 << self.bits_left) - 1)
            bits -= self.bits_left
            self.cur = self.words[self.pos]
            self.pos += 1
            self.bits_left = 64
            value = (value << bits) | (self.cur >> (64 - bits))
            self.bits_left -= bits
        return value

    def next_clear_bit(self, max_bits: int) -> int:
        val = 0
        for _ in range(max_bits):
            val <<= 1
            if self.read_bit():
                val |= 1
            else:
                break
        return val
