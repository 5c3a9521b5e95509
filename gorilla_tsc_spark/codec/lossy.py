"""Lossy codecs: quantized Gorilla-32, PMC-MR piecewise-constant and the
Swing piecewise-linear filter, plus their segment reconstructors.

Replicates the reference fork's behavior exactly, including latent quirks:
- LossyCompressor32.java:90-96 quantization uses Java's shift-count-mod-32
  arithmetic shifts and the literal expression ``2^space - 1`` where ``^``
  is XOR (an upstream bug kept for bit identity; documented here).
- LossyCompressor32.java:124 counts new-leading cases by += 2.
- PmcMR.java:15-16 initializes max/min to Float.MIN_VALUE/MAX_VALUE (the
  smallest positive normal, not -inf) — only visible on the first point,
  where the null-segment branch hides it.
- SwingFilter's LinearFunction slope is computed in float32 then widened
  (LinearFunction.java:20-23: float numerator / long denominator → float).
- segment reconstruction assumes unit-spaced integer timestamps
  (DecompressorPmcMr.java:32-47, DecompressorSwingFilter.java:32-48).

All float arithmetic runs in np.float32 where Java uses float.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bits import BitWriter

_U32 = (1 << 32) - 1
_NAN_INT = 0x7FC00000

_F32_TINY = float(np.finfo(np.float32).tiny)  # Float.MIN_VALUE
_F32_MAX = float(np.finfo(np.float32).max)    # Float.MAX_VALUE


def _i32(x: int) -> int:
    return ((x + (1 << 31)) & _U32) - (1 << 31)


def _f32(bits: int) -> np.float32:
    return np.uint32(bits & _U32).view(np.float32)


def _bits32(v) -> int:
    return int(np.float32(v).view(np.uint32))


class LossyCompressor32:
    """LossyCompressor32.java:25-187 — Gorilla-32 with mantissa truncation."""

    def __init__(self, log_of_error: int) -> None:
        self.log = log_of_error
        self.eps = 2.0 ** log_of_error  # Math.pow → double
        self.out = BitWriter()
        self.stored_val = 0
        self.first = True
        self.slz = 1 << 30
        self.stz = 0
        self.size = 0
        self.cases = [0, 0, 0]
        self.leading_diff = 0.0
        self.trailing_diff = 0.0

    def add_bits(self, value: int) -> None:
        value &= _U32
        if self.first:
            self.first = False
            self.stored_val = value
            self.out.write(value, 32)
            self.size += 32
            return
        self._compress(value)

    def add_float(self, value: float) -> None:
        self.add_bits(_bits32(value))

    def _compress(self, value: int) -> None:
        out = self.out
        # float32 subtraction, double comparison (Java float widened)
        diff = abs(float(_f32(value)) - float(_f32(self.stored_val)))
        if diff < self.eps:  # NaN compares false → terminator survives
            self.cases[0] += 1
            out.skip_bit()
            self.size += 1
            return
        integer_digits = (_i32(value << 1) & _U32) >> 24
        integer_digits -= 127
        space = 23 + self.log - integer_digits
        if space > 0:
            s = space & 31  # Java int shift uses count mod 32
            value = _i32((_i32(value) >> s) << s)
            # Java parses "2^space - 1" as 2 XOR (space-1): '-' binds tighter
            value = _i32(value | (self.stored_val & _i32(2 ^ (space - 1)))) & _U32
        xor = (self.stored_val ^ value) & _U32
        if xor == 0:
            self.cases[0] += 1
            out.skip_bit()
            self.size += 1
        else:
            lz = 32 - xor.bit_length()
            tz = (xor & -xor).bit_length() - 1
            if lz >= 16:
                lz = 15
            out.write_bit()
            self.size += 1
            if lz >= self.slz and tz >= self.stz:
                self.cases[1] += 1
                self.trailing_diff += tz - self.stz
                self.leading_diff += lz - self.slz
                sig = 32 - self.slz - self.stz
                out.skip_bit()
                out.write(xor >> self.stz, sig)
                self.size += 1 + sig
            else:
                self.cases[2] += 2  # reference counts these by two
                sig = 32 - lz - tz
                out.write_bit()
                out.write(lz, 4)
                out.write(0 if sig == 32 else sig, 5)
                out.write(xor >> tz, sig)
                self.slz, self.stz = lz, tz
                self.size += 1 + 4 + 5 + sig
        self.stored_val = value & _U32

    def close(self) -> None:
        self.add_bits(_NAN_INT)
        self.out.skip_bit()

    def long_array(self, flushed: bool = True) -> list[int]:
        return self.out.long_array(flushed=flushed)


@dataclass
class Constant:
    """PmcMR.Constant (PmcMR.java:50-85)."""
    t0: int
    t1: int
    value_bits: int  # float32 bits

    @property
    def value(self) -> np.float32:
        return _f32(self.value_bits)


def pmc_mr_filter(ts: np.ndarray, values_f32: np.ndarray, epsilon: float) -> list[Constant]:
    """PmcMR.filter (PmcMR.java:10-48): greedy midrange segments."""
    eps = np.float32(epsilon)
    vmax = np.float32(_F32_TINY)
    vmin = np.float32(_F32_MAX)
    segs: list[Constant] = []
    cur: Constant | None = None
    for t, v in zip(np.asarray(ts, dtype=np.int64).tolist(),
                    np.asarray(values_f32, dtype=np.float32).tolist()):
        t = int(t)
        v = np.float32(v)
        if v > vmax:
            vmax = v
        if v < vmin:
            vmin = v
        if (vmax - vmin) <= eps and cur is not None:
            cur.t1 = t
            cur.value_bits = _bits32(vmax - (vmax - vmin) / np.float32(2))
        else:
            if cur is not None:
                segs.append(cur)
            vmax = v
            vmin = v
            cur = Constant(t, t, _bits32(v))
    if cur is not None:
        segs.append(cur)
    return segs


class LinearFunction:
    """LinearFunction.java:17-37 — slope in float32, stored as double."""

    __slots__ = ("a", "b")

    def __init__(self, ts: int, vs: np.float32, te: int, ve: np.float32) -> None:
        # Java: (ve - vs) / (te - ts) is float arithmetic (long → float)
        self.a = float(np.float32(np.float32(ve) - np.float32(vs)) / np.float32(te - ts))
        self.b = float(np.float32(vs)) - self.a * ts

    def get(self, ts: int) -> np.float32:
        return np.float32(self.a * ts + self.b)


@dataclass
class SwingSegment:
    """SwingFilter.SwingSegment (SwingFilter.java:62-91)."""
    t0: int
    t1: int
    line: LinearFunction


def swing_filter(ts: np.ndarray, values_f32: np.ndarray, epsilon: float) -> list[SwingSegment]:
    """SwingFilter.filter (SwingFilter.java:11-59)."""
    eps = np.float32(epsilon)
    segs: list[SwingSegment] = []
    first_t = first_v = None
    ui = li = None
    last_t = last_v = None
    for t, v in zip(np.asarray(ts, dtype=np.int64).tolist(),
                    np.asarray(values_f32, dtype=np.float32).tolist()):
        t = int(t)
        v = np.float32(v)
        last_t, last_v = t, v
        if first_t is None:
            first_t, first_v = t, v
            continue
        if ui is not None and li is not None and (ui.get(t) < v or li.get(t) > v):
            line = LinearFunction(first_t, first_v, t, (ui.get(t) + li.get(t)) / np.float32(2))
            segs.append(SwingSegment(first_t, t - 1, line))
            ui = li = None
            first_t, first_v = t, v
        else:
            ui_new = LinearFunction(first_t, first_v, t, v + eps)
            li_new = LinearFunction(first_t, first_v, t, v - eps)
            if ui is None or ui.get(t) > ui_new.get(t):
                ui = ui_new
            if li is None or li.get(t) < li_new.get(t):
                li = li_new
    if ui is not None and li is not None:
        line = LinearFunction(first_t, first_v, last_t, (ui.get(last_t) + li.get(last_t)) / np.float32(2))
        segs.append(SwingSegment(first_t, last_t, line))
    elif first_t is not None:
        line = LinearFunction(first_t, first_v, first_t + 1, first_v)
        segs.append(SwingSegment(first_t, first_t, line))
    return segs


def reconstruct_pmc(segs: list[Constant]) -> np.ndarray:
    """DecompressorPmcMr.java:32-47 — one value per unit timestamp offset."""
    out: list[float] = []
    for s in segs:
        out.extend([float(s.value)] * (s.t1 - s.t0 + 1))
    return np.array(out, dtype=np.float32)


def reconstruct_swing(segs: list[SwingSegment]) -> np.ndarray:
    """DecompressorSwingFilter.java:32-48."""
    out: list[float] = []
    for s in segs:
        for off in range(s.t1 - s.t0 + 1):
            out.append(float(s.line.get(s.t0 + off)))
    return np.array(out, dtype=np.float32)
