"""Pin compression ratios on the reference's real-world datasets.

The full table lives in BENCH/BASEL.md (tools/basel_ratios.py); this
test pins a representative subset as exact regression constants — the
codecs are deterministic, so any drift is a codec change, not noise.
Procedure per the reference CompressTest (1000-value blocks, partial
tail dropped); see tools/basel_ratios.py for file:line citations.
"""
import os

import pytest

from tools.basel_ratios import (DATA, bits_per_value_32, bits_per_value_64,
                                lossy32_sweep, pmc_sweep, swing_sweep)

TEMP = DATA["basel-temp"]
WIND = DATA["basel-wind-speed"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(TEMP), reason="reference basel datasets not present")


def test_gorilla64_ratios():
    assert bits_per_value_64(TEMP) == pytest.approx(60.19, abs=0.005)
    assert bits_per_value_64(WIND) == pytest.approx(63.63, abs=0.005)


def test_gorilla32_ratios():
    assert bits_per_value_32(TEMP) == pytest.approx(29.88, abs=0.005)
    assert bits_per_value_32(WIND) == pytest.approx(32.22, abs=0.005)


def test_lossy32_ratio_and_bound():
    (bpv, err), = lossy32_sweep(TEMP, logs=(-3,)).values()
    assert bpv == pytest.approx(12.71, abs=0.005)
    assert err <= 2.0 ** -3


def test_pmc_swing_ratio_and_bound():
    (bpv, err), = pmc_sweep(TEMP, logs=(-3,)).values()
    assert bpv == pytest.approx(56.54, abs=0.005)
    assert err <= 2.0 ** -3
    (bpv, err), = swing_sweep(TEMP, logs=(-3,)).values()
    assert bpv == pytest.approx(38.34, abs=0.005)
    assert err <= 2.0 ** -3
