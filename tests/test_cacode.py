"""C/A code generator unit tests against IS-GPS-200 constants."""

import numpy as np
import pytest

from gps_sdr_tpu.ops import cacode


# IS-GPS-200 Table 3-Ia: first 10 chips (octal) per PRN.
FIRST_CHIPS_OCTAL = {
    1: 1440, 2: 1620, 3: 1710, 4: 1744, 5: 1133, 6: 1455, 7: 1131,
    8: 1454, 9: 1626, 10: 1504, 11: 1642, 12: 1750, 13: 1764, 14: 1772,
    15: 1775, 16: 1776, 17: 1156, 18: 1467, 19: 1633, 20: 1715,
    21: 1746, 22: 1763, 23: 1063, 24: 1706, 25: 1743, 26: 1761,
    27: 1770, 28: 1774, 29: 1127, 30: 1453, 31: 1625, 32: 1712,
}


def test_table_shape_and_values():
    t = cacode.ca_code_table()
    assert t.shape == (cacode.N_PRN, cacode.CODE_LENGTH)
    assert set(np.unique(t)) == {-1.0, 1.0}


@pytest.mark.parametrize("prn,octal", sorted(FIRST_CHIPS_OCTAL.items()))
def test_first_chips_octal(prn, octal):
    assert cacode.first_chips_octal(prn) == octal


def test_code_balance():
    # Gold codes of period 1023 have 512 chips of one polarity, 511 of the other.
    for prn in (1, 7, 19, 32):
        s = int(np.sum(cacode.ca_code_bits(prn)))
        assert s in (511, 512)


def test_autocorrelation_sidelobes():
    # Gold-code correlation levels: {-65, -1, 63} off-peak, 1023 at peak.
    c = cacode.ca_code(1).astype(np.float64)
    corr = np.fft.ifft(np.fft.fft(c) * np.conj(np.fft.fft(c))).real
    assert abs(corr[0] - 1023) < 1e-6
    off = np.round(corr[1:]).astype(int)
    assert set(np.unique(off)).issubset({-65, -1, 63})


def test_cross_correlation_levels():
    c1 = cacode.ca_code(1).astype(np.float64)
    c2 = cacode.ca_code(2).astype(np.float64)
    corr = np.fft.ifft(np.fft.fft(c1) * np.conj(np.fft.fft(c2))).real
    assert set(np.unique(np.round(corr).astype(int))).issubset({-65, -1, 63})


def test_resample_code_first_samples():
    # At fs = 4×chip rate, each chip should appear ~4 times in order.
    fs = 4 * 1.023e6
    s = cacode.resample_code(3, fs, 1.023e6, 16)
    chips = cacode.ca_code(3)
    expect = np.repeat(chips[:4], 4)
    np.testing.assert_array_equal(s, expect)
