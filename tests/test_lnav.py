"""LNAV encoder ↔ decoder round-trip tests."""

import numpy as np

from gps_sdr_tpu.io import lnav
from gps_sdr_tpu import navdecode

EPH = dict(
    sqrta=5153.6413, ecc=0.00122963, m0=2.14587329, omega0=1.25789432,
    i0=0.96679784, w=-0.89245321, deltan=4.3267e-09, omegadot=-7.2345e-09,
    idot=-4.2e-10, cuc=1.5272e-07, cus=2.3842e-07, crc=287.46875,
    crs=-2.59375, cic=-7.45058e-09, cis=1.3039e-08, toe=388800.0,
    toc=388800.0, af0=1.8364e-04, af1=2.0464e-12, af2=0.0,
    tgd=-7.4506e-09, iodc=23, iode=23, health=0, ura=0)
WEEK = 2239
TOW0 = 388800.0  # multiple of 30 → stream starts at subframe 1


def test_parity_self_consistent():
    bits = lnav.encode_frames(EPH, WEEK, TOW0, 6)
    ok, _ = navdecode.parity_check_stream(bits, 300)  # from subframe 2 on
    assert ok
    ok0, _ = navdecode.parity_check_stream(
        np.concatenate([np.zeros(2, np.int8), bits]), 2)
    assert ok0  # full stream with D29*/D30*=0 lead-in


def test_how_trailer_zeros():
    bits = lnav.encode_frames(EPH, WEEK, TOW0, 3)
    for sf in range(3):
        # last two bits of word 2 (HOW) and word 10 must be 00
        assert bits[sf * 300 + 58] == 0 and bits[sf * 300 + 59] == 0
        assert bits[sf * 300 + 298] == 0 and bits[sf * 300 + 299] == 0


def test_preamble_present():
    bits = lnav.encode_frames(EPH, WEEK, TOW0, 3)
    for sf in range(3):
        np.testing.assert_array_equal(bits[sf * 300: sf * 300 + 8],
                                      lnav.PREAMBLE_BITS)


def bits_to_prompt_stream(bits, amp=1000.0, lead_ms=60):
    """bit {0,1} → per-ms prompt stream (bit 0 ↔ +amp), 20 ms per bit."""
    pm = (1 - 2 * bits.astype(np.float64)) * amp
    stream = np.repeat(pm, 20)
    lead = np.full(lead_ms, -pm[0])  # force a detectable first edge
    return np.concatenate([lead, stream])


def test_full_decode_roundtrip():
    n_sf = 10  # two full frames so every subframe ID is seen twice
    bits = lnav.encode_frames(EPH, WEEK, TOW0, n_sf)
    stream = bits_to_prompt_stream(bits)
    res = navdecode.decode_channel(stream, start_offset_ms=0)
    rec = res.eph
    assert res.nav1_ms == 61  # 60 ms lead → first edge at ms 61 (1-based)
    assert rec.updateflag == 1
    assert rec.sfb and rec.sfb[0] == 1
    assert rec.tow[0] == TOW0
    assert rec.weeknum[0] == WEEK
    assert rec.iodc[0] == EPH["iodc"]
    got = rec.latest(0)
    # quantization LSB tolerances per field
    tol = dict(sqrta=2**-19, ecc=2**-33, m0=np.pi * 2**-31,
               omega0=np.pi * 2**-31, i0=np.pi * 2**-31, w=np.pi * 2**-31,
               deltan=np.pi * 2**-43, omegadot=np.pi * 2**-43,
               idot=np.pi * 2**-43, cuc=2**-29, cus=2**-29, crc=2**-5,
               crs=2**-5, cic=2**-29, cis=2**-29, toe=16.0, toc=16.0,
               af0=2**-31, af1=2**-43, af2=2**-55, tgd=2**-31)
    for k, t in tol.items():
        assert abs(got[k] - EPH[k]) <= t, (k, got[k], EPH[k])


def test_decode_survives_inverted_polarity():
    """PLL locked 180° off: the whole transmitted stream inverts.  The
    preamble matches through abs() (naviDecode_updated.m:134) and GPS
    parity is inversion-invariant once the D29*/D30* context inverts
    with the stream — including at the stream HEAD, where the missing
    context is tried as (0,0) then (1,1) (parity_check_stream) — so the
    inverted stream decodes completely and to the same fields."""
    bits = lnav.encode_frames(EPH, WEEK, TOW0, 10)
    stream = -bits_to_prompt_stream(bits)  # PLL locked 180° off
    res = navdecode.decode_channel(stream, start_offset_ms=0)
    assert res.eph.updateflag == 1
    assert res.eph.sfb[0] == 1                 # anchored at the head
    assert abs(res.eph.latest(0)["sqrta"] - EPH["sqrta"]) <= 2**-19
    assert res.eph.tow[0] == TOW0


def test_decode_head_subframe_both_polarities():
    """Regression (round 4): a subframe boundary at the very first
    voted bit must be accepted.  Python's negative indexing silently
    wrapped the D29*/D30* context to the stream's END — acceptance then
    depended on the last two bits of the capture, and a channel whose
    record ends mid-word could lose its head subframe (fatal on a
    ~31 s record, which holds only ~5 subframes total)."""
    bits = lnav.encode_frames(EPH, WEEK, TOW0, 10)
    for sign in (+1, -1):
        body = sign * bits_to_prompt_stream(bits)[60:]
        # 40 ms opposite-sign lead: the first bit EDGE (bit sync anchor)
        # lands exactly on the subframe boundary, so the voted stream's
        # bit 1 IS subframe bit 1; truncate to a non-multiple of 30 bits
        # so the (old) wrapped context would be garbage
        stream = np.concatenate([np.full(40, -body[0]), body[:-140]])
        res = navdecode.decode_channel(stream, start_offset_ms=0)
        assert res.eph.updateflag == 1, sign
        assert res.eph.sfb[0] == 1, sign


def test_outlier_repair():
    x = np.array([5.0, 4.0, -3.0, 5.0, 6.0])
    y = navdecode.repair_sign_outliers(x)
    assert y[2] == 3.0
