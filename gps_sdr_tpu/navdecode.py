"""LNAV navigation-message decoding from prompt correlator streams.

Host-side equivalent of the reference's `naviDecode_updated.m` +
`paritychk_James.m` + `bin2dec_GPSSDR.m`/`comp2dec.m` + `ini_eph.m`:
sign-outlier repair, bit-edge search, 20 ms majority vote, preamble match
with the 300-bit-spacing and HOW-trailer checks, Hamming(32,26) parity
validation with D29*/D30* context, and subframe 1/2/3 field extraction.

This is pure bit logic on tiny arrays — it runs on host NumPy by design;
the TPU does the correlation work that produces its input.

Index conventions follow the reference so the positioning stages can reuse
its formulas: `nav1` is the 1-based ms index of the first bit edge in the
tracked prompt stream, `sfb` entries are 1-based bit indices (20 ms units)
of subframe starts relative to `nav1`
(naviDecode_updated.m:85,153,161-168).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from gps_sdr_tpu.io.lnav import PARITY_DSTAR, PARITY_TAPS, PI, PREAMBLE_BITS

PREAMBLE_PM = 1 - 2 * PREAMBLE_BITS.astype(np.int64)  # {0,1}→{+1,−1}


@dataclasses.dataclass
class EphemerisRecord:
    """Per-PRN decode results: each field grows by one per decode event
    (ini_eph.m:19-55)."""

    tow: List[float] = dataclasses.field(default_factory=list)
    tow1: List[float] = dataclasses.field(default_factory=list)
    sfb: List[int] = dataclasses.field(default_factory=list)
    sfb1: List[int] = dataclasses.field(default_factory=list)
    weeknum: List[int] = dataclasses.field(default_factory=list)
    ura: List[int] = dataclasses.field(default_factory=list)
    health: List[int] = dataclasses.field(default_factory=list)
    iodc: List[int] = dataclasses.field(default_factory=list)
    tgd: List[float] = dataclasses.field(default_factory=list)
    toc: List[float] = dataclasses.field(default_factory=list)
    af2: List[float] = dataclasses.field(default_factory=list)
    af1: List[float] = dataclasses.field(default_factory=list)
    af0: List[float] = dataclasses.field(default_factory=list)
    iode2: List[int] = dataclasses.field(default_factory=list)
    crs: List[float] = dataclasses.field(default_factory=list)
    deltan: List[float] = dataclasses.field(default_factory=list)
    m0: List[float] = dataclasses.field(default_factory=list)
    cuc: List[float] = dataclasses.field(default_factory=list)
    ecc: List[float] = dataclasses.field(default_factory=list)
    cus: List[float] = dataclasses.field(default_factory=list)
    sqrta: List[float] = dataclasses.field(default_factory=list)
    toe: List[float] = dataclasses.field(default_factory=list)
    cic: List[float] = dataclasses.field(default_factory=list)
    omega0: List[float] = dataclasses.field(default_factory=list)
    cis: List[float] = dataclasses.field(default_factory=list)
    i0: List[float] = dataclasses.field(default_factory=list)
    crc: List[float] = dataclasses.field(default_factory=list)
    w: List[float] = dataclasses.field(default_factory=list)
    omegadot: List[float] = dataclasses.field(default_factory=list)
    iode3: List[int] = dataclasses.field(default_factory=list)
    idot: List[float] = dataclasses.field(default_factory=list)
    updateflag: int = 0
    updatetime_ms: List[float] = dataclasses.field(default_factory=list)
    updatetime_tow: List[float] = dataclasses.field(default_factory=list)

    def latest(self, idx: int = 0) -> Dict[str, float]:
        """Ephemeris field dict (SI units) at decode index `idx`."""
        return {k: getattr(self, k)[idx] for k in (
            "sqrta", "ecc", "m0", "omega0", "i0", "w", "deltan", "omegadot",
            "idot", "cuc", "cus", "crc", "crs", "cic", "cis", "toe", "toc",
            "af0", "af1", "af2", "tgd")}


def _bits_to_uint(bits: np.ndarray) -> int:
    """MSB-first unsigned (the reference stores fields MSB-at-lowest-index
    and calls bin2dec_GPSSDR on the reversed slice)."""
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v


def _bits_to_int(bits: np.ndarray, lsb_pow2: int, scale: float = 1.0) -> float:
    """MSB-first two's complement × 2^lsb × scale (comp2dec.m)."""
    w = len(bits)
    v = _bits_to_uint(bits)
    if bits[0]:
        v -= 1 << w
    return v * (2.0 ** lsb_pow2) * scale


def repair_sign_outliers(x: np.ndarray) -> np.ndarray:
    """Flip isolated single-ms sign outliers (naviDecode_updated.m:45-50)."""
    x = x.copy()
    s = np.sign(x)
    iso = (s[:-2] == s[2:]) & (s[1:-1] != s[:-2])
    idx = np.nonzero(iso)[0] + 1
    x[idx] = -x[idx]
    return x


def parity_check_stream(tx_bits: np.ndarray, start: int):
    """Validate and strip parity over every full 30-bit word from `start`.

    `tx_bits` are transmitted {0,1} bits; `start` is the 0-based index of a
    word boundary (subframe start).  Requires the two bits before `start`
    (D29*, D30*) to be present.  Returns (all_passed, source_bits) where
    source_bits is `tx_bits` with the 24 data bits of each checked word
    un-inverted (paritychk_James.m:33-50).
    """
    bits = tx_bits.astype(np.int8).copy()
    n_words = (len(bits) - start) // 30
    ok = True

    def check_word(i, d29, d30):
        data = bits[i:i + 24] ^ d30
        good = True
        for k in range(6):
            acc = d29 if PARITY_DSTAR[k] == 0 else d30
            for t in PARITY_TAPS[k]:
                acc ^= int(data[t - 1])
            if acc != int(bits[i + 24 + k]):
                good = False
        return good, data

    for w in range(n_words):
        i = start + 30 * w
        if i >= 2:
            good, data = check_word(i, int(bits[i - 2]), int(bits[i - 1]))
        else:
            # The two context bits (D29*, D30*) before the stream's very
            # first word do not exist.  Python's negative indexing would
            # silently WRAP to the stream's end — a candidate at bit 1
            # was parity-checked against the last subframe's tail.  A
            # subframe boundary always follows a solved-tail word 10
            # (trailing parity 00), so the true context is (0,0) for an
            # upright stream and (1,1) when the PLL locked 180° off (the
            # whole transmitted stream inverts; GPS parity is inversion-
            # invariant once the context inverts with it) — try both.
            good, data = check_word(i, 0, 0)
            if not good:
                good, data = check_word(i, 1, 1)
        bits[i:i + 24] = data
        if not good:
            ok = False
    return ok, bits


def _decode_subframe(rec: EphemerisRecord, sf: np.ndarray, sfb_idx: int):
    """Extract one 300-bit subframe (source bits) into the record.

    Returns the subframe ID.  Bit maps mirror naviDecode_updated.m:154-218
    (1-based positions; `sf` is 0-based).
    """
    def u(a, b):
        return _bits_to_uint(sf[a - 1:b])

    def s(a, b, lsb, scale=1.0):
        return _bits_to_int(sf[a - 1:b], lsb, scale)

    def us(a1, b1, a2, b2, lsb, scale=1.0, signed=True):
        bits = np.concatenate([sf[a1 - 1:b1], sf[a2 - 1:b2]])
        return (_bits_to_int(bits, lsb, scale) if signed
                else _bits_to_uint(bits) * (2.0 ** lsb) * scale)

    tow = (u(31, 47) - 1) * 6.0
    rec.tow.append(tow)
    rec.sfb.append(sfb_idx)
    sf_id = u(50, 52)
    if sf_id == 1:
        rec.sfb1.append(sfb_idx)
        rec.weeknum.append(u(61, 70) + 2048)
        rec.tow1.append(tow)
        rec.ura.append(u(73, 76))
        rec.health.append(u(78, 82))
        rec.iodc.append(u(211, 218))
        rec.tgd.append(s(197, 204, -31))
        rec.toc.append(u(219, 234) * 2.0 ** 4)
        rec.af2.append(s(241, 248, -55))
        rec.af1.append(s(249, 264, -43))
        rec.af0.append(s(271, 292, -31))
    elif sf_id == 2:
        rec.iode2.append(u(61, 68))
        rec.crs.append(s(69, 84, -5))
        rec.deltan.append(s(91, 106, -43, PI))
        rec.m0.append(us(107, 114, 121, 144, -31, PI))
        rec.cuc.append(s(151, 166, -29))
        rec.ecc.append(us(167, 174, 181, 204, -33, signed=False))
        rec.cus.append(s(211, 226, -29))
        rec.sqrta.append(us(227, 234, 241, 264, -19, signed=False))
        rec.toe.append(u(271, 286) * 2.0 ** 4)
    elif sf_id == 3:
        rec.cic.append(s(61, 76, -29))
        rec.omega0.append(us(77, 84, 91, 114, -31, PI))
        rec.cis.append(s(121, 136, -29))
        rec.i0.append(us(137, 144, 151, 174, -31, PI))
        rec.crc.append(s(181, 196, -5))
        rec.w.append(us(197, 204, 211, 234, -31, PI))
        rec.omegadot.append(s(241, 264, -43, PI))
        rec.iode3.append(u(271, 278))
        rec.idot.append(s(279, 292, -43, PI))
    return sf_id


@dataclasses.dataclass
class ChannelDecodeResult:
    eph: EphemerisRecord
    nav1_ms: int          # 1-based ms index of the first bit edge
    n_bits: int


def decode_channel(p_i: np.ndarray, start_offset_ms: int = 3000,
                   repair_outliers: bool = True) -> ChannelDecodeResult:
    """Decode one channel's prompt in-phase per-ms stream.

    `start_offset_ms` skips the tracking-loop transient
    (naviDecode_updated.m:34).  `start_offset_ms=0, repair_outliers=False`
    reproduces the legacy `naviDecode.m` behavior — the pre-2020 variant
    differs from `naviDecode_updated.m` exactly by those two robustness
    fixes (no transient skip, no isolated-sign-flip repair).
    """
    rec = EphemerisRecord()
    raw = np.asarray(p_i, dtype=np.float64)[start_offset_ms:]
    if repair_outliers:
        raw = repair_sign_outliers(raw)
    sgn = np.where(raw >= 0, 1, -1)
    # first bit edge (naviDecode_updated.m:67-72)
    edges = np.nonzero(sgn[1:] != sgn[:-1])[0]
    # 1-based index of the first sample of the new bit (reference startms,
    # naviDecode_updated.m:67-72)
    startms = int(edges[0]) + 2 if len(edges) else 1
    nav1 = startms + start_offset_ms  # 1-based ms index into the stream
    sgn = np.where(np.asarray(p_i[nav1 - 1:], dtype=np.float64) >= 0, 1, -1)

    # 20 ms majority vote with the reference's accumulate-until-threshold
    # behavior (naviDecode_updated.m:94-125): groups that miss ±17 leave a
    # zero bit and keep accumulating.
    n_groups = max(0, (len(sgn) - 100)) // 20
    nav_pm = np.zeros(n_groups, dtype=np.int64)
    acc = 0
    for g in range(n_groups):
        acc += int(np.sum(sgn[g * 20:(g + 1) * 20]))
        if acc > 17:
            nav_pm[g] = 1
            acc = 0
        elif acc < -17:
            nav_pm[g] = -1
            acc = 0
    bits = ((1 - nav_pm) // 2).astype(np.int8)  # ±1→{0,1} (0 ↔ +1)

    # preamble search with 300-bit spacing + HOW trailer + parity
    # (naviDecode_updated.m:131-147)
    n = len(nav_pm)
    parity_ok = False
    first_sf = None
    for idx in range(7, n):
        if n - idx <= 360:
            break
        c0 = abs(int(np.sum(nav_pm[idx - 7: idx + 1] * PREAMBLE_PM)))
        c1 = abs(int(np.sum(nav_pm[idx - 7 + 300: idx + 1 + 300] * PREAMBLE_PM)))
        if c0 < 8 or c1 < 8:
            continue
        how_tail = nav_pm[idx - 7 + 58] + nav_pm[idx - 7 + 59]
        how_tail2 = nav_pm[idx - 7 + 358] + nav_pm[idx - 7 + 359]
        if how_tail == 0 or how_tail2 == 0:
            continue
        ok, src = parity_check_stream(bits, idx - 7)
        if not ok:
            continue
        parity_ok = True
        first_sf = idx - 7
        break

    if parity_ok:
        seen = set()
        num_sf = (n - first_sf) // 300
        for k in range(num_sf):
            b0 = first_sf + 300 * k
            sf_id = _decode_subframe(rec, src[b0:b0 + 300], b0 + 1)
            seen.add(int(sf_id))
            if seen >= {1, 2, 3, 4, 5} and rec.health and rec.health[-1] == 0:
                rec.updateflag = 1
                # (index + idx·300)·20 + startms−1 of the reference
                # ≈ ms when the full eph set became available
                rec.updatetime_ms.append((b0 + 300 * (k % 5 + 1)) * 20.0
                                         + (startms - 1))
                rec.updatetime_tow.append(rec.tow[-1] + 6.0)
                seen = set()
    return ChannelDecodeResult(eph=rec, nav1_ms=nav1, n_bits=int(n))


def decode_all(prompt_i: Dict[int, np.ndarray], start_offset_ms: int = 3000,
               repair_outliers: bool = True):
    """Decode every channel: {prn: P_i per-ms stream} → (eph, sbf).

    Returns ({prn: EphemerisRecord}, {"nav1": {prn: ms}, "sfb1": {prn: bit}}).
    Pass `start_offset_ms=0, repair_outliers=False` for the legacy
    `naviDecode.m` behavior (see decode_channel).
    """
    eph: Dict[int, EphemerisRecord] = {}
    nav1: Dict[int, int] = {}
    sfb1: Dict[int, int] = {}
    for prn, stream in prompt_i.items():
        res = decode_channel(stream, start_offset_ms, repair_outliers)
        eph[prn] = res.eph
        nav1[prn] = res.nav1_ms
        if res.eph.sfb1:
            sfb1[prn] = res.eph.sfb1[0]
    return eph, {"nav1": nav1, "sfb1": sfb1}


def usable_svs(eph: Dict[int, EphemerisRecord]) -> List[int]:
    """PRNs with a complete, healthy ephemeris (findPosSV.m:23-42)."""
    return [prn for prn, rec in sorted(eph.items()) if rec.updateflag == 1]
