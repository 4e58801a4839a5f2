"""Tracking engine tests: convergence and bit recovery on synthetic signals."""

import numpy as np
import pytest

from gps_sdr_tpu.config import FileConfig, ReceiverConfig, SignalConfig
from gps_sdr_tpu.io.ifdata import IFSampleSource
from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples
from gps_sdr_tpu.io import lnav
from gps_sdr_tpu.tracking import (TrackParams, init_track_state, run_tracking)

CFG = ReceiverConfig(
    file=FileConfig(name="synthetic", skip_ms=0),
    signal=SignalConfig(f_if=1.023e6, fs=4.092e6),
)

EPH = dict(
    sqrta=5153.6413, ecc=0.00122963, m0=2.14587329, omega0=1.25789432,
    i0=0.96679784, w=-0.89245321, deltan=4.3267e-09, omegadot=-7.2345e-09,
    idot=-4.2e-10, cuc=1.5272e-07, cus=2.3842e-07, crc=287.46875,
    crs=-2.59375, cic=-7.45058e-09, cis=1.3039e-08, toe=388800.0,
    toc=388800.0, af0=1.8364e-04, af1=2.0464e-12, af2=0.0,
    tgd=-7.4506e-09, iodc=23, iode=23, health=0, ura=0)


def make_source(svs, duration_ms, noise_std=6.0, seed=2):
    iq = generate_if_samples(CFG, svs, duration_ms, noise_std, seed)
    vals = np.empty(2 * iq.size)
    vals[0::2] = iq.real
    vals[1::2] = iq.imag
    return IFSampleSource.from_array(
        np.clip(np.round(vals), -127, 127).astype(np.int8), CFG.file)


@pytest.fixture(scope="module")
def tracked():
    bits = lnav.encode_frames(EPH, 2239, 388800.0, 4)
    svs = [
        SyntheticSV(prn=7, amplitude=3.0, doppler_hz=1234.5,
                    code_delay_samples=800.0, nav_bits=bits),
        SyntheticSV(prn=21, amplitude=2.5, doppler_hz=-2500.25,
                    code_delay_samples=2345.0, nav_bits=bits),
    ]
    n_ms = 1500
    src = make_source(svs, n_ms + 5)
    S = CFG.signal.samples_per_ms
    # acquisition-style initialization: delays/Doppler within capture range
    code_delays = []
    fine = []
    for sv in svs:
        f_code = CFG.signal.code_freq_basis * (1 + sv.doppler_hz / CFG.signal.fc)
        # first code epoch at delay d (chip phase 0 at sample d)
        next_epoch = sv.code_delay_samples % (1023 / f_code * CFG.signal.fs)
        code_delays.append(int(round((S - next_epoch) % S)))
        fine.append(CFG.signal.f_if + sv.doppler_hz + 3.0)  # 3 Hz acq error
    state = init_track_state(CFG, np.array(code_delays), np.array(fine))
    params = TrackParams.epl(CFG)
    rec, state = run_tracking(src, CFG, [sv.prn for sv in svs], state,
                              params, n_ms)
    return svs, rec, state


def test_carrier_freq_converges(tracked):
    svs, rec, _ = tracked
    for ch, sv in enumerate(svs):
        truth = CFG.signal.f_if + sv.doppler_hz
        tail = rec.carr_freq[-200:, ch]
        assert abs(np.mean(tail) - truth) < 2.0, (sv.prn, np.mean(tail) - truth)


def test_code_freq_converges(tracked):
    svs, rec, _ = tracked
    for ch, sv in enumerate(svs):
        truth = CFG.signal.code_freq_basis * (1 + sv.doppler_hz / CFG.signal.fc)
        tail = rec.code_freq[-200:, ch]
        assert abs(np.mean(tail) - truth) < 0.5, (sv.prn, np.mean(tail) - truth)


def test_prompt_power_dominates(tracked):
    _, rec, _ = tracked
    p = np.abs(rec.p_i[-500:])
    q = np.abs(rec.p_q[-500:])
    assert np.mean(p) > 5 * np.mean(q)
    e = np.abs(rec.e_i[-500:])
    assert np.mean(p) > 1.3 * np.mean(e)  # E at ±0.5 chip ≈ half amplitude


def test_nav_bits_recovered(tracked):
    svs, rec, _ = tracked
    bits = svs[0].nav_bits
    p_i = rec.p_i[:, 0]
    # locate the first bit edge, then majority-vote 20 ms groups
    sgn = np.sign(p_i[300:])
    edges = np.nonzero(sgn[1:] != sgn[:-1])[0]
    start = 300 + edges[0] + 1
    n_bits = (len(p_i) - start) // 20
    votes = np.sign(np.sum(np.sign(p_i[start:start + n_bits * 20]
                                   ).reshape(n_bits, 20), axis=1))
    got = ((1 - votes) / 2).astype(int)
    # overall polarity ambiguity resolved by best alignment against truth
    truth = bits[:n_bits + 40]
    matches = []
    for off in range(40):
        seg = truth[off:off + n_bits]
        if len(seg) < n_bits:
            break
        m = np.mean(seg == got)
        matches.append(max(m, 1 - m))
    assert max(matches) > 0.995


def test_block_lengths_track_code_rate(tracked):
    svs, rec, _ = tracked
    S = CFG.signal.samples_per_ms
    for ch, sv in enumerate(svs):
        f_code = CFG.signal.code_freq_basis * (1 + sv.doppler_hz / CFG.signal.fc)
        expect = 1023.0 / f_code * CFG.signal.fs
        got = np.mean(rec.num_sample[200:, ch])
        assert abs(got - expect) < 0.05, (sv.prn, got, expect)


def test_absolute_sample_monotonic(tracked):
    _, rec, _ = tracked
    d = np.diff(rec.absolute_sample[:, 0])
    assert np.all(d > 0)
    S = CFG.signal.samples_per_ms
    assert np.all(np.abs(d - S) < 60)  # within ±1 chip of nominal


def test_shift_replica_matches_nco(tracked):
    """The fast nominal-rate shift replica tracks equivalently to the
    exact Q32 NCO replica."""
    from gps_sdr_tpu.io.ifdata import IFSampleSource
    from gps_sdr_tpu.io.synthetic import generate_if_samples
    svs, rec_nco, _ = tracked
    src = make_source(svs, 1505)
    S = CFG.signal.samples_per_ms
    code_delays, fine = [], []
    for sv in svs:
        f_code = CFG.signal.code_freq_basis * (1 + sv.doppler_hz / CFG.signal.fc)
        next_epoch = sv.code_delay_samples % (1023 / f_code * CFG.signal.fs)
        code_delays.append(int(round((S - next_epoch) % S)))
        fine.append(CFG.signal.f_if + sv.doppler_hz + 3.0)
    state = init_track_state(CFG, np.array(code_delays), np.array(fine))
    params = TrackParams.epl(CFG, replica="shift")
    rec, _ = run_tracking(src, CFG, [sv.prn for sv in svs], state,
                          params, 1500)
    for ch, sv in enumerate(svs):
        truth = CFG.signal.f_if + sv.doppler_hz
        assert abs(np.mean(rec.carr_freq[-200:, ch]) - truth) < 2.0
        truth_code = CFG.signal.code_freq_basis * (1 + sv.doppler_hz / CFG.signal.fc)
        # this test's fs is exactly 4 samples/chip; the interpolated
        # replica's DLL limit-cycles a little wider there → 1.5 Hz bound
        assert abs(np.mean(rec.code_freq[-200:, ch]) - truth_code) < 1.5
    # prompt correlators agree with the exact replica within a percent
    a = rec.p_i[-400:]
    b = rec_nco.p_i[-400:]
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1.0)
    assert np.median(rel) < 0.04, np.median(rel)
    assert np.mean(np.sign(a) == np.sign(b)) > 0.999


def test_chunk_prefetcher_unit():
    from gps_sdr_tpu.io.ifdata import ChunkPrefetcher

    data = np.arange(1000, dtype=np.float32)
    calls = []

    def read(start, n):
        calls.append((start, n))
        return data[start:start + n]

    pf = ChunkPrefetcher(read, slice_axis=0)
    # miss: nothing prefetched
    np.testing.assert_array_equal(pf.fetch(10, 5), data[10:15])
    assert pf.misses == 1
    # hit: contained window served by slicing
    pf.prefetch(100, 50)
    np.testing.assert_array_equal(pf.fetch(110, 20), data[110:130])
    assert pf.hits == 1 and len(calls) == 2
    # miss: prefetched window does not contain the request
    pf.prefetch(100, 50)
    np.testing.assert_array_equal(pf.fetch(140, 20), data[140:160])
    assert pf.misses == 2
    pf.close()


def test_chunked_run_equals_single_chunk():
    """Chunked streaming with prefetch must be bit-identical to one
    chunk (the prefetcher serves sliced windows of the same samples)."""
    cfg = CFG
    svs = [SyntheticSV(prn=9, amplitude=2.5, doppler_hz=987.0,
                       code_delay_samples=1500.0),
           SyntheticSV(prn=23, amplitude=2.2, doppler_hz=-2100.0,
                       code_delay_samples=100.0)]
    iq = generate_if_samples(cfg, svs, duration_ms=70,
                             noise_std=4.0, seed=8)
    vals = np.empty(2 * iq.size)
    vals[0::2] = iq.real
    vals[1::2] = iq.imag
    src = IFSampleSource.from_array(
        np.clip(np.round(vals), -127, 127).astype(np.int8), cfg.file)
    delays = np.array([sv.code_delay_samples for sv in svs], np.int64)
    fines = np.array([cfg.signal.f_if + sv.doppler_hz for sv in svs])
    params = TrackParams.epl(cfg)
    recs = []
    for chunk_ms in (1000, 17):
        st = init_track_state(cfg, delays, fines)
        rec, _ = run_tracking(src, cfg, [sv.prn for sv in svs],
                              st, params, 60, chunk_ms=chunk_ms)
        recs.append(rec)
    np.testing.assert_array_equal(recs[0].corr, recs[1].corr)
    np.testing.assert_array_equal(recs[0].absolute_sample,
                                  recs[1].absolute_sample)
    np.testing.assert_array_equal(recs[0].carr_freq, recs[1].carr_freq)
