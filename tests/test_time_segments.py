"""Time-segmented (overlap-save) tracking vs serial tracking."""

import numpy as np
import pytest

from gps_sdr_tpu.config import FileConfig, ReceiverConfig, SignalConfig
from gps_sdr_tpu.io import lnav
from gps_sdr_tpu.io.ifdata import IFSampleSource
from gps_sdr_tpu.io.synthetic import SyntheticSV, generate_if_samples
from gps_sdr_tpu.parallel.time_segments import run_tracking_segmented
from gps_sdr_tpu.tracking import TrackParams, init_track_state, run_tracking

CFG = ReceiverConfig(
    file=FileConfig(name="seg", skip_ms=0),
    signal=SignalConfig(f_if=1.023e6, fs=4.092e6),
)

EPH = dict(
    sqrta=5153.6413, ecc=0.00122963, m0=2.14587329, omega0=1.25789432,
    i0=0.96679784, w=-0.89245321, deltan=4.3267e-09, omegadot=-7.2345e-09,
    idot=-4.2e-10, cuc=1.5272e-07, cus=2.3842e-07, crc=287.46875,
    crs=-2.59375, cic=-7.45058e-09, cis=1.3039e-08, toe=388800.0,
    toc=388800.0, af0=1.8364e-04, af1=2.0464e-12, af2=0.0,
    tgd=-7.4506e-09, iodc=23, iode=23, health=0, ura=0)

N_MS = 1600


@pytest.fixture(scope="module")
def setup():
    bits = lnav.encode_frames(EPH, 2239, 388800.0, 4)
    svs = [
        SyntheticSV(prn=5, amplitude=3.0, doppler_hz=1711.0,
                    code_delay_samples=900.0, nav_bits=bits),
        SyntheticSV(prn=29, amplitude=2.6, doppler_hz=-3100.0,
                    code_delay_samples=2600.0, nav_bits=bits),
    ]
    src_arr = generate_if_samples(CFG, svs, N_MS + 500, noise_std=6.0, seed=4)
    vals = np.empty(2 * src_arr.size)
    vals[0::2] = src_arr.real
    vals[1::2] = src_arr.imag
    src = IFSampleSource.from_array(
        np.clip(np.round(vals), -127, 127).astype(np.int8), CFG.file)
    S = CFG.signal.samples_per_ms
    delays, fine = [], []
    for sv in svs:
        f_code = CFG.signal.code_freq_basis * (1 + sv.doppler_hz / CFG.signal.fc)
        nxt = sv.code_delay_samples % (1023 / f_code * CFG.signal.fs)
        delays.append(int(round((S - nxt) % S)))
        fine.append(CFG.signal.f_if + sv.doppler_hz + 2.0)
    return src, [5, 29], np.array(delays), np.array(fine)


@pytest.fixture(scope="module")
def serial(setup):
    src, prns, delays, fine = setup
    state = init_track_state(CFG, delays, fine)
    rec, _ = run_tracking(src, CFG, prns, state, TrackParams.epl(CFG), N_MS)
    return rec


@pytest.fixture(scope="module")
def segmented(setup):
    src, prns, delays, fine = setup
    return run_tracking_segmented(src, CFG, prns, delays, fine,
                                  TrackParams.epl(CFG), N_MS,
                                  n_segments=4, halo_ms=250)


def test_shapes_match(serial, segmented):
    assert segmented.p_i.shape == serial.p_i.shape == (N_MS, 2)


def test_bits_identical_after_pull_in(serial, segmented):
    # prompt signs (the nav bits) must agree everywhere past the initial
    # pull-in of the first segment
    s0 = np.sign(serial.p_i[300:])
    s1 = np.sign(segmented.p_i[300:])
    agree = np.mean(s0 == s1)
    assert agree > 0.999, agree


def test_carrier_freq_matches_serial(serial, segmented):
    d = np.abs(segmented.carr_freq[300:] - serial.carr_freq[300:])
    assert np.median(d) < 1.0
    assert np.percentile(d, 99) < 10.0  # segment pull-in transients only


def test_absolute_sample_alignment(serial, segmented):
    # same code-period partitioning: block ends within a few samples
    d = np.abs(segmented.absolute_sample[300:] - serial.absolute_sample[300:])
    assert np.max(d) < 30, np.max(d)


def test_prompt_power_everywhere(segmented):
    # every segment locked: prompt dominates quadrature in every quarter
    for q in range(4):
        seg = slice(q * 400 + 300 if q == 0 else q * 400, (q + 1) * 400)
        p = np.abs(segmented.p_i[seg]).mean()
        qq = np.abs(segmented.p_q[seg]).mean()
        assert p > 3 * qq, (q, p, qq)
