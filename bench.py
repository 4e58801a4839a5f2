"""Benchmark: Opensky-shaped workload (58 MHz IQ) on one chip.

Primary metric: continuous tracking throughput — IF samples/s/chip through
the 8-channel E/P/L correlator engine (the receiver's steady-state work).
Detail: full acquisition search latency (32 PRN x 41 Doppler x 20 ms
non-coherent grid — a one-shot per cold start) and its grid-cell rate.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is the real-time factor (value / 58e6): the reference
MATLAB receiver publishes no throughput numbers (BASELINE.md), so 1.0x
real-time is the reference point.

Timing methodology for the hosted backend: every measured run ends in a
small device->host value fetch (block_until_ready does not reliably fence
there), and a trivial jitted op warms the execution path first (the first
execution in a process can pay ~minutes of one-time setup).
"""

import json
import time

import numpy as np


def _warm_backend():
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.ones((8, 128), np.float32))
    np.asarray(jax.jit(lambda a: a * 2.0)(x))


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
    F = cfg.acq.n_freq_bins
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
            # reduce on device; the checksum depends on every element so
            # nothing is dead-code-eliminated
            return jnp.sum(acquisition_power_grid_real(
                blocks, carriers, code_fft, fft_len, S), axis=(1, 2))
    else:
        blocks = jnp.asarray((rng.integers(-64, 64, size=(B, S))
                              + 1j * rng.integers(-64, 64, size=(B, S))
                              ).astype(np.complex64))
        carriers = jnp.asarray(doppler_carriers(cfg))
        code_fft = jnp.asarray(np.fft.fft(
            sampled_codes(cfg, range(1, 33))).astype(np.complex64))

        @jax.jit
        def run():
            return jnp.sum(acquisition_power_grid(blocks, carriers,
                                                  code_fft), axis=(1, 2))

    np.asarray(run())  # compile + warm-up (fetch = fence)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    return dict(acq_wall_s=round(dt, 4),
                acq_grid_cells_per_s=round(32 * F * B * S / dt, 0),
                acq_if_samples_per_s=round(B * S / dt, 0))


def bench_tracking(n_ch: int = 8, n_steps: int = 1000, reps: int = 3):
    import jax
    import jax.numpy as jnp

    from gps_sdr_tpu.config import ReceiverConfig
    from gps_sdr_tpu.tracking import (TrackParams, build_shift_tables,
                                      init_track_state, track_scan)

    cfg = ReceiverConfig()
    S = cfg.signal.samples_per_ms
    blk = -(-(S + 256) // 128) * 128
    params = TrackParams.epl(cfg, replica="shift")
    rng = np.random.default_rng(1)
    state = init_track_state(
        cfg, np.zeros(n_ch, np.int64),
        np.full(n_ch, cfg.signal.f_if + 1234.0))
    state = state._replace(ptr=jnp.zeros(n_ch, jnp.int64))
    tables, margin = build_shift_tables(cfg, range(1, n_ch + 1), blk)
    chip_tables = jnp.asarray(tables)
    raw = jnp.asarray(rng.integers(
        -64, 64, size=((n_steps + 2) * S + blk, 2)).astype(np.float32))

    def run():
        st, rec = track_scan(raw, jnp.int64(0), state, chip_tables, params,
                             n_steps, float(cfg.signal.fs), blk,
                             float(cfg.signal.code_freq_basis), margin)
        return rec["corr"]

    np.asarray(run()[0, 0])  # compile + warm-up
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    np.asarray(out[0, 0])    # fetch = fence
    dt = (time.perf_counter() - t0) / reps
    return n_steps * S / dt, dt


def main():
    _warm_backend()
    trk_sps, trk_dt = bench_tracking()
    acq = bench_acquisition()
    print(json.dumps({
        "metric": "tracking IF samples/s/chip (8-channel E/P/L engine, "
                  "58 MHz Opensky shape)",
        "value": round(trk_sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(trk_sps / 58e6, 3),
        "detail": {
            "tracking_wall_s_1000ms_8ch": round(trk_dt, 4),
            "tracking_replica": "shift",
            "tracking_realtime_factor": round(trk_sps / 58e6, 3),
            **acq,
        },
    }))


if __name__ == "__main__":
    main()
