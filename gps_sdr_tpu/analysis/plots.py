"""Result visualization — equivalents of the reference's Plot_task_1..5.m
and TrackingPlot*.m dashboards, writing PNG files.

Each function takes framework result objects and an output path; matplotlib
is imported lazily with the Agg backend so headless environments work.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_acquisition(acq, out_path: str) -> None:
    """Task 1 (Plot_task_1.m): SNR / Doppler / code delay per acquired SV."""
    plt = _plt()
    fig, axes = plt.subplots(3, 1, figsize=(10, 9), sharex=True)
    sv = acq.sv
    axes[0].bar(sv, acq.snr_db)
    axes[0].set_ylabel("acquisition SNR [dB]")
    axes[0].axhline(12.0, color="r", ls="--", label="threshold")
    axes[0].legend()
    axes[1].stem(sv, acq.fine_freq_hz - acq.fine_freq_hz.mean())
    axes[1].set_ylabel("fine freq − mean [Hz]")
    axes[2].stem(sv, acq.code_delay)
    axes[2].set_ylabel("code delay [samples]")
    axes[2].set_xlabel("PRN")
    fig.suptitle("Acquisition results")
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def plot_tracking(records, prns: Sequence[int], out_path: str,
                  max_ms: Optional[int] = None) -> None:
    """Task 2 / TrackingPlot.m: prompt I/Q series, IQ constellation,
    carrier frequency, discriminators per channel."""
    plt = _plt()
    n = len(prns)
    fig, axes = plt.subplots(n, 4, figsize=(18, 2.6 * n), squeeze=False)
    t_end = max_ms or records.p_i.shape[0]
    for ch, prn in enumerate(prns):
        pi = records.p_i[:t_end, ch]
        pq = records.p_q[:t_end, ch]
        axes[ch][0].plot(pi, lw=0.4)
        axes[ch][0].set_ylabel(f"PRN {prn}\nP_i")
        axes[ch][1].plot(pi, pq, ".", ms=1)
        axes[ch][1].set_xlabel("I")
        axes[ch][1].set_ylabel("Q")
        axes[ch][2].plot(records.carr_freq[:t_end, ch], lw=0.6)
        axes[ch][2].set_ylabel("carrier [Hz]")
        axes[ch][3].plot(records.code_err[:t_end, ch], lw=0.4)
        axes[ch][3].set_ylabel("DLL disc")
    fig.suptitle("Tracking channels")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def plot_ephemeris(eph, prns: Sequence[int], out_path: str) -> None:
    """Task 3 (Plot_task_3.m): decoded orbital elements per SV."""
    plt = _plt()
    fields = ["sqrta", "ecc", "i0", "omega0", "w", "m0"]
    fig, axes = plt.subplots(2, 3, figsize=(15, 7))
    for ax, f in zip(axes.ravel(), fields):
        vals = [getattr(eph[p], f)[0] if getattr(eph[p], f) else np.nan
                for p in prns]
        ax.bar([str(p) for p in prns], vals)
        ax.set_title(f)
    fig.suptitle("Decoded ephemeris parameters")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def plot_wls_solution(nav, truth_ecef: np.ndarray, out_path: str) -> None:
    """Task 4 (Plot_task_4.m): WLS ENU trajectory, velocity, error series
    and histogram, clock bias."""
    from gps_sdr_tpu.geo.coords import xyz2enu

    plt = _plt()
    enu = np.asarray(xyz2enu(nav.usr_pos, truth_ecef))
    err = np.linalg.norm(enu, axis=1)
    fig, axes = plt.subplots(2, 3, figsize=(16, 8))
    axes[0][0].plot(enu[:, 0], enu[:, 1], ".-", ms=2)
    axes[0][0].plot([0], [0], "r*", ms=12, label="truth")
    axes[0][0].set_xlabel("E [m]"); axes[0][0].set_ylabel("N [m]")
    axes[0][0].legend(); axes[0][0].set_title("WLS horizontal trajectory")
    axes[0][1].plot(nav.usr_vel_enu)
    axes[0][1].set_title("velocity ENU [m/s]")
    axes[0][2].plot(err)
    axes[0][2].set_title("3D position error [m]")
    axes[1][0].hist(err, bins=30)
    axes[1][0].set_title("position error histogram")
    axes[1][1].plot(nav.clk_bias_m)
    axes[1][1].set_title("clock bias [m]")
    axes[1][2].plot(nav.clk_drift_ms)
    axes[1][2].set_title("clock drift [m/s]")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def plot_vt_solution(sol, truth_ecef: np.ndarray, out_path: str) -> None:
    """Task 5 (Plot_task_5.m): EKF trajectory, velocity, error histogram,
    clock states, Kalman gain and innovation diagnostics."""
    from gps_sdr_tpu.geo.coords import xyz2enu

    plt = _plt()
    enu = np.asarray(xyz2enu(sol.usr_pos, truth_ecef))
    err = np.linalg.norm(enu, axis=1)
    fig, axes = plt.subplots(3, 3, figsize=(16, 11))
    axes[0][0].plot(enu[:, 0], enu[:, 1], lw=0.5)
    axes[0][0].plot([0], [0], "r*", ms=12)
    axes[0][0].set_title("EKF horizontal trajectory [m]")
    axes[0][1].plot(sol.usr_vel)
    axes[0][1].set_title("velocity ECEF [m/s]")
    axes[0][2].plot(err, lw=0.5)
    axes[0][2].set_title("position error [m]")
    axes[1][0].hist(err, bins=30)
    axes[1][0].set_title("error histogram")
    axes[1][1].plot(sol.clk_bias_m)
    axes[1][1].set_title("clock bias [m]")
    axes[1][2].plot(sol.clk_drift_ms)
    axes[1][2].set_title("clock drift [m/s]")
    n2 = sol.innovation.shape[1]
    axes[2][0].plot(sol.innovation[:, :n2 // 2], lw=0.3)
    axes[2][0].set_title("pr innovation [m]")
    axes[2][1].plot(sol.innovation[:, n2 // 2:], lw=0.3)
    axes[2][1].set_title("prr innovation [m/s]")
    axes[2][2].plot(np.abs(sol.kalman_gain).mean(axis=(1, 2)), lw=0.5)
    axes[2][2].set_title("mean |Kalman gain|")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def save_all(acq=None, records=None, prns=None, eph=None, nav=None,
             vt_sol=None, truth_ecef=None, out_dir: str = "results") -> None:
    os.makedirs(out_dir, exist_ok=True)
    if acq is not None:
        plot_acquisition(acq, os.path.join(out_dir, "task1_acquisition.png"))
    if records is not None and prns is not None:
        plot_tracking(records, prns, os.path.join(out_dir, "task2_tracking.png"))
    if eph is not None and prns is not None:
        plot_ephemeris(eph, prns, os.path.join(out_dir, "task3_ephemeris.png"))
    if nav is not None and truth_ecef is not None:
        plot_wls_solution(nav, truth_ecef, os.path.join(out_dir, "task4_wls.png"))
    if vt_sol is not None and truth_ecef is not None:
        plot_vt_solution(vt_sol, truth_ecef, os.path.join(out_dir, "task5_ekf.png"))
