"""Report generation (Task 1-5 plot equivalents) from cached artifacts."""

import os

import pytest

from gps_sdr_tpu.pipeline import Receiver

from tests import scenario


def test_report_writes_all_pngs(tmp_path):
    if not os.path.exists(os.path.join(scenario.CACHE_DIR,
                                       "navct_epl_geo_scn.pkl")):
        pytest.skip("scenario artifacts not built yet (run test_e2e_ct first)")
    src = scenario.build_scenario_source()
    rx = Receiver(scenario.CFG, src, artifact_dir=scenario.CACHE_DIR)
    out = str(tmp_path / "report")
    rx.report(out)
    files = sorted(os.listdir(out))
    assert files == ["task1_acquisition.png", "task2_tracking.png",
                     "task3_ephemeris.png", "task4_wls.png",
                     "task5_ekf.png"]
    for f in files:
        assert os.path.getsize(os.path.join(out, f)) > 10_000
