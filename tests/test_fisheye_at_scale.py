"""Config-4 at-scale gate (round-3 verdict weak #2): a TUM-VI-style
stereo-inertial KB8 fisheye replay through the real runner — hundreds of
frames, IMU init engaged — must hold SE3 ATE in centimetres with
Sim3-fit scale within 2% of 1.0. Stereo + IMU both observe metric scale
(`Frame.cc:1187` lapping-area stereo, `LocalMapping.cc:1448` inertial
init), so residual scale error means the rig rows or the inertial
factors aren't constraining the map.

The 16-frame runner test (`test_runners.py::test_tumvi_stereo_vi_fisheye_
runner`) only proves the wiring; this 240-frame test is the in-suite
at-scale evidence (IMU init + VIBA1 engaged). The longer 600-frame
replay with VIBA2 engaged is recorded in BASELINE.md row (4) when run
(`scripts/make_synth_euroc.py --fisheye --frames 600` +
`run_sequence.py --mode stereo-vi`).
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "run_sequence.py")
GEN = os.path.join(REPO, "scripts", "make_synth_euroc.py")


@pytest.mark.slow
def test_fisheye_stereo_vi_at_scale(tmp_path):
    seq = tmp_path / "feseq"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, GEN, str(seq), "--frames", "240", "--fisheye",
         "--seed", "13"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]

    out = subprocess.run(
        [sys.executable, RUNNER, str(seq / "settings.yaml"), str(seq),
         "--dataset", "tumvi", "--mode", "stereo-vi", "--no-loop",
         "--out", str(tmp_path / "traj.txt"),
         "--kf-out", str(tmp_path / "kf.txt")],
        capture_output=True, text=True, timeout=10800, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    log = out.stdout

    # Inertial staging must actually engage at this length.
    m = re.search(r"imu stages: init=(\w+) viba1=(\w+)", log)
    assert m, log[-2000:]
    assert m.group(1) == "True", log[-2000:]
    assert m.group(2) == "True", log[-2000:]  # VIBA1 must engage at 12 s

    m = re.search(r"ATE RMSE: ([0-9.]+) m", log)
    assert m, log[-2000:]
    assert float(m.group(1)) < 0.10, log[-2000:]
    m = re.search(r"scale vs GT: ([0-9.]+)", log)
    assert m, log[-2000:]
    scale = float(m.group(1))
    assert abs(scale - 1.0) < 0.02, scale
