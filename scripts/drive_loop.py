"""Drive a loop closure IN ANGER: long circular sweep returning to start.

The reference's loop pipeline (`/root/reference/src/LoopClosing.cc`) is
exercised end-to-end: DBoW2-style candidate fetch -> 3-consecutive-KF
temporal consistency (`:367`) -> Sim3 RANSAC -> pose-graph correction
(`CorrectLoop:1093`) -> SearchAndFuse (`:1259`) -> global BA.

Evidence: the same sequence is run with loop closing ON and OFF; the
drive asserts (a) >=1 loop actually closed, (b) ATE with the closure is
well below the open-loop drift, (c) no duplicate point associations
survive in any keyframe row. Prints DRIVE OK.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax

if os.environ.get("DRIVE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
from orbslam3_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax.numpy as jnp

from make_synth_euroc import make_textures, render
from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.ops import features as feat
from orbslam3_tpu.ops import bow
from orbslam3_tpu.system import System, Sensor
from orbslam3_tpu.pipeline.tracking import TrackState
from orbslam3_tpu.eval.ate import ate_rmse

W, H = 320, 240
FX = FY = 200.0
CX, CY = 160.0, 120.0
N_FRAMES = 240
T_LOOP = 170  # frames for a full circle; remaining frames revisit the start


def pose_at(k):
    """Circle of radius 2.5 m inside the box room, heading tangent."""
    th = 2 * np.pi * k / T_LOOP
    p = np.array([2.5 * np.cos(th), 2.5 * np.sin(th), 1.5 + 0.05 * np.sin(8 * np.pi * k / T_LOOP)])
    d = np.array([-np.sin(th), np.cos(th), 0.0])
    z_cam = d / np.linalg.norm(d)
    y_cam = np.array([0.0, 0.0, -1.0])
    x_cam = np.cross(y_cam, z_cam)
    R_wc = np.stack([x_cam, y_cam, z_cam], axis=1)
    return R_wc, p


def run(enable_loop: bool, imgs, poses, voc):
    orb = feat.OrbParams(n_features=600, n_levels=8)
    params = np.asarray([FX, FY, CX, CY, 0, 0, 0, 0], np.float32)
    slam = System(
        Sensor.MONOCULAR, cam.CameraModel.PINHOLE, params, (W, H),
        orb_params=orb, Kmax=192, Pmax=16384,
    )
    if enable_loop:
        slam.enable_place_recognition(
            voc, run_gba=True, min_bow_matches=15, min_sim3_inliers=12,
            consecutive=3,
        )
    n_tracked = 0
    for k in range(N_FRAMES):
        slam.track_monocular(imgs[k], k / 20.0)
        if slam.tracking_state == TrackState.OK:
            n_tracked += 1
    slam.shutdown()  # drains any in-flight background GBA (ref System.cc:474)
    ts, pos = slam.get_trajectory()
    gt = np.asarray([poses[int(round(t * 20))][1] for t in ts])
    err = ate_rmse(ts, pos, ts, gt, with_scale=True)
    loops = slam.loop_closer.n_loops_closed if slam.loop_closer else 0
    # Duplicate-association audit: a map point must appear at most once
    # per keyframe row (SearchAndFuse must not leave duplicates).
    km = np.asarray(slam.store.state.kf_mp)
    ndup = 0
    for kk in range(slam.store.n_kf):
        r = km[kk][km[kk] >= 0]
        ndup += len(r) - len(np.unique(r))
    return err, loops, n_tracked, ndup


def main():
    rng = np.random.default_rng(3)
    tex = make_textures(rng)
    poses = [pose_at(k) for k in range(N_FRAMES)]
    print("rendering...", flush=True)
    imgs = [
        np.clip(
            render(tex, R, p, wh=(W, H), intr=(FX, FY, CX, CY))
            + rng.normal(0, 1.5, (H, W)),
            0, 255,
        ).astype(np.float32)
        for R, p in poses
    ]

    # Vocabulary from a handful of views.
    orb = feat.OrbParams(n_features=600, n_levels=8)
    train = []
    for k in range(0, N_FRAMES, 12):
        f = feat.extract(jnp.asarray(imgs[k]), orb)
        train.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.build_vocabulary(np.concatenate(train), k=8, depth=3, seed=0)
    print(f"vocabulary: {voc.n_words} words", flush=True)

    err_off, loops_off, trk_off, _ = run(False, imgs, poses, voc)
    print(f"loop OFF: ATE={err_off:.3f} m tracked={trk_off}/{N_FRAMES}", flush=True)
    err_on, loops_on, trk_on, ndup = run(True, imgs, poses, voc)
    print(
        f"loop ON : ATE={err_on:.3f} m tracked={trk_on}/{N_FRAMES} "
        f"loops={loops_on} row_dups={ndup}",
        flush=True,
    )

    assert loops_on >= 1, "no loop closed"
    assert trk_on >= 0.85 * N_FRAMES, "tracking lost too often"
    assert ndup == 0, f"{ndup} duplicate associations after SearchAndFuse"
    assert err_on <= max(0.5 * err_off, 0.05), (
        f"loop closure did not reduce drift: {err_on:.3f} vs {err_off:.3f}"
    )
    print("DRIVE OK")


if __name__ == "__main__":
    main()
