"""Drive the Atlas MULTI-MAP path end-to-end: track a sweep, blind the
camera (hard LOST -> new map), re-initialize on an overlapping sweep, and
verify the two maps MERGE into one via place recognition + Sim3.

Mirrors BASELINE.json config 5's single-host core (multi-sequence Atlas
with map merging).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax

if os.environ.get("DRIVE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
from orbslam3_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.ops import bow
from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.ops import features as feat
from orbslam3_tpu.ops import lie
from orbslam3_tpu.system import System, Sensor
from orbslam3_tpu.pipeline.tracking import TrackState
from orbslam3_tpu.eval.ate import ate_rmse

H, W = 240, 320
FOCAL = 260.0
rng = np.random.default_rng(3)
params = cam.make_pinhole(FOCAL, FOCAL, W / 2, H / 2)

# Two ADJACENT wall sections: sweep A maps only section 1; after forced
# loss, sweep B initializes a NEW map on section 2 (unseen by A) and pans
# back into section 1, which must trigger a map MERGE.
n1, n2 = 110, 110
pts1 = np.stack(
    [rng.uniform(-3.5, 3.5, n1), rng.uniform(-2.2, 2.2, n1), rng.uniform(3.0, 6.0, n1)],
    axis=-1,
)
pts2 = np.stack(
    [rng.uniform(3.5, 10.5, n2), rng.uniform(-2.2, 2.2, n2), rng.uniform(3.0, 6.0, n2)],
    axis=-1,
)
pts = np.concatenate([pts1, pts2]).astype(np.float32)
n_pts = n1 + n2
quad_shades = rng.uniform(50, 250, (n_pts, 2, 2)).astype(np.float32)


def render(Rcw, tcw):
    img = np.full((H, W), 35.0, np.float32)
    Xc = (Rcw @ pts.T).T + tcw
    uv = np.asarray(cam.pinhole_project(params, jnp.asarray(Xc)))
    for i in np.argsort(-Xc[:, 2]):
        if Xc[i, 2] < 0.5:
            continue
        u, v = uv[i]
        half = max(3, int(round(12.0 / Xc[i, 2] * 2)))
        ui, vi = int(round(u)), int(round(v))
        if 1 <= ui < W - 1 and 1 <= vi < H - 1:
            for qy in (0, 1):
                for qx in (0, 1):
                    y0, y1 = (vi - half, vi) if qy == 0 else (vi, vi + half)
                    x0, x1 = (ui - half, ui) if qx == 0 else (ui, ui + half)
                    img[max(y0, 0) : min(y1, H), max(x0, 0) : min(x1, W)] = quad_shades[i, qy, qx]
    return img


def pose_at(x, s):
    Rcw = np.asarray(lie.exp_so3(jnp.asarray([0.0, -0.03 * s, 0.0], jnp.float32)))
    center = np.array([x, 0.1 * np.sin(4 * s), 0.3 * s], np.float32)
    return Rcw.astype(np.float32), (-Rcw @ center).astype(np.float32)


blank = np.full((H, W), 35.0, np.float32)  # texture-less -> tracking starves

# Frames: sweep A on wall 1 (x 0 -> 1.4), 28 blank frames (hard LOST ->
# new map), sweep B starting over wall 2 (x 6.5, unseen) panning back to
# wall 1 (x -> 0.5): the overlap must MERGE the maps.
schedule = []
n_a = 14
for k in range(n_a):
    s_ = k / (n_a - 1)
    schedule.append(("A", pose_at(1.4 * s_, s_)))
for k in range(28):
    schedule.append(("blank", None))
n_b = 26
for k in range(n_b):
    s_ = k / (n_b - 1)
    schedule.append(("B", pose_at(6.5 - 6.0 * s_, s_)))

orb = feat.OrbParams(n_features=400, n_levels=3)
slam = System(
    Sensor.MONOCULAR, cam.CameraModel.PINHOLE, params, (W, H),
    orb_params=orb, Kmax=64, Pmax=8192,
)

# Vocabulary from a few views across both walls.
train = []
for x in (0.0, 1.0, 2.5, 4.0, 5.5, 6.5):
    f = feat.extract(jnp.asarray(render(*pose_at(x, 0.0))), orb)
    train.append(np.asarray(f.desc)[np.asarray(f.valid)])
voc = bow.build_vocabulary(np.concatenate(train), k=8, depth=3, seed=0)
slam.enable_multimap(voc, min_kfs_to_store=5, min_merge_matches=15, min_sim3_inliers=12)

gt_ts, gt_pos = [], []
for i, (tag, pose) in enumerate(schedule):
    ts = i * 0.1
    if tag == "blank":
        img = blank
    else:
        R, t = pose
        img = render(R, t)
        gt_ts.append(ts)
        gt_pos.append(-R.T @ t)
    slam.track_monocular(img, ts)
    print(
        f"frame {i} [{tag}]: state={slam.tracking_state.name} maps={slam.multimap.atlas.n_maps} "
        f"kfs={slam.n_keyframes} merges={slam.multimap.n_merges}", flush=True,
    )

assert slam.multimap.n_merges >= 1, "maps never merged"
assert slam.multimap.atlas.n_maps == 1, "merged Atlas should hold one map"
assert slam.tracking_state == TrackState.OK

ts_est, pos_est = slam.get_trajectory()
err = ate_rmse(ts_est, pos_est, np.asarray(gt_ts), np.stack(gt_pos), with_scale=True, max_dt=0.01)
print(f"multi-map ATE RMSE (Sim3, both sweeps after merge): {err:.4f} m over 7.9 m")
# The structural asserts above are the point of this drive. The combined
# ATE is dominated by the two monocular maps' INDEPENDENT internal scale
# drifts, which a single Sim3 weld cannot remove (the reference has the
# same limitation until further co-observation accumulates); gate loosely.
assert err < 1.2, err
print("DRIVE OK")
