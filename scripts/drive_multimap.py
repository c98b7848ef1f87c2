"""Drive the Atlas MULTI-MAP path end-to-end: track a sweep, blind the
camera (hard LOST -> new map), re-initialize on an overlapping sweep, and
verify the two maps MERGE into one via place recognition + Sim3, followed
by the post-merge global BA (ref `LoopClosing.cc:1967`).

Mirrors BASELINE.json config 5's single-host core (multi-sequence Atlas
with map merging); the cross-host composition is
`drive_multimap_distributed.py` — the SAME replay (scripts/
multimap_replay.py) with the GBA point-partitioned over 2
`jax.distributed` processes.
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

from orbslam3_tpu.pipeline.tracking import TrackState
from orbslam3_tpu.eval.ate import ate_rmse
from multimap_replay import Scene, make_system, replay

scene = Scene()
slam = make_system(scene)
gt_ts, gt_pos, merge_frames = replay(scene, slam)

assert slam.multimap.n_merges >= 1, "maps never merged"
assert slam.multimap.atlas.n_maps == 1, "merged Atlas should hold one map"
assert slam.tracking_state == TrackState.OK

ts_est, pos_est = slam.get_trajectory()
err = ate_rmse(ts_est, pos_est, gt_ts, gt_pos, with_scale=True, max_dt=0.01)
print(f"multi-map ATE RMSE (Sim3, both sweeps after merge): {err:.4f} m over 7.9 m")
# The structural asserts above are the point of this drive. The combined
# ATE is dominated by the two monocular maps' INDEPENDENT internal scale
# drifts, which a single Sim3 weld cannot remove (the reference has the
# same limitation until further co-observation accumulates); gate loosely.
assert err < 1.2, err
print("DRIVE OK")
