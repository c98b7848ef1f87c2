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


# ---------------------------------------------------------------------------
# Decomposition (round-5: who owns the combined ATE?): per-segment ATE
# under each segment's OWN Sim3 alignment vs under the single global
# alignment. If segments are cm-accurate alone but meter-off globally,
# the error lives in the INTER-map transform the merge left behind
# (residual Sim3 + the two monocular maps' independent internal scales),
# not in either map's structure.
# ---------------------------------------------------------------------------
from orbslam3_tpu.eval.ate import associate, umeyama

ia, ib = associate(ts_est, gt_ts, 0.01)
est_m = np.asarray(pos_est)[ia]
gt_m = np.asarray(gt_pos)[ib]
seg_a = gt_ts[ib] < 1.45  # sweep A (pre-LOST map)
seg_b = gt_ts[ib] >= 4.1  # sweep B (post-LOST map)

s_g, R_g, t_g = umeyama(est_m, gt_m, with_scale=True)
al_g = est_m @ (s_g * R_g).T + t_g
per_seg_global = {
    "A": float(np.sqrt(np.mean(np.sum((al_g[seg_a] - gt_m[seg_a]) ** 2, 1)))),
    "B": float(np.sqrt(np.mean(np.sum((al_g[seg_b] - gt_m[seg_b]) ** 2, 1)))),
}
own = {}
for name, m in (("A", seg_a), ("B", seg_b)):
    s_s, R_s, t_s = umeyama(est_m[m], gt_m[m], with_scale=True)
    al = est_m[m] @ (s_s * R_s).T + t_s
    own[name] = (float(np.sqrt(np.mean(np.sum((al - gt_m[m]) ** 2, 1)))),
                 float(s_s))
print("decomposition:")
print(f"  segment A own-aligned ATE {own['A'][0] * 100:.1f} cm "
      f"(align scale {own['A'][1]:.3f}); under global alignment "
      f"{per_seg_global['A'] * 100:.1f} cm")
print(f"  segment B own-aligned ATE {own['B'][0] * 100:.1f} cm "
      f"(align scale {own['B'][1]:.3f}); under global alignment "
      f"{per_seg_global['B'] * 100:.1f} cm")
ratio = own["A"][1] / own["B"][1]
print(f"  residual inter-segment scale ratio after merge+GBA: {ratio:.3f} "
      f"(1.000 = merge Sim3 fully reconciled the two maps' scales)")

# Round-5: the historical ~0.9 m combined ATE was ONE corrupted
# trajectory entry recorded across the merge boundary (the frame being
# processed when the merge fired kept its old-map pose while its
# reference KF was already transformed; a single |t_cr|=1.4 outlier
# dragged the least-squares Sim3 alignment by ~0.5 m for every frame).
# With the entry re-derived from the transformed pose
# (`tracking._create_keyframe_impl` post-callback refresh), the merged
# map is centimetre-level end to end — gate accordingly.
assert err < 0.15, err
print("DRIVE OK")
