"""Public API facade — the TPU-native `ORB_SLAM3::System`.

Mirrors `/root/reference/src/System.cc` + `include/System.h:85-178`:
sensor modes, per-frame Track* entry points, trajectory export, reset.
Construction wires tracker + local mapper (+ loop closer as it lands)
over a shared `MapStore`, replacing the reference's three std::threads
(`System.cc:138-177`) with host-sequenced device programs.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.atlas.store import MapStore
from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.ops import features as feat
from orbslam3_tpu.io import trajectory as traj_io
from orbslam3_tpu.pipeline.local_mapping import LocalMapper
from orbslam3_tpu.pipeline.tracking import Tracker, TrackState


class Sensor(enum.Enum):
    """Ref `System::eSensor` (`System.h:85-91`)."""

    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_MONOCULAR = 3
    IMU_STEREO = 4


class System:
    def __init__(
        self,
        sensor: Sensor,
        camera_model: cam.CameraModel,
        camera_params,
        img_wh: Tuple[int, int],
        orb_params: feat.OrbParams = feat.OrbParams(),
        bf: float = 0.0,
        Kmax: int = 256,
        Pmax: int = 16384,
    ):
        self.sensor = sensor
        self.store = MapStore(Kmax=Kmax, Pmax=Pmax, Nf=sum(feat.level_budgets(orb_params)))
        params = jnp.asarray(camera_params, jnp.float32)
        self.tracker = Tracker(camera_model, params, img_wh, self.store, orb_params, bf=bf)
        self.mapper = LocalMapper(camera_model, params, img_wh, self.store, orb_params, bf=bf)
        self.tracker.new_kf_callback = self.mapper.process_keyframe

    # ------------------------------------------------------------------
    def track_monocular(self, img: np.ndarray, timestamp: float):
        """Ref `System::TrackMonocular` (`System.cc` mono entry)."""
        assert self.sensor in (Sensor.MONOCULAR, Sensor.IMU_MONOCULAR)
        return self.tracker.process_frame(img, timestamp)

    @property
    def tracking_state(self) -> TrackState:
        return self.tracker.state

    @property
    def n_keyframes(self) -> int:
        return self.store.n_kf

    @property
    def n_map_points(self) -> int:
        return int(np.asarray(self.store.state.mp_valid).sum())

    # ------------------------------------------------------------------
    def get_trajectory(self):
        """(timestamps, positions (N,3)) of tracked frames (camera centers
        in world)."""
        ts = np.asarray([t for t, _, _ in self.tracker.trajectory])
        pos = np.asarray([p for _, _, p in self.tracker.trajectory])
        return ts, pos

    def save_trajectory_tum(self, path: str):
        """Ref `System::SaveTrajectoryTUM` / `SaveTrajectoryEuRoC`."""
        rows = self.tracker.trajectory
        traj_io.save_tum(path, [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows])

    def save_keyframe_trajectory_tum(self, path: str):
        s = self.store.state
        valid = np.asarray(s.kf_valid)
        ids = np.flatnonzero(valid[: self.store.n_kf])
        Rwc = [np.asarray(s.kf_R[i]).T for i in ids]
        twc = [-np.asarray(s.kf_R[i]).T @ np.asarray(s.kf_t[i]) for i in ids]
        traj_io.save_tum(path, self.store.kf_ts[ids], Rwc, twc)
