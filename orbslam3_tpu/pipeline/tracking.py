"""Tracking pipeline: the per-frame frontend state machine.

Re-design of `/root/reference/src/Tracking.cc` (4,010 LoC). The state
machine (NO_IMAGES_YET -> NOT_INITIALIZED -> OK <-> RECENTLY_LOST -> LOST,
`Tracking.h:101-109`) stays host-side Python; every arrow's heavy work is
a jitted device program:

* `GrabImageMonocular` (`Tracking.cc:507`)  -> `ops.features.extract`
* `MonocularInitialization` (`:1724`)       -> windowed match + batched
  H/F RANSAC (`ops.ransac.reconstruct_two_views`)
* `TrackWithMotionModel` (`:2331`)          -> projection-masked Hamming
  matmul + `optim.pose_only`
* `TrackReferenceKeyFrame` (`:2171`)        -> full Hamming matmul (BoW
  node pruning dropped by design, see ops/bow.py) + `optim.pose_only`
* `TrackLocalMap` (`:2436`)                 -> frustum/scale kernels over
  the whole point array + projection match + `optim.pose_only`
* `NeedNewKeyFrame`/`CreateNewKeyFrame` (`:2577,2716`) -> host policy +
  SoA insert

The map is `atlas.store.MapState`; local-mapping runs synchronously after
KF insertion in round 1 (async executor later).
"""

from __future__ import annotations

import enum
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.atlas import store as st
from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.ops import features as feat
from orbslam3_tpu.ops import lie, matching, ransac
from orbslam3_tpu.optim import pose_only
from orbslam3_tpu.pipeline import frame as fr


class TrackState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    RECENTLY_LOST = 3
    LOST = 4


# ---------------------------------------------------------------------------
# Jitted steps
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=())
def _match_for_initialization(f_ref: feat.Features, f_cur: feat.Features):
    """`ORBmatcher::SearchForInitialization` (`ORBmatcher.cc:838`):
    window radius 100px, ratio 0.9, rotation consistency."""
    mask = matching.window_mask(f_ref.uv, f_cur.uv, 100.0)
    m = matching.match_nn(
        f_ref.desc, f_cur.desc, f_ref.valid, f_cur.valid,
        max_dist=matching.TH_LOW, ratio=0.9, cross_check=True, extra_mask=mask,
    )
    return matching.rotation_consistency(f_ref.angle, f_cur.angle, m)


@functools.partial(jax.jit, static_argnames=("model",))
def _track_last_frame(
    model: cam.CameraModel,
    params: jnp.ndarray,
    R_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    last_uv: jnp.ndarray,  # unused (kept for octave-aware radius later)
    last_mp: jnp.ndarray,  # (Nf,) mp ids of last frame
    mp_pos: jnp.ndarray,
    mp_valid: jnp.ndarray,
    mp_desc: jnp.ndarray,
    f_cur: feat.Features,
    radius_px: float,
    scale_factors: jnp.ndarray,  # (L,)
    last_octave: jnp.ndarray,  # (Nf,)
):
    """`TrackWithMotionModel` match step (`ORBmatcher::SearchByProjection`
    last-frame overload, `ORBmatcher.cc:2244`): project last frame's map
    points with the predicted pose; octave-gated window search."""
    ok = last_mp >= 0
    ids = jnp.clip(last_mp, 0)
    Xw = mp_pos[ids]
    valid_q = ok & mp_valid[ids]
    Xc = lie.se3_apply(R_pred, t_pred, Xw)
    uv = cam.project(model, params, Xc)
    valid_q &= Xc[..., 2] > 0.1
    r = radius_px * scale_factors[jnp.clip(last_octave, 0, scale_factors.shape[0] - 1)]
    m = matching.search_by_projection(
        mp_desc[ids], uv, valid_q, f_cur.desc, f_cur.uv, f_cur.valid,
        radius=r,
        octave_kp=f_cur.octave,
        octave_lo=jnp.maximum(last_octave - 1, 0),
        octave_hi=last_octave + 1,
        max_dist=matching.TH_HIGH, ratio=0.9,
    )
    m = matching.assign_unique(m, f_cur.desc.shape[0])
    # Feature f of current frame -> map point id (scatter query->kp).
    assoc = jnp.full((f_cur.desc.shape[0],), -1, jnp.int32)
    q_ids = jnp.where(m.valid, ids, 0)
    assoc = assoc.at[jnp.clip(m.idx, 0)].set(
        jnp.where(m.valid, q_ids, assoc[jnp.clip(m.idx, 0)])
    )
    return assoc, jnp.sum(m.valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=())
def _track_reference_kf(
    kf_desc: jnp.ndarray,  # (Nf,32)
    kf_feat_valid: jnp.ndarray,
    kf_mp: jnp.ndarray,  # (Nf,)
    mp_valid: jnp.ndarray,
    f_cur: feat.Features,
):
    """`TrackReferenceKeyFrame` match (`Tracking.cc:2171` ->
    `ORBmatcher::SearchByBoW` `ORBmatcher.cc:323`): full Hamming matrix
    with ratio 0.7 (the reference's mfNNratio for this matcher)."""
    has_mp = (kf_mp >= 0) & kf_feat_valid & mp_valid[jnp.clip(kf_mp, 0)]
    m = matching.match_nn(
        kf_desc, f_cur.desc, has_mp, f_cur.valid,
        max_dist=matching.TH_LOW, ratio=0.7, cross_check=True,
    )
    m = matching.assign_unique(m, f_cur.desc.shape[0])
    assoc = jnp.full((f_cur.desc.shape[0],), -1, jnp.int32)
    src = jnp.where(m.valid, jnp.clip(kf_mp, 0), 0)
    assoc = assoc.at[jnp.clip(m.idx, 0)].set(
        jnp.where(m.valid, src, assoc[jnp.clip(m.idx, 0)])
    )
    return assoc, jnp.sum(m.valid.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("model", "n_levels"))
def _track_local_map_match(
    model: cam.CameraModel,
    params: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    state: st.MapState,
    local_mask: jnp.ndarray,  # (P,) bool — local map points
    f_cur: feat.Features,
    cur_assoc: jnp.ndarray,  # (Nf,) current associations (kept fixed)
    img_wh: jnp.ndarray,
    n_levels: int = 8,
):
    """`SearchLocalPoints` + projection match (`Tracking.cc:2848`,
    `ORBmatcher.cc:59`): frustum-test every local point, match the
    not-yet-associated ones into free keypoints."""
    uv, visible, lvl, vcos = fr.frustum_and_scale(
        model, params, R, t,
        state.mp_pos, state.mp_valid & local_mask, state.mp_normal,
        state.mp_min_dist, state.mp_max_dist, img_wh, n_levels=n_levels,
    )
    # Skip points already matched in this frame.
    already = jnp.zeros((state.Pmax,), bool).at[jnp.clip(cur_assoc, 0)].set(cur_assoc >= 0)
    query_valid = visible & ~already
    r = fr.search_radius(vcos, lvl)
    kp_free = f_cur.valid & (cur_assoc < 0)
    m = matching.search_by_projection(
        state.mp_desc, uv, query_valid, f_cur.desc, f_cur.uv, kp_free,
        radius=r, octave_kp=f_cur.octave,
        octave_lo=jnp.maximum(lvl - 1, 0), octave_hi=lvl + 1,
        max_dist=matching.TH_HIGH, ratio=0.8,
    )
    m = matching.assign_unique(m, f_cur.desc.shape[0])
    assoc = cur_assoc
    src = jnp.where(m.valid, jnp.arange(state.Pmax, dtype=jnp.int32), 0)
    assoc = assoc.at[jnp.clip(m.idx, 0)].set(
        jnp.where(m.valid, src, assoc[jnp.clip(m.idx, 0)])
    )
    return assoc, visible


@functools.partial(jax.jit, static_argnames=())
def _local_point_mask(state: st.MapState, kf_ids: jnp.ndarray) -> jnp.ndarray:
    """(P,) bool — points observed by any KF in kf_ids (padded with -1)."""
    ok_kf = kf_ids >= 0
    mp = state.kf_mp[jnp.clip(kf_ids, 0)]  # (W,Nf)
    ok = (mp >= 0) & ok_kf[:, None]
    mask = jnp.zeros((state.Pmax,), bool).at[jnp.clip(mp, 0)].max(ok)
    return mask & state.mp_valid


@functools.partial(jax.jit, static_argnames=("model",))
def _pose_opt_from_assoc(
    model, params, R0, t0, assoc, f_cur: feat.Features, mp_pos, mp_valid, sigma2_table, ur=None, bf=0.0
):
    ok = (assoc >= 0) & f_cur.valid & mp_valid[jnp.clip(assoc, 0)]
    Xw = mp_pos[jnp.clip(assoc, 0)]
    s2 = sigma2_table[jnp.clip(f_cur.octave, 0, sigma2_table.shape[0] - 1)]
    obs = pose_only.PoseObs(
        Xw=Xw,
        uv=f_cur.uv,
        ur=ur if ur is not None else jnp.full(assoc.shape, -1.0),
        sigma2=s2,
        valid=ok,
    )
    return pose_only.optimize_pose(model, params, R0, t0, obs, bf=bf)


# ---------------------------------------------------------------------------
# Host tracker
# ---------------------------------------------------------------------------


class Tracker:
    """Host driver of the tracking state machine (mono; stereo/RGB-D/IMU
    wired in system.py as they come online)."""

    def __init__(
        self,
        model: cam.CameraModel,
        params: jnp.ndarray,
        img_wh: Tuple[int, int],
        store: st.MapStore,
        orb_params: feat.OrbParams = feat.OrbParams(),
        bf: float = 0.0,
    ):
        self.model = model
        self.params = params
        self.img_wh = np.asarray(img_wh, np.float32)
        self.store = store
        self.orb = orb_params
        self.bf = bf
        self.state = TrackState.NO_IMAGES_YET
        self.sigma2_table = jnp.asarray(feat.sigma2(orb_params))
        self.scale_table = jnp.asarray(feat.scale_factors(orb_params))

        self.last_frame: Optional[fr.FrameData] = None
        self.init_frame: Optional[fr.FrameData] = None
        self.ref_kf: int = -1
        self.velocity: Optional[Tuple[np.ndarray, np.ndarray]] = None  # (R, t) of Tcl
        self.frames_since_kf = 0
        self.frame_id = 0
        self.lost_count = 0
        self.trajectory = []  # (ts, Rwc, twc)
        self.new_kf_callback = None  # set by System: runs local mapping
        self.match_inliers = 0

    # -- helpers --------------------------------------------------------
    def _extract(self, img: np.ndarray) -> feat.Features:
        return feat.extract(jnp.asarray(img, jnp.float32), self.orb)

    def _record_pose(self, ts, R, t):
        Rwc = np.asarray(R).T
        twc = -Rwc @ np.asarray(t)
        self.trajectory.append((ts, Rwc, twc))

    # -- main entry -----------------------------------------------------
    def process_frame(self, img: np.ndarray, timestamp: float) -> fr.FrameData:
        f = self._extract(img)
        cur = fr.FrameData(
            features=f,
            timestamp=timestamp,
            frame_id=self.frame_id,
            R=np.eye(3, dtype=np.float32),
            t=np.zeros(3, np.float32),
            mp_assoc=np.full(f.n, -1, np.int32),
        )
        self.frame_id += 1

        if self.state in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED):
            self._initialize_mono(cur)
        else:
            ok = self._track(cur)
            if ok:
                self.state = TrackState.OK
                self.lost_count = 0
            else:
                self.lost_count += 1
                self.state = (
                    TrackState.RECENTLY_LOST if self.lost_count < 20 else TrackState.LOST
                )
        if self.state == TrackState.OK:
            self._record_pose(cur.timestamp, cur.R, cur.t)
        self.last_frame = cur
        return cur

    # -- initialization --------------------------------------------------
    def _initialize_mono(self, cur: fr.FrameData):
        """`MonocularInitialization` (`Tracking.cc:1724`)."""
        if cur.n_features < 100:
            self.init_frame = None
            self.state = TrackState.NOT_INITIALIZED
            return
        if self.init_frame is None:
            self.init_frame = cur
            self.state = TrackState.NOT_INITIALIZED
            return
        ref = self.init_frame
        m = _match_for_initialization(ref.features, cur.features)
        n_matches = int(np.asarray(m.valid).sum())
        if n_matches < 100:
            self.init_frame = cur  # ref replaced, as in Tracking.cc:1760
            return
        # Normalized coordinates for both frames.
        rays_ref = cam.unproject(self.model, self.params, ref.features.uv)[:, :2]
        rays_cur_all = cam.unproject(self.model, self.params, cur.features.uv)[:, :2]
        idx = jnp.clip(m.idx, 0)
        rays_cur = rays_cur_all[idx]
        f_equiv = float(self.params[0])
        res = ransac.reconstruct_two_views(
            rays_ref, rays_cur, m.valid, jax.random.PRNGKey(0),
            sigma_norm=1.0 / f_equiv,
        )
        if not bool(res.success):
            return
        self._create_initial_map(ref, cur, m, res)

    def _create_initial_map(self, ref, cur, m, res):
        """`CreateInitialMapMonocular` (`Tracking.cc:1900`): two KFs, map
        points from triangulation, scale normalization by median depth."""
        good = np.asarray(res.is_good)
        X = np.asarray(res.points)
        med_depth = float(np.median(X[good][:, 2])) if good.any() else 1.0
        inv_med = 1.0 / max(med_depth, 1e-6)
        X = X * inv_med
        R21 = np.asarray(res.R)
        t21 = np.asarray(res.t) * inv_med

        n_new = int(good.sum())
        slots = self.store.alloc_mps(n_new)
        sel = np.flatnonzero(good)
        idx_ref = sel  # feature index in ref frame
        idx_cur = np.asarray(m.idx)[sel]

        # Descriptors/normals from the ref frame.
        desc = np.asarray(ref.features.desc)[idx_ref]
        pos = X[sel]
        normals = pos / np.maximum(np.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)
        dist = np.linalg.norm(pos, axis=-1)
        octs = np.asarray(ref.features.octave)[idx_ref]
        sf = np.asarray(self.scale_table)
        max_dist = dist * sf[np.clip(octs, 0, len(sf) - 1)]
        min_dist = max_dist / sf[-1]

        # KF slots.
        k0 = self.store.alloc_kf()
        k1 = self.store.alloc_kf()
        Nf = ref.features.n
        assoc0 = np.full(Nf, -1, np.int32)
        assoc0[idx_ref] = slots
        assoc1 = np.full(Nf, -1, np.int32)
        assoc1[idx_cur] = slots

        s = self.store.state
        s = st.add_keyframe(
            s, k0, jnp.eye(3), jnp.zeros(3),
            ref.features.uv, jnp.full(Nf, -1.0), ref.features.octave,
            ref.features.angle, ref.features.desc, ref.features.valid,
            jnp.asarray(assoc0), prev_kf=-1,
        )
        s = st.add_keyframe(
            s, k1, jnp.asarray(R21), jnp.asarray(t21),
            cur.features.uv, jnp.full(Nf, -1.0), cur.features.octave,
            cur.features.angle, cur.features.desc, cur.features.valid,
            jnp.asarray(assoc1), prev_kf=k0,
        )
        s = st.add_points(
            s, jnp.asarray(slots), jnp.asarray(pos, jnp.float32), jnp.asarray(desc),
            jnp.asarray(normals, jnp.float32), jnp.asarray(min_dist, jnp.float32),
            jnp.asarray(max_dist, jnp.float32),
            jnp.full(n_new, k0, jnp.int32), jnp.ones(n_new, bool),
        )
        self.store.state = s
        self.store.kf_ts[k0] = ref.timestamp
        self.store.kf_ts[k1] = cur.timestamp
        self.store.bump()

        # Global BA on the initial map (ref: GlobalBundleAdjustemnt(20)).
        if self.new_kf_callback is not None:
            self.new_kf_callback(k1, initial=True)

        cur.R = np.asarray(self.store.state.kf_R[k1])
        cur.t = np.asarray(self.store.state.kf_t[k1])
        cur.mp_assoc = assoc1
        self.ref_kf = k1
        self.velocity = None
        self.state = TrackState.OK
        self.frames_since_kf = 0
        self._record_pose(ref.timestamp, np.eye(3), np.zeros(3))
        self.init_frame = None

    # -- tracking --------------------------------------------------------
    def _track(self, cur: fr.FrameData) -> bool:
        """Two-stage tracking (`Tracking::Track` `Tracking.cc:958`)."""
        s = self.store.state
        last = self.last_frame
        ok = False

        # Stage 1a: motion model.
        if self.velocity is not None and last is not None:
            Rv, tv = self.velocity
            R_pred = Rv @ last.R
            t_pred = Rv @ last.t + tv
            assoc, n = _track_last_frame(
                self.model, self.params, jnp.asarray(R_pred), jnp.asarray(t_pred),
                last.features.uv, jnp.asarray(last.mp_assoc),
                s.mp_pos, s.mp_valid, s.mp_desc, cur.features,
                15.0, self.scale_table, last.features.octave,
            )
            if int(n) >= 20:
                res = _pose_opt_from_assoc(
                    self.model, self.params, jnp.asarray(R_pred), jnp.asarray(t_pred),
                    assoc, cur.features, s.mp_pos, s.mp_valid, self.sigma2_table,
                )
                if int(res.n_inliers) >= 10:
                    cur.R = np.asarray(res.R)
                    cur.t = np.asarray(res.t)
                    cur.mp_assoc = np.where(np.asarray(res.inlier), np.asarray(assoc), -1)
                    ok = True

        # Stage 1b: reference keyframe fallback.
        if not ok and self.ref_kf >= 0:
            assoc, n = _track_reference_kf(
                s.kf_desc[self.ref_kf], s.kf_feat_valid[self.ref_kf],
                s.kf_mp[self.ref_kf], s.mp_valid, cur.features,
            )
            if int(n) >= 15:
                R0 = jnp.asarray(last.R if last is not None else np.eye(3, dtype=np.float32))
                t0 = jnp.asarray(last.t if last is not None else np.zeros(3, np.float32))
                res = _pose_opt_from_assoc(
                    self.model, self.params, R0, t0,
                    assoc, cur.features, s.mp_pos, s.mp_valid, self.sigma2_table,
                )
                if int(res.n_inliers) >= 10:
                    cur.R = np.asarray(res.R)
                    cur.t = np.asarray(res.t)
                    cur.mp_assoc = np.where(np.asarray(res.inlier), np.asarray(assoc), -1)
                    ok = True

        if not ok:
            return False

        # Stage 2: track local map (`TrackLocalMap` Tracking.cc:2436).
        local_kfs = self._local_keyframes(cur)
        pad = np.full(16, -1, np.int32)
        pad[: min(len(local_kfs), 16)] = local_kfs[:16]
        local_mask = _local_point_mask(s, jnp.asarray(pad))
        assoc2, visible = _track_local_map_match(
            self.model, self.params, jnp.asarray(cur.R), jnp.asarray(cur.t),
            s, local_mask, cur.features, jnp.asarray(cur.mp_assoc),
            jnp.asarray(self.img_wh), n_levels=self.orb.n_levels,
        )
        res = _pose_opt_from_assoc(
            self.model, self.params, jnp.asarray(cur.R), jnp.asarray(cur.t),
            assoc2, cur.features, s.mp_pos, s.mp_valid, self.sigma2_table,
        )
        n_inl = int(res.n_inliers)
        self.match_inliers = n_inl
        if n_inl < 15:  # ref threshold 30 normal / 15 after reloc (:2541-2574)
            return False
        cur.R = np.asarray(res.R)
        cur.t = np.asarray(res.t)
        cur.mp_assoc = np.where(np.asarray(res.inlier), np.asarray(assoc2), -1)

        # Motion model update (Tcl = Tcw_cur * Twc_last).
        if last is not None:
            Rl, tl = last.R, last.t
            Rwc, twc = Rl.T, -Rl.T @ tl
            self.velocity = (cur.R @ Rwc, cur.R @ twc + cur.t)

        # Keyframe policy.
        self.frames_since_kf += 1
        if self._need_new_keyframe(cur, n_inl):
            self._create_keyframe(cur)
        return True

    def _local_keyframes(self, cur: fr.FrameData) -> np.ndarray:
        """K1 covisible KFs of the current matches (`UpdateLocalKeyFrames`
        `Tracking.cc:3042`): KFs sharing map points with the frame, by
        share count."""
        s = self.store.state
        assoc = cur.mp_assoc
        pts = assoc[assoc >= 0]
        if len(pts) == 0:
            return np.asarray([self.ref_kf], np.int32)
        kf_mp = np.asarray(s.kf_mp[: self.store.n_kf])
        valid = np.asarray(s.kf_valid[: self.store.n_kf])
        ptset = np.zeros(s.Pmax + 1, bool)
        ptset[pts] = True
        shares = ptset[np.clip(kf_mp, 0, s.Pmax)].sum(axis=1) * valid
        order = np.argsort(-shares)
        top = order[shares[order] > 0][:10]
        if len(top) == 0:
            top = np.asarray([self.ref_kf])
        self.ref_kf = int(top[0])
        return top.astype(np.int32)

    def _need_new_keyframe(self, cur: fr.FrameData, n_inl: int) -> bool:
        """Simplified `NeedNewKeyFrame` (`Tracking.cc:2577`): reference
        ratio rule (90% of ref-KF tracked points) + min/max frame gaps."""
        if self.ref_kf < 0:
            return False
        s = self.store.state
        ref_matches = int(
            np.asarray(
                ((s.kf_mp[self.ref_kf] >= 0) & s.kf_feat_valid[self.ref_kf]).sum()
            )
        )
        c1 = self.frames_since_kf >= 10  # ref: mMaxFrames (fps)
        c2 = (n_inl < ref_matches * 0.9) and self.frames_since_kf >= 1
        return (c1 or c2) and n_inl >= 15

    def _create_keyframe(self, cur: fr.FrameData):
        """`CreateNewKeyFrame` (`Tracking.cc:2716`)."""
        slot = self.store.alloc_kf()
        s = st.add_keyframe(
            self.store.state, slot, jnp.asarray(cur.R), jnp.asarray(cur.t),
            cur.features.uv,
            jnp.asarray(cur.ur) if cur.ur is not None else jnp.full(cur.features.n, -1.0),
            cur.features.octave, cur.features.angle, cur.features.desc,
            cur.features.valid, jnp.asarray(cur.mp_assoc),
            prev_kf=self.ref_kf,
        )
        self.store.state = s
        self.store.kf_ts[slot] = cur.timestamp
        self.store.kf_frame_id[slot] = cur.frame_id
        self.store.bump()
        self.ref_kf = slot
        self.frames_since_kf = 0
        if self.new_kf_callback is not None:
            self.new_kf_callback(slot, initial=False)
        # Refresh associations after mapping (fusion may replace points).
        cur.mp_assoc = np.asarray(self.store.state.kf_mp[slot])
