"""Structure-of-arrays map store — the TPU-native Frame/KeyFrame/MapPoint/Map.

Replaces the reference's pointer-graph data model
(`/root/reference/src/{Frame.cc,KeyFrame.cc,MapPoint.cc,Map.cc}`) with
fixed-capacity device arrays + validity masks (SURVEY.md §7 design
stance). Key translations:

* `MapPoint::mObservations` (KF -> feature index map, `MapPoint.h:141`)
  is inverted: each keyframe stores `kf_mp[k, f]` = map-point id per
  feature slot (-1 = none). An observation IS a (keyframe, feature) pair
  with `kf_mp >= 0`; BA problem assembly is pure gathering.
* The covisibility graph (`KeyFrame::UpdateConnections`,
  `KeyFrame.cc:469`) is not stored — it is *recomputed on demand* as one
  int8 matmul over observation indicator matrices (counts of shared map
  points), which on the MXU is cheaper than maintaining adjacency lists.
* Keyframe/map-point culling (`LocalMapping.cc:435,1170`) just clears
  validity bits; slots are recycled by the host-side allocator.
* All mutation goes through pure jitted functions (old state in, new
  state out) — the host owns ordering, replacing the reference's
  `Map::mMutexMapUpdate` (`Map.h:145`) cross-thread lock.

Host-side bookkeeping (slot allocation, timestamps as float64) lives in
the lightweight `MapStore` wrapper class.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class MapState(NamedTuple):
    """Device-resident SLAM map (one Atlas map)."""

    # --- keyframes -------------------------------------------------------
    kf_R: jnp.ndarray  # (K,3,3) Tcw
    kf_t: jnp.ndarray  # (K,3)
    kf_valid: jnp.ndarray  # (K,) bool
    # per-feature data (capacity Nf per KF)
    kf_uv: jnp.ndarray  # (K,Nf,2) level-0 pixels
    kf_ur: jnp.ndarray  # (K,Nf) stereo right-u; <0 mono
    kf_octave: jnp.ndarray  # (K,Nf) int32
    kf_angle: jnp.ndarray  # (K,Nf) float32
    kf_desc: jnp.ndarray  # (K,Nf,32) uint8
    kf_feat_valid: jnp.ndarray  # (K,Nf) bool
    kf_mp: jnp.ndarray  # (K,Nf) int32 map-point id, -1 = none
    # inertial state per KF (ref KeyFrame mVw/mImuBias/mPrevKF)
    kf_vel: jnp.ndarray  # (K,3)
    kf_bias_g: jnp.ndarray  # (K,3)
    kf_bias_a: jnp.ndarray  # (K,3)
    kf_prev: jnp.ndarray  # (K,) int32 temporal chain (-1 none)
    # --- map points ------------------------------------------------------
    mp_pos: jnp.ndarray  # (P,3)
    mp_valid: jnp.ndarray  # (P,) bool
    mp_desc: jnp.ndarray  # (P,32) distinctive descriptor
    mp_normal: jnp.ndarray  # (P,3) mean viewing direction
    mp_min_dist: jnp.ndarray  # (P,) scale-invariance band (ref MapPoint.h:172)
    mp_max_dist: jnp.ndarray  # (P,)
    mp_first_kf: jnp.ndarray  # (P,) int32 creating KF
    mp_found: jnp.ndarray  # (P,) int32 tracking "found" counter
    mp_visible: jnp.ndarray  # (P,) int32 tracking "visible" counter

    @property
    def Kmax(self):
        return self.kf_R.shape[0]

    @property
    def Pmax(self):
        return self.mp_pos.shape[0]

    @property
    def Nf(self):
        return self.kf_uv.shape[1]


def empty_map(Kmax: int = 256, Pmax: int = 16384, Nf: int = 1024) -> MapState:
    f = jnp.float32
    return MapState(
        kf_R=jnp.tile(jnp.eye(3, dtype=f)[None], (Kmax, 1, 1)),
        kf_t=jnp.zeros((Kmax, 3), f),
        kf_valid=jnp.zeros(Kmax, bool),
        kf_uv=jnp.zeros((Kmax, Nf, 2), f),
        kf_ur=jnp.full((Kmax, Nf), -1.0, f),
        kf_octave=jnp.zeros((Kmax, Nf), jnp.int32),
        kf_angle=jnp.zeros((Kmax, Nf), f),
        kf_desc=jnp.zeros((Kmax, Nf, 32), jnp.uint8),
        kf_feat_valid=jnp.zeros((Kmax, Nf), bool),
        kf_mp=jnp.full((Kmax, Nf), -1, jnp.int32),
        kf_vel=jnp.zeros((Kmax, 3), f),
        kf_bias_g=jnp.zeros((Kmax, 3), f),
        kf_bias_a=jnp.zeros((Kmax, 3), f),
        kf_prev=jnp.full((Kmax,), -1, jnp.int32),
        mp_pos=jnp.zeros((Pmax, 3), f),
        mp_valid=jnp.zeros(Pmax, bool),
        mp_desc=jnp.zeros((Pmax, 32), jnp.uint8),
        mp_normal=jnp.zeros((Pmax, 3), f),
        mp_min_dist=jnp.zeros(Pmax, f),
        mp_max_dist=jnp.full(Pmax, 1e9, f),
        mp_first_kf=jnp.full(Pmax, -1, jnp.int32),
        mp_found=jnp.zeros(Pmax, jnp.int32),
        mp_visible=jnp.zeros(Pmax, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Derived structures
# ---------------------------------------------------------------------------


def obs_indicator(state: MapState) -> jnp.ndarray:
    """(K, P) float indicator: KF k observes point p."""
    K, Nf = state.kf_mp.shape
    P = state.Pmax
    ok = (state.kf_mp >= 0) & state.kf_feat_valid & state.kf_valid[:, None]
    mp = jnp.clip(state.kf_mp, 0)
    ind = jnp.zeros((K, P), jnp.bfloat16)
    rows = jnp.broadcast_to(jnp.arange(K)[:, None], (K, Nf))
    ind = ind.at[rows, mp].max(ok.astype(jnp.bfloat16))
    return ind


@jax.jit
def covisibility(state: MapState) -> jnp.ndarray:
    """(K, K) int32 covisibility weights = #shared map points
    (ref `KeyFrame::UpdateConnections`, threshold applied by callers).
    One MXU matmul over the observation indicator."""
    ind = obs_indicator(state)
    W = jnp.dot(ind, ind.T, preferred_element_type=jnp.float32)
    W = W * (1.0 - jnp.eye(W.shape[0]))
    return W.astype(jnp.int32)


@jax.jit
def point_observers(state: MapState) -> jnp.ndarray:
    """(P,) int32 — number of keyframes observing each point."""
    ind = obs_indicator(state)
    return jnp.sum(ind.astype(jnp.float32), axis=0).astype(jnp.int32)


@jax.jit
def bump_found_visible(
    state: MapState, visible: jnp.ndarray, assoc: jnp.ndarray
) -> MapState:
    """Tracking statistics (`MapPoint::IncreaseVisible/IncreaseFound`,
    ref `MapPoint.cc:319-331`): `visible` (P,) bool — points that passed
    the frustum test this frame; `assoc` (Nf,) — map-point id per feature
    after pose-optimization inlier gating (-1 = unmatched). The
    found/visible ratio feeds `MapPointCulling`."""
    vis = state.mp_visible + visible.astype(jnp.int32)
    fnd = state.mp_found.at[jnp.clip(assoc, 0)].add((assoc >= 0).astype(jnp.int32))
    return state._replace(mp_visible=vis, mp_found=fnd)


# ---------------------------------------------------------------------------
# Mutation (pure, jitted by callers)
# ---------------------------------------------------------------------------


def add_keyframe(
    state: MapState,
    slot: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    uv: jnp.ndarray,
    ur: jnp.ndarray,
    octave: jnp.ndarray,
    angle: jnp.ndarray,
    desc: jnp.ndarray,
    feat_valid: jnp.ndarray,
    mp_assoc: jnp.ndarray,
    vel: Optional[jnp.ndarray] = None,
    bias_g: Optional[jnp.ndarray] = None,
    bias_a: Optional[jnp.ndarray] = None,
    prev_kf: int = -1,
) -> MapState:
    """Insert a keyframe into `slot` (host-allocated)."""
    z3 = jnp.zeros(3, state.kf_t.dtype)
    return state._replace(
        kf_R=state.kf_R.at[slot].set(R),
        kf_t=state.kf_t.at[slot].set(t),
        kf_valid=state.kf_valid.at[slot].set(True),
        kf_uv=state.kf_uv.at[slot].set(uv),
        kf_ur=state.kf_ur.at[slot].set(ur),
        kf_octave=state.kf_octave.at[slot].set(octave),
        kf_angle=state.kf_angle.at[slot].set(angle),
        kf_desc=state.kf_desc.at[slot].set(desc),
        kf_feat_valid=state.kf_feat_valid.at[slot].set(feat_valid),
        kf_mp=state.kf_mp.at[slot].set(mp_assoc),
        kf_vel=state.kf_vel.at[slot].set(vel if vel is not None else z3),
        kf_bias_g=state.kf_bias_g.at[slot].set(bias_g if bias_g is not None else z3),
        kf_bias_a=state.kf_bias_a.at[slot].set(bias_a if bias_a is not None else z3),
        kf_prev=state.kf_prev.at[slot].set(prev_kf),
    )


def add_points(
    state: MapState,
    slots: jnp.ndarray,  # (M,) point slots
    pos: jnp.ndarray,  # (M,3)
    desc: jnp.ndarray,  # (M,32)
    normal: jnp.ndarray,  # (M,3)
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    first_kf: jnp.ndarray,
    valid: jnp.ndarray,  # (M,) which of the M rows are real
) -> MapState:
    """Batch-insert map points into `slots` (invalid rows write to a dump
    slot Pmax-1... no: they keep the slot but stay invalid)."""
    return state._replace(
        mp_pos=state.mp_pos.at[slots].set(pos),
        mp_valid=state.mp_valid.at[slots].set(valid),
        mp_desc=state.mp_desc.at[slots].set(desc),
        mp_normal=state.mp_normal.at[slots].set(normal),
        mp_min_dist=state.mp_min_dist.at[slots].set(min_dist),
        mp_max_dist=state.mp_max_dist.at[slots].set(max_dist),
        mp_first_kf=state.mp_first_kf.at[slots].set(first_kf),
        mp_found=state.mp_found.at[slots].set(jnp.ones_like(first_kf)),
        mp_visible=state.mp_visible.at[slots].set(jnp.ones_like(first_kf)),
    )


def set_associations(state: MapState, kf_slot, feat_idx, mp_ids) -> MapState:
    """Write kf_mp[kf_slot, feat_idx] = mp_ids for a batch of features."""
    return state._replace(kf_mp=state.kf_mp.at[kf_slot, feat_idx].set(mp_ids))


def erase_points(state: MapState, mp_ids: jnp.ndarray, mask: jnp.ndarray) -> MapState:
    """Invalidate map points + all references to them (ref
    `MapPoint::SetBadFlag`). mp_ids (M,), mask (M,) selects rows to erase."""
    ids = jnp.where(mask, mp_ids, state.Pmax)  # out-of-range = no-op via clip trick
    valid = state.mp_valid.at[jnp.clip(ids, 0, state.Pmax - 1)].set(
        jnp.where(mask, False, state.mp_valid[jnp.clip(ids, 0, state.Pmax - 1)])
    )
    # Clear KF associations pointing at erased points.
    erased = jnp.zeros(state.Pmax + 1, bool).at[jnp.clip(ids, 0, state.Pmax)].set(mask)
    ref = jnp.clip(state.kf_mp, 0, state.Pmax)
    hit = jnp.where(state.kf_mp >= 0, erased[ref], False)
    return state._replace(mp_valid=valid, kf_mp=jnp.where(hit, -1, state.kf_mp))


def erase_keyframe(state: MapState, kf_slot) -> MapState:
    """Invalidate a keyframe and its observations (ref
    `KeyFrame::SetBadFlag`, `KeyFrame.cc:705`; spanning-tree child
    reassignment is host-side in local_mapping)."""
    return state._replace(
        kf_valid=state.kf_valid.at[kf_slot].set(False),
        kf_mp=state.kf_mp.at[kf_slot].set(jnp.full((state.Nf,), -1, jnp.int32)),
        kf_feat_valid=state.kf_feat_valid.at[kf_slot].set(jnp.zeros(state.Nf, bool)),
    )


def update_poses_points(
    state: MapState,
    kf_ids: jnp.ndarray,
    kf_R: jnp.ndarray,
    kf_t: jnp.ndarray,
    kf_mask: jnp.ndarray,
    mp_ids: jnp.ndarray,
    mp_pos: jnp.ndarray,
    mp_mask: jnp.ndarray,
) -> MapState:
    """Write back BA results (poses for kf_ids where kf_mask, positions for
    mp_ids where mp_mask)."""
    R_cur = state.kf_R[kf_ids]
    t_cur = state.kf_t[kf_ids]
    newR = jnp.where(kf_mask[:, None, None], kf_R, R_cur)
    newt = jnp.where(kf_mask[:, None], kf_t, t_cur)
    p_cur = state.mp_pos[mp_ids]
    newp = jnp.where(mp_mask[:, None], mp_pos, p_cur)
    return state._replace(
        kf_R=state.kf_R.at[kf_ids].set(newR),
        kf_t=state.kf_t.at[kf_ids].set(newt),
        mp_pos=state.mp_pos.at[mp_ids].set(newp),
    )


# ---------------------------------------------------------------------------
# Host wrapper: slot allocation & bookkeeping
# ---------------------------------------------------------------------------


class MapStore:
    """Host-side owner of one map: allocates slots, tracks timestamps.

    Mutation ordering is single-threaded host code — the TPU replacement
    for the reference's mutex web (SURVEY.md §2.3)."""

    def __init__(self, Kmax=256, Pmax=16384, Nf=1024):
        self.state = empty_map(Kmax, Pmax, Nf)
        self.n_kf = 0
        self.n_mp = 0
        self.kf_ts = np.zeros(Kmax, np.float64)
        self.kf_frame_id = np.zeros(Kmax, np.int64)  # source frame index
        self.free_mp_slots: list[int] = []
        self.free_kf_slots: list[int] = []
        self.change_index = 0  # ref Map::GetMapChangeIndex (Tracking.cc:1081)

    # -- allocation -----------------------------------------------------
    def alloc_kf(self) -> int:
        if self.free_kf_slots:
            return self.free_kf_slots.pop()
        slot = self.n_kf
        if slot >= self.state.Kmax:
            raise RuntimeError("keyframe capacity exhausted; raise Kmax")
        self.n_kf += 1
        return slot

    def alloc_mps(self, n: int) -> np.ndarray:
        slots = []
        while self.free_mp_slots and len(slots) < n:
            slots.append(self.free_mp_slots.pop())
        remaining = n - len(slots)
        # Last slot is reserved as the scatter dump for padded inserts
        # (fixed-shape updates write their padding there).
        if self.n_mp + remaining > self.state.Pmax - 1:
            raise RuntimeError("map-point capacity exhausted; raise Pmax")
        slots.extend(range(self.n_mp, self.n_mp + remaining))
        self.n_mp += remaining
        return np.asarray(slots, np.int32)

    @property
    def dump_slot(self) -> int:
        return self.state.Pmax - 1

    def bump(self):
        self.change_index += 1
