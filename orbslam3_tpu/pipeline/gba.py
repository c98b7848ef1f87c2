"""Global bundle adjustment over a whole map.

Shared by loop closing (`RunGlobalBundleAdjustment`,
`/root/reference/src/LoopClosing.cc:2513`) and offline map refinement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.atlas import store as st
from orbslam3_tpu.optim import ba as ba_mod


def build_gba_problem(state: st.MapState, fixed, sigma2_table) -> ba_mod.BAProblem:
    """Whole-map BAProblem from a MapState (every feature slot with a map
    point becomes one observation row). Works traced (inside `_gba_jit`)
    or eagerly (the distributed path preps it on host)."""
    K = state.Kmax
    Nf = state.Nf
    ids = jnp.arange(K, dtype=jnp.int32)
    obs_mp = state.kf_mp.reshape(-1)
    obs_cam = jnp.repeat(ids, Nf)
    obs_valid = (obs_mp >= 0) & state.kf_feat_valid.reshape(-1) & state.kf_valid[obs_cam]
    s2 = sigma2_table[jnp.clip(state.kf_octave.reshape(-1), 0, sigma2_table.shape[0] - 1)]
    return ba_mod.BAProblem(
        cam_R=state.kf_R, cam_t=state.kf_t, cam_fixed=fixed,
        points=state.mp_pos, point_valid=state.mp_valid,
        obs_cam=obs_cam, obs_point=jnp.clip(obs_mp, 0),
        obs_uv=state.kf_uv.reshape(-1, 2), obs_ur=state.kf_ur.reshape(-1),
        obs_sigma2=s2, obs_valid=obs_valid,
    )


@functools.partial(jax.jit, static_argnames=("model", "iters", "pcg_iters"))
def _gba_jit(model, params, state: st.MapState, fixed, sigma2_table, bf, iters, pcg_iters):
    prob = build_gba_problem(state, fixed, sigma2_table)
    res = ba_mod.solve_ba(
        model, params, prob, bf=bf, iters=iters, pcg_iters=pcg_iters,
        dense_schur=ba_mod.auto_dense_schur(state.Kmax, state.Pmax),
    )
    new_state = state._replace(
        kf_R=jnp.where(fixed[:, None, None], state.kf_R, res.cam_R),
        kf_t=jnp.where(fixed[:, None], state.kf_t, res.cam_t),
        mp_pos=jnp.where(state.mp_valid[:, None], res.points, state.mp_pos),
    )
    return new_state, res.cost


class AsyncGBA:
    """Interruptible background global BA — the TPU-native re-expression of
    the reference's transient GBA thread (`LoopClosing::RunGlobalBundle-
    Adjustment` spawned at `LoopClosing.cc:1323`, abort flag `mbStopGBA`
    checked at `:1099-1118`).

    Instead of a concurrent thread mutating shared map state, the problem
    is SNAPSHOTTED at `start()`; `tick()` advances the LM solve by a small
    chunk of iterations as ONE async device dispatch (the host never
    blocks — tracking's dispatches interleave with the chunks in the
    device queue); `abort()` drops the solve between chunks. When the last
    chunk completes, the correction is applied to the CURRENT store:
    keyframes and map points created while the solve ran are corrected
    through their reference keyframe — the spanning-tree propagation of
    `LoopClosing.cc:2559-2680`.
    """

    def __init__(self, model, params, sigma2_table, bf: float = 0.0,
                 iters: int = 10, chunk: int = 2, pcg_iters: int = 50,
                 dist=None):
        self.model = model
        self.params = jnp.asarray(params)
        self.sigma2_table = jnp.asarray(sigma2_table)
        self.bf = bf
        self.iters = iters
        self.chunk = chunk
        self.pcg_iters = pcg_iters
        # DistributedContext (parallel/context.py): when set, each chunk is
        # the point-partitioned solve over the mesh — config 5's "global BA
        # across hosts" running from the live Atlas flow instead of a
        # sidecar drive (round-3 verdict item 1).
        self.dist = dist
        self._state = None  # in-flight optimized snapshot (device)
        self._prob_s = None  # distributed mode: prepped sharded problem
        self.n_finished = 0
        self.n_aborted = 0
        self.n_dist_solves = 0

    @property
    def running(self) -> bool:
        return self._state is not None

    def start(self, store: st.MapStore):
        """Snapshot the map and begin the solve (any previous run is
        aborted — ref `:1099`: a new loop stops the old GBA)."""
        if self.running:
            self.abort()
        s = store.state
        fixed = ~np.asarray(s.kf_valid)
        fixed[0] = True
        self._state = s
        self._fixed = jnp.asarray(fixed)
        self._it = 0
        # Host mirrors for the finish-time propagation guard.
        self._valid0_kf = np.asarray(s.kf_valid).copy()
        self._valid0_mp = np.asarray(s.mp_valid).copy()
        self._first0 = np.asarray(s.mp_first_kf).copy()
        self._ts0 = store.kf_ts.copy()
        # Weak identity: after reset/merge the old MapStore may be GC'd
        # and a new one can reuse the same CPython id, so a raw id()
        # check could pass against a different map. A weakref is only
        # alive while THE snapshotted store object is.
        import weakref

        self._store_ref = weakref.ref(store)
        self._R0 = s.kf_R  # device; only read at finish
        self._t0 = s.kf_t
        if self.dist is not None and self.dist.n_shards > 1:
            prob = build_gba_problem(s, self._fixed, self.sigma2_table)
            self._prob_s, self._Pn = self.dist.prep_ba(prob)

    def abort(self):
        """Ref `mbStopGBA` (`LoopClosing.cc:1104`): drop the in-flight
        solve; the map keeps its pose-graph-corrected state."""
        if self.running:
            self._state = None
            self._prob_s = None
            self.n_aborted += 1

    def tick(self, store: st.MapStore) -> bool:
        """Advance one chunk; returns True when the solve just finished
        and its result was folded into `store`."""
        if not self.running:
            return False
        if self._store_ref() is not store:
            # The active map changed under us (reset / multi-map merge):
            # the snapshot no longer corresponds — drop the solve.
            self.abort()
            return False
        n = min(self.chunk, self.iters - self._it)
        if self._prob_s is not None:
            # Distributed chunk: point-partitioned solve over the mesh;
            # camera output is replicated, points stay sharded — both feed
            # the next chunk without leaving the devices.
            res = self.dist.run_ba(
                self.model, self.params, self._prob_s,
                bf=self.bf, iters=n, pcg_iters=self.pcg_iters,
            )
            self._prob_s = self._prob_s._replace(
                cam_R=res.cam_R, cam_t=res.cam_t, points=res.points,
            )
            self.n_dist_solves += 1
        else:
            self._state, _cost = _gba_jit(
                self.model, self.params, self._state, self._fixed,
                self.sigma2_table, self.bf, n, self.pcg_iters,
            )
        self._it += n
        if self._it < self.iters:
            return False
        if self._prob_s is not None:
            self._fold_dist_result()
        self._finish(store)
        return True

    def _fold_dist_result(self):
        """Materialize the distributed solve back into the snapshot state
        so `_finish`'s propagation sees one layout for both paths. The
        sharded point axis is gathered (P(axis) -> replicated); fixed
        cameras keep the snapshot pose exactly."""
        s = self._state
        Rn = jnp.asarray(self.dist.fetch(self._prob_s.cam_R))
        tn = jnp.asarray(self.dist.fetch(self._prob_s.cam_t))
        pn = jnp.asarray(self.dist.fetch(self._prob_s.points))[: s.Pmax]
        self._state = s._replace(
            kf_R=jnp.where(self._fixed[:, None, None], s.kf_R, Rn),
            kf_t=jnp.where(self._fixed[:, None], s.kf_t, tn),
            mp_pos=jnp.where(s.mp_valid[:, None], pn, s.mp_pos),
        )
        self._prob_s = None

    def join(self, store: st.MapStore):
        """Drain to completion (ref `System::Shutdown` waiting on the GBA
        thread, `System.cc:474-500`)."""
        while self.running:
            self.tick(store)

    # ------------------------------------------------------------------
    def _finish(self, store: st.MapStore):
        """Fold the optimized snapshot into the live store with
        spanning-tree-style propagation (`LoopClosing.cc:2559-2680`)."""
        opt = self._state
        self._state = None
        s = store.state
        from orbslam3_tpu.utils.fetch import fetch

        (Rg, tg, pg_, R0, t0, Rc, tc, valid_kf, valid_mp, first_now) = fetch(
            opt.kf_R, opt.kf_t, opt.mp_pos, self._R0, self._t0,
            s.kf_R, s.kf_t, s.kf_valid, s.mp_valid, s.mp_first_kf,
        )
        K = s.Kmax
        # KFs present in the snapshot (same slot, same timestamp): GBA pose.
        in_gba = self._valid0_kf & valid_kf & (self._ts0 == store.kf_ts)
        # KFs created meanwhile: anchor on the temporally previous
        # snapshot KF and keep the relative pose (T_new' = (T_new T_a^-1)
        # T_a_gba — ref `:2608-2630` via spanning-tree parent).
        newR = Rc.copy()
        newt = tc.copy()
        newR[in_gba] = Rg[in_gba]
        newt[in_gba] = tg[in_gba]
        gba_ids = np.flatnonzero(in_gba)
        if len(gba_ids):
            order = gba_ids[np.argsort(store.kf_ts[gba_ids])]
            for k in np.flatnonzero(valid_kf & ~in_gba):
                pos = np.searchsorted(store.kf_ts[order], store.kf_ts[k])
                a = order[min(max(pos - 1, 0), len(order) - 1)]
                R_rel = Rc[k] @ R0[a].T  # T_k T_a^-1 (rotation part)
                t_rel = tc[k] - R_rel @ t0[a]
                newR[k] = R_rel @ Rg[a]
                newt[k] = R_rel @ tg[a] + t_rel
        # Points: snapshot points take their GBA position; points born
        # meanwhile ride their first KF's correction (ref `:2648-2676`).
        in_gba_mp = self._valid0_mp & valid_mp & (self._first0 == first_now)
        newp = fetch(s.mp_pos).copy()
        newp[in_gba_mp] = pg_[in_gba_mp]
        fresh = np.flatnonzero(valid_mp & ~in_gba_mp)
        for p in fresh:
            a = first_now[p]
            if a < 0 or not valid_kf[a]:
                continue
            # Anchor's CURRENT pre-correction pose — the reference's
            # mTcwBefGBA, saved immediately before applying the
            # correction (`LoopClosing.cc` RunGlobalBundleAdjustment):
            # the point was born relative to wherever local BA has moved
            # the anchor SINCE the snapshot, not the snapshot pose.
            Ra_old, ta_old = Rc[a], tc[a]
            Xc = Ra_old @ newp[p] + ta_old  # anchor cam frame (pre-correction)
            newp[p] = newR[a].T @ (Xc - newt[a])
        store.state = s._replace(
            kf_R=jnp.asarray(newR), kf_t=jnp.asarray(newt),
            mp_pos=jnp.asarray(newp),
        )
        store.bump()
        self.n_finished += 1


def global_ba(
    store: st.MapStore,
    model,
    params,
    sigma2_table,
    bf: float = 0.0,
    iters: int = 10,
    pcg_iters: int = 50,
    fix_first: bool = True,
    dist=None,
):
    """Full-map BA (10 iters visual, ref `LoopClosing.cc:2520`). Mutates
    the store in place; returns final robust cost. With a
    `DistributedContext` the solve is point-partitioned over its mesh
    (exact vs single-device up to summation order)."""
    s = store.state
    fixed = ~np.asarray(s.kf_valid)
    if fix_first:
        fixed[0] = True
    if dist is not None and dist.n_shards > 1:
        fixed_j = jnp.asarray(fixed)
        prob = build_gba_problem(s, fixed_j, jnp.asarray(sigma2_table))
        prob_s, _pn = dist.prep_ba(prob)
        res = dist.run_ba(
            model, jnp.asarray(params), prob_s,
            bf=bf, iters=iters, pcg_iters=pcg_iters,
        )
        Rn = jnp.asarray(dist.fetch(res.cam_R))
        tn = jnp.asarray(dist.fetch(res.cam_t))
        pn = jnp.asarray(dist.fetch(res.points))[: s.Pmax]
        store.state = s._replace(
            kf_R=jnp.where(fixed_j[:, None, None], s.kf_R, Rn),
            kf_t=jnp.where(fixed_j[:, None], s.kf_t, tn),
            mp_pos=jnp.where(s.mp_valid[:, None], pn, s.mp_pos),
        )
        store.bump()
        return float(dist.fetch(res.cost))
    new_state, cost = _gba_jit(
        model, jnp.asarray(params), s, jnp.asarray(fixed), jnp.asarray(sigma2_table),
        bf, iters, pcg_iters,
    )
    store.state = new_state
    store.bump()
    return float(cost)
