"""Multi-map orchestration: map creation on tracking loss + map merging.

The reference's "elastic recovery" (SURVEY.md §5.3): on hard tracking
loss with a sufficiently built map, the current map is STORED and a fresh
one starts (`Tracking::CreateMapInAtlas`, `Tracking.cc:2087,1239-1257`);
when place recognition later matches a keyframe of the active map against
a stored map, the active map is transformed and welded into it
(`LoopClosing::MergeLocal`, `LoopClosing.cc:1332`).

Host-side manager driving `atlas.Atlas`, `map_merging.merge_maps`, and a
per-map `KeyFrameDB`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.atlas import store as st
from orbslam3_tpu.atlas.atlas import Atlas
from orbslam3_tpu.atlas.kfdb import KeyFrameDB
from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.ops import matching, ransac
from orbslam3_tpu.pipeline import map_merging


class MultiMapManager:
    def __init__(self, system, vocabulary, min_kfs_to_store: int = 10,
                 min_merge_matches: int = 15, min_sim3_inliers: int = 12):
        self.system = system
        self.voc = vocabulary
        self.atlas = Atlas(
            Kmax=system.store.state.Kmax,
            Pmax=system.store.state.Pmax,
            Nf=system.store.state.Nf,
        )
        # Adopt the system's existing store as map 0.
        self.atlas.maps = [system.store]
        self.atlas.active_idx = 0
        self.kfdbs: Dict[int, KeyFrameDB] = {}  # keyed by id(MapStore)
        self.min_kfs_to_store = min_kfs_to_store
        self.min_merge_matches = min_merge_matches
        self.min_sim3_inliers = min_sim3_inliers
        self.n_merges = 0
        self.lost_streak = 0

    def _kfdb(self, store: st.MapStore) -> KeyFrameDB:
        key = id(store)
        if key not in self.kfdbs:
            self.kfdbs[key] = KeyFrameDB(self.voc, Kmax=store.state.Kmax)
        return self.kfdbs[key]

    # ------------------------------------------------------------------
    def on_new_keyframe(self, kf_id: int):
        """Index the KF in the active map's database, then try to merge
        the active map into any stored map."""
        s = self.system.store.state
        kf_j = jnp.asarray(kf_id)
        self._kfdb(self.system.store).add(kf_id, s.kf_desc[kf_j], s.kf_feat_valid[kf_j])
        if self.atlas.n_maps > 1 and self.system.store.n_kf >= 5:
            self._try_merge(kf_id)

    def on_frame_done(self):
        """Map-creation policy (`Tracking.cc:1239-1257`): hard LOST with a
        usable map -> store it and start fresh."""
        from orbslam3_tpu.pipeline.tracking import TrackState

        tr = self.system.tracker
        if tr.state == TrackState.LOST:
            self.lost_streak += 1
        else:
            self.lost_streak = 0
        if self.lost_streak >= 5 and self.system.store.n_kf > self.min_kfs_to_store:
            self._create_map()
            self.lost_streak = 0

    # ------------------------------------------------------------------
    def _create_map(self):
        new_store = self.atlas.create_new_map()
        sysm = self.system
        if sysm.async_mapper is not None:
            sysm.async_mapper.abort()  # in-flight pass keyed to the old map
        sysm.store = new_store
        sysm.tracker.store = new_store
        sysm.mapper.store = new_store
        sysm.mapper.preints = {}
        sysm.mapper.recent_mp = []
        tr = sysm.tracker
        from orbslam3_tpu.pipeline.tracking import TrackState

        tr.state = TrackState.NOT_INITIALIZED
        tr.init_frame = None
        tr.ref_kf = -1
        tr.last_kf_id = -1
        tr.velocity = None
        tr.pre_from_kf = None
        tr.imu_ready = False

    def _try_merge(self, kf_id: int):
        """Match the new KF against every stored map's database; on a
        Sim3-verified hit, merge the ACTIVE map into that stored map and
        switch to it."""
        act = self.system.store
        s = act.state
        kf_j = jnp.asarray(kf_id)
        desc = s.kf_desc[kf_j]
        fvalid = s.kf_feat_valid[kf_j]
        mp1 = np.asarray(s.kf_mp[kf_j])

        for target in self.atlas.maps:
            if target is act or target.n_kf < 3 or id(target) not in self.kfdbs:
                continue
            db = self.kfdbs[id(target)]
            covis = jnp.asarray(target.covisibility_np())
            cand_ids, _ = db.query_frame(desc, fvalid, covis, n_best=3)
            for c in np.asarray(cand_ids):
                if c < 0:
                    continue
                ok = self._verify_merge(act, target, kf_id, int(c))
                if ok:
                    return

    def _verify_merge(self, act: st.MapStore, target: st.MapStore,
                      kf_id: int, cand: int) -> bool:
        sysm = self.system
        model, params = sysm.tracker.model, sysm.tracker.params
        s1, s2 = act.state, target.state
        k1 = jnp.asarray(kf_id)
        k2 = jnp.asarray(cand)
        mp1 = np.asarray(s1.kf_mp[k1])
        mp2 = np.asarray(s2.kf_mp[k2])
        has1 = jnp.asarray(mp1 >= 0) & s1.kf_feat_valid[k1]
        has2 = jnp.asarray(mp2 >= 0) & s2.kf_feat_valid[k2]
        m = matching.match_nn(
            s1.kf_desc[k1], s2.kf_desc[k2], has1, has2,
            max_dist=matching.TH_LOW, ratio=0.75, cross_check=True,
        )
        if int(np.asarray(m.valid).sum()) < self.min_merge_matches:
            return False
        idx2 = np.asarray(m.idx)
        valid = np.asarray(m.valid)
        p1w = np.asarray(s1.mp_pos)[np.clip(mp1, 0, None)]
        p2w = np.asarray(s2.mp_pos)[np.clip(mp2[np.clip(idx2, 0, None)], 0, None)]
        R1, t1 = np.asarray(s1.kf_R[k1]), np.asarray(s1.kf_t[k1])
        R2, t2 = np.asarray(s2.kf_R[k2]), np.asarray(s2.kf_t[k2])
        X1 = (R1 @ p1w.T).T + t1
        X2 = (R2 @ p2w.T).T + t2
        s2t = np.asarray(sysm.tracker.sigma2_table)
        o1 = np.asarray(s1.kf_octave[k1])
        o2 = np.asarray(s2.kf_octave[k2])[np.clip(idx2, 0, None)]
        proj = lambda X: cam.project(model, params, X)
        ok, R12, t12, s12, inl = ransac.sim3_ransac(
            jnp.asarray(X1, jnp.float32), jnp.asarray(X2, jnp.float32),
            jnp.asarray(valid), jax.random.PRNGKey(kf_id + 7777),
            jnp.asarray(9.21 * s2t[np.clip(o1, 0, len(s2t) - 1)], jnp.float32),
            jnp.asarray(9.21 * s2t[np.clip(o2, 0, len(s2t) - 1)], jnp.float32),
            proj, proj,
            jnp.asarray(np.asarray(s1.kf_uv[k1]), jnp.float32),
            jnp.asarray(np.asarray(s2.kf_uv[k2])[np.clip(idx2, 0, None)], jnp.float32),
            fix_scale=False, min_inliers=self.min_sim3_inliers,
        )
        if not bool(ok):
            return False

        # World Sim3 taking active-map coords into target-map coords:
        # X2_cam = S21(X1_cam); X_t = T2w^-1 S21 T1w (X_a).
        R12n, t12n, s12n = np.asarray(R12), np.asarray(t12), float(s12)
        # Compose: x_t = R2^T( s12 R12 (R1 x_a + t1) + t12 - t2 )
        Rw = R2.T @ R12n @ R1
        tw = R2.T @ (s12n * (R12n @ t1) + t12n - t2)
        sw = s12n
        self._do_merge(act, target, Rw, tw, sw)
        self.n_merges += 1
        return True

    def _do_merge(self, act: st.MapStore, target: st.MapStore, R, t, s):
        sysm0 = self.system
        if sysm0.async_mapper is not None:
            # Ref `MergeLocal` stops LocalMapping before welding
            # (`LoopClosing.cc:1348`); queued pass kf-ids get remapped.
            sysm0.async_mapper.flush()
        pre_merge_points = np.asarray(target.state.mp_valid).copy()
        kf_remap, mp_remap = map_merging.merge_maps(target, act, R, t, s)
        sysm = self.system
        # Index the migrated keyframes in the target's database.
        db = self._kfdb(target)
        ts = target.state
        for k_src, k_tgt in kf_remap.items():
            kj = jnp.asarray(k_tgt)
            db.add(k_tgt, ts.kf_desc[kj], ts.kf_feat_valid[kj])
        # Switch the system onto the merged map.
        sysm.store = target
        sysm.tracker.store = target
        sysm.mapper.store = target
        sysm.mapper.preints = {
            kf_remap[k]: v for k, v in sysm.mapper.preints.items() if k in kf_remap
        }
        tr = sysm.tracker
        tr.ref_kf = kf_remap.get(tr.ref_kf, max(kf_remap.values()))
        tr.last_kf_id = kf_remap.get(tr.last_kf_id, tr.ref_kf)
        tr.velocity = None  # world frame changed (Sim3)
        # Re-root trajectory entries of the merged (source) map onto the
        # target, where their reference KF migrated. Relative translations
        # are metric quantities of the OLD map: the merge Sim3's scale
        # applies to them too (camera-to-camera relative SE3 under a world
        # Sim3 keeps its rotation but scales its translation).
        new_traj = []
        for (tss, store_e, ref, R_cr, t_cr) in tr.trajectory:
            if store_e is act and ref in kf_remap:
                new_traj.append((tss, target, kf_remap[ref], R_cr, float(s) * t_cr))
            else:
                new_traj.append((tss, store_e, ref, R_cr, t_cr))
        tr.trajectory = new_traj
        # Frame poses: the tracker's last frame is in old coords; drop the
        # motion model and let reference-KF tracking recover next frame.
        if tr.last_frame is not None:
            # Transform the last frame's pose into the target frame.
            Rn = tr.last_frame.R @ np.asarray(R).T
            tn = float(s) * tr.last_frame.t - Rn @ np.asarray(t)
            tr.last_frame.R = Rn.astype(np.float32)
            tr.last_frame.t = tn.astype(np.float32)
        # WELD (ref `MergeLocal` SearchAndFuse + weld BA,
        # `LoopClosing.cc:1756-1802`): fuse the target's pre-merge points
        # into the migrated keyframes so the two halves share
        # observations, then a global BA couples them metrically.
        from orbslam3_tpu.pipeline.local_mapping import fuse_into_kf
        from orbslam3_tpu.pipeline.gba import global_ba

        cand = np.flatnonzero(pre_merge_points).astype(np.int32)
        if len(cand):
            pad_len = ts.Nf * ((len(cand) + ts.Nf - 1) // ts.Nf)
            cand_p = np.zeros(pad_len, np.int32)
            cand_p[: len(cand)] = cand
            cand_valid = np.zeros(pad_len, bool)
            cand_valid[: len(cand)] = True
            for k_tgt in kf_remap.values():
                kj = jnp.asarray(k_tgt)
                for st0 in range(0, pad_len, ts.Nf):
                    row, _, _inc, _conf = fuse_into_kf(
                        sysm.tracker.model, sysm.tracker.params, target.state, kj,
                        jnp.asarray(cand_p[st0 : st0 + ts.Nf]),
                        jnp.asarray(cand_valid[st0 : st0 + ts.Nf]),
                        jnp.asarray(sysm.tracker.img_wh),
                        sysm.tracker.sigma2_table,
                        n_levels=sysm.tracker.orb.n_levels,
                    )
                    target.state = target.state._replace(
                        kf_mp=target.state.kf_mp.at[kj].set(row)
                    )
        global_ba(
            target, sysm.tracker.model, sysm.tracker.params,
            np.asarray(sysm.tracker.sigma2_table), bf=sysm.tracker.bf, iters=10,
        )

        # Remove the old map from the Atlas (its content now lives in the
        # target) and drop its database.
        self.atlas.maps.remove(act)
        self.kfdbs.pop(id(act), None)
        self.atlas.active_idx = self.atlas.maps.index(target)
