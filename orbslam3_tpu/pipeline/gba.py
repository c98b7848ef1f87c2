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


@functools.partial(jax.jit, static_argnames=("model", "iters", "pcg_iters"))
def _gba_jit(model, params, state: st.MapState, fixed, sigma2_table, bf, iters, pcg_iters):
    K = state.Kmax
    Nf = state.Nf
    ids = jnp.arange(K, dtype=jnp.int32)
    obs_mp = state.kf_mp.reshape(-1)
    obs_cam = jnp.repeat(ids, Nf)
    obs_valid = (obs_mp >= 0) & state.kf_feat_valid.reshape(-1) & state.kf_valid[obs_cam]
    s2 = sigma2_table[jnp.clip(state.kf_octave.reshape(-1), 0, sigma2_table.shape[0] - 1)]
    prob = ba_mod.BAProblem(
        cam_R=state.kf_R, cam_t=state.kf_t, cam_fixed=fixed,
        points=state.mp_pos, point_valid=state.mp_valid,
        obs_cam=obs_cam, obs_point=jnp.clip(obs_mp, 0),
        obs_uv=state.kf_uv.reshape(-1, 2), obs_ur=state.kf_ur.reshape(-1),
        obs_sigma2=s2, obs_valid=obs_valid,
    )
    res = ba_mod.solve_ba(model, params, prob, bf=bf, iters=iters, pcg_iters=pcg_iters)
    new_state = state._replace(
        kf_R=jnp.where(fixed[:, None, None], state.kf_R, res.cam_R),
        kf_t=jnp.where(fixed[:, None], state.kf_t, res.cam_t),
        mp_pos=jnp.where(state.mp_valid[:, None], res.points, state.mp_pos),
    )
    return new_state, res.cost


def global_ba(
    store: st.MapStore,
    model,
    params,
    sigma2_table,
    bf: float = 0.0,
    iters: int = 10,
    pcg_iters: int = 50,
    fix_first: bool = True,
):
    """Full-map BA (10 iters visual, ref `LoopClosing.cc:2520`). Mutates
    the store in place; returns final robust cost."""
    s = store.state
    fixed = ~np.asarray(s.kf_valid)
    if fix_first:
        fixed[0] = True
    new_state, cost = _gba_jit(
        model, jnp.asarray(params), s, jnp.asarray(fixed), jnp.asarray(sigma2_table),
        bf, iters, pcg_iters,
    )
    store.state = new_state
    store.bump()
    return float(cost)
