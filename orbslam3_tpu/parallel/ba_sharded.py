"""Distributed bundle adjustment over a TPU device mesh.

The decomposition (SURVEY.md §5.8 / §7 step 9): the *observation* axis is
sharded across devices; camera and point state is replicated. Every
reduction in the BA inner loop (block Hessians, Schur RHS, the PCG
matvec's two segment-sums) becomes local-segment-sum + `psum` over ICI.
The reduced camera system and its tiny Cholesky/PCG iterations are
computed redundantly on every device — they are O(C) work against O(O)
linearization work, so replication costs ~nothing and saves a broadcast.

This is the communication pattern of distributed block-Schur BA: one
all-reduce of the reduced system per matvec, nothing else.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orbslam3_tpu.optim import ba as ba_mod

AXIS = "obs"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def pad_obs(prob: ba_mod.BAProblem, n_shards: int) -> ba_mod.BAProblem:
    """Pad the observation axis to a multiple of the mesh size (padding
    rows are obs_valid=False)."""
    O = prob.obs_cam.shape[0]
    pad = (-O) % n_shards
    if pad == 0:
        return prob
    f = jnp.zeros(pad)
    return prob._replace(
        obs_cam=jnp.concatenate([prob.obs_cam, jnp.zeros(pad, jnp.int32)]),
        obs_point=jnp.concatenate([prob.obs_point, jnp.zeros(pad, jnp.int32)]),
        obs_uv=jnp.concatenate([prob.obs_uv, jnp.zeros((pad, 2))]),
        obs_ur=jnp.concatenate([prob.obs_ur, jnp.full(pad, -1.0)]),
        obs_sigma2=jnp.concatenate([prob.obs_sigma2, jnp.ones(pad)]),
        obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(pad, bool)]),
    )


def solve_ba_sharded(
    model,
    params: jnp.ndarray,
    prob: ba_mod.BAProblem,
    mesh: Mesh,
    bf: float = 0.0,
    iters: int = 10,
    pcg_iters: int = 50,
) -> ba_mod.BAResult:
    """Run `optim.ba.solve_ba` with observations sharded over `mesh`.

    Returns the same result as the single-device solver (reductions are
    exact sums; only summation order differs)."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    prob = pad_obs(prob, n)

    obs_spec = ba_mod.BAProblem(
        cam_R=P(), cam_t=P(), cam_fixed=P(),
        points=P(), point_valid=P(),
        obs_cam=P(axis), obs_point=P(axis), obs_uv=P(axis), obs_ur=P(axis),
        obs_sigma2=P(axis), obs_valid=P(axis),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(obs_spec,),
        out_specs=ba_mod.BAResult(
            cam_R=P(), cam_t=P(), points=P(), obs_inlier=P(axis), cost=P()
        ),
        check_vma=False,
    )
    def _run(p):
        return ba_mod.solve_ba(
            model, params, p, bf=bf, iters=iters, pcg_iters=pcg_iters, axis_name=axis
        )

    return jax.jit(_run)(prob)
