"""Sharded BA == single-device BA (SURVEY.md §4d: multi-host tests
emulated with xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.optim import ba
from orbslam3_tpu.parallel import ba_sharded

from tests.synthetic import make_scene, perturb_poses
from tests.test_optim import _ba_problem_from_scene


def test_sharded_ba_matches_single_device(rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    scene = make_scene(rng, n_cams=5, n_pts=80, noise_px=0.3)
    Rs2, ts2 = perturb_poses(rng, scene["cam_R"], scene["cam_t"], keep_first=2)
    prob = _ba_problem_from_scene(scene)._replace(
        cam_R=jnp.asarray(Rs2), cam_t=jnp.asarray(ts2)
    )
    res_single = ba.solve_ba(scene["model"], scene["params"], prob, iters=5, pcg_iters=30)
    mesh = ba_sharded.make_mesh(jax.devices()[:8])
    res_sharded = ba_sharded.solve_ba_sharded(
        scene["model"], scene["params"], prob, mesh, iters=5, pcg_iters=30
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded.cam_t), np.asarray(res_single.cam_t), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(res_sharded.cam_R), np.asarray(res_single.cam_R), atol=2e-3
    )
    assert abs(float(res_sharded.cost) - float(res_single.cost)) < max(
        0.05 * float(res_single.cost), 1.0
    )


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
