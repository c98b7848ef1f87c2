"""BA scaling efficiency across mesh sizes (BASELINE: >=80% at 2 hosts).

Runs the point-partitioned distributed BA on a FIXED problem at mesh
sizes 1 and 2 (and optionally more) and reports strong-scaling
efficiency t1/(n*tn). Runs on virtual CPU devices
(`xla_force_host_platform_device_count`) — the devices share the host's
cores, so the printed number is a conservative LOWER bound on real
multi-chip efficiency: on real TPUs each shard gets its own chip and the
only cross-chip cost is the reduced-camera-system psum (6C+36C floats),
which this harness pays through the same XLA collective path.

Prints one JSON line; bench.py runs this as a subprocess (CPU-only, so
it never touches the TPU tunnel).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from orbslam3_tpu.utils import enable_compile_cache

enable_compile_cache()

from orbslam3_tpu.optim import ba
from orbslam3_tpu.parallel import ba_sharded

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from synthetic import make_scene, perturb_poses
from test_optim import _ba_problem_from_scene


def make_problem(rng, C=48, Pn=8192):
    scene = make_scene(rng, n_cams=C, n_pts=Pn, noise_px=0.3, radius=8.0)
    Rs2, ts2 = perturb_poses(rng, scene["cam_R"], scene["cam_t"], keep_first=2)
    prob = _ba_problem_from_scene(scene)._replace(
        cam_R=jnp.asarray(Rs2), cam_t=jnp.asarray(ts2)
    )
    return scene, prob


def time_solve(scene, prob, mesh, iters=5, pcg=30, reps=3):
    res = ba_sharded.solve_ba_point_sharded(
        scene["model"], scene["params"], prob, mesh, iters=iters, pcg_iters=pcg
    )
    jax.block_until_ready(res.cam_t)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        res = ba_sharded.solve_ba_point_sharded(
            scene["model"], scene["params"], prob, mesh,
            iters=iters, pcg_iters=pcg,
        )
        jax.block_until_ready(res.cam_t)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(5)
    scene, prob = make_problem(rng)
    devs = jax.devices()
    t1 = time_solve(scene, prob, ba_sharded.make_mesh(devs[:1]))
    t2 = time_solve(scene, prob, ba_sharded.make_mesh(devs[:2]))
    eff2 = t1 / (2 * t2)
    out = {
        "ba_ms_1dev": round(t1 * 1e3, 1),
        "ba_ms_2dev": round(t2 * 1e3, 1),
        "scaling_efficiency_2dev": round(eff2, 3),
        "note": "virtual CPU devices sharing one host: lower bound",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
