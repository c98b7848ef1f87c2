"""Micro-bench: XLA matrix path vs Pallas fused kernel for the
projection-search hot loop (local-map points x frame keypoints)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.utils import enable_compile_cache

enable_compile_cache()
from orbslam3_tpu.ops import matching
from orbslam3_tpu.ops import pallas_match as pm

print("platform:", jax.devices()[0].platform, flush=True)

N, M = 16384, 1024
rng = np.random.default_rng(0)
da_np = rng.integers(0, 256, (N, 32), dtype=np.uint8)
uvq_np = rng.uniform(0, 752, (N, 2)).astype(np.float32)
octq_np = rng.integers(0, 6, (N,)).astype(np.int32)
# Keypoints = noisy copies of the first M map points: real matches exist.
db_np = da_np[:M] ^ (rng.integers(0, 256, (M, 32), dtype=np.uint8)
                     & rng.integers(0, 256, (M, 32), dtype=np.uint8)
                     & rng.integers(0, 256, (M, 32), dtype=np.uint8))
uvk_np = uvq_np[:M] + rng.normal(0, 5, (M, 2)).astype(np.float32)
da, db = jnp.asarray(da_np), jnp.asarray(db_np)
va = jnp.asarray(rng.random(N) > 0.3)
vb = jnp.asarray(rng.random(M) > 0.05)
uvq, uvk = jnp.asarray(uvq_np), jnp.asarray(uvk_np)
rad = jnp.full((N,), 40.0, jnp.float32)
octk = jnp.asarray(octq_np[:M] + rng.integers(0, 2, (M,)), jnp.int32)
lo = jnp.asarray(octq_np)
hi = lo + 2


@jax.jit
def xla_path(da, db, va, vb, uvq, uvk, rad, octk, lo, hi):
    return matching.search_by_projection(
        da, uvq, va, db, uvk, vb, rad, octave_kp=octk,
        octave_lo=lo, octave_hi=hi, max_dist=80.0, ratio=0.85)


@jax.jit
def pallas_path(da, db, va, vb, uvq, uvk, rad, octk, lo, hi):
    return pm.match_nn_fused(
        da, db, valid_a=va, valid_b=vb, max_dist=80.0, ratio=0.85,
        cross_check=False,
        window=pm.MatchWindow(uvq, uvk, rad, octk, lo, hi))


args = (da, db, va, vb, uvq, uvk, rad, octk, lo, hi)
r_x = xla_path(*args)
r_p = pallas_path(*args)
vx, vp = np.asarray(r_x.valid), np.asarray(r_p.valid)
assert (vx == vp).all(), (vx.sum(), vp.sum())
sel = vx
assert (np.asarray(r_x.idx)[sel] == np.asarray(r_p.idx)[sel]).all()
print(f"agree: {vx.sum()} matches identical", flush=True)


def bench(f, n=50):
    f(*args).dist.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    out.dist.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


tx = bench(xla_path)
tp = bench(pallas_path)
print(f"XLA matrix path:   {tx:.3f} ms")
print(f"Pallas fused path: {tp:.3f} ms   ({tx / tp:.2f}x)")
