"""Round-5 profiling: where does the mapping pass's device time go?

Times each device program of the amortized-throughput bench's mapping
pass separately (triangulate_batch, _fuse_batch, local_ba at 48/128),
then microbenches the dense-Schur internals (W build, S_cross matmul,
reduced-system solve LU vs Cholesky) to find the 28 ms/iter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orbslam3_tpu.utils import enable_compile_cache

enable_compile_cache()


def timeit(f, *args, reps=5, inner=1):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force real exec
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3


def main():
    from __graft_entry__ import entry, staged_pipeline, mapping_pass, _synth_map
    from orbslam3_tpu.ops import cameras as cam
    from orbslam3_tpu.ops import features as feat
    from orbslam3_tpu.pipeline import local_mapping as lmod

    print(f"devices: {jax.devices()}", flush=True)

    # --- tracking step ---
    _, args = entry()
    run = staged_pipeline()
    t = timeit(lambda: run(*args), reps=5, inner=10)
    print(f"tracking_step_ms           {t:8.2f}", flush=True)

    # --- full mapping pass ---
    mrun, margs = mapping_pass()
    t = timeit(lambda: mrun(*margs), reps=3)
    print(f"mapping_pass_full_ms       {t:8.2f}", flush=True)

    # --- components ---
    orb = feat.OrbParams(n_features=1024, n_levels=8)
    params = cam.make_pinhole(458.654, 457.296, 376.0, 240.0)
    sigma2 = jnp.asarray(feat.sigma2(orb))
    scale_t = jnp.asarray(feat.scale_factors(orb))
    img_wh = jnp.asarray([752.0, 480.0], jnp.float32)
    model = cam.CameraModel.PINHOLE

    rng = np.random.default_rng(1)
    state = _synth_map(rng, Kmax=128, n_kf=72)
    kf = jnp.asarray(71)
    nb_ids = jnp.asarray(np.arange(61, 71, dtype=np.int32))
    cand_ids = jnp.asarray(rng.choice(12288, 1024, replace=False).astype(np.int32))
    cand_valid = jnp.ones(1024, bool)
    window_ids = jnp.asarray(np.arange(24, 72, dtype=np.int32))
    fixed_pad = np.full(128, -1, np.int32)
    fixed_pad[:24] = np.arange(0, 24, dtype=np.int32)
    fixed_ids = jnp.asarray(fixed_pad)

    tri = jax.jit(lambda s: lmod.triangulate_batch(
        model, params,
        s.kf_R[kf], s.kf_t[kf], s.kf_uv[kf], s.kf_octave[kf], s.kf_desc[kf],
        s.kf_mp[kf] < 0,
        s.kf_R[nb_ids], s.kf_t[nb_ids], s.kf_uv[nb_ids], s.kf_octave[nb_ids],
        s.kf_desc[nb_ids], s.kf_mp[nb_ids] < 0,
        sigma2, scale_t, 458.654,
    ))
    t = timeit(tri, state, reps=3)
    print(f"triangulate_batch_ms       {t:8.2f}", flush=True)

    fuse = jax.jit(lambda s: lmod._fuse_batch(
        model, params, s, nb_ids, cand_ids, cand_valid, img_wh, sigma2,
        n_levels=8,
    ))
    t = timeit(fuse, state, reps=3)
    print(f"fuse_batch_ms              {t:8.2f}", flush=True)

    for it in (1, 3, 5):
        ba = jax.jit(lambda s, n=it: lmod.local_ba(
            model, params, s, window_ids, fixed_ids, sigma2, iters=n))
        t = timeit(ba, state, reps=3)
        print(f"local_ba_{it}it_ms           {t:8.2f}", flush=True)

    # --- dense-Schur micro ---
    C, P, O = 176, 8192, 176 * 1024
    rngm = np.random.default_rng(0)
    W = jnp.asarray(rngm.normal(0, 1, (P, C, 3, 6)).astype(np.float32))
    Hpi = jnp.asarray(
        np.tile(np.eye(3, dtype=np.float32), (P, 1, 1)))
    Jp = jnp.asarray(rngm.normal(0, 1, (O, 3, 3)).astype(np.float32))
    Jc = jnp.asarray(rngm.normal(0, 1, (O, 3, 6)).astype(np.float32))
    obs_pt = jnp.asarray(rngm.integers(0, P, O).astype(np.int32))
    obs_cm = jnp.asarray(np.repeat(np.arange(C, dtype=np.int32), 1024))
    inv_idx = jnp.asarray(rngm.permutation(P * C)[: P * C].astype(np.int32) % (O + 1))

    @jax.jit
    def w_gather(Jp, Jc):
        Wv = jnp.einsum("oia,oib->oab", Jp, Jc).reshape(O, 18)
        Wv = jnp.concatenate([Wv, jnp.zeros((1, 18), jnp.float32)], 0)
        return Wv[inv_idx].reshape(P, C, 3, 6)

    t = timeit(w_gather, Jp, Jc, reps=3)
    print(f"  W_gather_build_ms        {t:8.2f}", flush=True)

    @jax.jit
    def s_cross(W, Hpi):
        HW = jnp.einsum("pij,pcjb->pcib", Hpi, W)
        Wm = W.transpose(1, 3, 0, 2).reshape(C * 6, P * 3)
        HWm = HW.transpose(0, 2, 1, 3).reshape(P * 3, C * 6)
        return (Wm @ HWm).reshape(C, 6, C, 6)

    t = timeit(s_cross, W, Hpi, reps=3)
    print(f"  S_cross_f32_ms           {t:8.2f}", flush=True)

    @jax.jit
    def s_cross_bf16(W, Hpi):
        HW = jnp.einsum("pij,pcjb->pcib", Hpi, W)
        Wm = W.transpose(1, 3, 0, 2).reshape(C * 6, P * 3).astype(jnp.bfloat16)
        HWm = HW.transpose(0, 2, 1, 3).reshape(P * 3, C * 6).astype(jnp.bfloat16)
        return jnp.matmul(Wm, HWm, preferred_element_type=jnp.float32).reshape(C, 6, C, 6)

    t = timeit(s_cross_bf16, W, Hpi, reps=3)
    print(f"  S_cross_bf16_ms          {t:8.2f}", flush=True)

    S = np.asarray(s_cross(W, Hpi)).reshape(C * 6, C * 6)
    S = S @ S.T + np.eye(C * 6, dtype=np.float32) * C * 6  # SPD
    Sj = jnp.asarray(S)
    b = jnp.asarray(rngm.normal(0, 1, C * 6).astype(np.float32))

    t = timeit(jax.jit(lambda S, b: jnp.linalg.solve(S, b)), Sj, b, reps=3)
    print(f"  solve_LU_1056_ms         {t:8.2f}", flush=True)

    import jax.scipy.linalg as jsl

    @jax.jit
    def chol_solve(S, b):
        L = jsl.cholesky(S, lower=True)
        return jsl.solve_triangular(
            L.T, jsl.solve_triangular(L, b, lower=True), lower=False)

    t = timeit(chol_solve, Sj, b, reps=3)
    print(f"  solve_chol_1056_ms       {t:8.2f}", flush=True)

    # segment sums at O scale (Hpp / bp build)
    @jax.jit
    def seg(Jp):
        return jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", Jp, Jp), obs_pt, num_segments=P)

    t = timeit(seg, Jp, reps=3)
    print(f"  Hpp_segsum_ms            {t:8.2f}", flush=True)

    # one-hot camera reduction
    @jax.jit
    def cam_onehot(Jc):
        oh = jax.nn.one_hot(obs_cm, C, dtype=jnp.float32)
        return (oh.T @ jnp.einsum("oij,oik->ojk", Jc, Jc).reshape(O, 36)).reshape(C, 6, 6)

    t = timeit(cam_onehot, Jc, reps=3)
    print(f"  Hcc_onehot_ms            {t:8.2f}", flush=True)

    # linearize alone at production shape
    from orbslam3_tpu.optim import ba as ba_mod
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod

    paramsb, prob = bench_mod._make_ba(np.random.default_rng(0), 176, 8192, 512,
                                       n_fixed=128)

    @jax.jit
    def lin_only(prob):
        return ba_mod._linearize(
            model, paramsb, 0.0, prob.cam_R, prob.cam_t, prob.points, prob,
            jnp.ones_like(prob.obs_valid))

    t = timeit(lin_only, prob, reps=3)
    print(f"  linearize_90k_ms         {t:8.2f}", flush=True)


if __name__ == "__main__":
    main()
