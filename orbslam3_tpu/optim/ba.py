"""Bundle adjustment with implicit Schur complement — the core g2o
replacement.

Re-designs `Optimizer::BundleAdjustment` / `LocalBundleAdjustment`
(`/root/reference/src/Optimizer.cc:78,1811`) and g2o's
`BlockSolver`+Schur machinery (`Thirdparty/g2o/g2o/core/block_solver.hpp`)
for TPU:

* The problem is a fixed-shape batch: cameras ``[C]``, points ``[P]``,
  observations ``[O]`` with validity masks — no graphs, no pointers.
* ``Hcc`` is block-diagonal (each observation touches one camera), so the
  reduced camera system ``S = Hcc - W Hpp^-1 W^T`` is applied
  *matrix-free*: one PCG matvec is two gathers + two segment-sums + tiny
  batched matmuls — exactly the shape XLA tiles well, and the layout that
  distributes over a device mesh with a single ``psum`` (see
  ``parallel/ba_sharded.py``).
* Landmarks are eliminated with closed-form batched 3x3 inverses; robust
  Huber weights and per-octave information are folded in by whitening.
* LM damping with accept/reject runs as fixed-shape `lax` control flow.

Fixed cameras (the reference's frontier KFs, `Optimizer.cc:1903-1944`)
simply get their Jacobian columns zeroed and an identity row in `Hcc`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.ops import lie
from orbslam3_tpu.optim import lm


class BAProblem(NamedTuple):
    cam_R: jnp.ndarray  # (C,3,3) Tcw rotations
    cam_t: jnp.ndarray  # (C,3)
    cam_fixed: jnp.ndarray  # (C,) bool
    points: jnp.ndarray  # (P,3) world positions
    point_valid: jnp.ndarray  # (P,) bool
    obs_cam: jnp.ndarray  # (O,) int32
    obs_point: jnp.ndarray  # (O,) int32
    obs_uv: jnp.ndarray  # (O,2)
    obs_ur: jnp.ndarray  # (O,) right-u; <0 => mono
    obs_sigma2: jnp.ndarray  # (O,)
    obs_valid: jnp.ndarray  # (O,) bool
    # Optional second-camera flag for two-camera rigs (stereo-fisheye):
    # rows with obs_right=True project through Trl * Tcw into the RIGHT
    # camera (ref `EdgeSE3ProjectXYZToBody`, `OptimizableTypes.h:132`).
    obs_right: jnp.ndarray | None = None  # (O,) bool


class BAResult(NamedTuple):
    cam_R: jnp.ndarray
    cam_t: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # (O,) bool — chi2-gated at the final state
    cost: jnp.ndarray


def _linearize(model, params, bf, cam_R, cam_t, points, prob: BAProblem, active,
               cam2=None):
    """Whitened residuals and Jacobians for every observation.

    `cam2 = (params2, R_rl, t_rl)`: rows flagged in `prob.obs_right`
    project through the rig extrinsics into the second camera
    (`EdgeSE3ProjectXYZToBody` semantics) — the chain rule just inserts
    R_rl between the projection Jacobian and the pose/point blocks.

    Returns e_w (O,3), Jc_w (O,3,6), Jp_w (O,3,3), chi2 (O,), ok (O,).
    """
    Rc = cam_R[prob.obs_cam]  # (O,3,3)
    tc = cam_t[prob.obs_cam]
    Xw = points[prob.obs_point]
    Xc = lie.se3_apply(Rc, tc, Xw)
    if cam2 is not None and prob.obs_right is not None:
        params2, R_rl, t_rl = cam2
        is_r = prob.obs_right
        Xc2 = Xc @ R_rl.T + t_rl
        z = jnp.where(is_r, Xc2[..., 2], Xc[..., 2])
        uv_hat = jnp.where(
            is_r[:, None],
            cam.project(model, params2, Xc2),
            cam.project(model, params, Xc),
        )
        Jp_l = cam.project_jac(model, params, Xc)
        Jp_r = jnp.einsum("oij,jk->oik", cam.project_jac(model, params2, Xc2), R_rl)
        Jproj = jnp.where(is_r[:, None, None], Jp_r, Jp_l)
        is_stereo = (prob.obs_ur >= 0.0) & ~is_r
    else:
        z = Xc[..., 2]
        uv_hat = cam.project(model, params, Xc)
        Jproj = cam.project_jac(model, params, Xc)  # (O,2,3)
        is_stereo = prob.obs_ur >= 0.0
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur_hat = uv_hat[..., 0] - bf * inv_z
    e = jnp.concatenate(
        [uv_hat - prob.obs_uv, jnp.where(is_stereo, ur_hat - prob.obs_ur, 0.0)[..., None]],
        axis=-1,
    )

    dz = jnp.zeros_like(Jproj[:, 0, :]).at[:, 2].set(1.0)
    Jur = Jproj[:, 0, :] + (bf * inv_z * inv_z)[:, None] * dz
    Jur = jnp.where(is_stereo[:, None], Jur, 0.0)
    JXc = jnp.concatenate([Jproj, Jur[:, None, :]], axis=1)  # (O,3,3) d e / d Xc

    # Camera: left-mult update on Tcw -> dXc/d[rho,phi] = [I | -hat(Xc)]
    dXc_dcam = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape + (3,)), -lie.hat(Xc)],
        axis=-1,
    )  # (O,3,6)
    Jc = jnp.einsum("oij,ojk->oik", JXc, dXc_dcam)
    # Point: dXc/dXw = Rc
    Jp = jnp.einsum("oij,ojk->oik", JXc, Rc)

    ok = active & prob.obs_valid & (z > 1e-3) & prob.point_valid[prob.obs_point]
    inv_s2 = 1.0 / prob.obs_sigma2
    chi2 = jnp.sum(e * e, axis=-1) * inv_s2
    delta2 = jnp.where(is_stereo, lm.CHI2_STEREO, lm.CHI2_MONO)
    w = jnp.where(ok, inv_s2 * lm.huber_weight(chi2, delta2), 0.0)
    # Fixed cameras contribute to points but not to camera updates.
    cam_free = ~prob.cam_fixed[prob.obs_cam]
    sw = jnp.sqrt(w)[:, None, None]
    Jc_w = Jc * sw * cam_free[:, None, None]
    Jp_w = Jp * sw
    e_w = e * jnp.sqrt(w)[:, None]
    return e_w, Jc_w, Jp_w, chi2, ok, is_stereo


def _robust_cost(chi2, ok, is_stereo):
    d2 = jnp.where(is_stereo, lm.CHI2_STEREO, lm.CHI2_MONO)
    rho = jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 1e-12)) - d2)
    return jnp.sum(jnp.where(ok, rho, 0.0))


def auto_dense_schur(C: int, P: int, hbm_budget_bytes: int = 8 << 30) -> bool:
    """Pick the explicit-reduced-camera-system path when its PEAK HBM fits
    the budget; otherwise the matrix-free PCG path wins on memory.

    Peak accounting (not just the resident W): `_solve_ba_dense`'s
    accept/reject fori_loop carries TWO linearizations — the accepted base
    and the candidate — each holding the (P,C,3,6) coupling tensor W *and*
    HW = Hpp^-1 W, plus a transposed reshape copy of each alive during the
    (6C,3P)@(3P,6C) reduced-system matmul. That is ~4 tensors of
    C*P*18 f32 live at once, ~5 with the matmul scratch: peak ≈
    5 * C*P*72 bytes. At the former C*P = 128*16384*2 cutoff this is
    ~1.5 GB — fine on a 16 GB chip, several times the old docstring's
    "~300 MB for W" estimate (round-3 advisor finding).

    The win past the cutoff: one exact 6Cx6C solve replaces ~50 PCG matvec
    dispatches — measured 86 -> 28 ms/iter at a 128-KF/16k-point GBA on
    v5e. Nf/O terms are ignored: observation-sized buffers are shared by
    both paths and don't differentiate them."""
    peak_bytes = 5 * C * P * 18 * 4
    return peak_bytes <= hbm_budget_bytes


def solve_ba(
    model: cam.CameraModel,
    params: jnp.ndarray,
    prob: BAProblem,
    bf: float = 0.0,
    iters: int = 10,
    pcg_iters: int = 50,
    point_damping: float = 1e-6,
    axis_name: str | None = None,
    point_axis_local: bool = False,
    dense_schur: bool = False,
    cam2=None,  # (params2, R_rl, t_rl) two-camera rig extrinsics
) -> BAResult:
    """LM bundle adjustment. `iters` ~ the reference's budgets
    (5+10 local `Optimizer.cc:1990-2012`, 10 global, 20 at init).

    `axis_name`: when called inside `shard_map` with the observation axis
    sharded across a device mesh (cameras/points replicated), pass the
    mesh axis name — every observation reduction becomes a local
    segment-sum + one `psum` over ICI, which is the entire distributed-BA
    communication pattern (SURVEY.md §5.8).

    `point_axis_local`: the point axis is SHARDED, not replicated — this
    shard owns `prob.points` and every observation of those points
    (`prob.obs_point` holds shard-local indices). Point-block reductions
    (Hpp, bp, both PCG matvec segment-sums into points) then need NO
    collective at all; only the reduced camera system is `psum`'d. This
    is the state-scaling layout of `parallel/ba_sharded.py::
    solve_ba_point_sharded` (SURVEY §7 step 9: keyframe/map-point block
    partitioning).

    `dense_schur`: assemble the reduced camera system S = Hcc - W Hpp^-1
    W^T EXPLICITLY (one segment-sum into (P,C) coupling blocks + one
    MXU-shaped contraction) and solve the tiny dense 6Cx6C system, instead
    of running `pcg_iters` matrix-free matvecs. Two wins: (a) on one chip
    the whole Schur solve is ~3 device ops instead of ~10*pcg_iters tiny
    gather/scatter ops inside a fori_loop — the LM iteration stops being
    dispatch-bound; (b) distributed (`point_axis_local`), the ONLY
    collective per LM iteration is one psum of (S, b_red) — 36C^2+6C
    floats — where the matrix-free path psums every matvec
    (g2o's sparse-Cholesky-on-host role, re-laid-out for the MXU).
    Memory is O(P*C*18) for the coupling blocks — use for C up to ~128."""
    if dense_schur:
        return _solve_ba_dense(
            model, params, prob, bf, iters, point_damping, axis_name,
            point_axis_local, cam2=cam2,
        )

    C = prob.cam_R.shape[0]
    P = prob.points.shape[0]

    def _allreduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def seg_cam(vals):  # (O_local,...) -> (C,...) replicated
        return _allreduce(jax.ops.segment_sum(vals, prob.obs_cam, num_segments=C))

    def seg_point(vals):  # (O_local,...) -> (P,...); local when points are sharded
        s = jax.ops.segment_sum(vals, prob.obs_point, num_segments=P)
        return s if point_axis_local else _allreduce(s)

    eye6 = jnp.eye(6, dtype=prob.cam_R.dtype)
    eye3 = jnp.eye(3, dtype=prob.cam_R.dtype)

    def gn_step(state, lamb):
        cam_R, cam_t, points = state
        e_w, Jc_w, Jp_w, chi2, ok, is_st = _linearize(
            model, params, bf, cam_R, cam_t, points, prob,
            jnp.ones_like(prob.obs_valid), cam2=cam2,
        )
        # Point-block Hessians (local-complete when the point axis is
        # sharded, so the damped inverse below is exact per shard).
        Hpp = seg_point(jnp.einsum("oij,oik->ojk", Jp_w, Jp_w))  # (P,3,3)
        bp = -seg_point(jnp.einsum("oij,oi->oj", Jp_w, e_w))  # (P,3)
        Hpp = Hpp + (lamb * jnp.abs(Hpp) * jnp.eye(3)[None] + point_damping * eye3[None])
        Hpp_inv = lm.inv3x3(Hpp)
        y0 = jnp.einsum("pij,pj->pi", Hpp_inv, bp)  # (P,3)
        v0 = jnp.einsum("oij,oj->oi", Jp_w, y0[prob.obs_point])  # (O,3)

        def _damp_cc(Hcc_raw):
            H = Hcc_raw + (lamb * jnp.abs(Hcc_raw) * jnp.eye(6)[None] + 1e-8 * eye6[None])
            return jnp.where(prob.cam_fixed[:, None, None], eye6[None], H)

        Hcc = _damp_cc(seg_cam(jnp.einsum("oij,oik->ojk", Jc_w, Jc_w)))
        bc = -seg_cam(jnp.einsum("oij,oi->oj", Jc_w, e_w))  # (C,6)
        Hcc_inv = jnp.linalg.inv(Hcc)  # block-Jacobi preconditioner

        # Reduced RHS: b_red = bc - W Hpp^-1 bp.
        b_red = bc - seg_cam(jnp.einsum("oij,oi->oj", Jc_w, v0))

        def matvec(x):  # x: (C,6)
            u = jnp.einsum("oij,oj->oi", Jc_w, x[prob.obs_cam])  # (O,3)
            tp = seg_point(jnp.einsum("oij,oi->oj", Jp_w, u))  # (P,3)
            y = jnp.einsum("pij,pj->pi", Hpp_inv, tp)
            v = jnp.einsum("oij,oj->oi", Jp_w, y[prob.obs_point])  # (O,3)
            z = seg_cam(jnp.einsum("oij,oi->oj", Jc_w, v))
            Hx = jnp.einsum("cij,cj->ci", Hcc, x)
            return Hx - z

        def precond(r):
            return jnp.einsum("cij,cj->ci", Hcc_inv, r)

        dc = lm.pcg(matvec, b_red, precond, iters=pcg_iters).x  # (C,6)
        dc = jnp.where(prob.cam_fixed[:, None], 0.0, dc)

        # Back-substitute points: dp = Hpp^-1 (bp - W^T dc).
        u = jnp.einsum("oij,oj->oi", Jc_w, dc[prob.obs_cam])
        tp = seg_point(jnp.einsum("oij,oi->oj", Jp_w, u))
        dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - tp)
        dp = jnp.where(prob.point_valid[:, None], dp, 0.0)

        dR, dt = lie.exp_se3(dc)
        R_new, t_new = lie.se3_compose(dR, dt, cam_R, cam_t)
        R_new = lie.normalize_rotation(R_new)
        R_new = jnp.where(prob.cam_fixed[:, None, None], cam_R, R_new)
        t_new = jnp.where(prob.cam_fixed[:, None], cam_t, t_new)
        return (R_new, t_new, points + dp)

    def cost_fn(state):
        cam_R, cam_t, points = state
        _, _, _, chi2, ok, is_st = _linearize(
            model, params, bf, cam_R, cam_t, points, prob,
            jnp.ones_like(prob.obs_valid), cam2=cam2,
        )
        return _allreduce(_robust_cost(chi2, ok, is_st))

    state, cost = lm.lm_loop(
        (prob.cam_R, prob.cam_t, prob.points), cost_fn, gn_step, iters
    )
    cam_R, cam_t, points = state
    _, _, _, chi2, ok, is_st = _linearize(
        model, params, bf, cam_R, cam_t, points, prob,
        jnp.ones_like(prob.obs_valid), cam2=cam2,
    )
    gate = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    inlier = ok & (chi2 <= gate)
    return BAResult(cam_R=cam_R, cam_t=cam_t, points=points, obs_inlier=inlier, cost=cost)


def _solve_ba_dense(
    model, params, prob: BAProblem, bf, iters, point_damping,
    axis_name, point_axis_local, cam2=None,
) -> BAResult:
    """Explicit-reduced-camera-system LM (the `dense_schur=True` path).

    Per iteration: ONE linearization at the current candidate, whose
    robust cost doubles as the accept/reject test for the PREVIOUS step
    (deferred-accept LM — the classic evaluate-f-and-J-together
    formulation), and ONE collective: a psum of the packed
    (S, b_red, Hcc, cost). A rejected step re-damps the STORED base
    linearization (S is tiny), exactly like g2o's LM re-try with raised
    lambda (`optimization_algorithm_levenberg.cpp`). The point blocks
    carry a fixed (lambda-independent) damping so S depends on lambda
    only through its camera diagonal.

    The Schur term is built as one MXU matmul: per-obs coupling blocks
    W_o = Jp^T Jc scattered into (P,C,3,6), then
    S_cross = reshape(W)^T-contract-(p,3)-reshape(Hpp^-1 W).
    """
    C = prob.cam_R.shape[0]
    P = prob.points.shape[0]
    O = prob.obs_cam.shape[0]
    dtype = prob.cam_R.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    diag_idx = jnp.arange(C)
    fixed = prob.cam_fixed
    obs_shared = axis_name is not None and not point_axis_local

    # A (point, camera) pair holds AT MOST ONE observation (a map point
    # occupies one feature slot per keyframe — add_keyframe/fuse Replace
    # semantics dedupe), so the W coupling blocks are a PLACEMENT, not a
    # sum: build the (P*C -> obs row) index map once per solve (scatter of
    # int32 rows) and turn every per-iteration W build into a gather —
    # measured 2.2x faster than the (P*C)-segment scatter-add on TPU v5e.
    # Invalid observations are redirected to a dump slot so they can
    # never shadow a real one; unobserved (p,c) slots read the zero row.
    pk = prob.obs_point * C + prob.obs_cam
    pk_safe = jnp.where(prob.obs_valid, pk, P * C)
    inv_idx = (
        jnp.full(P * C + 1, O, jnp.int32)
        .at[pk_safe]
        .set(jnp.arange(O, dtype=jnp.int32), unique_indices=True)
    )[: P * C]

    def linearize_pack(cam_R, cam_t, points):
        """Returns (S_und (C,6,C,6), b_red (C,6), Hcc (C,6,6),
        bp (P,3), Hpp_inv (P,3,3), W (P,C,3,6), cost) — everything a
        damped re-solve needs, reduced across shards in ONE psum."""
        e_w, Jc_w, Jp_w, chi2, ok, is_st = _linearize(
            model, params, bf, cam_R, cam_t, points, prob,
            jnp.ones_like(prob.obs_valid), cam2=cam2,
        )
        cost_l = _robust_cost(chi2, ok, is_st)
        seg = jax.ops.segment_sum
        # Camera-side reductions as ONE-HOT MATMULS on the MXU instead of
        # segment scatters (C is small, the (O,C) one-hot is cheap; TPU
        # scatter-adds run at a fraction of matmul throughput).
        cam_1h = jax.nn.one_hot(prob.obs_cam, C, dtype=dtype)  # (O, C)
        Hcc_l = (cam_1h.T @ jnp.einsum("oij,oik->ojk", Jc_w, Jc_w)
                 .reshape(O, 36)).reshape(C, 6, 6)
        bc_l = -(cam_1h.T @ jnp.einsum("oij,oi->oj", Jc_w, e_w))
        Hpp_l = seg(jnp.einsum("oij,oik->ojk", Jp_w, Jp_w), prob.obs_point,
                    num_segments=P)
        bp_l = -seg(jnp.einsum("oij,oi->oj", Jp_w, e_w), prob.obs_point,
                    num_segments=P)
        Wv = jnp.einsum("oia,oib->oab", Jp_w, Jc_w).reshape(O, 18)
        Wv = jnp.concatenate([Wv, jnp.zeros((1, 18), dtype)], 0)
        W_l = Wv[inv_idx].reshape(P, C, 3, 6)
        if obs_shared:
            # Observations sharded, points replicated: the point-side
            # partial sums must be global BEFORE Hpp^-1 — one (heavier)
            # psum; everything after is computed redundantly per shard.
            Hpp_g, bp, W, Hcc_g, bc_g, cost = jax.lax.psum(
                (Hpp_l, bp_l, W_l, Hcc_l, bc_l, cost_l), axis_name
            )
        else:
            Hpp_g, bp, W, Hcc_g, bc_g, cost = (
                Hpp_l, bp_l, W_l, Hcc_l, bc_l, cost_l
            )
        # Lambda-INDEPENDENT point damping: absolute floor + small
        # relative Tikhonov, so a rejected step can re-damp S without
        # rebuilding the Schur term.
        Hpp_d = Hpp_g + (point_damping + 1e-4 * jnp.abs(Hpp_g)) * eye3[None]
        Hpp_inv = lm.inv3x3(Hpp_d)
        HW = jnp.einsum("pij,pcjb->pcib", Hpp_inv, W)  # (P,C,3,6)
        # Contract (p,3): one (6C x 3P)@(3P x 6C) matmul.
        Wm = W.transpose(1, 3, 0, 2).reshape(C * 6, P * 3)
        HWm = HW.transpose(0, 2, 1, 3).reshape(P * 3, C * 6)
        S_cross = (Wm @ HWm).reshape(C, 6, C, 6)
        y0 = jnp.einsum("pij,pj->pi", Hpp_inv, bp)
        b_red_l = bc_g - jnp.einsum("pcab,pa->cb", W, y0)
        S_l = -S_cross
        S_l = S_l.at[diag_idx, :, diag_idx, :].add(Hcc_g)
        if obs_shared or axis_name is None:
            S_und, b_red = S_l, b_red_l
        else:
            # Point-sharded layout: THE one collective per LM iteration.
            pack = jnp.concatenate([
                S_l.reshape(-1), b_red_l.reshape(-1), Hcc_g.reshape(-1),
                cost[None],
            ])
            pack = jax.lax.psum(pack, axis_name)
            n_s = C * 6 * C * 6
            n_b = C * 6
            S_und = pack[:n_s].reshape(C, 6, C, 6)
            b_red = pack[n_s : n_s + n_b].reshape(C, 6)
            Hcc_g = pack[n_s + n_b : n_s + n_b + C * 36].reshape(C, 6, 6)
            cost = pack[-1]
        return S_und, b_red, Hcc_g, bp, Hpp_inv, W, cost

    def damped_step(lin, state, lamb):
        S_und, b_red, Hcc_g, bp, Hpp_inv, W, _ = lin
        cam_R, cam_t, points = state
        damp = lamb * jnp.abs(Hcc_g) * eye6[None] + 1e-8 * eye6[None]
        S_g = S_und.at[diag_idx, :, diag_idx, :].add(damp)
        keep = (~fixed).astype(dtype)
        S_g = S_g * keep[:, None, None, None] * keep[None, None, :, None]
        S_g = S_g.at[diag_idx, :, diag_idx, :].add(
            jnp.where(fixed, 1.0, 0.0)[:, None, None] * eye6[None]
        )
        S = S_g.reshape(C * 6, C * 6)
        S = 0.5 * (S + S.T)
        rhs = jnp.where(fixed[:, None], 0.0, b_red)
        dc = jnp.linalg.solve(S, rhs.reshape(-1)).reshape(C, 6)
        dc = jnp.where(fixed[:, None], 0.0, dc)
        # Back-substitute points through the stored coupling blocks.
        tp = jnp.einsum("pcab,cb->pa", W, dc)
        dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - tp)
        dp = jnp.where(prob.point_valid[:, None], dp, 0.0)
        dR, dt = lie.exp_se3(dc)
        R_new, t_new = lie.se3_compose(dR, dt, cam_R, cam_t)
        R_new = lie.normalize_rotation(R_new)
        R_new = jnp.where(fixed[:, None, None], cam_R, R_new)
        t_new = jnp.where(fixed[:, None], cam_t, t_new)
        return (R_new, t_new, points + dp)

    base = (prob.cam_R, prob.cam_t, prob.points)
    lin0 = linearize_pack(*base)
    lam0 = jnp.asarray(1e-4, jnp.float32)
    cand0 = damped_step(lin0, base, lam0)

    def body(_, carry):
        base, lin, lam, cand = carry
        lin_c = linearize_pack(*cand)
        accept = lin_c[-1] < lin[-1]
        # lax.cond (not elementwise where): selects whole buffers — the
        # carried linearization includes the (P,C,3,6) coupling blocks,
        # which a where-blend would stream through memory twice per iter.
        base, lin = jax.lax.cond(
            accept, lambda: (cand, lin_c), lambda: (base, lin)
        )
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        cand = damped_step(lin, base, lam)
        return (base, lin, lam, cand)

    base, lin, _, _ = jax.lax.fori_loop(0, iters, body, (base, lin0, lam0, cand0))
    cam_R, cam_t, points = base
    cost = lin[-1]
    _, _, _, chi2, ok, is_st = _linearize(
        model, params, bf, cam_R, cam_t, points, prob,
        jnp.ones_like(prob.obs_valid), cam2=cam2,
    )
    gate = jnp.where(is_st, lm.CHI2_STEREO, lm.CHI2_MONO)
    inlier = ok & (chi2 <= gate)
    return BAResult(cam_R=cam_R, cam_t=cam_t, points=points,
                    obs_inlier=inlier, cost=cost)


solve_ba_jit = jax.jit(
    solve_ba,
    static_argnames=(
        "model", "iters", "pcg_iters", "axis_name", "point_axis_local",
        "dense_schur",
    ),
)
