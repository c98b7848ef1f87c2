"""Pose-inertial motion-only optimization (tracking, after IMU init).

Re-design of `Optimizer::PoseInertialOptimizationLastKeyFrame`
(`/root/reference/src/Optimizer.cc:3752`, the g2o graph of
`G2oTypes.h` EdgeMonoOnlyPose/EdgeStereoOnlyPose + EdgeInertial +
EdgeGyroRW/EdgeAccRW): the current frame's 15-dof body state
[R_wb, p_wb, v, bg, ba] is optimized against

  * visual reprojection residuals of its map-point matches (robust),
  * the IMU preintegration edge to the last keyframe, whose state is
    held FIXED (the reference fixes the KF vertices too),
  * bias random-walk residuals to the keyframe's biases.

The `...LastFrame` variant with its `ConstraintPoseImu`
marginalization prior (`Optimizer.cc:4075`) reduces to this form when
the anchor is held fixed (infinite prior information); tracking calls
this once per frame with the last KEYFRAME as anchor, which avoids
accumulating the frame-to-frame marginalization chain entirely.

TPU form: no g2o graph — one jitted Gauss-Newton loop. The 15-column
Jacobian of the whitened residual stack comes from `jax.jacfwd` (15
JVPs of a fixed-shape program), the normal system is a single 15x15
solve, and the 4-round chi2 re-gating of `PoseOptimization` is kept
for the visual rows.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.ops import imu as imu_ops
from orbslam3_tpu.ops import lie
from orbslam3_tpu.optim import lm
from orbslam3_tpu.optim.inertial import imu_residual
from orbslam3_tpu.optim.pose_only import PoseObs


class PoseInertialResult(NamedTuple):
    R_wb: jnp.ndarray
    p_wb: jnp.ndarray
    v: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    Rcw: jnp.ndarray
    tcw: jnp.ndarray
    inlier: jnp.ndarray  # (N,) visual inliers
    n_inliers: jnp.ndarray


def _body_to_cam(R_wb, p_wb, Rbc, tbc):
    Rwc = R_wb @ Rbc
    Rcw = Rwc.T
    tcw = -Rcw @ (p_wb + R_wb @ tbc)
    return Rcw, tcw


def _retract(R, p, v, bg, ba, dx):
    dth, dp, dv, dbg, dba = (
        dx[0:3], dx[3:6], dx[6:9], dx[9:12], dx[12:15]
    )
    Rn = R @ lie.exp_so3(dth)
    return Rn, p + R @ dp, v + dv, bg + dbg, ba + dba


def _vis_e(model, params, bf, Rcw, tcw, obs: PoseObs):
    """Visual residual rows (N,3) — the `e` half of
    `pose_only._residuals` (the Jacobian comes from autodiff here)."""
    Xc = lie.se3_apply(Rcw, tcw, obs.Xw)
    uv_hat = cam.project(model, params, Xc)
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    is_stereo = obs.ur >= 0.0
    ur_hat = uv_hat[..., 0] - bf * inv_z
    e = jnp.concatenate(
        [uv_hat - obs.uv, jnp.where(is_stereo, ur_hat - obs.ur, 0.0)[..., None]],
        axis=-1,
    )
    ok = obs.valid & (z > 1e-3)
    return e, ok, is_stereo


@functools.partial(
    jax.jit, static_argnames=("model", "rounds", "iters_per_round")
)
def optimize_pose_inertial(
    model: cam.CameraModel,
    params: jnp.ndarray,
    obs: PoseObs,
    Rbc: jnp.ndarray,  # body->cam extrinsics (Tbc as in inertial_support)
    tbc: jnp.ndarray,
    R_kf: jnp.ndarray,  # anchor keyframe body state (FIXED)
    p_kf: jnp.ndarray,
    v_kf: jnp.ndarray,
    bg_kf: jnp.ndarray,
    ba_kf: jnp.ndarray,
    pre: imu_ops.Preintegrated,  # KF -> current frame
    R0_wb: jnp.ndarray,  # current-state initial guess (from PredictStateIMU)
    p0_wb: jnp.ndarray,
    v0: jnp.ndarray,
    bf: float = 0.0,
    rounds: int = 4,
    iters_per_round: int = 5,
) -> PoseInertialResult:
    C9 = pre.C[:9, :9]
    info9 = jnp.linalg.inv(0.5 * (C9 + C9.T) + 1e-10 * jnp.eye(9))
    L_imu = jnp.linalg.cholesky(0.5 * (info9 + info9.T))
    Crw = pre.C[9:, 9:]
    info_rw = jnp.linalg.inv(Crw + 1e-12 * jnp.eye(6))
    L_rw = jnp.linalg.cholesky(0.5 * (info_rw + info_rw.T))
    g = imu_ops.GRAVITY
    inv_sig = jnp.sqrt(1.0 / obs.sigma2)

    def whitened(state, active, w_rob_sqrt):
        """(3N+15,) whitened residual stack as a function of dx=0-centred
        state; robust weights are frozen per iteration (IRLS)."""
        R, p, v, bg, ba = state
        Rcw, tcw = _body_to_cam(R, p, Rbc, tbc)
        e, ok, _ = _vis_e(model, params, bf, Rcw, tcw, obs)
        w = jnp.where(ok & active, inv_sig * w_rob_sqrt, 0.0)
        e_vis = (e * w[:, None]).reshape(-1)
        r_imu = imu_residual(
            R_kf, p_kf, v_kf, bg, ba, R, p, v,
            pre.dR, pre.dV, pre.dP, pre.JRg, pre.JVg, pre.JVa,
            pre.JPg, pre.JPa, pre.bias_gyro, pre.bias_acc, pre.dT, g,
        )
        r_rw = jnp.concatenate([bg - bg_kf, ba - ba_kf])
        return jnp.concatenate([e_vis, L_imu.T @ r_imu, L_rw.T @ r_rw])

    def chi2_vis(state):
        R, p, v, bg, ba = state
        Rcw, tcw = _body_to_cam(R, p, Rbc, tbc)
        e, ok, is_stereo = _vis_e(model, params, bf, Rcw, tcw, obs)
        return jnp.sum(e * e, -1) / obs.sigma2, ok, is_stereo

    def gn_iteration(carry, _):
        state, lamb, active = carry
        c2, ok, is_stereo = chi2_vis(state)
        delta2 = jnp.where(is_stereo, lm.CHI2_STEREO, lm.CHI2_MONO)
        w_rob_sqrt = jnp.sqrt(lm.huber_weight(c2, delta2))

        def r_of_dx(dx):
            return whitened(_retract(*state, dx), active, w_rob_sqrt)

        dx0 = jnp.zeros(15)
        r0 = r_of_dx(dx0)
        J = jax.jacfwd(r_of_dx)(dx0)  # (M,15)
        H = J.T @ J
        b = J.T @ r0
        Hd = H + lamb * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(15)
        dx = -jnp.linalg.solve(Hd, b)
        new_state = _retract(*state, dx)
        new_state = (lie.normalize_rotation(new_state[0]),) + new_state[1:]
        c_old = jnp.sum(r0 * r0)
        r_new = whitened(new_state, active, w_rob_sqrt)
        c_new = jnp.sum(r_new * r_new)
        better = c_new < c_old
        state = jax.tree.map(
            lambda a, b_: jnp.where(better, b_, a), state, new_state
        )
        lamb = jnp.where(better, lamb * 0.5, lamb * 4.0)
        return (state, jnp.clip(lamb, 1e-8, 1e4), active), None

    state = (R0_wb, p0_wb, v0, bg_kf, ba_kf)
    active = obs.valid

    for _ in range(rounds):
        (state, _, active), _ = jax.lax.scan(
            gn_iteration, (state, jnp.float32(1e-3), active),
            None, length=iters_per_round,
        )
        c2, ok, is_stereo = chi2_vis(state)
        gate = jnp.where(is_stereo, lm.CHI2_STEREO, lm.CHI2_MONO)
        active = obs.valid & ok & (c2 <= gate)

    R, p, v, bg, ba = state
    Rcw, tcw = _body_to_cam(R, p, Rbc, tbc)
    return PoseInertialResult(
        R_wb=R, p_wb=p, v=v, bg=bg, ba=ba, Rcw=Rcw, tcw=tcw,
        inlier=active, n_inliers=jnp.sum(active.astype(jnp.int32)),
    )
