"""Pose-inertial motion-only optimizer: recover a perturbed frame state
from visual matches + one preintegrated IMU edge to a fixed keyframe."""

import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import cameras as cam
from orbslam3_tpu.ops import imu as imu_ops
from orbslam3_tpu.ops import lie
from orbslam3_tpu.optim.pose_inertial import optimize_pose_inertial
from orbslam3_tpu.optim.pose_only import PoseObs

G = np.array([0.0, 0.0, -9.81], np.float32)


def _simulate(dt_total=0.5, hz=200, omega=(0.1, -0.2, 0.3), a_w=(0.4, 0.1, 0.2)):
    """Truth propagation + IMU samples (zero true bias)."""
    omega = np.asarray(omega, np.float32)
    a_w = np.asarray(a_w, np.float32)
    n = int(dt_total * hz)
    dt = dt_total / n
    R = np.eye(3, dtype=np.float32)
    p = np.zeros(3, np.float32)
    v = np.array([0.3, -0.1, 0.05], np.float32)
    R0, p0, v0 = R.copy(), p.copy(), v.copy()
    gyr, acc, dts = [], [], []
    for _ in range(n):
        gyr.append(omega)
        acc.append(R.T @ (a_w - G))
        dts.append(dt)
        Rmid = R @ np.asarray(lie.exp_so3(jnp.asarray(omega * dt / 2)))
        # (use start-of-interval specific force; consistent with the
        # preintegrator's piecewise-constant sample model)
        R = R @ np.asarray(lie.exp_so3(jnp.asarray(omega * dt)))
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
    return (R0, p0, v0), (R, p, v), (
        np.stack(acc), np.stack(gyr), np.asarray(dts, np.float32))


def test_pose_inertial_recovers_state():
    (R_kf, p_kf, v_kf), (R1, p1, v1), (acc, gyr, dts) = _simulate()
    calib = imu_ops.ImuCalib.create(
        jnp.eye(3), jnp.zeros(3), 1.7e-4, 2e-3, 2e-5, 3e-3, 200.0
    )
    pre = imu_ops.integrate(
        jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
        jnp.zeros(3), jnp.zeros(3), calib,
    )
    # Consistency of the simulated edge with truth.
    dP_err = np.asarray(pre.dP) - R_kf.T @ (
        p1 - p_kf - v_kf * float(pre.dT) - 0.5 * G * float(pre.dT) ** 2)
    assert np.linalg.norm(dP_err) < 2e-3, dP_err

    # Visual observations of the TRUE current pose (body == camera).
    rng = np.random.default_rng(0)
    params = cam.make_pinhole(300.0, 300.0, 320.0, 240.0)
    N = 96
    Xw = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                   rng.uniform(3, 6, N)], -1).astype(np.float32)
    Rcw, tcw = R1.T, -R1.T @ p1
    Xc = (Rcw @ Xw.T).T + tcw
    uv = np.asarray(cam.pinhole_project(params, jnp.asarray(Xc))).copy()
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    # 10% outliers
    out = rng.random(N) < 0.1
    uv[out] += rng.uniform(30, 80, (out.sum(), 2)).astype(np.float32)
    obs = PoseObs(
        Xw=jnp.asarray(Xw), uv=jnp.asarray(uv),
        ur=jnp.full(N, -1.0), sigma2=jnp.ones(N),
        valid=jnp.asarray(Xc[:, 2] > 0.3),
    )

    # Perturbed initial guess.
    dR = np.asarray(lie.exp_so3(jnp.asarray([0.03, -0.02, 0.04])))
    res = optimize_pose_inertial(
        cam.CameraModel.PINHOLE, params, obs,
        jnp.eye(3), jnp.zeros(3),
        jnp.asarray(R_kf), jnp.asarray(p_kf), jnp.asarray(v_kf),
        jnp.zeros(3), jnp.zeros(3),
        pre,
        jnp.asarray(R1 @ dR), jnp.asarray(p1 + [0.05, -0.04, 0.06]),
        jnp.asarray(v1 + [0.3, -0.2, 0.25]),
    )
    assert np.linalg.norm(np.asarray(res.p_wb) - p1) < 1e-2
    ang = np.arccos(np.clip((np.trace(np.asarray(res.R_wb).T @ R1) - 1) / 2, -1, 1))
    assert ang < 5e-3, ang
    assert np.linalg.norm(np.asarray(res.v) - v1) < 5e-2
    assert np.linalg.norm(np.asarray(res.bg)) < 0.02
    assert int(res.n_inliers) >= N * 0.75
    # Outliers rejected.
    inl = np.asarray(res.inlier)
    assert inl[out].sum() <= 2
