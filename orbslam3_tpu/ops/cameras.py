"""Camera models: pinhole (+radtan distortion) and Kannala-Brandt8 fisheye.

Functional re-design of the reference's `GeometricCamera` class hierarchy
(`/root/reference/include/CameraModels/GeometricCamera.h:37-107`,
`src/CameraModels/Pinhole.cpp`, `src/CameraModels/KannalaBrandt8.cpp`):
instead of virtual dispatch per point, each model is a set of pure
functions vectorized over (...,3) point / (...,2) pixel arrays, with the
model selected *statically* (a Python enum baked into the jitted program).

Parameter layout (single flat float32 vector, fixed length 8):

* ``PINHOLE``:  [fx, fy, cx, cy, k1, k2, p1, p2]   (radtan; k3 unused)
  The reference stores only fx..cy in the model and undistorts keypoints
  separately with cv::undistortPoints (`src/Frame.cc:874-924`); we fold
  the distortion into the model so undistortion is one fused device op.
* ``KB8``:      [fx, fy, cx, cy, k1, k2, k3, k4]   (equidistant polynomial,
  `src/CameraModels/KannalaBrandt8.cpp:28-131`)

Jacobians are hand-derived (matching `Pinhole::projectJac` and
`KannalaBrandt8::projectJac` semantics) rather than autodiff so they can
be reused inside Pallas kernels; tests check them against `jax.jacfwd`.
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp


class CameraModel(enum.IntEnum):
    PINHOLE = 0
    KB8 = 1


N_PARAMS = 8


def make_pinhole(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0) -> jnp.ndarray:
    return jnp.asarray([fx, fy, cx, cy, k1, k2, p1, p2], dtype=jnp.float32)


def make_kb8(fx, fy, cx, cy, k1, k2, k3, k4) -> jnp.ndarray:
    return jnp.asarray([fx, fy, cx, cy, k1, k2, k3, k4], dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Pinhole + radtan
# ---------------------------------------------------------------------------


def _pinhole_distort(params, xn, yn):
    k1, k2, p1, p2 = params[4], params[5], params[6], params[7]
    r2 = xn * xn + yn * yn
    radial = 1.0 + r2 * (k1 + r2 * k2)
    xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
    return xd, yd


def pinhole_project(params: jnp.ndarray, Xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (...,3) -> pixels (...,2). Ref `Pinhole.cpp:project`."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = Xc[..., 0] * inv_z
    yn = Xc[..., 1] * inv_z
    xd, yd = _pinhole_distort(params, xn, yn)
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def pinhole_unproject(params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels (...,2) -> unit-depth rays (...,3) (z = 1).

    Iterative radtan undistortion (8 fixed-point steps), replacing the
    reference's one-shot cv::undistortPoints call (`Frame.cc:874`).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy
        dx, dy = _pinhole_distort(params, x, y)
        return (x + (xd - dx), y + (yd - dy))

    x, y = jax.lax.fori_loop(0, 8, body, (xd, yd))
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def pinhole_project_jac(params: jnp.ndarray, Xc: jnp.ndarray) -> jnp.ndarray:
    """d(uv)/d(Xc): (...,2,3). Ref `Pinhole::projectJac` (`Pinhole.cpp:83-97`).

    Includes the radtan distortion terms (the reference works on
    pre-undistorted keypoints so its Jacobian omits them; for a zero
    distortion vector the two agree exactly).
    """
    fx, fy = params[0], params[1]
    k1, k2, p1, p2 = params[4], params[5], params[6], params[7]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = x * inv_z
    yn = y * inv_z
    r2 = xn * xn + yn * yn
    radial = 1.0 + r2 * (k1 + r2 * k2)
    dradial_dr2 = k1 + 2.0 * k2 * r2

    # d(xd)/d(xn), etc.
    dxd_dxn = radial + xn * dradial_dr2 * 2.0 * xn + 2.0 * p1 * yn + 6.0 * p2 * xn
    dxd_dyn = xn * dradial_dr2 * 2.0 * yn + 2.0 * p1 * xn + 2.0 * p2 * yn
    dyd_dxn = yn * dradial_dr2 * 2.0 * xn + 2.0 * p2 * yn + 2.0 * p1 * xn
    dyd_dyn = radial + yn * dradial_dr2 * 2.0 * yn + 6.0 * p1 * yn + 2.0 * p2 * xn

    # d(xn)/dX = [1/z, 0, -x/z^2] ; d(yn)/dX = [0, 1/z, -y/z^2]
    du_dx = fx * dxd_dxn * inv_z
    du_dy = fx * dxd_dyn * inv_z
    du_dz = -fx * (dxd_dxn * xn + dxd_dyn * yn) * inv_z
    dv_dx = fy * dyd_dxn * inv_z
    dv_dy = fy * dyd_dyn * inv_z
    dv_dz = -fy * (dyd_dxn * xn + dyd_dyn * yn) * inv_z
    row_u = jnp.stack([du_dx, du_dy, du_dz], axis=-1)
    row_v = jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


# ---------------------------------------------------------------------------
# Kannala-Brandt 8 (equidistant fisheye)
# ---------------------------------------------------------------------------


def kb8_project(params: jnp.ndarray, Xc: jnp.ndarray) -> jnp.ndarray:
    """Ref `KannalaBrandt8::project` (`KannalaBrandt8.cpp:28-55`):

    theta = atan2(r, z);  d(theta) = theta + k1 th^3 + k2 th^5 + k3 th^7 + k4 th^9
    uv = f * d(theta) * (x, y) / r + c
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2)
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    d = theta * (1.0 + th2 * (k1 + th2 * (k2 + th2 * (k3 + th2 * k4))))
    inv_r = jnp.where(r < 1e-8, 0.0, 1.0 / jnp.where(r < 1e-8, 1.0, r))
    # r -> 0 limit: d/r -> (point on axis) -> use pinhole-like x/z scaling.
    scale = jnp.where(r < 1e-8, 1.0 / jnp.maximum(z, 1e-8), d * inv_r)
    return jnp.stack([fx * x * scale + cx, fy * y * scale + cy], axis=-1)


def kb8_unproject(params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> unit-depth rays (z=1) via fixed 10-iteration Newton solve of
    the theta polynomial, mirroring `KannalaBrandt8::unprojectEig`
    (`KannalaBrandt8.cpp:103-131`, 10-iter Newton)."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    theta_d = jnp.sqrt(mx * mx + my * my)
    theta_d_c = jnp.minimum(jnp.maximum(theta_d, -jnp.pi / 2), jnp.pi / 2)

    def newton(_, theta):
        th2 = theta * theta
        th4 = th2 * th2
        th6 = th4 * th2
        th8 = th4 * th4
        k_th = theta * (1.0 + k1 * th2 + k2 * th4 + k3 * th6 + k4 * th8)
        d_k = 1.0 + 3 * k1 * th2 + 5 * k2 * th4 + 7 * k3 * th6 + 9 * k4 * th8
        step = (k_th - theta_d_c) / d_k
        return theta - step

    theta = jax.lax.fori_loop(0, 10, newton, theta_d_c)
    scale = jnp.where(theta_d < 1e-8, 1.0, jnp.tan(theta) / jnp.where(theta_d < 1e-8, 1.0, theta_d))
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def kb8_project_jac(params: jnp.ndarray, Xc: jnp.ndarray) -> jnp.ndarray:
    """d(uv)/d(Xc): (...,2,3). Ref `KannalaBrandt8::projectJac`
    (`KannalaBrandt8.cpp:132-180`)."""
    fx, fy = params[0], params[1]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    R2 = r2 + z * z
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    th4 = th2 * th2
    th6 = th4 * th2
    th8 = th4 * th4
    f_th = theta * (1.0 + k1 * th2 + k2 * th4 + k3 * th6 + k4 * th8)
    fd_th = 1.0 + 3 * k1 * th2 + 5 * k2 * th4 + 7 * k3 * th6 + 9 * k4 * th8

    # dtheta/dX
    dth_dx = x * z / (R2 * r)
    dth_dy = y * z / (R2 * r)
    dth_dz = -r / R2

    inv_r = 1.0 / r
    inv_r3 = inv_r * inv_r * inv_r
    # u = fx * f(theta) * x / r + cx
    du_dx = fx * (fd_th * dth_dx * x * inv_r + f_th * (inv_r - x * x * inv_r3))
    du_dy = fx * (fd_th * dth_dy * x * inv_r - f_th * x * y * inv_r3)
    du_dz = fx * fd_th * dth_dz * x * inv_r
    dv_dx = fy * (fd_th * dth_dx * y * inv_r - f_th * x * y * inv_r3)
    dv_dy = fy * (fd_th * dth_dy * y * inv_r + f_th * (inv_r - y * y * inv_r3))
    dv_dz = fy * fd_th * dth_dz * y * inv_r
    row_u = jnp.stack([du_dx, du_dy, du_dz], axis=-1)
    row_v = jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


# ---------------------------------------------------------------------------
# Static dispatch
# ---------------------------------------------------------------------------


def project(model: CameraModel, params: jnp.ndarray, Xc: jnp.ndarray) -> jnp.ndarray:
    if model == CameraModel.PINHOLE:
        return pinhole_project(params, Xc)
    return kb8_project(params, Xc)


def unproject(model: CameraModel, params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    if model == CameraModel.PINHOLE:
        return pinhole_unproject(params, uv)
    return kb8_unproject(params, uv)


def project_jac(model: CameraModel, params: jnp.ndarray, Xc: jnp.ndarray) -> jnp.ndarray:
    if model == CameraModel.PINHOLE:
        return pinhole_project_jac(params, Xc)
    return kb8_project_jac(params, Xc)


def project_with_depth(
    model: CameraModel, params: jnp.ndarray, Xc: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project and also return camera-frame depth (used by frustum checks)."""
    return project(model, params, Xc), Xc[..., 2]
