"""Stereo rectification: raw (unrectified) pinhole stereo ingestion.

The reference parses `LEFT./RIGHT. K/D/R/P` rectification blocks from the
settings YAML and builds remap grids with `cv::initUndistortRectifyMap`
(`/root/reference/src/Tracking.cc:299-323`); its ROS stereo node applies
`cv::remap` per frame before `TrackStereo`
(`Examples/ROS/ORB_SLAM3/src/ros_stereo_inertial.cc:214+`). Here the grid
is built once on host (pure numpy, same math) and the per-frame remap is
ONE jitted bilinear-gather program on device — it runs before extraction
in the stereo hot path, so raw EuRoC-style stereo YAMLs replay directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_rectify_map(K, D, R, P, wh):
    """Remap grid with `cv::initUndistortRectifyMap` semantics.

    For each RECTIFIED pixel (u, v): back-project through the rectified
    projection P (3x3 or 3x4: only the left 3x3 intrinsic block is used,
    per `P_l.rowRange(0,3).colRange(0,3)` in the reference), rotate into
    the ORIGINAL camera with R^-1, apply the radial-tangential distortion
    D = (k1, k2, p1, p2[, k3]), project through the original K. Returns
    (map_x, map_y) float32 (H, W): the SOURCE pixel for each output pixel.
    """
    K = np.asarray(K, np.float64)
    R = np.asarray(R, np.float64)
    P = np.asarray(P, np.float64)
    D = np.asarray(D, np.float64).reshape(-1)
    W, H = int(wh[0]), int(wh[1])
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    x = (u - P[0, 2]) / P[0, 0]
    y = (v - P[1, 2]) / P[1, 1]
    # Ray in the original camera frame: X = R^-1 [x, y, 1].
    X = np.stack([x, y, np.ones_like(x)], axis=-1) @ R  # rows = R^T @ ray
    xp = X[..., 0] / X[..., 2]
    yp = X[..., 1] / X[..., 2]
    k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
    k3 = D[4] if D.shape[0] > 4 else 0.0
    r2 = xp * xp + yp * yp
    rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = xp * rad + 2.0 * p1 * xp * yp + p2 * (r2 + 2.0 * xp * xp)
    yd = yp * rad + p1 * (r2 + 2.0 * yp * yp) + 2.0 * p2 * xp * yp
    map_x = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    map_y = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return map_x, map_y


@jax.jit
def remap_bilinear(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray):
    """`cv::remap(..., INTER_LINEAR, BORDER_CONSTANT 0)` as one gather
    program: out[v, u] = bilinear(img, map_y[v, u], map_x[v, u])."""
    img = img.astype(jnp.float32)
    H, W = img.shape
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    wx = map_x - x0
    wy = map_y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    out = (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy
    valid = (map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1)
    return jnp.where(valid, out, 0.0)


class StereoRectifier:
    """Holds the per-side grids; __call__ remaps a raw L/R pair on device."""

    def __init__(self, rect_left, rect_right):
        """Each side: an object with K (3,3), D (4-5,), R (3,3),
        P (3,3 or 3,4), width, height attributes — `config.RectifyConfig`,
        i.e. the reference's LEFT./RIGHT. YAML block."""
        self.maps = []
        for side in (rect_left, rect_right):
            mx, my = build_rectify_map(
                side.K, side.D, side.R, side.P, (side.width, side.height),
            )
            self.maps.append((jnp.asarray(mx), jnp.asarray(my)))

    def __call__(self, img_left, img_right):
        mxl, myl = self.maps[0]
        mxr, myr = self.maps[1]
        return (
            remap_bilinear(jnp.asarray(img_left), mxl, myl),
            remap_bilinear(jnp.asarray(img_right), mxr, myr),
        )
