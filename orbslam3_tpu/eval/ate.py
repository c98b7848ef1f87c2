"""Trajectory evaluation: Umeyama/Sim3 alignment + ATE RMSE.

The reference repo references external evaluation scripts that are *not
included* (`/root/reference/README.md:113-118,150-153`); SURVEY.md §4
requires an in-repo evaluator. Pure NumPy (host-side tooling).
"""

from __future__ import annotations

import numpy as np


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning src -> dst.

    Returns (s, R, t) with dst ~= s * R @ src + t. Standard Umeyama 1991.
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / var_s
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-timestamp association between two trajectories."""
    ia, ib = [], []
    j = 0
    for i, t in enumerate(ts_a):
        j = np.searchsorted(ts_b, t)
        cands = [c for c in (j - 1, j) if 0 <= c < len(ts_b)]
        if not cands:
            continue
        best = min(cands, key=lambda c: abs(ts_b[c] - t))
        if abs(ts_b[best] - t) <= max_dt:
            ia.append(i)
            ib.append(best)
    return np.asarray(ia), np.asarray(ib)


def ate_rmse(
    est_ts: np.ndarray,
    est_pos: np.ndarray,
    gt_ts: np.ndarray,
    gt_pos: np.ndarray,
    with_scale: bool = True,
    max_dt: float = 0.02,
) -> float:
    """Absolute trajectory error RMSE after Sim3 (mono) or SE3 alignment.

    `with_scale=True` for monocular (scale unobservable), False for
    stereo/inertial.
    """
    ia, ib = associate(est_ts, gt_ts, max_dt)
    if len(ia) < 3:
        return float("inf")
    est = est_pos[ia]
    gt = gt_pos[ib]
    # Entries logged during tracking loss / dead-reckoning can be
    # non-finite; one such row makes the Umeyama SVD diverge (observed:
    # LinAlgError ending a 700-frame replay at the eval step). Score the
    # finite subset — the reference's evaluation likewise only scores
    # frames with a localized pose (`mlbLost` skip, `System.cc:657`).
    finite = np.isfinite(est).all(axis=1) & np.isfinite(gt).all(axis=1)
    if finite.sum() < 3:
        return float("inf")
    est = est[finite]
    gt = gt[finite]
    s, R, t = umeyama(est, gt, with_scale)
    aligned = (s * (R @ est.T)).T + t
    err = np.linalg.norm(aligned - gt, axis=1)
    return float(np.sqrt((err**2).mean()))


def ate_scale(
    est_ts: np.ndarray,
    est_pos: np.ndarray,
    gt_ts: np.ndarray,
    gt_pos: np.ndarray,
    max_dt: float = 0.02,
) -> float:
    """Sim3-fit scale of the estimate vs ground truth. For metric sensors
    (stereo / RGB-D / inertial) this should be ~1.00; deviation is the
    map's metric-scale error (the reference evaluates stereo with SE3
    alignment precisely because scale is observable — `Frame.cc:955-1135`
    metric stereo semantics)."""
    ia, ib = associate(est_ts, gt_ts, max_dt)
    if len(ia) < 3:
        return float("nan")
    s, _R, _t = umeyama(est_pos[ia], gt_pos[ib], with_scale=True)
    return float(s)
