"""Instrument the IMU initializer: capture its inputs at init time, then
compare the optimizer's (scale, gravity) against ground-truth-derived
values and residuals."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax
jax.config.update("jax_platforms", "cpu")
from orbslam3_tpu.utils import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax.numpy as jnp

# Reuse the drive's scene by importing it with execution up to the System.
import importlib.util

from orbslam3_tpu.ops import cameras as cam, lie, imu as imu_ops
from orbslam3_tpu.ops import features as feat
from orbslam3_tpu.system import System, Sensor
from orbslam3_tpu.optim import inertial as vi
from orbslam3_tpu.pipeline import inertial_support as isup
from orbslam3_tpu.eval.ate import umeyama

# --- copy of the drive's setup (kept in sync manually) ---------------------
H, W = 240, 320
FOCAL = 260.0
rng = np.random.default_rng(11)
params = cam.make_pinhole(FOCAL, FOCAL, W / 2, H / 2)
n_pts = 130
pts = np.stack(
    [rng.uniform(-3.0, 3.0, n_pts), rng.uniform(-2.2, 2.2, n_pts), rng.uniform(3.0, 6.0, n_pts)],
    axis=-1,
).astype(np.float32)
shades = rng.uniform(120, 250, n_pts).astype(np.float32)

def render(Rcw, tcw):
    img = np.full((H, W), 35.0, np.float32)
    Xc = (Rcw @ pts.T).T + tcw
    uv = np.asarray(cam.pinhole_project(params, jnp.asarray(Xc)))
    for i in np.argsort(-Xc[:, 2]):
        if Xc[i, 2] < 0.5:
            continue
        u, v = uv[i]
        half = max(2, int(round(12.0 / Xc[i, 2] * 2)))
        ui, vi_ = int(round(u)), int(round(v))
        if 1 <= ui < W - 1 and 1 <= vi_ < H - 1:
            img[max(vi_ - half, 0) : vi_ + half, max(ui - half, 0) : ui + half] = shades[i]
    return img

def body_pose(t):
    p = np.array([0.9 * np.sin(1.6 * t), 0.3 * np.sin(2.6 * t), 0.4 * (1 - np.cos(1.9 * t))])
    w = np.array([0.0, 0.10 * np.sin(0.8 * t), 0.05 * np.sin(0.5 * t)])
    R = np.asarray(lie.exp_so3(jnp.asarray(w, jnp.float32)))
    return R.astype(np.float64), p

IMU_HZ, CAM_HZ, T_TOTAL = 200.0, 10.0, 3.0
g_world = np.array([0.0, 0.0, -imu_ops.GRAVITY_VALUE])
fine_dt = 1.0 / 2000.0
ts_fine = np.arange(0.0, T_TOTAL + 2 * fine_dt, fine_dt)
Rs, ps = [], []
for t in ts_fine:
    R, p = body_pose(t)
    Rs.append(R); ps.append(p)
Rs, ps = np.stack(Rs), np.stack(ps)
acc_w = (ps[2:] - 2 * ps[1:-1] + ps[:-2]) / fine_dt**2
gyro_b = np.stack([
    np.asarray(lie.log_so3(jnp.asarray((Rs[i].T @ Rs[i + 1]).astype(np.float32)))) / fine_dt
    for i in range(len(ts_fine) - 1)
])
stride = int(round(2000 / IMU_HZ))
imu_idx = np.arange(1, len(ts_fine) - 1, stride)
imu_ts = ts_fine[imu_idx]
imu_acc = np.stack([Rs[i].T @ (acc_w[i - 1] - g_world) for i in imu_idx])
imu_gyro = gyro_b[imu_idx]
calib = imu_ops.ImuCalib.create(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5, 3e-3, IMU_HZ)

orb = feat.OrbParams(n_features=400, n_levels=3)
slam = System(Sensor.IMU_MONOCULAR, cam.CameraModel.PINHOLE, params, (W, H),
              orb_params=orb, imu_calib=calib, Kmax=64, Pmax=8192)

# Capture initializer inputs.
captured = {}
orig = vi.inertial_only_optimization
def spy(Rp, pp, valid, edges, **kw):
    res = orig(Rp, pp, valid, edges, **kw)
    if "first" not in captured:
        captured["first"] = (np.asarray(Rp), np.asarray(pp), np.asarray(valid), edges, res)
    return res
vi.inertial_only_optimization = spy
isup.vi.inertial_only_optimization = spy

frame_ts = np.arange(0.0, T_TOTAL, 1.0 / CAM_HZ)
cursor = 0
for k, t in enumerate(frame_ts):
    R_wb, p_wb = body_pose(t)
    img = render(R_wb.T.astype(np.float32), (-R_wb.T @ p_wb).astype(np.float32))
    batch = []
    while cursor < len(imu_ts) and imu_ts[cursor] <= t:
        batch.append((imu_ts[cursor], imu_acc[cursor], imu_gyro[cursor]))
        cursor += 1
    slam.track_monocular(img, t, imu_measurements=batch)
    if "first" in captured:
        break

assert "first" in captured, "init never ran"
Rp, pp, valid, edges, res = captured["first"]
K = int(valid.sum())
print(f"init at {K} KFs, scale_est={float(res.scale):.3f}")

# Ground truth at KF timestamps.
kf_ts = slam.store.kf_ts[:K]
gt_p = np.stack([body_pose(t)[1] for t in kf_ts])
gt_R = np.stack([body_pose(t)[0] for t in kf_ts])
gt_v = np.stack([(body_pose(t + 1e-3)[1] - body_pose(t - 1e-3)[1]) / 2e-3 for t in kf_ts])

# True similarity mono->metric: gt_p ~ s * Rg @ p_mono + t0.
s_true, R_align, t0 = umeyama(pp[:K], gt_p, with_scale=True)
print(f"umeyama mono->GT scale: {s_true:.3f}")

# Evaluate edge residuals at optimizer result vs GT-informed parameters.
def total_chi2(v_all, bg, ba, gd2, log_s):
    x = np.concatenate([v_all.reshape(-1), bg, ba, gd2, [log_s]])
    # replicate the residual function
    Kp = Rp.shape[0]
    v = x[: 3 * Kp].reshape(Kp, 3)
    s = np.exp(x[-1])
    Rwg = np.asarray(lie.exp_so3(jnp.asarray([x[-3], x[-2], 0.0], jnp.float32)))
    g = Rwg @ np.array([0, 0, -imu_ops.GRAVITY_VALUE])
    c = 0.0
    E = int(np.asarray(edges.valid).sum())
    for k in range(E):
        i, j = int(edges.i[k]), int(edges.j[k])
        r = vi.imu_residual(
            jnp.asarray(Rp[i]), jnp.asarray(s * pp[i]), jnp.asarray(v[i]),
            jnp.asarray(bg), jnp.asarray(ba),
            jnp.asarray(Rp[j]), jnp.asarray(s * pp[j]), jnp.asarray(v[j]),
            edges.dR[k], edges.dV[k], edges.dP[k], edges.JRg[k], edges.JVg[k],
            edges.JVa[k], edges.JPg[k], edges.JPa[k], edges.bg0[k], edges.ba0[k],
            edges.dT[k], jnp.asarray(g, jnp.float32))
        c += float(r @ np.asarray(edges.info[k]) @ np.asarray(r))
    return c

# Optimizer solution chi2:
v_opt = np.asarray(res.vel)
gd_opt = np.asarray(lie.log_so3(jnp.asarray(np.asarray(res.Rwg))))[:2]
chi_opt = total_chi2(v_opt, np.asarray(res.bg), np.asarray(res.ba), gd_opt, np.log(float(res.scale)))
print(f"chi2 at optimizer solution: {chi_opt:.1f}")

# GT-informed: v = R_align^T gt_v (metric, rotated into mono world), s=s_true,
# gravity dir: g_mono such that R_align maps mono->GT: g_gt = R_align g_mono
# => g_mono = R_align^T [0,0,-G]
g_mono_dir = R_align.T @ np.array([0, 0, -1.0])
# find gd (2-param) with exp([gd,0]) [0,0,-1] = g_mono_dir: solve via log
axis = np.cross([0, 0, -1.0], g_mono_dir)
sin_a = np.linalg.norm(axis)
cos_a = np.dot([0, 0, -1.0], g_mono_dir)
ang = np.arctan2(sin_a, cos_a)
w_axis = axis / max(sin_a, 1e-12) * ang
v_gt_mono = (R_align.T @ gt_v.T).T
v_pad = np.zeros_like(v_opt)
v_pad[:K] = v_gt_mono
chi_gt = total_chi2(v_pad, np.zeros(3), np.zeros(3), w_axis[:2], np.log(s_true))
print(f"chi2 at GT-informed params: {chi_gt:.1f} (axis z comp {w_axis[2]:.4f})")

# --- edge forensics: compare each edge against GT-derived quantities -----
print("\nedge forensics (dT vs kf gap; dP vs GT):")
prev = np.asarray(slam.store.state.kf_prev)[:K]
for k in range(min(int(np.asarray(edges.valid).sum()), 6)):
    i, j = int(edges.i[k]), int(edges.j[k])
    dT = float(edges.dT[k])
    gap = kf_ts[j] - kf_ts[i]
    # GT dP in body frame of i: R_i^T (p_j - p_i - v_i dt - 0.5 g dt^2)
    Ri, pi = body_pose(kf_ts[i])
    Rj, pj = body_pose(kf_ts[j])
    vi_ = (body_pose(kf_ts[i] + 1e-3)[1] - body_pose(kf_ts[i] - 1e-3)[1]) / 2e-3
    dP_gt = Ri.T @ (pj - pi - vi_ * gap - 0.5 * g_world * gap * gap)
    dR_gt = Ri.T @ Rj
    rot_err = np.linalg.norm(np.asarray(lie.log_so3(jnp.asarray((dR_gt.T @ np.asarray(edges.dR[k])).astype(np.float32)))))
    print(f"edge {i}->{j}: dT={dT:.4f} gap={gap:.4f} |dP|={np.linalg.norm(np.asarray(edges.dP[k])):.4f} |dP_gt|={np.linalg.norm(dP_gt):.4f} rot_err={rot_err:.4f}")

# --- isolate: GT poses (scaled down by s_true) + real edges --------------
Rp_gt = np.tile(np.eye(3, dtype=np.float32), (Rp.shape[0], 1, 1))
pp_gt = np.zeros_like(pp)
Rp_gt[:K] = gt_R.astype(np.float32)
pp_gt[:K] = (gt_p / s_true).astype(np.float32)
res2 = orig(jnp.asarray(Rp_gt), jnp.asarray(pp_gt), jnp.asarray(valid), edges, iters=30)
print(f"\nGT-pose isolation: scale_est={float(res2.scale):.3f} (want {s_true:.3f}), "
      f"cost={float(res2.cost):.1f}")
g_est = np.asarray(res2.Rwg) @ np.array([0, 0, -1.0])
print(f"gravity est (want [0,0,-1] in GT frame): {g_est}")

# unweighted residuals at GT params on GT poses
r_norms = []
E = int(np.asarray(edges.valid).sum())
for k in range(E):
    i, j = int(edges.i[k]), int(edges.j[k])
    vi_g = (body_pose(kf_ts[i] + 1e-3)[1] - body_pose(kf_ts[i] - 1e-3)[1]) / 2e-3
    vj_g = (body_pose(kf_ts[j] + 1e-3)[1] - body_pose(kf_ts[j] - 1e-3)[1]) / 2e-3
    r = vi.imu_residual(
        jnp.asarray(gt_R[i].astype(np.float32)), jnp.asarray(gt_p[i].astype(np.float32)),
        jnp.asarray(vi_g.astype(np.float32)), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(gt_R[j].astype(np.float32)), jnp.asarray(gt_p[j].astype(np.float32)),
        jnp.asarray(vj_g.astype(np.float32)),
        edges.dR[k], edges.dV[k], edges.dP[k], edges.JRg[k], edges.JVg[k],
        edges.JVa[k], edges.JPg[k], edges.JPa[k], edges.bg0[k], edges.ba0[k],
        edges.dT[k], jnp.asarray(g_world, jnp.float32))
    r_norms.append(float(jnp.linalg.norm(r)))
print("unweighted |r| at pure GT:", np.round(r_norms[:8], 5))

# --- mono-map quality at init time ---------------------------------------
aligned = (s_true * (R_align @ pp[:K].T)).T + t0
mono_err = np.linalg.norm(aligned - gt_p, axis=1)
print(f"\nmono map sim3-ATE at init: rmse={np.sqrt((mono_err**2).mean()):.4f} m "
      f"max={mono_err.max():.4f} over span {np.ptp(gt_p, 0)}")
# relative-pose errors between consecutive KFs (what the IMU edges see)
rel_errs = []
for k in range(K - 1):
    d_mono = s_true * np.linalg.norm(pp[k + 1] - pp[k])
    d_gt = np.linalg.norm(gt_p[k + 1] - gt_p[k])
    rel_errs.append(d_mono - d_gt)
print("per-edge baseline errors (m):", np.round(rel_errs[:10], 4))
