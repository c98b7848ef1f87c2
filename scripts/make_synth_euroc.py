"""Generate a synthetic EuRoC-format (mav0-layout) sequence at real scale.

The sandbox has no dataset downloads, so the EuRoC-scale validation runs on
a rendered sequence with the exact on-disk layout the reference's loaders
expect (`/root/reference/Examples/Monocular-Inertial/mono_inertial_euroc.cc:
228-287`): `mav0/cam0/data.csv` + `data/<ns>.png`, `mav0/imu0/data.csv`,
`mav0/state_groundtruth_estimate0/data.csv`, plus a reference-format
settings YAML. Defaults match EuRoC: 752x480 @ 20 Hz camera, 200 Hz IMU,
>=1500 frames, and a trajectory that closes a loop (full circle inside a
textured room, then ~1/3 of a second lap for loop closure in anger).

The world is a closed textured box; every frame is ray-cast against the six
faces with bilinear texture sampling, so appearance is perspective-correct
and photometrically consistent across revisits — what place recognition
needs. IMU samples are derived from the analytic trajectory by central
differences and corrupted with EuRoC-grade noise + constant biases.

Usage:
  python scripts/make_synth_euroc.py OUT_DIR [--frames 1600] [--seed 0]
Writes OUT_DIR/mav0/... and OUT_DIR/settings.yaml.
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H = 752, 480
FX = FY = 458.0
CX, CY = 376.0, 240.0
CAM_HZ = 20.0
IMU_HZ = 200.0
G = 9.81

# Room geometry (meters): box [-6,6]x[-6,6] in x,y; z in [0,4].
BOX_LO = np.array([-6.0, -6.0, 0.0])
BOX_HI = np.array([6.0, 6.0, 4.0])
TEX_N = 2048  # texels per face


def make_textures(rng, density: float = 1.0):
    """Six face textures: mid-gray base + random high-contrast blocks at
    several scales (localizable corners for FAST at all pyramid levels).

    `density` scales the block counts: < 1 gives a low-texture room
    where the frontend sees fewer/weaker corners, visual odometry
    accumulates REAL drift over a lap, and the essential-graph
    correction at loop closure has something to remove (the round-4
    verdict's Weak #5: the rich-texture room never drifts enough to
    exercise the graph)."""
    tex = []
    for _ in range(6):
        t = np.full((TEX_N, TEX_N), 128.0, np.float32)
        # low-frequency illumination variation
        g = rng.uniform(-25, 25, (8, 8)).astype(np.float32)
        gi = np.clip((np.arange(TEX_N) * 8 // TEX_N), 0, 7)
        t += g[np.ix_(gi, gi)]
        for size, count in ((160, 60), (80, 240), (40, 700), (18, 1600)):
            count = max(1, int(round(count * density)))
            ys = rng.integers(0, TEX_N - size, count)
            xs = rng.integers(0, TEX_N - size, count)
            vals = rng.uniform(30, 235, count).astype(np.float32)
            for y, x, v in zip(ys, xs, vals):
                t[y : y + size, x : x + size] = v
        tex.append(np.clip(t, 0, 255))
    return np.stack(tex)  # (6, TEX_N, TEX_N)


# Face parametrization: (axis, sign). axis = fixed coordinate.
FACES = [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1)]


def kb8_dir_grid(wh, intr):
    """Per-pixel unit-depth ray directions for a Kannala-Brandt8 fisheye
    (equidistant polynomial, `KannalaBrandt8.cpp:103-131` semantics):
    solve d(theta)=r by Newton per pixel, once per camera (intrinsics are
    constant so the grid is precomputed and reused across frames)."""
    W_, H_ = wh
    fx, fy, cx, cy, k1, k2, k3, k4 = intr
    u, v = np.meshgrid(np.arange(W_, dtype=np.float64), np.arange(H_, dtype=np.float64))
    mx = (u - cx) / fx
    my = (v - cy) / fy
    r = np.sqrt(mx * mx + my * my)
    th = np.minimum(r, np.pi * 0.55)
    for _ in range(10):
        t2 = th * th
        d = th * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        dd = 1 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + 9 * k4 * t2)))
        th = th - (d - r) / dd
    s = np.where(r > 1e-9, np.sin(th) / np.maximum(r, 1e-9), 1.0)
    return np.stack([mx * s, my * s, np.cos(th)], axis=-1).astype(np.float32)


def render(tex, R_wc, p_wc, wh=(W, H), intr=(FX, FY, CX, CY), dirs=None):
    """Ray-cast the box: grayscale (H, W) float32 image. `wh`/`intr` let
    smaller drives (drive_loop.py) reuse the renderer at low resolution;
    `dirs` (H, W, 3) overrides the pinhole ray grid (fisheye mode)."""
    W_, H_ = wh
    if dirs is None:
        fx, fy, cx, cy = intr
        u, v = np.meshgrid(
            np.arange(W_, dtype=np.float32), np.arange(H_, dtype=np.float32)
        )
        d_cam = np.stack(
            [(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1
        )
    else:
        d_cam = dirs
    H_, W_ = d_cam.shape[0], d_cam.shape[1]
    d_w = d_cam @ R_wc.T  # (H, W, 3)
    o = p_wc.astype(np.float32)

    best_t = np.full((H_, W_), np.inf, np.float32)
    best_face = np.full((H_, W_), -1, np.int8)
    for f, (ax, hi) in enumerate(FACES):
        bound = (BOX_HI if hi else BOX_LO)[ax]
        denom = d_w[..., ax]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (bound - o[ax]) / denom
        ok = (t > 1e-3) & np.isfinite(t) & (t < best_t)
        best_t = np.where(ok, t, best_t)
        best_face = np.where(ok, np.int8(f), best_face)

    img = np.zeros((H_, W_), np.float32)
    hit_pts = o[None, None] + best_t[..., None] * d_w
    for f, (ax, hi) in enumerate(FACES):
        m = best_face == f
        if not m.any():
            continue
        axes = [a for a in range(3) if a != ax]
        pu = hit_pts[..., axes[0]][m]
        pv = hit_pts[..., axes[1]][m]
        su = (pu - BOX_LO[axes[0]]) / (BOX_HI[axes[0]] - BOX_LO[axes[0]])
        sv = (pv - BOX_LO[axes[1]]) / (BOX_HI[axes[1]] - BOX_LO[axes[1]])
        x = np.clip(su * (TEX_N - 1), 0, TEX_N - 1.001)
        y = np.clip(sv * (TEX_N - 1), 0, TEX_N - 1.001)
        x0, y0 = x.astype(np.int32), y.astype(np.int32)
        fx_, fy_ = x - x0, y - y0
        T = tex[f]
        val = (
            T[y0, x0] * (1 - fx_) * (1 - fy_)
            + T[y0, x0 + 1] * fx_ * (1 - fy_)
            + T[y0 + 1, x0] * (1 - fx_) * fy_
            + T[y0 + 1, x0 + 1] * fx_ * fy_
        )
        img[m] = val
    return img


# Trajectory parameters (rescaled by --fisheye for the smaller room).
T_LOOP = 60.0
TRAJ_R = 2.5
TRAJ_Z = 1.5


def pose_at(t):
    """Analytic trajectory: circle of radius ~TRAJ_R about the room center
    at ~TRAJ_Z height, heading tangent, with bobbing + radial pumping +
    small attitude wobble for IMU excitation. Returns (R_wc, p_w).
    Camera convention: z forward, x right, y down; Tbc = identity."""
    th = 2 * np.pi * t / T_LOOP
    r = TRAJ_R + 0.15 * np.sin(2 * np.pi * t / 4.1)
    z = TRAJ_Z + 0.12 * np.sin(2 * np.pi * t / 2.5)
    p = np.array([r * np.cos(th), r * np.sin(th), z])
    d = np.array([-np.sin(th), np.cos(th), 0.0])  # tangent, ccw
    # attitude wobble: yaw/pitch offsets (rad)
    yaw = 0.03 * np.sin(2 * np.pi * t / 3.3)
    pitch = 0.03 * np.sin(2 * np.pi * t / 2.1)
    cz, sz = np.cos(yaw), np.sin(yaw)
    d = np.array([d[0] * cz - d[1] * sz, d[0] * sz + d[1] * cz, 0.0])
    z_cam = np.array([d[0] * np.cos(pitch), d[1] * np.cos(pitch), np.sin(pitch)])
    z_cam /= np.linalg.norm(z_cam)
    y_cam = np.array([0.0, 0.0, -1.0])
    x_cam = np.cross(y_cam, z_cam)
    x_cam /= np.linalg.norm(x_cam)
    y_cam = np.cross(z_cam, x_cam)
    R_wc = np.stack([x_cam, y_cam, z_cam], axis=1)
    return R_wc, p


def so3_log(R):
    c = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(c)
    if th < 1e-8:
        return np.zeros(3)
    return th / (2 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )


def imu_sample(t, h=1e-4):
    """Ideal body-frame gyro/accel by central differences (body=camera)."""
    R0, p0 = pose_at(t)
    Rm, pm = pose_at(t - h)
    Rp, pp = pose_at(t + h)
    gyro = so3_log(R0.T @ Rp) / h * 0.5 + so3_log(Rm.T @ R0) / h * 0.5
    a_w = (pp - 2 * p0 + pm) / h**2
    g_w = np.array([0.0, 0.0, -G])
    acc = R0.T @ (a_w - g_w)
    return gyro, acc


def rot_to_quat_wxyz(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # not hit on this trajectory
        x = y = z = 0.0
    return w, x, y, z


SETTINGS_YAML = f"""%YAML:1.0
# Synthetic EuRoC-format sequence (generated by make_synth_euroc.py)
Camera.type: "PinHole"
Camera.fx: {FX}
Camera.fy: {FY}
Camera.cx: {CX}
Camera.cy: {CY}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: {W}
Camera.height: {H}
Camera.fps: {CAM_HZ}
Camera.RGB: 1
Tbc: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [1.0, 0.0, 0.0, 0.0,
          0.0, 1.0, 0.0, 0.0,
          0.0, 0.0, 1.0, 0.0,
          0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""

BASELINE_M = 0.11  # EuRoC-like stereo baseline (metres), --stereo only

# --raw-stereo: render the pair UNRECTIFIED — EuRoC-grade radial-tangential
# distortion plus a 2-degree common pitch between the raw rig and the
# rectified frame (a rotation about the baseline axis keeps the raw pair
# row-alignable, as a real rectifying calibration would).
RAW_DIST = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)
RAW_PITCH_DEG = 2.0


def radtan_dir_grid(wh, intr, dist):
    """Per-pixel unit-depth ray directions of a radtan-distorted pinhole:
    fixed-point undistortion per pixel (the standard cv::undistortPoints
    iteration), precomputed once per camera."""
    W_, H_ = wh
    fx, fy, cx, cy = intr
    k1, k2, p1, p2 = dist
    u, v = np.meshgrid(np.arange(W_, dtype=np.float64),
                       np.arange(H_, dtype=np.float64))
    xd = (u - cx) / fx
    yd = (v - cy) / fy
    x, y = xd.copy(), yd.copy()
    for _ in range(8):
        r2 = x * x + y * y
        rad = 1.0 + r2 * (k1 + r2 * k2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / rad
        y = (yd - dy) / rad
    return np.stack([x, y, np.ones_like(x)], axis=-1).astype(np.float32)


def raw_stereo_yaml():
    """Settings for the unrectified pair: rectified Camera.* intrinsics +
    the reference's LEFT./RIGHT. K/D/R/P rectification blocks
    (`/root/reference/src/Tracking.cc:299-323`)."""
    c, s = np.cos(np.radians(RAW_PITCH_DEG)), np.sin(np.radians(RAW_PITCH_DEG))
    R = [1.0, 0.0, 0.0, 0.0, c, -s, 0.0, s, c]
    K = [FX, 0.0, CX, 0.0, FY, CY, 0.0, 0.0, 1.0]
    D = list(RAW_DIST)

    def mat(name, rows, cols, data):
        vals = ", ".join(f"{x:.10g}" for x in data)
        return (f"{name}: !!opencv-matrix\n   rows: {rows}\n   cols: {cols}\n"
                f"   dt: d\n   data: [{vals}]\n")

    out = SETTINGS_YAML + f"Camera.bf: {FX * BASELINE_M}\nThDepth: 35.0\n"
    for side, pr3 in (("LEFT", 0.0), ("RIGHT", -FX * BASELINE_M)):
        out += f"{side}.height: {H}\n{side}.width: {W}\n"
        out += mat(f"{side}.K", 3, 3, K)
        out += mat(f"{side}.D", 1, 4, D)
        out += mat(f"{side}.R", 3, 3, R)
        out += mat(f"{side}.P", 3, 4,
                   [FX, 0.0, CX, pr3, 0.0, FY, CY, 0.0, 0.0, 0.0, 1.0, 0.0])
    return out

# --fisheye: TUM-VI-style stereo KB8 rig (512x512 @ 20 Hz, ~0.15 m base).
FE_W = FE_H = 512
FE_INTR_L = (190.97, 190.97, 254.93, 256.90,
             0.0034823894, 0.00071503485, -0.0020532361, 0.00020293674)
FE_INTR_R = (190.44, 190.44, 252.20, 254.00,
             0.0034003171, 0.0017662782, -0.0026631257, 0.00032995174)
FE_BASELINE_M = 0.15

FE_SETTINGS_YAML = f"""%YAML:1.0
# Synthetic TUM-VI-format stereo-fisheye sequence (make_synth_euroc.py --fisheye)
Camera.type: "KannalaBrandt8"
Camera.fx: {FE_INTR_L[0]}
Camera.fy: {FE_INTR_L[1]}
Camera.cx: {FE_INTR_L[2]}
Camera.cy: {FE_INTR_L[3]}
Camera.k1: {FE_INTR_L[4]}
Camera.k2: {FE_INTR_L[5]}
Camera.k3: {FE_INTR_L[6]}
Camera.k4: {FE_INTR_L[7]}
Camera.width: {FE_W}
Camera.height: {FE_H}
Camera.fps: {CAM_HZ}
Camera.RGB: 1
Camera.lappingBegin: 0
Camera.lappingEnd: {FE_W - 1}
Camera2.fx: {FE_INTR_R[0]}
Camera2.fy: {FE_INTR_R[1]}
Camera2.cx: {FE_INTR_R[2]}
Camera2.cy: {FE_INTR_R[3]}
Camera2.k1: {FE_INTR_R[4]}
Camera2.k2: {FE_INTR_R[5]}
Camera2.k3: {FE_INTR_R[6]}
Camera2.k4: {FE_INTR_R[7]}
Camera2.lappingBegin: 0
Camera2.lappingEnd: {FE_W - 1}
Tlr: !!opencv-matrix
   rows: 3
   cols: 4
   dt: f
   data: [1.0, 0.0, 0.0, {FE_BASELINE_M},
          0.0, 1.0, 0.0, 0.0,
          0.0, 0.0, 1.0, 0.0]
Tbc: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [1.0, 0.0, 0.0, 0.0,
          0.0, 1.0, 0.0, 0.0,
          0.0, 0.0, 1.0, 0.0,
          0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-4
IMU.NoiseAcc: 2.0e-3
IMU.GyroWalk: 1.9e-5
IMU.AccWalk: 3.0e-3
IMU.Frequency: 200
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=1600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--start-ns", type=int, default=1403636579763555584)
    ap.add_argument("--stereo", action="store_true",
                    help="also render a rectified right camera (mav0/cam1)"
                         f" at a {BASELINE_M} m baseline; settings gain"
                         " Camera.bf")
    ap.add_argument("--fisheye", action="store_true",
                    help="TUM-VI-style stereo KB8 rig: 512x512 fisheye pair"
                         f" (mav0/cam0+cam1, {FE_BASELINE_M} m baseline),"
                         " smaller room, KannalaBrandt8+Camera2+Tlr settings"
                         " (BASELINE config 4)")
    ap.add_argument("--raw-stereo", action="store_true",
                    help="with --stereo: render the pair UNRECTIFIED (radtan"
                         " distortion + 2-degree pitch); settings carry the"
                         " reference's LEFT./RIGHT. K/D/R/P rectification"
                         " blocks (Tracking.cc:299-323) so the replay must"
                         " remap on device before extraction")
    ap.add_argument("--texture-density", type=float, default=1.0,
                    help="scale texture block counts (<1 = low-texture room"
                         " -> real odometry drift before the lap revisit;"
                         " exercises the essential-graph correction)")
    ap.add_argument("--traj-radius", type=float, default=None,
                    help="override the circular-lap radius (bigger = longer"
                         " path per lap = more accumulated drift)")
    ap.add_argument("--loop-seconds", type=float, default=None,
                    help="override the lap period (default 60 s, 40 s"
                         " fisheye): frames > loop-seconds*20 revisit the"
                         " start and exercise loop closure")
    args = ap.parse_args()
    if args.raw_stereo:
        args.stereo = True

    import cv2

    global BOX_LO, BOX_HI, TRAJ_R, TRAJ_Z, T_LOOP
    dirs_l = dirs_r = None
    if args.fisheye:
        # TUM-VI room scale: smaller box, tighter circle, faster lap for
        # IMU excitation; wide-FOV rays keep the walls in view throughout.
        BOX_LO = np.array([-3.5, -3.5, 0.0])
        BOX_HI = np.array([3.5, 3.5, 3.0])
        TRAJ_R, TRAJ_Z, T_LOOP = 1.4, 1.3, 40.0
        dirs_l = kb8_dir_grid((FE_W, FE_H), FE_INTR_L)
        dirs_r = kb8_dir_grid((FE_W, FE_H), FE_INTR_R)
    if args.loop_seconds is not None:
        T_LOOP = args.loop_seconds
    if args.traj_radius is not None:
        TRAJ_R = args.traj_radius

    R_raw = np.eye(3)
    if args.raw_stereo:
        # Raw rig = rectified camera rotated by R^T (cv initUndistortRectify
        # semantics: ray_raw = R^-1 ray_rect => R_wc_raw = R_wc_rect @ R).
        c, s = np.cos(np.radians(RAW_PITCH_DEG)), np.sin(np.radians(RAW_PITCH_DEG))
        R_raw = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        dirs_l = dirs_r = radtan_dir_grid((W, H), (FX, FY, CX, CY), RAW_DIST)

    rng = np.random.default_rng(args.seed)
    tex = make_textures(rng, density=args.texture_density)

    cam_dir = os.path.join(args.out_dir, "mav0", "cam0", "data")
    imu_dir = os.path.join(args.out_dir, "mav0", "imu0")
    gt_dir = os.path.join(args.out_dir, "mav0", "state_groundtruth_estimate0")
    os.makedirs(cam_dir, exist_ok=True)
    os.makedirs(imu_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    stereo_pair = args.stereo or args.fisheye
    cam1_dir = os.path.join(args.out_dir, "mav0", "cam1", "data")
    if stereo_pair:
        os.makedirs(cam1_dir, exist_ok=True)

    if args.fisheye:
        yaml_text = FE_SETTINGS_YAML
    elif args.raw_stereo:
        yaml_text = raw_stereo_yaml()
    else:
        yaml_text = SETTINGS_YAML
        if args.stereo:
            yaml_text += f"Camera.bf: {FX * BASELINE_M}\nThDepth: 35.0\n"
    with open(os.path.join(args.out_dir, "settings.yaml"), "w") as f:
        f.write(yaml_text)

    n = args.frames
    dt_cam = 1.0 / CAM_HZ
    # --- camera frames + cam0/data.csv + ground truth -------------------
    fc1 = (
        open(os.path.join(args.out_dir, "mav0", "cam1", "data.csv"), "w")
        if stereo_pair else None
    )
    base = FE_BASELINE_M if args.fisheye else BASELINE_M
    with open(os.path.join(args.out_dir, "mav0", "cam0", "data.csv"), "w") as fc, open(
        os.path.join(gt_dir, "data.csv"), "w"
    ) as fg:
        fc.write("#timestamp [ns],filename\n")
        if fc1 is not None:
            fc1.write("#timestamp [ns],filename\n")
        fg.write("#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z\n")
        for k in range(n):
            t = k * dt_cam
            ns = args.start_ns + int(round(t * 1e9))
            R_wc, p = pose_at(t)
            R_render = R_wc @ R_raw if args.raw_stereo else R_wc
            img = render(tex, R_render, p, dirs=dirs_l)
            # mild sensor noise + quantize
            img = np.clip(img + rng.normal(0, 1.5, img.shape), 0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(cam_dir, f"{ns}.png"), img)
            fc.write(f"{ns},{ns}.png\n")
            if fc1 is not None:
                # Right eye: camera centre displaced along the camera
                # x-axis by the baseline, same orientation (Tlr = [I|b]).
                p_r = p + R_wc @ np.array([base, 0.0, 0.0])
                img_r = render(tex, R_render if args.raw_stereo else R_wc,
                               p_r, dirs=dirs_r)
                img_r = np.clip(
                    img_r + rng.normal(0, 1.5, img_r.shape), 0, 255
                ).astype(np.uint8)
                cv2.imwrite(os.path.join(cam1_dir, f"{ns}.png"), img_r)
                fc1.write(f"{ns},{ns}.png\n")
            qw, qx, qy, qz = rot_to_quat_wxyz(R_wc)
            fg.write(
                f"{ns},{p[0]:.6f},{p[1]:.6f},{p[2]:.6f},"
                f"{qw:.7f},{qx:.7f},{qy:.7f},{qz:.7f}\n"
            )
            if k % 200 == 0:
                print(f"rendered {k}/{n}", flush=True)

    # --- IMU @ 200 Hz ---------------------------------------------------
    bias_g = np.array([0.002, -0.0015, 0.001])
    bias_a = np.array([0.02, 0.015, -0.01])
    sg = 1.7e-4 * np.sqrt(IMU_HZ)  # discrete-time sigma from density
    sa = 2.0e-3 * np.sqrt(IMU_HZ)
    n_imu = int(round((n - 1) * dt_cam * IMU_HZ)) + 1
    with open(os.path.join(imu_dir, "data.csv"), "w") as fi:
        fi.write(
            "#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],"
            "w_RS_S_z [rad s^-1],a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],"
            "a_RS_S_z [m s^-2]\n"
        )
        for j in range(n_imu):
            t = j / IMU_HZ
            ns = args.start_ns + int(round(t * 1e9))
            gyro, acc = imu_sample(t)
            gyro = gyro + bias_g + rng.normal(0, sg, 3)
            acc = acc + bias_a + rng.normal(0, sa, 3)
            fi.write(
                f"{ns},{gyro[0]:.8f},{gyro[1]:.8f},{gyro[2]:.8f},"
                f"{acc[0]:.6f},{acc[1]:.6f},{acc[2]:.6f}\n"
            )

    if fc1 is not None:
        fc1.close()
    print(f"wrote {n} frames + {n_imu} IMU samples -> {args.out_dir}")


if __name__ == "__main__":
    main()
