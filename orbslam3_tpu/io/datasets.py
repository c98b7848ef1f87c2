"""Dataset loaders: EuRoC, TUM-VI, TUM RGB-D, KITTI.

Re-implements the `LoadImages` / `LoadIMU` CSV parsers from the reference
example mains (`/root/reference/Examples/Monocular-Inertial/
mono_inertial_euroc.cc:228-287`, `Examples/Monocular/mono_tum.cc`,
`mono_kitti.cc`, `Examples/RGB-D/rgbd_tum.cc`). Pure host-side NumPy; all
loaders return timestamps in seconds (float64) and lazy image paths.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class ImageSequence:
    timestamps: np.ndarray  # (N,) seconds
    paths: List[str]
    paths_right: Optional[List[str]] = None  # stereo

    def __len__(self):
        return len(self.paths)

    def read(self, i: int) -> np.ndarray:
        """Grayscale float32 image."""
        import cv2

        img = cv2.imread(self.paths[i], cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(self.paths[i])
        return img.astype(np.float32)

    def read_right(self, i: int) -> np.ndarray:
        import cv2

        img = cv2.imread(self.paths_right[i], cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(self.paths_right[i])
        return img.astype(np.float32)

    def read_depth(self, i: int) -> np.ndarray:
        """Raw depth image (TUM RGB-D ships 16-bit PNGs; IMREAD_GRAYSCALE
        would quantize them to 8 bits — ref reads CV_LOAD_IMAGE_UNCHANGED,
        `rgbd_tum.cc:LoadImages`)."""
        import cv2

        img = cv2.imread(self.paths_right[i], cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(self.paths_right[i])
        return img.astype(np.float32)


@dataclass
class ImuData:
    timestamps: np.ndarray  # (M,) seconds
    gyro: np.ndarray  # (M,3) rad/s
    acc: np.ndarray  # (M,3) m/s^2


def load_euroc_images(
    seq_dir: str, timestamps_file: Optional[str] = None, cam: str = "cam0"
) -> ImageSequence:
    """EuRoC mav0 layout: `<seq>/mav0/cam0/data/<ns>.png` + data.csv
    (`mono_inertial_euroc.cc:LoadImages:228`). If `timestamps_file` (the
    reference's EuRoC_TimeStamps list) is given, it selects the frames."""
    base = os.path.join(seq_dir, "mav0", cam, "data")
    if timestamps_file:
        with open(timestamps_file) as f:
            ns = [line.strip() for line in f if line.strip()]
        ts = np.asarray([int(t) for t in ns], np.int64)
        paths = [os.path.join(base, f"{t}.png") for t in ns]
    else:
        csv_path = os.path.join(seq_dir, "mav0", cam, "data.csv")
        ts_list, paths = [], []
        with open(csv_path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                ts_list.append(int(row[0]))
                paths.append(os.path.join(base, row[1].strip()))
        ts = np.asarray(ts_list, np.int64)
    return ImageSequence(timestamps=ts.astype(np.float64) * 1e-9, paths=paths)


def load_euroc_imu(seq_dir: str) -> ImuData:
    """`mav0/imu0/data.csv`: ns, wx, wy, wz, ax, ay, az
    (`mono_inertial_euroc.cc:LoadIMU:252`)."""
    path = os.path.join(seq_dir, "mav0", "imu0", "data.csv")
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            rows.append([float(v) for v in row[:7]])
    arr = np.asarray(rows, np.float64)
    return ImuData(
        timestamps=arr[:, 0] * 1e-9,
        gyro=arr[:, 1:4].astype(np.float32),
        acc=arr[:, 4:7].astype(np.float32),
    )


def load_tum_rgbd(seq_dir: str, association_file: str) -> ImageSequence:
    """TUM RGB-D with an associations file `ts_rgb rgb ts_depth depth`
    (`Examples/RGB-D/rgbd_tum.cc:LoadImages`)."""
    ts, rgb, depth = [], [], []
    with open(association_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            p = line.split()
            ts.append(float(p[0]))
            rgb.append(os.path.join(seq_dir, p[1]))
            depth.append(os.path.join(seq_dir, p[3]))
    return ImageSequence(np.asarray(ts), rgb, paths_right=depth)


def load_kitti(seq_dir: str) -> ImageSequence:
    """KITTI odometry layout: image_0/, image_1/, times.txt
    (`Examples/Monocular/mono_kitti.cc:LoadImages`)."""
    times = np.loadtxt(os.path.join(seq_dir, "times.txt"))
    left = [os.path.join(seq_dir, "image_0", f"{i:06d}.png") for i in range(len(times))]
    right_dir = os.path.join(seq_dir, "image_1")
    right = (
        [os.path.join(right_dir, f"{i:06d}.png") for i in range(len(times))]
        if os.path.isdir(right_dir)
        else None
    )
    return ImageSequence(times.astype(np.float64), left, paths_right=right)


def load_tumvi_images(seq_dir: str, cam: str = "cam0") -> ImageSequence:
    """TUM-VI uses the same mav0 layout as EuRoC
    (`mono_inertial_tum_vi.cc`)."""
    return load_euroc_images(seq_dir, cam=cam)


load_tumvi_imu = load_euroc_imu


def load_groundtruth_euroc(seq_dir: str):
    """`mav0/state_groundtruth_estimate0/data.csv`: ns, p(3), q(4), v(3),
    bw(3), ba(3). Returns (ts_s, positions (N,3), quaternions wxyz)."""
    path = os.path.join(seq_dir, "mav0", "state_groundtruth_estimate0", "data.csv")
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            rows.append([float(v) for v in row[:8]])
    arr = np.asarray(rows, np.float64)
    return arr[:, 0] * 1e-9, arr[:, 1:4], arr[:, 4:8]
