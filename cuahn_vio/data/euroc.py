"""EuRoC-ASL dataset ingestion -> preprocessed sequence arrays.

The reference consumes UZH-FPV rosbags live (ros_subscribe_cuahn.cpp:70-108:
IMU topic + image topic, undistorted per frame in the callback,
VioManager.cpp:183-188). The TPU-native pipeline preprocesses once on the
host instead: decode the dataset, build the undistortion map with the C++
runtime (runtime/undistort.cpp, the CamBase.h:165-186 rebuild), remap every
frame to the 224x320 f=159.5 virtual camera, and save dense arrays the
jitted scan can mmap. EuRoC ASL layout is the de-facto interchange format
these datasets ship in (UZH-FPV provides ASL zips alongside the bags):

    <root>/mav0/imu0/data.csv                  t[ns], wx, wy, wz, ax, ay, az
    <root>/mav0/cam0/data.csv                  t[ns], filename
    <root>/mav0/cam0/data/<filename>           grayscale png
"""

from __future__ import annotations

import csv
import os
from typing import NamedTuple, Optional

import numpy as np


class RawSequence(NamedTuple):
    imu_t: np.ndarray  # (N,) seconds
    imu_w: np.ndarray  # (N, 3)
    imu_a: np.ndarray  # (N, 3)
    cam_t: np.ndarray  # (F,) seconds
    frames: np.ndarray  # (F, 224, 320) uint8, undistorted virtual camera


def _read_imu_csv(path: str):
    ts, ws, accs = [], [], []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            vals = [float(x) for x in row[:7]]
            ts.append(vals[0] * 1e-9)
            ws.append(vals[1:4])
            accs.append(vals[4:7])
    return np.asarray(ts), np.asarray(ws), np.asarray(accs)


def _read_cam_csv(path: str):
    ts, names = [], []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            ts.append(float(row[0]) * 1e-9)
            names.append(row[1].strip())
    return np.asarray(ts), names


def load_euroc_sequence(
    root: str,
    intrinsics,
    distortion,
    fisheye: bool,
    imu_dir: str = "mav0/imu0",
    cam_dir: str = "mav0/cam0",
    max_frames: Optional[int] = None,
    n_threads: int = 0,
) -> RawSequence:
    """Decode + undistort a EuRoC-layout sequence.

    ``intrinsics`` = (fx, fy, cx, cy), ``distortion`` = 4 radtan/equidistant
    coefficients — the per-dataset values the launch files carry
    (uzhfpv.launch:80-102).
    """
    from PIL import Image

    from cuahn_vio.runtime import build_undist_map, undistort_frames

    imu_t, imu_w, imu_a = _read_imu_csv(os.path.join(root, imu_dir, "data.csv"))
    cam_t, names = _read_cam_csv(os.path.join(root, cam_dir, "data.csv"))
    if max_frames:
        cam_t, names = cam_t[:max_frames], names[:max_frames]

    raw = []
    for name in names:
        img = Image.open(os.path.join(root, cam_dir, "data", name)).convert("L")
        raw.append(np.asarray(img, np.uint8))
    raw = np.stack(raw)

    map_x, map_y = build_undist_map(intrinsics, distortion, fisheye)
    frames = undistort_frames(raw, map_x, map_y, n_threads=n_threads)
    return RawSequence(imu_t, imu_w, imu_a, cam_t, frames)


def save_sequence_npz(path: str, seq: RawSequence) -> None:
    np.savez_compressed(
        path,
        imu_t=seq.imu_t, imu_w=seq.imu_w, imu_a=seq.imu_a,
        cam_t=seq.cam_t, frames=seq.frames,
    )
