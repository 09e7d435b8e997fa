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


def write_euroc_dir(root, frames, imu_t, imu_w, imu_a, cam_t) -> None:
    """Write a minimal EuRoC-ASL directory (mav0/imu0 + mav0/cam0): the
    inverse of ``load_euroc_sequence``, used to synthesize raw-camera
    datasets for the full ingestion chain (render -> distort -> this ->
    convert-euroc -> run-vio)."""
    from PIL import Image

    imu_dir = os.path.join(root, "mav0", "imu0")
    cam_dir = os.path.join(root, "mav0", "cam0", "data")
    os.makedirs(imu_dir, exist_ok=True)
    os.makedirs(cam_dir, exist_ok=True)
    with open(os.path.join(imu_dir, "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(len(imu_t)):
            f.write(
                f"{int(imu_t[i] * 1e9)},"
                + ",".join(f"{v:.9f}" for v in [*imu_w[i], *imu_a[i]])
                + "\n"
            )
    with open(os.path.join(root, "mav0", "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(len(cam_t)):
            name = f"{int(cam_t[i] * 1e9)}.png"
            f.write(f"{int(cam_t[i] * 1e9)},{name}\n")
            Image.fromarray(frames[i]).save(os.path.join(cam_dir, name))


def distort_frames_to_raw(
    frames: np.ndarray,  # (F, H, W) uint8 virtual-camera renders
    intrinsics,
    distortion,
    fisheye: bool,
    raw_w: int = 640,
    raw_h: int = 480,
) -> np.ndarray:
    """Re-project virtual-camera (f=159.5 pinhole) frames out to a RAW
    distorted camera: for every raw pixel, undistort to a normalized ray
    (vision/camera.py Newton inverse) and bilinearly sample the virtual
    image there — the exact inverse of the ingest remap
    (CamBase.h:165-186), so interior content round-trips through
    ``convert-euroc``."""
    import jax.numpy as jnp

    from cuahn_vio.ops.warp import virtual_cam_k
    from cuahn_vio.vision.camera import undistort_points

    f, h, w = frames.shape
    us, vs = np.meshgrid(np.arange(raw_w), np.arange(raw_h))
    uv = jnp.asarray(np.stack([us.ravel(), vs.ravel()], 1), jnp.float32)
    norm = np.asarray(
        undistort_points(uv, jnp.asarray(intrinsics + distortion, jnp.float32), fisheye)
    )
    k, _ = virtual_cam_k(h, w)
    k = np.asarray(k)
    x = norm[:, 0] * k[0, 0] + k[0, 2]
    y = norm[:, 1] * k[1, 1] + k[1, 2]

    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx, fy = x - x0, y - y0
    out = np.zeros((f, raw_h * raw_w), np.float32)
    imgs = frames.astype(np.float32)

    def tap(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        vals = imgs[:, np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)]
        return vals * inside[None]

    out = (
        tap(y0, x0) * ((1 - fx) * (1 - fy))[None]
        + tap(y0, x0 + 1) * (fx * (1 - fy))[None]
        + tap(y0 + 1, x0) * ((1 - fx) * fy)[None]
        + tap(y0 + 1, x0 + 1) * (fx * fy)[None]
    )
    return np.clip(out, 0, 255).astype(np.uint8).reshape(f, raw_h, raw_w)
