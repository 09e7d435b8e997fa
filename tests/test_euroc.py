"""EuRoC-ASL ingestion: csv parsing, png decode, C++ undistortion remap."""

import os

import numpy as np
import pytest

from cuahn_vio.data.euroc import (
    RawSequence,
    load_euroc_sequence,
    save_sequence_npz,
)


def _write_euroc_dir(root, frames, imu_t, imu_w, imu_a, cam_t):
    from PIL import Image

    imu_dir = os.path.join(root, "mav0", "imu0")
    cam_dir = os.path.join(root, "mav0", "cam0", "data")
    os.makedirs(imu_dir)
    os.makedirs(cam_dir)
    with open(os.path.join(imu_dir, "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(len(imu_t)):
            f.write(
                f"{int(imu_t[i]*1e9)},"
                + ",".join(f"{v:.9f}" for v in [*imu_w[i], *imu_a[i]])
                + "\n"
            )
    with open(os.path.join(root, "mav0", "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(len(cam_t)):
            name = f"{int(cam_t[i]*1e9)}.png"
            f.write(f"{int(cam_t[i]*1e9)},{name}\n")
            Image.fromarray(frames[i]).save(os.path.join(cam_dir, name))


def test_euroc_roundtrip(tmp_path, rng):
    n_f, src_h, src_w = 5, 480, 640
    frames = rng.integers(0, 256, (n_f, src_h, src_w)).astype(np.uint8)
    imu_t = np.arange(0, 1.0, 0.002)
    imu_w = rng.normal(size=(len(imu_t), 3)) * 0.1
    imu_a = rng.normal(size=(len(imu_t), 3)) + [0, 0, 9.81]
    cam_t = np.arange(n_f) / 30.0

    _write_euroc_dir(str(tmp_path), frames, imu_t, imu_w, imu_a, cam_t)

    intr = [275.46, 274.99, 315.96, 242.71]
    dist = [-6.5e-06, -0.0104, 0.0149, -0.0056]
    seq = load_euroc_sequence(str(tmp_path), intr, dist, fisheye=True)

    assert seq.frames.shape == (n_f, 224, 320)
    assert seq.frames.dtype == np.uint8
    # undistorted center region should carry actual image content
    assert seq.frames[:, 60:160, 100:220].std() > 10
    np.testing.assert_allclose(seq.imu_t, imu_t, atol=2e-9)
    np.testing.assert_allclose(seq.imu_w, imu_w, atol=1e-8)
    np.testing.assert_allclose(seq.cam_t, cam_t, atol=2e-9)

    out = str(tmp_path / "seq.npz")
    save_sequence_npz(out, seq)
    d = np.load(out)
    assert d["frames"].shape == (n_f, 224, 320)


def test_euroc_max_frames(tmp_path, rng):
    frames = rng.integers(0, 256, (4, 120, 160)).astype(np.uint8)
    imu_t = np.arange(0, 0.2, 0.002)
    _write_euroc_dir(
        str(tmp_path), frames, imu_t,
        np.zeros((len(imu_t), 3)), np.zeros((len(imu_t), 3)),
        np.arange(4) / 30.0,
    )
    seq = load_euroc_sequence(
        str(tmp_path), [100.0, 100.0, 80.0, 60.0], [0.0] * 4,
        fisheye=False, max_frames=2,
    )
    assert seq.frames.shape[0] == 2
