"""Distorted-fisheye ingestion chained end-to-end (VERDICT r1 #9).

Synthesizes RAW fisheye imagery (the new per-point distortion model warps
rendered virtual-camera frames out to a 640x480 Kannala-Brandt camera, the
inverse of what the ingest path must undo), writes a EuRoC-ASL directory,
then chains the real user workflow: ``convert-euroc`` (C++ undistortion
remap, CamBase.h:165-186 semantics) -> ``run-vio`` -> ATE. Nothing in the
chain is mocked; the distortion synthesis (jax fixed-point) and the
undistortion (C++ Newton + remap) are independent implementations."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuahn_vio.cli import main as cli_main
from tests.test_camera import FISHEYE_CALIB
from tests.test_euroc import _write_euroc_dir

RAW_W, RAW_H = 640, 480


def _distort_map():
    """(RAW_H, RAW_W, 2) virtual-pixel sample coords for every raw pixel:
    raw px -> undistort -> normalized ray -> virtual K. The exact inverse
    of the ingest remap, so interior content must round-trip."""
    from cuahn_vio.ops.warp import virtual_cam_k
    from cuahn_vio.vision.camera import undistort_points

    us, vs = np.meshgrid(np.arange(RAW_W), np.arange(RAW_H))
    uv = jnp.array(np.stack([us.ravel(), vs.ravel()], 1), jnp.float32)
    norm = undistort_points(uv, jnp.array(FISHEYE_CALIB, jnp.float32), True)
    k, _ = virtual_cam_k(224, 320)
    k = np.asarray(k)
    vx = norm[:, 0] * k[0, 0] + k[0, 2]
    vy = norm[:, 1] * k[1, 1] + k[1, 2]
    return np.stack(
        [np.asarray(vx), np.asarray(vy)], 1
    ).reshape(RAW_H, RAW_W, 2)


def _sample_bilinear(img, xy):
    """Zero-padded bilinear sample of (H, W) at (..., 2) pixel coords."""
    h, w = img.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx, fy = x - x0, y - y0

    def tap(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        return np.where(
            inside, img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)], 0.0
        )

    return (
        tap(y0, x0) * (1 - fx) * (1 - fy)
        + tap(y0, x0 + 1) * fx * (1 - fy)
        + tap(y0 + 1, x0) * (1 - fx) * fy
        + tap(y0 + 1, x0 + 1) * fx * fy
    )


@pytest.mark.slow
def test_euroc_fisheye_chain(tmp_path, rng):
    from cuahn_vio.data.synthetic import AnalyticTrajectory, make_sequence
    from cuahn_vio.eval import ResultTrajectory, save_pose_file
    from cuahn_vio.utils.config import VioOptions

    opts = VioOptions.uzhfpv_indoor45()
    seq = make_sequence(
        AnalyticTrajectory(),
        np.asarray(opts.t_imu_to_cam),
        duration=4.0,
        seed=3,
        sigma_w=0.001,
        sigma_a=0.01,
        bias_g=0.001,
        bias_a=0.005,
    )

    # raw fisheye frames from the virtual renders
    dmap = _distort_map()
    raw = np.stack(
        [
            np.clip(
                _sample_bilinear(f.astype(np.float32), dmap), 0, 255
            ).astype(np.uint8)
            for f in seq.frames
        ]
    )
    _write_euroc_dir(
        str(tmp_path), raw, seq.imu_t, seq.imu_w, seq.imu_a, seq.cam_t
    )

    # the real CLI chain: convert-euroc -> run-vio (dead-reckoning: the
    # ingestion/undistortion path is what's under test, and the network on
    # CPU would dominate the suite's runtime)
    npz = str(tmp_path / "seq.npz")
    cli_main(["convert-euroc", str(tmp_path), "--out", npz])
    conv = np.load(npz)
    assert conv["frames"].shape == (len(seq.cam_t), 224, 320)

    # interior imagery round-trips through distort -> C++ undistort
    mid = len(seq.cam_t) // 2
    a = conv["frames"][mid, 40:180, 60:260].astype(np.float32)
    b = seq.frames[mid, 40:180, 60:260].astype(np.float32)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 6.0, f"undistorted imagery diverged: rmse {rmse:.2f} u8"

    est = str(tmp_path / "est.txt")
    cli_main(
        [
            "run-vio", npz, "--no-network", "--out", est,
            "--init-height", f"{float(seq.gt_pose_w[0, 2])}",
            "--calib-dt", "0.0", "--init-imu-thresh", "0.2",
        ]
    )
    gt = str(tmp_path / "gt.txt")
    save_pose_file(gt, seq.gt_times, seq.gt_pose_w)
    rt = ResultTrajectory.from_files(est, gt, "se3")
    _, pos = rt.calculate_ate()
    assert pos.rmse < 0.12, f"chained run ATE too large: {pos.rmse:.3f} m"
