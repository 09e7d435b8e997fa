"""Per-point camera model (vision/camera.py vs CamBase.h:43-160):
distort/undistort round trips, jacfwd Jacobians vs finite differences, and
cross-validation against the C++ runtime's undistortion maps (the two
implementations are fully independent: jax fixed-point vs C++ Newton)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuahn_vio.vision.camera import (
    distort,
    distort_jacobian,
    undistort,
    undistort_points,
)

# UZH-FPV snapdragon cam0 calibration (uzhfpv.launch sensor_config blocks)
FISHEYE_CALIB = np.array(
    [275.46015578667294, 274.9948095922592, 315.958384100568,
     242.7123497822731, -6.545154718304953e-06, -0.010379525898159981,
     0.014935312423953146, -0.005639061406567785], np.float64
)
RADTAN_CALIB = np.array(
    [458.654, 457.296, 367.215, 248.375, -0.28340811, 0.07395907,
     0.00019359, 1.76187114e-05], np.float64
)  # EuRoC MH cam0 (plumb-bob)


@pytest.mark.parametrize(
    "calib, fisheye",
    [(RADTAN_CALIB, False), (FISHEYE_CALIB, True)],
    ids=["radtan", "equidistant"],
)
def test_roundtrip(calib, fisheye, rng):
    calib = jnp.array(calib, jnp.float32)
    uv_norm = jnp.array(rng.uniform(-0.7, 0.7, (64, 2)), jnp.float32)
    px = jax.vmap(lambda p: distort(p, calib, fisheye))(uv_norm)
    back = undistort_points(px, calib, fisheye)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv_norm), atol=2e-5)


@pytest.mark.parametrize(
    "calib, fisheye",
    [(RADTAN_CALIB, False), (FISHEYE_CALIB, True)],
    ids=["radtan", "equidistant"],
)
def test_distort_jacobian_matches_fd(calib, fisheye):
    calib = jnp.array(calib, jnp.float32)
    pt = jnp.array([0.31, -0.22], jnp.float32)
    h_zn, h_zeta = distort_jacobian(pt, calib, fisheye)
    assert h_zn.shape == (2, 2) and h_zeta.shape == (2, 8)
    eps = 1e-3
    for k in range(2):
        d = jnp.zeros(2).at[k].set(eps)
        fd = (distort(pt + d, calib, fisheye) - distort(pt - d, calib, fisheye)) / (
            2 * eps
        )
        np.testing.assert_allclose(np.asarray(h_zn[:, k]), np.asarray(fd), atol=2e-2)
    for k in range(8):
        d = jnp.zeros(8).at[k].set(eps)
        fd = (
            distort(pt, calib + d, fisheye) - distort(pt, calib - d, fisheye)
        ) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(h_zeta[:, k]), np.asarray(fd), atol=2e-2
        )


@pytest.mark.parametrize(
    "calib, fisheye",
    [(RADTAN_CALIB, False), (FISHEYE_CALIB, True)],
    ids=["radtan", "equidistant"],
)
def test_matches_cpp_undist_map(calib, fisheye):
    """The C++ runtime's map (virtual px -> raw px, Newton inverse) and the
    jax forward distortion must agree: distorting the virtual pixel's ray
    lands on the same raw pixel."""
    from cuahn_vio.ops.warp import virtual_cam_k
    from cuahn_vio.runtime import build_undist_map

    mx, my = build_undist_map(calib[:4], calib[4:], fisheye)
    k, k_inv = virtual_cam_k(224, 320)
    calib_j = jnp.array(calib, jnp.float32)
    # probe interior virtual pixels (border rays can leave the raw image)
    vs, us = np.mgrid[40:200:40, 40:300:60]
    uv1 = jnp.array(
        np.stack([us.ravel(), vs.ravel(), np.ones(us.size)], 1), jnp.float32
    )
    rays = uv1 @ jnp.asarray(k_inv).T  # normalized (x, y, 1)
    raw = jax.vmap(lambda r: distort(r[:2] / r[2], calib_j, fisheye))(rays)
    want = np.stack(
        [mx[vs.ravel(), us.ravel()], my[vs.ravel(), us.ravel()]], 1
    )
    np.testing.assert_allclose(np.asarray(raw), want, atol=5e-3)
