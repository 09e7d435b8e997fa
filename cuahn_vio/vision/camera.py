"""Per-point camera distortion models (radtan + equidistant), jittable.

Rebuilds the CamBase/CamRadtan/CamEqui per-point API
(cuahn_ros/ov_core/src/cam/CamBase.h:43-160, CamRadtan.h, CamEqui.h) the
TPU-native way: pure functions over a calibration vector, vmappable over
point sets, with the measurement Jacobians taken by ``jax.jacfwd`` of the
forward model instead of the reference's hand-derived chain
(CamRadtan.h compute_distort_jacobian).

Calibration layout matches the reference's 8-vector (CamBase.h set_value):
``[fx, fy, cx, cy, k1, k2, k3|p1, k4|p2]`` — radtan uses (k1, k2, p1, p2)
plumb-bob, equidistant uses Kannala-Brandt (k1..k4).

These make the vision front-end (vision/klt.py, vision/triangulate.py)
usable on RAW fisheye imagery: track in raw pixels, then ``undistort`` the
tracked points into normalized coordinates for triangulation, exactly the
OpenVINS pattern (TrackBase undistorts features after KLT).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_UNDISTORT_ITERS = 20  # fixed-point iterations (cv::undistortPoints uses 5;
# more costs nothing under jit and converges hard cases)


# ------------------------------------------------------------------ radtan
def distort_radtan(uv_norm: jnp.ndarray, calib: jnp.ndarray) -> jnp.ndarray:
    """Normalized camera coords -> raw distorted pixels (CamRadtan.h
    distort_f: plumb-bob k1 k2 p1 p2, then the camera matrix)."""
    fx, fy, cx, cy = calib[0], calib[1], calib[2], calib[3]
    k1, k2, p1, p2 = calib[4], calib[5], calib[6], calib[7]
    x, y = uv_norm[..., 0], uv_norm[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def undistort_radtan(uv_dist: jnp.ndarray, calib: jnp.ndarray) -> jnp.ndarray:
    """Raw distorted pixels -> normalized camera coords (CamRadtan.h
    undistort_f / cv::undistortPoints): fixed-point inversion of the
    distortion polynomial."""
    fx, fy, cx, cy = calib[0], calib[1], calib[2], calib[3]
    k1, k2, p1, p2 = calib[4], calib[5], calib[6], calib[7]
    xd = (uv_dist[..., 0] - cx) / fx
    yd = (uv_dist[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return (xd - dx) / radial, (yd - dy) / radial

    x, y = jax.lax.fori_loop(0, _UNDISTORT_ITERS, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


# ------------------------------------------------------------- equidistant
def distort_equidistant(uv_norm: jnp.ndarray, calib: jnp.ndarray) -> jnp.ndarray:
    """Normalized camera coords -> raw fisheye pixels (CamEqui.h distort_f:
    Kannala-Brandt theta-polynomial, cv::fisheye model)."""
    fx, fy, cx, cy = calib[0], calib[1], calib[2], calib[3]
    k1, k2, k3, k4 = calib[4], calib[5], calib[6], calib[7]
    x, y = uv_norm[..., 0], uv_norm[..., 1]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    # r -> 0: theta_d/r -> 1 (the reference branches on r < 1e-8)
    scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
    return jnp.stack(
        [fx * x * scale + cx, fy * y * scale + cy], axis=-1
    )


def undistort_equidistant(uv_dist: jnp.ndarray, calib: jnp.ndarray) -> jnp.ndarray:
    """Raw fisheye pixels -> normalized camera coords (CamEqui.h
    undistort_f / cv::fisheye::undistortPoints): fixed-point solve of
    theta from theta_d, then rescale the ray."""
    fx, fy, cx, cy = calib[0], calib[1], calib[2], calib[3]
    k1, k2, k3, k4 = calib[4], calib[5], calib[6], calib[7]
    xd = (uv_dist[..., 0] - cx) / fx
    yd = (uv_dist[..., 1] - cy) / fy
    theta_d = jnp.sqrt(xd * xd + yd * yd)

    def body(_, theta):
        t2 = theta * theta
        return theta_d / (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))

    theta = jax.lax.fori_loop(0, _UNDISTORT_ITERS, body, theta_d)
    scale = jnp.where(theta_d > 1e-8, jnp.tan(theta) / jnp.maximum(theta_d, 1e-8), 1.0)
    return jnp.stack([xd * scale, yd * scale], axis=-1)


# ------------------------------------------------------------- dispatch
def distort(uv_norm, calib, fisheye: bool):
    return (distort_equidistant if fisheye else distort_radtan)(uv_norm, calib)


def undistort(uv_dist, calib, fisheye: bool):
    return (undistort_equidistant if fisheye else undistort_radtan)(
        uv_dist, calib
    )


@partial(jax.jit, static_argnames=("fisheye",))
def distort_jacobian(uv_norm: jnp.ndarray, calib: jnp.ndarray, fisheye: bool):
    """d(raw pixel)/d(normalized) (2x2) and d(raw pixel)/d(calib) (2x8) —
    the reference's compute_distort_jacobian (CamBase.h:155-160,
    CamRadtan.h/CamEqui.h hand chains) via jacfwd of the forward model."""
    fn = distort_equidistant if fisheye else distort_radtan
    h_dz_dzn = jax.jacfwd(fn, argnums=0)(uv_norm, calib)
    h_dz_dzeta = jax.jacfwd(fn, argnums=1)(uv_norm, calib)
    return h_dz_dzn, h_dz_dzeta


def undistort_points(uv_dist, calib, fisheye: bool):
    """Batched undistortion of (N, 2) raw pixels to normalized coords —
    what a raw-fisheye KLT front-end feeds the triangulator."""
    return jax.vmap(lambda p: undistort(p, calib, fisheye))(uv_dist)
