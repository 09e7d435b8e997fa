"""Pyramidal Lucas-Kanade tracking, batched and jittable.

Replaces TrackKLT (cuahn_ros/ov_core/src/track/TrackKLT.cpp), which wraps
cv::calcOpticalFlowPyrLK per camera on the OpenCV thread pool.

TPU redesign: all features advance together as one (N, ...) batch —
per-feature patch extraction is a vmapped bilinear gather, the normal
equations of every feature are built with one batched 2x2 solve, and the
iteration count is static (masked convergence instead of early exit), so the
whole tracker is a single jitted function of fixed shapes. Pyramid levels
are average-pool halvings (the classic Bouguet scheme coarse->fine).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H, W) at float coords (u, v) arrays; zero pad."""
    h, w = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)

    def tap(vv, uu):
        ok = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        val = img[jnp.clip(vv, 0, h - 1), jnp.clip(uu, 0, w - 1)]
        return jnp.where(ok, val, 0.0)

    return (
        tap(v0, u0) * (1 - du) * (1 - dv)
        + tap(v0, u0 + 1) * du * (1 - dv)
        + tap(v0 + 1, u0) * (1 - du) * dv
        + tap(v0 + 1, u0 + 1) * du * dv
    )


def build_pyramid(img: jnp.ndarray, levels: int = 3) -> list[jnp.ndarray]:
    """levels average-pool halvings, finest first (cv::buildOpticalFlowPyramid
    analog). Image dims must be divisible by 2**(levels-1)."""
    pyr = [img]
    for _ in range(levels - 1):
        x = pyr[-1]
        h, w = x.shape
        pyr.append(x.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)))
    return pyr


def _track_level(img1, img2, pts1, guess, half: int, iters: int):
    """One pyramid level of LK for all features: returns refined offsets.

    pts1: (N, 2) feature coords in THIS level's pixels.
    guess: (N, 2) initial flow at this level.
    """
    r = jnp.arange(-half, half + 1, dtype=jnp.float32)
    dv_g, du_g = jnp.meshgrid(r, r, indexing="ij")  # (P, P)

    def one(p1, g):
        u_t = p1[0] + du_g
        v_t = p1[1] + dv_g
        t = _bilinear(img1, u_t, v_t)
        # spatial gradient of the template (central differences, template
        # frame — the Bouguet inverse-compositional choice: constant per level)
        gx = 0.5 * (_bilinear(img1, u_t + 1, v_t) - _bilinear(img1, u_t - 1, v_t))
        gy = 0.5 * (_bilinear(img1, u_t, v_t + 1) - _bilinear(img1, u_t, v_t - 1))
        a11 = jnp.sum(gx * gx)
        a12 = jnp.sum(gx * gy)
        a22 = jnp.sum(gy * gy)
        det = a11 * a22 - a12 * a12
        ok = det > 1e-8

        def body(_, d):
            cur = _bilinear(img2, p1[0] + d[0] + du_g, p1[1] + d[1] + dv_g)
            e = cur - t
            b1 = jnp.sum(e * gx)
            b2 = jnp.sum(e * gy)
            step_u = (a22 * b1 - a12 * b2) / jnp.where(ok, det, 1.0)
            step_v = (-a12 * b1 + a11 * b2) / jnp.where(ok, det, 1.0)
            return d - jnp.where(ok, jnp.array([step_u, step_v]), 0.0)

        d = jax.lax.fori_loop(0, iters, body, g)
        return d, ok

    return jax.vmap(one)(pts1, guess)


@partial(jax.jit, static_argnames=("levels", "half", "iters"))
def track_pyramidal(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    pts1: jnp.ndarray,
    levels: int = 3,
    half: int = 7,
    iters: int = 10,
    max_residual: float = 0.08,
):
    """Track pts1 (N, 2) from img1 to img2, coarse-to-fine.

    Returns:
        pts2: (N, 2) tracked coordinates.
        valid: (N,) bool — well-conditioned, in-bounds, photometrically
            consistent tracks (the cv status array analog).
    """
    p1 = build_pyramid(img1, levels)
    p2 = build_pyramid(img2, levels)
    n = pts1.shape[0]
    # Bouguet coarse-to-fine: the flow guess lives in the CURRENT level's
    # pixel units; moving one level finer doubles it.
    guess = jnp.zeros((n, 2), jnp.float32)
    ok_all = jnp.ones((n,), bool)
    flow = guess
    for lv in range(levels - 1, -1, -1):
        s = float(2 ** lv)
        flow, ok = _track_level(p1[lv], p2[lv], pts1 / s, guess, half, iters)
        ok_all = ok_all & ok
        guess = flow * 2.0
    pts2 = pts1 + flow  # level 0 px == full-res px
    h, w = img1.shape
    inb = (
        (pts2[:, 0] >= half) & (pts2[:, 0] < w - half)
        & (pts2[:, 1] >= half) & (pts2[:, 1] < h - half)
    )
    # photometric consistency at full resolution
    r = jnp.arange(-half, half + 1, dtype=jnp.float32)
    dv_g, du_g = jnp.meshgrid(r, r, indexing="ij")

    def resid(a, b):
        t = _bilinear(img1, a[0] + du_g, a[1] + dv_g)
        c = _bilinear(img2, b[0] + du_g, b[1] + dv_g)
        return jnp.mean(jnp.abs(t - c))

    res = jax.vmap(resid)(pts1, pts2)
    return pts2, ok_all & inb & (res < max_residual)
