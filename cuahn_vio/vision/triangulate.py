"""N-view point triangulation (FeatureInitializer parity).

Replaces cuahn_ros/ov_core/src/feat/FeatureInitializer.{h,cpp}: the
reference triangulates each tracked feature from its bearing history with a
linear system + 1-D inverse-depth Gauss-Newton refinement, feature by
feature. Here the linear triangulation is one batched least-squares and the
refinement is a fixed-iteration Gauss-Newton on inverse depth in the anchor
frame — vmap over features gives the whole map in one jitted call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("gn_iters",))
def triangulate_nview(
    bearings: jnp.ndarray,  # (M, 3) unit-norm bearing in each camera frame
    rot_c2a: jnp.ndarray,  # (M, 3, 3) rotation camera_i -> anchor
    p_cia: jnp.ndarray,  # (M, 3) camera_i position in anchor frame
    valid: jnp.ndarray,  # (M,) bool observation mask
    gn_iters: int = 5,
):
    """Triangulate one feature from M (masked) observations.

    The anchor frame is observation 0's camera frame (FeatureInitializer
    convention). vmap over the leading axis for many features.

    Returns:
        p_fa: (3,) feature position in the anchor frame.
        ok: () bool — conditioning + positive-depth + convergence check.
    """
    w = valid.astype(bearings.dtype)
    # linear stage: each view constrains p to the line p_cia + s * (R b):
    # (I - d dᵀ) (p - p_cia) = 0 with d = rot_c2a @ bearing
    d = jnp.einsum("mij,mj->mi", rot_c2a, bearings)
    d = d / (jnp.linalg.norm(d, axis=1, keepdims=True) + 1e-12)
    eye = jnp.eye(3, dtype=bearings.dtype)
    proj = eye[None] - d[:, :, None] * d[:, None, :]  # (M, 3, 3)
    a_mat = jnp.sum(proj * w[:, None, None], axis=0)
    b_vec = jnp.einsum("mij,mj->i", proj * w[:, None, None], p_cia)
    # condition check as in FeatureInitializer (singular value ratio)
    svals = jnp.linalg.svd(a_mat, compute_uv=False)
    cond_ok = (svals[0] / jnp.maximum(svals[2], 1e-12)) < 1e4
    p_lin = jnp.linalg.solve(a_mat + 1e-9 * eye, b_vec)

    # Gauss-Newton on (alpha, beta, rho) = (x/z, y/z, 1/z) in anchor frame
    # (FeatureInitializer.cpp single-depth refinement, all views weighted)
    z0 = jnp.maximum(p_lin[2], 1e-3)
    x0 = jnp.array([p_lin[0] / z0, p_lin[1] / z0, 1.0 / z0])

    def residuals(x):
        alpha, beta, rho = x
        # feature in view i: R_a2ci (pf_a - p_cia); pf_a = [alpha, beta, 1]/rho
        pf_a = jnp.array([alpha, beta, 1.0]) / rho
        pf_ci = jnp.einsum("mji,mj->mi", rot_c2a, pf_a[None] - p_cia)  # Rᵀ(...)
        uv = pf_ci[:, :2] / jnp.maximum(pf_ci[:, 2:3], 1e-6)
        meas = bearings[:, :2] / jnp.maximum(bearings[:, 2:3], 1e-6)
        return ((uv - meas) * w[:, None]).reshape(-1)

    def gn_step(x, _):
        r = residuals(x)
        j = jax.jacfwd(residuals)(x)
        h = j.T @ j + 1e-8 * jnp.eye(3)
        return x - jnp.linalg.solve(h, j.T @ r), None

    x, _ = jax.lax.scan(gn_step, x0, None, length=gn_iters)
    p_fa = jnp.array([x[0], x[1], 1.0]) / x[2]
    depth_ok = (x[2] > 1e-3) & (x[2] < 1e3)
    n_obs_ok = jnp.sum(w) >= 2
    return p_fa, cond_ok & depth_ok & n_obs_ok & jnp.all(jnp.isfinite(p_fa))
