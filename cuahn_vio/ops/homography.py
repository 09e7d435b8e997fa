"""Planar-homography math: 4-point DLT solve and covariance transfer.

Rebuilds (TPU-first, batched jnp) the reference's
``trace_pytorch_model/model_to_trace.py``:

- ``dlt_solve``               <- DLT_solve (model_to_trace.py:42-61)
- ``transfer_mean_var``       <- transfer_mean_var_single (model_to_trace.py:18-38)
- ``corner_points``           <- Down_Net_3blocks.__init__ origin_4pt
                                 (model_to_trace.py:78-83)

Shapes are unbatched (a single homography); wrap with ``jax.vmap`` for
batches — idiomatic JAX instead of the reference's hand-written batch dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def f32_precision(fn):
    """Run all matmuls inside ``fn`` at full float32 precision.

    TPU matmuls default to bfloat16 operands; that is fine for the conv
    towers but fatal for homography algebra (a 0.2% error on a 3x3 compose
    is a multi-pixel warp error). These ops are tiny, so HIGHEST costs
    nothing.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def corner_points(img_height: int, img_width: int, dtype=jnp.float32) -> jnp.ndarray:
    """The 4 corner pixels (u, v) in order UL, BL, BR, UR — (4, 2).

    Matches origin_4pt (model_to_trace.py:78-83) with cornerOffset_4pt = 0.
    """
    w1, h1 = float(img_width - 1), float(img_height - 1)
    return jnp.array(
        [[0.0, 0.0], [0.0, h1], [w1, h1], [w1, 0.0]], dtype=dtype
    )


@f32_precision
def dlt_solve(src_4pt: jnp.ndarray, dst_4pt: jnp.ndarray) -> jnp.ndarray:
    """Homography H (3,3) with H @ [u1,v1,1]' ∝ [u2,v2,1]' from 4 correspondences.

    Direct linear transform with h9 = 1, solving the same 4-correspondence
    system as the reference (model_to_trace.py:42-61). Unlike the reference
    (which builds the 8x8 system on raw pixel coordinates and inverts it —
    condition number ~1e9, fine in f64 but ~1px of error in f32), points are
    Hartley-normalized first so the solve is well conditioned in float32 —
    the dtype the whole network runs in on TPU. Algebraically identical.

    Args:
        src_4pt: (4, 2) source points (u, v).
        dst_4pt: (4, 2) destination points.
    Returns:
        (3, 3) homography mapping src -> dst in pixel coordinates,
        scaled so H[2, 2] = 1 (the reference's h9 = 1 convention).
    """
    dtype = src_4pt.dtype

    def norm_transform(pts):
        c = jnp.mean(pts, axis=0)
        s = jnp.sqrt(2.0) / jnp.maximum(
            jnp.mean(jnp.linalg.norm(pts - c, axis=1)), 1e-6
        )
        t = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=dtype
        )
        t = t.at[0, 0].set(s).at[1, 1].set(s)
        t = t.at[0, 2].set(-s * c[0]).at[1, 2].set(-s * c[1])
        t_inv = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=dtype
        )
        t_inv = t_inv.at[0, 0].set(1.0 / s).at[1, 1].set(1.0 / s)
        t_inv = t_inv.at[0, 2].set(c[0]).at[1, 2].set(c[1])
        return (pts - c) * s, t, t_inv

    src_n, t_src, _ = norm_transform(src_4pt)
    dst_n, _, t_dst_inv = norm_transform(dst_4pt)

    ones = jnp.ones((4, 1), dtype=dtype)
    zeros = jnp.zeros((4, 3), dtype=dtype)
    xy1 = jnp.concatenate([src_n, ones], axis=1)  # (4, 3)
    # Rows interleaved per point: [x y 1 0 0 0 | -u'x -u'y], [0 0 0 x y 1 | -v'x -v'y]
    xyu = jnp.concatenate([xy1, zeros], axis=1)  # (4, 6)
    xyd = jnp.concatenate([zeros, xy1], axis=1)  # (4, 6)
    m1 = jnp.concatenate([xyu, xyd], axis=1).reshape(8, 6)
    m2 = (dst_n.reshape(4, 2, 1) * src_n.reshape(4, 1, 2)).reshape(8, 2)
    a = jnp.concatenate([m1, -m2], axis=1)  # (8, 8)
    b = dst_n.reshape(8)
    h8 = jnp.linalg.solve(a, b)
    h_n = jnp.concatenate([h8, jnp.ones((1,), dtype=dtype)]).reshape(3, 3)
    h = t_dst_inv @ h_n @ t_src
    return h / h[2, 2]


@f32_precision
def transfer_mean_var(
    var_4pt: jnp.ndarray, h_uv: jnp.ndarray, warped_4pt: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Push per-corner 2-D variances through a homography.

    Rebuilds transfer_mean_var_single (model_to_trace.py:18-38): the block-4
    head predicts corner locations/variances in the *warped* image frame;
    this maps them into the original img2 pixel frame via the part-1
    homography H: x' = H x / scale, Σ' = (H/scale) diag([σ², 0]) (H/scale)ᵀ.

    Args:
        var_4pt:    (4, 2) per-corner (u, v) variances in the warped frame.
        h_uv:       (3, 3) part-1 homography (pixel frame).
        warped_4pt: (4, 2) predicted corner locations in the warped frame.
    Returns:
        pts_orig: (4, 2) corner locations in the original img2 pixel frame.
        cov_4pt:  (4, 2, 2) per-corner covariance in the original frame.
    """
    uv1 = jnp.concatenate(
        [warped_4pt, jnp.ones((4, 1), dtype=warped_4pt.dtype)], axis=1
    )  # (4, 3)
    mapped = uv1 @ h_uv.T  # (4, 3) = (H @ uv1ᵀ)ᵀ
    scale = mapped[:, 2:3]  # (4, 1)
    pts_orig = mapped[:, :2] / scale

    h_scaled = h_uv[None, :, :] / scale[:, :, None]  # (4, 3, 3)
    var3 = jnp.concatenate(
        [var_4pt, jnp.zeros((4, 1), dtype=var_4pt.dtype)], axis=1
    )  # (4, 3)
    # Σ' = Hs diag(var3) Hsᵀ, per corner; keep the 2x2 (u, v) block.
    t = (h_scaled * var3[:, None, :]) @ jnp.swapaxes(h_scaled, 1, 2)  # (4, 3, 3)
    return pts_orig, t[:, :2, :2]


def block_diag_cov8(cov_4pt: jnp.ndarray) -> jnp.ndarray:
    """(4, 2, 2) per-corner covs -> (8, 8) block-diagonal measurement cov
    (combined_stu_model.forward, model_to_trace.py:313-317)."""
    out = jnp.zeros((8, 8), dtype=cov_4pt.dtype)
    for i in range(4):
        out = out.at[2 * i : 2 * i + 2, 2 * i : 2 * i + 2].set(cov_4pt[i])
    return out
