"""Homography image warping with bilinear sampling (XLA path).

Rebuilds the reference's warper (``trace_pytorch_model/warp.py``):
- the f = (W-1)/2 / tan(FoV/2) = 159.5 px virtual pinhole camera
  (warp.py:16-19),
- the precomputed homogeneous pixel grid ``grid_uv1`` (warp.py:45-57),
- ``warpSingleImage_H_Mtrx`` = H @ grid -> dehomogenize -> bilinear sample
  with zero padding (warp.py:60-79). The reference normalizes to [-1, 1] only
  to feed ``F.grid_sample(align_corners=True)``, which maps straight back to
  pixel coordinates — we sample in pixel coordinates directly, with
  tap semantics identical to torch's bilinear/zeros/align_corners=True.

A fused Pallas kernel for the same op lives in
``cuahn_vio.ops.pallas.warp_kernel``; this module is the reference XLA
implementation used for correctness tests and as the fallback.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

D2R = math.pi / 180.0


def virtual_cam_k(img_height: int, img_width: int, fov_deg: float = 90.0):
    """Intrinsics of the fixed virtual pinhole camera (warp.py:16-28).

    Returns (K, K_inv) as (3, 3) float32 arrays. For 224x320 @ 90°:
    f = 159.5, c = (159.5, 111.5).
    """
    fx = (img_width - 1) / 2.0 / math.tan(fov_deg * D2R / 2.0)
    fy = fx
    cx = (img_width - 1) / 2.0
    cy = (img_height - 1) / 2.0
    k = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32)
    k_inv = jnp.array(
        [[1.0 / fx, 0.0, -cx / fx], [0.0, 1.0 / fy, -cy / fy], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    return k, k_inv


def pixel_grid_uv1(img_height: int, img_width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid, (3, H*W): rows u (column index), v (row), 1
    (warp.py:45-57)."""
    u = jnp.arange(img_width, dtype=dtype)
    v = jnp.arange(img_height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)  # (H, W) each
    ones = jnp.ones_like(uu)
    return jnp.stack([uu, vv, ones], axis=0).reshape(3, img_height * img_width)


def bilinear_sample(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample ``img`` (H, W) at pixel coords (u, v), zeros outside.

    Exactly torch.nn.functional.grid_sample(mode='bilinear',
    padding_mode='zeros', align_corners=True) semantics: each of the 4 integer
    taps contributes weight * value if in-bounds, else 0.
    """
    h, w = img.shape
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    wx = u - x0
    wy = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi, wgt):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        return jnp.where(inb, img[yi_c, xi_c] * wgt, 0.0)

    return (
        tap(y0i, x0i, (1.0 - wx) * (1.0 - wy))
        + tap(y0i, x0i + 1, wx * (1.0 - wy))
        + tap(y0i + 1, x0i, (1.0 - wx) * wy)
        + tap(y0i + 1, x0i + 1, wx * wy)
    )


@partial(jax.jit, static_argnames=())
def homography_warp(img: jnp.ndarray, h_uv: jnp.ndarray) -> jnp.ndarray:
    """Warp ``img`` (H, W) by pixel-frame homography ``h_uv`` (3, 3).

    Output pixel (u, v) samples img at H @ [u, v, 1] dehomogenized
    (warpSingleImage_H_Mtrx, warp.py:60-79). Zeros outside the image.
    """
    hgt, wid = img.shape
    grid = pixel_grid_uv1(hgt, wid, dtype=img.dtype)  # (3, H*W)
    # full f32: a bf16 H @ grid matmul would be ~1 px of coordinate error
    uvz = jnp.matmul(
        h_uv.astype(img.dtype), grid, precision=jax.lax.Precision.HIGHEST
    )  # (3, H*W)
    z = uvz[2]
    u = (uvz[0] / z).reshape(hgt, wid)
    v = (uvz[1] / z).reshape(hgt, wid)
    return bilinear_sample(img, u, v)


def homography_warp_mm(img: jnp.ndarray, h_uv: jnp.ndarray) -> jnp.ndarray:
    """TPU-fast homography warp: bilinear sampling as MXU matmuls.

    Identical semantics to ``homography_warp`` (torch grid_sample bilinear /
    zeros / align_corners=True), but instead of per-pixel gathers — which
    XLA serializes into scalar loads on TPU — the bilinear kernel is written
    as separable hat-function weights and contracted on the MXU:

        out[p] = Σ_s Σ_t relu(1-|sv_p - s|) · relu(1-|su_p - t|) · img[s, t]
               = Wv[p, :] @ img @ Wu[p, :]

    Wv (P, H) and Wu (P, W) have ≤2 nonzeros per row; the dense contraction
    "wastes" FLOPs (≈10 GFLOP at 224x320) but the MXU does it in ~0.1 ms —
    an order of magnitude faster than the gather path. Out-of-image taps get
    zero weight automatically (hat support), reproducing zeros padding.
    """
    hgt, wid = img.shape
    dtype = img.dtype
    grid = pixel_grid_uv1(hgt, wid, dtype=dtype)
    uvz = jnp.matmul(
        h_uv.astype(dtype), grid, precision=jax.lax.Precision.HIGHEST
    )
    z = uvz[2]
    su = jnp.clip(uvz[0] / z, -1e4, 1e4)  # (P,)
    sv = jnp.clip(uvz[1] / z, -1e4, 1e4)

    s_idx = jnp.arange(hgt, dtype=dtype)
    t_idx = jnp.arange(wid, dtype=dtype)
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(sv[:, None] - s_idx[None, :]))  # (P, H)
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(su[:, None] - t_idx[None, :]))  # (P, W)

    m = jnp.matmul(wv, img, precision=jax.lax.Precision.HIGHEST)  # (P, W)
    out = jnp.sum(m * wu, axis=-1)
    return out.reshape(hgt, wid)


# 'auto': pallas on TPU, mm elsewhere. 'mm' forces the XLA formulation —
# the right choice under heavy vmap batching (training), where XLA fuses
# the batched matmuls better than a vmapped pallas_call grid.
WARP_IMPL = "auto"


def homography_warp_auto(img: jnp.ndarray, h_uv: jnp.ndarray) -> jnp.ndarray:
    """Backend dispatch: the fused Pallas kernel on TPU (weights never
    leave VMEM), the XLA matmul formulation elsewhere. The branch resolves
    at trace time, so each backend jit-caches its own lowering."""
    if WARP_IMPL == "auto" and jax.default_backend() == "tpu":
        from cuahn_vio.ops.pallas.warp_kernel import warp_pallas_u8

        # every image in the pipeline is a /255-normalized uint8 frame
        # (HomographyNet.cpp:139-146; the trainer quantizes to match).
        # warp_pallas_u8 carries a custom_vmap rule, so batched callers
        # (vmapped vio_step / training loss) lower onto the natively
        # batched kernel instead of pallas's sequential auto-batching.
        return warp_pallas_u8(img, h_uv)
    return homography_warp_mm(img, h_uv)
