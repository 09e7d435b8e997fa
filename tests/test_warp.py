"""Warp parity vs torch.nn.functional.grid_sample — the exact op the
reference uses (trace_pytorch_model/warp.py:60-79: bilinear, zeros padding,
align_corners=True). Tap semantics must match bit-for-bit in spirit
(SURVEY.md §7 hard part #3)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cuahn_vio.ops import (
    corner_points,
    dlt_solve,
    homography_warp,
    virtual_cam_k,
    bilinear_sample,
)

H, W = 224, 320


def torch_warp(img, h_mtrx):
    """warpSingleImage_H_Mtrx (warp.py:60-79), verbatim."""
    img_t = torch.tensor(img, dtype=torch.float32)[None, None]
    hm = torch.tensor(np.asarray(h_mtrx), dtype=torch.float32)

    u = torch.arange(0, W).view(1, -1).repeat(H, 1).unsqueeze(0).float()
    v = torch.arange(0, H).view(-1, 1).repeat(1, W).unsqueeze(0).float()
    grid_uv = torch.cat((u, v), dim=0)
    grid_uv1 = torch.cat(
        (grid_uv, torch.ones_like(grid_uv[0:1])), dim=0
    ).view([3, H * W])

    uvz = torch.mm(hm, grid_uv1)
    uv1 = uvz / uvz[2, :]
    uv = uv1[0:2, :].view([2, H, W])
    uv = torch.transpose(torch.transpose(uv, 0, 1), 1, 2)  # (H, W, 2)
    factor = torch.FloatTensor([[[2 / (W - 1), 2 / (H - 1)]]])
    grid = (uv * factor - 1).unsqueeze(0)
    out = F.grid_sample(
        img_t, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )
    return out[0, 0].numpy()


def test_identity_warp(rng):
    img = rng.random((H, W)).astype(np.float32)
    out = np.asarray(homography_warp(jnp.array(img), jnp.eye(3)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_warp_matches_grid_sample(rng):
    img = rng.random((H, W)).astype(np.float32)
    src = corner_points(H, W)
    for scale in (2.0, 15.0, 40.0):
        dst = src + jnp.array(rng.normal(size=(4, 2)) * scale, dtype=jnp.float32)
        h_mtrx = dlt_solve(src, dst)
        ours = np.asarray(homography_warp(jnp.array(img), h_mtrx))
        ref = torch_warp(img, h_mtrx)
        np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_out_of_bounds_is_zero(rng):
    img = rng.random((H, W)).astype(np.float32) + 1.0  # strictly positive
    # translate far right: most of output samples outside -> zeros
    h_mtrx = jnp.array(
        [[1.0, 0.0, 1000.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    out = np.asarray(homography_warp(jnp.array(img), h_mtrx))
    assert np.all(out == 0.0)


def test_bilinear_sample_halfpixel(rng):
    img = np.zeros((4, 4), np.float32)
    img[1, 1] = 1.0
    val = bilinear_sample(
        jnp.array(img), jnp.array([[1.5]]), jnp.array([[1.0]])
    )
    np.testing.assert_allclose(np.asarray(val), [[0.5]], atol=1e-6)


def test_virtual_cam_constants():
    k, k_inv = virtual_cam_k(224, 320)
    k = np.asarray(k)
    np.testing.assert_allclose(k[0, 0], 159.5, atol=1e-4)  # warp.py:16, f=159.5
    np.testing.assert_allclose(k[0, 2], 159.5, atol=1e-4)
    np.testing.assert_allclose(k[1, 2], 111.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(k_inv) @ k, np.eye(3), atol=1e-6)
    # the normalized corner constant used by the filter (State.h:110-113)
    np.testing.assert_allclose(111.5 / 159.5, 0.69906, atol=1e-5)


def test_warp_mm_matches_gather(rng):
    """The MXU-matmul warp must be numerically identical to the gather
    formulation (and hence to torch grid_sample)."""
    from cuahn_vio.ops import homography_warp_mm

    img = rng.random((H, W)).astype(np.float32)
    src = corner_points(H, W)
    for scale in (0.0, 5.0, 35.0):
        dst = src + jnp.array(rng.normal(size=(4, 2)) * scale, jnp.float32)
        h_mtrx = dlt_solve(src, dst)
        a = np.asarray(homography_warp(jnp.array(img), h_mtrx))
        b = np.asarray(homography_warp_mm(jnp.array(img), h_mtrx))
        np.testing.assert_allclose(b, a, atol=3e-4)
