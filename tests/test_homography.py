"""DLT solve + covariance transfer vs torch reference implementations.

The torch functions here re-state the reference's DLT_solve /
transfer_mean_var_single (trace_pytorch_model/model_to_trace.py:18-61) for
parity checking only; torch never appears in the framework itself.
"""

import numpy as np
import jax.numpy as jnp
import torch

from cuahn_vio.ops import corner_points, dlt_solve, transfer_mean_var, block_diag_cov8


def torch_dlt(src, dst):
    """DLT_solve (model_to_trace.py:42-61), batch size 1."""
    src_ps = torch.tensor(src, dtype=torch.float64).unsqueeze(0)
    dst_p = torch.tensor(dst, dtype=torch.float64).unsqueeze(0)
    bs = 1
    ones = torch.ones_like(src_ps)[:, :, 0:1]
    xy1 = torch.cat((src_ps, ones), 2)
    zeros = torch.zeros_like(xy1)
    xyu, xyd = torch.cat((xy1, zeros), 2), torch.cat((zeros, xy1), 2)
    m1 = torch.cat((xyu, xyd), 2).reshape(bs, -1, 6)
    m2 = torch.matmul(dst_p.reshape(-1, 2, 1), src_ps.reshape(-1, 1, 2)).reshape(
        bs, -1, 2
    )
    a = torch.cat((m1, -m2), 2)
    b = dst_p.reshape(bs, -1, 1)
    h8 = torch.matmul(torch.inverse(a), b).reshape(bs, 8)
    h = torch.cat((h8, ones[:, 0, :]), 1).reshape(bs, 3, 3)
    return h[0].numpy()


def test_corner_points():
    c = np.asarray(corner_points(224, 320))
    np.testing.assert_allclose(
        c, [[0, 0], [0, 223], [319, 223], [319, 0]], atol=0
    )


def test_dlt_matches_torch(rng):
    src = np.asarray(corner_points(224, 320), dtype=np.float64)
    for _ in range(5):
        dst = src + rng.normal(size=(4, 2)) * 20
        ours = np.asarray(dlt_solve(jnp.array(src), jnp.array(dst)))
        ref = torch_dlt(src, dst)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_dlt_maps_corners(rng):
    src = np.asarray(corner_points(224, 320), dtype=np.float64)
    dst = src + rng.normal(size=(4, 2)) * 15
    h = np.asarray(dlt_solve(jnp.array(src), jnp.array(dst)), dtype=np.float64)
    uv1 = np.concatenate([src, np.ones((4, 1))], axis=1)
    mapped = (h @ uv1.T).T
    mapped = mapped[:, :2] / mapped[:, 2:3]
    np.testing.assert_allclose(mapped, dst, atol=1e-2)


def test_dlt_identity():
    src = corner_points(224, 320)
    h = np.asarray(dlt_solve(src, src))
    np.testing.assert_allclose(h, np.eye(3), atol=1e-4)


def torch_transfer(var, h, warped_4pt):
    """transfer_mean_var_single (model_to_trace.py:18-38), batch size 1."""
    var_t = torch.tensor(var, dtype=torch.float64).unsqueeze(0)  # (1, 4, 2)
    h_t = torch.tensor(h, dtype=torch.float64).unsqueeze(0)  # (1, 3, 3)
    w_t = torch.tensor(warped_4pt, dtype=torch.float64).unsqueeze(0)  # (1, 4, 2)

    uv1 = torch.transpose(
        torch.cat((w_t, torch.ones_like(w_t)[:, :, 0:1]), dim=2), 1, 2
    )
    orig = torch.bmm(h_t, uv1)
    scale = orig[:, 2:3, :]
    orig = orig / scale
    scale_b = scale[0, 0, :]
    h_b = h_t[0]
    covs = []
    for i in range(4):
        hs = h_b / scale_b[i]
        vm = torch.diag(
            torch.cat((var_t[0, i, :], torch.zeros_like(scale_b[i]).unsqueeze(0)))
        )
        t = torch.mm(torch.mm(hs, vm), hs.t())
        covs.append(t[0:2, 0:2].unsqueeze(0))
    return orig[0].numpy(), torch.cat(covs, 0).numpy()


def test_transfer_mean_var_matches_torch(rng):
    src = np.asarray(corner_points(224, 320), dtype=np.float64)
    dst = src + rng.normal(size=(4, 2)) * 10
    h = torch_dlt(src, dst)
    var = np.abs(rng.normal(size=(4, 2))) * 4
    warped = src + rng.normal(size=(4, 2)) * 3

    pts, cov = transfer_mean_var(jnp.array(var), jnp.array(h), jnp.array(warped))
    ref_orig, ref_cov = torch_transfer(var, h, warped)
    np.testing.assert_allclose(np.asarray(pts), ref_orig[:2].T, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov), ref_cov, rtol=1e-3, atol=1e-4)


def test_block_diag_cov8(rng):
    c = rng.normal(size=(4, 2, 2))
    out = np.asarray(block_diag_cov8(jnp.array(c, dtype=jnp.float32)))
    for i in range(4):
        np.testing.assert_allclose(
            out[2 * i : 2 * i + 2, 2 * i : 2 * i + 2], c[i], rtol=1e-6
        )
    assert np.count_nonzero(out) <= 16
