"""UAHN network tests: conv-semantics parity vs torch, cascade behavior,
MC-dropout ensemble formula (model_to_trace.py:195-350)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from cuahn_vio.models.uahn import UAHN, ConvTower, init_uahn
from cuahn_vio.ops import corner_points

H, W = 224, 320


def test_conv_tower_matches_torch(rng):
    """Same weights -> same output as torch Conv2d(padding=(k-1)//2) +
    LeakyReLU(0.1) stacks (the reference's conv(), model_to_trace.py:7-15)."""
    specs = [(8, 7, 1), (16, 5, 2), (32, 3, 2)]
    tower = ConvTower(specs)
    x = rng.random((1, 56, 80, 2)).astype(np.float32)
    params = tower.init(jax.random.PRNGKey(0), jnp.array(x))["params"]

    layers = []
    in_ch = 2
    with torch.no_grad():
        for i, (out_ch, k, s) in enumerate(specs):
            conv = torch.nn.Conv2d(in_ch, out_ch, k, stride=s, padding=(k - 1) // 2)
            kern = np.asarray(params[f"conv{i}"]["kernel"])  # (kh, kw, in, out)
            conv.weight.copy_(torch.tensor(kern.transpose(3, 2, 0, 1)))
            conv.bias.copy_(torch.tensor(np.asarray(params[f"conv{i}"]["bias"])))
            layers += [conv, torch.nn.LeakyReLU(0.1)]
            in_ch = out_ch
        t_out = torch.nn.Sequential(*layers)(
            torch.tensor(x.transpose(0, 3, 1, 2))
        ).numpy()

    j_out = np.asarray(tower.apply({"params": params}, jnp.array(x)))
    np.testing.assert_allclose(
        j_out.transpose(0, 3, 1, 2), t_out, atol=2e-5
    )


def test_model_shapes_and_finiteness(rng):
    model, params = init_uahn(jax.random.PRNGKey(0))
    img1 = jnp.array(rng.random((H, W)), jnp.float32)
    img2 = jnp.array(rng.random((H, W)), jnp.float32)
    key = jax.random.PRNGKey(1)

    flow, cov = model.apply(
        {"params": params}, img1, img2, rngs={"dropout": key}
    )
    assert flow.shape == (8,) and cov.shape == (8, 8)
    assert np.all(np.isfinite(np.asarray(flow)))
    c = np.asarray(cov)
    # block-diagonal PSD structure
    assert np.all(np.diag(c) > 0)
    np.testing.assert_allclose(c, c.T, atol=1e-6)

    # prior mode
    prior = jnp.array(rng.normal(size=(4, 2)) * 3, jnp.float32)
    flow_p, cov_p = model.apply(
        {"params": params}, img1, img2, prior, use_prior=True,
        rngs={"dropout": key},
    )
    assert flow_p.shape == (8,)
    # error-map variant
    flow_e, cov_e, err = model.apply(
        {"params": params}, img1, img2, prior, use_prior=True,
        return_error_map=True, rngs={"dropout": key},
    )
    assert err.shape == (H, W)
    np.testing.assert_allclose(np.asarray(flow_e), np.asarray(flow_p), atol=1e-5)


def test_prior_only_path_is_dlt_of_prior(rng):
    """With blocks_to_run=1 the part-1 output is exactly DLT(corners,
    corners+prior) (model_to_trace.py:130-132); zero prior -> identity H."""
    model, params = init_uahn(jax.random.PRNGKey(0), blocks_to_run=1)
    img = jnp.array(rng.random((H, W)), jnp.float32)
    prior = jnp.zeros((4, 2), jnp.float32)
    h = model.apply(
        {"params": params}, img, img, prior, use_prior=True,
        method=lambda m, i1, i2, p, use_prior: m.part1(i1, i2, p, use_prior),
    )
    np.testing.assert_allclose(np.asarray(h), np.eye(3), atol=1e-5)

    from cuahn_vio.ops import dlt_solve

    prior2 = jnp.array(rng.normal(size=(4, 2)) * 10, jnp.float32)
    h2 = model.apply(
        {"params": params}, img, img, prior2, use_prior=True,
        method=lambda m, i1, i2, p, use_prior: m.part1(i1, i2, p, use_prior),
    )
    corners = corner_points(H, W)
    np.testing.assert_allclose(
        np.asarray(h2), np.asarray(dlt_solve(corners, corners + prior2)), atol=1e-6
    )


def test_mc_ensemble_zero_dropout(rng):
    """dropout=0: all 16 members identical -> empirical variance term is 0,
    ensemble var = mean(exp(logvar)) only (model_to_trace.py:274-280)."""
    model = UAHN(dropout_rate=0.0)
    img = jnp.zeros((H, W), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img, img,
    )["params"]
    img1 = jnp.array(rng.random((H, W)), jnp.float32)
    img2 = jnp.array(rng.random((H, W)), jnp.float32)

    warped4, var4 = model.apply(
        {"params": params}, img1, img2, jnp.eye(3),
        method=lambda m, a, b, h: m.last_block(a, b, h),
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert warped4.shape == (4, 2) and var4.shape == (4, 2)
    # logvar ~ N(0, small)*1e-3 -> var close to exp(~0) = 1, and positive
    v = np.asarray(var4)
    assert np.all(v > 0)
    np.testing.assert_allclose(v, 1.0, atol=0.1)


def test_dropout_creates_ensemble_spread(rng):
    model, params = init_uahn(jax.random.PRNGKey(0))
    img1 = jnp.array(rng.random((H, W)), jnp.float32)
    img2 = jnp.array(rng.random((H, W)), jnp.float32)
    f1, _ = model.apply(
        {"params": params}, img1, img2, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    f2, _ = model.apply(
        {"params": params}, img1, img2, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    # different dropout keys -> different (but close) ensemble means
    assert not np.allclose(np.asarray(f1), np.asarray(f2))


def test_param_count_structure():
    """The conv-plane widths and fc dims must match model_to_trace.py:88-89."""
    model, params = init_uahn(jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {jax.tree_util.keystr(k): v.shape for k, v in flat}
    assert names["['fc_block1']['kernel']"] == (5120, 8)
    assert names["['fc_block2']['kernel']"] == (5120, 8)
    assert names["['fc_block3']['kernel']"] == (5120, 8)
    assert names["['head_mean']['fc0']['kernel']"] == (5120, 256)
    assert names["['head_mean']['fc1']['kernel']"] == (256, 8)
    assert names["['head_logvar']['fc1']['kernel']"] == (256, 8)
    assert names["['block4']['conv0']['kernel']"] == (7, 7, 2, 8)
    assert names["['block1']['conv0']['kernel']"] == (7, 7, 2, 128)
