"""Texture bank + sensor-effect augmentation (the round-2 imagery-realism
layer): bank construction/split invariants, the jittable plane sampler's
bilinear/mirror-tiling semantics, and the photometric chain's clean-path
identity and determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuahn_vio.data.sensor_effects import (
    EffectsConfig,
    apply_effects_pair,
    apply_photometric,
    draw_params,
)
from cuahn_vio.data.textures import (
    HELDOUT_EVERY,
    default_tex_params,
    get_texture_bank,
    heldout_indices,
    random_tex_params,
    sample_plane,
    train_indices,
)


@pytest.fixture(scope="module")
def bank():
    return get_texture_bank()


def test_bank_shape_and_range(bank):
    assert bank.ndim == 3 and bank.shape[1] == bank.shape[2] == 512
    assert bank.shape[0] >= 20  # enough diversity to mean anything
    assert np.all(np.isfinite(bank))
    assert bank.min() >= 0.0 and bank.max() <= 1.0
    # every texture carries enough detail for photometric alignment
    assert np.all(bank.std(axis=(1, 2)) > 0.01)


def test_bank_deterministic(bank):
    again = get_texture_bank()
    np.testing.assert_array_equal(bank, again)


def test_heldout_split_disjoint_and_complete(bank):
    n = len(bank)
    tr = train_indices(n)
    ho = heldout_indices(n)
    assert len(set(tr) & set(ho)) == 0
    assert sorted(set(tr) | set(ho)) == list(range(n))
    assert len(ho) >= n // (HELDOUT_EVERY + 1)  # split actually reserves some


def test_sample_plane_identity_grid(bank):
    """With scale=1, no rotation/offset, world (u, v) in [0, 1] maps
    linearly onto the texture: exact grid points return exact texels."""
    tex = jnp.asarray(bank[0])
    t = tex.shape[0]
    params = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0])
    ij = np.array([[0, 0], [7, 3], [100, 200], [t - 1, t - 1]])
    xy = jnp.asarray(ij[:, ::-1] / (t - 1.0))  # (x, y) = (col, row)/(t-1)
    got = sample_plane(tex, xy, params)
    want = np.asarray(tex)[ij[:, 0], ij[:, 1]]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_sample_plane_mirror_tiling_continuous(bank):
    """Mirror tiling: the sampled field must be continuous across the
    texture period boundary (no seam at u = 1)."""
    tex = jnp.asarray(bank[0])
    params = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0])
    eps = 1e-4
    xy_lo = jnp.array([[1.0 - eps, 0.3]])
    xy_hi = jnp.array([[1.0 + eps, 0.3]])
    a = float(sample_plane(tex, xy_lo, params)[0])
    b = float(sample_plane(tex, xy_hi, params)[0])
    assert abs(a - b) < 0.01
    # and mirror symmetry: f(1 + d) == f(1 - d)
    xy_m = jnp.array([[1.0 + 0.123, 0.3], [1.0 - 0.123, 0.3]])
    v = np.asarray(sample_plane(tex, xy_m, params))
    np.testing.assert_allclose(v[0], v[1], atol=1e-5)


def test_random_tex_params_ranges():
    for s in range(10):
        p = np.asarray(random_tex_params(jax.random.PRNGKey(s), (1.5, 10.0)))
        assert 1.5 <= p[0] <= 10.0
        np.testing.assert_allclose(p[1] ** 2 + p[2] ** 2, 1.0, atol=1e-5)


def test_photometric_clean_is_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(0.05, 0.95, (32, 48)))
    neutral = jnp.array([0.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    out = apply_photometric(img, jax.random.PRNGKey(0), neutral, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_draw_params_clean_prob_one_is_neutral():
    cfg = EffectsConfig(clean_prob=1.0)
    p = np.asarray(draw_params(jax.random.PRNGKey(3), cfg))
    np.testing.assert_allclose(p, [0.0, 1.0, 1.0, 0.0, 0.0, 0.0])


def test_effects_pair_bounds_and_determinism():
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.uniform(0, 1, (64, 96)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (64, 96)), jnp.float32)
    cfg = EffectsConfig(clean_prob=0.0)
    key = jax.random.PRNGKey(7)
    o1a, o2a = apply_effects_pair(img1, img2, key, cfg)
    o1b, o2b = apply_effects_pair(img1, img2, key, cfg)
    np.testing.assert_array_equal(np.asarray(o1a), np.asarray(o1b))
    np.testing.assert_array_equal(np.asarray(o2a), np.asarray(o2b))
    for o in (o1a, o2a):
        o = np.asarray(o)
        assert np.all(np.isfinite(o)) and o.min() >= 0.0 and o.max() <= 1.0
    # the two frames of a pair share lens params but differ in noise
    assert not np.array_equal(np.asarray(o1a), np.asarray(o2a))


def test_effects_actually_degrade():
    """With clean_prob=0 the chain must measurably change the image (guards
    against a silently-neutral augmentation pipeline)."""
    img = jnp.asarray(np.random.default_rng(2).uniform(0.2, 0.8, (64, 96)))
    cfg = EffectsConfig(clean_prob=0.0)
    diffs = []
    for s in range(8):
        out, _ = apply_effects_pair(img, img, jax.random.PRNGKey(s), cfg)
        diffs.append(float(jnp.abs(out - img).mean()))
    assert max(diffs) > 0.02


def test_sample_plane_pallas_matches_gather():
    """The TPU pallas sampler and the XLA gather path are the same op."""
    import functools

    import cuahn_vio.data.textures as T
    from cuahn_vio.ops.pallas import warp_kernel as WK

    bank = T.get_texture_bank()
    tex = jnp.asarray(bank[5])
    xy = jax.random.uniform(
        jax.random.PRNGKey(0), (23, 31, 2), minval=-9.0, maxval=9.0
    )
    params = T.random_tex_params(jax.random.PRNGKey(1))
    old_impl, old_fn = T.SAMPLE_IMPL, WK.bilinear_sample_pallas
    try:
        T.SAMPLE_IMPL = "gather"
        a = T.sample_plane(tex, xy, params)
        T.SAMPLE_IMPL = "pallas"
        WK.bilinear_sample_pallas = functools.partial(old_fn, interpret=True)
        b = T.sample_plane(tex, xy, params)
    finally:
        T.SAMPLE_IMPL, WK.bilinear_sample_pallas = old_impl, old_fn
    assert float(jnp.max(jnp.abs(a - b))) < 2e-6


def test_bank_is_u8_quantized():
    """k/255-valued banks are what the exact_u8 pallas path requires."""
    k = get_texture_bank() * 255.0
    assert np.max(np.abs(k - np.round(k))) < 1e-4
