"""Jittable camera sensor-effect augmentation: the degradations real
UZH-FPV Snapdragon frames carry that a clean ray-cast render does not.

The reference's entire validation runs on real camera frames
(VioManager.cpp:183-188); since the rosbags are not in this image, the
renderer (data/synthetic.py) must *simulate* the sensor instead: motion
blur (handled at render time by multi-tap pose integration — see
``render_frame`` blur taps), and here the photometric chain:

    vignette -> exposure gain/gamma -> defocus blur -> shot+read noise
    -> black-level offset -> clip -> u8 quantization

Everything is pure and traced; severity is drawn per-sample from ``key``
so the trainer sees the full range from clean to harsh, and a held-out
eval sequence can fix one severity for reproducibility.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EffectsConfig:
    """Maximum severities; each sample draws uniformly within these."""

    vignette_max: float = 0.35  # relative corner falloff
    gain_lo: float = 0.6  # exposure gain range (multiplicative)
    gain_hi: float = 1.4
    gain_drift: float = 0.06  # frame-to-frame auto-exposure drift (sigma)
    gamma_lo: float = 0.75
    gamma_hi: float = 1.30
    offset_sigma: float = 0.02  # black-level offset
    read_noise_max: float = 0.02  # additive Gaussian sigma, [0,1] units
    shot_noise_max: float = 0.04  # sqrt(I)-scaled noise coefficient
    defocus_sigma_max: float = 1.2  # px, Gaussian defocus
    clean_prob: float = 0.2  # fraction of samples left fully clean


def vignette_field(height: int, width: int) -> jnp.ndarray:
    """(H, W) normalized squared radius from the image center (1 at the
    farthest corner); multiply by a strength to get the falloff."""
    v, u = jnp.mgrid[0:height, 0:width]
    cu, cv = (width - 1) / 2.0, (height - 1) / 2.0
    r2 = ((u - cu) / cu) ** 2 + ((v - cv) / cv) ** 2
    return (r2 / r2.max()).astype(jnp.float32)


def _gauss_blur(img: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Separable 5-tap Gaussian with traced sigma (sigma ~ 0 => identity)."""
    x = jnp.arange(-2, 3, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    w = jnp.where(sigma < 1e-2, jnp.array([0.0, 0.0, 1.0, 0.0, 0.0]), w / w.sum())
    # horizontal then vertical, edge-replicate padding
    p = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(w[k] * p[:, k : k + img.shape[1]] for k in range(5))
    p = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(w[k] * p[k : k + img.shape[0], :] for k in range(5))
    return img


def draw_params(key: jax.Array, cfg: EffectsConfig) -> jnp.ndarray:
    """(6,) [vignette, gain, gamma, offset, read_sigma, shot_coef];
    a single Bernoulli(clean_prob) zeroes/neutralizes everything."""
    ks = jax.random.split(key, 7)
    vig = jax.random.uniform(ks[0], maxval=cfg.vignette_max)
    gain = jax.random.uniform(ks[1], minval=cfg.gain_lo, maxval=cfg.gain_hi)
    gamma = jax.random.uniform(ks[2], minval=cfg.gamma_lo, maxval=cfg.gamma_hi)
    off = jax.random.normal(ks[3]) * cfg.offset_sigma
    read = jax.random.uniform(ks[4], maxval=cfg.read_noise_max)
    shot = jax.random.uniform(ks[5], maxval=cfg.shot_noise_max)
    clean = jax.random.bernoulli(ks[6], cfg.clean_prob)
    neutral = jnp.array([0.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    drawn = jnp.stack([vig, gain, gamma, off, read, shot])
    return jnp.where(clean, neutral, drawn)


def apply_photometric(
    img: jnp.ndarray,
    key: jax.Array,
    params: jnp.ndarray,
    defocus_sigma: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Apply the photometric chain to one (H, W) float image in [0, 1].

    ``params`` is a (6,) vector from ``draw_params`` (shared across the
    frames of a pair/sequence for lens properties; per-frame noise comes
    from ``key``).
    """
    vig, gain, gamma, off, read, shot = (
        params[0], params[1], params[2], params[3], params[4], params[5],
    )
    img = img * (1.0 - vig * vignette_field(*img.shape))
    img = gain * jnp.power(jnp.clip(img, 1e-4, 1.0), gamma) + off
    img = _gauss_blur(img, jnp.asarray(defocus_sigma, jnp.float32))
    k1, k2 = jax.random.split(key)
    noise = read * jax.random.normal(k1, img.shape) + shot * jnp.sqrt(
        jnp.clip(img, 0.0, 1.0)
    ) * jax.random.normal(k2, img.shape)
    img = img + noise
    return jnp.clip(img, 0.0, 1.0)


def apply_effects_pair(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    key: jax.Array,
    cfg: EffectsConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Degrade a training frame pair: lens/exposure parameters shared (same
    camera, consecutive frames), gain drifts slightly between the frames
    (auto-exposure), noise independent per frame."""
    kp, kd, kg, kn1, kn2, kf = jax.random.split(key, 6)
    params = draw_params(kp, cfg)
    sigma = jax.random.uniform(kd, maxval=cfg.defocus_sigma_max) * (
        params[1] != 1.0
    )  # clean samples skip defocus too
    drift = 1.0 + jax.random.normal(kg) * cfg.gain_drift
    params2 = params.at[1].multiply(jnp.where(params[1] == 1.0, 1.0, drift))
    out1 = apply_photometric(img1, kn1, params, sigma)
    out2 = apply_photometric(img2, kn2, params2, sigma)
    return out1, out2
