"""Real-photo ground-texture bank for the synthetic renderer.

The reference validates on real UZH-FPV camera frames
(cuahn_ros/cuahn/src/core/VioManager.cpp:183-188 feeds real undistorted
imagery); the rosbags are not in this snapshot, so round 1 trained and
evaluated on a smooth sum-of-sinusoids procedural texture — imagery far
easier than reality. This module closes most of that gap with a bank of
REAL photographs and game-art textures harvested from packages already
installed in the image (matplotlib sample data, pygame example/doc photos,
labmaze wall/floor textures), plus a few procedural fractal-noise /
pattern textures for extra diversity.

Design:
- ``build_texture_bank()``: host-side, deterministic. Loads every curated
  asset, grayscales, square-crops, resizes to ``TEXTURE_SIZE``², and
  contrast-normalizes. Cached per-process and in /tmp.
- train/held-out split: every ``HELDOUT_EVERY``-th texture (by bank index)
  is reserved for evaluation; the trainer never sees it. This is what lets
  the replay benchmark claim generalization to unseen imagery.
- ``sample_plane``: jittable reflect-tiled bilinear lookup — maps world
  (x, y) metres onto the texture through a similarity transform
  (scale/rotation/offset), so one 512² photo tiles the infinite ground
  plane seamlessly (mirror tiling has no seams and no frequency spikes).
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

TEXTURE_SIZE = 512
HELDOUT_EVERY = 7  # bank[i] with i % 7 == 3 is held out from training

_SP = "/opt/venv/lib/python3.12/site-packages"

# Curated on-disk image assets (all shipped with installed packages; real
# photographs and hand-authored game textures — NOT procedural).
_ASSET_GLOBS = [
    f"{_SP}/matplotlib/mpl-data/sample_data/grace_hopper.jpg",
    f"{_SP}/pygame/docs/generated/_images/camera_*.jpg",
    f"{_SP}/pygame/docs/generated/_images/intro_*.jpg",
    f"{_SP}/pygame/examples/data/arraydemo.bmp",
    f"{_SP}/pygame/examples/data/liquid.bmp",
    f"{_SP}/pygame/examples/data/fist.png",
    f"{_SP}/pygame/examples/data/midikeys.png",
    f"{_SP}/labmaze/assets/style_*/wall_*.png",
    f"{_SP}/labmaze/assets/style_*/floor_*.png",
    f"{_SP}/labmaze/assets/style_*/ceiling_*.png",
    f"{_SP}/labmaze/assets/style_*/4tile_*.png",
    f"{_SP}/labmaze/assets/sky_*/ft.png",
    f"{_SP}/labmaze/assets/sky_*/bk.png",
]

# Minimum texture detail for the photometric task to be observable: mean
# |∇I| and std below these make a sample unalignable at every scale.
_MIN_GRAD = 0.0015
_MIN_STD = 0.015


def _candidate_paths() -> list[str]:
    paths: list[str] = []
    for pat in _ASSET_GLOBS:
        paths.extend(sorted(glob.glob(pat)))
    # de-dup, preserve order
    seen, out = set(), []
    for p in paths:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def _load_square_gray(path: str, size: int) -> np.ndarray | None:
    from PIL import Image

    try:
        with Image.open(path) as im:
            im = im.convert("L")
            w, h = im.size
            if min(w, h) < 64:
                return None
            # resize short side to `size`, center-crop square
            s = size / min(w, h)
            im = im.resize(
                (max(size, round(w * s)), max(size, round(h * s))),
                Image.LANCZOS,
            )
            w, h = im.size
            left, top = (w - size) // 2, (h - size) // 2
            im = im.crop((left, top, left + size, top + size))
            return np.asarray(im, np.float32) / 255.0
    except Exception:
        return None


def _contrast_normalize(img: np.ndarray) -> np.ndarray:
    lo, hi = np.percentile(img, [2.0, 98.0])
    if hi - lo < 1e-3:
        return img
    return np.clip(0.05 + 0.90 * (img - lo) / (hi - lo), 0.0, 1.0)


def _fractal_noise(rng: np.random.Generator, size: int, octaves: int = 5) -> np.ndarray:
    """Multi-octave value noise: bilinear-upsampled random grids."""
    out = np.zeros((size, size), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        n = 4 << o  # 4, 8, 16, ...
        grid = rng.standard_normal((n, n)).astype(np.float32)
        # periodic bilinear upsample to size x size
        idx = np.arange(size, dtype=np.float32) * n / size
        i0 = np.floor(idx).astype(int) % n
        i1 = (i0 + 1) % n
        f = (idx - np.floor(idx)).astype(np.float32)
        rows = grid[i0][:, i1] * f[None, :] + grid[i0][:, i0] * (1 - f[None, :])
        rows1 = grid[i1][:, i1] * f[None, :] + grid[i1][:, i0] * (1 - f[None, :])
        up = rows * (1 - f[:, None]) + rows1 * f[:, None]
        out += amp * up
        total += amp
        amp *= 0.55
    out /= total
    return _contrast_normalize(out)


def _procedural_extras(size: int) -> list[np.ndarray]:
    """A handful of deterministic procedural textures for diversity."""
    rng = np.random.default_rng(1234)
    tex = [_fractal_noise(rng, size) for _ in range(8)]
    # checkerboard + noise (calibration-pattern-like ground)
    yy, xx = np.mgrid[0:size, 0:size]
    for cells in (8, 24):
        cb = (((xx * cells // size) + (yy * cells // size)) % 2).astype(np.float32)
        cb = 0.15 + 0.7 * cb + 0.08 * rng.standard_normal((size, size)).astype(np.float32)
        tex.append(np.clip(cb, 0, 1))
    # radial + stripe interference (parquet-like)
    stripes = 0.5 + 0.25 * np.sin(xx * 40.0 / size) + 0.25 * np.sin(yy * 9.0 / size + np.sin(xx * 6.0 / size))
    tex.append(_contrast_normalize(stripes.astype(np.float32)))
    # voronoi-ish cell pattern (paving stones)
    pts = rng.uniform(0, size, (60, 2)).astype(np.float32)
    d = np.sqrt(
        (xx[..., None] - pts[None, None, :, 0]) ** 2
        + (yy[..., None] - pts[None, None, :, 1]) ** 2
    )
    d.sort(axis=-1)
    cells = np.clip((d[..., 1] - d[..., 0]) / 12.0, 0, 1)  # edge darkening
    tex.append(_contrast_normalize(cells.astype(np.float32)))
    return tex


_BANK_CACHE: np.ndarray | None = None


def build_texture_bank(size: int = TEXTURE_SIZE) -> np.ndarray:
    """(N, size, size) float32 bank in [0, 1]; deterministic given the
    installed packages. ~70 textures: real photos/game art + 12 procedural."""
    imgs: list[np.ndarray] = []
    for p in _candidate_paths():
        img = _load_square_gray(p, size)
        if img is None:
            continue
        gx = np.abs(np.diff(img, axis=1)).mean()
        gy = np.abs(np.diff(img, axis=0)).mean()
        if img.std() < _MIN_STD or (gx + gy) < _MIN_GRAD:
            continue
        imgs.append(_contrast_normalize(img))
    imgs.extend(_procedural_extras(size))
    bank = np.stack(imgs).astype(np.float32)
    # quantize to u8 levels: the sources are 8-bit images anyway, and
    # k/255-valued textures let the TPU sampler use the single-matmul
    # exact_u8 pallas path (ops/pallas/warp_kernel.py)
    return np.round(bank * 255.0) / np.float32(255.0)


def get_texture_bank(size: int = TEXTURE_SIZE) -> np.ndarray:
    """Process-cached + /tmp-cached bank (PIL decode of ~70 images is a few
    seconds; the npz reload is instant)."""
    global _BANK_CACHE
    if _BANK_CACHE is not None and _BANK_CACHE.shape[1] == size:
        return _BANK_CACHE
    cache = f"/tmp/cuahn_texture_bank_v2_{size}.npz"
    if os.path.exists(cache):
        try:
            _BANK_CACHE = np.load(cache)["bank"]
            return _BANK_CACHE
        except Exception:
            pass
    _BANK_CACHE = build_texture_bank(size)
    try:
        np.savez_compressed(cache + ".tmp.npz", bank=_BANK_CACHE)
        os.replace(cache + ".tmp.npz", cache)
    except Exception:
        pass
    return _BANK_CACHE


def heldout_mask(n: int) -> np.ndarray:
    """(n,) bool — True for evaluation-only textures the trainer never sees."""
    return (np.arange(n) % HELDOUT_EVERY) == 3


def train_indices(n: int) -> np.ndarray:
    return np.nonzero(~heldout_mask(n))[0].astype(np.int32)


def heldout_indices(n: int) -> np.ndarray:
    return np.nonzero(heldout_mask(n))[0].astype(np.int32)


def random_tex_params(
    key: jax.Array,
    scale_range: tuple[float, float] = (1.5, 10.0),
) -> jnp.ndarray:
    """(5,) [scale_m, cos, sin, off_u, off_v]: similarity transform from
    world metres to texture tiles. scale is log-uniform (the same photo as
    fine gravel or as large floor slabs)."""
    k1, k2, k3 = jax.random.split(key, 3)
    log_s = jax.random.uniform(
        k1, minval=jnp.log(scale_range[0]), maxval=jnp.log(scale_range[1])
    )
    th = jax.random.uniform(k2, minval=0.0, maxval=2 * jnp.pi)
    off = jax.random.uniform(k3, (2,), minval=0.0, maxval=2.0)
    return jnp.array(
        [jnp.exp(log_s), jnp.cos(th), jnp.sin(th), off[0], off[1]]
    )


def default_tex_params(scale_m: float = 4.0) -> jnp.ndarray:
    return jnp.array([scale_m, 1.0, 0.0, 0.0, 0.0], jnp.float32)


# texture-sampling implementation: "gather" (per-pixel XLA gather),
# "pallas" (gather-free one-hot-matmul kernel — ~8x faster on TPU, where
# XLA serializes gathers), or "auto" (pallas on TPU backends, gather
# elsewhere). The two paths agree to f32 rounding for u8-quantized banks.
SAMPLE_IMPL = "auto"


def _resolved_impl() -> str:
    if SAMPLE_IMPL != "auto":
        return SAMPLE_IMPL
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "gather"


def sample_plane(texture: jnp.ndarray, xy: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Reflect-tiled bilinear texture lookup at world points (jittable).

    Args:
        texture: (T, T) float32 in [0, 1] at u8 levels (k/255).
        xy: (..., 2) world-plane coordinates in metres.
        params: (5,) [scale_m, cos, sin, off_u, off_v] — one texture period
            spans ``scale_m`` metres, rotated and offset.
    Returns:
        (...,) sampled intensities.
    """
    t = texture.shape[0]
    scale, c, s, ou, ov = params[0], params[1], params[2], params[3], params[4]
    u = (c * xy[..., 0] - s * xy[..., 1]) / scale + ou
    v = (s * xy[..., 0] + c * xy[..., 1]) / scale + ov
    # mirror tiling: continuous triangular wave with period 2 -> [0, 1]
    u = 1.0 - jnp.abs(1.0 - jnp.mod(u, 2.0))
    v = 1.0 - jnp.abs(1.0 - jnp.mod(v, 2.0))
    x = u * (t - 1)
    y = v * (t - 1)
    if _resolved_impl() == "pallas":
        from cuahn_vio.ops.pallas.warp_kernel import bilinear_sample_pallas

        out = bilinear_sample_pallas(
            texture, x.reshape(-1), y.reshape(-1), exact_u8=True
        )
        return out.reshape(x.shape)
    x0 = jnp.clip(jnp.floor(x), 0, t - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, t - 2).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    p00 = texture[y0, x0]
    p01 = texture[y0, x0 + 1]
    p10 = texture[y0 + 1, x0]
    p11 = texture[y0 + 1, x0 + 1]
    return (
        p00 * (1 - fx) * (1 - fy)
        + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy
        + p11 * fx * fy
    )
