"""Fused Pallas TPU kernel: homography warp + bilinear sample.

The hottest non-conv op in the UAHN cascade (model_to_trace.py:124-193 runs
a warp before blocks 2-4; warp.py:60-79 is the reference implementation via
``F.grid_sample``). A gather-based bilinear sample is the single worst op
for TPU — XLA serializes per-pixel gathers — so the production formulation
contracts separable hat-function weights on the MXU
(``ops.warp.homography_warp_mm``):

    out[p] = Wv[p, :] @ img @ Wu[p, :]   (Wv, Wu have <= 2 nonzeros/row)

The XLA version of that materializes Wv (P, H) and the intermediate (P, W)
in HBM — ~100 MB of traffic per 224x320 warp, making it bandwidth-bound.
This kernel fuses weight construction + both contractions in VMEM: per grid
step it builds the hat weights for a tile of output pixels in scratch,
runs the (tile, H) @ (H, W) contraction on the MXU, multiply-reduces
against the u-weights on the VPU, and only the (tile,) result ever leaves
the chip. HBM traffic drops to img + coords + out (< 1 MB), so the op is
pure MXU compute.

Layout (two formulations, same math):
- single-image path (`_sample_flat`): pixels flattened to a (P, 1)
  column — pixel axis in SUBLANES, hat weights broadcast in lanes.
- batched path (`_sample_lanes_batched`): pixel axis in LANES end-to-end
  — coords arrive as (B, 1, P) in XLA's natural lane-major layout, the
  one-hot row selectors are (H, T) and the vertical interpolation is an
  lhsᵀ MXU contraction over the sublane axis. The sublane-major batched
  formulation needed two image-sized relayout copies per call (XLA
  stores the einsum coords lane-major), which was ~1/3 of the ×32
  vio_step; switching the batched kernel to lane-major took the bench
  from 857 to 1840 frames/s/chip (round 4, results/round4/roofline.md).
Any H*W works (padded up to a tile multiple).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuahn_vio.ops.warp import pixel_grid_uv1

# output pixels per grid step
_TILE_PIX = 2048

# batched-sampler selection: "full" (round 4 full-height contraction) or
# "rowskip" (round 5, per-tile row-block skipping — _sample_lanes_rowskip).
# Round-5 A/B on the v5e (chained 64-image warp microbench): full 10.6 ms,
# rowskip 10.8 ms — HALVING the MXU contraction work changes nothing, so
# the kernel is VPU-bound (dense hat-weight build + multiply-reduce, which
# this formulation cannot avoid), i.e. at its formulation's latency floor.
# "full" stays the default (same speed, simpler); rowskip is kept as the
# parity-tested negative result and the starting point if a future
# per-lane-gather primitive changes the VPU economics.
BATCH_SAMPLER = "full"


def _warp_compute(sv, su, hi, lo):
    """One tile: (T, 1) output pixels against the full (H, W) image.

    Precision scheme: a single f32 hat-weight matmul would need the slow
    multi-pass MXU mode (default single-pass truncates weights to bf16 ->
    ~4e-3 intensity error). Instead the vertical interpolation is written as
    two ONE-HOT row-selection matmuls — 0/1 entries are exact in bf16 —
    blended with the f32 fractional weight on the VPU; the image itself is
    hi/lo-split into two bf16 operands (f32 accumulate), so each selected
    row is exact to ~1.5e-5. Four single-pass bf16 matmuls beat one
    6-pass f32 HIGHEST matmul and lose no grid_sample parity.

    Args are ARRAYS (already loaded from refs): sv/su (T, 1) f32 source
    row/col coords, hi (H, W) bf16, lo (H, W) bf16 or None (exact_u8).
    Returns (T, 1) f32.
    """
    h, w = hi.shape
    p = sv.shape[0]

    y0 = jnp.floor(sv)
    fy = sv - y0  # (p, 1) f32 fractional row weight

    rows = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1).astype(jnp.float32)
    oh0 = (rows == y0).astype(jnp.bfloat16)  # (p, H) exact one-hot
    oh1 = (rows == y0 + 1.0).astype(jnp.bfloat16)

    if lo is None:  # exact_u8 path: hi alone is exact

        def sel(oh):
            return jnp.dot(oh, hi, preferred_element_type=jnp.float32)

    else:

        def sel(oh):  # image row gather as MXU matmul, f32 accumulate
            return jnp.dot(oh, hi, preferred_element_type=jnp.float32) + jnp.dot(
                oh, lo, preferred_element_type=jnp.float32
            )

    m = (1.0 - fy) * sel(oh0) + fy * sel(oh1)  # (p, W) f32

    cols = jax.lax.broadcasted_iota(jnp.int32, (p, w), 1).astype(jnp.float32)
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(su - cols))  # (p, W) f32, VPU

    return jnp.sum(m * wu, axis=-1, keepdims=True)


def _warp_kernel(sv_ref, su_ref, hi_ref, lo_ref, out_ref):
    out_ref[:] = _warp_compute(
        sv_ref[:], su_ref[:], hi_ref[:],
        None if lo_ref is None else lo_ref[:],
    )


def _sample_flat(
    img: jnp.ndarray,
    su: jnp.ndarray,
    sv: jnp.ndarray,
    interpret: bool,
    exact_u8: bool,
) -> jnp.ndarray:
    """Bilinear-sample ``img`` (H, W) at flat f32 coords ``su``/``sv`` (P,).

    The gather-free MXU formulation shared by ``homography_warp_pallas``
    and ``bilinear_sample_pallas``: out-of-image taps get zero hat weight
    (grid_sample zeros padding); in-range coords give exact bilinear
    interpolation. Returns (P,) f32.
    """
    hgt, wid = img.shape
    p = su.shape[0]
    tile = min(_TILE_PIX, ((p + 7) // 8) * 8)
    n_pad = ((p + tile - 1) // tile) * tile

    img = img.astype(jnp.float32)
    su = jnp.clip(su, -1e4, 1e4)
    sv = jnp.clip(sv, -1e4, 1e4)
    if n_pad != p:
        su = jnp.pad(su, (0, n_pad - p), constant_values=-1e4)
        sv = jnp.pad(sv, (0, n_pad - p), constant_values=-1e4)
    su = su.reshape(n_pad, 1)
    sv = sv.reshape(n_pad, 1)

    coord_spec = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((hgt, wid), lambda i: (0, 0), memory_space=pltpu.VMEM)
    common = dict(
        grid=(n_pad // tile,),
        out_specs=pl.BlockSpec(
            (tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=interpret,
    )
    if exact_u8:
        img255 = (img * 255.0).astype(jnp.bfloat16)  # integers <= 255: exact
        out = pl.pallas_call(
            lambda sv_r, su_r, hi_r, out_r: _warp_kernel(
                sv_r, su_r, hi_r, None, out_r
            ),
            in_specs=[coord_spec, coord_spec, img_spec],
            **common,
        )(sv, su, img255)
        out = out * (1.0 / 255.0)
    else:
        img_hi = img.astype(jnp.bfloat16)
        img_lo = (img - img_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = pl.pallas_call(
            _warp_kernel,
            in_specs=[coord_spec, coord_spec, img_spec, img_spec],
            **common,
        )(sv, su, img_hi, img_lo)
    return out[:p, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "exact_u8"))
def bilinear_sample_pallas(
    img: jnp.ndarray,
    su: jnp.ndarray,
    sv: jnp.ndarray,
    interpret: bool = False,
    exact_u8: bool = False,
) -> jnp.ndarray:
    """Bilinear sample of ``img`` (H, W) at arbitrary f32 pixel coords.

    ``su``/``sv`` are flat (P,) column/row coordinates. Used by the
    synthetic-data texture sampler (data/textures.py sample_plane), whose
    per-pixel XLA gather formulation is ~8x slower on TPU. Semantics match
    the gather version for in-range coords; off-image taps contribute 0.
    """
    return _sample_flat(img, su, sv, interpret, exact_u8)


def _warp_compute_lanes(sv, su, hi, lo):
    """Transposed tile: pixel axis in LANES end-to-end.

    The sublane-major formulation (`_warp_compute`) needs its (T, 1)
    coords relayouted from XLA's natural lane-major storage — two
    image-sized "data formatting" copies per batched call, measured at
    ~1/3 of the ×32 vio_step (results/round4/roofline.md). Here the tile
    is (1, T): one-hot row selectors are (H, T), the vertical
    interpolation contracts the image against them on the MXU with the
    contraction on the SUBLANE axis of both operands (lhsᵀ matmul), and
    the horizontal hat reduction runs over sublanes on the VPU. Coords,
    image and output all keep XLA's natural lane-major layout, so the
    relayout copies vanish.

    Args: sv/su (1, T) f32, hi/lo (H, W) bf16 (lo None for exact_u8).
    Off-image and padded-tail pixels get zero hat weight on both axes, so
    they come out 0 with no explicit mask. Returns (1, T) f32.
    """
    h, w = hi.shape
    t = sv.shape[1]

    y0 = jnp.floor(sv)
    fy = sv - y0  # (1, T)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, t), 0).astype(jnp.float32)
    oh0 = (rows == y0).astype(jnp.bfloat16)  # (H, T) exact one-hot
    oh1 = (rows == y0 + 1.0).astype(jnp.bfloat16)

    dn = (((0,), (0,)), ((), ()))  # contract sublane axes: (H,W)x(H,T)->(W,T)

    if lo is None:

        def sel(oh):
            return jax.lax.dot_general(
                hi, oh, dn, preferred_element_type=jnp.float32
            )

    else:

        def sel(oh):
            return jax.lax.dot_general(
                hi, oh, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                lo, oh, dn, preferred_element_type=jnp.float32
            )

    m = (1.0 - fy) * sel(oh0) + fy * sel(oh1)  # (W, T) f32

    cols = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0).astype(jnp.float32)
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(su - cols))  # (W, T)

    return jnp.sum(m * wu, axis=0, keepdims=True)


def _warp_block_partial(sv, su, hi_blk, lo_blk, row0):
    """Partial lane-major vertical interpolation against ONE row block.

    Every bilinear tap row y0 (and y0+1) lives in exactly one 128-row
    block, so summing the per-block partials reproduces the full-height
    intermediate BIT-EXACTLY (the other blocks' one-hots match nothing
    and contribute exact zeros); the horizontal hat reduce runs once on
    the accumulated intermediate so the reduction order is identical too.

    Args: sv (1, T) f32; hi_blk/lo_blk (R, W) bf16 (lo None for
    exact_u8); row0 scalar first global row of the block.
    Returns the partial vertical interpolation m (W, T) f32.
    """
    r = hi_blk.shape[0]
    t = sv.shape[1]
    y0 = jnp.floor(sv)
    fy = sv - y0

    rows = jax.lax.broadcasted_iota(jnp.int32, (r, t), 0).astype(
        jnp.float32
    ) + row0.astype(jnp.float32)
    oh0 = (rows == y0).astype(jnp.bfloat16)  # (R, T) exact one-hot
    oh1 = (rows == y0 + 1.0).astype(jnp.bfloat16)

    dn = (((0,), (0,)), ((), ()))  # contract sublanes: (R,W)x(R,T)->(W,T)

    if lo_blk is None:

        def sel(oh):
            return jax.lax.dot_general(
                hi_blk, oh, dn, preferred_element_type=jnp.float32
            )

    else:

        def sel(oh):
            return jax.lax.dot_general(
                hi_blk, oh, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                lo_blk, oh, dn, preferred_element_type=jnp.float32
            )

    return (1.0 - fy) * sel(oh0) + fy * sel(oh1)  # (W, T) f32


def _sample_lanes_rowskip(
    imgs: jnp.ndarray,  # (B, H, W) f32
    su: jnp.ndarray,  # (B, P)
    sv: jnp.ndarray,  # (B, P)
    interpret: bool,
    exact_u8: bool,
    row_block: int = 128,
) -> jnp.ndarray:
    """Lane-major batched sampler with per-tile ROW-BLOCK SKIPPING.

    The full-height kernel (`_sample_lanes_batched`) pays an MXU
    contraction over all H=224 image rows for every output tile, although
    a tile of 1024 consecutive output pixels (~3.2 rows) touches only a
    narrow band of source rows for all but extreme-roll homographies
    (replay p90 inter-frame roll 3.5 deg -> spans of a few rows; >11 deg
    on 2.4% of frames). Here the image is padded to a multiple of 128
    rows and the contraction is split into 128-row blocks; per (batch,
    tile) the host precomputes the touched row range [rmin, rmax]
    (scalar-prefetched) and the kernel executes only intersecting blocks
    under ``pl.when`` — typically 1 of 2, i.e. ~0.57x the MXU work, with
    the rare straddling/extreme tile paying for exactly the blocks it
    needs. Bit-exact vs the full-height kernel (each tap row lives in
    exactly one block)."""
    b, hgt, wid = imgs.shape
    p = su.shape[1]
    tile = min(1024, ((p + 127) // 128) * 128)
    n_pad = ((p + tile - 1) // tile) * tile
    n_tiles = n_pad // tile
    h_pad = ((hgt + row_block - 1) // row_block) * row_block
    n_blocks = h_pad // row_block

    imgs = imgs.astype(jnp.float32)
    if h_pad != hgt:
        imgs = jnp.pad(imgs, ((0, 0), (0, h_pad - hgt), (0, 0)))
    su = jnp.clip(su, -1e4, 1e4)
    sv = jnp.clip(sv, -1e4, 1e4)
    if n_pad != p:
        pad = ((0, 0), (0, n_pad - p))
        su = jnp.pad(su, pad, constant_values=-1e4)
        sv = jnp.pad(sv, pad, constant_values=-1e4)

    # per-tile touched row range over VALID taps (vertical hat weight
    # nonzero only for sv in (-1, hgt)); invalid-only tiles get an empty
    # range so every block is skipped and the tile stays 0
    y0 = jnp.floor(sv)
    valid = (sv > -1.0) & (sv < hgt)
    y0t = y0.reshape(b, n_tiles, tile)
    vt = valid.reshape(b, n_tiles, tile)
    big = jnp.float32(1e9)
    rmin = jnp.min(jnp.where(vt, y0t, big), axis=2).astype(jnp.int32)
    rmax = jnp.max(jnp.where(vt, y0t + 1.0, -big), axis=2).astype(jnp.int32)

    su = su.reshape(b, 1, n_pad)
    sv = sv.reshape(b, 1, n_pad)

    coord_spec = pl.BlockSpec(
        (1, 1, tile), lambda bi, i, rmn, rmx: (bi, 0, i),
        memory_space=pltpu.VMEM,
    )
    img_spec = pl.BlockSpec(
        (1, h_pad, wid), lambda bi, i, rmn, rmx: (bi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, tile), lambda bi, i, rmn, rmx: (bi, 0, i),
        memory_space=pltpu.VMEM,
    )

    def make_kern(n_imgs):
        def kern(rmn_ref, rmx_ref, sv_r, su_r, *img_out_scratch):
            img_refs = img_out_scratch[:n_imgs]
            out_r = img_out_scratch[n_imgs]
            m_acc = img_out_scratch[n_imgs + 1]  # (W, T) f32 VMEM scratch
            bi = pl.program_id(0)
            ti = pl.program_id(1)
            svv, suu = sv_r[0], su_r[0]
            t = suu.shape[1]
            m_acc[:] = jnp.zeros((wid, t), jnp.float32)
            for blk in range(n_blocks):
                lo_r = blk * row_block
                active = jnp.logical_and(
                    rmn_ref[bi, ti] <= lo_r + row_block - 1,
                    rmx_ref[bi, ti] >= lo_r,
                )

                @pl.when(active)
                def _(blk=blk, lo_r=lo_r):
                    hi_blk = img_refs[0][0][lo_r : lo_r + row_block, :]
                    lo_blk = (
                        img_refs[1][0][lo_r : lo_r + row_block, :]
                        if n_imgs == 2
                        else None
                    )
                    m_acc[:] += _warp_block_partial(
                        svv, suu, hi_blk, lo_blk, jnp.int32(lo_r)
                    )

            cols = jax.lax.broadcasted_iota(
                jnp.int32, (wid, t), 0
            ).astype(jnp.float32)
            wu = jnp.maximum(0.0, 1.0 - jnp.abs(suu - cols))  # (W, T)
            out_r[0] = jnp.sum(m_acc[:] * wu, axis=0, keepdims=True)

        return kern

    def call(kern, n_imgs, *img_ops):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_tiles),
            in_specs=[coord_spec, coord_spec] + [img_spec] * n_imgs,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((wid, tile), jnp.float32)],
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
            interpret=interpret,
        )(rmin, rmax, sv, su, *img_ops)

    if exact_u8:
        img255 = (imgs * 255.0).astype(jnp.bfloat16)
        out = call(make_kern(1), 1, img255) * (1.0 / 255.0)
    else:
        img_hi = imgs.astype(jnp.bfloat16)
        img_lo = (imgs - img_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = call(make_kern(2), 2, img_hi, img_lo)
    return out[:, 0, :p]


def _sample_lanes_batched(
    imgs: jnp.ndarray,  # (B, H, W) f32
    su: jnp.ndarray,  # (B, P)
    sv: jnp.ndarray,  # (B, P)
    interpret: bool,
    exact_u8: bool,
) -> jnp.ndarray:
    """Batched lane-major sampler, full-height contraction (round 4; see
    `_warp_compute_lanes`). Kept as the reference formulation the row-skip
    kernel is parity-tested against."""
    b, hgt, wid = imgs.shape
    p = su.shape[1]
    tile = min(1024, ((p + 127) // 128) * 128)
    n_pad = ((p + tile - 1) // tile) * tile

    imgs = imgs.astype(jnp.float32)
    su = jnp.clip(su, -1e4, 1e4)
    sv = jnp.clip(sv, -1e4, 1e4)
    if n_pad != p:
        pad = ((0, 0), (0, n_pad - p))
        su = jnp.pad(su, pad, constant_values=-1e4)
        sv = jnp.pad(sv, pad, constant_values=-1e4)
    su = su.reshape(b, 1, n_pad)
    sv = sv.reshape(b, 1, n_pad)

    coord_spec = pl.BlockSpec(
        (1, 1, tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM
    )
    img_spec = pl.BlockSpec(
        (1, hgt, wid), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    common = dict(
        grid=(b, n_pad // tile),
        out_specs=pl.BlockSpec(
            (1, 1, tile), lambda bi, i: (bi, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        interpret=interpret,
    )

    def kern3(sv_r, su_r, hi_r, out_r):
        out_r[0] = _warp_compute_lanes(sv_r[0], su_r[0], hi_r[0], None)

    def kern4(sv_r, su_r, hi_r, lo_r, out_r):
        out_r[0] = _warp_compute_lanes(sv_r[0], su_r[0], hi_r[0], lo_r[0])

    if exact_u8:
        img255 = (imgs * 255.0).astype(jnp.bfloat16)
        out = pl.pallas_call(
            kern3, in_specs=[coord_spec, coord_spec, img_spec], **common
        )(sv, su, img255)
        out = out * (1.0 / 255.0)
    else:
        img_hi = imgs.astype(jnp.bfloat16)
        img_lo = (imgs - img_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = pl.pallas_call(
            kern4,
            in_specs=[coord_spec, coord_spec, img_spec, img_spec],
            **common,
        )(sv, su, img_hi, img_lo)
    return out[:, 0, :p]


@functools.partial(jax.jit, static_argnames=("interpret", "exact_u8"))
def homography_warp_pallas_batch(
    imgs: jnp.ndarray,  # (B, H, W)
    h_uv: jnp.ndarray,  # (B, 3, 3)
    interpret: bool = False,
    exact_u8: bool = False,
) -> jnp.ndarray:
    """Batch of homography warps in one pallas_call (see
    ``_sample_lanes_batched``). Exposed to model code transparently: the
    single-example ``homography_warp_pallas`` carries a custom_vmap rule
    that lowers ``jax.vmap`` onto this kernel."""
    b, hgt, wid = imgs.shape
    grid_uv1 = pixel_grid_uv1(hgt, wid, dtype=jnp.float32)  # (3, P)
    uvz = jnp.einsum(
        "bij,jp->bip", h_uv.astype(jnp.float32), grid_uv1,
        precision=jax.lax.Precision.HIGHEST,
    )
    su = uvz[:, 0] / uvz[:, 2]
    sv = uvz[:, 1] / uvz[:, 2]
    sampler = (
        _sample_lanes_rowskip
        if BATCH_SAMPLER == "rowskip"
        else _sample_lanes_batched
    )
    out = sampler(imgs, su, sv, interpret, exact_u8)
    return out.reshape(b, hgt, wid)


@functools.partial(jax.jit, static_argnames=("interpret", "exact_u8"))
def homography_warp_pallas(
    img: jnp.ndarray,
    h_uv: jnp.ndarray,
    interpret: bool = False,
    exact_u8: bool = False,
) -> jnp.ndarray:
    """Warp ``img`` (H, W) by the pixel-frame homography ``h_uv`` (3, 3).

    Semantics identical to ``ops.warp.homography_warp`` (torch grid_sample
    bilinear / zeros padding / align_corners=True): out-of-image taps get
    zero hat weight.

    ``exact_u8=True`` asserts the image values are k/255 for integer k
    (i.e. a /255-normalized uint8 frame, HomographyNet.cpp:139-146 — true
    for every warp in the UAHN cascade). Then img*255 is integer-exact in
    bf16 and the hi/lo split halves to a single matmul per tap row —
    2 MXU passes instead of 4, still bit-exact.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    testing without a TPU).
    """
    hgt, wid = img.shape
    grid_uv1 = pixel_grid_uv1(hgt, wid, dtype=jnp.float32)  # (3, P)
    uvz = jnp.matmul(
        h_uv.astype(jnp.float32), grid_uv1, precision=jax.lax.Precision.HIGHEST
    )
    z = uvz[2]
    su = uvz[0] / z
    sv = uvz[1] / z
    out = _sample_flat(img, su, sv, interpret, exact_u8)
    return out.reshape(hgt, wid)


# ---- transparent batching: jax.vmap of the single-example warp lowers onto
# the batched kernel above instead of pallas's sequential auto-batching.
from jax import custom_batching  # noqa: E402


@custom_batching.custom_vmap
def warp_pallas_u8(img: jnp.ndarray, h_uv: jnp.ndarray) -> jnp.ndarray:
    """homography_warp_pallas(exact_u8=True) with a custom vmap rule: the
    production warp entry point (every image in the pipeline is a
    /255-normalized uint8 frame, HomographyNet.cpp:139-146)."""
    return homography_warp_pallas(img, h_uv, exact_u8=True)


@warp_pallas_u8.def_vmap
def _warp_pallas_u8_vmap(axis_size, in_batched, img, h_uv):
    img_b, h_b = in_batched
    if not img_b:
        img = jnp.broadcast_to(img, (axis_size,) + img.shape)
    if not h_b:
        h_uv = jnp.broadcast_to(h_uv, (axis_size,) + h_uv.shape)
    return homography_warp_pallas_batch(img, h_uv, exact_u8=True), True
