"""UAHN: the content-and-uncertainty-aware homography network, TPU-native.

Re-implements (flax, NHWC, single-example functions meant to be vmapped) the
reference's 4-block cascaded CNN (trace_pytorch_model/model_to_trace.py):

- Part 1, blocks 1-3 (Down_Net_3blocks, model_to_trace.py:64-193):
  coarse-to-fine homography refinement. Each block sees (img1, warp(img2, H))
  downsampled by 8/4/2, predicts a residual 4-point offset, converts it to a
  homography by DLT and right-composes: H <- H @ H_block.
- EKF-prior path (model_to_trace.py:129-133,149-153,171): a prior 4-point
  offset (from the filter's propagated state, in pixels) replaces the
  coarse block(s). With blocks_to_run=3 (the shipped config) only block 1 is
  replaced; blocks 2 and 3 still run.
- Block 4 + uncertainty head (HomoNet_last_block, model_to_trace.py:195-282):
  full-resolution 7-conv tower runs ONCE; the two 2-layer fc heads (mean and
  log-variance, dropout p=0.05) run as a 16-member MC-dropout ensemble.
  ensemble_var = mean(exp(logvar)) + var(means); logvar is scaled by 1e-3.
- Covariance transfer into the original img2 pixel frame and 8x8
  block-diagonal assembly (combined_stu_model.forward,
  model_to_trace.py:299-330).

Design deltas from the reference (deliberate, TPU-first):
- one jittable function with static ``use_prior``/``blocks_to_run`` flags
  replaces the two traced TorchScript variants (trace_model.py:36-46);
- the MC ensemble is an explicit leading axis of 16 over the fc heads only
  (the conv tower is shared), matching model_to_trace.py:271-273;
- channels-last (NHWC) convs for the TPU MXU; flattening converts to the
  reference's NCHW order so fc-weight layouts stay interchangeable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cuahn_vio.ops.homography import (
    block_diag_cov8,
    corner_points,
    dlt_solve,
    transfer_mean_var,
)
from cuahn_vio.ops.warp import homography_warp_auto as homography_warp

# conv_planes / fc_input from model_to_trace.py:88-89
CONV_PLANES = (8, 16, 32, 64, 128, 256, 256)
FC_INPUT = 5120  # = 256 * 4 * 5
MC_DROPOUT_NUM = 16  # model_to_trace.py:201
LEAK = 0.1  # LeakyReLU slope, model_to_trace.py:12
# inference-time bound on the (scaled) aleatoric log-variance: on degenerate
# inputs (e.g. the camera looking off the textured plane) the raw head output
# can exceed exp's float32 range and an inf variance poisons the EKF solve
# into NaN. exp(11.5) ~ 1e5 px^2 (std ~316 px, wider than the image) already
# means "no information" to the filter, so the clamp never binds on real
# measurements.
LOGVAR_CLAMP = 11.5


class ConvTower(nn.Module):
    """A stack of (conv, LeakyReLU 0.1) layers.

    Each spec is (out_channels, kernel_size, stride); padding = (k-1)//2 on
    both sides, identical to torch Conv2d(padding=(k-1)//2)
    (model_to_trace.py:7-15).
    """

    specs: Sequence[tuple[int, int, int]]
    dtype: Any = jnp.float32  # computation dtype; params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i, (feat, k, s) in enumerate(self.specs):
            p = (k - 1) // 2
            x = nn.Conv(
                feat,
                (k, k),
                strides=(s, s),
                padding=((p, p), (p, p)),
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, negative_slope=LEAK)
        return x


def _flatten_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (C*H*W,) in the reference's NCHW .view order."""
    return jnp.transpose(x, (2, 0, 1)).reshape(-1)


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """AvgPool2d(k, stride=k) on (H, W, C)."""
    return nn.avg_pool(x[None], (k, k), strides=(k, k))[0]


class McHead(nn.Module):
    """One 2-layer fc head run as a 16-member MC-dropout ensemble
    (model_to_trace.py:221-235,266-273). Input (5120,) -> (16, out)."""

    out_dim: int
    dropout_rate: float = 0.05

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        x = jnp.tile(feat[None, :], (MC_DROPOUT_NUM, 1))  # (16, 5120)
        # dropout always active — MC-dropout at inference (model_to_trace.py:266-268)
        x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        x = nn.Dense(256, name="fc0")(x)
        x = nn.leaky_relu(x, negative_slope=LEAK)
        x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        return nn.Dense(self.out_dim, name="fc1")(x)


class UAHN(nn.Module):
    """The full 4-block network. Images are (H, W) float32 in [0, 1].

    ``use_prior`` and ``blocks_to_run`` select the EKF-prior cascade exactly
    like Down_Net_3blocks.forward (model_to_trace.py:124-193):
      use_prior=False          -> blocks {1,2,3,4}
      use_prior, blocks=3      -> blocks {2,3,4}     (shipped config)
      use_prior, blocks=2      -> blocks {3,4}
      use_prior, blocks=1      -> block  {4} on H_prior
    """

    img_height: int = 224
    img_width: int = 320
    dropout_rate: float = 0.05
    blocks_to_run: int = 3
    # bfloat16 halves conv-tower time on the MXU; the homography algebra,
    # fc heads, and covariance path stay float32 (tower outputs are cast
    # back before the fc layers)
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.block1 = ConvTower(
            [(CONV_PLANES[4], 7, 2), (CONV_PLANES[4], 5, 2), (CONV_PLANES[5], 3, 2)],
            dtype=self.compute_dtype,
            name="block1",
        )
        self.fc_block1 = nn.Dense(8, name="fc_block1")
        self.block2 = ConvTower(
            [
                (CONV_PLANES[3], 7, 2),
                (CONV_PLANES[4], 5, 2),
                (CONV_PLANES[5], 3, 2),
                (CONV_PLANES[6], 3, 2),
            ],
            dtype=self.compute_dtype,
            name="block2",
        )
        self.fc_block2 = nn.Dense(8, name="fc_block2")
        self.block3 = ConvTower(
            [
                (CONV_PLANES[1], 7, 1),
                (CONV_PLANES[2], 5, 2),
                (CONV_PLANES[3], 3, 2),
                (CONV_PLANES[4], 3, 2),
                (CONV_PLANES[5], 3, 2),
                (CONV_PLANES[6], 3, 2),
            ],
            dtype=self.compute_dtype,
            name="block3",
        )
        self.fc_block3 = nn.Dense(8, name="fc_block3")
        self.block4 = ConvTower(
            [
                (CONV_PLANES[0], 7, 1),
                (CONV_PLANES[1], 5, 2),
                (CONV_PLANES[2], 3, 2),
                (CONV_PLANES[3], 3, 2),
                (CONV_PLANES[4], 3, 2),
                (CONV_PLANES[5], 3, 2),
                (CONV_PLANES[6], 3, 2),
            ],
            dtype=self.compute_dtype,
            name="block4",
        )
        self.head_mean = McHead(8, self.dropout_rate, name="head_mean")
        self.head_logvar = McHead(8, self.dropout_rate, name="head_logvar")

    @property
    def corners(self) -> jnp.ndarray:
        return corner_points(self.img_height, self.img_width)

    def _refine(self, tower, fc, img1, img2, h_uv, pool: int, first: bool):
        """One cascade block: warp img2 by current H, downsample, predict a
        residual offset, DLT, right-compose (model_to_trace.py:152-188).

        The incoming H is treated as a constant in backprop (stop_gradient):
        each block learns to refine whatever estimate it is handed — the
        jax form of the reference's sequential/frozen training of earlier
        blocks (combined_stu_model.forward runs part 1 under no_grad)."""
        if first:
            img2_in = img2
        else:
            h_uv = jax.lax.stop_gradient(h_uv)
            img2_in = homography_warp(img2, h_uv)
        pair = jnp.stack([img1, img2_in], axis=-1)  # (H, W, 2)
        x = _avg_pool(pair, pool)
        x = tower(x[None])[0]
        offset8 = fc(_flatten_nchw(x.astype(jnp.float32)))
        h_blk = dlt_solve(self.corners, self.corners + offset8.reshape(4, 2))
        return h_blk if first else h_uv @ h_blk

    def part1(
        self, img1: jnp.ndarray, img2: jnp.ndarray,
        prior_offset: Optional[jnp.ndarray], use_prior: bool,
    ) -> jnp.ndarray:
        """Blocks 1-3 -> part-1 homography (Down_Net_3blocks.forward)."""
        if use_prior:
            assert prior_offset is not None
            h_uv = dlt_solve(self.corners, self.corners + prior_offset)
            if self.blocks_to_run == 1:
                return h_uv
        else:
            h_uv = self._refine(
                self.block1, self.fc_block1, img1, img2, None, 8, first=True
            )
        if not use_prior or self.blocks_to_run == 3:
            h_uv = self._refine(self.block2, self.fc_block2, img1, img2, h_uv, 4, False)
        if not use_prior or self.blocks_to_run >= 2:
            h_uv = self._refine(self.block3, self.fc_block3, img1, img2, h_uv, 2, False)
        return h_uv

    def last_block_members(self, img1, img2, h_uv):
        """Block 4 conv tower (once) + the 16 MC-dropout fc members.

        Returns (means (16, 4, 2), logvars (16, 4, 2)) — the per-member
        corner residuals/log-variances in the warped-img2 frame, for
        per-member NLL training and for the ensemble statistics."""
        img2_warped = homography_warp(img2, h_uv)
        pair = jnp.stack([img1, img2_warped], axis=-1)
        feat = _flatten_nchw(
            self.block4(pair[None])[0].astype(jnp.float32)
        )  # (5120,)
        means = self.head_mean(feat).reshape(MC_DROPOUT_NUM, 4, 2)
        logvars = self.head_logvar(feat).reshape(MC_DROPOUT_NUM, 4, 2) * 1e-3
        return means, logvars

    def last_block(self, img1, img2, h_uv):
        """Block 4 + MC-dropout ensemble heads (HomoNet_last_block.forward).

        Returns (warped-frame 4pt corner prediction (4,2),
                 ensemble variance (4,2))."""
        means, logvars = self.last_block_members(img1, img2, h_uv)
        logvars = jnp.clip(logvars, -LOGVAR_CLAMP, LOGVAR_CLAMP)
        mean_avg = jnp.mean(means, axis=0)
        var_avg = jnp.mean(jnp.exp(logvars), axis=0)
        emp_var = jnp.mean(jnp.square(means - mean_avg[None]), axis=0)
        ensemble_var = emp_var + var_avg  # model_to_trace.py:274-280
        return self.corners + mean_avg, ensemble_var

    def cascade_flows(
        self,
        img1: jnp.ndarray,
        img2: jnp.ndarray,
        prior_offset: Optional[jnp.ndarray] = None,
        use_prior: bool = False,
    ):
        """Training forward of part 1: the cumulative corner flow (pixels,
        original img2 frame) after each executed block, plus the final H.

        Returns (flows (n_executed, 8), h_uv). Supervising every stage's
        flow against the ground-truth flow trains the cascade the way the
        reference's progressive scheme does.
        """
        flows = []

        def flow_of(h):
            uv1 = jnp.concatenate(
                [self.corners, jnp.ones((4, 1), self.corners.dtype)], axis=1
            )
            m = uv1 @ h.T
            return (m[:, :2] / m[:, 2:3] - self.corners).reshape(8)

        if use_prior:
            h_uv = dlt_solve(self.corners, self.corners + prior_offset)
            if self.blocks_to_run == 1:
                return jnp.stack([flow_of(h_uv)]), h_uv
        else:
            h_uv = self._refine(
                self.block1, self.fc_block1, img1, img2, None, 8, first=True
            )
            flows.append(flow_of(h_uv))
        if not use_prior or self.blocks_to_run == 3:
            h_uv = self._refine(self.block2, self.fc_block2, img1, img2, h_uv, 4, False)
            flows.append(flow_of(h_uv))
        if not use_prior or self.blocks_to_run >= 2:
            h_uv = self._refine(self.block3, self.fc_block3, img1, img2, h_uv, 2, False)
            flows.append(flow_of(h_uv))
        return jnp.stack(flows), h_uv

    def __call__(
        self,
        img1: jnp.ndarray,
        img2: jnp.ndarray,
        prior_offset: Optional[jnp.ndarray] = None,
        use_prior: bool = False,
        return_error_map: bool = False,
    ):
        """Full model (combined_stu_model.forward, model_to_trace.py:299-330).

        Args:
            img1, img2: (H, W) float32 grayscale in [0, 1].
            prior_offset: (4, 2) propagated 4-point offset in PIXELS
                (HomographyNet.cpp:160-165 passes it in pixels).
            use_prior: static flag selecting the prior cascade.
            return_error_map: also return |warp(img2, H_total) - img1| * 255.
        Returns:
            flow8: (8,) total 4-point optical flow, pixels, original frame.
            cov88: (8, 8) block-diagonal measurement covariance, pixels^2.
            [err_map: (H, W) photometric error map if requested.]
        """
        h_part1 = self.part1(img1, img2, prior_offset, use_prior)
        # the reference runs part-1 under no_grad (model_to_trace.py:303);
        # stop_gradient gives identical training semantics.
        h_part1 = jax.lax.stop_gradient(h_part1)
        warped_4pt, ens_var = self.last_block(img1, img2, h_part1)
        pts_orig, cov_4pt = transfer_mean_var(ens_var, h_part1, warped_4pt)
        flow8 = (pts_orig - self.corners).reshape(8)
        cov88 = block_diag_cov8(cov_4pt)

        if return_error_map:
            h_b4 = dlt_solve(self.corners, warped_4pt)
            h_total = h_part1 @ h_b4
            err_map = jnp.abs(homography_warp(img2, h_total) - img1) * 255.0
            return flow8, cov88, err_map
        return flow8, cov88


def init_uahn(
    key: jax.Array,
    img_height: int = 224,
    img_width: int = 320,
    blocks_to_run: int = 3,
    compute_dtype=jnp.float32,
):
    """Create the model and a randomly-initialized parameter pytree.

    The shipped pretrained weights are absent from the reference snapshot
    (.MISSING_LARGE_BLOBS); weights are produced by ``cuahn_vio.train``.
    ``compute_dtype=jnp.bfloat16`` selects half-precision conv towers
    (inference mode; params stay float32 and checkpoints interchange).
    """
    model = UAHN(
        img_height=img_height, img_width=img_width,
        blocks_to_run=blocks_to_run, compute_dtype=compute_dtype,
    )
    img = jnp.zeros((img_height, img_width), jnp.float32)
    params = model.init(
        {"params": key, "dropout": jax.random.fold_in(key, 1)}, img, img
    )["params"]
    return model, params
