"""UAHN training: supervised cascade + heteroscedastic NLL, data-parallel.

The reference ships NO training code (SURVEY.md §5.4) — the weights are a
missing large blob and the recipe lives in the paper. This trainer produces
working weights from scratch, entirely on-device:

- Data: random planar-scene frame pairs rendered on the TPU each step
  (cuahn_vio.data.synthetic) — an infinite, exactly-labeled stream; the
  exact ground-truth corner flow comes from the pose pair (data/oracle.py).
- Part 1 (blocks 1-3): per-block supervision of the cumulative corner flow
  (UAHN.cascade_flows), with stop_gradient between blocks — the jax form of
  the reference's progressive/frozen-earlier-blocks scheme.
- Block 4: per-MC-member Gaussian NLL on the warped-frame corner residual
  (mean + log-variance heads, model_to_trace.py:252-256), plus an L2 warmup
  term so the variance head can't mute the mean early.
- Parallelism: optax + jit with the batch sharded over the mesh's ``seq``
  axis and params replicated; gradients all-reduce automatically via XLA.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cuahn_vio.data.oracle import true_corner_flow
from cuahn_vio.data.synthetic import render_frame, render_frame_blurred
from cuahn_vio.filter.state import FOCAL
from cuahn_vio.models.uahn import UAHN
from cuahn_vio.ops.quat import quat_exp, quat_mul


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16
    lr: float = 2e-4
    weight_decay: float = 1e-5
    grad_clip: float = 1.0
    warmup_steps: int = 200
    huber_delta: float = 5.0  # px; caps outlier gradients early in training
    logvar_clip: float = 6.0
    nll_weight: float = 0.3
    prior_prob: float = 0.5  # fraction of samples trained in prior mode
    # simulated-EKF-prior noise: per-sample sigma drawn log-uniform in
    # [lo, hi] px — during fast flight the real propagated prior is far
    # worse than a fixed 3 px, and the network must stay useful then
    prior_noise_lo: float = 1.0
    prior_noise_px: float = 6.0  # upper end of the log-uniform range
    height_range: tuple = (0.8, 3.0)
    trans_sigma: float = 0.06  # inter-frame translation (m), ~v/fps
    rot_sigma: float = 0.025  # inter-frame rotation (rad)
    tilt_sigma: float = 0.12  # absolute roll/pitch (rad)
    # flight-realistic pose pairs from the real UZH-FPV GT trajectories
    # (data/trajpairs.py, eval sequences held out): fraction of samples
    # drawn from the bank instead of the i.i.d. random-pose model above
    traj_pair_prob: float = 0.7
    # imagery realism (round 2): photo textures + sensor degradation
    use_textures: bool = True  # real-photo ground textures (data/textures.py)
    tex_scale_range: tuple = (1.5, 10.0)  # metres per texture period
    use_effects: bool = True  # vignette/exposure/noise chain
    exposure_frac_max: float = 0.5  # max exposure as fraction of frame dt
    blur_taps: int = 3  # pose taps per motion-blurred render
    max_flow_px: float = 120.0  # samples beyond this are masked from the loss
    # --- round 5 ---
    # Prior-echo decorrelation: weight of the batch-level penalty on the
    # regression slope of (final-flow error) against (fed-prior error) in
    # prior mode. The replay-measured slope of the v6 weights is ~+0.5 —
    # the cascade echoes half the prior error back, which makes the
    # filter's white-noise measurement model false (state NEES ~5x
    # optimistic) and under-corrects the state. Driving the slope to 0
    # makes the deployed filter's assumptions true instead of bending the
    # filter around the network. 0 disables.
    echo_weight: float = 0.0
    # Large-baseline curriculum for loop-closure factors: fraction of
    # samples whose inter-frame translation is scaled up, pushing corner
    # flows into the 100-250 px revisit regime (VERDICT r4: every headline
    # loop candidate sat at 108-274 px, outside the <=80 px training
    # regime, so all factors were confidence-gated).
    big_baseline_prob: float = 0.0
    big_baseline_scale: tuple = (2.0, 6.0)


class Batch(NamedTuple):
    img1: jnp.ndarray  # (B, H, W)
    img2: jnp.ndarray  # (B, H, W)
    gt_flow: jnp.ndarray  # (B, 8) pixels
    prior: jnp.ndarray  # (B, 4, 2) noisy prior, pixels
    valid: jnp.ndarray  # (B,) f32 — 0 masks degenerate samples from the loss


def sample_pair(
    key, c_rot_i, i_t_i2c, cfg: TrainConfig, height, width,
    tex_bank=None, tex_indices=None, pair_bank=None,
):
    """One synthetic training pair + exact corner-flow label, on device.

    With ``tex_bank``/``tex_indices`` (device arrays from
    data/textures.py), the ground is a randomly transformed real photo and
    both frames carry motion blur + the sensor-effect chain — the imagery
    the deployed system actually sees (real undistorted camera frames,
    VioManager.cpp:183-188). Without them, the round-1 procedural texture.
    """
    ks = jax.random.split(key, 16)
    p1 = jnp.array([0.0, 0.0, 0.0]).at[2].set(
        jax.random.uniform(
            ks[0], minval=cfg.height_range[0], maxval=cfg.height_range[1]
        )
    )
    rv1 = jnp.concatenate(
        [
            jax.random.normal(ks[1], (2,)) * cfg.tilt_sigma,
            jax.random.uniform(ks[2], (1,), minval=-np.pi, maxval=np.pi),
        ]
    )
    q1 = quat_exp(rv1)
    dp = jax.random.normal(ks[3], (3,)) * cfg.trans_sigma
    rv_d = jax.random.normal(ks[4], (3,)) * cfg.rot_sigma
    dq = quat_exp(rv_d)
    p2 = p1 + dp
    q2 = quat_mul(q1, dq)
    if pair_bank is not None and cfg.traj_pair_prob > 0.0:
        # flight-realistic pair from a real GT trajectory, with a random
        # world-yaw rotation (the planar measurement model is yaw-invariant
        # and the texture transform randomizes planar position)
        bp1, bq1, bp2, bq2 = pair_bank
        idx = jax.random.randint(ks[12], (), 0, bp1.shape[0])
        yaw = jax.random.uniform(ks[13], minval=0.0, maxval=2 * np.pi)
        q_yaw = quat_exp(jnp.array([0.0, 0.0, 1.0]) * yaw)
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        rz = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
        use_traj = jax.random.bernoulli(ks[11], cfg.traj_pair_prob)
        sel = lambda a, b: jnp.where(use_traj, a, b)
        p1 = sel(rz @ bp1[idx], p1)
        q1 = sel(quat_mul(q_yaw, bq1[idx]), q1)
        p2 = sel(rz @ bp2[idx], p2)
        q2 = sel(quat_mul(q_yaw, bq2[idx]), q2)
        dp = p2 - p1  # blur taps follow the actual inter-frame motion
        # relative rotation for the blur taps: q1^-1 q2 ~ exp(rv_d)
        from cuahn_vio.ops.quat import quat_conj, quat_log

        rv_d = quat_log(quat_mul(quat_conj(q1), q2))

    if cfg.big_baseline_prob > 0.0:
        # large-baseline curriculum (loop-closure revisit regime): stretch
        # the translation of a fraction of samples; rotation and rendering
        # blur follow the stretched motion consistently
        big = jax.random.bernoulli(ks[14], cfg.big_baseline_prob)
        stretch = jnp.where(
            big,
            jax.random.uniform(
                ks[15],
                minval=cfg.big_baseline_scale[0],
                maxval=cfg.big_baseline_scale[1],
            ),
            1.0,
        )
        dp = dp * stretch
        p2 = p1 + dp

    if tex_bank is not None:
        from cuahn_vio.data.textures import random_tex_params

        idx = tex_indices[
            jax.random.randint(ks[5], (), 0, tex_indices.shape[0])
        ]
        texture = tex_bank[idx]
        tex_params = random_tex_params(ks[7], cfg.tex_scale_range)
        # physical motion blur: poses across the exposure window
        # [t - ef*dt, t] for both frames, along the inter-frame motion
        ef = jax.random.uniform(ks[8], maxval=cfg.exposure_frac_max)
        betas = jnp.linspace(-1.0, 0.0, cfg.blur_taps) * ef

        def taps(p, q):
            ps = p[None] + betas[:, None] * dp[None]
            qs = jax.vmap(lambda b: quat_mul(q, quat_exp(b * rv_d)))(betas)
            return ps, qs

        p1s, q1s = taps(p1, q1)
        p2s, q2s = taps(p2, q2)
        img1 = render_frame_blurred(
            p1s, q1s, c_rot_i, i_t_i2c, None, height, width,
            texture, tex_params,
        )
        img2 = render_frame_blurred(
            p2s, q2s, c_rot_i, i_t_i2c, None, height, width,
            texture, tex_params,
        )
        if cfg.use_effects:
            from cuahn_vio.data.sensor_effects import (
                EffectsConfig, apply_effects_pair,
            )

            img1, img2 = apply_effects_pair(
                img1, img2, ks[9], EffectsConfig()
            )
    else:
        tex_key = ks[5]
        img1 = render_frame(p1, q1, c_rot_i, i_t_i2c, tex_key, height, width)
        img2 = render_frame(p2, q2, c_rot_i, i_t_i2c, tex_key, height, width)
    # quantize to u8 levels: the deployed pipeline feeds /255-normalized
    # uint8 frames (HomographyNet.cpp:139-146), and the pallas warp's
    # exact_u8 fast path relies on k/255-valued inputs
    img1 = jnp.round(jnp.clip(img1, 0.0, 1.0) * 255.0) / 255.0
    img2 = jnp.round(jnp.clip(img2, 0.0, 1.0) * 255.0) / 255.0
    gt_flow = true_corner_flow(p1, q1, p2, q2, c_rot_i, i_t_i2c)
    gt_flow = gt_flow * (width - 1) / 319.0  # scale if a tiny model is used
    prior_sigma = jnp.exp(
        jax.random.uniform(
            ks[10],
            minval=jnp.log(cfg.prior_noise_lo),
            maxval=jnp.log(cfg.prior_noise_px),
        )
    )
    prior = gt_flow.reshape(4, 2) + jax.random.normal(ks[6], (4, 2)) * (
        prior_sigma * (width - 1) / 319.0
    )
    # mask geometrically degenerate draws (corners flung far off-image blow
    # up the cascade loss — the step-39800 spike in train4.log)
    valid = jnp.all(jnp.abs(gt_flow) < cfg.max_flow_px).astype(jnp.float32)
    return img1, img2, gt_flow, prior, valid


def make_batch(
    key, c_rot_i, i_t_i2c, cfg: TrainConfig, height=224, width=320,
    tex_bank=None, tex_indices=None, pair_bank=None,
):
    keys = jax.random.split(key, cfg.batch_size)
    f = jax.vmap(
        lambda k: sample_pair(
            k, c_rot_i, i_t_i2c, cfg, height, width, tex_bank, tex_indices,
            pair_bank,
        )
    )
    img1, img2, gt, prior, valid = f(keys)
    return Batch(img1=img1, img2=img2, gt_flow=gt, prior=prior, valid=valid)


def _warped_frame_gt(h_part1, gt_flow, corners):
    """Ground-truth corner residual in the warped-img2 frame: block 4's
    regression target. dst_warped = H⁻¹ @ (corners + gt_flow)."""
    dst = corners + gt_flow.reshape(4, 2)
    uv1 = jnp.concatenate([dst, jnp.ones((4, 1), dst.dtype)], axis=1)
    h_inv = jnp.linalg.inv(h_part1)
    m = uv1 @ h_inv.T
    return m[:, :2] / m[:, 2:3] - corners  # (4, 2)


def _huber(err, delta):
    a = jnp.abs(err)
    return jnp.where(a <= delta, 0.5 * err * err, delta * (a - 0.5 * delta))


def make_loss_fn(model: UAHN, cfg: TrainConfig):
    corners = model.corners

    def sample_loss(params, img1, img2, gt_flow, prior, use_prior, key):
        flows, h1 = model.apply(
            {"params": params}, img1, img2,
            prior if use_prior else None, use_prior,
            method=UAHN.cascade_flows,
        )
        l_cascade = (
            jnp.mean(_huber(flows - gt_flow[None, :], cfg.huber_delta))
            if flows.shape[0]
            else 0.0
        )

        h1 = jax.lax.stop_gradient(h1)
        means, logvars = model.apply(
            {"params": params}, img1, img2, h1,
            method=UAHN.last_block_members,
            rngs={"dropout": key},
        )
        logvars = jnp.clip(logvars, -cfg.logvar_clip, cfg.logvar_clip)
        gt_resid = _warped_frame_gt(h1, gt_flow, corners)  # (4, 2)
        err = means - gt_resid[None]  # (16, 4, 2)
        l_mean = jnp.mean(_huber(err, cfg.huber_delta))
        # NLL on the huberized residual so one outlier can't blow var head
        err2 = jnp.square(jnp.clip(err, -3 * cfg.huber_delta, 3 * cfg.huber_delta))
        l_nll = jnp.mean(0.5 * (logvars + err2 / jnp.exp(logvars)))

        # per-sample error vectors for the batch-level echo penalty: the
        # cascade's final-flow error (gradient into blocks 2-3) and the
        # composed full-output error (gradient into block 4 through the
        # member-mean residual; h1 is stop_gradient'ed like inference)
        err_casc = (
            flows[-1] - gt_flow if flows.shape[0] else jnp.zeros(8, img1.dtype)
        )
        mean_resid = corners + jnp.mean(means, axis=0)  # (4, 2)
        uv1 = jnp.concatenate(
            [mean_resid, jnp.ones((4, 1), mean_resid.dtype)], axis=1
        )
        m_full = uv1 @ h1.T
        full_flow = (m_full[:, :2] / m_full[:, 2:3] - corners).reshape(8)
        err_full = full_flow - gt_flow
        err_prior = prior.reshape(8) - gt_flow
        return l_cascade + l_mean + cfg.nll_weight * l_nll, (
            l_cascade, l_mean, l_nll,
        ), (err_casc, err_full, err_prior)

    def loss_fn(params, batch: Batch, key, use_prior: bool):
        keys = jax.random.split(key, batch.img1.shape[0])
        losses, aux, echo = jax.vmap(
            lambda i1, i2, g, pr, k: sample_loss(
                params, i1, i2, g, pr, use_prior, k
            )
        )(batch.img1, batch.img2, batch.gt_flow, batch.prior, keys)
        # a degenerate sample (singular DLT / off-image corner flow) must
        # not poison the batch: mask non-finite AND invalid-geometry draws
        w = batch.valid * jnp.isfinite(losses).astype(jnp.float32)
        losses = jnp.where(w > 0, losses, 0.0) * w
        denom = jnp.maximum(jnp.sum(w), 1.0)
        total = jnp.sum(losses) / denom

        if use_prior and cfg.echo_weight > 0.0:
            # echo-decorrelation: squared batch regression slope of the
            # output error on the fed-prior error, per component — drives
            # the deployed prior-echo fraction (FilterParams.echo_beta)
            # toward 0 so the filter's white-noise model becomes true
            err_casc, err_full, err_prior = echo
            wf = (w * jnp.all(jnp.isfinite(err_full), axis=1)
                    * jnp.all(jnp.isfinite(err_casc), axis=1))[:, None]

            def slope2(e):
                e = jnp.where(wf > 0, e, 0.0)
                p = jnp.where(wf > 0, err_prior, 0.0)
                n = jnp.maximum(jnp.sum(wf), 1.0)
                e = e - jnp.sum(e, 0) / n
                p = p - jnp.sum(p, 0) / n
                cov = jnp.sum(e * p * wf, 0)
                var = jnp.sum(p * p * wf, 0) + 1e-3
                return jnp.mean((cov / var) ** 2)

            l_echo = slope2(err_casc) + slope2(err_full)
            total = total + cfg.echo_weight * l_echo

        return total, jax.tree.map(
            lambda x: jnp.sum(jnp.where(w > 0, x, 0.0) * w) / denom, aux
        )

    return loss_fn


def _zero_nonfinite() -> optax.GradientTransformation:
    """Replace NaN AND inf gradient entries with 0.

    optax.zero_nans passes inf through; clip_by_global_norm then computes
    inf * 0 = NaN, which permanently poisons Adam's moments — the failure
    mode that killed early training runs on rare degenerate (singular-DLT)
    samples."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), updates
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig, sched) -> optax.GradientTransformation:
    return optax.apply_if_finite(
        optax.chain(
            _zero_nonfinite(),
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(sched, weight_decay=cfg.weight_decay),
        ),
        max_consecutive_errors=10000,
    )


def make_train_step(model: UAHN, cfg: TrainConfig, tx: optax.GradientTransformation):
    loss_fn = make_loss_fn(model, cfg)

    @partial(jax.jit, static_argnames=("use_prior",))
    def train_step(params, opt_state, batch: Batch, key, use_prior: bool):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key, use_prior
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return train_step


def make_probe_metric(model: UAHN, c_rot_i, i_t_i2c, cfg: TrainConfig,
                      height: int, width: int, probe_size: int,
                      probe_seed: int = 20240817):
    """Fixed HELD-OUT-texture probe: the in-training evaluation signal
    (VERDICT r2 #7). Renders one frozen batch from the heldout texture
    split (the textures eval replays use, never trained on) and returns a
    jitted fn params -> (prior-mode, no-prior) mean corner-flow px error —
    the same statistic ``cli.py eval-flow`` reports, so training progress
    is measured in the unit that decides replay ATE, not in loss units."""
    from cuahn_vio.data.textures import get_texture_bank, heldout_indices

    bank_np = get_texture_bank()
    hk = jnp.asarray(heldout_indices(len(bank_np)))
    bank = jnp.asarray(bank_np)
    probe_cfg = cfg  # same pose/degradation distribution as training
    keys = jax.random.split(jax.random.PRNGKey(probe_seed), probe_size)
    img1, img2, gt, prior, valid = jax.vmap(
        lambda k: sample_pair(
            k, c_rot_i, i_t_i2c, probe_cfg, height, width, bank, hk, None
        )
    )(keys)
    drop_key = jax.random.PRNGKey(probe_seed + 1)

    @jax.jit
    def metric(params):
        def fwd(i1, i2, pr, use_prior):
            flow8, _ = model.apply(
                {"params": params}, i1, i2,
                pr if use_prior else None, use_prior,
                rngs={"dropout": drop_key},
            )
            return flow8

        errs = []
        for use_prior in (True, False):
            pred = jax.vmap(lambda a, b, p: fwd(a, b, p, use_prior))(
                img1, img2, prior
            )
            e = jnp.linalg.norm((pred - gt).reshape(-1, 4, 2), axis=-1)
            w = jnp.repeat(valid, 4)
            errs.append(jnp.sum(e.reshape(-1) * w) / jnp.maximum(w.sum(), 1.0))
        return errs[0], errs[1]

    return metric


def train(
    model: UAHN,
    params,
    c_rot_i,
    i_t_i2c,
    cfg: TrainConfig = TrainConfig(),
    steps: int = 1000,
    seed: int = 0,
    log_every: int = 50,
    height: int = 224,
    width: int = 320,
    log_fn=print,
    checkpoint_path: Optional[str] = None,
    save_every: int = 500,
    probe_every: int = 1000,
):
    """Run the training loop; returns trained params. Saves intermediate
    checkpoints to ``checkpoint_path`` every ``save_every`` steps.

    Every ``probe_every`` steps the held-out-texture probe metric (mean
    corner-flow px error, see make_probe_metric) is logged, and the
    best-by-probe params are checkpointed to ``<checkpoint_path>.best`` —
    weight selection by the quantity that matters, not the last step.

    Data parallelism: with more than one visible device (and batch_size a
    multiple of the device count) the batch is sharded over a 1-D ``seq``
    mesh and the params/optimizer state replicated; XLA inserts the
    gradient all-reduce. Single device runs the same code unsharded.
    """
    # batched training warps are fastest via the XLA matmul formulation
    # (a vmapped pallas_call grid serializes; measured ~5x step-time hit)
    from cuahn_vio.ops import warp as _warp

    _warp.WARP_IMPL = "mm"

    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, cfg.warmup_steps, max(steps, cfg.warmup_steps + 1),
        end_value=cfg.lr * 0.05,
    )
    tx = make_optimizer(cfg, sched)
    opt_state = tx.init(params)
    step_fn = make_train_step(model, cfg, tx)

    if cfg.use_textures:
        from cuahn_vio.data.textures import get_texture_bank, train_indices

        bank_np = get_texture_bank()
        tex_bank = jnp.asarray(bank_np)
        tex_idx = jnp.asarray(train_indices(len(bank_np)))
        log_fn(
            f"texture bank: {len(bank_np)} textures, "
            f"{tex_idx.shape[0]} in training split", flush=True,
        )
    else:
        tex_bank = tex_idx = None

    pair_bank = None
    if cfg.traj_pair_prob > 0.0:
        try:
            from cuahn_vio.data.trajpairs import build_pose_pair_bank

            b = build_pose_pair_bank()
            pair_bank = tuple(
                jnp.asarray(b[k]) for k in ("p1", "q1", "p2", "q2")
            )
            log_fn(
                f"trajectory pose-pair bank: {b['p1'].shape[0]} pairs "
                f"({cfg.traj_pair_prob:.0%} of samples)", flush=True,
            )
        except Exception as e:  # GT files absent: fall back to random poses
            log_fn(f"trajectory pair bank unavailable ({e}); random poses",
                   flush=True)

    n_dev = len(jax.devices())
    batch_out_shardings = None
    if n_dev > 1 and cfg.batch_size % n_dev == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cuahn_vio.parallel.mesh import make_mesh

        mesh = make_mesh()
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("seq"))
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
        if tex_bank is not None:
            tex_bank = jax.device_put(tex_bank, rep)
            tex_idx = jax.device_put(tex_idx, rep)
        if pair_bank is not None:
            pair_bank = jax.device_put(pair_bank, rep)
        batch_out_shardings = Batch(
            img1=shard, img2=shard, gt_flow=shard, prior=shard, valid=shard
        )
        log_fn(f"data-parallel over {n_dev} devices (seq mesh)", flush=True)

    def _gen(k, bank, idx, pairs):
        return make_batch(
            k, c_rot_i, i_t_i2c, cfg, height, width, bank, idx, pairs
        )

    gen = jax.jit(_gen, out_shardings=batch_out_shardings)

    probe_fn = None
    best_probe = float("inf")
    if probe_every and cfg.use_textures:
        probe_fn = make_probe_metric(
            model, c_rot_i, i_t_i2c, cfg, height, width, probe_size=32
        )

    key = jax.random.PRNGKey(seed)
    # the prior-mode coin flip is drawn on the HOST: a device bernoulli
    # would force a device->host sync every step, which costs ~0.5 s per
    # step over a tunneled TPU — the loop must stay fully async between
    # log points so gen/step dispatches pipeline on the device
    host_rng = np.random.default_rng(seed)
    for i in range(steps):
        key, kb, ks = jax.random.split(key, 3)
        batch = gen(kb, tex_bank, tex_idx, pair_bank)
        use_prior = bool(host_rng.random() < cfg.prior_prob)
        params, opt_state, loss, aux = step_fn(
            params, opt_state, batch, ks, use_prior
        )
        if log_every and (i % log_every == 0 or i == steps - 1):
            l_c, l_m, l_n = jax.device_get(aux)
            skipped = int(getattr(opt_state, "notfinite_count", 0))
            log_fn(
                f"step {i:5d} loss {float(loss):.4f} "
                f"cascade {float(l_c):.4f} mean {float(l_m):.4f} nll {float(l_n):.4f}"
                f" prior={use_prior} skipped={skipped}",
                flush=True,
            )
        if probe_fn is not None and (
            (i and i % probe_every == 0) or i == steps - 1
        ):
            e_prior, e_noprior = jax.device_get(probe_fn(params))
            log_fn(
                f"step {i:5d} PROBE heldout-tex corner err px: "
                f"prior {float(e_prior):.3f} noprior {float(e_noprior):.3f}"
                f" (best {min(best_probe, float(e_prior)):.3f})",
                flush=True,
            )
            if checkpoint_path and float(e_prior) < best_probe:
                best_probe = float(e_prior)
                from cuahn_vio.utils.checkpoint import save_params

                save_params(checkpoint_path + ".best", params)
        if checkpoint_path and save_every and i and i % save_every == 0:
            from cuahn_vio.utils.checkpoint import save_params

            save_params(checkpoint_path, params)
    return params
