"""Filter-in-the-loop (FIL) fine-tuning: optimize the network through the
deployed EKF recurrence itself.

Round-4 finding (benchmarks/RESULTS.md): held-out single-pair corner error
and replay ATE DECORRELATE at the v6 quality level — the filter loop is
sensitive to the error's temporal structure (prior echo, correlation across
frames) and covariance calibration, not its marginal magnitude. The fix is
to optimize the quantity the replay measures: pose drift of the actual
filter over short windows of flight.

Mechanics: the whole deployed per-frame step (propagate -> UAHN prior-mode
inference -> EKF update -> reset, pipeline/vio.py) is already one pure
jittable scan, so it is differentiable end-to-end; gradients flow into the
network parameters through BOTH the measurement mean (via the Kalman-gain
state correction) and the covariance head (via the gain itself) at every
frame of the window. The reference has no counterpart (it ships no
training code at all, SURVEY.md §5.4).

Data: windows of W consecutive camera frames sampled from the REAL UZH-FPV
training trajectories (data/trajpairs.py splines, benchmark sequences
excluded), with exact IMU midpoints from spline autodiff; imagery is
re-rendered on device every step (random held-in texture + motion blur +
sensor effects), and IMU noise/biases are re-drawn every step. The filter
is initialized from ground truth with errors drawn consistently from its
initial covariance, so the window starts in a calibrated steady state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cuahn_vio.filter.state import FilterState
from cuahn_vio.ops.quat import (
    quat_conj,
    quat_exp,
    quat_log,
    quat_mul,
    quat_to_rot,
)
from cuahn_vio.pipeline.vio import VioConfig, run_sequence


@dataclass(frozen=True)
class FilConfig:
    window: int = 6  # frames per window (W scan steps over W+1 images)
    batch_size: int = 4
    imu_substeps: int = 17  # IMU intervals per frame (~500 Hz at 30 fps)
    # IMU noise/bias draw per window per step (textured_replay.sh values)
    sigma_w: float = 0.002
    sigma_a: float = 0.02
    bias_g: float = 0.003
    bias_a: float = 0.02
    # initial-state perturbation sigmas == sqrt(initial covariance diag):
    # the filter starts consistent, in a plausible steady state
    init_pos_sigma: tuple = (0.05, 0.05, 0.03)
    init_tilt_sigma: float = 0.01  # rad, roll/pitch (yaw is gauge: exact)
    init_vel_sigma: float = 0.1
    init_ba_sigma: float = 0.03
    init_bg_sigma: float = 0.003
    # loss weights (later frames weighted linearly more — drift is the
    # quantity the replay measures)
    w_pos: float = 1.0
    w_vel: float = 0.3
    w_tilt: float = 30.0  # rad² are tiny; bring tilt to comparable scale
    # consistency (NEES) penalty: log-symmetric penalty on the filter's
    # own velocity/tilt NEES per frame — trains the covariance head to
    # make the DEPLOYED filter consistent (the r4/r5 measured optimism is
    # ~5x in the observable subspace; a chi2-temperature cannot fix it
    # because the innovation stream is already calibrated). 0 disables.
    w_cons: float = 0.0
    # imagery
    exposure_s: float = 0.008
    blur_taps: int = 3
    tex_scale_range: tuple = (1.5, 10.0)
    img_hw: tuple = (224, 320)  # render size (tiny for tests)


class WindowBank(NamedTuple):
    """Precomputed noise-free window geometry (host, built once)."""

    tap_p: np.ndarray  # (N, W+1, taps, 3) blur-tap world positions
    tap_q: np.ndarray  # (N, W+1, taps, 4) blur-tap quats (wxyz)
    w_true: np.ndarray  # (N, W, T, 3) true gyro at interval midpoints
    a_true: np.ndarray  # (N, W, T, 3) true specific force at midpoints
    dt: np.ndarray  # (N, W, T) interval lengths
    gt_p: np.ndarray  # (N, W+1, 3) world positions at frame times
    gt_q: np.ndarray  # (N, W+1, 4) quats at frame times (wxyz)
    gt_v: np.ndarray  # (N, W+1, 3) world velocities at frame times


def cached_window_bank(
    n_windows: int = 1024,
    cfg: FilConfig = FilConfig(),
    seed: int = 0,
) -> WindowBank:
    """Build the bank in a CPU SUBPROCESS and cache it as npz.

    The bank is pure spline math (tiny flops, 36 distinct jit shapes); on
    a tunneled TPU backend each compile costs tens of seconds, so an
    in-process build takes >10 min while a CPU subprocess takes ~1 min.
    """
    import os
    import subprocess
    import sys

    cache = (
        f"/tmp/cuahn_filbank_{n_windows}_{cfg.window}_{cfg.imu_substeps}_"
        f"{cfg.blur_taps}_{cfg.exposure_s}_{seed}.npz"
    )
    if not os.path.exists(cache):
        code = (
            "from cuahn_vio.train.fil import FilConfig, build_window_bank\n"
            "import numpy as np\n"
            f"cfg = FilConfig(window={cfg.window}, "
            f"imu_substeps={cfg.imu_substeps}, blur_taps={cfg.blur_taps}, "
            f"exposure_s={cfg.exposure_s})\n"
            f"b = build_window_bank({n_windows}, cfg, seed={seed})\n"
            f"np.savez('{cache}.tmp.npz', **b._asdict())\n"
            f"import os; os.replace('{cache}.tmp.npz', '{cache}')\n"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
        subprocess.run(
            [sys.executable, "-c", code], env=env, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        )
    d = np.load(cache)
    return WindowBank(**{k: d[k] for k in WindowBank._fields})


def build_window_bank(
    n_windows: int = 1024,
    cfg: FilConfig = FilConfig(),
    frame_dt: float = 1.0 / 30.0,
    seed: int = 0,
    min_height: float = 0.6,
) -> WindowBank:
    """Sample windows uniformly over the training trajectories."""
    from cuahn_vio.data.bspline import SplineTrajectory
    from cuahn_vio.data.trajpairs import Z_OFFSET, train_trajectory_files

    rng = np.random.default_rng(seed)
    files = train_trajectory_files()
    trajs = [
        SplineTrajectory.from_trajectory_file(f, dt=0.1, z_offset=Z_OFFSET)
        for f in files
    ]
    w1 = cfg.window
    span = w1 * frame_dt
    taps = np.linspace(-cfg.exposure_s, 0.0, cfg.blur_taps)

    t_sub = cfg.imu_substeps
    n_per = (n_windows + len(trajs) - 1) // len(trajs)
    parts = {k: [] for k in WindowBank._fields}
    # one batched jitted evaluation per trajectory (NOT per window — the
    # original per-window loop made thousands of tiny tunneled device
    # calls and took tens of minutes)
    for tr in trajs:
        pq = jax.jit(jax.vmap(lambda t, tr=tr: (tr.pos_w(t), tr.quat_i2w(t))))
        imu = jax.jit(jax.vmap(lambda t, tr=tr: tr.imu_true(t)))
        sgt = jax.jit(jax.vmap(lambda t, tr=tr: tr.state_gt(t)))

        # oversample 3x, then reject low windows in one vectorized pass
        cand = rng.uniform(
            tr.t_min + 0.05, tr.t_max - span - 0.1, size=3 * n_per
        )
        ft = cand[:, None] + np.arange(w1 + 1)[None, :] * frame_dt  # (C,W+1)
        p_f, q_f = pq(jnp.asarray(ft.reshape(-1), jnp.float32))
        p_f = np.asarray(p_f).reshape(-1, w1 + 1, 3)
        keep = np.where(p_f[:, :, 2].min(axis=1) >= min_height)[0][:n_per]
        if keep.size == 0:
            continue
        ft = ft[keep]  # (K, W+1)
        k = ft.shape[0]

        tap_t = (ft[:, :, None] + taps[None, None, :]).reshape(-1)
        p_t, q_t = pq(jnp.asarray(tap_t, jnp.float32))
        parts["tap_p"].append(
            np.asarray(p_t).reshape(k, w1 + 1, cfg.blur_taps, 3)
        )
        parts["tap_q"].append(
            np.asarray(q_t).reshape(k, w1 + 1, cfg.blur_taps, 4)
        )

        edges = np.linspace(0.0, frame_dt, t_sub + 1)
        mids = (
            ft[:, :-1, None] + 0.5 * (edges[:-1] + edges[1:])[None, None, :]
        )  # (K, W, T)
        wt, at = imu(jnp.asarray(mids.reshape(-1), jnp.float32))
        parts["w_true"].append(np.asarray(wt).reshape(k, w1, t_sub, 3))
        parts["a_true"].append(np.asarray(at).reshape(k, w1, t_sub, 3))
        parts["dt"].append(
            np.full((k, w1, t_sub), frame_dt / t_sub, np.float32)
        )

        ftj = jnp.asarray(ft.reshape(-1), jnp.float32)
        p_fr, _ = pq(ftj)
        _, q_gt, v_rc = sgt(ftj)  # v_rc = Rᵀ v_w (robocentric)
        r = np.asarray(jax.vmap(quat_to_rot)(q_gt))
        parts["gt_p"].append(np.asarray(p_fr).reshape(k, w1 + 1, 3))
        parts["gt_q"].append(np.asarray(q_gt).reshape(k, w1 + 1, 4))
        v_w = np.einsum("kij,kj->ki", r, np.asarray(v_rc))
        parts["gt_v"].append(v_w.reshape(k, w1 + 1, 3))

    return WindowBank(
        **{
            k: np.concatenate(v).astype(np.float32)[:n_windows]
            for k, v in parts.items()
        }
    )


def make_fil_loss(model, fparams, cfg: FilConfig, vio_cfg: VioConfig,
                  c_rot_i, i_t_i2c, tex_bank, tex_indices):
    """loss(params, bank_slice, key) -> scalar. Differentiable through the
    full W-frame filter scan of ``run_sequence`` (network inside)."""
    from cuahn_vio.data.sensor_effects import (
        EffectsConfig, apply_photometric, draw_params,
    )
    from cuahn_vio.data.synthetic import render_frame_blurred
    from cuahn_vio.data.textures import random_tex_params

    eff_cfg = EffectsConfig()

    def window_loss(params, win, key):
        ks = jax.random.split(key, 10)
        # ---- imagery: random held-in texture, blur taps, effects chain
        idx = tex_indices[jax.random.randint(ks[0], (), 0, tex_indices.shape[0])]
        texture = tex_bank[idx]
        tparams = random_tex_params(ks[1], cfg.tex_scale_range)
        lens = draw_params(ks[2], eff_cfg)

        def render_one(p_taps, q_taps, k):
            img = render_frame_blurred(
                p_taps, q_taps, c_rot_i, i_t_i2c, None,
                cfg.img_hw[0], cfg.img_hw[1], texture, tparams,
            )
            img = apply_photometric(img, k, lens)
            return jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)

        fkeys = jax.random.split(ks[3], win["tap_p"].shape[0])
        imgs = jax.vmap(render_one)(win["tap_p"], win["tap_q"], fkeys)

        # ---- IMU: fresh bias + white noise draw
        bg = jax.random.normal(ks[4], (3,)) * cfg.bias_g
        ba = jax.random.normal(ks[5], (3,)) * cfg.bias_a
        w_m = win["w_true"] + bg + jax.random.normal(
            ks[6], win["w_true"].shape) * cfg.sigma_w
        a_m = win["a_true"] + ba + jax.random.normal(
            ks[7], win["a_true"].shape) * cfg.sigma_a

        # ---- initial state: GT + perturbation consistent with cov0
        ik = jax.random.split(ks[8], 5)
        p_sig = jnp.asarray(cfg.init_pos_sigma)
        q0_gt, p0_w, v0_w = win["gt_q"][0], win["gt_p"][0], win["gt_v"][0]
        dtheta = jnp.concatenate([
            jax.random.normal(ik[0], (2,)) * cfg.init_tilt_sigma,
            jnp.zeros(1),  # yaw is gauge-fixed exactly
        ])
        q0 = quat_mul(q0_gt, quat_exp(dtheta))
        r0 = quat_to_rot(q0)
        p0 = r0.T @ p0_w + jax.random.normal(ik[1], (3,)) * p_sig
        v0 = r0.T @ v0_w + jax.random.normal(ik[2], (3,)) * cfg.init_vel_sigma
        ba0 = jax.random.normal(ik[3], (3,)) * cfg.init_ba_sigma
        bg0 = jax.random.normal(ik[4], (3,)) * cfg.init_bg_sigma
        diag = jnp.concatenate([
            p_sig**2,
            jnp.array([cfg.init_tilt_sigma**2, cfg.init_tilt_sigma**2, 1e-10]),
            jnp.full(3, cfg.init_vel_sigma**2),
            jnp.full(3, cfg.init_ba_sigma**2),
            jnp.full(3, cfg.init_bg_sigma**2),
            jnp.zeros(12),
        ])
        state0 = FilterState(
            p=p0, q=q0, v=v0, ba=ba0, bg=bg0,
            off=jnp.zeros((4, 3)), cov=jnp.diag(diag),
        )

        # ---- the deployed scan, gradients on
        _, outs = run_sequence(
            state0, model, params, fparams, vio_cfg,
            imgs, w_m, a_m, win["dt"], ks[9],
        )

        # ---- window loss vs GT, later frames weighted more
        wgt = jnp.arange(1, cfg.window + 1, dtype=jnp.float32)
        wgt = wgt / wgt.sum()
        e_pos = jnp.sum((outs.p_world - win["gt_p"][1:]) ** 2, axis=1)
        r_gt = jax.vmap(quat_to_rot)(win["gt_q"][1:])
        v_gt_body = jnp.einsum("kij,ki->kj", r_gt, win["gt_v"][1:])
        e_vel = jnp.sum((outs.v_body - v_gt_body) ** 2, axis=1)
        dq = jax.vmap(lambda a, b: quat_log(quat_mul(quat_conj(a), b)))(
            win["gt_q"][1:], outs.q
        )
        e_tilt = jnp.sum(dq[:, :2] ** 2, axis=1)
        loss = jnp.sum(
            wgt * (cfg.w_pos * e_pos + cfg.w_vel * e_vel + cfg.w_tilt * e_tilt)
        )

        if cfg.w_cons > 0.0:
            # filter-consistency: per-frame velocity (3-DoF) and tilt
            # (2-DoF) NEES from the filter's own reported covariance;
            # log-symmetric so over- and under-confidence both penalize,
            # clipped so a singular block cannot blow up the loss
            ev = outs.v_body - v_gt_body  # (W, 3)
            pv = outs.cov_core[:, 6:9, 6:9]
            nees_v = jax.vmap(
                lambda e, p: e @ jnp.linalg.solve(
                    p + 1e-10 * jnp.eye(3), e
                )
            )(ev, pv)
            et = dq[:, :2]
            pt = outs.cov_core[:, 3:5, 3:5]
            nees_t = jax.vmap(
                lambda e, p: e @ jnp.linalg.solve(
                    p + 1e-12 * jnp.eye(2), e
                )
            )(et, pt)
            l_cons = jnp.sum(
                wgt * (
                    jnp.log(jnp.clip(nees_v / 3.0, 1e-3, 1e6)) ** 2
                    + jnp.log(jnp.clip(nees_t / 2.0, 1e-3, 1e6)) ** 2
                )
            )
            loss = loss + cfg.w_cons * l_cons
        return loss

    def loss_fn(params, bank_slice, key):
        keys = jax.random.split(key, cfg.batch_size)
        losses = jax.vmap(
            lambda w, k: window_loss(params, w, k),
            in_axes=({k: 0 for k in WindowBank._fields}, 0),
        )(bank_slice, keys)
        fin = jnp.isfinite(losses)
        return jnp.sum(jnp.where(fin, losses, 0.0)) / jnp.maximum(
            jnp.sum(fin), 1
        )

    return loss_fn


def fil_finetune(
    model,
    params,
    fparams,
    c_rot_i,
    i_t_i2c,
    cfg: FilConfig = FilConfig(),
    steps: int = 2000,
    lr: float = 2e-5,
    seed: int = 0,
    bank: WindowBank | None = None,
    log_every: int = 20,
    log_fn=print,
    checkpoint_path: str | None = None,
    save_every: int = 200,
    pair_step_every: int = 2,
    pair_cfg=None,
):
    """Fine-tune ``params`` with FIL windows, interleaving standard
    single-pair steps every ``pair_step_every`` steps as an anchor so the
    covariance head keeps its NLL calibration while the gain path adapts.
    """
    import optax

    from cuahn_vio.data.textures import get_texture_bank, train_indices
    from cuahn_vio.ops import warp as _warp
    from cuahn_vio.train.trainer import (
        TrainConfig, make_batch, make_optimizer, make_train_step,
    )

    _warp.WARP_IMPL = "mm"  # batched training: XLA matmul formulation

    if bank is None:
        log_fn("building FIL window bank (CPU subprocess, cached)...",
               flush=True)
        bank = cached_window_bank(cfg=cfg, seed=seed)
    n_win = bank.tap_p.shape[0]
    log_fn(f"FIL bank: {n_win} windows of {cfg.window} frames", flush=True)

    bank_np = get_texture_bank()
    tex_bank = jnp.asarray(bank_np)
    tex_idx = jnp.asarray(train_indices(len(bank_np)))
    bank_dev = jax.tree.map(jnp.asarray, bank._asdict())

    vio_cfg = VioConfig(update_gate_frames=-1)  # update from frame 0
    loss_fn = make_fil_loss(
        model, fparams, cfg, vio_cfg, c_rot_i, i_t_i2c, tex_bank, tex_idx
    )

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, 100, max(steps, 101), end_value=lr * 0.1
    )
    pair_cfg = pair_cfg or TrainConfig(batch_size=8)
    tx = make_optimizer(pair_cfg, sched)
    opt_state = tx.init(params)

    @jax.jit
    def fil_step(params, opt_state, bank_slice, key):
        (loss), grads = jax.value_and_grad(loss_fn)(params, bank_slice, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    pair_step = make_train_step(model, pair_cfg, tx)
    gen_pair = jax.jit(
        lambda k: make_batch(k, c_rot_i, i_t_i2c, pair_cfg, 224, 320,
                             tex_bank, tex_idx, None)
    )

    key = jax.random.PRNGKey(seed)
    host_rng = np.random.default_rng(seed)
    for i in range(steps):
        key, kb, ks = jax.random.split(key, 3)
        if pair_step_every and i % pair_step_every == (pair_step_every - 1):
            batch = gen_pair(kb)
            params, opt_state, loss, _ = pair_step(
                params, opt_state, batch, ks, bool(host_rng.random() < 0.5)
            )
            tag = "pair"
        else:
            sel = host_rng.choice(n_win, cfg.batch_size, replace=False)
            bank_slice = {k: v[jnp.asarray(sel)] for k, v in bank_dev.items()}
            params, opt_state, loss = fil_step(params, opt_state, bank_slice, ks)
            tag = "fil"
        if log_every and (i % log_every == 0 or i == steps - 1):
            log_fn(f"step {i:5d} [{tag}] loss {float(loss):.5f}", flush=True)
        if checkpoint_path and save_every and i and i % save_every == 0:
            from cuahn_vio.utils.checkpoint import save_params

            save_params(checkpoint_path, params)
    return params
