"""Host orchestration: streaming init -> windowing -> jitted scan -> files.

Replaces the reference's VioManager + ROS node glue (VioManager.cpp:123-198,
ros_subscribe_cuahn.cpp) for offline/batch execution: instead of callbacks
mutating shared state, the host (a) replays the IMU stream into the
initializer exactly like feed_measurement_imu, (b) precomputes padded IMU
windows, and (c) hands fixed-shape arrays to the jitted scan.

Two execution modes:
- ``run_offline``: whole sequence under one jit (max throughput).
- ``run_stepwise``: per-frame jitted step with host stage timers, emitting
  the reference's timing CSV schema (VioManager.cpp:98,304-312).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cuahn_vio.filter import (
    FilterParams,
    initial_state,
    propagate_window,
    try_initialize,
)
from cuahn_vio.pipeline.imu_window import build_imu_windows, select_imu_readings
from cuahn_vio.pipeline.vio import FrameOutput, VioConfig, make_vio_step, run_sequence, VioCarry
from cuahn_vio.ops.quat import quat_to_rot


@dataclass
class RunnerOptions:
    """Mirrors the launch-file knobs used by the runner
    (uzhfpv.launch:17-19,43,66-67)."""

    calib_camimu_dt: float = -0.0148489
    init_window_time: float = 1.0
    init_imu_thresh: float = 0.5
    init_height: float = 0.1
    gravity_mag: float = 9.81
    max_imu_steps_per_frame: int = 64


class RunResult(NamedTuple):
    times: np.ndarray  # (F,) output timestamps (IMU clock)
    pose_w: np.ndarray  # (F, 7) [x y z qx qy qz qw] (file convention)
    cov_ori: np.ndarray  # (F, 3, 3)
    cov_pos: np.ndarray  # (F, 3, 3)
    t0: float
    stage_ms: Optional[np.ndarray]  # (F, 5) timing rows or None
    v_body: Optional[np.ndarray] = None  # (F, 3) velocity, IMU frame
    ba: Optional[np.ndarray] = None  # (F, 3) accel bias estimate
    bg: Optional[np.ndarray] = None  # (F, 3) gyro bias estimate
    cov_diag: Optional[np.ndarray] = None  # (F, 15) core cov diagonal
    cov_core: Optional[np.ndarray] = None  # (F, 15, 15) full core cov block
    n_recoveries: int = 0  # divergence-guard rollbacks (stepwise runner)
    net_chi2: Optional[np.ndarray] = None  # (F,) innovation chi2 per frame
    net_inno: Optional[np.ndarray] = None  # (F, 8) innovations (normalized)
    cov_meas: Optional[np.ndarray] = None  # (F, 8, 8) H P H^T per frame
    net_cov88: Optional[np.ndarray] = None  # (F, 8, 8) network cov (px^2)
    net_mean: Optional[np.ndarray] = None  # (F, 8) network 4pt flow (px)


def _streaming_init(imu_t, imu_w, imu_a, cam_t, opts: RunnerOptions):
    """Replay frames; at each camera time, attempt initialization with the
    IMU seen so far (feed_measurement_imu + try_to_initialize semantics).

    Returns (init result, index of first processed camera frame).
    """
    for fi, tc in enumerate(cam_t):
        t_imu_cut = tc + opts.calib_camimu_dt
        n = int(np.searchsorted(imu_t, t_imu_cut, side="right"))
        res = try_initialize(
            imu_t[:n], imu_w[:n], imu_a[:n],
            window_length=opts.init_window_time,
            imu_excite_threshold=opts.init_imu_thresh,
            init_height=opts.init_height,
            gravity_mag=opts.gravity_mag,
        )
        if res is not None:
            return res, fi
    return None, -1


def _outputs_to_result(out: FrameOutput, times, t0, stage_ms=None) -> RunResult:
    p = np.asarray(out.p_world)
    q = np.asarray(out.q)  # wxyz
    pose = np.concatenate([p, q[:, [1, 2, 3, 0]]], axis=1)
    cov = np.asarray(out.cov_core)
    return RunResult(
        times=np.asarray(times),
        pose_w=pose,
        cov_ori=cov[:, 3:6, 3:6],
        cov_pos=cov[:, 0:3, 0:3],
        t0=t0,
        stage_ms=stage_ms,
        v_body=np.asarray(out.v_body),
        ba=np.asarray(out.ba),
        bg=np.asarray(out.bg),
        cov_diag=np.einsum("fii->fi", cov).copy(),
        cov_core=cov,
        net_chi2=np.asarray(out.net_chi2),
        net_inno=np.asarray(out.net_inno),
        cov_meas=np.asarray(out.cov_meas),
        net_cov88=np.asarray(out.net_cov88),
        net_mean=np.asarray(out.net_mean),
    )


def prepare_sequence(
    imu_t, imu_w, imu_a, cam_t, frames_u8, opts: RunnerOptions,
    fparams: FilterParams,
):
    """Initialization + window building.

    Returns (init, state0, win, cam_used, frames_used) where ``state0`` is
    already propagated to the FIRST processed frame's time, and ``win``
    holds F-1 padded windows, entry k covering frame k -> frame k+1 —
    exactly the scan steps over image pairs.
    """
    init, fi = _streaming_init(imu_t, imu_w, imu_a, cam_t, opts)
    if init is None:
        raise RuntimeError("initialization never fired (no jerk detected)")

    cam_used = cam_t[fi:]
    frames_used = frames_u8[fi:]
    frame_times_imu = cam_used + opts.calib_camimu_dt

    # window 0 (init t0 -> first frame) can span seconds (t0 sits one init
    # window in the past, InertialInitializer.cpp:266-272); it runs once
    # outside the scan, so give it an exact-size window.
    state0 = initial_state(init)
    if float(fparams.bias_sigma) > 0.0:
        from cuahn_vio.filter.state import with_bias_block

        state0 = with_bias_block(state0, fparams)
    t0s, w0s, a0s = select_imu_readings(
        imu_t, imu_w, imu_a, init.t0, frame_times_imu[0]
    )
    if t0s.shape[0] >= 2:
        dt0 = np.diff(t0s).astype(np.float32)
        w0 = (0.5 * (w0s[:-1] + w0s[1:])).astype(np.float32)
        a0 = (0.5 * (a0s[:-1] + a0s[1:])).astype(np.float32)
        state0 = propagate_window(
            state0, fparams, jnp.array(w0), jnp.array(a0), jnp.array(dt0)
        )

    win = build_imu_windows(
        imu_t, imu_w, imu_a, frame_times_imu[0], frame_times_imu[1:],
        max_steps=opts.max_imu_steps_per_frame,
    )
    return init, state0, win, cam_used, frames_used


def run_offline(
    imu_t, imu_w, imu_a, cam_t, frames_u8,
    model: Any, net_params: Any, fparams: FilterParams,
    cfg: VioConfig, opts: RunnerOptions, seed: int = 0,
) -> RunResult:
    """Whole-sequence jitted run (lax.scan). Returns per-frame world poses
    for the second processed frame onward (scan steps are image pairs)."""
    init, state0, win, cam_used, frames_used = prepare_sequence(
        imu_t, imu_w, imu_a, cam_t, frames_u8, opts, fparams
    )
    final_state, outs = run_sequence(
        state0, model, net_params, fparams, cfg,
        jnp.array(frames_used),
        jnp.array(win.w_mid), jnp.array(win.a_mid), jnp.array(win.dt),
        jax.random.PRNGKey(seed),
    )
    times_out = cam_used[1:] + opts.calib_camimu_dt
    return _outputs_to_result(outs, times_out, init.t0)


def run_stepwise(
    imu_t, imu_w, imu_a, cam_t, frames_u8,
    model: Any, net_params: Any, fparams: FilterParams,
    cfg: VioConfig, opts: RunnerOptions, seed: int = 0,
    staged_timing: bool = True,
) -> RunResult:
    """Per-frame jitted step with host stage timing, emitting the reference
    CSV columns (VioManager.cpp:98): [load, prop, net, update, total] ms.

    With ``staged_timing`` (default), propagation / inference / update run
    as separately-jitted calls so every column is a real measurement, like
    the reference's inline rT1..rT5 stamps (VioManager.cpp:167-270). With
    ``staged_timing=False``, one fused jitted step runs (lowest total
    latency — what deployment would use) and the fused device time is
    attributed to the network column, the other two reported as 0.
    """
    init, state0, win, cam_used, frames_used = prepare_sequence(
        imu_t, imu_w, imu_a, cam_t, frames_u8, opts, fparams
    )
    step = jax.jit(make_vio_step(model, net_params, fparams, cfg))
    carry = VioCarry(state=state0, frame_idx=jnp.zeros((), jnp.int32))

    frames_dev = jnp.array(frames_used)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(cam_used))

    from cuahn_vio.filter.health import health_flags

    health = jax.jit(lambda s: health_flags(s).ok)

    @jax.jit
    def _state_output(state, failed_out: FrameOutput) -> FrameOutput:
        """FrameOutput for a rolled-back state: pose/cov come from the
        recovered state, network diagnostics stay those of the failed
        attempt (they describe what went wrong at THIS frame)."""
        rot = quat_to_rot(state.q)
        return failed_out._replace(
            p_world=rot @ state.p,
            q=state.q,
            v_body=state.v,
            cov_core=state.cov[:15, :15],
            ba=state.ba,
            bg=state.bg,
        )

    last_good = carry
    n_recoveries = 0

    if staged_timing:
        from cuahn_vio.pipeline.vio import make_vio_stages

        prop_fn, net_fn, upd_fn, finish_fn, refine_fn = make_vio_stages(
            model, net_params, fparams, cfg
        )
        prop_j = jax.jit(prop_fn)
        net_j = jax.jit(net_fn) if model is not None else None
        upd_j = jax.jit(upd_fn, static_argnames=("update_offset", "cov_update"))
        fin_j = jax.jit(finish_fn)
        refine_j = jax.jit(refine_fn)

        def staged_frame(carry: VioCarry, xs):
            """vio_step re-composed from the stage jits, returning per-stage
            host wall times: (carry', out, [prop, net, upd] ms)."""
            img_prev, img_curr, w, a, dt, key = xs
            t0 = time.perf_counter()
            state = prop_j(carry.state, w, a, dt)
            jax.block_until_ready(state.p)
            t1 = time.perf_counter()
            net_ms = upd_ms = 0.0
            net_mean = jnp.zeros(8, jnp.float32)
            net_cov88 = jnp.zeros((8, 8), jnp.float32)
            calib = (
                jnp.zeros((), jnp.float32),
                jnp.zeros(8, jnp.float32),
                jnp.zeros((8, 8), jnp.float32),
            )
            if model is not None:
                from cuahn_vio.filter.update import propagated_offset8

                prior8 = propagated_offset8(state)
                for it in range(cfg.max_iekf_iterations):
                    tn0 = time.perf_counter()
                    flow8, cov88 = net_j(prior8, img_prev, img_curr, key, it)
                    jax.block_until_ready(flow8)
                    tn1 = time.perf_counter()
                    last = it == cfg.max_iekf_iterations - 1
                    if last:
                        state, calib = upd_j(
                            state, carry.frame_idx, flow8, cov88,
                            update_offset=False, cov_update=True,
                        )
                        jax.block_until_ready(state.p)
                    else:
                        # same startup gate as the real update (ADVICE r4)
                        if int(carry.frame_idx) > cfg.update_gate_frames:
                            prior8 = refine_j(state, flow8, cov88)
                        jax.block_until_ready(prior8)
                    tn2 = time.perf_counter()
                    net_ms += (tn1 - tn0) * 1e3
                    upd_ms += (tn2 - tn1) * 1e3
                    net_mean, net_cov88 = flow8, cov88
            tf0 = time.perf_counter()
            state, out = fin_j(state, net_mean, net_cov88, calib)
            jax.block_until_ready(state.p)
            upd_ms += (time.perf_counter() - tf0) * 1e3
            prop_ms = (t1 - t0) * 1e3
            new_carry = VioCarry(state=state, frame_idx=carry.frame_idx + 1)
            return new_carry, out, (prop_ms, net_ms, upd_ms)

    # warm-up compile on frame 0's inputs so the first timing row measures
    # steady state, not jit (the reference warm-ups at construction,
    # HomographyNet.cpp:28-63); the carry is discarded.
    warm_xs = (
        frames_dev[0], frames_dev[0],
        jnp.array(win.w_mid[0]), jnp.array(win.a_mid[0]),
        jnp.array(win.dt[0]), keys[0],
    )
    if staged_timing:
        _warm, _, _ = staged_frame(carry, warm_xs)
    else:
        _warm, _ = step(carry, warm_xs)
    jax.block_until_ready(_warm.state.p)
    _ = health(_warm.state)

    rows, outs_list, stage = [], [], []
    for f in range(1, len(cam_used)):
        t_a = time.perf_counter()
        xs = (
            frames_dev[f - 1], frames_dev[f],
            jnp.array(win.w_mid[f - 1]), jnp.array(win.a_mid[f - 1]),
            jnp.array(win.dt[f - 1]), keys[f],
        )
        t_b = time.perf_counter()
        if staged_timing:
            carry, out, (prop_ms, net_ms, upd_ms) = staged_frame(carry, xs)
        else:
            carry, out = step(carry, xs)
        jax.block_until_ready(carry.state.p)
        t_c = time.perf_counter()
        # divergence guard (SURVEY.md §5.3: the reference has none and its
        # shipped estimate ends in NaNs): on a failed health check, roll
        # back to the last healthy state, inflate its covariance so the
        # next update trusts the measurement less, and keep going.
        if not bool(health(carry.state)):
            n_recoveries += 1
            s = last_good.state
            s = s._replace(cov=s.cov * 10.0 + jnp.eye(27) * 1e-6)
            if s.cov_xb is not None:
                # decorrelating the bias keeps the inflated joint cov PSD
                s = s._replace(cov_xb=jnp.zeros_like(s.cov_xb))
            carry = VioCarry(state=s, frame_idx=last_good.frame_idx + 1)
            # emit the ROLLED-BACK state's pose under this frame's
            # timestamp (not a duplicate of the previous row)
            out = _state_output(carry.state, out)
        else:
            last_good = carry
        outs_list.append(jax.device_get(out))
        load_ms = (t_b - t_a) * 1e3
        total_ms = (t_c - t_a) * 1e3
        if staged_timing:
            stage.append([load_ms, prop_ms, net_ms, upd_ms, total_ms])
        else:
            stage.append([load_ms, 0.0, (t_c - t_b) * 1e3, 0.0, total_ms])
        rows.append(cam_used[f] + opts.calib_camimu_dt)

    outs = jax.tree.map(lambda *xs: np.stack(xs), *outs_list)
    res = _outputs_to_result(
        FrameOutput(*outs), np.asarray(rows), init.t0, np.asarray(stage)
    )
    return res._replace(n_recoveries=n_recoveries)
