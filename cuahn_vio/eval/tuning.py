"""Filter-parameter sweep by measurement replay — TPU-vmapped grid search.

The reference tunes its two filter knobs (K_net_Cov, UpdaterOptions.h:33;
the NoiseManager sigmas, Propagator.h:47-80) by hand against rosbag runs,
each trial costing a full network re-run. Here the expensive part — network
inference per frame — is logged ONCE by ``run-vio --state-out`` (net_mean /
net_cov88 per frame), and the cheap part — the 27-state filter — is re-run
for a whole grid of parameter configurations in a single ``jax.vmap`` over
the stacked FilterParams pytree: hundreds of full-sequence filter replays in
one device launch.

Caveat (same as eval/calibration.py): the logged measurements were produced
under the ORIGINAL parameters, and parameters feed back into the
measurements through the propagated prior handed to the network. The sweep
is therefore a first-order search; the winning configuration must be
confirmed with a real ``run-vio`` re-run.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cuahn_vio.filter import initial_state, propagate_window
from cuahn_vio.filter.state import FilterParams, make_params
from cuahn_vio.pipeline.imu_window import build_imu_windows, select_imu_readings
from cuahn_vio.pipeline.runner import RunnerOptions, _streaming_init
from cuahn_vio.pipeline.vio import VioConfig, run_sequence_with_measurements


@dataclass(frozen=True)
class SweepConfig:
    """One point of the filter-parameter grid (multipliers on the base)."""

    k_net_cov: float = 10.0
    chi2_gate: float = 1000.0
    q_scale: float = 1.0  # multiplies the whole 15x15 process noise Q
    q_pos_extra: float = 1.0e-4  # the Propagator.h:97 extra position noise
    # round-5 correlated-error knobs (filter/state.py): OU measurement
    # bias (px / seconds), adaptive-R soft threshold, prior-echo fraction
    bias_sigma_px: float = 0.0
    bias_tau: float = 2.0
    chi2_soft: float = float("inf")
    echo_beta: float = 0.0


def _stack_params(base: FilterParams, grid: list[SweepConfig]) -> FilterParams:
    """Stack one FilterParams per SweepConfig into a batched pytree."""

    def one(cfg: SweepConfig) -> FilterParams:
        q = base.q_noise * cfg.q_scale
        q = q.at[12:15, 12:15].set(
            jnp.eye(3, dtype=q.dtype) * cfg.q_pos_extra
        )
        return base._replace(
            q_noise=q,
            k_net_cov=jnp.asarray(cfg.k_net_cov, base.k_net_cov.dtype),
            chi2_gate=jnp.asarray(cfg.chi2_gate, jnp.float32),
            bias_sigma=jnp.asarray(cfg.bias_sigma_px / 159.5, jnp.float32),
            bias_tau=jnp.asarray(cfg.bias_tau, jnp.float32),
            chi2_soft=jnp.asarray(cfg.chi2_soft, jnp.float32),
            echo_beta=jnp.asarray(cfg.echo_beta, jnp.float32),
        )

    return jax.tree.map(lambda *xs: jnp.stack(xs), *[one(c) for c in grid])


def replay_measurements(
    imu_t: np.ndarray,
    imu_w: np.ndarray,
    imu_a: np.ndarray,
    cam_t: np.ndarray,
    net_mean: np.ndarray,  # (F, 8) logged network flows, px
    net_cov88: np.ndarray,  # (F, 8, 8) logged network covariances, px^2
    base_params: FilterParams,
    grid: list[SweepConfig],
    opts: RunnerOptions,
    vio_cfg: Optional[VioConfig] = None,
):
    """Re-run the filter over logged measurements for every grid point.

    The measurement log must come from a ``run-vio --state-out`` of the SAME
    sequence (rows follow the runner's frame order: one row per processed
    frame pair, zero matrices where no inference ran).

    Returns (outs, times): ``outs`` is a FrameOutput pytree with a leading
    grid axis, ``times`` the per-frame output timestamps.
    """
    vio_cfg = vio_cfg or VioConfig()
    init, fi = _streaming_init(imu_t, imu_w, imu_a, cam_t, opts)
    if init is None:
        raise RuntimeError("initialization never fired (no jerk detected)")
    cam_used = cam_t[fi:]
    frame_times_imu = cam_used + opts.calib_camimu_dt

    state0 = initial_state(init)
    t0s, w0s, a0s = select_imu_readings(
        imu_t, imu_w, imu_a, init.t0, frame_times_imu[0]
    )
    have_w0 = t0s.shape[0] >= 2
    if have_w0:
        dt0 = jnp.asarray(np.diff(t0s), jnp.float32)
        w0 = jnp.asarray(0.5 * (w0s[:-1] + w0s[1:]), jnp.float32)
        a0 = jnp.asarray(0.5 * (a0s[:-1] + a0s[1:]), jnp.float32)

    win = build_imu_windows(
        imu_t, imu_w, imu_a, frame_times_imu[0], frame_times_imu[1:],
        max_steps=opts.max_imu_steps_per_frame,
    )
    n = win.w_mid.shape[0]
    if net_mean.shape[0] != n:
        raise ValueError(
            f"measurement log has {net_mean.shape[0]} rows, sequence has "
            f"{n} frame pairs — state npz from a different run?"
        )

    z_mean = jnp.asarray(net_mean, jnp.float32)
    z_cov = jnp.asarray(net_cov88, jnp.float32)
    # zero-cov rows are frames where no inference ran (gated / warm-up)
    z_valid = jnp.einsum("fii->f", z_cov) > 0
    w_win = jnp.asarray(win.w_mid)
    a_win = jnp.asarray(win.a_mid)
    dt_win = jnp.asarray(win.dt)

    def run_one(fparams: FilterParams):
        # always attach the bias block so the vmapped pytree structure is
        # uniform across grid points; with sigma_b = 0 it is an exact
        # no-op (tests/test_meas_bias.py::test_zero_sigma_bias_block_is_inert)
        from cuahn_vio.filter.state import with_bias_block

        s0 = with_bias_block(state0, fparams)
        s0 = (
            propagate_window(s0, fparams, w0, a0, dt0)
            if have_w0
            else s0
        )
        _, outs = run_sequence_with_measurements(
            s0, fparams, vio_cfg, z_mean, z_cov, z_valid, w_win, a_win, dt_win
        )
        return outs

    batched = _stack_params(base_params, grid)
    outs = jax.jit(jax.vmap(run_one))(batched)
    times = cam_used[1:] + opts.calib_camimu_dt
    return jax.device_get(outs), np.asarray(times)


def score_sweep(
    outs,
    times: np.ndarray,
    gt_times: np.ndarray,
    gt_pose: np.ndarray,  # (N, 7) [x y z qx qy qz qw]
    state_gt=None,  # Optional StateGT for NEES
    grid: Optional[list[SweepConfig]] = None,
) -> list[dict]:
    """ATE (se3-aligned pos rmse) + pos NEES per grid point."""
    from cuahn_vio.eval.metrics import ResultTrajectory
    from cuahn_vio.eval.simulation import ResultSimulation
    from cuahn_vio.eval.traj_io import Trajectory

    n_grid = outs.p_world.shape[0]
    results = []
    for g in range(n_grid):
        p = outs.p_world[g]
        q = outs.q[g]
        pose = np.concatenate([p, q[:, [1, 2, 3, 0]]], axis=1)
        row: dict = {"grid_index": g}
        if grid is not None:
            c = grid[g]
            row.update(
                k_net_cov=c.k_net_cov, chi2_gate=c.chi2_gate,
                q_scale=c.q_scale, q_pos_extra=c.q_pos_extra,
            )
        if not np.all(np.isfinite(pose)):
            row.update(ate_pos=float("inf"), nees_pos=float("inf"))
            results.append(row)
            continue
        try:
            traj = ResultTrajectory(
                Trajectory(times, pose, None, None),
                Trajectory(gt_times, gt_pose, None, None),
                "se3",
            )
            ate_o, ate_p = traj.calculate_ate()
            row["ate_pos"] = float(ate_p.rmse)
            row["ate_ori"] = float(ate_o.rmse)
        except Exception as e:  # no overlap etc.
            row["ate_pos"] = float("inf")
            row["ate_err"] = str(e)
        if state_gt is not None:
            try:
                sim = ResultSimulation(
                    times, pose, state_gt,
                    est_v_body=outs.v_body[g],
                    est_ba=outs.ba[g], est_bg=outs.bg[g],
                    est_cov_diag=np.einsum("fii->fi", outs.cov_core[g]),
                    est_cov_core=outs.cov_core[g],
                )
                neo, nep = sim.calculate_nees()
                row["nees_pos"] = float(nep.mean)
                row["nees_pos_med"] = float(nep.median)
                row["nees_ori"] = float(neo.mean)
            except Exception:
                row["nees_pos"] = float("inf")
        chi2 = outs.net_chi2[g]
        finite = np.isfinite(chi2) & (chi2 > 0)
        if finite.any():
            row["chi2_median"] = float(np.median(chi2[finite]))
            if grid is not None:
                row["n_gated"] = int(
                    (chi2[finite] >= grid[g].chi2_gate).sum()
                )
        results.append(row)
    return results
