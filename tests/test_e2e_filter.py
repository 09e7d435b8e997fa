"""End-to-end filter tests on synthetic trajectories.

1. Dead reckoning: noiseless IMU -> propagation alone must track GT.
2. Oracle VIO: propagate + update with ground-truth homography flows ->
   the full filter cycle (incl. reset/gating) must track GT tightly and
   beat dead reckoning under noise.

These validate everything except the network: initializer, windowing,
propagation, measurement model, update, reset (SURVEY.md §7 step 3/5).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuahn_vio.data.oracle import true_corner_flow
from cuahn_vio.data.synthetic import AnalyticTrajectory, make_sequence
from cuahn_vio.filter import make_params
from cuahn_vio.pipeline import RunnerOptions, prepare_sequence
from cuahn_vio.pipeline.vio import VioConfig, run_sequence_with_measurements
from cuahn_vio.filter.propagate import propagate_window
from cuahn_vio.ops.quat import quat_to_rot

T_ITOC_SYN = np.array(
    [
        [1.0, 0.0, 0.0, 0.02],
        [0.0, -1.0, 0.0, -0.01],
        [0.0, 0.0, -1.0, 0.005],
        [0.0, 0.0, 0.0, 1.0],
    ]
)  # camera looking straight down, x aligned


def _make(duration=6.0, **kw):
    traj = AnalyticTrajectory()
    seq = make_sequence(
        traj,
        T_ITOC_SYN,
        duration=duration,
        cam_hz=20.0,
        **kw,
    )
    return traj, seq


OPTS = RunnerOptions(
    calib_camimu_dt=0.0, init_imu_thresh=0.2, init_height=1.5
)


def _gt_world_positions(traj, times, t_still=2.5):
    f = jax.vmap(lambda t: traj.pos_w(t))
    return np.asarray(f(jnp.array(np.maximum(times - t_still, 0.0), jnp.float32)))


def test_dead_reckoning_tracks_gt():
    traj, seq = _make()
    fparams = make_params(T_ITOC_SYN)
    init, state0, win, cam_used, _ = prepare_sequence(
        seq.imu_t, seq.imu_w, seq.imu_a, seq.cam_t, seq.frames, OPTS, fparams
    )
    # initializer must recover hover: v=0, biases~0, level attitude
    np.testing.assert_allclose(init.bg0, 0.0, atol=1e-6)
    np.testing.assert_allclose(init.ba0, 0.0, atol=1e-6)

    state = state0
    pos_err = []
    for f in range(win.dt.shape[0]):
        state = propagate_window(
            state, fparams,
            jnp.array(win.w_mid[f]), jnp.array(win.a_mid[f]), jnp.array(win.dt[f]),
        )
        p_w = np.asarray(quat_to_rot(state.q) @ state.p)
        t = cam_used[f + 1]
        p_gt = _gt_world_positions(traj, np.array([t]))[0]
        pos_err.append(np.linalg.norm(p_w - p_gt))
    pos_err = np.asarray(pos_err)
    # noiseless IMU, float32, ~3.5 s of flight: expect centimeter-level drift
    assert pos_err[-1] < 0.08, pos_err[-1]
    assert pos_err.max() < 0.1


def _oracle_measurements(traj, cam_used, fparams, t_still=2.5):
    ts = np.maximum(cam_used - t_still, 0.0)
    pose_fn = jax.vmap(lambda t: (traj.pos_w(t), traj.quat_i2w(t)))
    p_all, q_all = pose_fn(jnp.array(ts, jnp.float32))
    flow_fn = jax.vmap(
        lambda p1, q1, p2, q2: true_corner_flow(
            p1, q1, p2, q2, fparams.c_rot_i, fparams.i_t_i2c
        )
    )
    flows = flow_fn(p_all[:-1], q_all[:-1], p_all[1:], q_all[1:])
    return np.asarray(flows)


@pytest.mark.parametrize("noisy", [False, True])
def test_oracle_vio_tracks_gt(noisy):
    kw = dict(sigma_w=2e-3, sigma_a=2e-2, bias_g=2e-3, bias_a=5e-3, seed=3) if noisy else {}
    traj, seq = _make(duration=8.0, **kw)
    fparams = make_params(T_ITOC_SYN)
    init, state0, win, cam_used, _ = prepare_sequence(
        seq.imu_t, seq.imu_w, seq.imu_a, seq.cam_t, seq.frames, OPTS, fparams
    )
    flows = _oracle_measurements(traj, cam_used, fparams)
    n = flows.shape[0]
    covs = np.tile(np.eye(8, dtype=np.float32) * 0.25, (n, 1, 1))
    cfg = VioConfig()
    _, outs = run_sequence_with_measurements(
        state0, fparams, cfg,
        jnp.array(flows), jnp.array(covs), jnp.ones(n, bool),
        jnp.array(win.w_mid), jnp.array(win.a_mid), jnp.array(win.dt),
    )
    p_est = np.asarray(outs.p_world)
    p_gt = _gt_world_positions(traj, cam_used[1:])
    err = np.linalg.norm(p_est - p_gt, axis=1)
    assert np.all(np.isfinite(err))
    # updates engage after frame 10; the filter must stay locked
    bound = 0.12 if not noisy else 0.35
    assert err[20:].max() < bound, err[20:].max()
    assert err[-1] < bound


def test_oracle_beats_dead_reckoning_under_noise():
    traj, seq = _make(duration=8.0, sigma_w=3e-3, sigma_a=3e-2, bias_g=3e-3, seed=7)
    fparams = make_params(T_ITOC_SYN)
    init, state0, win, cam_used, _ = prepare_sequence(
        seq.imu_t, seq.imu_w, seq.imu_a, seq.cam_t, seq.frames, OPTS, fparams
    )
    flows = _oracle_measurements(traj, cam_used, fparams)
    n = flows.shape[0]
    covs = np.tile(np.eye(8, dtype=np.float32) * 0.25, (n, 1, 1))
    cfg = VioConfig()

    _, outs_vio = run_sequence_with_measurements(
        state0, fparams, cfg,
        jnp.array(flows), jnp.array(covs), jnp.ones(n, bool),
        jnp.array(win.w_mid), jnp.array(win.a_mid), jnp.array(win.dt),
    )
    _, outs_dr = run_sequence_with_measurements(
        state0, fparams, cfg,
        jnp.array(flows), jnp.array(covs), jnp.zeros(n, bool),  # updates off
        jnp.array(win.w_mid), jnp.array(win.a_mid), jnp.array(win.dt),
    )
    p_gt = _gt_world_positions(traj, cam_used[1:])
    err_vio = np.linalg.norm(np.asarray(outs_vio.p_world) - p_gt, axis=1)
    err_dr = np.linalg.norm(np.asarray(outs_dr.p_world) - p_gt, axis=1)
    assert err_vio[-1] < err_dr[-1]
    assert err_vio[30:].mean() < err_dr[30:].mean()
