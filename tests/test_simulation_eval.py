"""Tests for the simulation-truth evaluation (ResultSimulation analog),
the B-spline SE(3) trajectory fixture, and the recorder/monitor utilities."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuahn_vio.data.bspline import (
    SplineTrajectory,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
)
from cuahn_vio.eval.recorder import Recorder, ResourceMonitor
from cuahn_vio.eval.simulation import (
    ResultSimulation,
    StateGT,
    load_state_gt,
    save_state_gt,
)
from cuahn_vio.eval.traj_io import load_pose_file
from cuahn_vio.ops.quat import quat_to_rot


# --------------------------------------------------------------- lie ops
def test_so3_exp_log_roundtrip(rng):
    for _ in range(10):
        w = rng.normal(size=3)
        n = np.linalg.norm(w)
        if n > 3.0:  # log only recovers |w| < pi
            w *= 3.0 / n
        w = jnp.array(w)
        r = so3_exp(w)
        np.testing.assert_allclose(np.asarray(so3_log(r)), np.asarray(w), atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(10):
        xi = jnp.array(rng.normal(size=6))
        t4 = se3_exp(xi)
        np.testing.assert_allclose(np.asarray(se3_log(t4)), np.asarray(xi), atol=1e-4)
        # valid SE(3)
        r = np.asarray(t4[:3, :3])
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_so3_exp_small_angle():
    r = so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-6)
    # gradient must be finite at the singular point
    g = jax.jacfwd(lambda w: so3_exp(w).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


# --------------------------------------------------------------- bspline
def _circle_controls(n=40, dt=0.5, radius=2.0):
    ctrl = np.zeros((n, 4, 4))
    for i in range(n):
        th = 0.15 * i
        c, s = np.cos(th), np.sin(th)
        ctrl[i] = np.eye(4)
        ctrl[i, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        ctrl[i, :3, 3] = [radius * c, radius * s, 1.5]
    return ctrl, dt


def test_spline_interpolates_controls():
    """At knot times the cumulative cubic spline doesn't pass exactly
    through controls, but must stay close for a smooth control sequence."""
    ctrl, dt = _circle_controls()
    spl = SplineTrajectory(ctrl, dt)
    for i in range(3, 8):
        t = i * dt
        p = np.asarray(spl.pos_w(jnp.array(t, jnp.float32)))
        assert np.linalg.norm(p - ctrl[i, :3, 3]) < 0.15


def test_spline_imu_consistency():
    """Angular rate from autodiff must match finite differences of the
    spline orientation; specific force integrates gravity."""
    ctrl, dt = _circle_controls()
    spl = SplineTrajectory(ctrl, dt)
    t = jnp.array(5.03, jnp.float32)
    w, f = spl.imu_true(t)
    # finite-difference w check
    eps = 1e-3
    r1 = quat_to_rot(spl.quat_i2w(t - eps))
    r2 = quat_to_rot(spl.quat_i2w(t + eps))
    dr = np.asarray(r1).T @ np.asarray(r2)
    w_fd = so3_log(jnp.array(dr)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_fd), atol=2e-2)
    assert np.all(np.isfinite(np.asarray(f)))


def test_spline_from_trajectory_file(tmp_path):
    ctrl, dt = _circle_controls()
    path = tmp_path / "traj.txt"
    from cuahn_vio.eval.traj_io import save_pose_file
    from cuahn_vio.ops.quat import rot_to_quat

    times = np.arange(len(ctrl)) * dt
    poses = np.zeros((len(ctrl), 7))
    for i in range(len(ctrl)):
        q = np.asarray(rot_to_quat(jnp.array(ctrl[i, :3, :3])))
        poses[i] = [*ctrl[i, :3, 3], q[1], q[2], q[3], q[0]]
    save_pose_file(str(path), times, poses)

    spl = SplineTrajectory.from_trajectory_file(str(path), dt=dt)
    p = np.asarray(spl.pos_w(jnp.array(4.0, jnp.float32)))
    assert np.linalg.norm(p - ctrl[8, :3, 3]) < 0.25


# --------------------------------------------------------- sim evaluation
def _make_gt(n=200):
    t = np.arange(n) * 0.05
    pose = np.zeros((n, 7))
    pose[:, 0] = np.sin(0.3 * t)
    pose[:, 1] = 0.5 * t
    pose[:, 2] = 1.0
    pose[:, 6] = 1.0  # identity quat (xyzw)
    vel = np.zeros((n, 3))
    vel[:, 0] = 0.3 * np.cos(0.3 * t)
    vel[:, 1] = 0.5
    bg = np.full((n, 3), 0.01)
    ba = np.full((n, 3), -0.05)
    return StateGT(times=t, pose=pose, vel=vel, bg=bg, ba=ba)


def test_state_gt_roundtrip(tmp_path):
    gt = _make_gt(50)
    path = str(tmp_path / "state_gt.txt")
    save_state_gt(path, gt)
    back = load_state_gt(path)
    np.testing.assert_allclose(back.times, gt.times, atol=1e-8)
    np.testing.assert_allclose(back.pose, gt.pose, atol=1e-8)
    np.testing.assert_allclose(back.vel, gt.vel, atol=1e-8)
    np.testing.assert_allclose(back.bg, gt.bg, atol=1e-8)
    np.testing.assert_allclose(back.ba, gt.ba, atol=1e-8)


def test_result_simulation_perfect_estimate():
    gt = _make_gt()
    # estimate == GT (robocentric v = R^T v_w = v_w at identity attitude)
    sim = ResultSimulation(
        gt.times, gt.pose, gt,
        est_v_body=gt.vel, est_ba=gt.ba, est_bg=gt.bg,
        est_cov_diag=np.full((len(gt.times), 15), 1e-4),
    )
    s = sim.summary()
    assert s["pos_rmse"] < 1e-6
    assert s["ori_rmse"] < 1e-6
    assert s["vel_rmse"] < 1e-6
    assert s["ba_rmse"] < 1e-6
    assert s["bg_rmse"] < 1e-6
    neo, nep = sim.calculate_nees()
    assert nep.mean < 1e-3


def test_result_simulation_consistent_noise(rng):
    """Errors drawn from the reported covariance -> NEES ~ 3."""
    gt = _make_gt(2000)
    sigma = 0.05
    est_pose = gt.pose.copy()
    est_pose[:, :3] += rng.normal(size=(len(gt.times), 3)) * sigma
    cov = np.full((len(gt.times), 15), sigma**2)
    sim = ResultSimulation(gt.times, est_pose, gt, est_cov_diag=cov)
    _, nep = sim.calculate_nees()
    assert 2.5 < nep.mean < 3.6
    # and the 3-sigma bound covers ~99.7% of errors
    es = sim.error_position()
    frac_in = np.mean(np.abs(es.err) <= es.bound3)
    assert frac_in > 0.98


def test_result_simulation_bias_error():
    gt = _make_gt()
    est_ba = gt.ba + 0.02
    sim = ResultSimulation(gt.times, gt.pose, gt, est_ba=est_ba)
    eba = sim.error_bias_accel()
    np.testing.assert_allclose(eba.err, 0.02, atol=1e-9)
    assert sim.error_velocity() is None  # not provided


# ------------------------------------------------------ recorder/monitor
def test_recorder_roundtrip(tmp_path, rng):
    path = str(tmp_path / "rec.txt")
    poses = rng.normal(size=(20, 7))
    poses[:, 3:7] /= np.linalg.norm(poses[:, 3:7], axis=1, keepdims=True)
    co = np.eye(3) * 0.01
    cp = np.eye(3) * 0.02
    with Recorder(path, write_cov=True) as rec:
        for i in range(20):
            rec.record(float(i) * 0.1, poses[i], co, cp)
    traj = load_pose_file(path)
    assert len(traj.times) == 20
    np.testing.assert_allclose(traj.poses, poses, atol=1e-8)
    np.testing.assert_allclose(traj.cov_pos[0], cp, atol=1e-8)
    np.testing.assert_allclose(traj.cov_ori[0], co, atol=1e-8)


def test_resource_monitor():
    mon = ResourceMonitor(interval=0.05).start()
    x = np.ones((500, 500)) * 1e-3
    for _ in range(30):
        x = np.tanh(x @ x)
    import time

    time.sleep(0.3)
    s = mon.stop()
    assert s["samples"] >= 2
    assert s["rss_max_mb"] > 10.0


def test_observable_nees_consistent(rng):
    """Errors drawn in the filter's OWN error coordinates (robocentric
    delta_p, body delta_theta, body delta_v) against the matching cov_core
    land on the chi-square targets (1 / 2 / 3); an unobservable yaw drift
    with ZERO yaw covariance must NOT blow up the observable-subspace NEES
    (it is the gauge direction the metric exists to exclude)."""
    from cuahn_vio.ops.quat import quat_mul, quat_exp, quat_to_rot

    gt = _make_gt(2000)
    n = len(gt.times)
    sp, st_, sv = 0.04, 0.01, 0.03
    cov_core = np.zeros((n, 15, 15))
    cov_core[:, 0:3, 0:3] = np.eye(3) * sp**2
    cov_core[:, 3:5, 3:5] = np.eye(2) * st_**2
    cov_core[:, 5, 5] = 1e-20  # yaw gauge: variance exactly ~0
    cov_core[:, 6:9, 6:9] = np.eye(3) * sv**2

    est_pose = gt.pose.copy()
    est_v = np.zeros((n, 3))
    yaw_drift = np.cumsum(rng.normal(size=n) * 2e-3)  # unobservable drift
    for i in range(n):
        r_gt = np.eye(3)  # identity attitude in _make_gt
        dth = np.concatenate([rng.normal(size=2) * st_, [yaw_drift[i]]])
        q = np.asarray(
            quat_mul(jnp.array([1.0, 0.0, 0.0, 0.0]),
                     quat_exp(jnp.array(dth, jnp.float32)))
        )
        est_pose[i, 3:7] = q[[1, 2, 3, 0]]
        r_est = np.asarray(quat_to_rot(jnp.array(q)))
        # robocentric error coordinates: p_w_est = R_est (p_body + dp)
        p_body = r_gt.T @ gt.pose[i, :3]
        dp = rng.normal(size=3) * sp
        est_pose[i, :3] = r_est @ (p_body + dp)
        v_body = r_gt.T @ gt.vel[i]
        est_v[i] = v_body + rng.normal(size=3) * sv

    sim = ResultSimulation(
        gt.times, est_pose, gt, est_v_body=est_v,
        est_cov_diag=np.einsum("fii->fi", cov_core),
        est_cov_core=cov_core,
    )
    obs = sim.calculate_nees_observable()
    assert 0.7 < obs["height"].mean < 1.4, obs["height"].mean
    assert 1.5 < obs["tilt"].mean < 2.6, obs["tilt"].mean
    assert 2.5 < obs["vel"].mean < 3.6, obs["vel"].mean
