"""Evaluation-stack tests.

The decisive one: reproduce the ATE of the run artifacts SHIPPED IN THE
REFERENCE REPO (ov_data/uzh_fpv/stamped_traj_estimate.txt vs
indoor_45_2_snapdragon_with_gt.txt) — 0.330 m SE3-aligned position RMSE over
1210 matched poses (BASELINE.md). Passing this pins our whole
association/alignment/metric stack to ov_eval's semantics.
"""

import os

import numpy as np
import pytest

from cuahn_vio.eval import (
    ResultTrajectory,
    Statistics,
    align_umeyama,
    associate,
    load_pose_file,
    load_timing_file,
    save_pose_file,
)
from cuahn_vio.eval.align import jpl_quat_to_rot, jpl_rot_to_quat, log_so3, rot_z

REF = "/root/reference/cuahn_ros/ov_data/uzh_fpv"
EST = os.path.join(REF, "stamped_traj_estimate.txt")
GT = os.path.join(REF, "indoor_45_2_snapdragon_with_gt.txt")
TIMING = os.path.join(REF, "traj_timing.txt")

needs_ref = pytest.mark.skipif(
    not os.path.exists(EST), reason="reference artifacts not mounted"
)


@needs_ref
def test_reproduce_reference_ate():
    rt = ResultTrajectory.from_files(EST, GT, "se3")
    ori, pos = rt.calculate_ate()
    # BASELINE.md: 0.330 m pos RMSE, 1210 matches @ 20 ms, 206.8 m length
    assert len(pos.values) == 1210, len(pos.values)
    np.testing.assert_allclose(pos.rmse, 0.330, atol=0.005)
    np.testing.assert_allclose(rt.trajectory_length(), 206.8, atol=1.0)
    assert 0 < ori.rmse < 30


@needs_ref
def test_rpe_reference_runs():
    rt = ResultTrajectory.from_files(EST, GT, "se3")
    rpe = rt.calculate_rpe([8.0, 16.0])
    for d, (ori, pos) in rpe.items():
        assert len(pos.values) > 100
        assert 0 < pos.rmse < 5.0
        assert 0 < ori.rmse < 45.0


@needs_ref
def test_timing_loader_baseline_numbers():
    t, stages = load_timing_file(TIMING)
    assert stages.shape[1] == 5
    # BASELINE.md: net mean 32.80 ms, total mean 36.26 ms over 1775 rows
    assert len(t) == 1775
    np.testing.assert_allclose(stages[:, 2].mean(), 32.80, atol=0.05)
    np.testing.assert_allclose(stages[:, 4].mean(), 36.26, atol=0.05)


def test_umeyama_recovers_transform(rng):
    pts = rng.normal(size=(100, 3)) * 4
    r_true = np.asarray(
        jpl_quat_to_rot(jpl_rot_to_quat(rot_z(0.7) @ rot_z(0.0)))
    ).T @ np.eye(3)
    # build a random proper rotation
    a = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(a)
    r_true = u @ np.diag([1, 1, np.linalg.det(u @ vt)]) @ vt
    t_true = rng.normal(size=3)
    s_true = 1.7
    data = pts
    model = (s_true * (r_true @ pts.T)).T + t_true
    r, t, s = align_umeyama(data, model, known_scale=False, yaw_only=False)
    np.testing.assert_allclose(r, r_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    np.testing.assert_allclose(s, s_true, atol=1e-8)


def test_umeyama_yaw_only(rng):
    pts = rng.normal(size=(50, 3))
    r_true = rot_z(0.9)
    model = (r_true @ pts.T).T + np.array([1.0, -2.0, 0.5])
    r, t, s = align_umeyama(pts, model, known_scale=True, yaw_only=True)
    np.testing.assert_allclose(r, r_true, atol=1e-8)
    assert s == 1.0


def test_association_injective():
    est_t = np.array([0.0, 0.1, 0.2, 0.3])
    gt_t = np.array([0.001, 0.099, 0.101, 0.35])
    est_p = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (4, 1))
    gt_p = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (4, 1))
    times, e, g, *_ = associate(est_t, gt_t, est_p, gt_p, 0.0, 0.02)
    # 0.0->0.001, 0.1->0.099 (first best), 0.2->none, 0.3->none
    assert len(times) == 2
    np.testing.assert_allclose(times, [0.001, 0.099])


def test_statistics():
    s = Statistics()
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        s.add(float(i), v)
    s.calculate()
    np.testing.assert_allclose(s.rmse, np.sqrt(np.mean(np.array([1, 4, 9, 16.0]))))
    np.testing.assert_allclose(s.mean, 2.5)
    np.testing.assert_allclose(s.median, 2.5)
    np.testing.assert_allclose(s.max, 4.0)


def test_pose_file_roundtrip(tmp_path, rng):
    n = 20
    times = np.cumsum(rng.random(n))
    poses = rng.normal(size=(n, 7))
    poses[:, 3:7] /= np.linalg.norm(poses[:, 3:7], axis=1, keepdims=True)
    covo = np.tile(np.eye(3) * 1e-4, (n, 1, 1))
    covp = np.tile(np.eye(3) * 1e-3, (n, 1, 1))
    path = str(tmp_path / "traj.txt")
    save_pose_file(path, times, poses, covo, covp)
    back = load_pose_file(path)
    np.testing.assert_allclose(back.times, times, atol=1e-5)
    np.testing.assert_allclose(back.poses, poses, atol=1e-6)
    np.testing.assert_allclose(back.cov_pos, covp, atol=1e-9)


def test_log_so3_roundtrip(rng):
    v = rng.normal(size=3)
    th = np.linalg.norm(v)
    k = v / th
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    r = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx
    np.testing.assert_allclose(log_so3(r), v, atol=1e-9)
