"""Loop-closure geometry + factor generation + smoothing integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_normalize, quat_to_rot
from cuahn_vio.parallel.pose_graph import chain_graph_from_trajectory, optimize, relative_pose
from cuahn_vio.pipeline.loop_closure import (
    LoopFactors,
    find_loop_candidates,
    flow_between,
    generate_loop_factors,
    position_from_flow,
)

C_ROT_I = jnp.array(np.diag([1.0, -1.0, -1.0]), jnp.float32)
I_T_I2C = jnp.array([0.02, 0.01, -0.005], jnp.float32)


def _pose(t):
    p = jnp.array([np.sin(0.4 * t), 0.3 * t, 1.6 + 0.1 * np.sin(t)], jnp.float32)
    q = quat_exp(jnp.array([0.05 * np.sin(t), 0.04, 0.3 * t], jnp.float32))
    return p, q


def test_position_from_exact_flow_recovers_pose(rng):
    for t2 in (1.0, 3.0, 7.0):
        p1, q1 = _pose(0.5)
        p2, q2 = _pose(t2)
        flow = flow_between(p1, q1, p2, q2, C_ROT_I, I_T_I2C)
        p2_rec = position_from_flow(flow, p1, q1, q2, C_ROT_I, I_T_I2C)
        np.testing.assert_allclose(np.asarray(p2_rec), np.asarray(p2), atol=1e-3)


def test_find_loop_candidates():
    t = np.arange(100) * 0.1
    p = np.zeros((100, 3))
    p[:, 0] = np.sin(t)  # revisits x~0 repeatedly
    pairs = find_loop_candidates(t, p, min_dt=3.0, max_dist=0.3, stride=2)
    assert len(pairs) > 0
    for i, j in pairs:
        assert t[j] - t[i] >= 3.0
        assert np.linalg.norm(p[j] - p[i]) < 0.3


def test_find_loop_candidates_picks_nearest_revisit():
    """The partner for each keyframe must be the NEAREST eligible revisit,
    not the first one inside the radius: factor quality goes as the
    revisit baseline (flow ~ baseline/height * focal), and first-hit
    selection measurably locked onto 0.9 m pairs when 0.1 m pairs existed
    (round 4, benchmarks/RESULTS.md loop-closure section)."""
    t = np.arange(0, 12, 0.1)
    p = np.zeros((len(t), 3))
    # keyframe 0 at x=0; later the trajectory passes x=0.8 (t=6) then
    # x=0.05 (t=9): both within a 1.0 m radius, the second far closer
    p[:, 0] = 2.0
    p[0] = [0.0, 0, 0]
    i_far = np.argmin(np.abs(t - 6.0)); p[i_far] = [0.8, 0, 0]
    i_near = np.argmin(np.abs(t - 9.0)); p[i_near] = [0.05, 0, 0]
    pairs = find_loop_candidates(t, p, min_dt=3.0, max_dist=1.0, stride=1)
    partner = {i: j for i, j in pairs}
    assert partner[0] == i_near


def test_loop_factors_reduce_drift(rng):
    """Drifted chain + exact-flow loop factors -> smoother pulls the
    trajectory back toward truth."""
    n = 60
    ts = np.arange(n) * 0.25
    poses = [_pose(t) for t in ts]
    p_true = jnp.stack([x[0] for x in poses])
    q_true = jnp.stack([x[1] for x in poses])

    # drifted estimate: integrate noisy relative positions
    dp, dq = jax.vmap(relative_pose)(p_true[:-1], q_true[:-1], p_true[1:], q_true[1:])
    dp_noisy = dp + jnp.array(rng.normal(size=dp.shape) * 0.02, jnp.float32)
    p_est, q_est = [np.asarray(p_true[0])], [np.asarray(q_true[0])]
    for k in range(n - 1):
        r = np.asarray(quat_to_rot(jnp.array(q_est[-1])))
        p_est.append(p_est[-1] + r @ np.asarray(dp_noisy[k]))
        q_est.append(np.asarray(quat_normalize(quat_mul(jnp.array(q_est[-1]), dq[k]))))
    p_est = np.stack(p_est)
    q_est = np.stack(q_est)
    drift = np.linalg.norm(p_est - np.asarray(p_true), axis=1)
    assert drift[-1] > 0.05

    # loop factors from EXACT flows (oracle network) between ends
    pairs = np.array([[0, n - 1], [5, n - 10], [10, n - 5]])
    dps, dqs = [], []
    for i, j in pairs:
        flow = flow_between(
            p_true[i], q_true[i], p_true[j], q_true[j], C_ROT_I, I_T_I2C
        )
        # measurement built from the flow + ESTIMATED poses/attitudes
        pj = position_from_flow(
            flow, jnp.array(p_est[i]), jnp.array(q_est[i]),
            jnp.array(q_est[j]), C_ROT_I, I_T_I2C,
        )
        ri = quat_to_rot(jnp.array(q_est[i]))
        dps.append(np.asarray(ri.T @ (pj - p_est[i])))
        qc = jnp.array(q_est[i]) * jnp.array([1.0, -1, -1, -1])
        dqs.append(np.asarray(quat_normalize(quat_mul(qc, jnp.array(q_est[j])))))

    graph = chain_graph_from_trajectory(
        jnp.array(p_est), jnp.array(q_est), sigma_dp=0.02, sigma_dth=0.01,
        extra_pairs=[tuple(x) for x in pairs],
        extra_dp=jnp.array(np.stack(dps)), extra_dq=jnp.array(np.stack(dqs)),
        extra_sigma_dp=0.01, extra_sigma_dth=0.02,
    )
    p_opt, q_opt, costs = optimize(graph, iters=15)
    err_before = np.sqrt(np.mean(np.sum((p_est - np.asarray(p_true)) ** 2, 1)))
    err_after = np.sqrt(
        np.mean(np.sum((np.asarray(p_opt) - np.asarray(p_true)) ** 2, 1))
    )
    assert err_after < 0.7 * err_before, (err_before, err_after)


def test_generate_loop_factors_shapes(rng):
    """End-to-end factor generation through a real (random-weight) UAHN."""
    from cuahn_vio.models.uahn import init_uahn

    model, params = init_uahn(jax.random.PRNGKey(0))
    n = 12
    frames = rng.integers(0, 255, (n, 224, 320)).astype(np.uint8)
    ts = np.arange(n) * 1.0
    p = np.tile([0.0, 0.0, 1.5], (n, 1)).astype(np.float32)
    q = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    pairs = np.array([[0, 6], [2, 9]])
    lf = generate_loop_factors(
        frames, ts, p, q, C_ROT_I, I_T_I2C, model, params, pairs=pairs
    )
    assert lf.dp_meas.shape == (2, 3)
    assert lf.dq_meas.shape == (2, 4)
    assert np.all(np.isfinite(lf.dp_meas))
