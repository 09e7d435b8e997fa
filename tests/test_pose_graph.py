"""Pose-graph smoother tests: GN convergence, noise reduction, loop closure."""

import numpy as np
import jax
import jax.numpy as jnp

from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_normalize
from cuahn_vio.parallel.pose_graph import (
    PoseGraph,
    chain_graph_from_trajectory,
    factor_residual,
    optimize,
    relative_pose,
)


def make_circle_traj(n=40, radius=3.0):
    th = np.linspace(0, 1.5 * np.pi, n)
    p = np.stack([radius * np.cos(th), radius * np.sin(th), 1.5 + 0.1 * np.sin(3 * th)], 1)
    q = np.stack([np.asarray(quat_exp(jnp.array([0.05, 0.0, t]))) for t in th])
    return jnp.array(p, jnp.float32), jnp.array(q, jnp.float32)


def test_residual_zero_at_truth(rng):
    p, q = make_circle_traj(5)
    dp, dq = relative_pose(p[0], q[0], p[1], q[1])
    r = factor_residual(p[0], q[0], p[1], q[1], dp, dq)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)


def test_gn_recovers_truth_from_perturbed_init(rng):
    p, q = make_circle_traj(20)
    graph = chain_graph_from_trajectory(p, q, sigma_dp=0.01, sigma_dth=0.005)
    # perturb all poses except the anchored first one
    noise_p = jnp.array(rng.normal(size=p.shape) * 0.2, jnp.float32).at[0].set(0)
    p_init = p + noise_p
    dq_noise = jax.vmap(quat_exp)(
        jnp.array(rng.normal(size=(p.shape[0], 3)) * 0.05, jnp.float32)
    ).at[0].set(jnp.array([1, 0, 0, 0], jnp.float32))
    q_init = jax.vmap(lambda a, b: quat_normalize(quat_mul(a, b)))(q, dq_noise)

    graph = graph._replace(p=p_init, q=q_init)
    p_opt, q_opt, costs = optimize(graph, iters=15)
    # chain factors are exact relative poses of the TRUE trajectory ->
    # optimum reproduces it (up to the anchored gauge)
    np.testing.assert_allclose(np.asarray(p_opt), np.asarray(p), atol=5e-3)
    assert float(costs[-1]) < float(costs[0]) * 1e-4


def test_loop_closure_reduces_drift(rng):
    p, q = make_circle_traj(30)
    n = p.shape[0]
    # simulate drifting odometry: noisy relative measurements
    dp, dq = jax.vmap(relative_pose)(p[:-1], q[:-1], p[1:], q[1:])
    dp_noisy = dp + jnp.array(rng.normal(size=dp.shape) * 0.03, jnp.float32)
    # integrate the noisy chain to get the drifted trajectory (init guess)
    from cuahn_vio.ops.quat import quat_to_rot

    p_drift, q_drift = [np.asarray(p[0])], [np.asarray(q[0])]
    for k in range(n - 1):
        r_i = np.asarray(quat_to_rot(jnp.array(q_drift[-1])))
        p_drift.append(p_drift[-1] + r_i @ np.asarray(dp_noisy[k]))
        q_drift.append(
            np.asarray(quat_normalize(quat_mul(jnp.array(q_drift[-1]), dq[k])))
        )
    p_drift = jnp.array(np.stack(p_drift), jnp.float32)
    q_drift = jnp.array(np.stack(q_drift), jnp.float32)
    drift_err = float(jnp.linalg.norm(p_drift[-1] - p[-1]))
    assert drift_err > 0.05  # there is drift to fix

    # loop factors: exact relative poses between distant keyframes
    pairs = [(0, n - 1), (5, n - 5), (0, n // 2)]
    edp, edq = [], []
    for a, b in pairs:
        d1, d2 = relative_pose(p[a], q[a], p[b], q[b])
        edp.append(d1)
        edq.append(d2)
    graph = chain_graph_from_trajectory(
        p_drift, q_drift, sigma_dp=0.03, sigma_dth=0.01,
        extra_pairs=pairs, extra_dp=jnp.stack(edp), extra_dq=jnp.stack(edq),
        extra_sigma_dp=0.005, extra_sigma_dth=0.002,
    )
    # chain measurements are the noisy odometry (what the filter produced)
    graph = graph._replace(
        dp_meas=graph.dp_meas.at[: n - 1].set(dp_noisy)
    )
    p_opt, q_opt, costs = optimize(graph, iters=15)
    opt_err = float(jnp.linalg.norm(p_opt[-1] - p[-1]))
    assert opt_err < drift_err * 0.5, (opt_err, drift_err)
    # overall ATE improves too
    ate_drift = float(jnp.mean(jnp.linalg.norm(p_drift - p, axis=1)))
    ate_opt = float(jnp.mean(jnp.linalg.norm(p_opt - p, axis=1)))
    assert ate_opt < ate_drift


def test_huber_downweights_outlier_loop_factor(rng):
    """A single confident-outlier loop factor drags the plain-LSQ solution
    but is neutralized by IRLS Huber weighting (optimize huber_delta)."""
    p, q = make_circle_traj(25)
    n = p.shape[0]
    pairs = [(0, n - 1), (3, n - 3)]
    edp, edq = [], []
    for a, b in pairs:
        d1, d2 = relative_pose(p[a], q[a], p[b], q[b])
        edp.append(d1)
        edq.append(d2)
    # corrupt the second factor by 1 m with a confident 1 cm sigma
    edp[1] = edp[1] + jnp.array([1.0, 0.0, 0.0], jnp.float32)
    graph = chain_graph_from_trajectory(
        p, q, sigma_dp=0.02, sigma_dth=0.01,
        extra_pairs=pairs, extra_dp=jnp.stack(edp), extra_dq=jnp.stack(edq),
        extra_sigma_dp=0.01, extra_sigma_dth=0.01,
    )
    p_plain, _, _ = optimize(graph, iters=10)
    p_rob, _, _ = optimize(graph, iters=10, huber_delta=3.0)
    err_plain = float(jnp.mean(jnp.linalg.norm(p_plain - p, axis=1)))
    err_rob = float(jnp.mean(jnp.linalg.norm(p_rob - p, axis=1)))
    # robust run stays near the (true) chain; plain LSQ is dragged
    assert err_plain > 0.02, err_plain
    assert err_rob < err_plain * 0.5, (err_rob, err_plain)
