"""Schur-complement sharded pose-graph smoother vs the dense solver.

Runs on the 8-device virtual CPU mesh (conftest): the block-partitioned
distributed solve must match pose_graph.optimize on the same factors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_normalize
from cuahn_vio.parallel.mesh import make_mesh
from cuahn_vio.parallel.pose_graph import (
    chain_graph_from_trajectory,
    optimize,
    relative_pose,
)
from cuahn_vio.parallel.pose_graph_sharded import (
    optimize_sharded,
    partition_graph,
    reassemble,
)
from tests.test_pose_graph import make_circle_traj


def _noisy_graph(rng, n=40, loops=True):
    p, q = make_circle_traj(n)
    pairs, edp, edq = None, None, None
    if loops:
        pairs = [(0, n - 1), (3, n // 2)]
        d = [relative_pose(p[a], q[a], p[b], q[b]) for a, b in pairs]
        edp = jnp.stack([x[0] for x in d])
        edq = jnp.stack([x[1] for x in d])
    graph = chain_graph_from_trajectory(
        p, q, sigma_dp=0.01, sigma_dth=0.005,
        extra_pairs=pairs, extra_dp=edp, extra_dq=edq,
    )
    noise_p = jnp.array(rng.normal(size=p.shape) * 0.15, jnp.float32).at[0].set(0)
    dq_n = jax.vmap(quat_exp)(
        jnp.array(rng.normal(size=(n, 3)) * 0.04, jnp.float32)
    ).at[0].set(jnp.array([1, 0, 0, 0], jnp.float32))
    q_init = jax.vmap(lambda a, b: quat_normalize(quat_mul(a, b)))(q, dq_n)
    return graph._replace(p=p + noise_p, q=q_init), p


def test_partition_covers_all_nodes_and_factors(rng):
    graph, _ = _noisy_graph(rng, n=40)
    sg = partition_graph(graph, 8)
    ints = set(int(g) for g in sg.int_idx.ravel() if g >= 0)
    seps = set(int(g) for g in sg.sep_idx)
    assert ints | seps == set(range(40))
    assert ints & seps == set()
    assert 0 in seps  # gauge anchor promoted
    n_fac = int(np.sum(np.asarray(sg.sqrt_info)[..., 0, 0] > 0))
    assert n_fac == len(graph.idx_i)


@pytest.mark.parametrize("loops", [False, True])
def test_sharded_matches_dense(rng, loops):
    graph, p_true = _noisy_graph(rng, n=40, loops=loops)
    p_dense, q_dense, costs_dense = optimize(graph, iters=12)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    sg = partition_graph(graph, n_dev)
    p_int, q_int, p_sep, q_sep, costs = optimize_sharded(
        sg, mesh, iters=12
    )
    p_opt, q_opt = reassemble(sg, p_int, q_int, p_sep, q_sep)

    np.testing.assert_allclose(p_opt, np.asarray(p_dense), atol=2e-3)
    # both converge to the true trajectory (exact chain measurements)
    np.testing.assert_allclose(p_opt, np.asarray(p_true), atol=1e-2)
    assert float(costs[-1]) < float(costs[0]) * 1e-3


def test_sharded_cost_matches_dense_cost(rng):
    graph, _ = _noisy_graph(rng, n=24, loops=True)
    _, _, costs_dense = optimize(graph, iters=5)
    mesh = make_mesh()
    sg = partition_graph(graph, mesh.devices.size)
    *_, costs = optimize_sharded(sg, mesh, iters=5)
    np.testing.assert_allclose(
        np.asarray(costs), np.asarray(costs_dense), rtol=0.05, atol=1e-7
    )
