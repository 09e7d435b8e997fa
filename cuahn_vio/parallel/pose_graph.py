"""Keyframe pose-graph smoothing: Gauss-Newton over SE(3) with autodiff.

A downstream refinement layer with no reference counterpart (the reference
is filter-only): keyframe poses are re-optimized against
- relative-pose odometry factors from the filter (consecutive keyframes,
  covariance from the filter's pose covariance),
- optional extra relative factors between NON-consecutive keyframe pairs
  (re-running the homography network on keyframe pairs that overlap — the
  planar scene makes any overlapping pair constrainable),
- a prior factor anchoring the first keyframe (gauge),
- optional height factors (the planar-ground d_c observable).

Design: residuals are plain jax functions; Jacobians come from ``jacfwd``
on right-multiplicative tangent perturbations (no hand-derived chains); one
Gauss-Newton step assembles the dense normal system — fine on-chip up to a
few thousand keyframes (6N x 6N). The block-partitioned multi-host
Schur-complement version lives in ``pose_graph_sharded``.

Pose convention matches the filter output: q Hamilton wxyz (body->world),
p world-frame position.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_normalize, quat_to_rot


class PoseGraph(NamedTuple):
    """N keyframes + M relative factors (i -> j)."""

    p: jnp.ndarray  # (N, 3) world positions
    q: jnp.ndarray  # (N, 4) wxyz body->world
    idx_i: jnp.ndarray  # (M,) factor source keyframe
    idx_j: jnp.ndarray  # (M,) factor target keyframe
    dp_meas: jnp.ndarray  # (M, 3) measured p_j - p_i in frame i
    dq_meas: jnp.ndarray  # (M, 4) measured q_i^-1 ⊗ q_j
    sqrt_info: jnp.ndarray  # (M, 6, 6) sqrt information of [dp; dtheta]


def _quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def relative_pose(p_i, q_i, p_j, q_j):
    """(dp in frame i, dq = q_i^-1 ⊗ q_j)."""
    r_i = quat_to_rot(q_i)
    dp = r_i.T @ (p_j - p_i)
    dq = quat_normalize(quat_mul(_quat_conj(q_i), q_j))
    return dp, dq


def factor_residual(p_i, q_i, p_j, q_j, dp_meas, dq_meas):
    """6-d residual [translation; 2*vec(dq_err)] of one relative factor."""
    dp, dq = relative_pose(p_i, q_i, p_j, q_j)
    dq_err = quat_mul(_quat_conj(dq_meas), dq)
    dtheta = 2.0 * dq_err[1:4] * jnp.sign(dq_err[0])
    return jnp.concatenate([dp - dp_meas, dtheta])


def _perturb(p, q, xi):
    """Right-multiplicative tangent step: p + R dp_body? Use the simple
    world-translation + body-rotation chart: p' = p + xi[:3],
    q' = q ⊗ exp(xi[3:])."""
    return p + xi[:3], quat_normalize(quat_mul(q, quat_exp(xi[3:])))


def _factor_jacobians(p_i, q_i, p_j, q_j, dp_meas, dq_meas):
    """(r, J_i, J_j): residual and its 6x6 Jacobians via jacfwd."""

    def f(xi_i, xi_j):
        pi2, qi2 = _perturb(p_i, q_i, xi_i)
        pj2, qj2 = _perturb(p_j, q_j, xi_j)
        return factor_residual(pi2, qi2, pj2, qj2, dp_meas, dq_meas)

    zero = jnp.zeros(6, p_i.dtype)
    r = f(zero, zero)
    j_i = jax.jacfwd(f, argnums=0)(zero, zero)
    j_j = jax.jacfwd(f, argnums=1)(zero, zero)
    return r, j_i, j_j


@partial(jax.jit, static_argnames=("iters", "huber_delta"))
def optimize(
    graph: PoseGraph,
    iters: int = 10,
    damping: float = 1e-6,
    huber_delta: float = 0.0,
):
    """Gauss-Newton (lightly damped) over all keyframes; first pose gauged.

    ``huber_delta`` > 0 enables IRLS robust weighting on the WHITENED
    per-factor residual norm (units of sigma) with a redescending Cauchy
    kernel: w = 1/(1 + (||r||/delta)^2), so a confident outlier loop
    factor (e.g. a wrong network match with an optimistic covariance) is
    driven to ~zero weight instead of the linear-tail pull a classic
    Huber kernel would retain — the switchable-constraints resolution.
    Chain odometry factors have sub-sigma residuals and are unaffected
    (w ~ 1).

    Returns (p_opt, q_opt). Dense normal equations: fine to ~2k keyframes.
    """
    n = graph.p.shape[0]
    dim = 6 * n

    def gn_step(carry, _):
        p, q = carry
        r, j_i, j_j = jax.vmap(
            lambda i, j, dpm, dqm: _factor_jacobians(
                p[i], q[i], p[j], q[j], dpm, dqm
            )
        )(graph.idx_i, graph.idx_j, graph.dp_meas, graph.dq_meas)

        # whiten
        rw = jnp.einsum("mab,mb->ma", graph.sqrt_info, r)  # (M, 6)
        jiw = jnp.einsum("mab,mbc->mac", graph.sqrt_info, j_i)
        jjw = jnp.einsum("mab,mbc->mac", graph.sqrt_info, j_j)

        if huber_delta > 0.0:
            rn = jnp.linalg.norm(rw, axis=1)  # (M,) sigma units
            w = jnp.sqrt(1.0 / (1.0 + (rn / huber_delta) ** 2))
            rw = rw * w[:, None]
            jiw = jiw * w[:, None, None]
            jjw = jjw * w[:, None, None]

        # assemble H = JᵀJ, g = Jᵀr with scatter-adds
        h = jnp.zeros((dim, dim), p.dtype)
        g = jnp.zeros((dim,), p.dtype)

        def blocks(jw_a, jw_b):
            return jnp.einsum("mab,mac->mbc", jw_a, jw_b)  # (M, 6, 6)

        si = graph.idx_i * 6
        sj = graph.idx_j * 6
        # vectorized block scatter via index grids
        off = jnp.arange(6)

        def scat(h, rows0, cols0, vals):
            rr = rows0[:, None, None] + off[None, :, None]
            cc = cols0[:, None, None] + off[None, None, :]
            return h.at[rr, cc].add(vals)

        h = scat(h, si, si, blocks(jiw, jiw))
        h = scat(h, si, sj, blocks(jiw, jjw))
        h = scat(h, sj, si, blocks(jjw, jiw))
        h = scat(h, sj, sj, blocks(jjw, jjw))
        g = g.at[
            (si[:, None] + off[None, :]).reshape(-1)
        ].add(jnp.einsum("mab,ma->mb", jiw, rw).reshape(-1))
        g = g.at[
            (sj[:, None] + off[None, :]).reshape(-1)
        ].add(jnp.einsum("mab,ma->mb", jjw, rw).reshape(-1))

        # gauge: anchor keyframe 0 with a strong prior
        h = h.at[:6, :6].add(jnp.eye(6, dtype=p.dtype) * 1e8)
        h = h + jnp.eye(dim, dtype=p.dtype) * damping

        delta = jnp.linalg.solve(h, -g).reshape(n, 6)
        p2, q2 = jax.vmap(_perturb)(p, q, delta)
        return (p2, q2), jnp.sum(rw * rw)

    (p_opt, q_opt), costs = jax.lax.scan(
        gn_step, (graph.p, graph.q), None, length=iters
    )
    return p_opt, q_opt, costs


def chain_graph_from_trajectory(
    p: jnp.ndarray, q: jnp.ndarray, sigma_dp: float, sigma_dth: float,
    extra_pairs=None, extra_dp=None, extra_dq=None,
    extra_sigma_dp: float = None, extra_sigma_dth: float = None,
):
    """Build a chain pose graph from an odometry trajectory, with optional
    extra (loop) factors. Measurement values default to the trajectory's own
    relative poses — callers overwrite dp_meas/dq_meas with real
    measurements or noisy odometry as needed."""
    n = p.shape[0]
    idx_i = jnp.arange(n - 1)
    idx_j = idx_i + 1
    dp, dq = jax.vmap(relative_pose)(p[:-1], q[:-1], p[1:], q[1:])
    info = jnp.diag(
        jnp.concatenate(
            [jnp.full(3, 1.0 / sigma_dp), jnp.full(3, 1.0 / sigma_dth)]
        ).astype(p.dtype)
    )
    sqrt_info = jnp.tile(info[None], (n - 1, 1, 1))
    if extra_pairs is not None:
        ei = jnp.asarray([a for a, _ in extra_pairs])
        ej = jnp.asarray([b for _, b in extra_pairs])
        idx_i = jnp.concatenate([idx_i, ei])
        idx_j = jnp.concatenate([idx_j, ej])
        dp = jnp.concatenate([dp, extra_dp])
        dq = jnp.concatenate([dq, extra_dq])
        # extra_sigma_dp: scalar, or (L,) per-factor sigmas (loop factors
        # carry their own measurement confidence from the network cov)
        l = len(extra_pairs)
        sdp = (
            jnp.full(l, sigma_dp)
            if extra_sigma_dp is None
            else jnp.broadcast_to(jnp.asarray(extra_sigma_dp, p.dtype), (l,))
        )
        sdth = (
            jnp.full(l, sigma_dth)
            if extra_sigma_dth is None
            else jnp.broadcast_to(jnp.asarray(extra_sigma_dth, p.dtype), (l,))
        )
        einfo = jax.vmap(
            lambda a, b: jnp.diag(
                jnp.concatenate([jnp.full(3, 1.0 / a), jnp.full(3, 1.0 / b)])
            ).astype(p.dtype)
        )(sdp, sdth)
        sqrt_info = jnp.concatenate([sqrt_info, einfo])
    return PoseGraph(
        p=p, q=q, idx_i=idx_i, idx_j=idx_j,
        dp_meas=dp, dq_meas=dq, sqrt_info=sqrt_info,
    )
