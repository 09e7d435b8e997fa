"""Block-partitioned pose-graph Gauss-Newton with a Schur-complement
reduced solve over the device mesh.

The multi-host scaling story for trajectory smoothing (SURVEY.md §5.7:
"block partitioning of keyframes across hosts with a Schur-complement
reduced solve — the classic sequence-parallel analog for a banded-plus-
anchor normal-equation system, communicated via collectives"). No reference
counterpart exists (the reference is filter-only, single-process).

Decomposition: keyframes are split into B contiguous blocks (one per mesh
device). Endpoints of block-crossing factors (and keyframe 0, the gauge
anchor) are promoted to SEPARATORS, replicated everywhere; the rest are
block-INTERIOR, owned by exactly one device. Every factor then touches only
one block's interior plus separators, so each Gauss-Newton iteration is:

    per device:  assemble H_ii, H_is, local H_ss/g via one-hot placement
                 matmuls (MXU-friendly — no scatter),
                 eliminate interiors: S_loc = H_ss - H_siᵀ H_ii⁻¹ H_is
    collective:  S = psum(S_loc), b = psum(b_loc)      <- the ONLY traffic:
                 one (6S)² matrix per iteration, independent of N
    everywhere:  solve S Δx_s = b (replicated), back-substitute interiors
                 Δx_i = H_ii⁻¹ (g_i - H_is Δx_s), apply SE(3) perturbations

Produces the same solution as ``pose_graph.optimize`` on the full dense
system (same factors, same damping semantics), tested block-vs-dense.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cuahn_vio.parallel.pose_graph import (
    PoseGraph,
    _factor_jacobians,
    _perturb,
)

_ANCHOR = 1e8  # gauge prior weight on keyframe 0 (pose_graph.optimize)


class ShardedPoseGraph(NamedTuple):
    """Host-partitioned graph: leading axis B on per-block arrays."""

    # separators (replicated)
    sep_idx: np.ndarray  # (S,) global keyframe ids
    p_sep: jnp.ndarray  # (S, 3)
    q_sep: jnp.ndarray  # (S, 4)
    # per-block interiors, padded to K
    int_idx: np.ndarray  # (B, K) global ids, -1 = padding
    p_int: jnp.ndarray  # (B, K, 3)
    q_int: jnp.ndarray  # (B, K, 4)
    # per-block factors, padded to M
    is_sep_i: jnp.ndarray  # (B, M) bool: endpoint i is a separator
    pos_i: jnp.ndarray  # (B, M) index into sep (if is_sep) else interior
    is_sep_j: jnp.ndarray  # (B, M)
    pos_j: jnp.ndarray  # (B, M)
    dp_meas: jnp.ndarray  # (B, M, 3)
    dq_meas: jnp.ndarray  # (B, M, 4)
    sqrt_info: jnp.ndarray  # (B, M, 6, 6) zeroed on padding factors


def partition_graph(graph: PoseGraph, n_blocks: int) -> ShardedPoseGraph:
    """Host-side partitioning (numpy): contiguous blocks, cross-block
    factor endpoints + keyframe 0 promoted to separators."""
    n = int(graph.p.shape[0])
    idx_i = np.asarray(graph.idx_i)
    idx_j = np.asarray(graph.idx_j)
    block_of = np.minimum(
        np.arange(n) * n_blocks // n, n_blocks - 1
    )  # contiguous, near-equal

    sep = {0}
    for a, b in zip(idx_i, idx_j):
        if block_of[a] != block_of[b]:
            sep.add(int(a))
            sep.add(int(b))
    sep_idx = np.array(sorted(sep), np.int64)
    sep_pos = {g: s for s, g in enumerate(sep_idx)}
    is_sep = np.zeros(n, bool)
    is_sep[sep_idx] = True

    int_lists = [[] for _ in range(n_blocks)]
    int_pos = {}
    for g in range(n):
        if not is_sep[g]:
            b = block_of[g]
            int_pos[g] = len(int_lists[b])
            int_lists[b].append(g)
    k_max = max(1, max(len(l) for l in int_lists))

    # factor assignment: the block owning an interior endpoint, else the
    # block of endpoint i (all-separator factor: any block works)
    f_lists = [[] for _ in range(n_blocks)]
    for m, (a, b) in enumerate(zip(idx_i, idx_j)):
        if not is_sep[a]:
            blk = block_of[a]
        elif not is_sep[b]:
            blk = block_of[b]
        else:
            blk = block_of[a]
        f_lists[blk].append(m)
    m_max = max(1, max(len(l) for l in f_lists))

    def pad_int(lst):
        return lst + [-1] * (k_max - len(lst))

    int_idx = np.array([pad_int(l) for l in int_lists], np.int64)

    # pull factor data to host ONCE (per-element jnp indexing would sync
    # the device for every factor)
    g_dp = np.asarray(graph.dp_meas)
    g_dq = np.asarray(graph.dq_meas)
    g_w = np.asarray(graph.sqrt_info)

    shp = (n_blocks, m_max)
    isi = np.zeros(shp, bool)
    pi = np.zeros(shp, np.int32)
    isj = np.zeros(shp, bool)
    pj = np.zeros(shp, np.int32)
    dp = np.zeros((*shp, 3), np.float32)
    dq = np.zeros((*shp, 4), np.float32)
    dq[..., 0] = 1.0
    w = np.zeros((*shp, 6, 6), np.float32)
    for blk, ms in enumerate(f_lists):
        for s, m in enumerate(ms):
            a, b = int(idx_i[m]), int(idx_j[m])
            isi[blk, s] = is_sep[a]
            pi[blk, s] = sep_pos[a] if is_sep[a] else int_pos[a]
            isj[blk, s] = is_sep[b]
            pj[blk, s] = sep_pos[b] if is_sep[b] else int_pos[b]
            dp[blk, s] = g_dp[m]
            dq[blk, s] = g_dq[m]
            w[blk, s] = g_w[m]

    p = np.asarray(graph.p, np.float32)
    q = np.asarray(graph.q, np.float32)
    p_int = np.zeros((n_blocks, k_max, 3), np.float32)
    q_int = np.zeros((n_blocks, k_max, 4), np.float32)
    q_int[..., 0] = 1.0
    for blk, l in enumerate(int_lists):
        for s, g in enumerate(l):
            p_int[blk, s] = p[g]
            q_int[blk, s] = q[g]

    return ShardedPoseGraph(
        sep_idx=sep_idx,
        p_sep=jnp.array(p[sep_idx]),
        q_sep=jnp.array(q[sep_idx]),
        int_idx=int_idx,
        p_int=jnp.array(p_int),
        q_int=jnp.array(q_int),
        is_sep_i=jnp.array(isi),
        pos_i=jnp.array(pi),
        is_sep_j=jnp.array(isj),
        pos_j=jnp.array(pj),
        dp_meas=jnp.array(dp),
        dq_meas=jnp.array(dq),
        sqrt_info=jnp.array(w),
    )


def _gn_iteration(axis, n_blocks, damping, p_int, q_int, p_sep, q_sep, fac):
    """One distributed GN step inside shard_map (per-device view)."""
    is_i, pos_i, is_j, pos_j, dpm, dqm, w = fac
    k = p_int.shape[0]
    s = p_sep.shape[0]
    dim_i, dim_s = 6 * k, 6 * s

    def endpoint(is_sep, pos):
        pe = jnp.where(is_sep[:, None], p_sep[pos], p_int[pos])
        qe = jnp.where(is_sep[:, None], q_sep[pos], q_int[pos])
        return pe, qe

    pe_i, qe_i = endpoint(is_i, pos_i)
    pe_j, qe_j = endpoint(is_j, pos_j)

    r, j_i, j_j = jax.vmap(_factor_jacobians)(pe_i, qe_i, pe_j, qe_j, dpm, dqm)
    rw = jnp.einsum("mab,mb->ma", w, r)
    jiw = jnp.einsum("mab,mbc->mac", w, j_i)
    jjw = jnp.einsum("mab,mbc->mac", w, j_j)

    # one-hot placement: A_int (M, 6, 6K), A_sep (M, 6, 6S); padding factors
    # have w = 0 so their rows vanish
    m = pos_i.shape[0]

    def place(jw, is_sep, pos, size, want_sep):
        sel = (is_sep == want_sep).astype(jw.dtype)
        oh = (
            jax.nn.one_hot(pos, size, dtype=jw.dtype) * sel[:, None]
        )  # (M, size)
        a = jnp.einsum("mab,mk->makb", jw, oh)
        return a.reshape(m, 6, size * 6)

    a_int = place(jiw, is_i, pos_i, k, False) + place(jjw, is_j, pos_j, k, False)
    a_sep = place(jiw, is_i, pos_i, s, True) + place(jjw, is_j, pos_j, s, True)

    h_ii = jnp.einsum("map,maq->pq", a_int, a_int)
    h_is = jnp.einsum("map,maq->pq", a_int, a_sep)
    h_ss = jnp.einsum("map,maq->pq", a_sep, a_sep)
    g_i = -jnp.einsum("map,ma->p", a_int, rw)
    g_s = -jnp.einsum("map,ma->p", a_sep, rw)
    cost_loc = jnp.sum(rw * rw)

    # damping makes padded interior slots (no factors) invertible too;
    # separator damping + keyframe-0 anchor are split 1/B so the psum
    # totals match the dense system
    h_ii = h_ii + jnp.eye(dim_i, dtype=h_ii.dtype) * damping
    h_ss = h_ss + jnp.eye(dim_s, dtype=h_ss.dtype) * (damping / n_blocks)
    anchor = jnp.zeros((dim_s, dim_s), h_ss.dtype)
    anchor = anchor.at[:6, :6].set(jnp.eye(6) * (_ANCHOR / n_blocks))
    h_ss = h_ss + anchor  # sep 0 IS keyframe 0 (always promoted, sorted)

    hii_inv_his = jnp.linalg.solve(h_ii, h_is)  # (6K, 6S)
    hii_inv_gi = jnp.linalg.solve(h_ii, g_i)  # (6K,)
    s_loc = h_ss - h_is.T @ hii_inv_his
    b_loc = g_s - h_is.T @ hii_inv_gi

    # the ONLY collective: reduce the (6S)^2 Schur system
    s_glob = jax.lax.psum(s_loc, axis)
    b_glob = jax.lax.psum(b_loc, axis)
    cost = jax.lax.psum(cost_loc, axis)

    dx_s = jnp.linalg.solve(s_glob, b_glob)  # replicated
    dx_i = hii_inv_gi - hii_inv_his @ dx_s

    p_sep2, q_sep2 = jax.vmap(_perturb)(p_sep, q_sep, dx_s.reshape(s, 6))
    p_int2, q_int2 = jax.vmap(_perturb)(p_int, q_int, dx_i.reshape(k, 6))
    return p_int2, q_int2, p_sep2, q_sep2, cost


def optimize_sharded(
    sg: ShardedPoseGraph,
    mesh: Mesh,
    axis: str = "seq",
    iters: int = 10,
    damping: float = 1e-6,
):
    """Run distributed GN over the mesh; returns (p_int, q_int, p_sep,
    q_sep, costs) — use ``reassemble`` for the full trajectory."""
    n_blocks = sg.p_int.shape[0]

    blk = P(axis)  # per-block arrays: leading axis sharded
    rep = P()  # separators: replicated

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(blk, blk, rep, rep, (blk,) * 7),
        out_specs=(blk, blk, rep, rep, rep),
        check_vma=False,
    )
    def run(p_int, q_int, p_sep, q_sep, fac):
        # leading block axis is size 1 per device -> drop it inside
        fac1 = jax.tree.map(lambda x: x[0], fac)

        def body(carry, _):
            pi, qi, ps, qs = carry
            pi, qi, ps, qs, cost = _gn_iteration(
                axis, n_blocks, damping, pi[0], qi[0], ps, qs, fac1
            )
            return (pi[None], qi[None], ps, qs), cost

        (pi, qi, ps, qs), costs = jax.lax.scan(
            body, (p_int, q_int, p_sep, q_sep), None, length=iters
        )
        return pi, qi, ps, qs, costs

    fac = (
        sg.is_sep_i, sg.pos_i, sg.is_sep_j, sg.pos_j,
        sg.dp_meas, sg.dq_meas, sg.sqrt_info,
    )
    p_int, q_int, p_sep, q_sep, costs = jax.jit(run)(
        sg.p_int, sg.q_int, sg.p_sep, sg.q_sep, fac
    )
    return p_int, q_int, p_sep, q_sep, costs


def reassemble(sg: ShardedPoseGraph, p_int, q_int, p_sep, q_sep):
    """Scatter block/separator results back into global keyframe order."""
    n = int(sg.sep_idx.max()) + 1
    for blk in sg.int_idx:
        valid = blk[blk >= 0]
        if valid.size:
            n = max(n, int(valid.max()) + 1)
    p = np.zeros((n, 3), np.float32)
    q = np.zeros((n, 4), np.float32)
    p[sg.sep_idx] = np.asarray(p_sep)
    q[sg.sep_idx] = np.asarray(q_sep)
    for b in range(sg.int_idx.shape[0]):
        for s, g in enumerate(sg.int_idx[b]):
            if g >= 0:
                p[g] = np.asarray(p_int[b, s])
                q[g] = np.asarray(q_int[b, s])
    return p, q
