"""Deterministic multi-process self-test workload.

The reference has no distributed execution (SURVEY.md §2.7); our scaling
layer (mesh.py, sharded_eval.py, pose_graph_sharded.py) is new design. This
module gives it a REAL multi-process proof: the same fixed-seed workload —
a batch of filter sequences sharded over the global mesh, then a
block-partitioned Schur pose-graph solve — runs under any process count
and returns scalar checksums that must be identical (to f32 tolerance)
whether the mesh spans 1 process or N. Driven by

    python -m cuahn_vio.cli distributed-selftest \
        --coordinator 127.0.0.1:PORT --num-processes 2 --process-id I

(one invocation per process; tests/test_distributed.py launches two and
compares against the single-process run).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _global_put(x, mesh: Mesh, spec: P):
    """Place host data (identical on every process) as a global array."""
    x = jnp.asarray(x)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: np.asarray(x[idx])
    )


def _filter_checksums(mesh: Mesh) -> dict:
    """Batch of measurement-driven filter sequences, batch axis sharded."""
    from cuahn_vio.filter import FilterState, make_params
    from cuahn_vio.pipeline.vio import VioConfig, run_sequence_with_measurements

    rng = np.random.default_rng(0)
    b = mesh.devices.size
    frames, steps = 6, 5
    t_itoc = np.eye(4)
    t_itoc[:3, 3] = [0.006, -0.014, -0.012]
    fparams = make_params(t_itoc)

    def stack(x):
        return np.tile(np.asarray(x, np.float32), (b,) + (1,) * np.ndim(x))

    states0 = FilterState(
        p=stack([0.0, 0.0, 1.5]),
        q=stack([1.0, 0.0, 0.0, 0.0]),
        v=stack([0.0, 0.0, 0.0]),
        ba=stack([0.0, 0.0, 0.0]),
        bg=stack([0.0, 0.0, 0.0]),
        off=stack(np.zeros((4, 3))),
        cov=stack(np.eye(27, dtype=np.float32) * 1e-4),
    )
    z = rng.normal(size=(b, frames, 8)).astype(np.float32) * 0.5
    r = np.tile(np.eye(8, dtype=np.float32) * 4.0, (b, frames, 1, 1))
    valid = np.ones((b, frames), bool)
    w = rng.normal(size=(b, frames, steps, 3)).astype(np.float32) * 0.1
    a = (rng.normal(size=(b, frames, steps, 3)) * 0.1 + [0, 0, 9.81]).astype(
        np.float32
    )
    dts = np.full((b, frames, steps), 0.002, np.float32)

    cfg = VioConfig(update_gate_frames=0)

    def one(s0, zz, rr, vv, ww, aa, dd):
        return run_sequence_with_measurements(
            s0, fparams, cfg, zz, rr, vv, ww, aa, dd
        )

    shard = lambda x: _global_put(x, mesh, P("seq", *([None] * (x.ndim - 1))))
    args = jax.tree.map(shard, (states0, z, r, valid, w, a, dts))
    final, outs = jax.jit(jax.vmap(one))(*args)
    return {
        "filter_pos_checksum": float(jnp.sum(jnp.abs(outs.p_world))),
        "filter_cov_checksum": float(jnp.sum(jnp.abs(final.cov))),
    }


def _pose_graph_checksums(mesh: Mesh) -> dict:
    """Block-partitioned Schur GN over the mesh (pose_graph_sharded)."""
    from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_normalize
    from cuahn_vio.parallel.pose_graph import (
        chain_graph_from_trajectory,
        relative_pose,
    )
    from cuahn_vio.parallel.pose_graph_sharded import (
        optimize_sharded,
        partition_graph,
    )

    rng = np.random.default_rng(1)
    n = 40
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    p = jnp.array(
        np.stack([np.cos(th), np.sin(th), 0.1 * np.sin(2 * th)], 1), jnp.float32
    )
    q = jax.vmap(lambda t: quat_exp(jnp.array([0.0, 0.0, 1.0]) * t))(
        jnp.array(th, jnp.float32)
    )
    pairs = [(0, n - 1), (3, n // 2)]
    d = [relative_pose(p[a], q[a], p[b], q[b]) for a, b in pairs]
    graph = chain_graph_from_trajectory(
        p, q, sigma_dp=0.01, sigma_dth=0.005,
        extra_pairs=pairs,
        extra_dp=jnp.stack([x[0] for x in d]),
        extra_dq=jnp.stack([x[1] for x in d]),
    )
    noise_p = jnp.array(rng.normal(size=p.shape) * 0.15, jnp.float32).at[0].set(0)
    dq_n = jax.vmap(quat_exp)(
        jnp.array(rng.normal(size=(n, 3)) * 0.04, jnp.float32)
    ).at[0].set(jnp.array([1, 0, 0, 0], jnp.float32))
    q_init = jax.vmap(lambda x, y: quat_normalize(quat_mul(x, y)))(q, dq_n)
    graph = graph._replace(p=p + noise_p, q=q_init)

    sg = partition_graph(graph, mesh.devices.size)
    # device placement: per-block fields sharded over 'seq', separators
    # replicated; sep_idx/int_idx stay host-side (reassembly indices)
    blk_fields = (
        "p_int", "q_int", "is_sep_i", "pos_i", "is_sep_j", "pos_j",
        "dp_meas", "dq_meas", "sqrt_info",
    )
    placed = {}
    for name in blk_fields:
        x = jnp.asarray(getattr(sg, name))
        placed[name] = _global_put(x, mesh, P("seq", *([None] * (x.ndim - 1))))
    for name in ("p_sep", "q_sep"):
        placed[name] = _global_put(jnp.asarray(getattr(sg, name)), mesh, P())
    sg = sg._replace(**placed)
    p_int, q_int, p_sep, q_sep, costs = optimize_sharded(sg, mesh, iters=10)
    # checksums reduced ON DEVICE: the block results are globally sharded,
    # so a host gather would fail under multi-process — a replicated scalar
    # reduction is exactly what psum-style metric aggregation is for
    ck = float(jnp.sum(jnp.abs(p_int))) + float(jnp.sum(jnp.abs(p_sep)))
    return {
        "pose_checksum": ck,
        "pose_final_cost": float(costs[-1]),
    }


def timed_filter_bench(
    mesh: Mesh, frames: int = 400, steps: int = 16, reps: int = 5
) -> dict:
    """Throughput benchmark for the scaling-efficiency recipe (BASELINE.md:
    >= 80 % at N >= 2 hosts): filter-sequence batch, one sequence per
    device, timed after a warm-up run. Efficiency at N processes =
    (frames/s at N) / (N x frames/s at 1) when each process owns its own
    physical cores/chips (on one shared machine the number only validates
    the mechanism, not the hardware scaling)."""
    import time

    from cuahn_vio.filter import FilterState, make_params
    from cuahn_vio.pipeline.vio import VioConfig, run_sequence_with_measurements

    rng = np.random.default_rng(7)
    b = mesh.devices.size
    t_itoc = np.eye(4)
    fparams = make_params(t_itoc)

    def stack(x):
        return np.tile(np.asarray(x, np.float32), (b,) + (1,) * np.ndim(x))

    states0 = FilterState(
        p=stack([0.0, 0.0, 1.5]), q=stack([1.0, 0.0, 0.0, 0.0]),
        v=stack([0.0, 0.0, 0.0]), ba=stack([0.0, 0.0, 0.0]),
        bg=stack([0.0, 0.0, 0.0]), off=stack(np.zeros((4, 3))),
        cov=stack(np.eye(27, dtype=np.float32) * 1e-4),
    )
    z = rng.normal(size=(b, frames, 8)).astype(np.float32) * 0.5
    r = np.tile(np.eye(8, dtype=np.float32) * 4.0, (b, frames, 1, 1))
    valid = np.ones((b, frames), bool)
    w = rng.normal(size=(b, frames, steps, 3)).astype(np.float32) * 0.1
    a = (rng.normal(size=(b, frames, steps, 3)) * 0.1 + [0, 0, 9.81]).astype(
        np.float32
    )
    dts = np.full((b, frames, steps), 0.002, np.float32)
    cfg = VioConfig(update_gate_frames=0)

    def one(s0, zz, rr, vv, ww, aa, dd):
        return run_sequence_with_measurements(
            s0, fparams, cfg, zz, rr, vv, ww, aa, dd
        )

    shard = lambda x: _global_put(x, mesh, P("seq", *([None] * (x.ndim - 1))))
    args = jax.tree.map(shard, (states0, z, r, valid, w, a, dts))

    # the per-rep work ends in a REPLICATED scalar metric (the sharded-eval
    # aggregation pattern): under multi-process meshes this jnp.sum over the
    # 'seq'-sharded output lowers to a cross-process all-reduce, so the
    # timed loop actually exercises the collective path it claims to
    # measure (a pure vmap batch has no communication at all)
    def workload(*a):
        final, outs = jax.vmap(one)(*a)
        return jnp.sum(jnp.abs(outs.p_world))

    fn = jax.jit(workload)
    out = fn(*args)  # compile + warm-up
    jax.block_until_ready(out)
    # median of several reps: a single sub-second launch is dominated by
    # dispatch jitter, which drowned the efficiency signal entirely
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "bench_seconds": dt,
        "bench_seconds_all": times,
        "bench_frames": b * frames,
        "bench_frames_per_s": b * frames / dt,
        "bench_frames_per_s_per_device": frames / dt,
        "bench_metric_checksum": float(out),
    }


def run_selftest(n_mesh_devices: int | None = None) -> dict:
    """Run both sharded workloads on a global mesh; returns checksums.

    Call after ``init_distributed`` (or single-process). The mesh spans
    ``jax.devices()`` — global across all processes.
    """
    from cuahn_vio.parallel.mesh import make_mesh

    devices = jax.devices()
    if n_mesh_devices is not None:
        devices = devices[:n_mesh_devices]
    mesh = make_mesh((len(devices),), ("seq",), devices=devices)
    out = {
        "n_processes": jax.process_count(),
        "process_id": jax.process_index(),
        "n_devices": len(devices),
    }
    out.update(_filter_checksums(mesh))
    out.update(_pose_graph_checksums(mesh))
    return out


def run_selftest_bench(n_mesh_devices: int | None = None) -> dict:
    from cuahn_vio.parallel.mesh import make_mesh

    devices = jax.devices()
    if n_mesh_devices is not None:
        devices = devices[:n_mesh_devices]
    mesh = make_mesh((len(devices),), ("seq",), devices=devices)
    out = {
        "n_processes": jax.process_count(),
        "n_devices": len(devices),
    }
    out.update(timed_filter_bench(mesh))
    return out
