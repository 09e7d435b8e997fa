"""Sequence-sharded batched evaluation: many flights, one mesh.

`BASELINE.json` config 4: "Multi-sequence batched evaluation: all UZH-FPV
sequences sharded across one host". Sequences are padded to a common frame
count, stacked on a leading ``seq`` axis, and the whole
scan-over-frames runs under one jit with the batch sharded over the mesh;
ATE-style error sums are reduced with psum on device.

The filter recurrence stays serial per sequence (physics), but B sequences
run in lockstep — per-chip throughput scales with B until HBM/MXU saturate,
and across chips/hosts via the ``seq`` mesh axis.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuahn_vio.filter.state import FilterParams, FilterState
from cuahn_vio.pipeline.vio import VioConfig, run_sequence


def batched_run_sequences(
    states0: FilterState,  # leading axis B (stacked pytree)
    model: Any,
    net_params: Any,
    fparams: FilterParams,
    cfg: VioConfig,
    imgs_u8: jnp.ndarray,  # (B, F+1, H, W)
    w_win: jnp.ndarray,  # (B, F, T, 3)
    a_win: jnp.ndarray,  # (B, F, T, 3)
    dt_win: jnp.ndarray,  # (B, F, T)
    keys: jnp.ndarray,  # (B, 2) PRNG keys
    mesh: Mesh | None = None,
):
    """Run B sequences in lockstep; optionally shard B over mesh axis 'seq'.

    Returns (final_states, outputs) with leading axis B. With a mesh, inputs
    are placed sharded and jit partitions the whole scan automatically.
    """

    def one(state0, imgs, w, a, dts, key):
        return run_sequence(
            state0, model, net_params, fparams, cfg, imgs, w, a, dts, key
        )

    fn = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0)))

    if mesh is not None:
        def shard(x):
            spec = P("seq", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        states0 = jax.tree.map(shard, states0)
        imgs_u8, w_win, a_win, dt_win, keys = jax.tree.map(
            shard, (imgs_u8, w_win, a_win, dt_win, keys)
        )
        net_params = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), net_params
        )

    return fn(states0, imgs_u8, w_win, a_win, dt_win, keys)


@partial(jax.jit, static_argnames=("axis",))
def _psum_sq(err, axis):
    return jax.lax.psum(jnp.sum(err * err), axis)


def aggregate_rmse(err_by_seq: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Cross-device RMSE of per-frame errors via psum over the 'seq' axis —
    the collective replacing ROS-topic metric fan-in."""
    from jax import shard_map

    n_total = err_by_seq.size

    def body(e):
        ss = jax.lax.psum(jnp.sum(e * e), "seq")
        return jnp.sqrt(ss / n_total)

    fn = shard_map(
        body, mesh=mesh, in_specs=P("seq", None), out_specs=P()
    )
    return fn(err_by_seq)
