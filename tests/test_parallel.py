"""Multi-device tests on the fake 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): sequence-sharded batched filter,
collective metric aggregation, and the graft-entry dryrun contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuahn_vio.filter import FilterState, make_params
from cuahn_vio.parallel import aggregate_rmse, batched_run_sequences, make_mesh
from cuahn_vio.pipeline.vio import VioConfig, run_sequence_with_measurements
from tests.test_propagate import T_ITOC


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 fake CPU devices")
    return make_mesh((8,), ("seq",))


def _stacked_states(b):
    def stack(x):
        return jnp.stack([jnp.asarray(x, jnp.float32)] * b)

    return FilterState(
        p=stack([0.0, 0.0, 1.5]),
        q=stack([1.0, 0.0, 0.0, 0.0]),
        v=stack([0.0, 0.0, 0.0]),
        ba=stack([0.0, 0.0, 0.0]),
        bg=stack([0.0, 0.0, 0.0]),
        off=stack(np.zeros((4, 3))),
        cov=stack(np.eye(27) * 1e-4),
    )


def test_sharded_filter_matches_single_device(mesh, rng):
    """Sequence-sharded execution must be bit-compatible with unsharded."""
    b, frames, steps = 8, 5, 6
    fparams = make_params(T_ITOC)
    states0 = _stacked_states(b)
    z = jnp.array(rng.normal(size=(b, frames, 8)) * 0.5, jnp.float32)
    r = jnp.tile(jnp.eye(8, dtype=jnp.float32) * 4.0, (b, frames, 1, 1))
    valid = jnp.ones((b, frames), bool)
    w = jnp.array(rng.normal(size=(b, frames, steps, 3)) * 0.1, jnp.float32)
    a = jnp.array(
        rng.normal(size=(b, frames, steps, 3)) * 0.1 + [0, 0, 9.81], jnp.float32
    )
    dts = jnp.full((b, frames, steps), 0.002, jnp.float32)

    cfg = VioConfig(update_gate_frames=0)

    def one(s0, zz, rr, vv, ww, aa, dd):
        return run_sequence_with_measurements(s0, fparams, cfg, zz, rr, vv, ww, aa, dd)

    # unsharded reference
    final_ref, outs_ref = jax.jit(jax.vmap(one))(states0, z, r, valid, w, a, dts)

    # sharded over the mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shard(x):
        return jax.device_put(
            x, NamedSharding(mesh, P("seq", *([None] * (x.ndim - 1))))
        )

    args = jax.tree.map(shard, (states0, z, r, valid, w, a, dts))
    final_sh, outs_sh = jax.jit(jax.vmap(one))(*args)

    np.testing.assert_allclose(
        np.asarray(outs_sh.p_world), np.asarray(outs_ref.p_world), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(final_sh.cov), np.asarray(final_ref.cov), atol=1e-6
    )
    # outputs actually live sharded over 8 devices
    assert len(outs_sh.p_world.sharding.device_set) == 8


def test_aggregate_rmse_collective(mesh, rng):
    err = jnp.array(rng.normal(size=(8, 16)), jnp.float32)
    got = np.asarray(aggregate_rmse(err, mesh))
    want = np.sqrt(np.mean(np.asarray(err) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_graft_dryrun_small():
    """The driver contract: dryrun_multichip must compile+run on N fake
    devices. Use 2 here to keep CI time low (8 covered manually)."""
    import __graft_entry__ as g

    g.dryrun_multichip(2)
