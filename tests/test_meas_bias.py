"""Correlated-measurement-error augmentation tests (round 5).

The partitioned bias filter (filter/state.py FilterState docstring) is
checked against a straightforward DENSE 35-state joint implementation:
joint x = [x27; b8], F_joint = diag(F, rho*I8), H_joint = [H, I8]. The
partitioned code must reproduce the dense propagate/update exactly, and
must reduce bit-exactly to the unaugmented filter when sigma_b = 0.
No reference counterpart exists (the reference assumes white measurement
noise, UpdaterHNet.cpp:28-34).
"""

import numpy as np
import jax.numpy as jnp

from cuahn_vio.filter import make_params
from cuahn_vio.filter.propagate import compute_jacobians, propagate_step
from cuahn_vio.filter.state import FOCAL2, with_bias_block, reset_4pt_offset
from cuahn_vio.filter.update import MEAS_IDX, hnet_update, innovation_stats
from tests.test_propagate import T_ITOC, make_state


def _bias_params(**kw):
    return make_params(T_ITOC, bias_sigma_px=kw.pop("sigma_px", 1.5),
                       bias_tau=kw.pop("tau", 2.0), **kw)


def _rand_joint_state(rng, params):
    state = make_state(rng)
    m = rng.normal(size=(35, 35)) * 0.01
    joint = np.eye(35) * 1e-3 + m @ m.T  # SPD joint covariance
    state = state._replace(
        cov=jnp.array(joint[:27, :27], jnp.float32),
        bias=jnp.array(rng.normal(size=8) * 0.01, jnp.float32),
        cov_xb=jnp.array(joint[:27, 27:], jnp.float32),
        cov_bb=jnp.array(joint[27:, 27:], jnp.float32),
    )
    return state, joint


def _h_joint():
    h = np.zeros((8, 35))
    for i in range(4):
        h[2 * i : 2 * i + 2, 15 + 3 * i : 15 + 3 * i + 2] = np.eye(2)
    h[:, 27:] = np.eye(8)
    return h


def test_bias_propagate_matches_dense_joint(rng):
    params = _bias_params()
    state, joint = _rand_joint_state(rng, params)
    w_m = rng.normal(size=3).astype(np.float32)
    a_m = (rng.normal(size=3) + np.array([0, 0, 9.81])).astype(np.float32)
    dt = np.float32(0.005)

    out = propagate_step(state, params, jnp.array(w_m), jnp.array(a_m), dt)

    f27, fw = compute_jacobians(state, params, jnp.array(w_m), jnp.array(a_m), dt)
    rho = np.exp(-float(dt) / 2.0)
    sig2 = (1.5 / 159.5) ** 2
    f_joint = np.zeros((35, 35))
    f_joint[:27, :27] = np.asarray(f27)
    f_joint[27:, 27:] = rho * np.eye(8)
    q_joint = np.zeros((35, 35))
    q_joint[:27, :27] = np.asarray(fw) @ np.asarray(params.q_noise) @ np.asarray(fw).T
    q_joint[27:, 27:] = (1 - rho**2) * sig2 * np.eye(8)
    ref = f_joint @ joint @ f_joint.T + q_joint

    np.testing.assert_allclose(np.asarray(out.cov), ref[:27, :27], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.cov_xb), ref[:27, 27:], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.cov_bb), ref[27:, 27:], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out.bias), rho * np.asarray(state.bias), atol=1e-6
    )


def test_bias_update_matches_dense_joint(rng):
    params = _bias_params()
    state, joint = _rand_joint_state(rng, params)
    mean8 = rng.normal(size=8).astype(np.float32) * 5
    c = rng.normal(size=(8, 8))
    cov88 = (np.eye(8) * 2 + 0.1 * c @ c.T).astype(np.float32)

    out = hnet_update(
        state, params, jnp.array(mean8), jnp.array(cov88), update_offset=True
    )

    h = _h_joint()
    r = 10.0 * cov88 / FOCAL2
    s = h @ joint @ h.T + r
    k = joint @ h.T @ np.linalg.inv(s)
    pred = np.asarray(state.off)[:, :2].reshape(8) + np.asarray(state.bias)
    inno = mean8 / 159.5 - pred
    d = k @ inno
    new_joint = joint - k @ s @ k.T

    np.testing.assert_allclose(np.asarray(out.cov), new_joint[:27, :27], atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.cov_xb), new_joint[:27, 27:], atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.cov_bb), new_joint[27:, 27:], atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(state.p) + d[:3], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.bias), np.asarray(state.bias) + d[27:], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.off), np.asarray(state.off) + d[15:27].reshape(4, 3),
        atol=1e-5,
    )


def test_zero_sigma_bias_block_is_inert(rng):
    """With sigma_b = 0 the attached bias block stays identically zero and
    the 27-state trajectory is bit-identical to the unaugmented filter."""
    params = make_params(T_ITOC, bias_sigma_px=0.0, bias_tau=2.0)
    state = make_state(rng)
    m = rng.normal(size=(27, 27)) * 0.01
    state = state._replace(cov=jnp.array(np.eye(27) * 1e-3 + m @ m.T, jnp.float32))
    aug = with_bias_block(state, params)

    w_m = jnp.array(rng.normal(size=3), jnp.float32)
    a_m = jnp.array(rng.normal(size=3) + np.array([0, 0, 9.81]), jnp.float32)
    mean8 = jnp.array(rng.normal(size=8) * 5, jnp.float32)
    c = rng.normal(size=(8, 8))
    cov88 = jnp.array(np.eye(8) * 2 + 0.1 * c @ c.T, jnp.float32)

    plain = propagate_step(state, params, w_m, a_m, 0.005)
    plain = hnet_update(plain, params, mean8, cov88, update_offset=False)
    plain = reset_4pt_offset(plain)

    full = propagate_step(aug, params, w_m, a_m, 0.005)
    full = hnet_update(full, params, mean8, cov88, update_offset=False)
    full = reset_4pt_offset(full)

    np.testing.assert_array_equal(np.asarray(full.bias), np.zeros(8))
    np.testing.assert_array_equal(np.asarray(full.cov_xb), np.zeros((27, 8)))
    for name in ("p", "q", "v", "ba", "bg", "off", "cov"):
        np.testing.assert_allclose(
            np.asarray(getattr(full, name)), np.asarray(getattr(plain, name)),
            atol=1e-6, err_msg=name,
        )


def test_reset_keeps_core_bias_cross(rng):
    params = _bias_params()
    state, joint = _rand_joint_state(rng, params)
    out = reset_4pt_offset(state)
    np.testing.assert_allclose(
        np.asarray(out.cov_xb)[:15], joint[:15, 27:], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out.cov_xb)[15:], np.zeros((12, 8)))
    np.testing.assert_allclose(np.asarray(out.cov_bb), joint[27:, 27:], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.bias), np.asarray(state.bias))


def test_adaptive_inflation_bounds_gain(rng):
    """chi2_soft: a wildly inconsistent measurement gets its white-noise
    part inflated so the state kick shrinks; a consistent one is untouched."""
    params = make_params(T_ITOC, chi2_soft=15.5)
    params_off = make_params(T_ITOC)
    state = make_state(rng)
    m = rng.normal(size=(27, 27)) * 0.01
    state = state._replace(
        cov=jnp.array(np.eye(27) * 1e-4 + m @ m.T, jnp.float32),
        off=jnp.zeros((4, 3), jnp.float32),
    )
    cov88 = jnp.eye(8, dtype=jnp.float32) * 4.0

    # consistent measurement: tiny innovation -> identical update
    small = jnp.ones(8, jnp.float32) * 0.05
    a = hnet_update(state, params, small, cov88, update_offset=False)
    b = hnet_update(state, params_off, small, cov88, update_offset=False)
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p), atol=1e-7)

    # outlier: large innovation -> inflated S -> strictly smaller kick
    big = jnp.ones(8, jnp.float32) * 60.0
    a = hnet_update(state, params, big, cov88, update_offset=False)
    b = hnet_update(state, params_off, big, cov88, update_offset=False)
    da = np.linalg.norm(np.asarray(a.v) - np.asarray(state.v))
    db = np.linalg.norm(np.asarray(b.v) - np.asarray(state.v))
    assert da < 0.5 * db, (da, db)
    # chi2 recorded by innovation_stats is the RAW (pre-inflation) one
    _, _, chi2, _, _ = innovation_stats(state, params, big, cov88)
    assert float(chi2) > 15.5
