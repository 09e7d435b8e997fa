"""Filter propagation tests.

The decisive check (SURVEY.md §4): the analytic 27x27 state-transition F
(Propagator.cpp:224-312) must equal ``jax.jacfwd`` of the discrete mean
propagation under the filter's error-state convention
(q = q_hat ⊗ exp(δθ), additive for everything else).
"""

import numpy as np
import jax
import jax.numpy as jnp

from cuahn_vio.filter import (
    CORNER_XY1,
    FilterParams,
    FilterState,
    compute_jacobians,
    make_params,
    predict_mean,
    propagate_step,
    propagate_window,
)
from cuahn_vio.ops import quat_exp, quat_mul, quat_normalize

# UZH-FPV indoor-45 extrinsics (cuahn/launch/uzhfpv.launch:86-92)
T_ITOC = np.array(
    [
        [-0.027256691772188965, -0.9996260641688061, 0.0021919370477445077, 0.02422852666805565],
        [-0.7139206120417471, 0.017931469899155242, -0.6999970157716363, 0.008974432843748055],
        [0.6996959571525168, -0.020644471939022302, -0.714142404092339, -0.000638971731537894],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def make_state(rng, dtype=jnp.float32):
    q = np.asarray(quat_exp(jnp.array(rng.normal(size=3) * 0.4)))
    return FilterState(
        p=jnp.array(rng.normal(size=3) * 0.5 + [0, 0, 1.5], dtype),
        q=jnp.array(q, dtype),
        v=jnp.array(rng.normal(size=3), dtype),
        ba=jnp.array(rng.normal(size=3) * 0.02, dtype),
        bg=jnp.array(rng.normal(size=3) * 0.01, dtype),
        off=jnp.array(rng.normal(size=(4, 3)) * 0.01, dtype),
        cov=jnp.eye(27, dtype=dtype) * 1e-4,
    )


def apply_error(state: FilterState, err: jnp.ndarray) -> FilterState:
    """Inject a 27-d error-state perturbation (UpdaterHNet.cpp:46-60 order)."""
    return FilterState(
        p=state.p + err[0:3],
        q=quat_normalize(quat_mul(state.q, quat_exp(err[3:6]))),
        v=state.v + err[6:9],
        ba=state.ba + err[9:12],
        bg=state.bg + err[12:15],
        off=state.off + err[15:27].reshape(4, 3),
        cov=state.cov,
    )


def extract_error(nom: FilterState, pert: FilterState) -> jnp.ndarray:
    """Recover the 27-d error between two states (small-angle for q)."""
    q_inv = nom.q * jnp.array([1.0, -1.0, -1.0, -1.0], nom.q.dtype)
    dq = quat_mul(q_inv, pert.q)
    dtheta = 2.0 * dq[1:4] * jnp.sign(dq[0])
    return jnp.concatenate(
        [
            pert.p - nom.p,
            dtheta,
            pert.v - nom.v,
            pert.ba - nom.ba,
            pert.bg - nom.bg,
            (pert.off - nom.off).reshape(12),
        ]
    )


def test_analytic_f_matches_autodiff(rng):
    params = make_params(T_ITOC)
    state = make_state(rng)
    w_m = jnp.array(rng.normal(size=3) * 0.5, jnp.float32)
    a_m = jnp.array(rng.normal(size=3) + [0, 0, 9.6], jnp.float32)
    dt = 0.002

    def err_map(err):
        pert = apply_error(state, err)
        new_pert = predict_mean(pert, params, w_m, a_m, dt)
        new_nom = predict_mean(state, params, w_m, a_m, dt)
        return extract_error(new_nom, new_pert)

    f_auto = jax.jacfwd(err_map)(jnp.zeros(27, jnp.float32))
    f_analytic, _ = compute_jacobians(state, params, w_m, a_m, dt)
    # dt-scaled off-diagonal entries are O(dt)=2e-3; compare absolutely.
    np.testing.assert_allclose(
        np.asarray(f_analytic), np.asarray(f_auto), atol=3e-6
    )


def test_fw_structure(rng):
    params = make_params(T_ITOC)
    state = make_state(rng)
    w_m = jnp.array(rng.normal(size=3), jnp.float32)
    a_m = jnp.array(rng.normal(size=3), jnp.float32)
    f, fw = compute_jacobians(state, params, w_m, a_m, 0.004)
    fw = np.asarray(fw)
    f = np.asarray(f)
    dt_eye = 0.004 * np.eye(3)
    # mapping per Propagator.cpp:314-325
    np.testing.assert_allclose(fw[0:3, 0:3], -f[0:3, 12:15], atol=0)
    np.testing.assert_allclose(fw[0:3, 12:15], dt_eye, atol=1e-9)
    np.testing.assert_allclose(fw[3:6, 0:3], -f[3:6, 12:15], atol=0)
    np.testing.assert_allclose(fw[6:9, 3:6], dt_eye, atol=1e-9)
    np.testing.assert_allclose(fw[9:12, 6:9], dt_eye, atol=1e-9)
    np.testing.assert_allclose(fw[12:15, 9:12], dt_eye, atol=1e-9)
    for k in range(4):
        r = 15 + 3 * k
        np.testing.assert_allclose(fw[r : r + 3, 0:3], -f[r : r + 3, 12:15], atol=0)


def test_zero_dt_is_identity(rng):
    params = make_params(T_ITOC)
    state = make_state(rng)
    w_m = jnp.array(rng.normal(size=3), jnp.float32)
    a_m = jnp.array(rng.normal(size=3), jnp.float32)
    out = propagate_step(state, params, w_m, a_m, 0.0)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_padded_window_matches_unpadded(rng):
    params = make_params(T_ITOC)
    state = make_state(rng)
    w = jnp.array(rng.normal(size=(5, 3)) * 0.3, jnp.float32)
    a = jnp.array(rng.normal(size=(5, 3)) + [0, 0, 9.6], jnp.float32)
    dts = jnp.full((5,), 0.002, jnp.float32)

    out1 = propagate_window(state, params, w, a, dts)
    # same with 3 zero-padding steps appended
    pad = jnp.zeros((3, 3), jnp.float32)
    out2 = propagate_window(
        state,
        params,
        jnp.concatenate([w, pad]),
        jnp.concatenate([a, pad]),
        jnp.concatenate([dts, jnp.zeros(3, jnp.float32)]),
    )
    for x, y in zip(jax.tree.leaves(out1), jax.tree.leaves(out2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_stationary_hover_keeps_state(rng):
    """Hover: IMU reads exactly -gravity in body frame with identity
    attitude -> v stays 0, height constant, offsets grow with zero flow."""
    params = make_params(T_ITOC)
    state = FilterState(
        p=jnp.array([0.0, 0.0, 1.0]),
        q=jnp.array([1.0, 0.0, 0.0, 0.0]),
        v=jnp.zeros(3),
        ba=jnp.zeros(3),
        bg=jnp.zeros(3),
        off=jnp.zeros((4, 3)),
        cov=jnp.eye(27) * 1e-6,
    )
    w_m = jnp.zeros(3)
    a_m = jnp.array([0.0, 0.0, 9.81])
    out = state
    for _ in range(50):
        out = propagate_step(out, params, w_m, a_m, 0.002)
    np.testing.assert_allclose(np.asarray(out.p), [0, 0, 1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.v), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.q), [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.off), 0.0, atol=1e-6)
    # covariance must stay symmetric PSD-ish
    cov = np.asarray(out.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-10)


def test_corner_constants():
    np.testing.assert_allclose(
        np.asarray(CORNER_XY1),
        [[-1, -0.69906, 1], [-1, 0.69906, 1], [1, 0.69906, 1], [1, -0.69906, 1]],
        atol=0,
    )
