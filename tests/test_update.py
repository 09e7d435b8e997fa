"""EKF update + reset + initializer tests vs a straightforward numpy
re-derivation of UpdaterHNet.cpp / StateHelper.cpp / InertialInitializer.cpp."""

import jax
import numpy as np
import jax.numpy as jnp

from cuahn_vio.filter import (
    FilterState,
    hnet_update,
    initial_covariance,
    initial_state,
    make_params,
    propagated_offset8,
    reset_4pt_offset,
    try_initialize,
)
from tests.test_propagate import T_ITOC, make_state


def numpy_update(cov, off, mean8, cov88, k_net_cov, update_offset):
    """UpdaterHNet::update (UpdaterHNet.cpp:28-61) with explicit H matrix."""
    h = np.zeros((8, 27))
    for i in range(4):
        h[2 * i : 2 * i + 2, 15 + 3 * i : 15 + 3 * i + 2] = np.eye(2)
    s = h @ cov @ h.T + k_net_cov * cov88 / 25440.25
    k = cov @ h.T @ np.linalg.inv(s)
    prop8 = off[:, :2].reshape(8)
    inno = mean8 / 159.5 - prop8
    new_cov = (np.eye(27) - k @ h) @ cov
    d = k @ inno
    if not update_offset:
        d = d.copy()
        d[15:] = 0
    return new_cov, d


def test_update_matches_numpy(rng):
    params = make_params(T_ITOC)
    state = make_state(rng)
    # make cov symmetric positive definite-ish
    m = rng.normal(size=(27, 27)) * 0.01
    cov = np.eye(27) * 1e-3 + m @ m.T
    state = state._replace(cov=jnp.array(cov, jnp.float32))
    mean8 = rng.normal(size=8) * 5
    c = rng.normal(size=(8, 8))
    cov88 = np.eye(8) * 2 + 0.1 * (c @ c.T)

    out = hnet_update(
        state, params, jnp.array(mean8, jnp.float32), jnp.array(cov88, jnp.float32),
        update_offset=True,
    )
    ref_cov, d = numpy_update(cov, np.asarray(state.off), mean8, cov88, 10.0, True)
    np.testing.assert_allclose(np.asarray(out.cov), ref_cov, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(state.p) + d[0:3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(state.v) + d[6:9], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.ba), np.asarray(state.ba) + d[9:12], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.bg), np.asarray(state.bg) + d[12:15], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.off), np.asarray(state.off) + d[15:].reshape(4, 3), atol=1e-5
    )


def test_update_no_offset_keeps_offsets(rng):
    params = make_params(T_ITOC)
    state = make_state(rng)
    m = rng.normal(size=(27, 27)) * 0.01
    state = state._replace(cov=jnp.array(np.eye(27) * 1e-3 + m @ m.T, jnp.float32))
    mean8 = jnp.array(rng.normal(size=8) * 5, jnp.float32)
    cov88 = jnp.eye(8, dtype=jnp.float32) * 2
    out = hnet_update(state, params, mean8, cov88, update_offset=False)
    np.testing.assert_allclose(np.asarray(out.off), np.asarray(state.off), atol=0)
    # core states still move
    assert not np.allclose(np.asarray(out.p), np.asarray(state.p))


def test_propagated_offset8_layout(rng):
    state = make_state(rng)
    out = np.asarray(propagated_offset8(state))
    np.testing.assert_allclose(out, np.asarray(state.off)[:, :2].reshape(8), atol=0)


def test_reset(rng):
    state = make_state(rng)
    out = reset_4pt_offset(state)
    assert np.all(np.asarray(out.off) == 0)
    cov = np.asarray(out.cov)
    np.testing.assert_allclose(
        cov[:15, :15], np.asarray(state.cov)[:15, :15], atol=0
    )
    assert np.all(cov[15:, :] == 0) and np.all(cov[:, 15:] == 0)


def _static_imu(rng, t0, t1, hz=200, accel=(0.0, 0.0, 9.81), noise=0.0):
    t = np.arange(t0, t1, 1.0 / hz)
    a = np.tile(np.asarray(accel), (len(t), 1)) + rng.normal(size=(len(t), 3)) * noise
    w = rng.normal(size=(len(t), 3)) * noise
    return t, w, a


def test_initializer_waits_then_fires(rng):
    # 2.5 s stationary, then 0.5 s of jerk
    t1, w1, a1 = _static_imu(rng, 0.0, 2.5, noise=0.005)
    t2 = np.arange(2.5, 3.0, 1.0 / 200)
    a2 = np.array([[0, 0, 9.81]]) + rng.normal(size=(len(t2), 3)) * 3.0  # excited
    w2 = rng.normal(size=(len(t2), 3)) * 0.2
    imu_t = np.concatenate([t1, t2])
    imu_w = np.concatenate([w1, w2])
    imu_a = np.concatenate([a1, a2])

    # before the jerk: must not initialize
    n_pre = len(t1)
    assert try_initialize(imu_t[:n_pre], imu_w[:n_pre], imu_a[:n_pre]) is None

    res = try_initialize(imu_t, imu_w, imu_a, init_height=0.1)
    assert res is not None
    # flat stationary IMU: attitude ~ identity, bg ~ 0, ba ~ 0, p0 ~ [0,0,0.1]
    np.testing.assert_allclose(abs(res.q_i0_to_w[0]), 1.0, atol=1e-3)
    np.testing.assert_allclose(res.bg0, 0.0, atol=5e-3)
    np.testing.assert_allclose(res.ba0, 0.0, atol=5e-2)
    np.testing.assert_allclose(res.p0, [0, 0, 0.1], atol=1e-3)
    np.testing.assert_allclose(res.v0, 0.0, atol=0)
    # t0 = end of the stationary window = newest - window_length
    # (InertialInitializer.cpp:266-272: window_2to1.back().timestamp)
    assert 1.9 < res.t0 <= 2.0


def test_initializer_tilted_gravity(rng):
    # IMU tilted: accel measured along a rotated axis; q must gravity-align
    from cuahn_vio.ops import quat_exp, quat_to_rot

    rv = np.array([0.3, -0.2, 0.0])
    r_i2w = np.asarray(quat_to_rot(quat_exp(jnp.array(rv))))
    a_body = r_i2w.T @ np.array([0, 0, 9.81])
    t1, w1, a1 = _static_imu(rng, 0.0, 2.5, accel=a_body, noise=0.003)
    t2 = np.arange(2.5, 3.0, 1.0 / 200)
    a2 = a_body + rng.normal(size=(len(t2), 3)) * 3.0
    w2 = rng.normal(size=(len(t2), 3)) * 0.2
    res = try_initialize(
        np.concatenate([t1, t2]),
        np.concatenate([w1, w2]),
        np.concatenate([a1, a2]),
    )
    assert res is not None
    # R(q) must map measured accel direction to world +z
    r_est = np.asarray(quat_to_rot(jnp.array(res.q_i0_to_w)))
    up_world = r_est @ (a_body / np.linalg.norm(a_body))
    np.testing.assert_allclose(up_world, [0, 0, 1], atol=5e-3)


def test_initial_covariance_gauge():
    q = np.array([1.0, 0.0, 0.0, 0.0])
    p = initial_covariance(q)
    assert p[0, 0] == 0 and p[1, 1] == 0  # x, y gauge (StateHelper.cpp:37)
    np.testing.assert_allclose(p[2, 2], 0.005**2, rtol=1e-6)
    assert p[5, 5] == 0  # yaw gauge (StateHelper.cpp:44)
    std = 0.5 / 180 * 3.14159265
    np.testing.assert_allclose(p[3, 3], std**2, rtol=1e-6)
    np.testing.assert_allclose(p[9, 9], 0.005**2, rtol=1e-6)
    assert p[12, 12] == 0  # bg (StateHelper.cpp:48)


def test_initial_state_assembly(rng):
    t1, w1, a1 = _static_imu(rng, 0.0, 2.5, noise=0.003)
    t2 = np.arange(2.5, 3.0, 1.0 / 200)
    a2 = np.array([[0, 0, 9.81]]) + rng.normal(size=(len(t2), 3)) * 3.0
    res = try_initialize(
        np.concatenate([t1, t2]),
        np.concatenate([w1, rng.normal(size=(len(t2), 3)) * 0.2]),
        np.concatenate([a1, a2]),
    )
    st = initial_state(res)
    assert isinstance(st, FilterState)
    assert st.cov.shape == (27, 27)
    assert np.all(np.asarray(st.off) == 0)


# ------------------------- measurement validation (new vs the reference) ---


def _spd_state(rng):
    state = make_state(rng)
    a = rng.normal(size=(27, 27)) * 1e-3
    cov = a @ a.T + np.eye(27) * 1e-4
    return state._replace(cov=jnp.array(cov, jnp.float32))


def test_update_rejects_nonfinite_measurement(rng):
    params = make_params(T_ITOC)
    state = _spd_state(rng)
    mean8 = jnp.full(8, jnp.nan)
    cov88 = jnp.eye(8) * jnp.inf
    new = hnet_update(state, params, mean8, cov88, update_offset=True)
    for a, b in zip(jax.tree.leaves(new), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_update_rejects_outlier_by_chi2_gate(rng):
    params = make_params(T_ITOC)
    state = _spd_state(rng)
    # confident (small cov) but wildly wrong flow -> huge Mahalanobis distance
    mean8 = jnp.full(8, 150.0)  # ~1 rad of normalized offset error
    cov88 = jnp.eye(8) * 0.25
    new = hnet_update(state, params, mean8, cov88, update_offset=True)
    np.testing.assert_array_equal(np.asarray(new.p), np.asarray(state.p))
    # the same flow with an honest (huge) covariance passes the gate
    honest = hnet_update(
        state, params, mean8, jnp.eye(8) * 1e8, update_offset=True
    )
    assert np.isfinite(np.asarray(honest.cov)).all()
    assert float(jnp.trace(honest.cov)) <= float(jnp.trace(state.cov)) + 1e-9


def test_update_accepts_consistent_measurement(rng):
    params = make_params(T_ITOC)
    state = _spd_state(rng)
    # measurement equal to the propagated offset prior: zero innovation,
    # must be accepted and shrink the covariance
    mean8 = propagated_offset8(state) * 159.5
    cov88 = jnp.eye(8) * 4.0
    new = hnet_update(state, params, mean8, cov88, update_offset=True)
    assert float(jnp.trace(new.cov)) < float(jnp.trace(state.cov))


def test_model_variance_finite_on_saturated_logvar_head():
    """exp(logvar) must not overflow to inf even when the log-variance head
    saturates (the failure that NaN-poisoned the filter on off-plane
    frames): LOGVAR_CLAMP bounds the ensemble variance."""
    import jax

    from cuahn_vio.models.uahn import init_uahn

    model, params = init_uahn(jax.random.PRNGKey(0))
    # drive the head to an absurd output via a huge output-layer bias
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            x + 1e6
            if any(getattr(k, "key", None) == "head_logvar" for k in path)
            and any(getattr(k, "key", None) == "bias" for k in path)
            and x.shape == (8,)
            else x
        ),
        params,
    )
    img = jnp.zeros((224, 320), jnp.float32)
    flow8, cov88 = model.apply(
        {"params": params}, img, img, jnp.zeros((4, 2)), use_prior=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(cov88)).all()


def test_iekf_mean_only_update_preserves_covariance(rng):
    """Intermediate IEKF iterations (cov_update=False) must refine the mean
    without shrinking P — the covariance is shrunk once, on the final
    iteration (filter/update.py hnet_update docstring)."""
    params = make_params(T_ITOC)
    state = _spd_state(rng)
    mean8 = propagated_offset8(state) * 159.5 + 2.0
    cov88 = jnp.eye(8) * 4.0
    mid = hnet_update(
        state, params, mean8, cov88, update_offset=True, cov_update=False
    )
    # covariance untouched, mean moved toward the measurement
    assert np.allclose(np.asarray(mid.cov), np.asarray(state.cov))
    assert not np.allclose(np.asarray(mid.off), np.asarray(state.off))
    # second (final) iteration from the refined mean: innovation is smaller
    # and the posterior covariance equals a single full update's (the gain
    # depends only on P and R, both unchanged by the mean-only step)
    full = hnet_update(state, params, mean8, cov88, update_offset=False)
    final = hnet_update(mid, params, mean8, cov88, update_offset=False)
    assert np.allclose(np.asarray(final.cov), np.asarray(full.cov), atol=1e-8)
