"""Property tests for Hamilton quaternion ops vs closed forms.

Mirrors the math in cuahn_ros/ov_core/src/utils/quat_ops.h:526-588.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuahn_vio.ops import (
    skew,
    quat_mul,
    quat_exp,
    quat_to_rot,
    rot_to_quat,
    jr_so3,
    quat_normalize,
)


def rodrigues(rot_vec):
    """Closed-form SO(3) exponential."""
    th = np.linalg.norm(rot_vec)
    if th < 1e-12:
        return np.eye(3)
    k = rot_vec / th
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx


def ham_quat_update_matrix(rot_vec):
    """The reference's Ham_quat_update (quat_ops.h:526-538), verbatim in numpy."""
    angle = np.linalg.norm(rot_vec)
    dqv = np.sin(angle * 0.5) * rot_vec / angle
    m = np.eye(4) * np.cos(angle * 0.5)
    sk = np.array(
        [[0, -(-dqv[2]), (-dqv[1])], [(-dqv[2]), 0, -(-dqv[0])], [-(-dqv[1]), (-dqv[0]), 0]]
    )
    # skew_x(-dqv):
    sk = np.array([[0, dqv[2], -dqv[1]], [-dqv[2], 0, dqv[0]], [dqv[1], -dqv[0], 0]])
    m[1:, 1:] += sk
    m[0, 1:] = -dqv
    m[1:, 0] = dqv
    return m


def test_skew(rng):
    v = rng.normal(size=3)
    w = rng.normal(size=3)
    np.testing.assert_allclose(
        np.asarray(skew(jnp.array(v))) @ w, np.cross(v, w), atol=1e-12
    )


def test_quat_exp_matches_rodrigues(rng):
    for _ in range(5):
        rv = rng.normal(size=3)
        q = quat_exp(jnp.array(rv))
        np.testing.assert_allclose(
            np.asarray(quat_to_rot(q)), rodrigues(rv), atol=1e-6
        )


def test_quat_exp_zero_is_identity():
    q = quat_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-7)
    assert np.all(np.isfinite(np.asarray(quat_to_rot(q))))


def test_right_multiplication_matches_reference_matrix(rng):
    """q' = q ⊗ exp(w dt) must equal Ham_quat_update(w dt) @ q (Propagator.cpp:348)."""
    for _ in range(5):
        rv = rng.normal(size=3) * 0.1
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        ref = ham_quat_update_matrix(rv) @ q
        ours = quat_mul(jnp.array(q), quat_exp(jnp.array(rv)))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_quat_mul_vs_rotation_composition(rng):
    p = np.asarray(quat_exp(jnp.array(rng.normal(size=3))))
    q = np.asarray(quat_exp(jnp.array(rng.normal(size=3))))
    r_pq = np.asarray(quat_to_rot(quat_mul(jnp.array(p), jnp.array(q))))
    r_sep = np.asarray(quat_to_rot(jnp.array(p))) @ np.asarray(quat_to_rot(jnp.array(q)))
    np.testing.assert_allclose(r_pq, r_sep, atol=1e-6)


def test_rot_to_quat_roundtrip(rng):
    for _ in range(5):
        rv = rng.normal(size=3)
        q = np.asarray(quat_exp(jnp.array(rv)))
        r = np.asarray(quat_to_rot(jnp.array(q)))
        q2 = np.asarray(rot_to_quat(jnp.array(r)))
        # sign ambiguity: reference's trace branch returns w >= 0
        if q[0] < 0:
            q = -q
        np.testing.assert_allclose(q2, q, atol=1e-6)


def test_jr_so3_closed_form(rng):
    th = rng.normal(size=3)
    n = np.linalg.norm(th)
    kx = np.array([[0, -th[2], th[1]], [th[2], 0, -th[0]], [-th[1], th[0], 0]])
    ref = (
        np.eye(3)
        - (1 - np.cos(n)) / n**2 * kx
        + (n - np.sin(n)) / n**3 * kx @ kx
    )
    np.testing.assert_allclose(np.asarray(jr_so3(jnp.array(th))), ref, atol=1e-5)


def test_jr_so3_small_angle():
    j = np.asarray(jr_so3(jnp.zeros(3)))
    np.testing.assert_allclose(j, np.eye(3), atol=1e-7)


def test_jr_property_exp_composition(rng):
    """exp(θ+δ) ≈ exp(θ) exp(Jr(θ) δ) for small δ — the defining property."""
    th = rng.normal(size=3) * 0.8
    d = rng.normal(size=3) * 1e-5
    lhs = rodrigues(th + d)
    jr = np.asarray(jr_so3(jnp.array(th)))
    rhs = rodrigues(th) @ rodrigues(jr @ d)
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)


def test_quat_normalize(rng):
    q = rng.normal(size=4) * 3
    out = np.asarray(quat_normalize(jnp.array(q)))
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-7)


def test_quat_log_roundtrip(rng):
    """quat_log is the exact inverse of quat_exp on the short arc."""
    from cuahn_vio.ops import quat_log

    for _ in range(50):
        v = rng.standard_normal(3) * rng.uniform(1e-8, 3.0)
        if np.linalg.norm(v) >= np.pi:  # stay on the principal branch
            v = v / np.linalg.norm(v) * rng.uniform(0, np.pi - 1e-3)
        q = quat_exp(jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(quat_log(q)), v, atol=2e-5)
        # and exp(log(q)) == q up to sign
        q2 = quat_exp(quat_log(q))
        np.testing.assert_allclose(np.abs(np.asarray(q2)), np.abs(np.asarray(q)), atol=1e-5)


def test_quat_log_identity_and_sign():
    from cuahn_vio.ops import quat_log

    np.testing.assert_allclose(
        np.asarray(quat_log(jnp.array([1.0, 0.0, 0.0, 0.0]))), 0.0, atol=1e-7
    )
    # q and -q are the same rotation
    q = quat_exp(jnp.array([0.3, -0.2, 0.1]))
    np.testing.assert_allclose(
        np.asarray(quat_log(q)), np.asarray(quat_log(-q)), atol=1e-6
    )
