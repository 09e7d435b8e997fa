"""Hamilton-quaternion and SO(3) ops (pure JAX).

Conventions (matching the reference estimator, cuahn_ros/ov_core/src/utils/
quat_ops.h:526-588):

- Quaternions are Hamilton, stored **wxyz** as shape-(4,) arrays.
- ``q`` in the filter is the body(IMU)->world rotation: ``quat_to_rot(q)``
  rotates a vector from the local frame into the global frame
  (Ham_quat_2_Rot, quat_ops.h:546-550).
- The propagation increment is applied on the right:
  ``q' = q ⊗ exp(w*dt)`` which equals the reference's
  ``Ham_quat_update(w*dt) @ q`` (quat_ops.h:526-538) — that matrix is the
  right-multiplication matrix of the increment quaternion.

All functions are total (safe at the zero-rotation limit, where the reference
divides by ``norm`` unguarded) so they can sit inside ``lax.scan`` with
zero-dt padding steps.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-24  # squared-norm floor; sqrt gives ~1e-12 angle floor


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3x3 skew-symmetric matrix [v]_x (quat_ops.h:141). Batched over leading dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def quat_mul(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product p ⊗ q, wxyz."""
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            pw * qw - px * qx - py * qy - pz * qz,
            pw * qx + px * qw + py * qz - pz * qy,
            pw * qy - px * qz + py * qw + pz * qx,
            pw * qz + px * qy - py * qx + pz * qw,
        ],
        axis=-1,
    )


def quat_exp(rot_vec: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion of a rotation vector (rotVec_2_Ham_quat, quat_ops.h:582-588).

    Safe at ||rot_vec|| -> 0 (returns identity), unlike the reference.
    """
    n2 = jnp.sum(rot_vec * rot_vec, axis=-1, keepdims=True)
    n = jnp.sqrt(n2 + _EPS)
    half = 0.5 * n
    # sin(n/2)/n with series fallback: 0.5 - n^2/48 for tiny n
    sinc_half = jnp.where(n2 > 1e-16, jnp.sin(half) / n, 0.5 - n2 / 48.0)
    w = jnp.cos(half)
    return jnp.concatenate([w, sinc_half * rot_vec], axis=-1)


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector of a unit quaternion (inverse of quat_exp).

    Safe at the identity; assumes the short arc (w >= 0 enforced by sign
    flip, since q and -q are the same rotation). No reference counterpart —
    needed by the renderer's motion-blur pose interpolation.
    """
    q = q * jnp.sign(jnp.where(q[..., :1] == 0.0, 1.0, q[..., :1]))
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:4]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(n2 + _EPS)
    angle = 2.0 * jnp.arctan2(n, w)
    # angle / sin(angle/2) with series fallback 2 + angle^2/12 near 0
    scale = jnp.where(n2 > 1e-16, angle / n, 2.0 + angle * angle / 12.0)
    return scale * v


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions), Hamilton wxyz."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize to unit quaternion (quatnorm, quat_ops.h:479)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Hamilton quaternion -> SO(3) matrix rotating local-frame vectors to the
    global frame (Ham_quat_2_Rot, quat_ops.h:546-550)."""
    w = q[..., 0]
    v = q[..., 1:4]
    eye = jnp.eye(3, dtype=q.dtype)
    vv = v[..., :, None] * v[..., None, :]
    return (
        eye * (w * w - jnp.sum(v * v, axis=-1))[..., None, None]
        + 2.0 * vv
        + 2.0 * w[..., None, None] * skew(v)
    )


def rot_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """SO(3) matrix -> Hamilton wxyz quaternion (rot_2_Ham_quat, quat_ops.h:558-571).

    Uses the trace branch only, exactly like the reference (valid for
    trace > -1, i.e. rotations away from pi).
    """
    t = jnp.trace(rot)
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + t, _EPS))
    inv4w = 1.0 / (4.0 * w)
    q = jnp.stack(
        [
            w,
            (rot[2, 1] - rot[1, 2]) * inv4w,
            (rot[0, 2] - rot[2, 0]) * inv4w,
            (rot[1, 0] - rot[0, 1]) * inv4w,
        ]
    )
    return quat_normalize(q)


def jr_so3(theta: jnp.ndarray) -> jnp.ndarray:
    """SO(3) right Jacobian J_r(theta) (Jr_theta, quat_ops.h:573-580).

    J_r = I - (1-cos n)/n^2 [θ]x + (n - sin n)/n^3 [θ]x^2, safe at n -> 0.
    """
    n2 = jnp.sum(theta * theta, axis=-1)
    n = jnp.sqrt(n2 + _EPS)
    small = n2 < 1e-12
    # coefficients with Taylor fallbacks
    c1 = jnp.where(small, 0.5 - n2 / 24.0, (1.0 - jnp.cos(n)) / jnp.maximum(n2, _EPS))
    c2 = jnp.where(
        small, 1.0 / 6.0 - n2 / 120.0, (n - jnp.sin(n)) / jnp.maximum(n2 * n, _EPS)
    )
    s = skew(theta)
    eye = jnp.eye(3, dtype=theta.dtype)
    return eye - c1[..., None, None] * s + c2[..., None, None] * (s @ s)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (local -> global frame)."""
    return jnp.einsum("...ij,...j->...i", quat_to_rot(q), v)
