"""Continuous/discrete IMU preintegration (cpi parity) as pose-graph factors.

Replaces cuahn_ros/ov_core/src/cpi/ (CpiBase/CpiV1/CpiV2 — OpenVINS
continuous preintegration, compiled but unused by the CUAHN pipeline): the
relative-motion summary of an IMU interval

    Delta R (as quaternion), Delta v, Delta p,  with bias Jacobians

so a pose-graph smoother can use IMU factors between keyframes without
re-integrating raw samples each Gauss-Newton iteration. The integration is
one lax.scan over the (masked, padded) sample window — the same fixed-shape
windowing the filter's propagation uses — and the bias Jacobians come from
jax.jacfwd of the integrator instead of 200 lines of hand-derived chain
rule (CpiV1.cpp): exact to machine precision by construction.

Conventions match the filter (Hamilton wxyz, right-increment, FLU gravity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_normalize, quat_to_rot


class PreintFactor(NamedTuple):
    dq: jnp.ndarray  # (4,) Delta orientation, body_start -> body_end
    dv: jnp.ndarray  # (3,) Delta velocity in the start body frame (gravity-free)
    dp: jnp.ndarray  # (3,) Delta position in the start body frame (gravity-free)
    dt: jnp.ndarray  # () total integration time
    j_q_bg: jnp.ndarray  # (3, 3) d(theta)/d(bg)
    j_v_bg: jnp.ndarray  # (3, 3)
    j_v_ba: jnp.ndarray  # (3, 3)
    j_p_bg: jnp.ndarray  # (3, 3)
    j_p_ba: jnp.ndarray  # (3, 3)


def _integrate(w_win, a_win, dt_win, bg, ba):
    """Midpoint preintegration of a padded window (T, 3)/(T,); dt == 0 rows
    are no-ops (the imu_window padding convention)."""

    def step(carry, xs):
        q, v, p = carry
        w, a, dt = xs
        w_hat = w - bg
        a_hat = a - ba
        r = quat_to_rot(q)
        acc = r @ a_hat  # into the start frame
        p_new = p + v * dt + 0.5 * acc * dt * dt
        v_new = v + acc * dt
        q_new = quat_normalize(quat_mul(q, quat_exp(w_hat * dt)))
        keep = dt > 0
        q_new = jnp.where(keep, q_new, q)
        return (q_new, jnp.where(keep, v_new, v), jnp.where(keep, p_new, p)), None

    init = (jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.zeros(3), jnp.zeros(3))
    (q, v, p), _ = jax.lax.scan(step, init, (w_win, a_win, dt_win))
    return q, v, p


def preintegrate(
    w_win: jnp.ndarray,  # (T, 3) gyro samples (midpoint-averaged)
    a_win: jnp.ndarray,  # (T, 3) accel samples
    dt_win: jnp.ndarray,  # (T,) interval lengths, 0 = padding
    bg: jnp.ndarray,  # (3,) gyro bias linearization point
    ba: jnp.ndarray,  # (3,) accel bias linearization point
) -> PreintFactor:
    """Build one preintegrated IMU factor with autodiff bias Jacobians."""
    q, v, p = _integrate(w_win, a_win, dt_win, bg, ba)

    def vp_of_biases(b):
        _, v_, p_ = _integrate(w_win, a_win, dt_win, b[:3], b[3:])
        return jnp.concatenate([v_, p_])

    def theta_of_bg(b):
        q_, _, _ = _integrate(w_win, a_win, dt_win, b, ba)
        # right-error angle of q_ relative to q
        dq = quat_mul(q * jnp.array([1.0, -1.0, -1.0, -1.0]), q_)
        return 2.0 * dq[1:4]

    j_vp = jax.jacfwd(vp_of_biases)(jnp.concatenate([bg, ba]))
    j_q_bg = jax.jacfwd(theta_of_bg)(bg)
    return PreintFactor(
        dq=q,
        dv=v,
        dp=p,
        dt=jnp.sum(dt_win),
        j_q_bg=j_q_bg,
        j_v_bg=j_vp[:3, :3],
        j_v_ba=j_vp[:3, 3:],
        j_p_bg=j_vp[3:, :3],
        j_p_ba=j_vp[3:, 3:],
    )


def predict_from_factor(
    f: PreintFactor,
    q_i2w: jnp.ndarray,  # (4,) start orientation body->world
    p_w: jnp.ndarray,  # (3,) start position, world
    v_w: jnp.ndarray,  # (3,) start velocity, world
    gravity: jnp.ndarray,  # (3,) e.g. [0, 0, -9.81]
    dbg: jnp.ndarray | None = None,  # (3,) bias delta from linearization point
    dba: jnp.ndarray | None = None,
):
    """Apply a preintegrated factor: world-frame end state (the measurement
    model of an IMU factor in the smoother). First-order bias correction via
    the stored Jacobians."""
    dq, dv, dp = f.dq, f.dv, f.dp
    if dbg is not None:
        dq = quat_normalize(quat_mul(dq, quat_exp(f.j_q_bg @ dbg)))
        dv = dv + f.j_v_bg @ dbg
        dp = dp + f.j_p_bg @ dbg
    if dba is not None:
        dv = dv + f.j_v_ba @ dba
        dp = dp + f.j_p_ba @ dba
    r0 = quat_to_rot(q_i2w)
    q_end = quat_normalize(quat_mul(q_i2w, dq))
    v_end = v_w + gravity * f.dt + r0 @ dv
    p_end = p_w + v_w * f.dt + 0.5 * gravity * f.dt * f.dt + r0 @ dp
    return q_end, p_end, v_end
