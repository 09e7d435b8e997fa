"""Static-IMU initialization and gauge-fixed initial covariance.

Rebuilds:
- InertialInitializer::initialize_with_imu_CUAHN
  (cuahn_ros/ov_core/src/init/InertialInitializer.cpp:163-281): two
  1-second windows of IMU; initialize when the newest window is excited
  (jerk) and the previous one was stationary; gravity-aligned attitude from
  the averaged stationary accel; biases from window means; robocentric
  p0 = R_WtoI @ [0, 0, init_height], v0 = 0.
- StateHelper::initialize_Cov (cuahn_ros/cuahn/src/state/StateHelper.cpp:
  34-63): gauge fixing — x/y position and yaw variance exactly zero, then
  the p and q blocks rotated into the initial IMU frame.

This runs once per sequence on the host (numpy), outside jit — matching the
reference's one-shot host-side init path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from cuahn_vio.filter.state import FilterState


class InitResult(NamedTuple):
    t0: float
    q_i0_to_w: np.ndarray  # (4,) wxyz
    p0: np.ndarray  # (3,) robocentric
    v0: np.ndarray
    ba0: np.ndarray
    bg0: np.ndarray


def try_initialize(
    imu_t: np.ndarray,
    imu_w: np.ndarray,
    imu_a: np.ndarray,
    window_length: float = 1.0,
    imu_excite_threshold: float = 0.5,
    init_height: float = 0.1,
    gravity_mag: float = 9.81,
    wait_for_jerk: bool = True,
) -> Optional[InitResult]:
    """Attempt initialization from the IMU buffered so far.

    Args:
        imu_t: (N,) timestamps (seconds, ascending).
        imu_w: (N, 3) gyro. imu_a: (N, 3) accel.
    Returns InitResult or None (not yet initializable), with the exact
    window/variance/jerk logic of InertialInitializer.cpp:168-281.
    """
    if imu_t.shape[0] < 2:
        return None
    newest, oldest = imu_t[-1], imu_t[0]
    if newest - oldest < 2 * window_length:
        return None

    m_1to0 = (imu_t > newest - window_length) & (imu_t <= newest)
    m_2to1 = (imu_t > newest - 2 * window_length) & (imu_t <= newest - window_length)
    if not m_1to0.any() or not m_2to1.any():
        return None

    a_1to0 = imu_a[m_1to0]
    a_2to1 = imu_a[m_2to1]
    w_2to1 = imu_w[m_2to1]

    def excite(a):
        avg = a.mean(axis=0)
        return np.sqrt(((a - avg) ** 2).sum() / (a.shape[0] - 1))

    a_var_1to0 = excite(a_1to0)
    a_var_2to1 = excite(a_2to1)
    if wait_for_jerk and a_var_1to0 < imu_excite_threshold:
        return None  # no jerk yet (InertialInitializer.cpp:229-233)
    if wait_for_jerk and a_var_2to1 > imu_excite_threshold:
        return None  # was still moving (InertialInitializer.cpp:235-238)

    a_avg = a_2to1.mean(axis=0)
    w_avg = w_2to1.mean(axis=0)

    # gravity-aligned rotation (InertialInitializer.cpp:243-260):
    # columns of Ro are the world axes expressed in the IMU frame -> Ro = R_WtoI
    z_axis = a_avg / np.linalg.norm(a_avg)
    e1 = np.array([1.0, 0.0, 0.0])
    x_axis = e1 - z_axis * (z_axis @ e1)
    x_axis /= np.linalg.norm(x_axis)
    y_axis = np.cross(z_axis, x_axis)
    ro = np.stack([x_axis, y_axis, z_axis], axis=1)

    # q_I0toW from Roᵀ = R_ItoW (rot_2_Ham_quat, quat_ops.h:558-571)
    r = ro.T
    t = np.trace(r)
    qw = 0.5 * np.sqrt(1.0 + t)
    q = np.array(
        [
            qw,
            (r[2, 1] - r[1, 2]) / (4 * qw),
            (r[0, 2] - r[2, 0]) / (4 * qw),
            (r[1, 0] - r[0, 1]) / (4 * qw),
        ]
    )
    q /= np.linalg.norm(q)

    gravity = np.array([0.0, 0.0, gravity_mag])
    ba = a_avg - ro @ gravity  # InertialInitializer.cpp:263
    bg = w_avg
    p0 = ro @ np.array([0.0, 0.0, init_height])  # robocentric (.cpp:266-270)

    return InitResult(
        t0=float(imu_t[m_2to1][-1]),
        q_i0_to_w=q,
        p0=p0,
        v0=np.zeros(3),
        ba0=ba,
        bg0=bg,
    )


def initial_covariance(q_i0_to_w: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Gauge-fixed initial 27x27 covariance (StateHelper.cpp:34-63)."""
    p = np.zeros((27, 27), dtype=np.float64)
    p[2, 2] = 0.005**2  # z height only; x, y gauge-fixed to 0
    std_rad = 0.5 / 180.0 * 3.14159265  # reference uses this literal pi
    p[3, 3] = std_rad**2
    p[4, 4] = std_rad**2
    p[5, 5] = 0.0  # yaw gauge-fixed
    p[9:12, 9:12] = np.eye(3) * 0.005**2  # ba
    p[12:15, 12:15] = 0.0  # bg

    # rotate p/q blocks into the initial IMU frame via R = Ham_quat_2_Rot(q)
    w, x, y, z = q_i0_to_w
    r = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    p[0:3, 0:3] = r.T @ p[0:3, 0:3] @ r
    p[3:6, 3:6] = r.T @ p[3:6, 3:6] @ r
    return p.astype(dtype)


def initial_state(init: InitResult, dtype=np.float32) -> FilterState:
    """Assemble the initial FilterState (VioManager.cpp:337-350)."""
    import jax.numpy as jnp

    return FilterState(
        p=jnp.asarray(init.p0, dtype),
        q=jnp.asarray(init.q_i0_to_w, dtype),
        v=jnp.asarray(init.v0, dtype),
        ba=jnp.asarray(init.ba0, dtype),
        bg=jnp.asarray(init.bg0, dtype),
        off=jnp.zeros((4, 3), dtype),
        cov=jnp.asarray(initial_covariance(init.q_i0_to_w), dtype),
    )
