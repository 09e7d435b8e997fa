"""Cumulative SE(3) B-spline trajectory fixture.

Rebuilds the reference's BsplineSE3 (cuahn_ros/ov_core/src/sim/
BsplineSE3.{h,cpp}) the TPU-native way: a *differentiable* cumulative cubic
B-spline over control poses, evaluated with pure jnp ops. Where the C++
hand-derives pose/velocity/acceleration formulas, here only the pose map is
written down — the IMU (angular rate, specific force) falls out of
``jax.jacfwd`` through the same code path the analytic trajectory uses
(synthetic.AnalyticTrajectory.imu_true), so mean/derivative consistency is
guaranteed by construction.

Simulator parity (cuahn/src/sim/Simulator.cpp:50-97): `from_trajectory_file`
loads a '# t x y z qx qy qz qw' txt, resamples it at a uniform knot spacing,
and the resulting SplineTrajectory plugs straight into
``synthetic.make_sequence`` to generate seeded noisy IMU + rendered frames.

Cumulative cubic basis on [t_i, t_i+dt), u=(t-t_i)/dt, controls
T_{i-1},T_i,T_{i+1},T_{i+2} (BsplineSE3.cpp:95-118):
    T(u) = T_{i-1} exp(b1(u) O_i) exp(b2(u) O_{i+1}) exp(b3(u) O_{i+2})
    O_j  = log(T_{j-1}^-1 T_j)
    b1 = (5 + 3u - 3u^2 + u^3)/6, b2 = (1 + 3u + 3u^2 - 2u^3)/6, b3 = u^3/6
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cuahn_vio.ops.quat import quat_to_rot, rot_to_quat, skew

def _rot_coeffs(theta2):
    """(sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) with Taylor branches so the
    result is smooth (and twice-differentiable — the IMU comes from
    jacfwd^2 of the pose) through theta=0. Double-where pattern: the
    untaken sqrt branch sees a safe input, so no NaN leaks into grads."""
    small = theta2 < 1e-8
    safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (safe * theta),
    )
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, small-angle safe (BsplineSE3 uses ov_core
    exp_so3)."""
    a, b, _ = _rot_coeffs(w @ w)
    wx = skew(w)
    return jnp.eye(3) + a * wx + b * (wx @ wx)


def so3_log(rot: jnp.ndarray) -> jnp.ndarray:
    tr = jnp.clip((jnp.trace(rot) - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(tr)
    vee = 0.5 * jnp.array(
        [rot[2, 1] - rot[1, 2], rot[0, 2] - rot[2, 0], rot[1, 0] - rot[0, 1]]
    )
    s = jnp.sin(theta)
    scale = jnp.where(theta < 1e-6, 1.0, theta / jnp.maximum(s, 1e-12))
    return scale * vee


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V such that exp_se3 translation = V @ rho."""
    _, b, c = _rot_coeffs(w @ w)
    wx = skew(w)
    return jnp.eye(3) + b * wx + c * (wx @ wx)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """xi = [rho(3), w(3)] -> 4x4 (exp_se3 ordering of ov_core: we use
    translation-first to match the pose-graph module's [p, theta])."""
    rho, w = xi[:3], xi[3:]
    rot = so3_exp(w)
    t = _left_jacobian(w) @ rho
    out = jnp.eye(4)
    out = out.at[:3, :3].set(rot)
    out = out.at[:3, 3].set(t)
    return out


def se3_log(t4: jnp.ndarray) -> jnp.ndarray:
    w = so3_log(t4[:3, :3])
    vinv = jnp.linalg.inv(_left_jacobian(w))
    return jnp.concatenate([vinv @ t4[:3, 3], w])


class SplineTrajectory:
    """Differentiable cumulative cubic B-spline over uniform control poses.

    Exposes the synthetic.AnalyticTrajectory interface (pos_w, quat_i2w,
    imu_true, state_gt) so ``make_sequence`` can render frames + IMU from a
    recorded or scripted trajectory, exactly like the reference Simulator
    drives BsplineSE3 from a txt file.
    """

    def __init__(self, control_T: np.ndarray, dt: float, t0: float = 0.0):
        """control_T: (N, 4, 4) poses at t0 + i*dt (N >= 4)."""
        if control_T.shape[0] < 4:
            raise ValueError("need >= 4 control poses")
        self.ctrl = jnp.asarray(control_T, jnp.float32)
        self.dt = float(dt)
        self.t0 = float(t0)
        # relative twists O_j = log(T_{j-1}^-1 T_j), precomputed (N-1, 6)
        inv = jnp.linalg.inv(self.ctrl[:-1])
        rel = jnp.einsum("nij,njk->nik", inv, self.ctrl[1:])
        self.omega = jax.vmap(se3_log)(rel)
        self.t_min = self.t0 + self.dt  # first valid segment start
        # last valid segment is i = N-3 (uses omega[N-2], the final twist),
        # so queries are valid on [t0+dt, t0+(N-2)dt)
        self.t_max = self.t0 + (control_T.shape[0] - 2) * self.dt

    @classmethod
    def from_trajectory_file(
        cls, path: str, dt: float = 0.1, z_offset: float = 0.0
    ):
        """Load '# t x y z qx qy qz qw' txt (Simulator.cpp:50-76), resample
        at uniform dt by nearest-time pick (the reference likewise feeds raw
        poses as control points after a distance-threshold skip).

        ``z_offset`` shifts the trajectory vertically — needed when replaying
        a mocap-frame trajectory over the synthetic z=0 ground plane (e.g.
        UZH-FPV indoor_45_2 flies z in [-1.4, 0.7] mocap; +1.7 puts the
        ground plausibly at z=0)."""
        rows = []
        with open(path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                v = [float(x) for x in line.replace(",", " ").split()]
                if len(v) >= 8:
                    rows.append(v[:8])
        arr = np.asarray(rows)
        if arr.shape[0] < 4:
            raise ValueError(f"{path}: fewer than 4 poses")
        times = arr[:, 0]
        grid = np.arange(times[0], times[-1], dt)
        # true nearest-time pick: searchsorted gives first-at-or-after;
        # compare against the previous sample and keep the closer one
        idx = np.clip(np.searchsorted(times, grid), 1, len(times) - 1)
        pick_prev = np.abs(times[idx - 1] - grid) <= np.abs(times[idx] - grid)
        idx = np.where(pick_prev, idx - 1, idx)
        ctrl = np.zeros((len(grid), 4, 4))
        for k, i in enumerate(idx):
            q = arr[i, 4:8]  # xyzw in file
            qwxyz = jnp.array([q[3], q[0], q[1], q[2]])
            ctrl[k, :3, :3] = np.asarray(quat_to_rot(qwxyz))
            ctrl[k, :3, 3] = arr[i, 1:4] + [0.0, 0.0, z_offset]
            ctrl[k, 3, 3] = 1.0
        # zero-base the time axis so the trajectory interface (queried with
        # t starting at 0 by make_sequence) starts at the file's first pose
        return cls(ctrl, dt, t0=0.0)

    def pose(self, t) -> jnp.ndarray:
        """4x4 body->world pose at time t (clamped to the valid span)."""
        t = jnp.clip(t, self.t_min, self.t_max - 1e-6)
        s = (t - self.t0) / self.dt
        i = jnp.clip(jnp.floor(s).astype(jnp.int32), 1, self.ctrl.shape[0] - 3)
        u = s - i.astype(s.dtype)
        u2, u3 = u * u, u * u * u
        b1 = (5.0 + 3.0 * u - 3.0 * u2 + u3) / 6.0
        b2 = (1.0 + 3.0 * u + 3.0 * u2 - 2.0 * u3) / 6.0
        b3 = u3 / 6.0
        base = self.ctrl[i - 1]
        a1 = se3_exp(b1 * self.omega[i - 1])
        a2 = se3_exp(b2 * self.omega[i])
        a3 = se3_exp(b3 * self.omega[i + 1])
        return base @ a1 @ a2 @ a3

    # --- AnalyticTrajectory interface -----------------------------------
    def pos_w(self, t) -> jnp.ndarray:
        return self.pose(t)[:3, 3]

    def quat_i2w(self, t) -> jnp.ndarray:
        return rot_to_quat(self.pose(t)[:3, :3])

    def imu_true(self, t, gravity_mag: float = 9.81):
        """True (w_body, specific force) via autodiff of the pose map —
        replaces BsplineSE3's hand-derived get_velocity/get_acceleration."""
        rot = self.pose(t)[:3, :3]
        drot = jax.jacfwd(lambda tt: self.pose(tt)[:3, :3])(t)
        wx = rot.T @ drot  # body angular velocity, skew form
        w_body = jnp.array([wx[2, 1], wx[0, 2], wx[1, 0]])
        acc_w = jax.jacfwd(jax.jacfwd(self.pos_w))(t)
        g_w = jnp.array([0.0, 0.0, -gravity_mag])
        f_body = rot.T @ (acc_w - g_w)
        return w_body, f_body

    def state_gt(self, t):
        t4 = self.pose(t)
        rot = t4[:3, :3]
        v_w = jax.jacfwd(self.pos_w)(t)
        return rot.T @ t4[:3, 3], rot_to_quat(rot), rot.T @ v_w
