"""Robocentric IMU propagation: mean + analytic 27x27 covariance Jacobians.

Rebuilds cuahn_ros/cuahn/src/state/Propagator.cpp as pure jitted functions:

- ``propagate_step``  <- predict_and_compute + predict_mean_discrete +
                         StateHelper::propagate_Cov (Propagator.cpp:183-364,
                         StateHelper.cpp:28-32), one IMU interval.
- ``propagate_window``<- the per-frame loop over selected IMU readings
                         (Propagator.cpp:60-71), as a ``lax.scan`` over a
                         statically-padded IMU window. Padding entries carry
                         dt = 0 and are exact identity steps, replacing the
                         reference's dynamic ``select_imu_readings`` loop —
                         XLA-friendly fixed shapes instead of data-dependent
                         control flow.

The per-corner Jacobian chain (Propagator.cpp:244-312, written out four
times in the reference) is a single vmapped function here.

The IMU averaging option (imu_avg, Propagator.cpp:197-204) is expected to be
done upstream: the step consumes the midpoint (w_m, a_m) of each interval
(bias subtraction commutes with averaging).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cuahn_vio.filter.state import CORNER_XY1, FilterParams, FilterState
from cuahn_vio.ops.homography import f32_precision
from cuahn_vio.ops.quat import jr_so3, quat_exp, quat_mul, quat_normalize, quat_to_rot, skew

_EZ = np.array([0.0, 0.0, 1.0], np.float32)
_MUW = np.array([0.0, 0.0, -1.0], np.float32)  # ground normal, world frame


def _corner_jacobians(pt, wc, vc, muc, dc):
    """Per-corner flow Jacobians (Propagator.cpp:244-281), one corner.

    Args:
        pt: (3,) corner bearing + offset state (xy1 + off).
        wc, vc, muc: (3,) camera-frame angular rate / velocity / plane normal.
        dc: scalar camera height over the plane.
    Returns:
        (J_df_pt, J_df_dc, J_df_vc, J_df_muc, J_df_wc)
    """
    eye = jnp.eye(3, dtype=pt.dtype)
    sk_wc = skew(wc)
    scalar = (_EZ @ vc) / dc
    mu_pt = muc @ pt
    j_df_pt = (
        sk_wc
        + jnp.outer(vc, muc) / dc
        - (_EZ @ (sk_wc @ pt)) * eye
        - jnp.outer(pt, _EZ @ sk_wc)
        - scalar * (mu_pt * eye + jnp.outer(pt, muc))
    )
    common = eye - jnp.outer(pt, _EZ)
    j_df_dc = (1.0 / dc / dc) * mu_pt * (-(common @ vc))  # (3,)
    j_df_vc = (1.0 / dc) * mu_pt * common
    j_df_muc = (1.0 / dc) * jnp.outer(common @ vc, pt)
    j_df_wc = -common @ skew(pt)
    return j_df_pt, j_df_dc, j_df_vc, j_df_muc, j_df_wc


@f32_precision
def predict_mean(state: FilterState, params: FilterParams, w_m, a_m, dt) -> FilterState:
    """Mean-only propagation (predict_mean_discrete, Propagator.cpp:342-364).

    Kept separate so the analytic F can be verified against
    ``jax.jacfwd`` of this function (SURVEY.md §4). Covariance passes
    through unchanged.
    """
    dtype = state.p.dtype
    w_hat = w_m - state.bg
    a_hat = a_m - state.ba
    rot = quat_to_rot(state.q)

    wc = params.c_rot_i @ w_hat
    vc = params.c_rot_i @ (state.v + skew(w_hat) @ params.i_t_i2c)
    muc = params.c_rot_i @ (rot.T @ _MUW.astype(dtype))
    dc = (rot @ (state.p + params.i_t_i2c))[2]
    pts = CORNER_XY1.astype(dtype) + state.off

    new_q = quat_normalize(quat_mul(state.q, quat_exp(w_hat * dt)))
    new_v = state.v + dt * (-skew(w_hat) @ state.v + a_hat + rot.T @ params.gravity)
    new_p = state.p + dt * (-skew(w_hat) @ state.p + state.v)
    h_flow = skew(wc) + jnp.outer(vc, muc) / dc
    flow = -((h_flow @ pts.T).T - pts * (pts @ h_flow.T @ _EZ.astype(dtype))[:, None])
    new_off = state.off + dt * flow
    return state._replace(p=new_p, q=new_q, v=new_v, off=new_off)


@f32_precision
def propagate_step(
    state: FilterState, params: FilterParams, w_m, a_m, dt
) -> FilterState:
    """One IMU-interval propagation: new mean + P <- F P Fᵀ + Fw Q Fwᵀ.

    Safe for dt == 0 (exact identity), enabling padded scans.

    Args:
        state: current FilterState.
        params: FilterParams.
        w_m: (3,) measured angular rate (interval midpoint, see module doc).
        a_m: (3,) measured specific force.
        dt: scalar interval length (s).
    """
    new_mean = predict_mean(state, params, w_m, a_m, dt)
    f, fw = compute_jacobians(state, params, w_m, a_m, dt)
    # ---- covariance (StateHelper.cpp:28-32)
    new_cov = f @ state.cov @ f.T + fw @ params.q_noise @ fw.T
    new_mean = new_mean._replace(cov=new_cov)
    if state.bias is not None:
        # OU measurement-bias block (see FilterState): the joint transition
        # is block-diagonal diag(F, rho*I8), so the partitioned covariance
        # propagates exactly as C <- rho F C, B <- rho^2 B + (1-rho^2) s^2 I.
        # dt == 0 gives rho == 1: an exact identity step (padding-safe).
        dtype = state.p.dtype
        rho = jnp.exp(-dt / params.bias_tau).astype(dtype)
        sig2 = jnp.asarray(params.bias_sigma, dtype) ** 2
        new_mean = new_mean._replace(
            bias=rho * state.bias,
            cov_xb=rho * (f @ state.cov_xb),
            cov_bb=rho**2 * state.cov_bb
            + (1.0 - rho**2) * sig2 * jnp.eye(8, dtype=dtype),
        )
    return new_mean


@f32_precision
def compute_jacobians(state: FilterState, params: FilterParams, w_m, a_m, dt):
    """The analytic state-transition F (27x27) and noise Jacobian Fw (27x15)
    (predict_and_compute, Propagator.cpp:224-325). Verified against
    ``jax.jacfwd`` of ``predict_mean`` in tests/test_propagate.py."""
    dtype = state.p.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    w_hat = w_m - state.bg
    rot = quat_to_rot(state.q)  # R: IMU -> world

    # camera-frame quantities (Propagator.cpp:212-215)
    wc = params.c_rot_i @ w_hat
    vc = params.c_rot_i @ (state.v + skew(w_hat) @ params.i_t_i2c)
    muc = params.c_rot_i @ (rot.T @ _MUW.astype(dtype))
    dc = (rot @ (state.p + params.i_t_i2c))[2]

    pts = CORNER_XY1.astype(dtype) + state.off  # (4, 3)

    # ---- F (27x27) core blocks (Propagator.cpp:224-237)
    f = jnp.zeros((27, 27), dtype)
    sk_w = skew(w_hat)
    f = f.at[0:3, 0:3].set(eye3 - dt * sk_w)
    f = f.at[0:3, 6:9].set(dt * eye3)
    f = f.at[0:3, 12:15].set(-dt * skew(state.p))
    f = f.at[3:6, 3:6].set(quat_to_rot(quat_exp(w_hat * dt)).T)
    f = f.at[3:6, 12:15].set(-dt * jr_so3(w_hat * dt))
    f = f.at[6:9, 3:6].set(dt * skew(rot.T @ params.gravity))
    f = f.at[6:9, 6:9].set(eye3 - dt * sk_w)
    f = f.at[6:9, 9:12].set(-dt * eye3)
    f = f.at[6:9, 12:15].set(-dt * skew(state.v))
    f = f.at[9:12, 9:12].set(eye3)
    f = f.at[12:15, 12:15].set(eye3)

    # ---- corner blocks, vmapped over the 4 corners (Propagator.cpp:244-312)
    j_df_pt, j_df_dc, j_df_vc, j_df_muc, j_df_wc = jax.vmap(
        _corner_jacobians, in_axes=(0, None, None, None, None)
    )(pts, wc, vc, muc, dc)

    # constant-extrinsic Jacobians (set_const_Jacobian, Propagator.h:191-196)
    j_vc_v = params.c_rot_i
    j_vc_bw = params.c_rot_i @ skew(params.i_t_i2c)
    j_wc_bw = -params.c_rot_i
    # shared chain terms (Propagator.cpp:284-287)
    j_dc_p = _EZ.astype(dtype) @ rot  # (3,)
    j_dc_q = _EZ.astype(dtype) @ (-rot @ skew(state.p + params.i_t_i2c))
    j_muc_q = params.c_rot_i @ skew(rot.T @ _MUW.astype(dtype))

    # J_f_df = -dt*I, so each block is -dt * (chain)
    blk_p = -dt * jnp.einsum("ki,j->kij", j_df_dc, j_dc_p)  # (4, 3, 3)
    blk_q = -dt * (
        jnp.einsum("ki,j->kij", j_df_dc, j_dc_q) + j_df_muc @ j_muc_q
    )
    blk_v = -dt * (j_df_vc @ j_vc_v)
    blk_bg = -dt * (j_df_vc @ j_vc_bw + j_df_wc @ j_wc_bw)
    blk_pt = eye3 - dt * j_df_pt  # (4, 3, 3)

    for k in range(4):
        r = 15 + 3 * k
        f = f.at[r : r + 3, 0:3].set(blk_p[k])
        f = f.at[r : r + 3, 3:6].set(blk_q[k])
        f = f.at[r : r + 3, 6:9].set(blk_v[k])
        f = f.at[r : r + 3, 12:15].set(blk_bg[k])
        f = f.at[r : r + 3, r : r + 3].set(blk_pt[k])

    # ---- Fw (27x15) (Propagator.cpp:314-325)
    fw = jnp.zeros((27, 15), dtype)
    fw = fw.at[0:3, 0:3].set(-f[0:3, 12:15])
    fw = fw.at[0:3, 12:15].set(dt * eye3)
    fw = fw.at[3:6, 0:3].set(-f[3:6, 12:15])
    fw = fw.at[6:9, 0:3].set(-f[6:9, 12:15])
    fw = fw.at[6:9, 3:6].set(dt * eye3)
    fw = fw.at[9:12, 6:9].set(dt * eye3)
    fw = fw.at[12:15, 9:12].set(dt * eye3)
    for k in range(4):
        r = 15 + 3 * k
        fw = fw.at[r : r + 3, 0:3].set(-f[r : r + 3, 12:15])

    return f, fw


def propagate_window(
    state: FilterState, params: FilterParams, w_win, a_win, dt_win
) -> FilterState:
    """Propagate over a padded per-frame IMU window via ``lax.scan``.

    Args:
        w_win, a_win: (T, 3) interval-midpoint gyro / accel measurements.
        dt_win: (T,) interval lengths; entries with dt == 0 are padding and
            leave the state exactly unchanged.
    """

    def body(s, inp):
        w_m, a_m, dt = inp
        return propagate_step(s, params, w_m, a_m, dt), None

    state, _ = jax.lax.scan(body, state, (w_win, a_win, dt_win))
    return state
