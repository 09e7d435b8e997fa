"""Filter state and static parameters (pure pytrees).

The reference's mutable 27-state error-state container
(cuahn_ros/cuahn/src/state/State.{h,cpp}) becomes an immutable NamedTuple;
every filter operation is a pure function state -> state.

State layout (State.cpp:31-91): error-state ids
  p 0:3 | q 3:6 | v 6:9 | ba 9:12 | bg 12:15 | 4x corner offsets 15:27
with corners ordered UL, BL, BR, UR.

Robocentric convention (Propagator.cpp:342-364, RosVisualizer.cpp:171):
  - q is the Hamilton body(IMU)->world quaternion (wxyz),
  - p is the position of the world origin->IMU vector expressed in the
    CURRENT IMU frame; world position = R(q) @ p,
  - v is the IMU velocity expressed in the current IMU frame.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

# normalized corner bearing vectors (State.h:110-113): (±1, ±111.5/159.5, 1)
CORNER_XY1 = np.array(
    [
        [-1.0, -0.69906, 1.0],  # upper-left
        [-1.0, 0.69906, 1.0],  # bottom-left
        [1.0, 0.69906, 1.0],  # bottom-right
        [1.0, -0.69906, 1.0],  # upper-right
    ],
    dtype=np.float32,
)

# pixel <-> normalized-camera scaling (VioManager.cpp:234, UpdaterHNet.cpp:33)
FOCAL = 159.5
FOCAL2 = 25440.25  # 159.5^2 (UpdaterHNet.cpp:31)

STATE_DIM = 27
CORE_DIM = 15


class FilterState(NamedTuple):
    """The 27-state filter estimate: a small pytree, trivially checkpointable.

    Correlated-measurement-error augmentation (round 5; no reference
    counterpart — the reference assumes white measurement noise,
    UpdaterHNet.cpp:28-34, and its state covariance has never been
    NEES-validated): the network's corner-flow error carries a
    slowly-varying component that a white-noise R cannot express, so the
    error state is optionally augmented with an 8-D measurement-bias block
    ``b`` following an Ornstein-Uhlenbeck (AR(1)) law

        b' = exp(-dt/tau) b + w,   stationary var sigma_b^2 I.

    Measurement model becomes  z/159.5 = offset + b + white.  The joint
    35-state covariance is kept PARTITIONED — ``cov`` stays the exact
    (27, 27) marginal of the original states (so every downstream consumer
    of ``cov`` keeps working, incl. the NEES eval), with the cross block
    ``cov_xb`` and bias block ``cov_bb`` carried alongside. When the three
    bias fields are None (default) every filter function reduces exactly
    to the unaugmented reference model.
    """

    p: jnp.ndarray  # (3,)  world-origin -> IMU, in IMU frame
    q: jnp.ndarray  # (4,)  Hamilton wxyz, IMU -> world
    v: jnp.ndarray  # (3,)  velocity in IMU frame
    ba: jnp.ndarray  # (3,) accelerometer bias
    bg: jnp.ndarray  # (3,) gyroscope bias
    off: jnp.ndarray  # (4, 3) corner-offset states (z nominally 0)
    cov: jnp.ndarray  # (27, 27) error-state covariance (exact marginal)
    bias: Optional[jnp.ndarray] = None  # (8,) measurement bias, normalized
    cov_xb: Optional[jnp.ndarray] = None  # (27, 8) state-bias cross-cov
    cov_bb: Optional[jnp.ndarray] = None  # (8, 8) bias covariance


class FilterParams(NamedTuple):
    """Static (non-estimated) filter parameters.

    The camera extrinsics are stored exactly as the reference does
    (State.cpp:93-99): c_rot_i = R (cam<-imu), i_t_i2c = -Rᵀ t from the
    T_ItoC homogeneous matrix.
    """

    c_rot_i: jnp.ndarray  # (3, 3) rotation IMU -> camera
    i_t_i2c: jnp.ndarray  # (3,)   IMU -> camera offset, in IMU frame
    gravity: jnp.ndarray  # (3,)   [0, 0, -9.81] world FLU (Propagator.h:100)
    q_noise: jnp.ndarray  # (15, 15) process noise (Propagator.h:93-97)
    k_net_cov: jnp.ndarray  # scalar: measurement-cov tuning (UpdaterOptions.h:33)
    # Mahalanobis (chi-square, 8 DoF) innovation gate: measurements whose
    # normalized innovation exceeds this are rejected inside the jitted
    # update. The reference has no outlier gate at all (SURVEY.md §5.3) and
    # its shipped estimate ends in NaNs. The learned covariance is only
    # calibrated to a factor of a few (replay median chi2 ~35 vs the ideal
    # 8), so this is a catastrophe gate — far above the miscalibration
    # level, well below the confident-but-wrong failures it exists to stop.
    # Non-finite network outputs are always rejected regardless of the gate.
    # (plain float default: creating a jnp array at class-definition time
    # would initialize the backend on import, breaking platform selection)
    chi2_gate: float = 1000.0
    # --- correlated-measurement-error model (round 5; see FilterState) ---
    # OU measurement-bias stationary std-dev, NORMALIZED camera units
    # (pixels / 159.5); 0 leaves an enabled bias block inert.
    bias_sigma: float = 0.0
    # OU correlation time, seconds.
    bias_tau: float = 1.0
    # Soft innovation threshold for adaptive measurement-covariance
    # inflation: when the raw innovation chi2 exceeds this, the NETWORK
    # covariance part of S is scaled by chi2/chi2_soft before computing
    # the gain — a covariance-matching robust update that bounds the
    # state kick a heavy-tailed measurement can deliver (the replay's
    # innovation chi2 p95 is ~86 vs the 8-DoF ideal 15.5; a third of the
    # position-error growth comes from chi2>30 frames). inf disables.
    chi2_soft: float = float("inf")
    # Prior-echo fraction beta of the prior-mode network (round 5,
    # MEASURED on the replay: regressing the network's corner-flow error
    # against the fed prior's error gives slope ~+0.5 — the cascade only
    # corrects about half of the prior error it is given, the rest is
    # echoed back). Measurement model becomes
    #     z/159.5 = (1-beta) h(x) + beta h(x_prior) + b + n,
    # i.e. an effective Jacobian (1-beta) H: the innovation under-reports
    # the true prior error by (1-beta), so the consistent gain is LARGER
    # when the prior dominates S and the covariance contracts LESS —
    # both exactly what the measured NEES optimism calls for. 0 restores
    # the reference's echo-blind model (UpdaterHNet.cpp:28-34).
    echo_beta: float = 0.0


def make_params(
    t_imu_to_cam: jnp.ndarray,
    gravity_mag: float = 9.81,
    sigma_w: float = 0.00559017,
    sigma_a: float = 0.01118034,
    sigma_wb: float = 8.94427e-4,
    sigma_ab: float = 0.04472136,
    k_net_cov: float = 10.0,
    chi2_gate: float = 1000.0,
    q_scale: float = 1.0,
    extra_pos_noise: float = 1.0e-4,
    bias_sigma_px: float = 0.0,
    bias_tau: float = 1.0,
    chi2_soft: float = float("inf"),
    echo_beta: float = 0.0,
    dtype=jnp.float32,
) -> FilterParams:
    """Build FilterParams from the 4x4 T_ItoC extrinsic and noise densities.

    Noise defaults are the UZH-FPV launch values (cuahn/launch/uzhfpv.launch:
    70-74); Q layout per Propagator.h:93-97 including the extra position
    process noise (hardcoded 1e-4*I there, configurable here). ``q_scale``
    multiplies the four sensor-noise variances — the launch sigmas model
    sensor noise only, while the filter also absorbs measurement-model error
    (see VioOptions.process_noise_scale).
    """
    t = jnp.asarray(t_imu_to_cam, dtype)
    c_rot_i = t[:3, :3]
    i_t_i2c = -c_rot_i.T @ t[:3, 3]
    q = jnp.zeros((15, 15), dtype)
    q = q.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype) * (q_scale * sigma_w**2))
    q = q.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype) * (q_scale * sigma_a**2))
    q = q.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype) * (q_scale * sigma_ab**2))
    q = q.at[9:12, 9:12].set(jnp.eye(3, dtype=dtype) * (q_scale * sigma_wb**2))
    q = q.at[12:15, 12:15].set(jnp.eye(3, dtype=dtype) * extra_pos_noise)
    return FilterParams(
        c_rot_i=c_rot_i,
        i_t_i2c=i_t_i2c,
        gravity=jnp.array([0.0, 0.0, -gravity_mag], dtype),
        q_noise=q,
        k_net_cov=jnp.asarray(k_net_cov, dtype),
        chi2_gate=jnp.asarray(chi2_gate, dtype),
        bias_sigma=jnp.asarray(bias_sigma_px / FOCAL, dtype),
        bias_tau=jnp.asarray(bias_tau, dtype),
        chi2_soft=jnp.asarray(chi2_soft, dtype),
        echo_beta=jnp.asarray(echo_beta, dtype),
    )


def with_bias_block(state: FilterState, params: FilterParams) -> FilterState:
    """Attach an inert-at-zero measurement-bias block to a plain state:
    b = 0, cross-cov 0, bias cov at its stationary value sigma_b^2 I."""
    dtype = state.p.dtype
    sig2 = jnp.asarray(params.bias_sigma, dtype) ** 2
    return state._replace(
        bias=jnp.zeros(8, dtype),
        cov_xb=jnp.zeros((27, 8), dtype),
        cov_bb=jnp.eye(8, dtype=dtype) * sig2,
    )


def reset_4pt_offset(state: FilterState) -> FilterState:
    """Zero the corner offsets and every covariance entry outside the
    top-left 15x15 core block (State.cpp:101-111).

    With the bias block: the offset states become exactly zero, so their
    cross-covariance with the bias is zeroed too; the core-bias cross
    block, the bias mean and its covariance persist across frames — that
    persistence is the whole point of the augmentation."""
    new_cov = jnp.zeros_like(state.cov)
    new_cov = new_cov.at[:CORE_DIM, :CORE_DIM].set(
        state.cov[:CORE_DIM, :CORE_DIM]
    )
    state = state._replace(off=jnp.zeros_like(state.off), cov=new_cov)
    if state.cov_xb is not None:
        state = state._replace(cov_xb=state.cov_xb.at[CORE_DIM:, :].set(0.0))
    return state
