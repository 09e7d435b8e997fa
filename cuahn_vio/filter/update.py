"""EKF measurement update with the network's 4-point offset + covariance.

Rebuilds cuahn_ros/cuahn/src/update/UpdaterHNet.{h,cpp}:

- H (8x27) is the constant selector of the (x, y) components of the four
  corner-offset states (UpdaterHNet.h:56-66) — realized here as indexed
  gathers/scatters instead of materializing the sparse matrix.
- K = P Hᵀ (H P Hᵀ + K_net * Σ_net / 159.5²)⁻¹, innovation =
  mean_net/159.5 − propagated offset, P <- (I − K H) P, additive state
  correction with quaternion right-update (UpdaterHNet.cpp:28-61).
- ``update_offset=False`` (last IEKF iteration, VioManager.cpp:261-263)
  applies the correction only to the 15 core states.

New vs the reference (which has no outlier rejection and whose shipped
estimate ends in NaNs — SURVEY.md §5.3): every measurement passes a
finiteness check and a chi-square (8 DoF) Mahalanobis innovation gate
inside the jitted update; rejected measurements leave the state exactly
as propagated. ``FilterParams.chi2_gate`` tunes the gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cuahn_vio.filter.state import FOCAL, FOCAL2, FilterParams, FilterState
from cuahn_vio.ops.homography import f32_precision
from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_normalize

# columns of the 27-state selected by the 8 measurement rows (UpdaterHNet.h:56-66)
MEAS_IDX = np.array([15, 16, 18, 19, 21, 22, 24, 25], np.int32)


def propagated_offset8(state: FilterState) -> jnp.ndarray:
    """The propagated 4-point offset prior, (8,), normalized camera units
    (VioManager.cpp:230-233). Multiply by 159.5 for pixels."""
    return state.off[:, :2].reshape(8)


@f32_precision
def innovation_stats(
    state: FilterState,
    params: FilterParams,
    net_mean8: jnp.ndarray,
    net_cov88: jnp.ndarray,
):
    """Innovation, innovation covariance and Mahalanobis distance of one
    measurement against the propagated state — the per-frame consistency
    statistic (an online NEES; the reference computes NEES only offline in
    ov_eval). Non-finite measurements are sanitized so downstream algebra
    stays NaN-free; the returned ``meas_finite`` flags them for rejection.

    Returns (inno (8,), s_mat (8, 8), chi2 (), meas_finite (),
    p_meas (8, 8) = H P Hᵀ — recorded separately so the covariance
    temperature k_net_cov can be refit OFFLINE from a logged run:
    chi2(k) = innoᵀ (p_meas + k Σ_net/159.5²)⁻¹ inno (eval/calibration.py).
    """
    dtype = state.p.dtype
    meas_finite = jnp.logical_and(
        jnp.all(jnp.isfinite(net_mean8)), jnp.all(jnp.isfinite(net_cov88))
    )
    net_mean8 = jnp.where(meas_finite, net_mean8, 0.0)
    net_cov88 = jnp.where(meas_finite, net_cov88, jnp.eye(8, dtype=net_cov88.dtype))

    p_meas = state.cov[MEAS_IDX][:, MEAS_IDX]  # H P Hᵀ (8, 8)
    s_mat = p_meas + params.k_net_cov * net_cov88.astype(dtype) / FOCAL2
    inno = net_mean8.astype(dtype) / FOCAL - propagated_offset8(state)
    chi2 = inno @ jnp.linalg.solve(s_mat, inno)
    return inno, s_mat, chi2, meas_finite, p_meas


@f32_precision
def hnet_update(
    state: FilterState,
    params: FilterParams,
    net_mean8: jnp.ndarray,
    net_cov88: jnp.ndarray,
    update_offset: bool,
    cov_update: bool = True,
) -> FilterState:
    """One EKF update (UpdaterHNet::update).

    Args:
        net_mean8: (8,) network 4-point flow, PIXELS.
        net_cov88: (8, 8) network covariance, pixels².
        update_offset: if False, only the 15 core states receive the
            correction (the offsets are about to be reset anyway).
        cov_update: if False, only the state MEAN is corrected and the
            covariance is left as propagated — the proper iterated-EKF
            intermediate step. The reference applies the full update every
            IEKF iteration (VioManager.cpp:227-273), which double-counts
            the evidence because the re-inferred measurement reuses the
            same conv tower and scene; shrinking P once, on the final
            iteration, keeps iterations as pure re-linearizations
            (measured: IEKF=2 hurt ATE with per-iteration shrink and helps
            with this form — benchmarks/RESULTS.md round 4).
    """
    dtype = state.p.dtype
    inno, s_mat, chi2, meas_finite, _ = innovation_stats(
        state, params, net_mean8, net_cov88
    )
    p_cols = state.cov[:, MEAS_IDX]  # P Hᵀ (27, 8)
    k_gain = jnp.linalg.solve(s_mat.T, p_cols.T).T  # (27, 8) = P Hᵀ S⁻¹
    accept = jnp.logical_and(meas_finite, chi2 < params.chi2_gate)

    if cov_update:
        # P <- (I - K H) P ; K H is K scattered into the measured columns
        kh = jnp.zeros((27, 27), dtype).at[:, MEAS_IDX].set(k_gain)
        new_cov = state.cov - kh @ state.cov
    else:
        new_cov = state.cov

    d = k_gain @ inno  # (27,)
    if not update_offset:
        d = d.at[15:].set(0.0)

    new_off = state.off + d[15:27].reshape(4, 3)
    updated = FilterState(
        p=state.p + d[0:3],
        q=quat_normalize(quat_mul(state.q, quat_exp(d[3:6]))),
        v=state.v + d[6:9],
        ba=state.ba + d[9:12],
        bg=state.bg + d[12:15],
        off=new_off,
        cov=new_cov,
    )
    # last-resort guard: even an accepted update must leave the state finite
    upd_finite = jnp.all(jnp.isfinite(updated.cov))
    for leaf in (updated.p, updated.q, updated.v, updated.ba, updated.bg):
        upd_finite = jnp.logical_and(upd_finite, jnp.all(jnp.isfinite(leaf)))
    accept = jnp.logical_and(accept, upd_finite)
    return jax.tree.map(
        lambda new, old: jnp.where(accept, new, old), updated, state
    )
