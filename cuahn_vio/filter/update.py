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

    With the measurement-bias block (FilterState docstring) the model is
    z/159.5 = offset + b + white, so the predicted measurement includes b
    and S gains the bias/cross terms: S = H P Hᵀ + H C + (H C)ᵀ + B + R.

    Returns (inno (8,), s_mat (8, 8), chi2 (), meas_finite (),
    p_meas (8, 8) — the measurement-PREDICTION covariance (S minus the
    white-noise part), recorded so the covariance temperature k_net_cov can
    be refit OFFLINE from a logged run:
    chi2(k) = innoᵀ (p_meas + k Σ_net/159.5²)⁻¹ inno (eval/calibration.py).
    """
    dtype = state.p.dtype
    meas_finite = jnp.logical_and(
        jnp.all(jnp.isfinite(net_mean8)), jnp.all(jnp.isfinite(net_cov88))
    )
    net_mean8 = jnp.where(meas_finite, net_mean8, 0.0)
    net_cov88 = jnp.where(meas_finite, net_cov88, jnp.eye(8, dtype=net_cov88.dtype))

    # effective measurement Jacobian is e*H under the prior-echo model
    # (FilterParams.echo_beta): y = e H dx + (b - b_hat) + n, e = 1 - beta
    e = 1.0 - params.echo_beta
    p_meas = e * e * state.cov[MEAS_IDX][:, MEAS_IDX]  # e²·H P Hᵀ (8, 8)
    pred = propagated_offset8(state)
    if state.bias is not None:
        hc = e * state.cov_xb[MEAS_IDX]  # e·H C (8, 8)
        p_meas = p_meas + hc + hc.T + state.cov_bb
        pred = pred + state.bias
    s_mat = p_meas + params.k_net_cov * net_cov88.astype(dtype) / FOCAL2
    inno = net_mean8.astype(dtype) / FOCAL - pred
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
    accept = jnp.logical_and(meas_finite, chi2 < params.chi2_gate)

    # Adaptive covariance-matching inflation (FilterParams.chi2_soft): when
    # the raw innovation is far outside its modeled covariance, assert that
    # THIS frame's white noise was larger — scale the network-covariance
    # part of S by chi2/chi2_soft. The gain and the covariance contraction
    # both use the inflated S, so the update stays self-consistent (it is
    # exact for the asserted per-frame R). Bounds the state kick a
    # heavy-tailed measurement can deliver without discarding it.
    r_net = params.k_net_cov * net_cov88.astype(dtype) / FOCAL2
    lam = jnp.maximum(1.0, chi2 / params.chi2_soft)
    s_mat = s_mat + (lam - 1.0) * r_net

    e = 1.0 - params.echo_beta  # effective-Jacobian scale (echo model)
    u_x = e * state.cov[:, MEAS_IDX]  # P (eH)ᵀ (27, 8)
    if state.bias is not None:
        u_x = u_x + state.cov_xb  # + C I (joint H = [eH, I8])
        u_b = e * state.cov_xb[MEAS_IDX].T + state.cov_bb  # e·CᵀHᵀ + B
    k_gain = jnp.linalg.solve(s_mat.T, u_x.T).T  # (27, 8) = Ux S⁻¹

    if cov_update:
        # Joint P <- P - U S⁻¹ Uᵀ, blockwise (exact for the partitioned
        # form; reduces to (I-KH)P when the bias block is absent).
        new_cov = state.cov - k_gain @ u_x.T
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
        bias=state.bias,
        cov_xb=state.cov_xb,
        cov_bb=state.cov_bb,
    )
    if state.bias is not None:
        # bias mean/cov always take the full joint update (the bias is the
        # persistent part of the measurement model; update_offset=False
        # only suppresses the about-to-be-reset offset states)
        k_b = jnp.linalg.solve(s_mat.T, u_b.T).T  # (8, 8) = Ub S⁻¹
        updated = updated._replace(bias=state.bias + k_b @ inno)
        if cov_update:
            updated = updated._replace(
                cov_xb=state.cov_xb - k_gain @ u_b.T,
                cov_bb=state.cov_bb - k_b @ u_b.T,
            )
    # last-resort guard: even an accepted update must leave the state finite
    upd_finite = jnp.all(jnp.isfinite(updated.cov))
    leaves = [updated.p, updated.q, updated.v, updated.ba, updated.bg]
    if updated.bias is not None:
        leaves += [updated.bias, updated.cov_xb, updated.cov_bb]
    for leaf in leaves:
        upd_finite = jnp.logical_and(upd_finite, jnp.all(jnp.isfinite(leaf)))
    accept = jnp.logical_and(accept, upd_finite)
    return jax.tree.map(
        lambda new, old: jnp.where(accept, new, old), updated, state
    )
