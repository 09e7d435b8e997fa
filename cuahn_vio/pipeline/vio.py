"""The per-frame VIO step and sequence runners.

Rebuilds VioManager::do_feature_propagate_update (cuahn_ros/cuahn/src/core/
VioManager.cpp:200-315) as one jitted pure function:

    vio_step: (FilterState, frame inputs) -> (FilterState, outputs)

    1. propagate over the frame's (padded) IMU window
    2. IEKF loop, statically unrolled to max_iekf_iterations
       (VioManager.cpp:227-273): read the propagated 4-point-offset prior
       from the state, x159.5 -> pixels, network inference (prior mode),
       EKF update (offsets not updated on the last iteration,
       VioManager.cpp:261-263), gated until frame_idx > 10
       (VioManager.cpp:257)
    3. reset the 4-point offsets + covariance (State.cpp:101-111)

and a whole sequence as ``lax.scan(vio_step, init, frames)`` — the filter is
a recurrence, so latency is serial, but throughput scales by vmapping the
scan over a batch of sequences (see cuahn_vio.parallel).

Outputs per frame: robocentric->world pose (RosVisualizer.cpp:171:
p_world = R(q) @ p), plus the pose covariance blocks needed for NEES.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from cuahn_vio.filter.state import FOCAL, FilterParams, FilterState, reset_4pt_offset
from cuahn_vio.filter.propagate import propagate_window
from cuahn_vio.filter.update import (
    hnet_update,
    innovation_stats,
    propagated_offset8,
)
from cuahn_vio.ops.quat import quat_to_rot


@dataclass(frozen=True)
class VioConfig:
    """Static pipeline configuration (mirrors VioManagerOptions defaults
    used by cuahn/launch/uzhfpv.launch)."""

    max_iekf_iterations: int = 1  # uzhfpv.launch:67
    use_prior: bool = True  # uzhfpv.launch:58
    update_gate_frames: int = 10  # VioManager.cpp:257
    blocks_to_run: int = 3


class FrameOutput(NamedTuple):
    p_world: jnp.ndarray  # (3,) IMU position in world frame
    q: jnp.ndarray  # (4,) wxyz IMU->world
    v_body: jnp.ndarray  # (3,) velocity, IMU frame
    cov_core: jnp.ndarray  # (15, 15) core error-state covariance block
    # [p th v ba bg] — full block (not just the diagonal) so offline
    # consistency checks can propagate through frame changes exactly
    # (eval/simulation.py observable-subspace NEES)
    net_mean: jnp.ndarray  # (8,) last network flow (px), for diagnostics
    net_cov_tr: jnp.ndarray  # () trace of net covariance (px^2)
    ba: jnp.ndarray  # (3,) accel bias estimate
    bg: jnp.ndarray  # (3,) gyro bias estimate
    net_chi2: jnp.ndarray  # () innovation Mahalanobis distance (8 DoF);
    # >= FilterParams.chi2_gate means the measurement was rejected
    # --- covariance-calibration log (eval/calibration.py): refit k_net_cov
    # offline as chi2(k) = innoT (cov_meas + k net_cov88/159.5^2)^-1 inno
    net_inno: jnp.ndarray  # (8,) innovation, normalized camera units
    cov_meas: jnp.ndarray  # (8, 8) H P H^T of the propagated state
    net_cov88: jnp.ndarray  # (8, 8) raw network covariance, px^2


class VioCarry(NamedTuple):
    state: FilterState
    frame_idx: jnp.ndarray  # () int32, counts processed images (gate)


def make_vio_step(model: Any, net_params: Any, fparams: FilterParams, cfg: VioConfig):
    """Build the jittable per-frame step closure.

    Args:
        model: UAHN flax module (or None to run filter-only, dead-reckoning).
        net_params: the model's parameter pytree.
        fparams: FilterParams.
        cfg: VioConfig.
    """

    def vio_step(carry: VioCarry, xs):
        img_prev_u8, img_curr_u8, w_win, a_win, dt_win, key = xs
        state = carry.state

        # 1. propagation (Propagator.cpp:60-71)
        state = propagate_window(state, fparams, w_win, a_win, dt_win)

        net_mean = jnp.zeros(8, state.p.dtype)
        net_cov_tr = jnp.zeros((), state.p.dtype)
        net_chi2 = jnp.zeros((), state.p.dtype)
        net_inno = jnp.zeros(8, state.p.dtype)
        cov_meas = jnp.zeros((8, 8), state.p.dtype)
        net_cov88 = jnp.zeros((8, 8), state.p.dtype)
        if model is not None:
            img1 = img_prev_u8.astype(jnp.float32) / 255.0
            img2 = img_curr_u8.astype(jnp.float32) / 255.0

            # 2. IEKF loop, static trip count (VioManager.cpp:227-273).
            # Iterated form: the measurement h is LINEAR (H selects the
            # offset states), so iteration cannot improve the update
            # itself — the only nonlinearity is the MEASUREMENT z(prior)
            # the network produces. Intermediate iterations therefore
            # refine only the EPHEMERAL prior fed to the next inference
            # (a mean-only update that is never committed); the single
            # real EKF update applies the last, best-converged measurement
            # against the PROPAGATED state. (The reference re-updates
            # state+cov every iteration, which double-counts correlated
            # evidence — measured worse here, benchmarks/RESULTS.md r4.)
            prior8 = propagated_offset8(state)
            for it in range(cfg.max_iekf_iterations):
                prior_px = (prior8 * FOCAL).reshape(4, 2)
                flow8, cov88 = model.apply(
                    {"params": net_params},
                    img1,
                    img2,
                    prior_px if cfg.use_prior else None,
                    use_prior=cfg.use_prior,
                    rngs={"dropout": jax.random.fold_in(key, it)},
                )
                last = it == cfg.max_iekf_iterations - 1
                gate = carry.frame_idx > cfg.update_gate_frames
                net_inno, _, net_chi2, _, cov_meas = innovation_stats(
                    state, fparams, flow8, cov88
                )
                if last:
                    state = jax.lax.cond(
                        gate,
                        lambda s: hnet_update(
                            s, fparams, flow8, cov88, update_offset=False
                        ),
                        lambda s: s,
                        state,
                    )
                else:
                    refined = hnet_update(
                        state, fparams, flow8, cov88,
                        update_offset=True, cov_update=False,
                    )
                    # the ephemeral refinement honors the same startup gate
                    # as the real update: gated frames keep the propagated
                    # prior (ADVICE r4)
                    prior8 = jnp.where(
                        gate, propagated_offset8(refined), prior8
                    )
                net_mean, net_cov_tr = flow8, jnp.trace(cov88)
                net_cov88 = cov88.astype(state.p.dtype)

        # output world-frame pose (RosVisualizer.cpp:171)
        rot = quat_to_rot(state.q)
        out = FrameOutput(
            p_world=rot @ state.p,
            q=state.q,
            v_body=state.v,
            cov_core=state.cov[:15, :15],
            net_mean=net_mean,
            net_cov_tr=net_cov_tr,
            ba=state.ba,
            bg=state.bg,
            net_chi2=net_chi2,
            net_inno=net_inno,
            cov_meas=cov_meas,
            net_cov88=net_cov88,
        )

        # 3. reset (VioManager.cpp:275)
        state = reset_4pt_offset(state)
        return VioCarry(state=state, frame_idx=carry.frame_idx + 1), out

    return vio_step


def make_vio_stages(model: Any, net_params: Any, fparams: FilterParams, cfg: VioConfig):
    """The vio_step pipeline split into separately-jittable stages, so the
    stepwise runner can time each reference CSV column for real
    (VioManager.cpp:98: load / propagation / inference / update / total)
    instead of attributing the fused device time to one column.

    Returns (prop_fn, net_fn, upd_fn, finish_fn); composing them in order
    reproduces ``make_vio_step`` exactly (same op sequence — only XLA
    fusion boundaries differ).
    """

    def prop_fn(state: FilterState, w_win, a_win, dt_win) -> FilterState:
        return propagate_window(state, fparams, w_win, a_win, dt_win)

    def net_fn(prior8, img_prev_u8, img_curr_u8, key, it):
        img1 = img_prev_u8.astype(jnp.float32) / 255.0
        img2 = img_curr_u8.astype(jnp.float32) / 255.0
        prior_px = (prior8 * FOCAL).reshape(4, 2)
        flow8, cov88 = model.apply(
            {"params": net_params},
            img1,
            img2,
            prior_px if cfg.use_prior else None,
            use_prior=cfg.use_prior,
            rngs={"dropout": jax.random.fold_in(key, it)},
        )
        return flow8, cov88

    def refine_prior_fn(state: FilterState, flow8, cov88):
        """Ephemeral mean-only refinement of the offset prior for the next
        IEKF inference (see make_vio_step's iterated form)."""
        refined = hnet_update(
            state, fparams, flow8, cov88, update_offset=True, cov_update=False
        )
        return propagated_offset8(refined)

    def upd_fn(
        state: FilterState, frame_idx, flow8, cov88,
        update_offset: bool, cov_update: bool = True,
    ):
        inno, _, chi2, _, p_meas = innovation_stats(state, fparams, flow8, cov88)
        gate = frame_idx > cfg.update_gate_frames
        state = jax.lax.cond(
            gate,
            lambda s: hnet_update(
                s, fparams, flow8, cov88, update_offset, cov_update
            ),
            lambda s: s,
            state,
        )
        return state, (chi2, inno, p_meas)

    def finish_fn(state: FilterState, net_mean, net_cov88, calib):
        net_chi2, net_inno, cov_meas = calib
        rot = quat_to_rot(state.q)
        out = FrameOutput(
            p_world=rot @ state.p,
            q=state.q,
            v_body=state.v,
            cov_core=state.cov[:15, :15],
            net_mean=net_mean,
            net_cov_tr=jnp.trace(net_cov88),
            ba=state.ba,
            bg=state.bg,
            net_chi2=net_chi2,
            net_inno=net_inno,
            cov_meas=cov_meas,
            net_cov88=net_cov88.astype(state.p.dtype),
        )
        return reset_4pt_offset(state), out

    return prop_fn, net_fn, upd_fn, finish_fn, refine_prior_fn


def run_sequence(
    init_state: FilterState,
    model: Any,
    net_params: Any,
    fparams: FilterParams,
    cfg: VioConfig,
    imgs_u8: jnp.ndarray,  # (F+1, H, W) uint8 frames (undistorted 224x320)
    w_win: jnp.ndarray,  # (F, T, 3)
    a_win: jnp.ndarray,  # (F, T, 3)
    dt_win: jnp.ndarray,  # (F, T)
    key: jax.Array,
):
    """Run a full sequence under one jit: scan of vio_step over frame pairs.

    The first camera frame only primes the image pair (HomographyNet.cpp:
    137-141); inference starts at the second frame, matching the reference.
    """
    frames = w_win.shape[0]
    keys = jax.random.split(key, frames)
    step = make_vio_step(model, net_params, fparams, cfg)
    xs = (imgs_u8[:-1], imgs_u8[1:], w_win, a_win, dt_win, keys)
    carry0 = VioCarry(state=init_state, frame_idx=jnp.zeros((), jnp.int32))
    carry, outs = jax.lax.scan(step, carry0, xs)
    return carry.state, outs


run_sequence_jit = partial(jax.jit, static_argnames=("model", "cfg"))(run_sequence)


def run_sequence_with_measurements(
    init_state: FilterState,
    fparams: FilterParams,
    cfg: VioConfig,
    z_mean8: jnp.ndarray,  # (F, 8) measurement flows, pixels
    z_cov88: jnp.ndarray,  # (F, 8, 8) measurement covariances, px^2
    z_valid: jnp.ndarray,  # (F,) bool: apply the update this frame
    w_win: jnp.ndarray,
    a_win: jnp.ndarray,
    dt_win: jnp.ndarray,
):
    """Filter-only sequence with externally supplied measurements.

    Used by the oracle end-to-end tests (ground-truth homography flows in
    place of the network) and by offline smoothing experiments. Same
    propagate -> update -> reset cycle as vio_step.
    """

    def step(carry: VioCarry, xs):
        z, r, valid, w, a, dts = xs
        state = propagate_window(carry.state, fparams, w, a, dts)
        inno, _, chi2, _, p_meas = innovation_stats(state, fparams, z, r)
        gate = jnp.logical_and(valid, carry.frame_idx > cfg.update_gate_frames)
        state = jax.lax.cond(
            gate,
            lambda s: hnet_update(s, fparams, z, r, update_offset=False),
            lambda s: s,
            state,
        )
        rot = quat_to_rot(state.q)
        out = FrameOutput(
            p_world=rot @ state.p,
            q=state.q,
            v_body=state.v,
            cov_core=state.cov[:15, :15],
            net_mean=z,
            net_cov_tr=jnp.trace(r),
            ba=state.ba,
            bg=state.bg,
            net_chi2=chi2,
            net_inno=inno,
            cov_meas=p_meas,
            net_cov88=r.astype(state.p.dtype),
        )
        state = reset_4pt_offset(state)
        return VioCarry(state=state, frame_idx=carry.frame_idx + 1), out

    carry0 = VioCarry(state=init_state, frame_idx=jnp.zeros((), jnp.int32))
    carry, outs = jax.lax.scan(
        step, carry0, (z_mean8, z_cov88, z_valid, w_win, a_win, dt_win)
    )
    return carry.state, outs
