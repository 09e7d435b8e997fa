"""Network-based loop closure: UAHN relative-position factors between
distant keyframes.

No reference counterpart (the reference is a pure filter and drifts
unboundedly); this is the CUAHN-native extension the planar scene invites:
ANY two keyframes whose ground footprints overlap can be constrained by one
more homography-network inference — the same measurement model the filter
uses frame-to-frame (SURVEY.md §2.7 "pose-graph factors").

Geometry (known-attitude planar PnP):
1. candidate pairs: temporally distant, spatially near (estimated poses);
2. the prior-mode UAHN runs on the (frame_i, frame_j) pair with the prior
   4-point offset computed from the current pose estimates — exactly the
   EKF-prior pathway of VioManager.cpp:230-236, but across a long baseline;
3. the 4 corner rays of frame i intersect the z=0 ground plane at points
   G_k (estimated cam-i pose + height — the filter's planar-scene state);
4. the measured corners+flow in frame j give bearings u_k; with attitude
   R_j taken from the estimate (gravity-observable, drift-bounded), each
   cross-product constraint u_k x R_j^T (G_k - c_j) = 0 is LINEAR in the
   unknown camera-j position c_j -> 8-equation least squares;
5. the factor is the relative position (frame-i IMU coordinates) fed to
   the pose-graph smoother with the measured attitude from the estimates.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cuahn_vio.data.oracle import camera_pose, true_corner_flow
from cuahn_vio.filter.state import CORNER_XY1, FOCAL
from cuahn_vio.ops.quat import quat_to_rot, skew
from cuahn_vio.parallel.pose_graph import relative_pose


class LoopFactors(NamedTuple):
    pairs: np.ndarray  # (L, 2) keyframe indices (i, j)
    dp_meas: np.ndarray  # (L, 3) measured p_j - p_i in IMU frame i
    dq_meas: np.ndarray  # (L, 4) relative attitude from the estimates
    sigma_p: np.ndarray  # (L,) per-factor position sigma (m) from the
    # network covariance: height * mean corner sigma / focal


def find_loop_candidates(
    times: np.ndarray,
    p_world: np.ndarray,
    min_dt: float = 3.0,
    max_dist: float = 1.0,
    stride: int = 5,
    max_pairs: int = 32,
) -> np.ndarray:
    """Temporally-distant, spatially-near keyframe pairs (L, 2).

    One partner per i (the NEAREST j, not the first within threshold):
    the factor quality is set by the revisit baseline — predicted corner
    flow ~ baseline/height * focal, so at 1.7 m height the network's
    ~50 px prior regime means baselines under ~0.5 m. Picking the first
    j inside a 1 m radius locked onto 0.9 m pairs when 0.1 m pairs
    existed a few frames later (measured round 4)."""
    pairs = []
    n = len(times)
    for i in range(0, n, stride):
        js = np.arange(i + 1, n, stride)
        js = js[times[js] - times[i] >= min_dt]
        if js.size == 0:
            continue
        d = np.linalg.norm(p_world[js] - p_world[i], axis=1)
        k = int(np.argmin(d))
        if d[k] < max_dist:
            pairs.append((i, int(js[k])))
        if len(pairs) >= max_pairs:
            break
    return np.asarray(pairs, np.int64).reshape(-1, 2)


def flow_between(p_wi, q_i, p_wj, q_j, c_rot_i, i_t_i2c):
    """Predicted 4-point offset (4, 2) in PIXELS from est poses — the
    long-baseline prior: exactly the oracle measurement geometry."""
    return true_corner_flow(p_wi, q_i, p_wj, q_j, c_rot_i, i_t_i2c).reshape(4, 2)


def position_from_flow(
    flow_px: jnp.ndarray,  # (4, 2) measured corner flow i -> j, pixels
    p_wi: jnp.ndarray,  # (3,) est world IMU position of keyframe i
    q_i: jnp.ndarray,  # (4,) wxyz est attitude i
    q_j: jnp.ndarray,  # (4,) wxyz est attitude j
    c_rot_i: jnp.ndarray,
    i_t_i2c: jnp.ndarray,
) -> jnp.ndarray:
    """World IMU position of keyframe j from the measured flow (known-
    attitude planar PnP, steps 3-4 of the module docstring)."""
    r1, c1 = camera_pose(p_wi, q_i, c_rot_i, i_t_i2c)
    bear_w = CORNER_XY1 @ r1.T
    lam = -c1[2] / bear_w[:, 2]
    ground = c1[None, :] + lam[:, None] * bear_w  # (4, 3) world pts

    # measured bearings in cam j
    xy_j = CORNER_XY1[:, :2] + flow_px / FOCAL
    u = jnp.concatenate([xy_j, jnp.ones((4, 1), xy_j.dtype)], axis=1)  # (4,3)

    rot_i2w_j = quat_to_rot(q_j)
    r2 = rot_i2w_j @ c_rot_i.T  # cam j -> world

    # u_k x R2^T (G_k - c2) = 0  ->  [u_k]x R2^T c2 = [u_k]x R2^T G_k
    a_rows = jax.vmap(lambda uk: skew(uk) @ r2.T)(u)  # (4, 3, 3)
    b_rows = jax.vmap(lambda uk, gk: skew(uk) @ (r2.T @ gk))(u, ground)
    a = a_rows.reshape(12, 3)
    b = b_rows.reshape(12)
    c2 = jnp.linalg.lstsq(a, b)[0]  # world cam-j position
    return c2 - rot_i2w_j @ i_t_i2c  # back to IMU position


def generate_loop_factors(
    frames: np.ndarray,  # (F, H, W) uint8 undistorted frames
    times: np.ndarray,  # (F,)
    p_world: np.ndarray,  # (F, 3) est IMU world positions
    q_wxyz: np.ndarray,  # (F, 4) est attitudes
    c_rot_i,
    i_t_i2c,
    model: Any,
    params: Any,
    pairs: Optional[np.ndarray] = None,
    seed: int = 0,
    max_sigma_px: float = 4.0,
    max_prior_px: float = 50.0,
) -> LoopFactors:
    """Run the prior-mode UAHN across each candidate pair and solve the
    planar PnP for a relative-position factor.

    Long-baseline pairs are far outside the network's frame-to-frame
    training regime (large viewpoint change, prior off by the accumulated
    drift), so most candidates yield garbage — measured on the round-3
    textured replay, ungated factors had MEDIAN 0.8 m error on ~1.2 m
    baselines and smoothing with them hurt ATE. Factors are therefore
    (a) gated on the network's own confidence (mean corner sigma <=
    ``max_sigma_px``) and (b) returned with a per-factor position sigma
    (height * corner sigma / focal) so the smoother weights survivors by
    their actual information content."""
    if pairs is None:
        pairs = find_loop_candidates(times, p_world)
    c_rot_i = jnp.asarray(c_rot_i, jnp.float32)
    i_t_i2c = jnp.asarray(i_t_i2c, jnp.float32)

    @jax.jit
    def infer(img1, img2, prior, key):
        return model.apply(
            {"params": params}, img1, img2, prior,
            use_prior=True, rngs={"dropout": key},
        )

    kept, dps, dqs, sigmas = [], [], [], []
    key = jax.random.PRNGKey(seed)
    for n, (i, j) in enumerate(pairs):
        p_i, q_i = jnp.asarray(p_world[i]), jnp.asarray(q_wxyz[i])
        p_j, q_j = jnp.asarray(p_world[j]), jnp.asarray(q_wxyz[j])
        prior = flow_between(p_i, q_i, p_j, q_j, c_rot_i, i_t_i2c)
        # geometric viewpoint gate BEFORE inference: candidate pairs whose
        # predicted corner flow exceeds the network's training flow regime
        # (trainer masks labels beyond ~80 px) can only produce garbage —
        # measured sigma 45-340 px on such pairs. Spatial 3D distance alone
        # is a poor proxy at a 45-degree camera; the prior flow is exact.
        if not np.isfinite(np.asarray(prior)).all() or float(
            jnp.abs(prior).max()
        ) > max_prior_px:
            continue
        img1 = jnp.asarray(frames[i], jnp.float32) / 255.0
        img2 = jnp.asarray(frames[j], jnp.float32) / 255.0
        flow8, cov = infer(img1, img2, prior, jax.random.fold_in(key, n))
        sigma_px = float(np.sqrt(max(np.trace(np.asarray(cov)) / 8.0, 0.0)))
        if not np.isfinite(sigma_px) or sigma_px > max_sigma_px:
            continue
        p_j_meas = position_from_flow(
            flow8.reshape(4, 2), p_i, q_i, q_j, c_rot_i, i_t_i2c
        )
        # position sigma: bearing noise scaled by scene depth (~height)
        _, c1 = camera_pose(p_i, q_i, c_rot_i, i_t_i2c)
        sigma_m = float(abs(c1[2])) * sigma_px / FOCAL
        # factor in the pose-graph convention
        dp, dq = relative_pose(p_i, q_i, p_j_meas, q_j)
        kept.append((int(i), int(j)))
        dps.append(np.asarray(dp))
        dqs.append(np.asarray(dq))
        sigmas.append(max(sigma_m, 1e-3))
    return LoopFactors(
        pairs=np.asarray(kept, np.int64).reshape(-1, 2),
        dp_meas=np.asarray(dps, np.float32).reshape(-1, 3),
        dq_meas=np.asarray(dqs, np.float32).reshape(-1, 4),
        sigma_p=np.asarray(sigmas, np.float32).reshape(-1),
    )
