"""Homography-aware synthetic data: planar ground scenes + exact IMU.

The reference's Simulator (cuahn/src/sim/Simulator.cpp) generates IMU +
point features but NOT homography measurements or images (SURVEY.md §4), and
the UZH-FPV rosbags (the real imagery) are not part of the snapshot. This
module goes further than the reference: it renders the actual 224x320
virtual-camera images of a textured ground plane under a closed-form
trajectory, so the ENTIRE pipeline (network included) can be exercised and
trained end-to-end with exact ground truth.

- ``AnalyticTrajectory``: closed-form p(t), q(t); body rates and specific
  force come from jax autodiff of the closed forms — exact IMU, no spline
  fitting (the reference needs BsplineSE3 because it starts from sampled
  poses; we own the trajectory).
- ``render_frame``: ray-casts every virtual-camera pixel (f = 159.5) onto
  the z = 0 ground plane and samples a smooth procedural texture
  (sum-of-sinusoids), fully vectorized on device.
- ``make_sequence``: IMU stream (with optional noise/biases, seeded like
  Simulator.h:155-165) + camera frames + GT arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_to_rot
from cuahn_vio.ops.warp import virtual_cam_k


@dataclass(frozen=True)
class AnalyticTrajectory:
    """Smooth figure-flight over the ground plane, all closed-form.

    p_w(t) = [ax(1-cos wx t), ay(1-cos wy t), h0 + az(1-cos wz t)] — starts
    from rest (v(0) = 0, matching the initializer's v0 = 0) with a strong
    acceleration onset that trips the jerk-detection gate.
    Attitude = small roll/pitch rocking + slow yaw drift.
    """

    ax: float = 1.2
    ay: float = 0.9
    az: float = 0.25
    wx: float = 0.9
    wy: float = 0.7
    wz: float = 1.1
    h0: float = 1.5
    roll_amp: float = 0.12
    pitch_amp: float = 0.10
    yaw_rate: float = 0.15
    w_rock: float = 1.7

    def pos_w(self, t):
        return jnp.stack(
            [
                self.ax * (1.0 - jnp.cos(self.wx * t)),
                self.ay * (1.0 - jnp.cos(self.wy * t)),
                self.h0 + self.az * (1.0 - jnp.cos(self.wz * t)),
            ]
        )

    def quat_i2w(self, t):
        rv = jnp.stack(
            [
                self.roll_amp * jnp.sin(self.w_rock * t),
                self.pitch_amp * jnp.sin(self.w_rock * 0.83 * t),
                self.yaw_rate * t,
            ]
        )
        return quat_exp(rv)

    def imu_true(self, t, gravity_mag: float = 9.81):
        """Exact body rates and specific force at time t via autodiff.

        w_body = 2 vec(q* ⊗ q̇)  (Hamilton, right-increment convention)
        f_body = R_ItoW(t)ᵀ (p̈_w − g_w),  g_w = [0, 0, −gravity_mag]
        """
        q = self.quat_i2w(t)
        qdot = jax.jacfwd(self.quat_i2w)(t)
        q_conj = q * jnp.array([1.0, -1.0, -1.0, -1.0])
        w_body = 2.0 * quat_mul(q_conj, qdot)[1:4]
        acc_w = jax.jacfwd(jax.jacfwd(self.pos_w))(t)
        g_w = jnp.array([0.0, 0.0, -gravity_mag])
        f_body = quat_to_rot(q).T @ (acc_w - g_w)
        return w_body, f_body

    def state_gt(self, t):
        """Ground-truth robocentric filter state pieces (p, q, v in IMU frame)."""
        q = self.quat_i2w(t)
        rot = quat_to_rot(q)
        p_w = self.pos_w(t)
        v_w = jax.jacfwd(self.pos_w)(t)
        return rot.T @ p_w, q, rot.T @ v_w


def ground_texture(xy: jnp.ndarray, key: jax.Array, n_waves: int = 24) -> jnp.ndarray:
    """Smooth procedural grayscale texture in [0, 1] at world (x, y) points.

    Sum of random sinusoids at mixed spatial frequencies — enough structure
    for photometric alignment at every cascade scale. ``key`` selects the
    texture (traced, so training can draw a fresh ground per sample).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    freqs = jax.random.uniform(k1, (n_waves, 2), minval=0.5, maxval=14.0)
    signs = jnp.sign(jax.random.normal(k3, (n_waves, 2)))
    freqs = freqs * signs
    phases = jax.random.uniform(k2, (n_waves,), minval=0.0, maxval=2 * jnp.pi)
    amps = 1.0 / jnp.sqrt(jnp.arange(1, n_waves + 1, dtype=jnp.float32))
    waves = jnp.sin(xy @ freqs.T + phases)  # (..., n_waves)
    val = waves @ (amps / amps.sum())
    return 0.5 + 0.5 * val


@partial(jax.jit, static_argnames=("height", "width"))
def render_frame(
    p_w: jnp.ndarray,
    q_i2w: jnp.ndarray,
    c_rot_i: jnp.ndarray,
    i_t_i2c: jnp.ndarray,
    texture_key: jax.Array | None = None,
    height: int = 224,
    width: int = 320,
    texture: jnp.ndarray | None = None,
    tex_params: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Render the virtual camera's view of the textured ground plane.

    Args:
        p_w: (3,) IMU position in world frame.
        q_i2w: (4,) Hamilton wxyz IMU->world.
        c_rot_i / i_t_i2c: camera extrinsics (FilterParams convention).
        texture / tex_params: optional (T, T) image texture + similarity
            transform (data/textures.py); falls back to the procedural
            sum-of-sinusoids ground when absent.
    Returns:
        (H, W) float32 image in [0, 1]; pixels whose rays miss the plane
        (pointing up) render 0.
    """
    k, k_inv = virtual_cam_k(height, width)
    rot_i2w = quat_to_rot(q_i2w)
    rot_c2w = rot_i2w @ c_rot_i.T
    cam_center = p_w + rot_i2w @ i_t_i2c

    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    pix = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)  # (H, W, 3)
    d_cam = pix @ k_inv.T
    d_w = d_cam @ rot_c2w.T  # (H, W, 3)
    lam = -cam_center[2] / d_w[..., 2]
    valid = lam > 0
    ground = cam_center[None, None, :2] + lam[..., None] * d_w[..., :2]
    if texture is not None:
        from cuahn_vio.data.textures import default_tex_params, sample_plane

        if tex_params is None:
            tex_params = default_tex_params()
        tex = sample_plane(texture, ground, tex_params)
    else:
        if texture_key is None:
            texture_key = jax.random.PRNGKey(0)
        tex = ground_texture(ground, texture_key)
    return jnp.where(valid, tex, 0.0).astype(jnp.float32)


def render_frame_blurred(
    p_taps: jnp.ndarray,
    q_taps: jnp.ndarray,
    c_rot_i: jnp.ndarray,
    i_t_i2c: jnp.ndarray,
    texture_key: jax.Array | None = None,
    height: int = 224,
    width: int = 320,
    texture: jnp.ndarray | None = None,
    tex_params: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Motion-blurred frame: mean of renders at the exposure-window poses.

    ``p_taps``/``q_taps`` are (K, 3)/(K, 4) poses sampled across the
    exposure interval — physically exact blur (each tap is a sharp render
    of the same rigid scene), unlike a screen-space directional filter.
    """
    imgs = jax.vmap(
        lambda p, q: render_frame(
            p, q, c_rot_i, i_t_i2c, texture_key, height, width,
            texture, tex_params,
        )
    )(p_taps, q_taps)
    return jnp.mean(imgs, axis=0)


class SyntheticSequence(NamedTuple):
    imu_t: np.ndarray  # (N,)
    imu_w: np.ndarray  # (N, 3) gyro measurements (noise + bias included)
    imu_a: np.ndarray  # (N, 3) accel measurements
    cam_t: np.ndarray  # (F,)
    frames: np.ndarray  # (F, H, W) uint8
    gt_times: np.ndarray  # (N,)
    gt_pose_w: np.ndarray  # (N, 7) [x y z qx qy qz qw] world frame
    gt_vel_w: np.ndarray  # (N, 3) world-frame velocity
    true_bg: np.ndarray
    true_ba: np.ndarray


def make_sequence(
    traj: AnalyticTrajectory,
    t_imu_to_cam: np.ndarray,
    duration: float = 20.0,
    imu_hz: float = 500.0,
    cam_hz: float = 30.0,
    t_still: float = 2.5,
    seed: int = 0,
    sigma_w: float = 0.0,
    sigma_a: float = 0.0,
    bias_g: float = 0.0,
    bias_a: float = 0.0,
    texture_seed: int = 0,
    gravity_mag: float = 9.81,
    texture: np.ndarray | None = None,
    tex_params: np.ndarray | None = None,
    exposure_s: float = 0.0,
    effects: "object | None" = None,
    effects_seed: int = 0,
) -> SyntheticSequence:
    """Full synthetic flight: t_still seconds stationary (so the reference's
    jerk initializer fires), then the analytic trajectory.

    During the still phase the drone hovers at traj(t=0) pose: the IMU reads
    exactly (0, -R^T g); motion starts at t_still.

    Imagery realism knobs (all off by default, round-1 compatible):
        texture/tex_params: photo ground texture (data/textures.py) instead
            of the procedural sinusoid field.
        exposure_s: camera exposure time; > 0 renders 3 pose taps across
            the exposure window and averages (physical motion blur).
        effects: sensor_effects.EffectsConfig — vignette/exposure/noise
            chain with per-sequence lens params and per-frame noise.
    """
    rng = np.random.default_rng(seed)
    t_imu_to_cam = np.asarray(t_imu_to_cam, np.float64)
    c_rot_i = jnp.array(t_imu_to_cam[:3, :3], jnp.float32)
    i_t_i2c = jnp.array(
        -t_imu_to_cam[:3, :3].T @ t_imu_to_cam[:3, 3], jnp.float32
    )

    imu_t = np.arange(0.0, t_still + duration, 1.0 / imu_hz)
    shifted = np.maximum(imu_t - t_still, 0.0)

    imu_fn = jax.jit(jax.vmap(lambda t: traj.imu_true(t, gravity_mag)))
    w_true, a_true = imu_fn(jnp.array(shifted, jnp.float32))
    w_true = np.asarray(w_true, np.float64)
    a_true = np.asarray(a_true, np.float64)
    # still phase: freeze at t=0 values (hover; trajectory derivative at the
    # clamp point is not exactly zero, so overwrite explicitly)
    q0 = np.asarray(traj.quat_i2w(0.0))
    r0 = np.asarray(quat_to_rot(jnp.array(q0)))
    still = imu_t < t_still
    w_true[still] = 0.0
    a_true[still] = r0.T @ np.array([0.0, 0.0, gravity_mag])

    bg = rng.normal(size=3) * bias_g
    ba = rng.normal(size=3) * bias_a
    imu_w = w_true + bg + rng.normal(size=w_true.shape) * sigma_w
    imu_a = a_true + ba + rng.normal(size=a_true.shape) * sigma_a
    # the trajectory's own acceleration onset is the "jerk": run the
    # initializer with init_imu_thresh ~0.2 on synthetic data.

    cam_t = np.arange(t_still + 0.2, t_still + duration, 1.0 / cam_hz)
    pose_fn = jax.jit(
        jax.vmap(lambda t: (traj.pos_w(t), traj.quat_i2w(t)))
    )

    tex_key = jax.random.PRNGKey(texture_seed)
    tex_dev = None if texture is None else jnp.asarray(texture, jnp.float32)
    tp_dev = None if tex_params is None else jnp.asarray(tex_params, jnp.float32)

    n_taps = 3 if exposure_s > 0.0 else 1
    # exposure window ends at the stamped frame time; clamp taps into the
    # moving phase so the still frames stay still
    tap_off = np.linspace(-exposure_s, 0.0, n_taps)
    tap_t = np.maximum((cam_t - t_still)[:, None] + tap_off[None, :], 0.0)
    p_taps, q_taps = pose_fn(jnp.array(tap_t.reshape(-1), jnp.float32))
    p_taps = p_taps.reshape(len(cam_t), n_taps, 3)
    q_taps = q_taps.reshape(len(cam_t), n_taps, 4)

    render = jax.jit(
        lambda ps, qs: render_frame_blurred(
            ps, qs, c_rot_i, i_t_i2c, tex_key,
            texture=tex_dev, tex_params=tp_dev,
        )
    )

    if effects is not None:
        from cuahn_vio.data.sensor_effects import apply_photometric, draw_params

        ek = jax.random.PRNGKey(effects_seed)
        k_par, k_sig, k_frames = jax.random.split(ek, 3)
        eff_params = draw_params(k_par, effects)
        defocus = jax.random.uniform(k_sig, maxval=effects.defocus_sigma_max)
        # slow auto-exposure drift: smooth random walk on the gain
        drift = np.clip(
            np.cumsum(
                np.random.default_rng(effects_seed).normal(
                    0.0, effects.gain_drift / 5.0, len(cam_t)
                )
            ),
            -0.25, 0.25,
        ).astype(np.float32)
        frame_keys = jax.random.split(k_frames, len(cam_t))
        apply_fx = jax.jit(
            lambda img, k, d: apply_photometric(
                img, k, eff_params.at[1].multiply(1.0 + d), defocus
            )
        )
    else:
        apply_fx = None

    frames = np.zeros((len(cam_t), 224, 320), np.uint8)
    for i in range(len(cam_t)):
        img = render(p_taps[i], q_taps[i])
        if apply_fx is not None:
            img = apply_fx(img, frame_keys[i], drift[i])
        frames[i] = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)

    # GT at IMU rate, world frame, file convention [x y z qx qy qz qw]
    gt_fn = jax.jit(
        jax.vmap(
            lambda t: (traj.pos_w(t), traj.quat_i2w(t), jax.jacfwd(traj.pos_w)(t))
        )
    )
    p_all, q_all, v_all = gt_fn(jnp.array(shifted, jnp.float32))
    p_all = np.asarray(p_all)
    q_all = np.asarray(q_all)  # wxyz
    v_all = np.asarray(v_all, np.float64)
    v_all[still] = 0.0
    gt_pose = np.concatenate([p_all, q_all[:, [1, 2, 3, 0]]], axis=1)

    return SyntheticSequence(
        imu_t=imu_t,
        imu_w=imu_w,
        imu_a=imu_a,
        cam_t=cam_t,
        frames=frames,
        gt_times=imu_t,
        gt_pose_w=gt_pose,
        gt_vel_w=v_all,
        true_bg=bg,
        true_ba=ba,
    )
