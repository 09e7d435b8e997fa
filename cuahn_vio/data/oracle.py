"""Oracle homography measurements from ground-truth poses.

Computes the exact 4-point optical flow between two camera frames of a
planar ground scene — the quantity the UAHN network estimates from images
(model_to_trace.py:299-330 output 1). Used to validate the full
propagate/update/reset cycle independently of the network, and to supervise
training.
"""

from __future__ import annotations

import jax.numpy as jnp

from cuahn_vio.filter.state import CORNER_XY1, FOCAL
from cuahn_vio.ops.quat import quat_to_rot


def camera_pose(p_w, q_i2w, c_rot_i, i_t_i2c):
    """(R_CtoW, cam_center_w) from IMU pose + extrinsics."""
    rot_i2w = quat_to_rot(q_i2w)
    return rot_i2w @ c_rot_i.T, p_w + rot_i2w @ i_t_i2c


def true_corner_flow(
    p_w1, q1, p_w2, q2, c_rot_i, i_t_i2c
) -> jnp.ndarray:
    """Exact corner flow (8,) in PIXELS from frame-1 corners to their
    ground-plane correspondences in frame 2.

    Corner k of img1 back-projects along bearing CORNER_XY1[k] to the z = 0
    plane; its reprojection into cam2 gives the corresponding pixel; flow =
    pixel2 - pixel1. This is what the 4-point-offset measurement means
    (State.h:110-113, UpdaterHNet.cpp:33).
    """
    r1, c1 = camera_pose(p_w1, q1, c_rot_i, i_t_i2c)
    r2, c2 = camera_pose(p_w2, q2, c_rot_i, i_t_i2c)

    bear_w = CORNER_XY1 @ r1.T  # (4, 3) corner rays in world
    lam = -c1[2] / bear_w[:, 2]  # intersect z=0
    ground = c1[None, :] + lam[:, None] * bear_w  # (4, 3)

    x_c2 = (ground - c2[None, :]) @ r2  # (4, 3) in cam2 frame
    xy2 = x_c2[:, :2] / x_c2[:, 2:3]  # normalized
    flow_norm = xy2 - CORNER_XY1[:, :2]  # (4, 2) normalized units
    return (flow_norm * FOCAL).reshape(8)
