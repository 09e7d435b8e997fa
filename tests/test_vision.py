"""Vision front-end tests: detector, pyramidal KLT, triangulation,
preintegration — all against exact synthetic ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuahn_vio.data.synthetic import render_frame
from cuahn_vio.ops.quat import quat_exp, quat_mul, quat_to_rot
from cuahn_vio.vision import (
    grid_detect,
    preintegrate,
    track_pyramidal,
    triangulate_nview,
)
from cuahn_vio.vision.preint import predict_from_factor
from cuahn_vio.vision.detect import shi_tomasi_score


# camera optical axis straight DOWN: cam x = world x, cam y = -world y,
# cam z = -world z (det +1). Identity extrinsics would look UP, off-plane.
DOWN_EXTR = (jnp.diag(jnp.array([1.0, -1.0, -1.0])), jnp.zeros(3))


def _down_cam_frames(dp, key=0):
    """Two frames of the textured ground plane from a straight-down camera
    displaced by dp (world frame) between frames."""
    c_rot_i, i_t_i2c = DOWN_EXTR
    p1 = jnp.array([0.0, 0.0, 1.5])
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    img1 = render_frame(p1, q, c_rot_i, i_t_i2c, jax.random.PRNGKey(key))
    img2 = render_frame(p1 + jnp.array(dp), q, c_rot_i, i_t_i2c,
                        jax.random.PRNGKey(key))
    return img1, img2


def test_shi_tomasi_peaks_on_corner():
    img = jnp.zeros((64, 64), jnp.float32).at[32:, 32:].set(1.0)
    score = shi_tomasi_score(img)
    v, u = np.unravel_index(int(jnp.argmax(score)), score.shape)
    assert abs(v - 32) <= 3 and abs(u - 32) <= 3
    # flat and pure-edge regions score ~0
    assert float(score[10, 10]) < 1e-6
    assert float(score[10, 40]) < float(score[v, u]) * 0.2


def test_grid_detect_shapes_and_spread():
    img1, _ = _down_cam_frames([0.0, 0.0, 0.0])
    pts, valid, score = grid_detect(img1, grid_y=8, grid_x=10)
    assert pts.shape == (80, 2) and valid.shape == (80,)
    assert int(valid.sum()) > 40  # textured scene: most cells have corners
    # each valid point is inside its own cell
    cell = (pts[:, 1] // 28).astype(int) * 10 + (pts[:, 0] // 32).astype(int)
    assert np.array_equal(np.asarray(cell[valid]), np.flatnonzero(np.asarray(valid)))


@pytest.mark.parametrize("dp", [[0.02, -0.015, 0.0], [0.06, 0.04, 0.0]])
def test_klt_recovers_known_flow(dp):
    """Pure lateral camera translation over the plane at fixed height gives
    a uniform ground flow of -f * dp_cam_xy / h — compare tracks against it."""
    img1, img2 = _down_cam_frames(dp)
    pts, valid, _ = grid_detect(img1, grid_y=8, grid_x=10, border=24)
    pts2, ok = track_pyramidal(img1, img2, pts)
    ok = np.asarray(ok & valid)
    assert ok.sum() > 30
    flow = np.asarray(pts2 - pts)[ok]
    f, h = 159.5, 1.5
    # DOWN_EXTR maps world (dx, dy) to camera (dx, -dy)
    expect = np.array([-f * dp[0] / h, f * dp[1] / h])
    err = np.linalg.norm(flow - expect, axis=1)
    assert np.median(err) < 0.35, (np.median(err), expect)


def test_klt_flags_bad_tracks():
    img1, img2 = _down_cam_frames([0.02, 0.0, 0.0])
    # points in a synthetic flat (textureless) patch must be rejected
    img1 = img1.at[:64, :64].set(0.5)
    img2 = img2.at[:64, :64].set(0.5)
    pts = jnp.array([[32.0, 32.0], [160.0, 112.0]])
    _, ok = track_pyramidal(img1, img2, pts)
    assert not bool(ok[0])  # flat patch: ill-conditioned


def test_triangulate_recovers_point():
    rng = np.random.default_rng(3)
    p_true = jnp.array([0.4, -0.3, 2.0])
    m = 6
    rots, pos, bear = [], [], []
    for i in range(m):
        # cameras near origin with small random attitude, looking +z
        rv = rng.normal(size=3) * 0.05
        r_c2a = np.asarray(quat_to_rot(quat_exp(jnp.array(rv, jnp.float32))))
        p_c = rng.normal(size=3) * np.array([0.4, 0.4, 0.05])
        pf_c = r_c2a.T @ (np.asarray(p_true) - p_c)
        b = pf_c / np.linalg.norm(pf_c)
        rots.append(r_c2a)
        pos.append(p_c)
        bear.append(b)
    p_est, ok = triangulate_nview(
        jnp.array(np.stack(bear), jnp.float32),
        jnp.array(np.stack(rots), jnp.float32),
        jnp.array(np.stack(pos), jnp.float32),
        jnp.ones(m, bool),
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(p_est), np.asarray(p_true), atol=2e-3)


def test_triangulate_rejects_single_view():
    b = jnp.array([[0.0, 0.0, 1.0]] * 4, jnp.float32)
    r = jnp.tile(jnp.eye(3)[None], (4, 1, 1))
    p = jnp.zeros((4, 3))
    valid = jnp.array([True, False, False, False])
    _, ok = triangulate_nview(b, r, p, valid)
    assert not bool(ok)


def test_preintegration_matches_dense_integration(rng):
    """Preintegrated factor applied to a start state == direct integration
    of the same samples in the world frame."""
    t = 40
    dt = jnp.full((t,), 0.0025)
    w = jnp.array(rng.normal(size=(t, 3)) * 0.4, jnp.float32)
    a = jnp.array(rng.normal(size=(t, 3)) + [0.1, -0.2, 9.81], jnp.float32)
    bg = jnp.array([0.01, -0.02, 0.005])
    ba = jnp.array([0.05, 0.02, -0.04])
    g = jnp.array([0.0, 0.0, -9.81])

    f = preintegrate(w, a, dt, bg, ba)
    q0 = quat_exp(jnp.array(rng.normal(size=3) * 0.3, jnp.float32))
    p0 = jnp.array([1.0, 2.0, 1.5])
    v0 = jnp.array([0.3, -0.1, 0.2])
    q_f, p_f, v_f = predict_from_factor(f, q0, p0, v0, g)

    # dense reference integration in world frame
    q, p, v = q0, p0, v0
    for k in range(t):
        r = quat_to_rot(q)
        acc = r @ (a[k] - ba) + g
        p = p + v * dt[k] + 0.5 * acc * dt[k] ** 2
        v = v + acc * dt[k]
        q = quat_mul(q, quat_exp((w[k] - bg) * dt[k]))
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v), atol=1e-4)
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q / jnp.linalg.norm(q)), atol=1e-5)


def test_preintegration_bias_jacobians(rng):
    """First-order bias correction tracks re-integration with shifted bias."""
    t = 30
    dt = jnp.full((t,), 0.0025)
    w = jnp.array(rng.normal(size=(t, 3)) * 0.3, jnp.float32)
    a = jnp.array(rng.normal(size=(t, 3)) + [0, 0, 9.81], jnp.float32)
    bg = jnp.zeros(3)
    ba = jnp.zeros(3)
    f0 = preintegrate(w, a, dt, bg, ba)
    dbg = jnp.array([0.004, -0.003, 0.002])
    dba = jnp.array([0.02, 0.01, -0.015])
    f1 = preintegrate(w, a, dt, bg + dbg, ba + dba)
    dv_corr = f0.dv + f0.j_v_bg @ dbg + f0.j_v_ba @ dba
    dp_corr = f0.dp + f0.j_p_bg @ dbg + f0.j_p_ba @ dba
    np.testing.assert_allclose(np.asarray(dv_corr), np.asarray(f1.dv), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dp_corr), np.asarray(f1.dp), atol=5e-5)


def test_preintegration_padding_noop(rng):
    t = 20
    dt = jnp.concatenate([jnp.full((t,), 0.0025), jnp.zeros(12)])
    w = jnp.array(rng.normal(size=(t + 12, 3)), jnp.float32)
    a = jnp.array(rng.normal(size=(t + 12, 3)) + [0, 0, 9.81], jnp.float32)
    f_pad = preintegrate(w, a, dt, jnp.zeros(3), jnp.zeros(3))
    f_cut = preintegrate(w[:t], a[:t], dt[:t], jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(f_pad.dp), np.asarray(f_cut.dp), atol=1e-7)
    np.testing.assert_allclose(np.asarray(f_pad.dq), np.asarray(f_cut.dq), atol=1e-7)
