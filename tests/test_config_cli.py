"""Config system + CLI smoke tests + filter health + NEES consistency."""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from cuahn_vio.filter import FilterState
from cuahn_vio.filter.health import health_flags
from cuahn_vio.utils.config import VioOptions


def test_defaults_match_launch_file():
    """Every default must be bit-identical to uzhfpv.launch (SURVEY.md §5.6)."""
    o = VioOptions.uzhfpv_indoor45()
    assert o.calib_camimu_dt == -0.0148489  # uzhfpv.launch:43
    assert o.up_linear_k_hnet_cov == 10.0  # :65
    assert o.init_height == 0.1  # :66
    assert o.max_iekf_iterations == 1  # :67
    assert o.init_window_time == 1.0 and o.init_imu_thresh == 0.5  # :17-19
    assert o.gravity_mag == 9.81  # :49
    assert o.gyroscope_noise_density == 0.00559017  # :70
    assert o.accelerometer_random_walk == 0.04472136  # :73
    assert o.cam_is_fisheye  # :79
    np.testing.assert_allclose(
        o.cam_intrinsics[0], 275.46015578667294
    )  # :84
    assert o.use_prior and o.use_network


def test_yaml_roundtrip(tmp_path):
    o = VioOptions.uzhfpv_outdoor45()
    path = str(tmp_path / "cfg.yaml")
    o.to_yaml(path)
    o2 = VioOptions.from_yaml(path)
    assert o2 == o


def test_yaml_rejects_unknown_keys(tmp_path):
    path = str(tmp_path / "bad.yaml")
    with open(path, "w") as f:
        f.write("not_a_real_option: 1\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        VioOptions.from_yaml(path)


def test_converters():
    o = VioOptions.uzhfpv_indoor45()
    fp = o.filter_params()
    assert fp.c_rot_i.shape == (3, 3)
    # rotation must be orthonormal
    r = np.asarray(fp.c_rot_i)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(float(fp.k_net_cov), 10.0)
    cfg = o.vio_config()
    assert cfg.max_iekf_iterations == 1 and cfg.use_prior
    ro = o.runner_options()
    assert ro.calib_camimu_dt == -0.0148489


def _state(**kw):
    base = dict(
        p=jnp.array([0.0, 0.0, 1.0]),
        q=jnp.array([1.0, 0.0, 0.0, 0.0]),
        v=jnp.zeros(3),
        ba=jnp.zeros(3),
        bg=jnp.zeros(3),
        off=jnp.zeros((4, 3)),
        cov=jnp.eye(27) * 1e-4,
    )
    base.update(kw)
    return FilterState(**base)


def test_health_flags():
    assert bool(health_flags(_state()).ok)
    assert not bool(health_flags(_state(p=jnp.array([0.0, 0.0, jnp.nan]))).ok)
    assert not bool(health_flags(_state(v=jnp.array([100.0, 0, 0]))).speed_ok)
    assert not bool(
        health_flags(_state(cov=jnp.eye(27) * 1e6)).cov_bounded
    )
    assert not bool(health_flags(_state(p=jnp.array([0.0, 0.0, -1.0]))).height_ok)
    bad_cov = jnp.eye(27).at[5, 5].set(-1.0)
    assert not bool(health_flags(_state(cov=bad_cov)).cov_psd)


def test_cli_help_and_eval(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, "-m", "cuahn_vio.cli", "--help"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert out.returncode == 0
    for cmd in ("error-singlerun", "run-vio", "train-uahn", "make-synthetic"):
        assert cmd in out.stdout

    ref = "/root/reference/cuahn_ros/ov_data/uzh_fpv"
    est = os.path.join(ref, "stamped_traj_estimate.txt")
    gt = os.path.join(ref, "indoor_45_2_snapdragon_with_gt.txt")
    if os.path.exists(est):
        out = subprocess.run(
            [
                sys.executable, "-m", "cuahn_vio.cli",
                "error-singlerun", "se3", gt, est, "--segments", "20",
            ],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "rmse 0.330" in out.stdout  # BASELINE.md ATE
        # timing tool on the shipped artifact
        out2 = subprocess.run(
            [
                sys.executable, "-m", "cuahn_vio.cli",
                "timing-percentages", os.path.join(ref, "traj_timing.txt"),
            ],
            capture_output=True, text=True, env=env, timeout=120,
        )
        assert out2.returncode == 0
        assert "27.6 fps" in out2.stdout


def test_cli_new_eval_tools(tmp_path):
    """timing-flamegraph/comparison, align-trajectory, error-simulation
    CLI smoke (the ov_eval binaries they rebuild: SURVEY.md §2.5)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""

    ref = "/root/reference/cuahn_ros/ov_data/uzh_fpv"
    timing = os.path.join(ref, "traj_timing.txt")
    est = os.path.join(ref, "stamped_traj_estimate.txt")
    gt = os.path.join(ref, "indoor_45_2_snapdragon_with_gt.txt")
    if not os.path.exists(timing):
        pytest.skip("reference artifacts unavailable")

    out = subprocess.run(
        [sys.executable, "-m", "cuahn_vio.cli", "timing-comparison", timing],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert out.returncode == 0 and "network" in out.stdout

    png = str(tmp_path / "fg.png")
    out = subprocess.run(
        [sys.executable, "-m", "cuahn_vio.cli",
         "timing-flamegraph", timing, "--out", png],
        capture_output=True, text=True, env=env, timeout=180,
    )
    assert out.returncode == 0 and os.path.getsize(png) > 1000

    aligned = str(tmp_path / "aligned.txt")
    out = subprocess.run(
        [sys.executable, "-m", "cuahn_vio.cli",
         "align-trajectory", gt, est, "--out", aligned],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(aligned)

    # error-simulation on a tiny self-consistent estimate/GT pair
    from cuahn_vio.eval.simulation import StateGT, save_state_gt

    n = 50
    t = np.arange(n) * 0.1
    pose = np.zeros((n, 7))
    pose[:, 2] = 1.0
    pose[:, 6] = 1.0
    gt_path = str(tmp_path / "sgt.txt")
    save_state_gt(gt_path, StateGT(t, pose, np.zeros((n, 3)),
                                   np.zeros((n, 3)), np.zeros((n, 3))))
    est_npz = str(tmp_path / "est.npz")
    np.savez(est_npz, times=t, pose=pose, v_body=np.zeros((n, 3)),
             ba=np.zeros((n, 3)), bg=np.zeros((n, 3)),
             cov_diag=np.full((n, 15), 1e-4))
    out = subprocess.run(
        [sys.executable, "-m", "cuahn_vio.cli",
         "error-simulation", est_npz, gt_path,
         "--plot", str(tmp_path / "sim.png")],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pos_rmse" in out.stdout and "NEES" in out.stdout


def test_watch_run_once(tmp_path):
    """watch-run on a static file writes one plot and exits on staleness."""
    import numpy as np

    from cuahn_vio.cli import main as cli_main
    from cuahn_vio.eval import save_pose_file

    t = np.arange(20) / 10.0
    poses = np.zeros((20, 7))
    poses[:, 0] = np.linspace(0, 2, 20)
    poses[:, 6] = 1.0
    est = str(tmp_path / "est.txt")
    save_pose_file(est, t, poses)
    out = str(tmp_path / "w.png")
    cli_main([
        "watch-run", est, "--gt", est, "--out", out,
        "--interval", "0.05", "--stale-ticks", "2",
    ])
    import os

    assert os.path.exists(out)


def test_plot_trackhist(tmp_path):
    """plot-trackhist draws the corner-flow history image from a
    sequence + state log (RosVisualizer trackhist analog)."""
    import numpy as np

    from cuahn_vio.cli import main as cli_main

    rng = np.random.default_rng(0)
    seq = str(tmp_path / "seq.npz")
    np.savez(seq, frames=rng.integers(0, 255, (12, 224, 320)).astype(np.uint8))
    state = str(tmp_path / "state.npz")
    np.savez(
        state,
        net_mean=rng.normal(size=(10, 8)).astype(np.float32) * 5,
        net_chi2=rng.uniform(1, 30, 10).astype(np.float32),
    )
    out = str(tmp_path / "track.png")
    cli_main(["plot-trackhist", seq, state, "--history", "6", "--out", out])
    import os

    assert os.path.exists(out)


def test_named_profiles():
    """apply_profile: 'launch' is a no-op copy; 'calibrated' applies
    CALIBRATED_PROFILE (the shipped benchmark operating point) and leaves
    everything else at launch parity."""
    from cuahn_vio.utils.config import CALIBRATED_PROFILE

    base = VioOptions.uzhfpv_indoor45()
    launch = base.apply_profile("launch")
    assert launch == base and launch is not base
    cal = base.apply_profile("calibrated")
    for k, v in CALIBRATED_PROFILE.items():
        assert getattr(cal, k) == v
    assert cal.up_linear_k_hnet_cov == 7.9
    assert cal.process_noise_scale == 30.0
    # untouched fields stay launch-parity
    assert cal.calib_camimu_dt == base.calib_camimu_dt
    assert cal.max_iekf_iterations == 1
    with pytest.raises(ValueError):
        base.apply_profile("nope")
    # the profile reaches the filter: q_noise scales by 30, extra pos 1e-2
    fp_l, fp_c = launch.filter_params(), cal.filter_params()
    ql = np.asarray(fp_l.q_noise); qc = np.asarray(fp_c.q_noise)
    np.testing.assert_allclose(qc[0, 0], ql[0, 0] * 30.0, rtol=1e-6)
    np.testing.assert_allclose(qc[12, 12], 1e-2, rtol=1e-6)
    assert float(fp_c.k_net_cov) == pytest.approx(7.9)
