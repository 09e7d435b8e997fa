"""Command-line tools: the ov_eval binaries + the VIO app, one entry point.

Replaces (SURVEY.md §2.5-2.6, ov_eval/CMakeLists.txt:99-132):
- run_subscribe_cuahn + pose_to_file -> ``run-vio`` (pose txt + timing csv +
  state npz + FRD odometry), ``run-vio-batch`` (mesh-sharded multi-sequence)
- error_singlerun.cpp                -> ``error-singlerun``
- error_dataset.cpp                  -> ``error-dataset``
- error_comparison.cpp               -> ``error-comparison``
- error_simulation.cpp               -> ``error-simulation``
- plot_trajectories.cpp              -> ``plot-trajectories``
- format_converter.cpp               -> ``format-converter``
- timing_{percentages,comparison,flamegraph}.cpp -> same names
- live_align_trajectory.cpp          -> ``align-trajectory``
- python/pid_{sys,ros}.py            -> ``pid-monitor``
- show_photometric_error display     -> ``inspect-frame``
- (new, no reference counterpart) ``train-uahn`` (the reference ships no
  weights or training code), ``make-synthetic`` (incl. --traj-file B-spline
  replay), ``convert-euroc``, ``close-loops`` + ``smooth-trajectory``
  (pose-graph smoothing, --mesh = sharded Schur solve).

Usage: ``python -m cuahn_vio.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np


# --------------------------------------------------------------------- eval
def cmd_error_singlerun(args):
    from cuahn_vio.eval import ResultTrajectory

    rt = ResultTrajectory.from_files(args.est, args.gt, args.align)
    length = rt.trajectory_length()
    print(f"[COMP]: {len(rt.times)} matched poses, {length:.3f} m trajectory")

    ori, pos = rt.calculate_ate()
    print("=" * 60)
    print("Absolute Trajectory Error (ATE)")
    print(f"  ori: rmse {ori.rmse:.5f} deg | mean {ori.mean:.5f} | std {ori.std:.5f}")
    print(f"  pos: rmse {pos.rmse:.5f} m   | mean {pos.mean:.5f} | std {pos.std:.5f}")

    ori2, pos2 = rt.calculate_ate_2d()
    print("ATE 2D")
    print(f"  yaw: rmse {ori2.rmse:.5f} deg | pos-xy: rmse {pos2.rmse:.5f} m")

    segments = [float(x) for x in args.segments.split(",")] if args.segments else [
        length * f for f in (0.1, 0.2, 0.3, 0.4, 0.5)
    ]
    rpe = rt.calculate_rpe(segments)
    print("Relative Pose Error (RPE)")
    for d, (o, p) in sorted(rpe.items()):
        print(
            f"  seg {d:7.2f} m: ori med {o.median:.4f} deg | pos med {p.median:.4f} m"
            f" ({len(p.values)} samples)"
        )
    try:
        no, npos = rt.calculate_nees()
        print(f"NEES: ori mean {no.mean:.3f} | pos mean {npos.mean:.3f}")
    except ValueError:
        print("NEES: estimate has no covariance columns (skipped)")


def cmd_error_dataset(args):
    from cuahn_vio.eval import ResultTrajectory

    runs = sorted(glob.glob(os.path.join(args.runs, "*.txt")))
    print(f"{'run':40s} {'ATE pos (m)':>12s} {'ATE ori (deg)':>14s}")
    rmses = []
    for run in runs:
        try:
            rt = ResultTrajectory.from_files(run, args.gt, args.align)
            ori, pos = rt.calculate_ate()
            rmses.append(pos.rmse)
            print(f"{os.path.basename(run):40s} {pos.rmse:12.4f} {ori.rmse:14.4f}")
        except Exception as e:  # noqa: BLE001
            print(f"{os.path.basename(run):40s} FAILED: {e}")
    if rmses:
        print(f"{'mean':40s} {np.mean(rmses):12.4f}")


def cmd_error_comparison(args):
    """algorithms x datasets matrix: args.root/<algo>/<dataset>.txt vs
    args.gt_dir/<dataset>.txt (error_comparison.cpp layout)."""
    from cuahn_vio.eval import ResultTrajectory

    algos = sorted(
        d for d in os.listdir(args.root)
        if os.path.isdir(os.path.join(args.root, d))
    )
    gts = sorted(glob.glob(os.path.join(args.gt_dir, "*.txt")))
    names = [os.path.splitext(os.path.basename(g))[0] for g in gts]
    print("ATE pos rmse (m)")
    print(f"{'algorithm':24s} " + " ".join(f"{n[:14]:>15s}" for n in names))
    for algo in algos:
        row = []
        for gt, name in zip(gts, names):
            est = os.path.join(args.root, algo, name + ".txt")
            if not os.path.exists(est):
                row.append("    -")
                continue
            try:
                rt = ResultTrajectory.from_files(est, gt, args.align)
                _, pos = rt.calculate_ate()
                row.append(f"{pos.rmse:15.4f}")
            except Exception:  # noqa: BLE001
                row.append(f"{'err':>15s}")
        print(f"{algo:24s} " + " ".join(row))


def cmd_plot_trajectories(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cuahn_vio.eval import load_pose_file

    fig, ax = plt.subplots(figsize=(8, 8))
    for path in args.files:
        t = load_pose_file(path)
        ax.plot(t.poses[:, 0], t.poses[:, 1], label=os.path.basename(path))
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.axis("equal")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out}")


def cmd_plot_trackhist(args):
    """Corner-flow track history drawn over a video frame — the offline
    analog of the reference's /cuahn/trackhist image topic
    (RosVisualizer.cpp:33-48 publish_trackhist): for each of the four
    corner measurement points, the last N frames' network-measured flow
    vectors (and the current frame's, highlighted), anchored at the
    corner's pixel location, plus a chi2 strip so rejected measurements
    are visible at a glance."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    seq = np.load(args.sequence)
    log = np.load(args.state)
    if "net_mean" not in log:
        raise SystemExit(
            "state log has no net_mean — re-run run-vio --state-out with "
            "this version"
        )
    flows = log["net_mean"]  # (F, 8) px, in corner order UL BL BR UR
    chi2 = log.get("net_chi2")
    frames = seq["frames"]
    # runner output row f corresponds to frame pair (f, f+1): the state
    # log is one shorter than the frame array and offset by the frames
    # consumed during initialization
    off = len(frames) - len(flows)
    f = args.frame if args.frame is not None else len(flows) - 1
    f = int(np.clip(f, 0, len(flows) - 1))
    lo = max(0, f - args.history)

    img = frames[min(f + off, len(frames) - 1)]
    h, w = img.shape
    # corner pixel anchors, CORNER_XY1 order (State.h:110-113):
    # x = cx +- 159.5 -> {0, w-1}, y = cy +- 111.5 -> {0, h-1}
    anchors = np.array(
        [[0, 0], [0, h - 1], [w - 1, h - 1], [w - 1, 0]], np.float32
    )
    fig, (ax, axc) = plt.subplots(
        2, 1, figsize=(7, 6.4), height_ratios=[4, 1],
        constrained_layout=True,
    )
    ax.imshow(img, cmap="gray")
    cmap = plt.get_cmap("viridis")
    for k in range(4):
        base = anchors[k]
        hist = flows[lo : f + 1, 2 * k : 2 * k + 2]  # (N, 2)
        for i, v in enumerate(hist[:-1]):
            c = cmap(i / max(1, len(hist) - 1))
            ax.plot(
                [base[0], base[0] + v[0]], [base[1], base[1] + v[1]],
                color=c, lw=0.8, alpha=0.6,
            )
        v = hist[-1]
        ax.annotate(
            "", xy=(base[0] + v[0], base[1] + v[1]), xytext=tuple(base),
            arrowprops=dict(color="red", width=1.2, headwidth=5),
        )
    ax.set_xlim(-30, w + 29)
    ax.set_ylim(h + 29, -30)
    ax.set_title(
        f"corner-flow track history, frames {lo}..{f} "
        f"(red = frame {f})", fontsize=9,
    )
    ax.axis("off")
    if chi2 is not None:
        axc.plot(np.arange(lo, f + 1), chi2[lo : f + 1], lw=1.0)
        axc.axhline(7.3441, color="g", ls="--", lw=0.8, label="8-DoF median")
        axc.set_yscale("log")
        axc.set_xlabel("frame", fontsize=8)
        axc.set_ylabel("innovation chi2", fontsize=8)
        axc.legend(fontsize=7)
        axc.grid(True, alpha=0.3)
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")


def cmd_format_converter(args):
    from cuahn_vio.eval import (
        load_euroc_csv,
        load_pose_file,
        save_euroc_csv,
        save_pose_file,
    )

    if args.input.endswith(".csv"):
        traj = load_euroc_csv(args.input)
        save_pose_file(args.output, traj.times, traj.poses)
    else:
        traj = load_pose_file(args.input)
        save_euroc_csv(args.output, traj)
    print(f"converted {args.input} -> {args.output}")


def cmd_timing_percentages(args):
    from cuahn_vio.eval import load_timing_file

    names = ["load_img", "propagation", "network", "ekf_update", "total"]
    for path in args.files:
        t, stages = load_timing_file(path)
        total = stages[:, 4]
        print(f"== {path} ({len(t)} frames)")
        for i, n in enumerate(names[:4]):
            pct = 100.0 * stages[:, i].sum() / max(total.sum(), 1e-9)
            print(
                f"  {n:12s} mean {stages[:, i].mean():8.3f} ms "
                f"median {np.median(stages[:, i]):8.3f} ms  ({pct:5.1f} %)"
            )
        print(
            f"  {'total':12s} mean {total.mean():8.3f} ms  "
            f"=> {1000.0 / max(total.mean(), 1e-9):.1f} fps"
        )


# ------------------------------------------------------------ timing/sim
def cmd_timing_flamegraph(args):
    """Stacked per-stage timing over the run (timing_flamegraph.cpp
    analog): stages as stacked areas against frame timestamp."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cuahn_vio.eval import load_timing_file

    names = ["load_img", "propagation", "network", "ekf_update"]
    t, stages = load_timing_file(args.file)
    t = t - t[0]
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.stackplot(t, [stages[:, i] for i in range(4)], labels=names, alpha=0.85)
    ax.plot(t, stages[:, 4], "k-", lw=0.6, label="total")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("ms / frame")
    ax.legend(loc="upper right", fontsize=8)
    ax.grid(True, alpha=0.3)
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out}")


def cmd_timing_comparison(args):
    """Side-by-side stage statistics for several runs
    (timing_comparison.cpp analog)."""
    from cuahn_vio.eval import load_timing_file

    names = ["load_img", "propagation", "network", "ekf_update", "total"]
    print(f"{'run':30s} " + " ".join(f"{n:>12s}" for n in names))
    for path in args.files:
        _, stages = load_timing_file(path)
        means = stages.mean(axis=0)
        print(
            f"{os.path.basename(path)[:30]:30s} "
            + " ".join(f"{m:9.3f} ms" for m in means)
        )
        p95 = np.percentile(stages, 95, axis=0)
        print(f"{'  (p95)':30s} " + " ".join(f"{m:9.3f} ms" for m in p95))


def cmd_align_trajectory(args):
    """Associate + align GT onto the estimate frame and write the aligned
    GT file (live_align_trajectory.cpp:38-137 analog, offline)."""
    from cuahn_vio.eval import load_pose_file, save_pose_file
    from cuahn_vio.eval.align import (
        align_trajectory,
        associate_indices,
        jpl_quat_to_rot,
        jpl_rot_to_quat,
    )

    est = load_pose_file(args.est)
    gt = load_pose_file(args.gt)
    ie, ig = associate_indices(est.times, gt.times)
    if len(ie) == 0:
        raise SystemExit("no overlapping timestamps")
    # rotate/translate GT into the estimate frame: est ~ R @ gt + t
    r, t, s = align_trajectory(gt.poses[ig], est.poses[ie], method=args.method)
    poses = gt.poses.copy()
    poses[:, :3] = s * (r @ gt.poses[:, :3].T).T + t
    for i in range(len(poses)):
        rot = jpl_quat_to_rot(gt.poses[i, 3:7]).T  # body->world
        poses[i, 3:7] = jpl_rot_to_quat((r @ rot).T)
    save_pose_file(args.out, gt.times, poses)
    print(f"aligned {len(ie)} matched poses ({args.method}) -> {args.out}")


def cmd_watch_run(args):
    """LIVE progress view of a running estimate file: poll the pose txt as
    run-vio appends/rewrites it, align GT onto the estimate-so-far, and
    refresh an xy-plot PNG — the file-based analog of the reference's
    live_align_trajectory rviz overlay (live_align_trajectory.cpp:38-137)
    + RosVisualizer path topics (RosVisualizer.cpp:33-48)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cuahn_vio.eval import load_pose_file
    from cuahn_vio.eval.align import align_trajectory, associate_indices

    gt = load_pose_file(args.gt) if args.gt else None
    last_n, stale = -1, 0
    ticks = 0
    while True:
        try:
            est = load_pose_file(args.est)
            n = len(est.times)
        except (FileNotFoundError, ValueError):
            n = 0
        if n == last_n:
            stale += 1
        else:
            stale = 0
        if n > 1 and n != last_n:
            fig, ax = plt.subplots(figsize=(7, 7))
            ax.plot(est.poses[:, 0], est.poses[:, 1], "b-", lw=1.2,
                    label=f"estimate ({n} poses)")
            ax.plot(est.poses[-1, 0], est.poses[-1, 1], "bo", ms=6)
            if gt is not None:
                ie, ig = associate_indices(est.times, gt.times)
                if len(ie) >= 3:
                    r, t, sc = align_trajectory(
                        gt.poses[ig], est.poses[ie], method=args.method
                    )
                    gta = sc * (r @ gt.poses[:, :3].T).T + t
                    ax.plot(gta[:, 0], gta[:, 1], "k--", lw=0.8,
                            label="ground truth (aligned)")
                    err = np.linalg.norm(
                        gta[ig] - est.poses[ie, :3], axis=1
                    )
                    ax.set_title(
                        f"pos rmse so far: {np.sqrt(np.mean(err**2)):.3f} m"
                    )
            ax.axis("equal")
            ax.grid(True, alpha=0.3)
            ax.legend(loc="best", fontsize=8)
            fig.savefig(args.out, dpi=110, bbox_inches="tight")
            plt.close(fig)
            print(f"[watch-run] {n} poses -> {args.out}", flush=True)
        last_n = n
        ticks += 1
        if args.max_ticks and ticks >= args.max_ticks:
            return
        if stale >= args.stale_ticks:
            print("[watch-run] estimate stopped growing; exiting", flush=True)
            return
        time.sleep(args.interval)


def cmd_error_simulation(args):
    """State/bias errors + NEES against simulator ground truth
    (error_simulation.cpp / ResultSimulation analog)."""
    from cuahn_vio.eval.simulation import ResultSimulation, load_state_gt

    d = np.load(args.est)
    gt = load_state_gt(args.gt)
    sim = ResultSimulation(
        d["times"], d["pose"], gt,
        est_v_body=d.get("v_body"), est_ba=d.get("ba"), est_bg=d.get("bg"),
        est_cov_diag=d.get("cov_diag"), est_cov_core=d.get("cov_core"),
    )
    summary = sim.summary()
    print(f"matched {len(sim.times)} est/gt pairs")
    for k, v in summary.items():
        print(f"  {k:10s} {v:.6f}")
    if sim.cov_core is not None:
        obs = sim.calculate_nees_observable()
        print("  observable-subspace NEES (gauge directions excluded — "
              "world x/y + yaw are unobservable by construction):")
        print(f"    height 1-DoF: mean {obs['height'].mean:9.3f} "
              f"median {obs['height'].median:7.3f} (target ~1)")
        print(f"    tilt   2-DoF: mean {obs['tilt'].mean:9.3f} "
              f"median {obs['tilt'].median:7.3f} (target ~2)")
        if obs["vel"] is not None:
            print(f"    vel    3-DoF: mean {obs['vel'].mean:9.3f} "
                  f"median {obs['vel'].median:7.3f} (target ~3)")
    if sim.cov is not None:
        neo, nep = sim.calculate_nees()
        print("  full-state NEES (gauge-polluted: unobservable world-x/y "
              "and yaw drift carry no covariance and leak into every "
              "robocentric component — see calculate_nees_observable):")
        print(f"    ori  mean {neo.mean:.3f} (roll/pitch 2-DoF)")
        print(f"    pos  mean {nep.mean:.3f} median {nep.median:.3f}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        blocks = [
            ("position (m)", sim.error_position()),
            ("orientation (rad)", sim.error_orientation()),
            ("velocity (m/s)", sim.error_velocity()),
            ("accel bias", sim.error_bias_accel()),
            ("gyro bias", sim.error_bias_gyro()),
        ]
        blocks = [(n, e) for n, e in blocks if e is not None]
        fig, axes = plt.subplots(
            len(blocks), 3, figsize=(12, 2.2 * len(blocks)), squeeze=False
        )
        for bi, (name, es) in enumerate(blocks):
            for ax_i in range(3):
                ax = axes[bi][ax_i]
                ax.plot(es.times - es.times[0], es.err[:, ax_i], lw=0.7)
                if es.bound3 is not None:
                    ax.plot(es.times - es.times[0], es.bound3[:, ax_i], "r--", lw=0.6)
                    ax.plot(es.times - es.times[0], -es.bound3[:, ax_i], "r--", lw=0.6)
                if ax_i == 0:
                    ax.set_ylabel(name, fontsize=8)
                ax.grid(True, alpha=0.3)
        fig.savefig(args.plot, dpi=130, bbox_inches="tight")
        print(f"wrote {args.plot}")


def cmd_pid_monitor(args):
    """Sample CPU%/RSS of a process (ov_eval/python/pid_sys.py analog)."""
    import json as _json

    from cuahn_vio.eval.recorder import ResourceMonitor

    mon = ResourceMonitor(pid=args.pid, interval=args.interval).start()
    try:
        time.sleep(args.duration)
    finally:
        print(_json.dumps(mon.stop()))


# ---------------------------------------------------------------------- vio
def cmd_run_vio(args):
    import jax

    from cuahn_vio.eval import save_pose_file, save_timing_file
    from cuahn_vio.models.uahn import UAHN, init_uahn
    from cuahn_vio.pipeline import run_offline, run_stepwise
    from cuahn_vio.utils.config import VioOptions
    from cuahn_vio.utils.checkpoint import load_params

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45()
    )
    # profile resolution: an explicit --profile always applies; otherwise
    # a bare invocation gets the shipped calibrated operating point, while
    # a user --config is honored as-is (its fields are not silently
    # overwritten — ADVICE round 4)
    if args.profile is not None:
        opts = opts.apply_profile(args.profile)
    elif not args.config:
        opts = opts.apply_profile("calibrated")
    if args.init_height is not None:
        opts.init_height = args.init_height
    if args.init_imu_thresh is not None:
        opts.init_imu_thresh = args.init_imu_thresh
    if args.calib_dt is not None:
        opts.calib_camimu_dt = args.calib_dt
    if args.k_net_cov is not None:
        opts.up_linear_k_hnet_cov = args.k_net_cov
    if args.chi2_gate is not None:
        opts.chi2_gate = args.chi2_gate
    if args.iekf is not None:
        opts.max_iekf_iterations = args.iekf
    if args.no_prior:
        opts.use_prior = False
    if args.q_scale is not None:
        opts.process_noise_scale = args.q_scale
    if args.q_pos_extra is not None:
        opts.extra_position_noise = args.q_pos_extra
    if args.bias_sigma_px is not None:
        opts.meas_bias_sigma_px = args.bias_sigma_px
    if args.bias_tau is not None:
        opts.meas_bias_tau = args.bias_tau
    if args.chi2_soft is not None:
        opts.chi2_soft = args.chi2_soft
    if args.echo_beta is not None:
        opts.echo_beta = args.echo_beta

    if args.sequence.endswith(".npz"):
        d = np.load(args.sequence)
        imu_t, imu_w, imu_a = d["imu_t"], d["imu_w"], d["imu_a"]
        cam_t, frames = d["cam_t"], d["frames"]
    else:
        raise SystemExit(
            "expected an .npz sequence file with imu_t/imu_w/imu_a/cam_t/frames "
            "(use 'make-synthetic' or the dataset converter)"
        )

    import jax.numpy as jnp

    model, params = init_uahn(
        jax.random.PRNGKey(0), blocks_to_run=opts.blocks_to_run,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    if opts.network_weights_path or args.weights:
        params = load_params(args.weights or opts.network_weights_path, params)
    if args.no_network:
        model, params = None, None

    runner = run_stepwise if args.timing_out else run_offline
    res = runner(
        imu_t, imu_w, imu_a, cam_t, frames,
        model, params, opts.filter_params(), opts.vio_config(),
        opts.runner_options(), seed=args.seed,
    )
    if getattr(args, "cov_calib", None):
        # reported-covariance calibration (eval/calibration.py
        # fit_cov_inflation docstring): scales the OUTPUT covariance only;
        # the filter's internal gain path is untouched
        from cuahn_vio.eval.calibration import apply_cov_inflation

        factors = dict(
            kv.split(":") for kv in args.cov_calib.split(",")
        )
        factors = {k: float(v) for k, v in factors.items()}
        cal = apply_cov_inflation(res.cov_core, factors)
        res = res._replace(
            cov_core=cal,
            cov_diag=np.einsum("fii->fi", cal).copy(),
            cov_ori=cal[:, 3:6, 3:6],
            cov_pos=cal[:, 0:3, 0:3],
        )
        print(f"applied reported-covariance calibration: {factors}")

    save_pose_file(args.out, res.times, res.pose_w, res.cov_ori, res.cov_pos)
    print(f"wrote {len(res.times)} poses -> {args.out}")
    if args.timing_out and res.stage_ms is not None:
        save_timing_file(args.timing_out, res.times, res.stage_ms)
        print(f"wrote timing -> {args.timing_out}")
    if args.state_out:
        np.savez_compressed(
            args.state_out,
            times=res.times, pose=res.pose_w, v_body=res.v_body,
            ba=res.ba, bg=res.bg, cov_diag=res.cov_diag,
            cov_core=res.cov_core,
            net_chi2=res.net_chi2, net_inno=res.net_inno,
            cov_meas=res.cov_meas, net_cov88=res.net_cov88,
            net_mean=res.net_mean,
        )
        print(f"wrote full state -> {args.state_out}")
    if args.odom_out:
        from cuahn_vio.eval.traj_io import save_odom_file

        save_odom_file(args.odom_out, res.times, res.pose_w, res.v_body)
        print(f"wrote odometry -> {args.odom_out}")
    if res.n_recoveries:
        print(f"divergence guard fired {res.n_recoveries}x (state rolled back)")
    if model is not None and res.net_chi2 is not None:
        chi2 = res.net_chi2[np.isfinite(res.net_chi2)]
        rejected = int((res.net_chi2 >= opts.chi2_gate).sum()) + int(
            (~np.isfinite(res.net_chi2)).sum()
        )
        if len(chi2):
            print(
                "innovation chi2 (8 DoF): median "
                f"{np.median(chi2):.1f}, p95 {np.percentile(chi2, 95):.1f}; "
                f"{rejected} of {len(res.net_chi2)} measurements gated out"
            )


def cmd_calibrate_covariance(args):
    """Fit the measurement-covariance temperature k_net_cov (the
    reference's hand-tuned K_net_Cov=10, UpdaterHNet.cpp:31-33) from a
    logged run so the innovation chi2 median hits the 8-DoF ideal."""
    from cuahn_vio.eval.calibration import fit_from_state_npz

    res = fit_from_state_npz(args.state, target_median=args.target_median)
    print(f"frames used:        {res['n_frames']}")
    print(
        f"fitted k_net_cov:   {res['k_net_cov']:.4g} "
        f"(reference hand-tuned value: 10.0)"
    )
    print(
        f"chi2 under fit:     median {res['chi2_median']:.2f} "
        f"(target {res['target_median']:.2f}), p95 {res['chi2_p95']:.1f}, "
        f"mean {res['chi2_mean']:.2f}"
    )
    print(
        "apply: set up_linear_k_hnet_cov: "
        f"{res['k_net_cov']:.4g} in the YAML config (or --k-net-cov), "
        "re-run, and re-check the printed chi2 median"
    )


def cmd_make_synthetic(args):
    from cuahn_vio.data.synthetic import AnalyticTrajectory, make_sequence
    from cuahn_vio.eval import save_pose_file
    from cuahn_vio.eval.simulation import StateGT, save_state_gt
    from cuahn_vio.utils.config import VioOptions

    # the written _config.yaml records the ACTUAL shipped operating point:
    # a bare invocation bakes the calibrated profile in (run-vio honors the
    # YAML as-is since round 5 — no silent post-load stomp), while a user
    # --config passes through untouched
    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45().apply_profile("calibrated")
    )
    if args.traj_file:
        from cuahn_vio.data.bspline import SplineTrajectory

        traj = SplineTrajectory.from_trajectory_file(
            args.traj_file, dt=args.spline_dt, z_offset=args.traj_z_offset
        )
    else:
        traj = AnalyticTrajectory()
    texture = tex_params = None
    if args.texture != "none":
        from cuahn_vio.data.textures import (
            default_tex_params,
            get_texture_bank,
            heldout_indices,
            train_indices,
        )

        bank = get_texture_bank()
        split = (
            heldout_indices(len(bank))
            if args.texture == "heldout"
            else train_indices(len(bank))
        )
        pick = args.texture_pick if args.texture_pick is not None else args.seed
        idx = int(split[pick % len(split)])
        texture = bank[idx]
        tex_params = np.asarray(default_tex_params(args.tex_scale))
        print(f"ground texture: bank[{idx}] ({args.texture} split), "
              f"{args.tex_scale} m/period")
    effects = None
    if args.effects:
        from cuahn_vio.data.sensor_effects import EffectsConfig

        effects = EffectsConfig()
    seq = make_sequence(
        traj,
        np.asarray(opts.t_imu_to_cam),
        duration=args.duration,
        seed=args.seed,
        sigma_w=args.sigma_w,
        sigma_a=args.sigma_a,
        bias_g=args.bias_g,
        bias_a=args.bias_a,
        texture_seed=args.seed,
        texture=texture,
        tex_params=tex_params,
        exposure_s=args.exposure_ms * 1e-3,
        effects=effects,
        effects_seed=args.seed,
    )
    np.savez_compressed(
        args.out,
        imu_t=seq.imu_t, imu_w=seq.imu_w, imu_a=seq.imu_a,
        cam_t=seq.cam_t, frames=seq.frames,
    )
    gt_path = os.path.splitext(args.out)[0] + "_gt.txt"
    save_pose_file(gt_path, seq.gt_times, seq.gt_pose_w)
    state_gt_path = os.path.splitext(args.out)[0] + "_state_gt.txt"
    n = len(seq.gt_times)
    save_state_gt(
        state_gt_path,
        StateGT(
            times=seq.gt_times, pose=seq.gt_pose_w, vel=seq.gt_vel_w,
            bg=np.tile(seq.true_bg, (n, 1)), ba=np.tile(seq.true_ba, (n, 1)),
        ),
    )
    # a config whose init/calib knobs match this sequence (no cam-imu time
    # offset; hover altitude as init_height; gentle motion-onset jerk)
    opts.calib_camimu_dt = 0.0
    opts.init_height = float(seq.gt_pose_w[0, 2])
    opts.init_imu_thresh = 0.2
    cfg_path = os.path.splitext(args.out)[0] + "_config.yaml"
    opts.to_yaml(cfg_path)
    print(f"wrote {args.out}, {gt_path}, {state_gt_path} and {cfg_path}")


def cmd_eval_flow(args):
    """Network measurement quality in isolation: run the UAHN on every
    consecutive frame pair of a rendered sequence and compare the predicted
    4-point flow with the ORACLE flow computed from the simulator GT poses
    (data/oracle.py true_corner_flow — the exact quantity the network is
    trained to estimate, model_to_trace.py:299-330 output 1). Separates
    'the network measures badly' from 'the filter uses measurements badly':
    filter-independent px error + uncertainty-calibration ratio."""
    import jax
    import jax.numpy as jnp

    from cuahn_vio.data.oracle import true_corner_flow
    from cuahn_vio.eval.simulation import load_state_gt
    from cuahn_vio.models.uahn import init_uahn
    from cuahn_vio.utils.checkpoint import load_params
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45()
    )
    fp = opts.filter_params()
    d = np.load(args.sequence)
    frames, cam_t = d["frames"], d["cam_t"]
    gt = load_state_gt(args.state_gt)

    # GT row nearest to each camera timestamp
    idx = np.searchsorted(gt.times, cam_t)
    idx = np.clip(idx, 0, len(gt.times) - 1)
    lo = np.clip(idx - 1, 0, len(gt.times) - 1)
    pick = np.where(
        np.abs(gt.times[lo] - cam_t) < np.abs(gt.times[idx] - cam_t), lo, idx
    )
    pose = gt.pose[pick]  # (F, 7) [xyz qx qy qz qw]
    p_w = jnp.asarray(pose[:, :3], jnp.float32)
    q_wxyz = jnp.asarray(pose[:, [6, 3, 4, 5]], jnp.float32)

    flow_true = jax.vmap(
        lambda p1, q1, p2, q2: true_corner_flow(
            p1, q1, p2, q2, fp.c_rot_i, fp.i_t_i2c
        )
    )(p_w[:-1], q_wxyz[:-1], p_w[1:], q_wxyz[1:])  # (F-1, 8)

    model, params = init_uahn(jax.random.PRNGKey(0))
    params = load_params(args.weights, params)
    use_prior = args.prior != "none"

    @jax.jit
    def infer(img1, img2, prior_px, key):
        return jax.vmap(
            lambda a, b, pr, k: model.apply(
                {"params": params}, a, b,
                pr if use_prior else None,
                use_prior=use_prior,
                rngs={"dropout": k},
            )
        )(img1, img2, prior_px, key)

    n = len(frames) - 1
    if args.limit:
        n = min(n, args.limit)
    imgs = jnp.asarray(frames[: n + 1], jnp.float32) / 255.0
    rng = jax.random.PRNGKey(args.seed)
    preds, covs = [], []
    bs = args.batch
    for s in range(0, n, bs):
        e = min(s + bs, n)
        prior = flow_true[s:e].reshape(-1, 4, 2)
        if args.prior == "noisy":
            prior = prior + 2.0 * jax.random.normal(
                jax.random.fold_in(rng, 10_000 + s), prior.shape
            )
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            rng, jnp.arange(s, e)
        )
        flow8, cov88 = infer(imgs[s:e], imgs[s + 1 : e + 1], prior, keys)
        preds.append(np.asarray(flow8))
        covs.append(np.asarray(cov88))
    pred = np.concatenate(preds)  # (n, 8)
    cov = np.concatenate(covs)  # (n, 8, 8)
    true = np.asarray(flow_true[:n])

    err = pred - true  # px
    enorm = np.linalg.norm(err.reshape(n, 4, 2), axis=2)  # per-corner px
    sig = np.sqrt(np.maximum(np.einsum("fii->fi", cov), 1e-12))
    # z-scores: per-component error / predicted sigma (calibrated ~ N(0,1))
    z = err / sig
    flow_mag = np.linalg.norm(true.reshape(n, 4, 2), axis=2)
    print(f"frames: {n}, prior={args.prior}")
    print(
        f"true |flow|   px: median {np.median(flow_mag):.2f}, "
        f"p95 {np.percentile(flow_mag, 95):.2f}, max {flow_mag.max():.2f}"
    )
    print(
        f"corner error  px: rmse {np.sqrt((enorm ** 2).mean()):.3f}, "
        f"median {np.median(enorm):.3f}, p95 {np.percentile(enorm, 95):.3f}, "
        f"max {enorm.max():.2f}"
    )
    print(
        f"pred sigma    px: median {np.median(sig):.3f}, "
        f"p95 {np.percentile(sig, 95):.3f}"
    )
    print(
        f"z-score (err/sigma): median |z| {np.median(np.abs(z)):.2f} "
        f"(calibrated ~0.67), p95 |z| {np.percentile(np.abs(z), 95):.2f} "
        f"(~1.96), rms z {np.sqrt((z ** 2).mean()):.2f} (~1.0)"
    )
    # regime split: frames whose true flow stays in the measurement's
    # useful range vs degenerate high-tilt frames (corner rays grazing the
    # ground-plane horizon make the oracle flow — and the measurement
    # itself — blow up; the filter must survive those on the prior alone)
    good = flow_mag.max(axis=1) <= args.flow_cap
    if good.any() and not good.all():
        eg, zg = enorm[good], z[good]
        print(
            f"regime |flow|<= {args.flow_cap:g} px: {int(good.sum())}/{n} "
            f"frames | err px rmse {np.sqrt((eg ** 2).mean()):.3f}, "
            f"median {np.median(eg):.3f}, p95 {np.percentile(eg, 95):.3f} "
            f"| rms z {np.sqrt((zg ** 2).mean()):.2f}"
        )
    worst = np.argsort(enorm.max(axis=1))[-5:][::-1]
    print("worst frames:", ", ".join(
        f"{i} ({enorm[i].max():.1f} px)" for i in worst
    ))
    if args.out:
        np.savez_compressed(
            args.out, pred=pred, true=true, cov=cov, times=cam_t[:n]
        )
        print(f"wrote {args.out}")


def cmd_close_loops(args):
    """Detect overlap candidates in a run, re-run the UAHN across each
    long-baseline pair, and write relative-position loop factors for
    smooth-trajectory (pipeline/loop_closure.py)."""
    import jax

    from cuahn_vio.models.uahn import init_uahn
    from cuahn_vio.pipeline.loop_closure import (
        find_loop_candidates,
        generate_loop_factors,
    )
    from cuahn_vio.utils.checkpoint import load_params
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45()
    )
    seq = np.load(args.sequence)
    st = np.load(args.state)
    pose = st["pose"]
    p_w = pose[:, :3]
    q = pose[:, [6, 3, 4, 5]]  # file xyzw -> wxyz

    # map state rows onto camera frames (state starts at the 2nd frame)
    times = st["times"]
    cam_t = seq["cam_t"]
    frame_of = np.searchsorted(cam_t + opts.calib_camimu_dt, times)
    frame_of = np.clip(frame_of, 0, len(cam_t) - 1)

    pairs = find_loop_candidates(
        times, p_w, min_dt=args.min_dt, max_dist=args.max_dist,
        stride=args.stride, max_pairs=args.max_pairs,
    )
    if len(pairs) == 0:
        raise SystemExit("no loop candidates found")
    print(f"{len(pairs)} loop candidates")

    model, params = init_uahn(jax.random.PRNGKey(0))
    params = load_params(args.weights, params)
    t = np.asarray(opts.t_imu_to_cam)
    c_rot_i = t[:3, :3]
    i_t_i2c = -t[:3, :3].T @ t[:3, 3]

    lf = generate_loop_factors(
        seq["frames"][frame_of], times, p_w, q, c_rot_i, i_t_i2c,
        model, params, pairs=pairs, max_sigma_px=args.max_sigma_px,
        max_prior_px=args.max_prior_px,
    )
    with open(args.out, "w") as f:
        f.write("# i j dpx dpy dpz dqw dqx dqy dqz sigma_p\n")
        for k in range(len(lf.pairs)):
            row = [*lf.pairs[k], *lf.dp_meas[k], *lf.dq_meas[k], lf.sigma_p[k]]
            f.write(" ".join(str(v) for v in row) + "\n")
    print(
        f"wrote {len(lf.pairs)} loop factors -> {args.out} "
        f"({len(pairs) - len(lf.pairs)} of {len(pairs)} candidates gated "
        "out by network confidence)"
    )


def cmd_smooth_trajectory(args):
    """Pose-graph smoothing of a VIO estimate (chain factors from the
    odometry, optional loop factors between keyframe pairs given as
    'a:b,a:b,...'). --mesh runs the block-partitioned Schur-complement
    solver over all devices (parallel/pose_graph_sharded.py)."""
    import jax.numpy as jnp

    from cuahn_vio.eval import load_pose_file, save_pose_file
    from cuahn_vio.parallel.pose_graph import (
        chain_graph_from_trajectory,
        optimize,
        relative_pose,
    )

    traj = load_pose_file(args.est)
    # file poses are [x y z qx qy qz qw]; module wants wxyz
    p = jnp.array(traj.poses[:, :3], jnp.float32)
    q = jnp.array(traj.poses[:, [6, 3, 4, 5]], jnp.float32)

    pairs, edp, edq = None, None, None
    loop_sigma_dp = args.loop_sigma_dp
    if args.loops_file:
        rows = np.loadtxt(args.loops_file, comments="#")
        rows = rows.reshape(-1, rows.shape[-1] if rows.ndim > 1 else 10)
        if rows.shape[0] == 0:
            print("loops file has no factors; chain-only smoothing")
            pairs = None
        else:
            pairs = [(int(a), int(b)) for a, b in rows[:, :2]]
            edp = jnp.array(rows[:, 2:5], jnp.float32)
            edq = jnp.array(rows[:, 5:9], jnp.float32)
            if rows.shape[1] >= 10 and loop_sigma_dp is None:
                # per-factor sigmas from the network covariance (col 10),
                # scaled by --loop-sigma-scale (the network covariance is
                # measurably optimistic — eval/calibration.py — so the
                # calibrated scale is > 1)
                loop_sigma_dp = jnp.array(
                    rows[:, 9] * args.loop_sigma_scale, jnp.float32
                )
    elif args.loops:
        pairs = [
            tuple(int(x) for x in pair.split(":")) for pair in args.loops.split(",")
        ]
        d = [relative_pose(p[a], q[a], p[b], q[b]) for a, b in pairs]
        edp = jnp.stack([x[0] for x in d])
        edq = jnp.stack([x[1] for x in d])
    graph = chain_graph_from_trajectory(
        p, q, sigma_dp=args.sigma_dp, sigma_dth=args.sigma_dth,
        extra_pairs=pairs, extra_dp=edp, extra_dq=edq,
        extra_sigma_dp=loop_sigma_dp, extra_sigma_dth=args.loop_sigma_dth,
    )

    if args.mesh:
        from cuahn_vio.parallel.mesh import make_mesh
        from cuahn_vio.parallel.pose_graph_sharded import (
            optimize_sharded,
            partition_graph,
            reassemble,
        )

        mesh = make_mesh()
        sg = partition_graph(graph, mesh.devices.size)
        p_int, q_int, p_sep, q_sep, costs = optimize_sharded(
            sg, mesh, iters=args.iters
        )
        p_opt, q_opt = reassemble(sg, p_int, q_int, p_sep, q_sep)
        print(f"sharded GN over {mesh.devices.size} devices")
    else:
        p_opt, q_opt, costs = optimize(
            graph, iters=args.iters, huber_delta=args.huber
        )
        p_opt, q_opt = np.asarray(p_opt), np.asarray(q_opt)

    print(f"cost {float(costs[0]):.4g} -> {float(costs[-1]):.4g}")
    poses = np.concatenate([p_opt, q_opt[:, [1, 2, 3, 0]]], axis=1)
    save_pose_file(args.out, traj.times, poses)
    print(f"wrote {args.out}")


def cmd_distributed_selftest(args):
    """Join a multi-process jax.distributed job and run the deterministic
    sharded workload (parallel/selftest.py); prints one JSON result line.
    The checksums must match a single-process run bit-for-bit (f32)."""
    import json

    from cuahn_vio.parallel.mesh import init_distributed
    from cuahn_vio.parallel.selftest import run_selftest

    if args.coordinator:
        init_distributed(args.coordinator, args.num_processes, args.process_id)
    if args.bench:
        from cuahn_vio.parallel.selftest import run_selftest_bench

        res = run_selftest_bench(args.mesh_devices)
    else:
        res = run_selftest(args.mesh_devices)
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


def cmd_run_vio_batch(args):
    """Run MANY sequences in lockstep, sharded over the device mesh
    (parallel/sharded_eval.py — the batched-throughput serving/eval mode).
    Writes one pose txt per input sequence."""
    import jax
    import jax.numpy as jnp

    from cuahn_vio.models.uahn import init_uahn
    from cuahn_vio.parallel.mesh import make_mesh
    from cuahn_vio.parallel.sharded_eval import batched_run_sequences
    from cuahn_vio.pipeline import prepare_sequence
    from cuahn_vio.pipeline.runner import _outputs_to_result
    from cuahn_vio.eval import save_pose_file
    from cuahn_vio.utils.checkpoint import load_params
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45()
    )
    # same profile resolution as run-vio (explicit wins; bare invocation
    # gets 'calibrated'; a user --config is honored as-is)
    if args.profile is not None:
        opts = opts.apply_profile(args.profile)
    elif not args.config:
        opts = opts.apply_profile("calibrated")
    if args.init_height is not None:
        opts.init_height = args.init_height

    model, params = init_uahn(
        jax.random.PRNGKey(0), blocks_to_run=opts.blocks_to_run
    )
    if args.weights:
        params = load_params(args.weights, params)
    if args.no_network:
        model, params = None, None

    preps, n_frames = [], []
    for path in args.sequences:
        d = np.load(path)
        prep = prepare_sequence(
            d["imu_t"], d["imu_w"], d["imu_a"], d["cam_t"], d["frames"],
            opts.runner_options(), opts.filter_params(),
        )
        preps.append(prep)
        n_frames.append(prep[2].dt.shape[0])

    # pad to a common frame count (scan needs one static length); padded
    # steps integrate zero-dt windows (no-ops) on repeated last frames
    f_max = max(n_frames)
    imgs, ws, a_s, dts = [], [], [], []
    for (init, state0, win, cam_used, frames_used), nf in zip(preps, n_frames):
        pad_f = f_max - nf
        imgs.append(
            np.concatenate([frames_used, np.repeat(frames_used[-1:], pad_f, 0)])
        )
        ws.append(np.pad(win.w_mid, ((0, pad_f), (0, 0), (0, 0))))
        a_s.append(np.pad(win.a_mid, ((0, pad_f), (0, 0), (0, 0))))
        dts.append(np.pad(win.dt, ((0, pad_f), (0, 0))))

    states0 = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[p[1] for p in preps]
    )
    mesh = None
    if args.mesh:
        import math

        n_dev = math.gcd(len(preps), len(jax.devices()))
        mesh = make_mesh(devices=jax.devices()[:n_dev])
        print(f"sharding {len(preps)} sequences over {n_dev} devices")
    keys = jax.random.split(jax.random.PRNGKey(args.seed), len(preps))
    _, outs = batched_run_sequences(
        states0, model, params, opts.filter_params(), opts.vio_config(),
        jnp.array(np.stack(imgs)), jnp.array(np.stack(ws)),
        jnp.array(np.stack(a_s)), jnp.array(np.stack(dts)), keys, mesh=mesh,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    for i, (path, (init, _, _, cam_used, _), nf) in enumerate(
        zip(args.sequences, preps, n_frames)
    ):
        out_i = jax.tree.map(lambda x: np.asarray(x[i][:nf]), outs)
        times = cam_used[1 : nf + 1] + opts.calib_camimu_dt
        res = _outputs_to_result(out_i, times, init.t0)
        name = os.path.splitext(os.path.basename(path))[0] + ".txt"
        dst = os.path.join(args.out_dir, name)
        save_pose_file(dst, res.times, res.pose_w, res.cov_ori, res.cov_pos)
        print(f"{path}: {nf} frames -> {dst}")


def cmd_track_features(args):
    """Sparse KLT feature tracking over a sequence (the TPU-native analog of
    the reference's test_tracking demo, ov_core/src/test_tracking.cpp):
    grid-detect corners, track them frame to frame, re-detect in cells whose
    track died, and write per-frame track arrays."""
    import jax.numpy as jnp

    from cuahn_vio.vision import grid_detect, track_pyramidal

    d = np.load(args.sequence)
    frames = d["frames"]
    n = min(len(frames), args.max_frames or len(frames))
    pts, valid, _ = grid_detect(
        jnp.array(frames[0], jnp.float32) / 255.0,
        grid_y=args.grid_y, grid_x=args.grid_x,
    )
    track_id = np.arange(pts.shape[0])
    next_id = pts.shape[0]
    all_pts, all_valid, all_ids = [np.asarray(pts)], [np.asarray(valid)], [
        track_id.copy()
    ]
    t0 = time.perf_counter()
    for f in range(1, n):
        img1 = jnp.array(frames[f - 1], jnp.float32) / 255.0
        img2 = jnp.array(frames[f], jnp.float32) / 255.0
        pts2, ok = track_pyramidal(img1, img2, jnp.array(all_pts[-1]))
        ok = np.asarray(ok) & all_valid[-1]
        # re-detect: refill dead slots from this frame's grid detection
        fresh_pts, fresh_valid, _ = grid_detect(
            img2, grid_y=args.grid_y, grid_x=args.grid_x
        )
        pts2 = np.array(pts2)  # writable copy (np.asarray of a jax array is read-only)
        dead = ~ok & np.asarray(fresh_valid)
        pts2[dead] = np.asarray(fresh_pts)[dead]
        track_id = track_id.copy()
        track_id[dead] = next_id + np.arange(int(dead.sum()))
        next_id += int(dead.sum())
        all_pts.append(pts2)
        all_valid.append(ok | dead)
        all_ids.append(track_id)
    dt_ms = (time.perf_counter() - t0) * 1e3 / max(n - 1, 1)
    lifetimes = np.asarray(all_ids[-1]) == np.asarray(all_ids[0])
    print(
        f"tracked {len(all_pts[0])} slots over {n} frames, "
        f"{dt_ms:.2f} ms/frame; {int(lifetimes.sum())} survivors from frame 0"
    )
    np.savez_compressed(
        args.out,
        pts=np.stack(all_pts), valid=np.stack(all_valid),
        ids=np.stack(all_ids), times=d["cam_t"][:n],
    )
    print(f"wrote tracks -> {args.out}")


def cmd_inspect_frame(args):
    """Run the network on one frame pair of a sequence and dump diagnostics:
    predicted flow/covariance and the photometric error map
    (|warp(img2, H) - img1| * 255 — the show_photometric_error display of
    HomographyNet.cpp:199-207 / model_to_trace.py:319-327)."""
    import jax
    import jax.numpy as jnp

    from cuahn_vio.models.uahn import init_uahn
    from cuahn_vio.utils.checkpoint import load_params

    d = np.load(args.sequence)
    f = args.frame
    img1 = jnp.array(d["frames"][f], jnp.float32) / 255.0
    img2 = jnp.array(d["frames"][f + 1], jnp.float32) / 255.0

    model, params = init_uahn(jax.random.PRNGKey(0))
    if args.weights:
        params = load_params(args.weights, params)

    out = model.apply(
        {"params": params}, img1, img2, None,
        use_prior=False, return_error_map=True,
        rngs={"dropout": jax.random.PRNGKey(args.seed)},
    )
    flow, cov, err_map = out
    print("4pt flow (px):", np.asarray(flow).round(3))
    print("cov diag (px^2):", np.asarray(jnp.diagonal(cov)).round(3))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 3.5))
    for ax, im, title in zip(
        axes,
        [np.asarray(img1), np.asarray(img2), np.asarray(err_map)],
        ["img1", "img2", "photometric |err| x255"],
    ):
        h = ax.imshow(im, cmap="gray" if title != "photometric |err| x255" else "inferno")
        ax.set_title(title, fontsize=9)
        ax.axis("off")
        fig.colorbar(h, ax=ax, fraction=0.03)
    fig.savefig(args.out, dpi=130, bbox_inches="tight")
    print(f"wrote {args.out} (mean photometric err {float(jnp.mean(err_map)):.2f})")


def cmd_convert_euroc(args):
    """EuRoC-ASL dir -> preprocessed .npz (undistorted via the C++
    runtime). Camera parameters come from the config (uzhfpv.launch
    per-sensor blocks)."""
    from cuahn_vio.data.euroc import load_euroc_sequence, save_sequence_npz
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45()
    )
    intr = np.asarray(opts.cam_intrinsics, np.float64)
    dist = np.asarray(opts.cam_distortion, np.float64)
    seq = load_euroc_sequence(
        args.root, intr, dist, opts.cam_is_fisheye,
        max_frames=args.max_frames,
    )
    save_sequence_npz(args.out, seq)
    print(
        f"wrote {args.out}: {len(seq.cam_t)} frames, "
        f"{len(seq.imu_t)} imu samples"
    )


def cmd_distort_to_euroc(args):
    """Rendered .npz sequence -> RAW distorted EuRoC-ASL directory: warps
    the virtual-camera (f=159.5 pinhole) frames out to the config's real
    640x480 fisheye camera. Chained with ``convert-euroc`` + ``run-vio``
    this exercises the FULL real-camera ingestion path (the analog of
    VioManager.cpp:183-198 feeding HomographyNet.cpp:127) on synthetic
    imagery: render -> KB-distort -> C++ undistort -> network + EKF."""
    from cuahn_vio.data.euroc import distort_frames_to_raw, write_euroc_dir
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45()
    )
    d = np.load(args.sequence)
    raw = distort_frames_to_raw(
        d["frames"],
        list(opts.cam_intrinsics), list(opts.cam_distortion),
        opts.cam_is_fisheye, raw_w=opts.cam_width, raw_h=opts.cam_height,
    )
    write_euroc_dir(
        args.out, raw, d["imu_t"], d["imu_w"], d["imu_a"], d["cam_t"]
    )
    print(
        f"wrote EuRoC dir {args.out}: {len(d['cam_t'])} raw "
        f"{opts.cam_width}x{opts.cam_height} frames"
    )


def cmd_train_uahn(args):
    import jax
    import jax.numpy as jnp

    from cuahn_vio.models.uahn import init_uahn
    from cuahn_vio.train import TrainConfig, train
    from cuahn_vio.utils.checkpoint import save_params
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45()
    )
    model, params = init_uahn(jax.random.PRNGKey(args.seed))
    if args.resume:
        from cuahn_vio.utils.checkpoint import load_params

        params = load_params(args.resume, params)
        print(f"resumed from {args.resume}")
    t = np.asarray(opts.t_imu_to_cam)
    c_rot_i = jnp.array(t[:3, :3], jnp.float32)
    i_t_i2c = jnp.array(-t[:3, :3].T @ t[:3, 3], jnp.float32)
    params = train(
        model, params, c_rot_i, i_t_i2c,
        TrainConfig(
            batch_size=args.batch_size, lr=args.lr,
            trans_sigma=args.trans_sigma, rot_sigma=args.rot_sigma,
            prior_noise_lo=args.prior_noise_lo,
            prior_noise_px=args.prior_noise_px,
            height_range=(args.height_min, args.height_max),
            tilt_sigma=args.tilt_sigma,
            use_textures=not args.no_textures,
            use_effects=not args.no_effects,
            exposure_frac_max=args.exposure_frac_max,
            max_flow_px=args.max_flow_px,
            echo_weight=args.echo_weight,
            big_baseline_prob=args.big_baseline_prob,
            traj_pair_prob=args.traj_pair_prob,
        ),
        steps=args.steps, seed=args.seed,
        checkpoint_path=args.out, save_every=args.save_every,
    )
    save_params(args.out, params)
    print(f"wrote weights -> {args.out}")


def cmd_calibrate_state_covariance(args):
    """Fit reported-covariance inflation factors from a logged run vs its
    state GT (eval/calibration.py fit_cov_inflation). Fit on a CALIBRATION
    sequence; pass the printed flag to run-vio on evaluation sequences."""
    from cuahn_vio.eval.calibration import fit_cov_inflation

    f = fit_cov_inflation(args.state_log, args.state_gt)
    print(f"fitted observable-NEES inflation factors: {f}")
    print(
        "run-vio flag:  --cov-calib "
        f"pos:{f['pos']:.3g},ori:{f['ori']:.3g},vel:{f['vel']:.3g}"
    )


def cmd_tune_filter(args):
    """Vmapped filter-parameter grid sweep over a logged measurement
    stream (eval/tuning.py): hundreds of full-sequence filter replays in
    one device launch. First-order (the prior feeds back into the
    network), so confirm winners with a real run-vio re-run."""
    import itertools
    import json as _json

    from cuahn_vio.eval.simulation import load_state_gt
    from cuahn_vio.eval.traj_io import load_pose_file
    from cuahn_vio.eval.tuning import (
        SweepConfig, replay_measurements, score_sweep,
    )
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45().apply_profile("calibrated")
    )
    d = np.load(args.sequence)
    log = np.load(args.state_log)

    def axis(spec, default):
        return [float(x) for x in spec.split(",")] if spec else [default]

    grid = [
        SweepConfig(
            k_net_cov=k, chi2_gate=g, q_scale=q, q_pos_extra=qp,
            bias_sigma_px=bs, bias_tau=bt,
            chi2_soft=(cs if cs > 0 else float("inf")), echo_beta=eb,
        )
        for k, g, q, qp, bs, bt, cs, eb in itertools.product(
            axis(args.k_net_cov, opts.up_linear_k_hnet_cov),
            axis(args.chi2_gate, opts.chi2_gate),
            axis(args.q_scale, opts.process_noise_scale),
            axis(args.q_pos_extra, opts.extra_position_noise),
            axis(args.bias_sigma_px, opts.meas_bias_sigma_px),
            axis(args.bias_tau, opts.meas_bias_tau),
            axis(args.chi2_soft, opts.chi2_soft),
            axis(args.echo_beta, opts.echo_beta),
        )
    ]
    print(f"sweeping {len(grid)} grid points...")
    base = opts.filter_params()
    net_mean, net_cov88 = log["net_mean"], log["net_cov88"]
    # run-vio logs one row per OUTPUT frame (including the init frame,
    # which carries no measurement); the replay steps over frame PAIRS.
    # Drop leading measurement-free rows until the counts line up.
    t_cam0 = log["times"][0] - opts.calib_camimu_dt  # logged t is IMU time
    # first logged output is the SECOND processed frame (scan steps are
    # image pairs, runner.py run_offline), so pairs = frames from fi on - 1
    # = frames from the first output index on
    n_pairs = len(d["cam_t"]) - int(
        np.searchsorted(d["cam_t"], t_cam0 - 1e-4)
    )
    while len(net_mean) > n_pairs and np.trace(net_cov88[0]) == 0:
        net_mean, net_cov88 = net_mean[1:], net_cov88[1:]
    outs, times = replay_measurements(
        d["imu_t"], d["imu_w"], d["imu_a"], d["cam_t"],
        net_mean, net_cov88, base, grid,
        opts.runner_options(), opts.vio_config(),
    )
    gt = load_pose_file(args.gt)
    state_gt = load_state_gt(args.state_gt) if args.state_gt else None
    rows = score_sweep(outs, times, gt.times, gt.poses, state_gt, grid)
    rows.sort(key=lambda r: r.get("ate_pos", float("inf")))
    for r in rows[: args.top]:
        print(_json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        print(f"wrote {len(rows)} rows -> {args.out}")


def cmd_train_fil(args):
    import jax
    import jax.numpy as jnp

    from cuahn_vio.models.uahn import init_uahn
    from cuahn_vio.train.fil import FilConfig, fil_finetune
    from cuahn_vio.utils.checkpoint import load_params, save_params
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45().apply_profile("calibrated")
    )
    model, params = init_uahn(jax.random.PRNGKey(args.seed))
    params = load_params(args.resume, params)
    print(f"resumed from {args.resume}")
    t = np.asarray(opts.t_imu_to_cam)
    c_rot_i = jnp.array(t[:3, :3], jnp.float32)
    i_t_i2c = jnp.array(-t[:3, :3].T @ t[:3, 3], jnp.float32)
    params = fil_finetune(
        model, params, opts.filter_params(), c_rot_i, i_t_i2c,
        FilConfig(window=args.window, batch_size=args.batch_size,
                  w_cons=args.w_cons),
        steps=args.steps, lr=args.lr, seed=args.seed,
        checkpoint_path=args.out, save_every=args.save_every,
        pair_step_every=args.pair_step_every,
    )
    save_params(args.out, params)
    print(f"wrote weights -> {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="cuahn-vio", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("error-singlerun", help="ATE/RPE/NEES of one run")
    s.add_argument("align", choices=["posyaw", "posyawsingle", "se3", "se3single", "sim3", "none"])
    s.add_argument("gt")
    s.add_argument("est")
    s.add_argument("--segments", default=None, help="comma list of RPE segment lengths (m)")
    s.set_defaults(fn=cmd_error_singlerun)

    s = sub.add_parser("error-dataset", help="ATE of all runs in a dir vs one GT")
    s.add_argument("align")
    s.add_argument("gt")
    s.add_argument("runs")
    s.set_defaults(fn=cmd_error_dataset)

    s = sub.add_parser("error-comparison", help="algos x datasets ATE matrix")
    s.add_argument("align")
    s.add_argument("gt_dir")
    s.add_argument("root")
    s.set_defaults(fn=cmd_error_comparison)

    s = sub.add_parser("plot-trajectories", help="xy plot of trajectories")
    s.add_argument("files", nargs="+")
    s.add_argument("--out", default="trajectories.png")
    s.set_defaults(fn=cmd_plot_trajectories)

    s = sub.add_parser(
        "plot-trackhist", help="corner-flow track history over a frame"
    )
    s.add_argument("sequence", help=".npz sequence (frames)")
    s.add_argument("state", help=".npz from run-vio --state-out")
    s.add_argument("--frame", type=int, default=None,
                   help="state-log row to highlight (default: last)")
    s.add_argument("--history", type=int, default=45,
                   help="how many past frames of flow to draw")
    s.add_argument("--out", default="trackhist.png")
    s.set_defaults(fn=cmd_plot_trackhist)

    s = sub.add_parser("format-converter", help="EuRoC csv <-> pose txt")
    s.add_argument("input")
    s.add_argument("output")
    s.set_defaults(fn=cmd_format_converter)

    s = sub.add_parser("timing-percentages", help="stage timing breakdown")
    s.add_argument("files", nargs="+")
    s.set_defaults(fn=cmd_timing_percentages)

    s = sub.add_parser("timing-flamegraph", help="stacked stage-time plot")
    s.add_argument("file")
    s.add_argument("--out", default="timing_flamegraph.png")
    s.set_defaults(fn=cmd_timing_flamegraph)

    s = sub.add_parser("timing-comparison", help="stage stats across runs")
    s.add_argument("files", nargs="+")
    s.set_defaults(fn=cmd_timing_comparison)

    s = sub.add_parser("align-trajectory", help="write GT aligned to an estimate")
    s.add_argument("gt")
    s.add_argument("est")
    s.add_argument("--method", default="posyaw",
                   choices=["posyaw", "se3", "sim3", "none"])
    s.add_argument("--out", default="aligned_gt.txt")
    s.set_defaults(fn=cmd_align_trajectory)

    s = sub.add_parser("watch-run", help="live xy plot of a growing estimate")
    s.add_argument("est", help="pose txt being written by run-vio")
    s.add_argument("--gt", default=None, help="GT pose txt to align+overlay")
    s.add_argument("--out", default="watch.png")
    s.add_argument("--method", default="posyaw",
                   choices=["posyaw", "se3", "sim3", "none"])
    s.add_argument("--interval", type=float, default=1.0, help="poll seconds")
    s.add_argument("--stale-ticks", type=int, default=10,
                   help="exit after this many polls without growth")
    s.add_argument("--max-ticks", type=int, default=0,
                   help="hard tick limit (0 = none)")
    s.set_defaults(fn=cmd_watch_run)

    s = sub.add_parser("error-simulation", help="state/bias errors + NEES vs sim GT")
    s.add_argument("est", help="state .npz from run-vio --state-out")
    s.add_argument("gt", help="17-column sim state GT txt")
    s.add_argument("--plot", default=None, help="write error/3-sigma plot PNG")
    s.set_defaults(fn=cmd_error_simulation)

    s = sub.add_parser(
        "distributed-selftest",
        help="multi-process sharded-workload checksums (jax.distributed)",
    )
    s.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (omit: single process)")
    s.add_argument("--num-processes", type=int, default=None)
    s.add_argument("--process-id", type=int, default=None)
    s.add_argument("--mesh-devices", type=int, default=None,
                   help="use only the first N global devices")
    s.add_argument("--bench", action="store_true",
                   help="timed throughput workload (scaling-efficiency "
                        "recipe) instead of the checksum workload")
    s.add_argument("--out", default=None, help="write the JSON line here")
    s.set_defaults(fn=cmd_distributed_selftest)

    s = sub.add_parser("pid-monitor", help="CPU/RSS monitor for a process")
    s.add_argument("pid", type=int)
    s.add_argument("--duration", type=float, default=10.0)
    s.add_argument("--interval", type=float, default=0.25)
    s.set_defaults(fn=cmd_pid_monitor)

    s = sub.add_parser("run-vio", help="run the VIO on a sequence")
    s.add_argument("sequence", help=".npz with imu_t/imu_w/imu_a/cam_t/frames")
    s.add_argument("--config", default=None)
    s.add_argument("--profile", choices=["launch", "calibrated"],
                   default=None,
                   help="named filter-tuning profile (utils/config.py "
                        "CALIBRATED_PROFILE). 'calibrated' is the "
                        "replay-calibrated shipped operating point; "
                        "'launch' is bit-identical uzhfpv.launch parity. "
                        "Default: calibrated when no --config is given; a "
                        "user --config is honored as-is unless a profile "
                        "is explicitly requested")
    s.add_argument("--weights", default=None)
    s.add_argument("--out", default="stamped_traj_estimate.txt")
    s.add_argument("--timing-out", default=None)
    s.add_argument("--state-out", default=None,
                   help=".npz with v/biases/cov diag for error-simulation")
    s.add_argument("--odom-out", default=None,
                   help="FRD odometry txt (visualize_odometry analog)")
    s.add_argument("--no-network", action="store_true", help="dead reckoning")
    s.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv towers (~2x faster inference)")
    s.add_argument("--init-height", type=float, default=None,
                   help="override init_height (meters over the plane; the "
                        "launch files set this per dataset, uzhfpv.launch:66)")
    s.add_argument("--init-imu-thresh", type=float, default=None)
    s.add_argument("--calib-dt", type=float, default=None)
    s.add_argument("--k-net-cov", type=float, default=None,
                   help="measurement-cov temperature override "
                        "(calibrate-covariance suggests this)")
    s.add_argument("--chi2-gate", type=float, default=None,
                   help="innovation chi2 rejection threshold override")
    s.add_argument("--iekf", type=int, default=None,
                   help="IEKF iterations override (max_IEKF_iteration, "
                        "uzhfpv.launch:67)")
    s.add_argument("--no-prior", action="store_true",
                   help="run all 4 network blocks instead of the EKF-prior "
                        "cascade (use_prior=false, uzhfpv.launch:58)")
    s.add_argument("--q-scale", type=float, default=None,
                   help="process-noise variance multiplier override "
                        "(VioOptions.process_noise_scale)")
    s.add_argument("--q-pos-extra", type=float, default=None,
                   help="extra position process noise override "
                        "(Propagator.h:97 analog, default 1e-4)")
    s.add_argument("--bias-sigma-px", type=float, default=None,
                   help="OU measurement-bias stationary sigma in pixels "
                        "(0 disables the 8-state augmentation; "
                        "filter/state.py FilterState)")
    s.add_argument("--bias-tau", type=float, default=None,
                   help="OU measurement-bias correlation time, seconds")
    s.add_argument("--seed", type=int, default=0,
                   help="MC-dropout PRNG seed (the headline number's "
                        "dropout-seed sensitivity is ~±0.01 m)")
    s.add_argument("--cov-calib", default=None,
                   help="reported-covariance calibration factors, e.g. "
                        "'pos:5.1,ori:3.4,vel:8.7' (fit with "
                        "calibrate-state-covariance on a CALIBRATION "
                        "sequence; output covariance only, gains untouched)")
    s.add_argument("--chi2-soft", type=float, default=None,
                   help="soft innovation threshold for adaptive "
                        "measurement-cov inflation (0 disables)")
    s.add_argument("--echo-beta", type=float, default=None,
                   help="prior-echo fraction of the prior-mode network "
                        "(FilterParams.echo_beta; 0 = echo-blind)")
    s.set_defaults(fn=cmd_run_vio)

    s = sub.add_parser(
        "calibrate-covariance",
        help="fit k_net_cov from a run-vio --state-out log",
    )
    s.add_argument("state", help=".npz from run-vio --state-out")
    s.add_argument("--target-median", type=float, default=7.3441,
                   help="target innovation chi2 median (8-DoF ideal)")
    s.set_defaults(fn=cmd_calibrate_covariance)

    s = sub.add_parser("make-synthetic", help="generate a synthetic sequence")
    s.add_argument("--out", default="synthetic_seq.npz")
    s.add_argument("--duration", type=float, default=20.0)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--sigma-w", type=float, default=0.0)
    s.add_argument("--sigma-a", type=float, default=0.0)
    s.add_argument("--bias-g", type=float, default=0.0)
    s.add_argument("--bias-a", type=float, default=0.0)
    s.add_argument("--config", default=None)
    s.add_argument("--traj-file", default=None,
                   help="drive a B-spline from a '# t x y z qx qy qz qw' txt")
    s.add_argument("--spline-dt", type=float, default=0.5)
    s.add_argument("--traj-z-offset", type=float, default=0.0,
                   help="vertical shift when replaying a mocap trajectory "
                        "over the z=0 ground plane")
    s.add_argument("--texture", choices=["none", "train", "heldout"],
                   default="none",
                   help="ground imagery: procedural sinusoids (none), or a "
                        "photo from the texture bank's train/held-out split "
                        "(held-out photos are never seen during training)")
    s.add_argument("--texture-pick", type=int, default=None,
                   help="index into the chosen split (default: seed)")
    s.add_argument("--tex-scale", type=float, default=4.0,
                   help="metres per texture period")
    s.add_argument("--exposure-ms", type=float, default=0.0,
                   help="camera exposure time; > 0 adds physical motion blur")
    s.add_argument("--effects", action="store_true",
                   help="sensor-effect chain: vignette, exposure drift, "
                        "defocus, shot+read noise")
    s.set_defaults(fn=cmd_make_synthetic)

    s = sub.add_parser(
        "eval-flow", help="network flow error vs oracle (filter-independent)"
    )
    s.add_argument("sequence", help=".npz sequence (frames + cam_t)")
    s.add_argument("state_gt", help="simulator state GT txt (17-col)")
    s.add_argument("--weights", required=True)
    s.add_argument("--config", default=None)
    s.add_argument("--prior", choices=["none", "gt", "noisy"], default="gt",
                   help="prior fed to the cascade: none = all 4 blocks, "
                        "gt = oracle flow, noisy = oracle + 2 px noise")
    s.add_argument("--batch", type=int, default=16)
    s.add_argument("--limit", type=int, default=0)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--flow-cap", type=float, default=80.0,
                   help="px bound of the non-degenerate measurement regime")
    s.add_argument("--out", default=None, help="optional .npz dump")
    s.set_defaults(fn=cmd_eval_flow)

    s = sub.add_parser("close-loops", help="UAHN loop factors for a run")
    s.add_argument("sequence", help=".npz sequence (frames)")
    s.add_argument("state", help="state .npz from run-vio --state-out")
    s.add_argument("--weights", required=True)
    s.add_argument("--config", default=None)
    s.add_argument("--out", default="loops.txt")
    s.add_argument("--min-dt", type=float, default=3.0)
    s.add_argument("--max-dist", type=float, default=1.0)
    s.add_argument("--stride", type=int, default=5)
    s.add_argument("--max-pairs", type=int, default=32)
    s.add_argument("--max-sigma-px", type=float, default=4.0,
                   help="confidence gate: drop factors whose mean network "
                        "corner sigma exceeds this (survivors carry their "
                        "own per-factor sigma, so a looser gate only adds "
                        "weakly-weighted factors)")
    s.add_argument("--max-prior-px", type=float, default=50.0,
                   help="geometric gate: skip pairs whose predicted corner "
                        "flow exceeds the network's training regime")
    s.set_defaults(fn=cmd_close_loops)

    s = sub.add_parser("smooth-trajectory", help="pose-graph smoothing of a run")
    s.add_argument("est", help="pose txt to smooth")
    s.add_argument("--out", default="smoothed.txt")
    s.add_argument("--loops", default=None, help="loop pairs 'a:b,c:d'")
    s.add_argument("--loops-file", default=None,
                   help="factor file from close-loops")
    s.add_argument("--iters", type=int, default=10)
    s.add_argument("--sigma-dp", type=float, default=0.02)
    s.add_argument("--sigma-dth", type=float, default=0.01)
    s.add_argument("--loop-sigma-dp", type=float, default=None)
    s.add_argument("--loop-sigma-dth", type=float, default=None)
    s.add_argument("--huber", type=float, default=0.0,
                   help="IRLS robust threshold (redescending Cauchy kernel) "
                        "on the whitened per-factor residual norm, in sigmas "
                        "(0 = plain least squares); drives confident-outlier "
                        "loop factors to ~zero weight")
    s.add_argument("--loop-sigma-scale", type=float, default=1.0,
                   help="multiply per-factor loop sigmas (col 10) by this "
                        "calibration factor")
    s.add_argument("--mesh", action="store_true",
                   help="block-partitioned Schur solve over all devices")
    s.set_defaults(fn=cmd_smooth_trajectory)

    s = sub.add_parser("run-vio-batch", help="many sequences, mesh-sharded")
    s.add_argument("sequences", nargs="+", help=".npz sequence files")
    s.add_argument("--out-dir", default="batch_out")
    s.add_argument("--config", default=None)
    s.add_argument("--profile", choices=["launch", "calibrated"],
                   default=None)
    s.add_argument("--weights", default=None)
    s.add_argument("--no-network", action="store_true")
    s.add_argument("--mesh", action="store_true",
                   help="shard the batch over all visible devices")
    s.add_argument("--init-height", type=float, default=None)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_run_vio_batch)

    s = sub.add_parser("inspect-frame", help="network diagnostics on one frame pair")
    s.add_argument("sequence", help=".npz sequence")
    s.add_argument("--frame", type=int, default=0)
    s.add_argument("--weights", default=None)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--out", default="inspect_frame.png")
    s.set_defaults(fn=cmd_inspect_frame)

    s = sub.add_parser(
        "track-features", help="sparse KLT tracking demo (test_tracking parity)"
    )
    s.add_argument("sequence", help=".npz sequence")
    s.add_argument("--out", default="tracks.npz")
    s.add_argument("--grid-y", type=int, default=8)
    s.add_argument("--grid-x", type=int, default=10)
    s.add_argument("--max-frames", type=int, default=None)
    s.set_defaults(fn=cmd_track_features)

    s = sub.add_parser("convert-euroc", help="EuRoC-ASL dir -> sequence .npz")
    s.add_argument("root", help="dataset root containing mav0/")
    s.add_argument("--out", default="sequence.npz")
    s.add_argument("--config", default=None)
    s.add_argument("--max-frames", type=int, default=None)
    s.set_defaults(fn=cmd_convert_euroc)

    s = sub.add_parser(
        "distort-to-euroc",
        help="rendered .npz -> RAW distorted EuRoC dir (full-chain tests)",
    )
    s.add_argument("sequence", help=".npz from make-synthetic")
    s.add_argument("--out", required=True, help="EuRoC root dir to create")
    s.add_argument("--config", default=None)
    s.set_defaults(fn=cmd_distort_to_euroc)

    s = sub.add_parser("train-uahn", help="train network weights from scratch")
    s.add_argument("--out", default="uahn_weights.msgpack")
    s.add_argument("--steps", type=int, default=2000)
    s.add_argument("--batch-size", type=int, default=16)
    s.add_argument("--lr", type=float, default=2e-4)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--save-every", type=int, default=250)
    s.add_argument("--config", default=None)
    s.add_argument("--resume", default=None,
                   help="continue from an existing weights checkpoint")
    s.add_argument("--trans-sigma", type=float, default=0.06,
                   help="inter-frame translation sigma (m)")
    s.add_argument("--rot-sigma", type=float, default=0.025)
    s.add_argument("--prior-noise-px", type=float, default=3.0)
    s.add_argument("--height-min", type=float, default=0.8,
                   help="camera height range sampled during training (m); "
                        "flow magnitude scales as translation/height, so the "
                        "low end controls the hardest samples")
    s.add_argument("--height-max", type=float, default=3.0)
    s.add_argument("--tilt-sigma", type=float, default=0.12,
                   help="absolute roll/pitch sigma (rad); large values "
                        "include near-horizon views with little ground texture")
    s.add_argument("--no-textures", action="store_true",
                   help="disable the real-photo texture bank (round-1 "
                        "procedural sinusoid ground)")
    s.add_argument("--no-effects", action="store_true",
                   help="disable sensor-effect augmentation (vignette, "
                        "exposure, noise, defocus, motion blur)")
    s.add_argument("--exposure-frac-max", type=float, default=0.5,
                   help="max motion-blur exposure, fraction of frame dt")
    s.add_argument("--max-flow-px", type=float, default=80.0,
                   help="samples with corner flow beyond this are masked")
    s.add_argument("--prior-noise-lo", type=float, default=1.0,
                   help="low end of the log-uniform simulated-prior noise "
                        "sigma range (px)")
    s.add_argument("--echo-weight", type=float, default=0.0,
                   help="prior-echo decorrelation penalty weight "
                        "(TrainConfig.echo_weight; round 5)")
    s.add_argument("--big-baseline-prob", type=float, default=0.0,
                   help="fraction of samples with stretched translation "
                        "(loop-closure 100-250 px flow curriculum)")
    s.add_argument("--traj-pair-prob", type=float, default=0.7,
                   help="fraction of samples drawn from the real-flight "
                        "pose-pair bank (data/trajpairs.py)")
    s.set_defaults(fn=cmd_train_uahn)

    s = sub.add_parser(
        "calibrate-state-covariance",
        help="fit reported-covariance NEES calibration factors from a "
             "logged run (apply via run-vio --cov-calib)",
    )
    s.add_argument("state_log", help="run-vio --state-out npz")
    s.add_argument("state_gt", help="17-col sim state GT txt")
    s.set_defaults(fn=cmd_calibrate_state_covariance)

    s = sub.add_parser(
        "tune-filter",
        help="vmapped filter-parameter grid sweep over a logged "
             "measurement stream (eval/tuning.py)",
    )
    s.add_argument("sequence", help=".npz sequence the log came from")
    s.add_argument("state_log", help="run-vio --state-out npz")
    s.add_argument("gt", help="ground-truth pose txt")
    s.add_argument("--state-gt", default=None, help="17-col sim state GT")
    s.add_argument("--config", default=None)
    s.add_argument("--k-net-cov", default=None,
                   help="comma list, e.g. 4,7.9,12")
    s.add_argument("--chi2-gate", default=None)
    s.add_argument("--q-scale", default=None)
    s.add_argument("--q-pos-extra", default=None)
    s.add_argument("--bias-sigma-px", default=None)
    s.add_argument("--bias-tau", default=None)
    s.add_argument("--chi2-soft", default=None)
    s.add_argument("--echo-beta", default=None)
    s.add_argument("--top", type=int, default=10)
    s.add_argument("--out", default=None, help="write all rows (jsonl)")
    s.set_defaults(fn=cmd_tune_filter)

    s = sub.add_parser(
        "train-fil",
        help="filter-in-the-loop fine-tune: optimize weights through the "
             "deployed EKF scan on real-trajectory windows (train/fil.py)",
    )
    s.add_argument("--resume", required=True,
                   help="weights checkpoint to fine-tune")
    s.add_argument("--out", default="uahn_fil.msgpack")
    s.add_argument("--steps", type=int, default=2000)
    s.add_argument("--window", type=int, default=6)
    s.add_argument("--batch-size", type=int, default=4)
    s.add_argument("--lr", type=float, default=2e-5)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--save-every", type=int, default=200)
    s.add_argument("--pair-step-every", type=int, default=2,
                   help="interleave a standard single-pair training step "
                        "every N steps (NLL anchor for the cov head); "
                        "0 disables")
    s.add_argument("--w-cons", type=float, default=0.0,
                   help="filter-consistency (NEES) penalty weight "
                        "(FilConfig.w_cons)")
    s.add_argument("--config", default=None)
    s.set_defaults(fn=cmd_train_fil)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
