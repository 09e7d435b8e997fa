"""Command-line tools: the ov_eval binaries + the VIO app, one entry point.

Replaces (SURVEY.md §2.5-2.6, ov_eval/CMakeLists.txt:99-132):
- run_subscribe_cuahn + pose_to_file -> ``run-vio`` (runs a sequence, writes
  the stamped trajectory txt and optional timing csv)
- error_singlerun.cpp                -> ``error-singlerun``
- error_dataset.cpp                  -> ``error-dataset``
- error_comparison.cpp               -> ``error-comparison``
- plot_trajectories.cpp              -> ``plot-trajectories``
- format_converter.cpp               -> ``format-converter``
- timing_percentages/comparison.cpp  -> ``timing-percentages``
- (new) ``train-uahn``               -> produces network weights (the
  reference ships none) and ``make-synthetic`` -> dataset files.

Usage: ``python -m cuahn_vio.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

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

    if args.sequence.endswith(".npz"):
        d = np.load(args.sequence)
        imu_t, imu_w, imu_a = d["imu_t"], d["imu_w"], d["imu_a"]
        cam_t, frames = d["cam_t"], d["frames"]
    else:
        raise SystemExit(
            "expected an .npz sequence file with imu_t/imu_w/imu_a/cam_t/frames "
            "(use 'make-synthetic' or the dataset converter)"
        )

    model, params = init_uahn(
        jax.random.PRNGKey(0), blocks_to_run=opts.blocks_to_run
    )
    if opts.network_weights_path or args.weights:
        params = load_params(args.weights or opts.network_weights_path, params)
    if args.no_network:
        model, params = None, None

    runner = run_stepwise if args.timing_out else run_offline
    res = runner(
        imu_t, imu_w, imu_a, cam_t, frames,
        model, params, opts.filter_params(), opts.vio_config(),
        opts.runner_options(),
    )
    save_pose_file(args.out, res.times, res.pose_w, res.cov_ori, res.cov_pos)
    print(f"wrote {len(res.times)} poses -> {args.out}")
    if args.timing_out and res.stage_ms is not None:
        save_timing_file(args.timing_out, res.times, res.stage_ms)
        print(f"wrote timing -> {args.timing_out}")


def cmd_make_synthetic(args):
    from cuahn_vio.data.synthetic import AnalyticTrajectory, make_sequence
    from cuahn_vio.eval import save_pose_file
    from cuahn_vio.utils.config import VioOptions

    opts = (
        VioOptions.from_yaml(args.config)
        if args.config
        else VioOptions.uzhfpv_indoor45()
    )
    traj = AnalyticTrajectory()
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
    )
    np.savez_compressed(
        args.out,
        imu_t=seq.imu_t, imu_w=seq.imu_w, imu_a=seq.imu_a,
        cam_t=seq.cam_t, frames=seq.frames,
    )
    gt_path = os.path.splitext(args.out)[0] + "_gt.txt"
    save_pose_file(gt_path, seq.gt_times, seq.gt_pose_w)
    print(f"wrote {args.out} and {gt_path}")


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
    t = np.asarray(opts.t_imu_to_cam)
    c_rot_i = jnp.array(t[:3, :3], jnp.float32)
    i_t_i2c = jnp.array(-t[:3, :3].T @ t[:3, 3], jnp.float32)
    params = train(
        model, params, c_rot_i, i_t_i2c,
        TrainConfig(batch_size=args.batch_size, lr=args.lr),
        steps=args.steps, seed=args.seed,
        checkpoint_path=args.out, save_every=args.save_every,
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

    s = sub.add_parser("format-converter", help="EuRoC csv <-> pose txt")
    s.add_argument("input")
    s.add_argument("output")
    s.set_defaults(fn=cmd_format_converter)

    s = sub.add_parser("timing-percentages", help="stage timing breakdown")
    s.add_argument("files", nargs="+")
    s.set_defaults(fn=cmd_timing_percentages)

    s = sub.add_parser("run-vio", help="run the VIO on a sequence")
    s.add_argument("sequence", help=".npz with imu_t/imu_w/imu_a/cam_t/frames")
    s.add_argument("--config", default=None)
    s.add_argument("--weights", default=None)
    s.add_argument("--out", default="stamped_traj_estimate.txt")
    s.add_argument("--timing-out", default=None)
    s.add_argument("--no-network", action="store_true", help="dead reckoning")
    s.set_defaults(fn=cmd_run_vio)

    s = sub.add_parser("make-synthetic", help="generate a synthetic sequence")
    s.add_argument("--out", default="synthetic_seq.npz")
    s.add_argument("--duration", type=float, default=20.0)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--sigma-w", type=float, default=0.0)
    s.add_argument("--sigma-a", type=float, default=0.0)
    s.add_argument("--bias-g", type=float, default=0.0)
    s.add_argument("--bias-a", type=float, default=0.0)
    s.add_argument("--config", default=None)
    s.set_defaults(fn=cmd_make_synthetic)

    s = sub.add_parser("train-uahn", help="train network weights from scratch")
    s.add_argument("--out", default="uahn_weights.msgpack")
    s.add_argument("--steps", type=int, default=2000)
    s.add_argument("--batch-size", type=int, default=16)
    s.add_argument("--lr", type=float, default=2e-4)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--save-every", type=int, default=250)
    s.add_argument("--config", default=None)
    s.set_defaults(fn=cmd_train_uahn)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
