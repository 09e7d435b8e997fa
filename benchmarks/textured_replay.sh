#!/usr/bin/env bash
# Held-out textured replay benchmark: the round-2 imagery-realism bar.
#
# Renders the REAL indoor_45_2 flight trajectory (the reference's shipped
# UZH-FPV GT, up to 7 m/s) over a HELD-OUT photo ground texture — one the
# trainer never saw (data/textures.py heldout split) — with the full
# sensor-degradation chain on: physical motion blur (8 ms exposure),
# vignette, exposure drift, defocus, shot+read noise. This is the closest
# reproducible proxy for the reference's real-camera validation
# (VioManager.cpp:183-188) that a rosbag-free image allows.
#
# Usage: textured_replay.sh [out_dir] [weights]
# Pass bar (VERDICT round 1): ATE pos <= 0.33 m (BASELINE.md).
set -euo pipefail
cd "$(dirname "$0")/.."
GT=/root/reference/cuahn_ros/ov_data/uzh_fpv/indoor_45_2_snapdragon_with_gt.txt
OUT=${1:-/tmp/textured_replay}
WEIGHTS=${2:-weights/uahn_fil_v10.msgpack}
mkdir -p "$OUT"

python -m cuahn_vio.cli make-synthetic --out "$OUT/replay.npz" --duration 20 \
  --traj-file "$GT" --spline-dt 0.1 --traj-z-offset 1.7 \
  --sigma-w 0.002 --sigma-a 0.02 --bias-g 0.003 --bias-a 0.02 \
  --texture heldout --tex-scale 4.0 --exposure-ms 8 --effects

echo "== dead-reckoning (IMU only) =="
python -m cuahn_vio.cli run-vio "$OUT/replay.npz" \
  --config "$OUT/replay_config.yaml" --no-network --out "$OUT/est_dr.txt"
python -m cuahn_vio.cli error-singlerun se3 "$OUT/replay_gt.txt" "$OUT/est_dr.txt" \
  | grep -A3 "Absolute" | head -4

echo "== CUAHN-VIO ($WEIGHTS) =="
# Reported-covariance calibration (round 5): observable-NEES inflation
# factors fit with calibrate-state-covariance on a 3-sequence CALIBRATION
# set (indoor_45_12 / indoor_forward_3 / indoor_45_13 replays — train-side
# trajectories, benchmark sequences excluded; geometric mean of the
# per-sequence fits; results/round5/cov_calib/). Scales the OUTPUT
# covariance only — the filter's internal gain path is untouched
# (eval/calibration.py fit_cov_inflation docstring has the why).
COV_CALIB="pos:5.78,ori:2.21,vel:6.61"
python -m cuahn_vio.cli run-vio "$OUT/replay.npz" \
  --config "$OUT/replay_config.yaml" \
  --weights "$WEIGHTS" \
  --cov-calib "$COV_CALIB" \
  --out "$OUT/est.txt" --state-out "$OUT/state.npz" \
  --timing-out "$OUT/timing.txt"

python -m cuahn_vio.cli error-singlerun se3 "$OUT/replay_gt.txt" "$OUT/est.txt"
python -m cuahn_vio.cli error-simulation "$OUT/state.npz" "$OUT/replay_state_gt.txt"
