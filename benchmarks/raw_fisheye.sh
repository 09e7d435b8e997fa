#!/usr/bin/env bash
# Full raw-fisheye ingestion chain WITH the network (VERDICT r2 #6): the
# closest available analog of the reference's real-camera path
# (VioManager.cpp:183-198 -> HomographyNet.cpp:127).
#
#   render (textured, degraded) -> KB-distort to 640x480 raw fisheye ->
#   EuRoC dir -> convert-euroc (C++ undistort remap) -> run-vio with
#   weights -> ATE vs dead-reckoning
#
# The distortion synthesis (jax Newton fixed-point, vision/camera.py) and
# the ingest undistortion (C++ Newton + remap, runtime/undistort.cpp) are
# independent implementations, so imagery surviving the round trip is a
# real cross-check, not an identity.
#
# Usage: raw_fisheye.sh [out_dir] [weights]
#
# run-vio runs the shipped calibrated profile by default (utils/config.py
# CALIBRATED_PROFILE; --profile launch restores uzhfpv.launch parity).
set -euo pipefail
cd "$(dirname "$0")/.."
GT=/root/reference/cuahn_ros/ov_data/uzh_fpv/indoor_45_2_snapdragon_with_gt.txt
OUT=${1:-/tmp/raw_fisheye}
WEIGHTS=${2:-weights/uahn_fil_v10.msgpack}
mkdir -p "$OUT"

python -m cuahn_vio.cli make-synthetic --out "$OUT/virt.npz" --duration 12 \
  --traj-file "$GT" --spline-dt 0.1 --traj-z-offset 1.7 \
  --sigma-w 0.002 --sigma-a 0.02 --bias-g 0.003 --bias-a 0.02 \
  --texture heldout --texture-pick 1 --tex-scale 4.0 --exposure-ms 8 --effects

python -m cuahn_vio.cli distort-to-euroc "$OUT/virt.npz" --out "$OUT/euroc" \
  --config "$OUT/virt_config.yaml"
python -m cuahn_vio.cli convert-euroc "$OUT/euroc" --out "$OUT/raw_chain.npz" \
  --config "$OUT/virt_config.yaml"

echo "== dead-reckoning (IMU only) =="
python -m cuahn_vio.cli run-vio "$OUT/raw_chain.npz" \
  --config "$OUT/virt_config.yaml" --no-network --out "$OUT/est_dr.txt"
python -m cuahn_vio.cli error-singlerun se3 "$OUT/virt_gt.txt" "$OUT/est_dr.txt" \
  | grep -E "pos: rmse|matched"

echo "== CUAHN-VIO on the distort->undistort imagery ($WEIGHTS) =="
# shipped reported-covariance calibration (results/round5/cov_calib/) —
# same factors as textured_replay.sh, applied unchanged
COV_CALIB="pos:5.78,ori:2.21,vel:6.61"
python -m cuahn_vio.cli run-vio "$OUT/raw_chain.npz" \
  --config "$OUT/virt_config.yaml" --weights "$WEIGHTS" \
  --cov-calib "$COV_CALIB" \
  --out "$OUT/est.txt" --state-out "$OUT/state.npz"
python -m cuahn_vio.cli error-singlerun se3 "$OUT/virt_gt.txt" "$OUT/est.txt" \
  | grep -E "pos: rmse|matched"
python -m cuahn_vio.cli error-simulation "$OUT/state.npz" "$OUT/virt_state_gt.txt"
