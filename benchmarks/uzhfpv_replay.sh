#!/usr/bin/env bash
# UZH-FPV trajectory-replay benchmark: renders a synthetic planar-ground
# sequence along the REAL indoor_45_2 flight trajectory (the reference's
# shipped GT, 79 m / 20 s at up to 7 m/s), runs the full VIO, and scores
# ATE. The real rosbags are not redistributable; this replay keeps the
# exact flight dynamics while making the imagery reproducible.
set -euo pipefail
cd "$(dirname "$0")/.."
GT=/root/reference/cuahn_ros/ov_data/uzh_fpv/indoor_45_2_snapdragon_with_gt.txt
OUT=${1:-/tmp/uzh_replay}
mkdir -p "$OUT"

python -m cuahn_vio.cli make-synthetic --out "$OUT/replay.npz" --duration 20 \
  --traj-file "$GT" --spline-dt 0.1 --traj-z-offset 1.7 \
  --sigma-w 0.002 --sigma-a 0.02 --bias-g 0.003 --bias-a 0.02

python -m cuahn_vio.cli run-vio "$OUT/replay.npz" \
  --config "$OUT/replay_config.yaml" \
  --weights weights/uahn_fil_v10.msgpack \
  --out "$OUT/est.txt" --state-out "$OUT/state.npz" \
  --timing-out "$OUT/timing.txt"

python -m cuahn_vio.cli error-singlerun se3 "$OUT/replay_gt.txt" "$OUT/est.txt"
python -m cuahn_vio.cli error-simulation "$OUT/state.npz" "$OUT/replay_state_gt.txt"
python -m cuahn_vio.cli timing-percentages "$OUT/timing.txt"
