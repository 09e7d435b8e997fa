#!/usr/bin/env bash
# 4-sequence harsh suite: adversarial bias draw (seed 1), held-out photo
# textures, motion blur + sensor effects. Reports VIO vs dead-reckoning
# ATE per sequence — the round-2 bar is >= 2.5x mean gain (VERDICT #1).
#
# Usage: harsh_suite.sh [out_dir] [weights]
set -euo pipefail
cd "$(dirname "$0")/.."
REF=/root/reference/cuahn_ros/ov_data/uzh_fpv
OUT=${1:-/tmp/harsh_suite}
WEIGHTS=${2:-weights/uahn_tex_v6.msgpack}
mkdir -p "$OUT"

SEQS="indoor_45_2 indoor_45_4 indoor_45_9 indoor_forward_5"
pick=0
for s in $SEQS; do
  d="$OUT/$s"
  mkdir -p "$d"
  python -m cuahn_vio.cli make-synthetic --out "$d/replay.npz" --duration 15 \
    --seed 1 --traj-file "$REF/${s}_snapdragon_with_gt.txt" \
    --spline-dt 0.1 --traj-z-offset 1.7 \
    --sigma-w 0.002 --sigma-a 0.02 --bias-g 0.003 --bias-a 0.02 \
    --texture heldout --texture-pick $pick --tex-scale 4.0 \
    --exposure-ms 8 --effects
  pick=$((pick + 1))
  python -m cuahn_vio.cli run-vio "$d/replay.npz" \
    --config "$d/replay_config.yaml" --no-network --out "$d/est_dr.txt"
  python -m cuahn_vio.cli run-vio "$d/replay.npz" \
    --config "$d/replay_config.yaml" --weights "$WEIGHTS" --out "$d/est.txt"
done

echo
echo "== harsh suite (seed 1, held-out textures, degradations on) =="
for s in $SEQS; do
  d="$OUT/$s"
  dr=$(python -m cuahn_vio.cli error-singlerun se3 "$d/replay_gt.txt" "$d/est_dr.txt" 2>/dev/null | grep "pos: rmse" | head -1 | awk '{print $3}')
  net=$(python -m cuahn_vio.cli error-singlerun se3 "$d/replay_gt.txt" "$d/est.txt" 2>/dev/null | grep "pos: rmse" | head -1 | awk '{print $3}')
  gain=$(python -c "print(f'{$dr/$net:.2f}')")
  echo "$s: VIO $net m | dead-reckoning $dr m | gain ${gain}x"
done
