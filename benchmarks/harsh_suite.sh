#!/usr/bin/env bash
# 4-sequence harsh suite: adversarial bias draws, held-out photo
# textures, motion blur + sensor effects. Reports VIO vs dead-reckoning
# ATE per sequence — the round-2 bar is >= 2.5x mean gain (VERDICT #1),
# restated round 5 as MEAN OVER SEEDS (VERDICT r4 #4: one seed is
# fragile evidence; a per-sequence gain near 1x can be a benign bias
# draw for dead-reckoning rather than a VIO failure).
#
# Usage: harsh_suite.sh [out_dir] [weights] [seeds]
#   seeds: space-separated list, default "1 2 3" (use "1" for the quick
#   round-4-compatible single-seed run)
set -euo pipefail
cd "$(dirname "$0")/.."
REF=/root/reference/cuahn_ros/ov_data/uzh_fpv
OUT=${1:-/tmp/harsh_suite}
WEIGHTS=${2:-weights/uahn_fil_v10.msgpack}
SEEDS=${3:-"1 2 3"}
mkdir -p "$OUT"

SEQS="indoor_45_2 indoor_45_4 indoor_45_9 indoor_forward_5"
for seed in $SEEDS; do
  pick=0
  for s in $SEQS; do
    d="$OUT/s${seed}/$s"
    mkdir -p "$d"
    python -m cuahn_vio.cli make-synthetic --out "$d/replay.npz" --duration 15 \
      --seed "$seed" --traj-file "$REF/${s}_snapdragon_with_gt.txt" \
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
done

echo
echo "== harsh suite (seeds: $SEEDS; held-out textures, degradations on) =="
python - "$OUT" "$SEEDS" <<'EOF'
import subprocess, sys

out, seeds = sys.argv[1], sys.argv[2].split()
seqs = ["indoor_45_2", "indoor_45_4", "indoor_45_9", "indoor_forward_5"]


def ate(gt, est):
    r = subprocess.run(
        [sys.executable, "-m", "cuahn_vio.cli", "error-singlerun", "se3", gt, est],
        capture_output=True, text=True,
    )
    for line in r.stdout.splitlines():
        if "pos: rmse" in line:
            return float(line.split()[2])
    raise RuntimeError(f"no ATE in output for {est}")


import statistics as st

all_gains = []
for s in seqs:
    gains, vio, dr = [], [], []
    for seed in seeds:
        d = f"{out}/s{seed}/{s}"
        g, e, e0 = f"{d}/replay_gt.txt", f"{d}/est.txt", f"{d}/est_dr.txt"
        v, r = ate(g, e), ate(g, e0)
        vio.append(v); dr.append(r); gains.append(r / v)
    m = st.mean(gains)
    sd = st.stdev(gains) if len(gains) > 1 else 0.0
    all_gains.append(m)
    print(f"{s}: VIO {st.mean(vio):.3f}±{(st.stdev(vio) if len(vio)>1 else 0):.3f} m | "
          f"DR {st.mean(dr):.3f}±{(st.stdev(dr) if len(dr)>1 else 0):.3f} m | "
          f"gain {m:.2f}±{sd:.2f}x  (per-seed: "
          + ", ".join(f"{g:.2f}" for g in gains) + ")")
print(f"MEAN GAIN over sequences x seeds: {st.mean(all_gains):.2f}x "
      f"(bar: >= 2.5x)")
EOF
