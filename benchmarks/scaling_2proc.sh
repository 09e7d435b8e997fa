#!/usr/bin/env bash
# Scaling-efficiency measurement recipe (BASELINE.md: >= 80 % at N >= 2).
#
# Runs the timed sequence-sharded filter workload on (a) one process owning
# the whole mesh and (b) two jax.distributed processes each owning half,
# and reports eff = throughput_2proc / throughput_1proc. On real N-host
# hardware, run one invocation per host with the coordinator on host 0 and
# JAX_PLATFORMS unset (TPU); the ratio is the BASELINE.md number. On this
# single machine it exercises the full cross-process collective path
# (Gloo) but shares the same cores, so treat the printed efficiency as a
# mechanism check, not a hardware measurement.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS="" PYTHONPATH="$PWD"
PORT=${PORT:-29531}
OUT=${1:-/tmp/scaling}
mkdir -p "$OUT"

echo "== 1 process, 8 devices =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m cuahn_vio.cli distributed-selftest --bench --out "$OUT/p1.json"

echo "== 2 processes, 4+4 devices =="
XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python -m cuahn_vio.cli distributed-selftest --bench \
  --coordinator 127.0.0.1:$PORT --num-processes 2 --process-id 0 \
  --out "$OUT/p2.json" &
W0=$!
XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python -m cuahn_vio.cli distributed-selftest --bench \
  --coordinator 127.0.0.1:$PORT --num-processes 2 --process-id 1 >/dev/null &
W1=$!
wait $W0 $W1

python - "$OUT" <<'EOF'
import json, sys
o = sys.argv[1]
p1 = json.load(open(f"{o}/p1.json"))
p2 = json.load(open(f"{o}/p2.json"))
f1, f2 = p1["bench_frames_per_s"], p2["bench_frames_per_s"]
print(f"1-proc: {f1:.0f} frames/s   2-proc: {f2:.0f} frames/s")
print(f"same-total-devices efficiency (2 proc vs 1): {100*f2/f1:.1f} %")
EOF
