#!/usr/bin/env bash
# Multi-process scaling measurement, stated as COLLECTIVE OVERHEAD
# (VERDICT r3 #8): fixed work per device, same per-process device count.
#
#   (a) 1 process owning a 4-device mesh, batch 4  (no cross-process comm)
#   (b) 2 jax.distributed processes, 4 devices each, global batch 8 —
#       identical per-device work; every timed rep ends in a replicated
#       scalar metric whose reduction crosses the process boundary (Gloo),
#       exactly like sharded-eval metric aggregation.
#
# overhead = 1 - perdev_fps(b) / perdev_fps(a). On real N-host TPU
# hardware this is the DCN/ICI collective cost; BASELINE.md's >=80 %
# scaling efficiency corresponds to overhead <= 20 %. On this single
# 2-core CPU host the two processes also contend for cores, so the printed
# number is an UPPER BOUND on the collective overhead, not a hardware
# scaling measurement.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS="" PYTHONPATH="$PWD"
PORT=${PORT:-29531}
OUT=${1:-/tmp/scaling}
mkdir -p "$OUT"

echo "== (a) 1 process, 4 devices, batch 4 =="
XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  python -m cuahn_vio.cli distributed-selftest --bench --out "$OUT/p1.json"

echo "== (c) 1 process, 8 devices, batch 8 (contention control) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m cuahn_vio.cli distributed-selftest --bench --out "$OUT/p1x8.json"

echo "== (b) 2 processes, 4+4 devices, batch 8 =="
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
p8 = json.load(open(f"{o}/p1x8.json"))
d1 = p1["bench_frames_per_s_per_device"]
d2 = p2["bench_frames_per_s_per_device"]
d8 = p8["bench_frames_per_s_per_device"]
print(f"(a) 1-proc 4-dev : {d1:.0f} frames/s/device")
print(f"(b) 2-proc 4+4   : {d2:.0f} frames/s/device")
print(f"(c) 1-proc 8-dev : {d8:.0f} frames/s/device")
print(f"fixed-per-device-work overhead, (a)->(b) (upper bound — the two "
      f"processes also share this host's cores): {100*(1-d2/d1):.1f} %")
print(f"process-boundary overhead, (c)->(b) (same total devices and work, "
      f"only the Gloo boundary differs): {100*(1-d2/d8):.1f} %")
EOF
