#!/bin/bash
# Poll the TPU tunnel; the moment a device responds, run the round-3
# measurement queue (short benchmarks, then soaks). Logs to
# benchmarks/logs/. Run: bash benchmarks/tpu_watch.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
echo "watch start $(date +%H:%M:%S)"
while true; do
  if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()
assert d and d[0].platform == "tpu", d
# a real computation proves the tunnel works end-to-end
import jax.numpy as jnp
assert float(jnp.ones((8, 8)).sum()) == 64.0
EOF
  then
    echo "TPU up at $(date +%H:%M:%S) — running queue"
    bash benchmarks/run_tpu_queue.sh all 2>&1 | tee benchmarks/logs/queue_run.log
    echo "queue finished at $(date +%H:%M:%S)"
    exit 0
  fi
  echo "tpu down $(date +%H:%M:%S)"
  sleep 150
done
