#!/bin/bash
# Round-4 TPU measurement queue — short benchmarks first, soaks last.
# Each step is timeout-bounded and logs to benchmarks/logs/; a wedged
# tunnel mid-queue therefore costs one step, not the queue.
# Run: bash benchmarks/run_tpu_queue.sh [short|soaks|all]
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" 2>&1 | tail -40 | tee "benchmarks/logs/$name.log"
  echo "=== $name done rc=$? ==="
}

mode=${1:-short}

if [ "$mode" = short ] || [ "$mode" = all ]; then
  BENCH_ATTEMPT_TIMEOUT=420 BENCH_TOTAL_BUDGET=850 \
  run bench            900  python bench.py
  run hier_stages     2400  python benchmarks/hier_bench.py --stages
  run adam_superleaf  1200  python benchmarks/adam_superleaf.py
  run layout_ablation 1200  python benchmarks/swin_layout_ablation.py
  run swin_residue    1800  python benchmarks/swin_residue.py
  run pack_sweep      1800  python benchmarks/window_pack_sweep.py
  run detr_phase      1800  python benchmarks/detr_phase.py
  run kernel_valid    1800  python benchmarks/kernel_validation.py
  run pack_bias_dtype  900  python benchmarks/pack_bias_dtype.py
fi

if [ "$mode" = soaks ] || [ "$mode" = all ]; then
  run distill_soak    7200  python benchmarks/distill_soak.py
  run detr_soak      10800  python benchmarks/detr_convergence.py
  run zoo_soak       14400  python benchmarks/convergence_zoo_r04.py
fi
