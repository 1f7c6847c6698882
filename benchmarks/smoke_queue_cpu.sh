#!/bin/bash
# Serial CPU smoke tests of the never-run TPU-queue scripts (1 core).
# Artifacts written by smokes are deleted at the end — they are crash
# probes, not measurements.
set -u
cd /root/repo
log() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

# wait for the zoo smoke to finish
while pgrep -f convergence_zoo_r04 >/dev/null 2>&1; do sleep 30; done

log distill
TEACHER_EPOCHS=1 DISTILL_EPOCHS=1 timeout 2400 \
  python benchmarks/_cpu_run.py benchmarks/distill_soak.py \
  > /tmp/smoke_distill.log 2>&1
echo "distill rc=$?"

log detr_phase
DETR_PHASE_B=2 DETR_PHASE_IMG=128 DETR_PHASE_ITERS=1 timeout 2400 \
  python benchmarks/_cpu_run.py benchmarks/detr_phase.py \
  > /tmp/smoke_detr_phase.log 2>&1
echo "detr_phase rc=$?"

log adam_superleaf
timeout 1200 python benchmarks/_cpu_run.py benchmarks/adam_superleaf.py \
  > /tmp/smoke_superleaf.log 2>&1
echo "adam_superleaf rc=$?"

log hier_bench
timeout 3000 python benchmarks/_cpu_run.py benchmarks/hier_bench.py \
  --models swint_224,swinv2t_224,pvt_tiny224,twins_svts224 \
  --batch 1 --iters 1 --stages > /tmp/smoke_hier.log 2>&1
echo "hier_bench rc=$?"

log cleanup
rm -f benchmarks/distill_r04.json benchmarks/detr_phase_r04.json \
      benchmarks/adam_superleaf_r04.json benchmarks/hier_bench_r04.json \
      benchmarks/convergence_zoo_r04.json
log done
