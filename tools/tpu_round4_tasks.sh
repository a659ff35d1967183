#!/bin/bash
# Round-4 TPU measurement queue (run when the axon tunnel is healthy).
# Two rounds of perf work (direct-conv mg_build, chunked 3D probes, workload
# benches) have never executed on silicon — this converts them into
# driver-visible numbers (VERDICT r3 "Next round" #1). Each step tees to
# /tmp; studies rows append via tools/run_studies.py where applicable.
set -x
cd /root/repo
mkdir -p studies
# 1. headline 2D bench at 1M dofs with the direct-conv mg_build
#    (round-1: 0.80 s total / 0.45 s mg_build; target < 0.6 s total)
timeout 1800 python bench.py --n-bg 1024 --verbose | tee /tmp/tpu_bench2d.json
# 2. 3D bench at ~1M dofs (101^3) vs the 42.94 s CPU baseline
timeout 3600 python bench.py --dim 3 --n-bg 100 --verbose | tee /tmp/tpu_bench3d.json
# 3. A/B the 2D cell-window congruence reducers against colored probes
IIFEA_2D_WINDOW=1 timeout 1800 python bench.py --n-bg 1024 --verbose | tee /tmp/tpu_bench2d_window.json
# 4. per-phase bandwidth report for the headline bench (roofline table)
IIFEA_BENCH_PHASES=1 timeout 1800 python bench.py --n-bg 1024 --verbose | tee /tmp/tpu_bench2d_phases.json
# 5. demo wall-times on the TPU platform for RESULTS.md
#    (IIFEA_NO_AUTO_HOST=1: defeat the small-problem host auto-route)
for d in "demos/poisson.py --k 1 --ref 2" "demos/poisson.py --k 1 --ref 4" \
         "demos/poisson.py --k 1 --ref 6" "demos/poisson.py --k 1 --dim 3 --ref 2" \
         "demos/biharmonic.py --ref 3" "demos/linear_elasticity.py --ref 3"; do
  IIFEA_NO_AUTO_HOST=1 /usr/bin/time -v timeout 1200 python $d 2>&1 | tail -14
done
# 6. on-device iterative (mg) workload benches (landed round 3, unmeasured)
timeout 1800 python bench.py --workload elasticity --verbose | tee /tmp/tpu_bench_elast.json || true
timeout 1800 python bench.py --workload biharmonic --verbose | tee /tmp/tpu_bench_biharm.json || true
echo "[tpu_round4_tasks] done $(date -u +%FT%TZ)"
