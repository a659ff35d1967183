#!/bin/bash
# Round-4f TPU queue (fresh machine, tunnel LIVE at round start).
# Priority order: headline with the new direct stencil assembly first,
# then everything that has never landed on silicon.
set -x
cd /root/repo
mkdir -p /tmp/tpu4f studies
timeout 1800 python bench.py --n-bg 1024 --verbose 2>&1 | tee /tmp/tpu4f/bench2d.log
timeout 2400 python bench.py --dim 3 --n-bg 100 --verbose 2>&1 | tee /tmp/tpu4f/bench3d.log
timeout 1500 python bench.py --workload elasticity --verbose 2>&1 | tee /tmp/tpu4f/bench_elast.log
timeout 1500 python bench.py --workload biharmonic --verbose 2>&1 | tee /tmp/tpu4f/bench_biharm.log
timeout 1200 python bench.py --n-bg 724 --verbose 2>&1 | tee /tmp/tpu4f/bench2d_724.log
IIFEA_BENCH_PHASES=1 timeout 1800 python bench.py --n-bg 1024 --verbose 2>&1 | tee /tmp/tpu4f/bench2d_phases.log
timeout 1800 python tools/ab_stencil3.py --n 101 --radii 2 2>&1 | tee /tmp/tpu4f/ab_stencil3_r2.log
echo "[tpu_round4f_tasks] done $(date -u +%FT%TZ)"
