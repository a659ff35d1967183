#!/bin/bash
# Round-4d TPU queue (tunnel live at round start): priority-ordered re-run of
# everything that never landed on silicon, most valuable first.
#   1. 3D ~1M-dof bench vs the 42.94 s single-core baseline (never run on chip)
#   2. elasticity / biharmonic workload benches (on-device iterative paths)
#   3. n_bg=724 colored-probe point (partner for the window A/B)
#   4. radius-2 3D stencil A/B (r4 hit the wall clock mid-compile)
#   5. nested 3D biharmonic ref 2 study row (replaces the straddling row)
set -x
cd /root/repo
mkdir -p studies /tmp/tpu4d
timeout 2400 python bench.py --dim 3 --n-bg 100 --verbose 2>&1 | tee /tmp/tpu4d/bench3d.log
timeout 1500 python bench.py --workload elasticity --verbose 2>&1 | tee /tmp/tpu4d/bench_elast.log
timeout 1500 python bench.py --workload biharmonic --verbose 2>&1 | tee /tmp/tpu4d/bench_biharm.log
timeout 1200 python bench.py --n-bg 724 --verbose 2>&1 | tee /tmp/tpu4d/bench2d_724.log
timeout 1500 python tools/ab_stencil3.py --n 101 --radii 2 2>&1 | tee /tmp/tpu4d/ab_stencil3_r2.log
timeout 14400 python -c "
import sys; sys.path.insert(0, 'tools')
import run_studies as rs
rs.biharmonic_synthetic(refs_2d=(), refs_3d=(2,))
" 2>&1 | tee /tmp/tpu4d/biharm3d_ref2.log
echo "[tpu_round4d_tasks] done $(date -u +%FT%TZ)"
