#!/bin/bash
# Round-4e TPU queue (after the fused window-probe redesign):
#   - 2D cell-window A/B at the 1024 headline size (previously HBM OOM) and
#     the 724 midpoint (compare vs the slot-bound run's 0.6536 s)
#   - refreshed per-phase table for the 2D headline (fused readback)
#   - 3D headline bench per-phase breakdown
#   - 3D stencil A/B at radius 2 (radius-1 rows landed round 4)
set -x
cd /root/repo
IIFEA_2D_WINDOW=1 timeout 1800 python bench.py --n-bg 1024 --verbose 2>&1 | tee /tmp/tpu_bench2d_window_new.json || true
IIFEA_2D_WINDOW=1 timeout 1800 python bench.py --n-bg 724 --verbose 2>&1 | tee /tmp/tpu_bench2d_window724_new.json || true
IIFEA_BENCH_PHASES=1 timeout 2400 python bench.py --n-bg 1024 --verbose 2>&1 | tee /tmp/tpu_bench2d_phases_new.json || true
IIFEA_BENCH_PHASES=1 timeout 3600 python bench.py --dim 3 --n-bg 100 --verbose 2>&1 | tee /tmp/tpu_bench3d_phases.json || true
timeout 3600 python tools/ab_stencil3.py --radii 2 2>&1 | tee /tmp/tpu_ab_stencil3_r2.json || true
echo "[tpu_round4e_tasks] done $(date -u +%FT%TZ)"
