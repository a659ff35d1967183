#!/bin/bash
# Round-4d TPU queue: re-runs of the round-4b items that failed BEFORE the
# probe-chunking fix (6ab7179) landed:
#   - 3D ~1M-dof headline bench (vs the 42.94 s CPU baseline)
#   - 2D cell-window congruence A/B at 1024 and 724
set -x
cd /root/repo
timeout 3600 python bench.py --dim 3 --n-bg 100 --verbose 2>&1 | tee /tmp/tpu_bench3d.json
IIFEA_2D_WINDOW=1 timeout 1800 python bench.py --n-bg 1024 --verbose 2>&1 | tee /tmp/tpu_bench2d_window.json || true
IIFEA_2D_WINDOW=1 timeout 1800 python bench.py --n-bg 724 --verbose 2>&1 | tee /tmp/tpu_bench2d_window724.json || true
echo "[tpu_round4d_tasks] done $(date -u +%FT%TZ)"
