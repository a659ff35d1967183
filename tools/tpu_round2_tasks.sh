#!/bin/bash
# Round-2 TPU measurement queue (run when the axon tunnel is healthy).
# Each step appends to studies/bench.jsonl / prints JSON for RESULTS.md.
set -x
cd /root/repo
# 1. headline 2D bench at 1M dofs with the direct-conv mg_build (+ fresh CPU baseline)
timeout 1800 python bench.py --n-bg 1024 --rebaseline | tee /tmp/tpu_bench2d.json
# 2. 3D bench at ~1M dofs (101^3) vs CPU baseline
timeout 3600 python bench.py --dim 3 --n-bg 100 --rebaseline | tee /tmp/tpu_bench3d.json
# 3. demo wall-times on the TPU platform (compile-cache warm-up = first run)
for d in "demos/poisson.py --k 1 --ref 2" "demos/poisson.py --k 1 --ref 4" \
         "demos/poisson.py --k 1 --dim 3 --ref 2" "demos/biharmonic.py --ref 2"; do
  /usr/bin/time -v timeout 1200 python $d 2>&1 | tail -12
done
