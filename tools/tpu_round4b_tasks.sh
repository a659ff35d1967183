#!/bin/bash
# Round-4b TPU measurement queue: re-runs of the round-4 tasks that failed.
#   - 3D bench: compile-time HBM OOM by 0.76 GB -> fixed by splitting the
#     monolithic assemble into rhs/stiffness executables (lattice_fast.py)
#   - elasticity/biharmonic workload benches: 18-25 GB jacfwd tangent
#     broadcasts -> fixed by auto-chunked assembly (ops/assembly.py)
#   - 2D window A/B: runtime ResourceExhausted at n_bg=1024 -> retry, plus a
#     724 point so the A/B comparison lands even if 1024 still OOMs
#   - demo wall-times: /usr/bin/time does not exist on this image -> use the
#     bash `time` keyword + the demos' own phase timers
set -x
cd /root/repo
mkdir -p studies
# 1. 3D ~1M-dof bench vs the 42.94 s CPU baseline
timeout 3600 python bench.py --dim 3 --n-bg 100 --verbose | tee /tmp/tpu_bench3d.json
# 2. on-device iterative (mg) workload benches
timeout 1800 python bench.py --workload elasticity --verbose | tee /tmp/tpu_bench_elast.json || true
timeout 1800 python bench.py --workload biharmonic --verbose | tee /tmp/tpu_bench_biharm.json || true
# 3. 2D cell-window congruence A/B vs colored probes
IIFEA_2D_WINDOW=1 timeout 1800 python bench.py --n-bg 1024 --verbose | tee /tmp/tpu_bench2d_window.json || true
IIFEA_2D_WINDOW=1 timeout 1800 python bench.py --n-bg 724 --verbose | tee /tmp/tpu_bench2d_window724.json || true
# 3b. per-phase table with the fused-readback sync (the per-leaf float()
#     sync inflated many-leaf phases by ~25 ms/leaf of tunnel latency)
IIFEA_BENCH_PHASES=1 timeout 1800 python bench.py --n-bg 1024 --verbose | tee /tmp/tpu_bench2d_phases.json || true
# 4. demo wall-times on the TPU platform for RESULTS.md
for d in "demos/poisson.py --k 1 --ref 2" "demos/poisson.py --k 1 --ref 4" \
         "demos/poisson.py --k 1 --ref 5" "demos/poisson.py --k 1 --dim 3 --ref 2" \
         "demos/biharmonic.py --ref 3" "demos/linear_elasticity.py --ref 3"; do
  ( IIFEA_NO_AUTO_HOST=1 time timeout 1200 python $d 2>&1 | tail -16 ) 2>&1
done
# 4b. 3D stencil kernel A/B (VERDICT r3 #8: committed a525376, unmeasured)
timeout 1800 python tools/ab_stencil3.py --n 101 | tee /tmp/tpu_ab_stencil3.json || true
# 5. nested 3D synthetic biharmonic ref 2 (replaces the pre-fix straddling
#    row; 9284 s single-core CPU last round)
timeout 21600 python -c "
import sys; sys.path.insert(0, 'tools')
import run_studies as rs
rs.biharmonic_synthetic(refs_2d=(), refs_3d=(2,))
"
# 6. nested-grid TG sweep on the gmres+mg on-device path (VERDICT r3 #5) —
#    small problems auto-route to host; the point is the convergence table
timeout 21600 python tools/run_studies.py tg_synthetic
echo "[tpu_round4b_tasks] done $(date -u +%FT%TZ)"
