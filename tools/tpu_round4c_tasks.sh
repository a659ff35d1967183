#!/bin/bash
# Round-4c TPU queue: items that failed or were skipped in round-4b.
#   - workload benches: re-run with the (ne+3)-temp probe-chunk fix
#   - demo wall-times: round-4b used `VAR=x time ...` where `time` cannot be
#     the shell keyword (ran a nonexistent command); use `env` + date stamps
#   - colored-probe n_bg=724 point: the same-size partner for the window A/B
set -x
cd /root/repo
timeout 1800 python bench.py --workload elasticity --verbose | tee /tmp/tpu_bench_elast.json || true
timeout 1800 python bench.py --workload biharmonic --verbose | tee /tmp/tpu_bench_biharm.json || true
timeout 1800 python bench.py --n-bg 724 --verbose | tee /tmp/tpu_bench2d_724.json || true
for d in "demos/poisson.py --k 1 --ref 4" "demos/poisson.py --k 1 --ref 5" \
         "demos/poisson.py --k 1 --dim 3 --ref 2" \
         "demos/biharmonic.py --ref 3" "demos/linear_elasticity.py --ref 3"; do
  s=$SECONDS
  env IIFEA_NO_AUTO_HOST=1 timeout 1200 python $d 2>&1 | tail -12
  echo "WALL $d: $((SECONDS-s)) s"
done
echo "[tpu_round4c_tasks] done $(date -u +%FT%TZ)"
