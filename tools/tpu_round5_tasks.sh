#!/bin/bash
# Round-5 TPU queue with persistent per-task state (VERDICT r4 item 10):
# every task appends start/end records (+ log tail) to
# studies/tpu_tasks_r5.jsonl and mirrors its full log into
# studies/tpu_r5_logs/ IMMEDIATELY, so a tunnel death mid-queue cannot
# erase the round's measurement evidence.
set -u
cd /root/repo
mkdir -p /tmp/tpu5 studies/tpu_r5_logs
STATE=studies/tpu_tasks_r5.jsonl

task() {
  local name=$1; shift
  local to=$1; shift
  python3 - "$name" start "$*" <<'PY' >> "$STATE"
import json, sys, datetime
print(json.dumps({"task": sys.argv[1], "event": sys.argv[2],
                  "cmd": sys.argv[3],
                  "t": datetime.datetime.utcnow().isoformat() + "Z"}))
PY
  timeout "$to" "$@" > "/tmp/tpu5/$name.log" 2>&1
  local rc=$?
  cp "/tmp/tpu5/$name.log" "studies/tpu_r5_logs/$name.log"
  python3 - "$name" "$rc" "/tmp/tpu5/$name.log" <<'PY' >> "$STATE"
import json, sys, datetime
tail = open(sys.argv[3], errors="replace").read()[-900:]
print(json.dumps({"task": sys.argv[1], "event": "end",
                  "rc": int(sys.argv[2]), "tail": tail,
                  "t": datetime.datetime.utcnow().isoformat() + "Z"}))
PY
}

# priority order: never-landed on-silicon items first
task bench3d      3600 python bench.py --dim 3 --n-bg 100 --verbose
task bench_elast  3600 python bench.py --workload elasticity --verbose
task bench_biharm 3600 python bench.py --workload biharmonic --verbose
task ab_stencil3_r2 2400 python tools/ab_stencil3.py --n 101 --radii 2
task bench2d      1800 python bench.py --n-bg 1024 --verbose
echo "[tpu_round5_tasks] done $(date -u +%FT%TZ)" | tee -a "studies/tpu_r5_logs/runner.log"
