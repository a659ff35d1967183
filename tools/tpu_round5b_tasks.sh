#!/bin/bash
# Round-5b TPU queue: the measurements still open after the 3D probe fix.
# Same persistent per-task state harness as tpu_round5_tasks.sh.
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

# order: never-landed items first; the crash-prone A/B tool last so a
# wedged worker cannot eat the queue
task bench_biharm 3600 python bench.py --workload biharmonic --verbose
task bench2d      1800 python bench.py --n-bg 1024 --verbose
task ab_stencil3_r2 2400 python tools/ab_stencil3.py --n 105 --radii 1,2
echo "[tpu_round5b_tasks] done $(date -u +%FT%TZ)" | tee -a "studies/tpu_r5_logs/runner.log"
