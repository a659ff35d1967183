#!/bin/bash
# Poll the axon TPU tunnel; when healthy, run the round-4 measurement queue once.
# Probe must run in a subprocess with timeout: jax.devices() HANGS when wedged.
cd /root/repo
LOG=/tmp/tpu_watch.log
echo "[tpu_watch] start $(date -u +%FT%TZ)" >> "$LOG"
while true; do
  if timeout 120 python - <<'EOF' >> "$LOG" 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("TPU OK:", d)
EOF
  then
    echo "[tpu_watch] tunnel healthy $(date -u +%FT%TZ) — running queue" >> "$LOG"
    bash tools/tpu_round4_tasks.sh >> /tmp/tpu_round4_tasks.log 2>&1
    echo "[tpu_watch] queue done rc=$? $(date -u +%FT%TZ)" >> "$LOG"
    touch /tmp/tpu_round4_done
    exit 0
  fi
  echo "[tpu_watch] tunnel down $(date -u +%FT%TZ), sleeping 300s" >> "$LOG"
  sleep 300
done
