#!/bin/bash
# TPU tunnel watch: probe every ~5 min, append one status line per probe
# to the log, exit 0 on the first healthy probe (so `&&` can chain a
# capture). A probe is a full device round-trip, not just an import.
#
#   bash tools/tpu_watch.sh [log] [max_probes]   # defaults /tmp/tpu_status, 80
#
# Round-4 measured outage mode: backend init hangs (~25 min) then raises
# UNAVAILABLE; a 120 s timeout classifies it long before that. Chain the
# round capture like:
#   bash tools/tpu_watch.sh && bash tools/capture_r4.sh
LOG=${1:-/tmp/tpu_status}
N=${2:-80}
for _ in $(seq 1 "$N"); do
  if timeout 120 python -u -c "
import time, jax
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
jax.jit(lambda a: a * 2)(jnp.ones(8)).block_until_ready()
print('HEALTHY', d[0].device_kind, round(time.time() - t0, 1))
" >> "$LOG" 2>/dev/null; then
    echo "$(date +%H:%M:%S) TPU BACK" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) down" >> "$LOG"
  sleep 300
done
exit 1
