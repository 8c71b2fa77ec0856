#!/usr/bin/env bash
# Loop-probe the axon TPU tunnel; the moment it answers, run the
# serialized perf session exactly once.  Log everything to /tmp/tpu_watch.log.
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watch.log
echo "watchdog start $(date -u +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 150 python -c "
import jax, numpy as np, jax.numpy as jnp
print(np.asarray((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]), jax.devices())
" >> "$LOG" 2>&1; then
    echo "TUNNEL UP $(date -u +%H:%M:%S) — running perf session" >> "$LOG"
    bash tools/tpu_perf_session.sh > /tmp/tpu_perf_session.log 2>&1
    echo "perf session done rc=$? $(date -u +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  echo "tunnel down $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 600
done
