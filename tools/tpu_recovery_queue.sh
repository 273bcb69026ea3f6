#!/bin/bash
# Waits for the wedged TPU to recover, then runs the queued hardware jobs.
#
# Usage: tpu_recovery_queue.sh JOBS.sh [args...]
#   JOBS.sh — a script of TPU jobs, run once the device answers a probe.
#
# Background (see STATUS round-2/3 notes): a killed TPU client can leave a
# stale device grant that wedges every new client with UNAVAILABLE for
# 10-240 min.  Pattern that works: probe with a small bounded matmul every
# few minutes, run NOTHING else against the device meanwhile, then drain the
# queue one config per PROCESS — short tunnel sessions, incremental results,
# and a wedge mid-queue only loses one job.  NEVER run two TPU clients at
# once.
cd /root/repo
probe() {
  timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready(); print('ok')" 2>/dev/null | grep -q ok
}
echo "$(date +%T) waiting for TPU..."
until probe; do
  sleep 240
  echo "$(date +%T) still down"
done
echo "$(date +%T) TPU BACK — running queue: $*"
"$@"
echo "$(date +%T) queue done"
