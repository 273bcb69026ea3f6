#!/bin/bash
# Waits for the wedged TPU to recover, then runs the queued hardware jobs.
cd /root/repo
probe() {
  timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null
}
echo "$(date +%T) waiting for TPU..."
until probe; do
  sleep 240
  echo "$(date +%T) still down"
done
echo "$(date +%T) TPU BACK — running queue"

echo "=== bench batch 16 ==="
timeout 1800 python bench.py --batch 16 --iters 10 --verbose 2>&1 | grep -vE "WARNING|WARN |INFO"
echo "=== bench batch 8 (confirm) ==="
timeout 1500 python bench.py --batch 8 --iters 10 --verbose 2>&1 | grep -vE "WARNING|WARN |INFO"
echo "=== bench_train batch 1 ==="
timeout 1800 python tools/bench_train.py --batch 1 --iters 8 --verbose 2>&1 | grep -vE "WARNING|WARN |INFO"
echo "=== long synthetic train 6000 iters + eval ==="
timeout 2400 python tools/e2e_synth_demo.py --iters 6000 --lr 0.002 2>&1 | grep -vE "WARNING|WARN |INFO" | tail -30
echo "$(date +%T) queue done"
