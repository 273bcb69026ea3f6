#!/bin/bash
# Waits for the wedged TPU to recover, then runs the queued hardware jobs.
# One config per PROCESS: short tunnel sessions, incremental results, and a
# wedge mid-queue only loses one job.  NEVER run two TPU clients at once.
cd /root/repo
probe() {
  timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready(); print('ok')" 2>/dev/null | grep -q ok
}
echo "$(date +%T) waiting for TPU..."
until probe; do
  sleep 240
  echo "$(date +%T) still down"
done
echo "$(date +%T) TPU BACK — running queue"
R=docs/results/workingset_r2.jsonl
P=output/e2e_fullscale_r2b/e2e_params.npz
for pre in 512 1024 2048 6000; do
  echo "=== workingset pre_nms=$pre ==="
  timeout 2400 python -u tools/workingset_study.py --params $P \
      --pre-nms $pre --dets-per-class 16 --append $R 2>&1 | grep -E '^\{|summary|recall'
done
echo "=== workingset dets_per_class=100 ==="
timeout 2400 python -u tools/workingset_study.py --params $P \
    --pre-nms --dets-per-class 100 --append $R 2>&1 | grep -E '^\{|summary|recall'
echo "=== bench resnet101 trunk ==="
timeout 1800 python bench.py --trunk resnet101 --verbose 2>&1 | grep -vE "WARNING|INFO"
echo "=== bench 5-stage vote_both_passes cost (batch 8) ==="
timeout 1800 python bench.py --vote-both --verbose 2>&1 | grep -vE "WARNING|INFO" | tail -3
echo "=== resnet101 full-scale short train (2500 iters) ==="
timeout 7200 python -u tools/e2e_synth_demo.py --full-scale --trunk resnet101 \
    --iters 2500 --batch 8 --eval-every 1250 --eval-images 16 --lr 0.002 \
    --out output/e2e_resnet_r2 2>&1 | grep -E "EVAL|iter 2500|map_r" | tail -6
echo "=== bench_train (train-step throughput) ==="
timeout 1800 python tools/bench_train.py --batch 8 --iters 8 --verbose 2>&1 | grep -vE "WARNING|INFO" | tail -3
echo "$(date +%T) queue done"
