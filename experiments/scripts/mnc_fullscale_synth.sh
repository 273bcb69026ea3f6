#!/usr/bin/env bash
# Full-scale synthetic convergence run: reference-scale architecture
# (640x1024 canvas, full VGG-16 bf16 trunk, MASK_SIZE 21, warp 14,
# anchors (8,16,32)x16), batch-8 SGD on one TPU chip.
# Reaches mAP^r@0.5 ~0.78 / @0.7 ~0.73 from scratch in ~50 min
# (docs/results/e2e_fullscale_r2_metrics.jsonl).
set -e
cd "$(dirname "$0")/../.."
ITERS=${1:-15000}
python tools/e2e_synth_demo.py --full-scale --iters "$ITERS" --batch 8 \
    --eval-every 1500 --eval-images 32 --train-images 64 --lr 0.002 \
    --out "output/e2e_fullscale_$(date +%s)" 2>&1 | tee /dev/stderr | grep -E "EVAL|map_r"
