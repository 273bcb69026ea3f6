#!/usr/bin/env bash
# The standing flagship: best-known recipe, one first-class artifact
# (VERDICT r4 item 7).  Every repo-measured "best" knob in one run:
#   - MASK_SIZE 28            (+1.6/+1.7 mAP vs 21 at equal step cost,
#                              docs/results/e2e_mask28_r3_metrics.jsonl)
#   - train pre/post-NMS 12000/2000 (reference budget; converges to
#                              +2.9 mAP@0.7 in half the iterations,
#                              docs/results/e2e_refws12000_r3_metrics.jsonl)
#   - batch 8, lr 0.002 step-decay at 3/4 (measured-best train batch)
# Produces output/flagship_r5/{e2e_params.npz,e2e_metrics.jsonl}: the
# checkpoint every capability row (README/STATUS tables, ablation_r5,
# crowd eval) is derived from.  ~75 min on one v5e chip.
set -e
cd "$(dirname "$0")/../.."
ITERS=${1:-24000}
OUT=${2:-output/flagship_r5}
mkdir -p "$OUT" experiments/logs
python tools/e2e_synth_demo.py --full-scale --mask-size 28 \
    --pre-nms 12000 --post-nms 2000 --iters "$ITERS" --batch 8 \
    --eval-every 2000 --eval-images 64 --train-images 64 --lr 0.002 \
    --out "$OUT" 2>&1 | tee "experiments/logs/flagship_$(date +%s).log" \
    | grep -E "EVAL|map_r|iter [0-9]+00:|trained"
