#!/bin/bash
# Self-contained end-to-end run on the synthetic shapes dataset (no external
# data): trains the 5-stage cascade and evaluates mAP^r.  This is the
# in-repo equivalent of the reference's train→test experiment scripts.
set -x
set -e

ITERS=${1:-600}

LOG="experiments/logs/mnc_synthetic_$(date +'%Y-%m-%d_%H-%M-%S').log"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")

python tools/train_net.py --imdb synthetic_64 --iters "$ITERS" \
  --out output/mnc_synthetic
python tools/test_net.py --imdb synthetic_16 --stages 5 \
  --ckpt output/mnc_synthetic
