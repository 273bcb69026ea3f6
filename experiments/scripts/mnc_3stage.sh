#!/bin/bash
# 3-stage variant train→test (≙ reference experiments/scripts family).
set -x
set -e
IMDB_TRAIN=${1:-voc_2012_seg_train}
IMDB_TEST=${2:-voc_2012_seg_val}
ITERS=${3:-25000}
LOG="experiments/logs/mnc_3stage_$(date +'%Y-%m-%d_%H-%M-%S').log"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")
python tools/train_net.py --imdb "$IMDB_TRAIN" --iters "$ITERS" \
  --cfg experiments/cfgs/mnc_3stage.yml --out output/mnc_3stage
python tools/test_net.py --imdb "$IMDB_TEST" --stages 3 \
  --cfg experiments/cfgs/mnc_3stage.yml --ckpt output/mnc_3stage
