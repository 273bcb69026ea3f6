#!/bin/bash
# ≙ reference experiments/scripts/mnc_5stage.sh: train then test, logged.
# Usage: ./experiments/scripts/mnc_5stage.sh [IMDB_TRAIN] [IMDB_TEST] [ITERS]
set -x
set -e

IMDB_TRAIN=${1:-voc_2012_seg_train}
IMDB_TEST=${2:-voc_2012_seg_val}
ITERS=${3:-25000}

LOG="experiments/logs/mnc_5stage_$(date +'%Y-%m-%d_%H-%M-%S').log"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")
echo Logging to "$LOG"

python tools/train_net.py \
  --imdb "$IMDB_TRAIN" --iters "$ITERS" \
  --cfg experiments/cfgs/mnc_5stage.yml \
  --weights data/imagenet_models/vgg16.npz \
  --out output/mnc_5stage

python tools/test_net.py \
  --imdb "$IMDB_TEST" --stages 5 \
  --cfg experiments/cfgs/mnc_5stage.yml \
  --ckpt output/mnc_5stage \
  --cache output/mnc_5stage/detections.pkl
