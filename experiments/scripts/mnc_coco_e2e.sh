#!/usr/bin/env bash
# COCO-format end-to-end exercise (VERDICT r4 item 5; BASELINE configs[4]).
# Emits a synthetic dataset in REAL COCO JSON (polygon + compressed RLE
# segmentations), then runs the reference COCO pipeline against it:
#   COCOSeg → TrainLoader → train_net → test_net --coco-ap (AP^r@[.5:.95])
# VGG-16 short train + eval, then a ResNet-101 smoke on the same path.
# ~12 min on one v5e chip.  Results → docs/results/coco_e2e_r5.jsonl.
set -e
cd "$(dirname "$0")/../.."
ROOT=${1:-output/coco_synth}
ITERS=${2:-2500}
# 480x640 source images at scale 1.0 inside a 512x768 canvas; shapes span
# 48-320 px so anchors (4,8,16)x16 = 64-256 px cover them.
SETS=(DATA_DIR "$ROOT" STATIC.CANVAS "[512,768]"
      TRAIN.SCALES "[480]" TEST.SCALES "[480]"
      TRAIN.MAX_SIZE 768 TEST.MAX_SIZE 768
      NET.ANCHOR_SCALES "[4,8,16]" NET.NUM_CLASSES 6
      NET.TRUNK_FROZEN 0 TRAIN.LEARNING_RATE 0.002
      TRAIN.STEPSIZE $((ITERS * 3 / 4)) TRAIN.SNAPSHOT_ITERS 1000)
mkdir -p experiments/logs docs/results
LOG="experiments/logs/coco_e2e_$(date +%s).log"

python tools/make_coco_synth.py --root "$ROOT" \
    --splits synthtrain=64 synthval=16 --canvas 480 640 2>&1 | tee -a "$LOG"

echo "=== VGG-16 train ($ITERS iters) ===" | tee -a "$LOG"
python tools/train_net.py --imdb coco_synthtrain --iters "$ITERS" \
    --ims-per-batch 8 --out "$ROOT/run_vgg" \
    --set "${SETS[@]}" 2>&1 | tee -a "$LOG" | grep -E "iter|loss" | tail -5

echo "=== VGG-16 eval (COCO-style AP) ===" | tee -a "$LOG"
python tools/test_net.py --imdb coco_synthval --ckpt "$ROOT/run_vgg" \
    --coco-ap --set "${SETS[@]}" 2>&1 | tee -a "$LOG" | tail -30

echo "=== ResNet-101 smoke (200 iters + eval) ===" | tee -a "$LOG"
python tools/train_net.py --imdb coco_synthtrain --iters 200 \
    --ims-per-batch 2 --out "$ROOT/run_r101" \
    --set "${SETS[@]}" NET.TRUNK resnet101 TRAIN.SNAPSHOT_ITERS 200 \
    2>&1 | tee -a "$LOG" | grep -E "iter|loss" | tail -3
python tools/test_net.py --imdb coco_synthval --ckpt "$ROOT/run_r101" \
    --coco-ap --set "${SETS[@]}" NET.TRUNK resnet101 \
    2>&1 | tee -a "$LOG" | tail -6

# extract the two eval summary lines into the results file the header cites
python - "$LOG" "$ITERS" <<'PYEOF'
import json, re, sys
log, iters = sys.argv[1], int(sys.argv[2])
rows = re.findall(r"mAP\^r@0.5 = ([\d.]+)\s+mAP\^r@0.7 = ([\d.]+)\s+"
                  r"AP\^r@\[.5:.95\] = ([\d.]+)", open(log).read())
trunks = [("vgg16", iters, 8), ("resnet101", 200, 2)]
with open("docs/results/coco_e2e_r5.jsonl", "a") as f:
    for (m5, m7, avg), (trunk, it, ipb) in zip(rows, trunks):
        f.write(json.dumps({
            "metric": "coco_e2e", "trunk": trunk, "iters": it,
            "ims_per_batch": ipb, "map_r_050": float(m5),
            "map_r_070": float(m7), "ap_r_050_095": float(avg),
            "log": log}) + "\n")
print(f"results -> docs/results/coco_e2e_r5.jsonl ({len(rows)} rows)")
PYEOF
echo "log: $LOG"
