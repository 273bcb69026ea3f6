#!/bin/bash
# One-command mAP^r parity check against the Caffe-MNC reference
# (VERDICT r3 item 6; ≙ the reference README's "test the released model" flow).
#
# Usage:
#   ./experiments/scripts/reference_parity.sh SBD_ROOT CAFFEMODEL [--released]
#   ./experiments/scripts/reference_parity.sh --dry-run        # plumbing proof
#
# SBD_ROOT must contain benchmark_RELEASE/dataset/{inst,cls,img} and val.txt
# (fetch via data/scripts/fetch_sbd_data.sh); CAFFEMODEL is the released
# 5-stage model (data/scripts/fetch_mnc_model.sh).  Exit 0 = within 0.3 pts.
set -e

LOG="experiments/logs/reference_parity_$(date +'%Y-%m-%d_%H-%M-%S').log"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")
echo Logging to "$LOG"

if [ "$1" = "--dry-run" ]; then
  exec python tools/reference_parity.py --dry-run
fi

SBD_ROOT=${1:?usage: reference_parity.sh SBD_ROOT CAFFEMODEL [--released]}
CAFFEMODEL=${2:?usage: reference_parity.sh SBD_ROOT CAFFEMODEL [--released]}
shift 2

exec python tools/reference_parity.py \
  --sbd-root "$SBD_ROOT" --caffemodel "$CAFFEMODEL" "$@"
