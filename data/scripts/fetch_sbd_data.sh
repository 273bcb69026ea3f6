#!/bin/bash
# ≙ reference data/scripts fetchers.  Downloads SBD (benchmark_RELEASE) and
# the VOC 2012 devkit into the layout mnc_tpu.data.pascal_voc expects.
# NOTE: requires network access (not available in the build sandbox).
set -e
cd "$(dirname "$0")/.."

mkdir -p sbd && cd sbd
echo "Fetching SBD (Berkeley benchmark_RELEASE)..."
curl -LO http://www.eecs.berkeley.edu/Research/Projects/CS/vision/grouping/semantic_contours/benchmark.tgz
tar xzf benchmark.tgz
# split lists
cp benchmark_RELEASE/dataset/train.txt . 2>/dev/null || true
cp benchmark_RELEASE/dataset/val.txt . 2>/dev/null || true
cd ..

echo "Fetching VOC 2012 devkit..."
curl -LO http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar
tar xf VOCtrainval_11-May-2012.tar
mv VOCdevkit VOCdevkit2012
echo "done"
