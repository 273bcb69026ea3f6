#!/bin/bash
# ≙ reference data/scripts/fetch_imagenet_models.sh: ImageNet-pretrained
# trunk weights.  Either export a caffemodel to npz (keys {conv}_w/{conv}_b,
# Caffe OIHW layout) and place it at data/imagenet_models/vgg16.npz, or
# download torchvision's VGG16 state dict:
#   python -c "import torchvision; m = torchvision.models.vgg16(weights='IMAGENET1K_V1'); \
#              import torch; torch.save(m.state_dict(), 'data/imagenet_models/vgg16_tv.pth')"
# then pass --weights data/imagenet_models/vgg16_tv.pth to tools/train_net.py
# (the converter handles the RGB/[0,1] → BGR/mean-sub input change).
# NOTE: requires network access (not available in the build sandbox).
mkdir -p "$(dirname "$0")/../imagenet_models"
echo "See comments in this script for the two supported weight sources."
