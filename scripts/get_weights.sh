#!/bin/sh
# Fetch the public pretrained Darknet weights (same artifacts the
# reference's get_weights.sh pulls). Run where network egress exists.
set -e
mkdir -p weights
cd weights
wget -c https://data.pjreddie.com/files/yolov3.weights
wget -c https://data.pjreddie.com/files/yolov3-tiny.weights
