#!/bin/bash
# Extract keypoints + descriptors for the bundled example clouds
# (reference inference_example.sh equivalent). Point --tf1_checkpoint at an
# npz export of the reference's pretrained model for real descriptors.
set -e

EXTRA=""
if [ -n "$1" ]; then EXTRA="--tf1_checkpoint $1"; fi

DATA_DIR="$(cd "$(dirname "$0")/.." && pwd)/examples/data"

python -m feat3dnet_tpu.cli.infer \
    --data_dir "$DATA_DIR" \
    --output_dir ./example_results \
    --randomize_points $EXTRA
