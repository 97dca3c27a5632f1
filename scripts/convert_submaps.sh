#!/bin/bash
# SLAM submap binaries -> framework clouds (reference convert_submaps.sh).
#   scripts/convert_submaps.sh OUT_DIR file1.bin file2.bin ...
set -e
OUT=$1; shift
python -m feat3dnet_tpu.cli.prepare submaps --out "$OUT" "$@"
