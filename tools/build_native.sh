#!/bin/sh
# Build the native IO helpers into rm_radar_tpu/native/.
set -e
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -std=c++17 \
    rm_radar_tpu/native/pcd_parser.cpp \
    -o rm_radar_tpu/native/libpcd_parser.so
echo "built rm_radar_tpu/native/libpcd_parser.so"
