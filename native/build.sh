#!/usr/bin/env bash
# Build the native loader into lc2is_tpu/native/.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p ../lc2is_tpu/native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o ../lc2is_tpu/native/liblc2is_loader.so loader.cpp \
    -ljpeg -lpng -lz -pthread
echo "built lc2is_tpu/native/liblc2is_loader.so"
