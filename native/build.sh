#!/bin/sh
# Build the native host runtime -> mt_renderer_tpu/_mtr_native.so
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -Wall \
    mtr_native.cpp -o ../mt_renderer_tpu/_mtr_native.so -lz -pthread
echo "built ../mt_renderer_tpu/_mtr_native.so"
