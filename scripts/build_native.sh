#!/bin/sh
# Build the native host-side data-prep library -> native/libpointprep.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/pointprep.cpp -o native/libpointprep.so
echo "built native/libpointprep.so"
