#!/bin/sh
# Build the native IO runtime (libpdgs_io.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    pdgs_io.cpp -o libpdgs_io.so
echo "built $(pwd)/libpdgs_io.so"
