#!/bin/sh
# Build the native host codec shared library.
#
# Usage: build.sh [OUTPUT_PATH]   (default: libwtc_codec.so next to the
# source).  The auto-rebuild in wavelet_tpu/native/__init__.py calls this
# with a temp path and atomic-renames — this script is the single home of
# the compile flags.
set -e
cd "$(dirname "$0")"
OUT=${1:-libwtc_codec.so}
g++ -O3 -march=native -std=c++17 -shared -fPIC -o "$OUT" \
    wtc_codec.cpp -llzma -lpthread
echo "built $OUT"
