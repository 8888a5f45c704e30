#!/bin/sh
# Build the native host codec shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -o libwtc_codec.so \
    wtc_codec.cpp -llzma -lpthread
echo "built $(pwd)/libwtc_codec.so"
