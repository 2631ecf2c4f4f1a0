#!/bin/sh
# Build libmpmc_native.so (C++ tokenizer + image decode).
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -pthread \
    tokenizer.cpp image_decode.cpp \
    -ljpeg -lpng \
    -o libmpmc_native.so
echo "built $(pwd)/libmpmc_native.so"
