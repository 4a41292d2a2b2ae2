#!/bin/sh
# Build the native preprocessing library (g++ is baked into the image).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -shared -fPIC -o libsytnative.so preprocess.cpp
echo "built $(pwd)/libsytnative.so"
