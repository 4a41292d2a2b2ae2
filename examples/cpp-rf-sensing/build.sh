#!/bin/sh
# Build the standalone RF-sensing demo against the framework's native core.
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -o rf_sensing main.cpp ../../native/preprocess.cpp -lm
echo "built ./rf_sensing"
