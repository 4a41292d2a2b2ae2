#!/bin/sh
set -e
cd "$(dirname "$0")"
g++ -O2 -o pipeline_demo main.cpp ../../native/preprocess.cpp
echo "built ./pipeline_demo"
