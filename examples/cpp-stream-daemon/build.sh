#!/bin/sh
# Build the RF streaming daemon example.
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -pthread -o stream_daemon main.cpp
echo "built: $(pwd)/stream_daemon"
