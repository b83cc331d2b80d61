#!/bin/sh
# Build the native host-data library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    vitlens_host.cpp -o libvitlens_host.so
echo "built $(pwd)/libvitlens_host.so"
