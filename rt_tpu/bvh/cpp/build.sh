#!/usr/bin/env bash
# Build the native BVH builder shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -o libbvh.so bvh_builder.cpp
