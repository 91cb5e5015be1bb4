#!/bin/sh
# Build the native runtime components into pyfocusr_tpu/_native.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o ../pyfocusr_tpu/_native.so \
    lap_jv.cpp fast_parse.cpp fast_topology.cpp
echo "built pyfocusr_tpu/_native.so"
