#!/bin/sh
# Build the native host runtime (no CMake dance needed for one TU; a
# CMakeLists.txt is provided for IDE/toolchain users).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC adt_native.cpp -o libadt_native.so
echo "built $(pwd)/libadt_native.so"
