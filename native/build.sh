#!/bin/sh
# Build the native host runtime (no CMake dance needed for one TU; a
# CMakeLists.txt is provided for IDE/toolchain users).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC adt_native.cpp -o libadt_native.so
echo "built $(pwd)/libadt_native.so"
# any-container decode bridge: needs the FFmpeg dev libraries; skip
# quietly when absent (io/avdec.py degrades through codec_available())
if g++ -O3 -std=c++17 -shared -fPIC adt_codec.cpp -o libadt_codec.so \
     -lavformat -lavcodec -lavutil 2>/dev/null; then
  echo "built $(pwd)/libadt_codec.so"
else
  echo "skipped libadt_codec.so (FFmpeg dev libraries not found)"
fi
