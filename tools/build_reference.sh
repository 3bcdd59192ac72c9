#!/bin/bash
# Build the C reference (read-only at /root/reference) against the local
# FFTW shim, for golden-output generation and cross-validation tests.
# Usage: tools/build_reference.sh [BUILD_DIR]   (default /tmp/refbuild)
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="${1:-/tmp/refbuild}"
SHIM="$REPO/tools/fftw_shim"

gcc -O2 -fPIC -c "$SHIM/fftw_shim.c" -o "$SHIM/fftw_shim.o"
ar rcs "$SHIM/libfftw3f.a" "$SHIM/fftw_shim.o"

mkdir -p "$BUILD"
cd "$BUILD"
cmake /root/reference \
  -DCMAKE_BUILD_TYPE=Release \
  -DFFTW_INCLUDES="$SHIM/include" \
  -DFFTWF_LIBRARIES="$SHIM/libfftw3f.a" \
  -DCMAKE_C_FLAGS="-I$SHIM/include" \
  -DCMAKE_CXX_FLAGS="-I$SHIM/include" > cmake.log
make -j"$(nproc)" > make.log 2>&1
echo "reference binaries in $BUILD/bin"
