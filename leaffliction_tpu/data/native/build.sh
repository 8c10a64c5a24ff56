#!/bin/sh
# Build the native decoder shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libleafjpeg.so decoder.cpp -ljpeg
echo "built $(pwd)/libleafjpeg.so"
