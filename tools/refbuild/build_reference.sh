#!/bin/sh
# Build the SANA-FE reference's standalone `sim` binary OFFLINE.
#
# The upstream CMake build FetchContents rapidyaml and the SLAM-Lab Booksim2
# fork from GitHub, which fails without network access. This script builds
# the same sources against:
#   - ryml.hpp (+ thin c4/yml/ headers): a from-scratch RapidYAML-compatible
#     shim over a YAML-subset parser (this directory) covering the API
#     surface the SANA-FE sources use
#   - booksim_lib.hpp / booksim_config.hpp: stubs that abort only if the
#     cycle-accurate timing tier is actually invoked (simple/detailed never
#     touch Booksim)
#
# Usage: build_reference.sh <reference-src-tree> <output-dir>
# The tests/golden_ref fixtures were produced by the binary this builds:
#   ./sim -o <out> -s [-n] -t <simple|detailed> <arch.yaml> <snn> <steps>
set -e
REF=${1:-/root/reference}
OUT=${2:-/tmp/refbuild}
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p "$OUT/build" "$OUT/shim/c4/yml"
cp -r "$REF/src" "$REF/arch" "$REF/snn" "$REF/plugins" "$OUT/" 2>/dev/null || true
cp "$HERE/ryml.hpp" "$HERE/ryml_std.hpp" "$HERE/booksim_lib.hpp" \
   "$HERE/booksim_config.hpp" "$OUT/shim/"
cp "$HERE/c4/yml/"*.hpp "$OUT/shim/c4/yml/"

cd "$OUT"
for f in src/*.cpp; do
    case "$f" in
        *pymodule.cpp|*pytrace.cpp) continue ;; # need pybind11
    esac
    g++ -std=c++17 -O2 -DENABLE_DEBUG_PRINTS -I shim -I src \
        -c "$f" -o "build/$(basename "$f" .cpp).o"
done
g++ -std=c++17 -O2 -pthread build/*.o -ldl -o sim
g++ -std=c++17 -O2 -shared -fPIC -I src -I shim \
    plugins/hodgkin_huxley.cpp -o plugins/hodgkin_huxley.so
g++ -std=c++17 -O2 -shared -fPIC -I src -I shim \
    plugins/neurofem.cpp -o plugins/neurofem.so 2>/dev/null || true
echo "Built: $OUT/sim"
