#!/bin/bash
# Interleaved factorize head-to-head: reference C++ vs hifir_tpu.
# Usage: benchmarks/h2h.sh [nx] [pairs]
# Pairs are interleaved (ref, ours, ref, ours, ...) so the 2-core build
# host's noisy-neighbor phases hit both implementations equally; compare
# per-pair or min-of-N (see BASELINE.md measurement policy).
set -e
cd "$(dirname "$0")"
NX=${1:-1024}
PAIRS=${2:-3}

if [ ! -x ref_factorize.exe ] || [ ref_factorize.cpp -nt ref_factorize.exe ]; then
  echo "building reference driver..."
  g++ -O3 -ffast-math -fopenmp -I/root/reference/src ref_factorize.cpp \
      -o ref_factorize.exe -l:liblapack.so.3 -l:libblas.so.3
fi
make -C ../hifir_tpu/native -s

for i in $(seq 1 "$PAIRS"); do
  echo "--- pair $i ---"
  echo -n "ref  : "; ./ref_factorize.exe "$NX" 1
  echo -n "ours : "; python our_factorize.py "$NX" 1
done
