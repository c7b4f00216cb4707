#!/bin/bash
# Build + run the reference-CPU baseline measurement (experiments/ref_cpu_bench.cc).
# Measures the UPSTREAM reference's own hot counting path on this host at
# 1..nproc threads over a seeded FASTQ, to anchor bench.py's 32-thread
# baseline constant (VERDICT weak #5). Results land in
# experiments/ref_cpu_bench_results.json.
set -euo pipefail
REF=/root/reference
REPO="$(cd "$(dirname "$0")/.." && pwd)"
BUILD="${TMPDIR:-/tmp}/ref_cpu_bench_build"
mkdir -p "$BUILD"

cat > "$BUILD/config.h" <<'EOF'
#define HAVE_POSIX_MEMALIGN 1
#define PACKAGE_VERSION "2.3.1-bench"
EOF

LIBS="rectangular_binary_matrix.cc allocators_mmap.cc misc.cc storage.cc thread_exec.cc jsoncpp.cpp mer_dna.cc time.cc"
SRCS=""
for f in $LIBS; do SRCS="$SRCS $REF/lib/$f"; done

g++ -std=c++11 -O3 -march=native -DHAVE_CONFIG_H -I"$BUILD" -I"$REF/include" \
    -o "$BUILD/ref_cpu_bench" "$REPO/experiments/ref_cpu_bench.cc" $SRCS -lpthread

# seeded FASTQ via our generator (same distribution family as the
# reference's generate_sequence test corpus)
DATA="$BUILD/bench.fastq"
if [ ! -s "$DATA" ]; then
  python -m jellyfish_tpu generate -s 3141592653 -q -m 20000000 -r 100 \
      -o "$BUILD/bench"
  mv "$BUILD/bench.fq" "$DATA"
fi

OUT="$REPO/experiments/ref_cpu_bench_results.json"
: > "$OUT"
for t in 1 2 4; do
  # best of 3 runs per thread count
  for rep in 1 2 3; do
    "$BUILD/ref_cpu_bench" "$DATA" 21 40000000 "$t" 1 >> "$OUT"
  done
done
cat "$OUT"
