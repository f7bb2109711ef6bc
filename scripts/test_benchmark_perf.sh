#!/bin/bash
# Perf sweep (analogue of reference sh/test_benchmark_perf.sh): prompt +
# best/worst decode speeds, then concurrent-stream aggregates on the small
# configs. Pass checkpoint dirs as arguments, or no args for synthetic.
set -u
if [ $# -gt 0 ]; then
  for d in "$@"; do
    echo "==== $d"
    python benchmark.py -d "$d" -p
    python benchmark.py -d "$d" -cs 4
  done
else
  for shape in 7b 13b; do
    echo "==== synthetic $shape"
    python benchmark.py --synthetic "$shape" -p
  done
  python benchmark.py --synthetic 7b -cs 8
fi
