#!/bin/bash
# Model-zoo compatibility sweep (analogue of reference sh/test_compat.sh):
# runs the dual-path validator (-v) over every GPTQ checkpoint directory
# found under $1 (each containing config.json + *.safetensors), or over the
# built-in synthetic matrix when no zoo is available.
set -u
ZOO="${1:-}"
if [ -n "$ZOO" ] && [ -d "$ZOO" ]; then
  for d in "$ZOO"/*/; do
    [ -f "$d/config.json" ] || continue
    echo "==== $d"
    python benchmark.py -d "$d" -v || echo " !! FAILED: $d"
  done
else
  echo "(no model zoo given — sweeping synthetic configs)"
  for shape in tiny 3b 7b; do
    for extra in "" "--act_order" "--groupsize 32" "--groupsize 32 --act_order"; do
      echo "==== synthetic $shape $extra"
      python benchmark.py --synthetic "$shape" $extra -v || \
        echo " !! FAILED: $shape $extra"
    done
  done
fi
