#!/bin/bash
# Perplexity sweep (analogue of reference sh/test_benchmark_ppl.sh):
# wikitext2 sample ppl per checkpoint; add -ds for other corpora
# (datasets/download_datasets.py fetches them).
set -u
DS="${DS:-datasets/wikitext2_val_sample.jsonl}"
for d in "$@"; do
  echo "==== $d"
  python benchmark.py -d "$d" -ppl -ds "$DS"
done
