#!/bin/bash
# Round-5b sequential TPU probe queue (one TPU job at a time; marker-gated
# so a relaunch skips finished jobs). Usage: bash scripts/r5b_queue.sh
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# wait for any existing ab_best2 run to finish
while ps aux | grep -q "[a]b_best2.py"; do sleep 20; done

if [ ! -f /tmp/r5b_done_default ]; then
  AB_BEST2_DEFAULT=1 bash scripts/tpu_watchdog.sh /tmp/ab_best2_default.log 900 2 \
    python -u scripts/ab_best2.py && touch /tmp/r5b_done_default
fi

if [ ! -f /tmp/r5b_done_b8attn ]; then
  AB_B8_ATTN=1 bash scripts/tpu_watchdog.sh /tmp/ab_b8_attn.log 900 2 \
    python -u scripts/ab_b8.py && touch /tmp/r5b_done_b8attn
fi

if [ ! -f /tmp/r5b_done_g32 ]; then
  bash scripts/tpu_watchdog.sh /tmp/micro_g32.log 900 2 \
    python -u scripts/micro_g32.py && touch /tmp/r5b_done_g32
fi
echo "queue done" >> /tmp/r5b_queue.log
