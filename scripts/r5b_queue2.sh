#!/bin/bash
# Second-stage probe queue: waits for r5b_queue.sh to drain, then runs the
# worst-ctx xla-attention A/B (AB_BEST2_XLA2048 set).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while ! grep -q "queue done" /tmp/r5b_queue.log 2>/dev/null; do sleep 20; done

if [ ! -f /tmp/r5b_done_xla2048 ]; then
  AB_BEST2_XLA2048=1 bash scripts/tpu_watchdog.sh /tmp/ab_best2_xla2048.log 900 2 \
    python -u scripts/ab_best2.py && touch /tmp/r5b_done_xla2048
fi
echo "queue2 done" >> /tmp/r5b_queue2.log
