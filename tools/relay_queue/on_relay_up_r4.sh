#!/bin/bash
# Round-4 relay watchdog: wait for the poller's flag, then (1) capture the
# benchmark, (2) run the training queue.
while [ ! -f /tmp/relay_up ]; do sleep 20; done
cd /root/repo
echo "relay up at $(date)" > /tmp/r4_watchdog.log
timeout 1800 python bench.py > /tmp/bench_r4_first.json 2> /tmp/bench_r4_first.err
echo "bench rc=$?" >> /tmp/r4_watchdog.log
ADT_BENCH_VARIANTS=1 timeout 2400 python bench.py > /tmp/bench_r4_variants.json 2> /tmp/bench_r4_variants.err
echo "bench variants rc=$?" >> /tmp/r4_watchdog.log
/root/repo/tools/relay_queue/train_queue.sh >> /tmp/r4_watchdog.log 2>&1
echo "train queue done at $(date)" >> /tmp/r4_watchdog.log
