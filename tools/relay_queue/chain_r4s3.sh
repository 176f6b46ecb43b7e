#!/bin/bash
# Round-4 session-3 chip chain: the relay is UP (probed 13:56). Run the
# whole backlog in strict order on the single chip:
#   1. bench.py capture (+ variants)            -> /tmp/bench_r4_*.json
#   2. int8 fused on-chip validation            -> /tmp/int8_fused_onchip.json
#   3. training queue (segmented, 5 runs)       -> runs/*.npz
#   4. eval queue (CPU-forced; relay-independent)
# Every stage logs to /tmp/r4s3_chain.log.
cd /root/repo
LOG=/tmp/r4s3_chain.log
echo "chain start $(date)" > $LOG

timeout 1800 python bench.py > /tmp/bench_r4_first.json 2> /tmp/bench_r4_first.err
echo "bench rc=$? at $(date)" >> $LOG
cat /tmp/bench_r4_first.json >> $LOG

ADT_BENCH_VARIANTS=1 timeout 2400 python bench.py > /tmp/bench_r4_variants.json 2> /tmp/bench_r4_variants.err
echo "bench variants rc=$? at $(date)" >> $LOG
cat /tmp/bench_r4_variants.json >> $LOG

timeout 1800 python tools/validate_int8_fused.py > /tmp/int8_fused_onchip.json 2> /tmp/int8_fused_onchip.err
echo "int8 validate rc=$? at $(date)" >> $LOG
cat /tmp/int8_fused_onchip.json >> $LOG

tools/relay_queue/train_queue.sh >> $LOG 2>&1
echo "train queue done at $(date)" >> $LOG

tools/relay_queue/eval_queue.sh >> $LOG 2>&1
echo "eval queue done at $(date)" >> $LOG
touch /tmp/r4s3_chain_done
