#!/bin/bash
# Round-5 segment-family latency frontier: the unet4crop2s flagship
# evaluated through the cadence-locked STREAMING window chain at five
# latency budgets (seg_hops * 384 + ctx samples @48 kHz), on the frozen
# v2 manifest with per-example vectors for paired compares.
cd /root/repo
V2=runs/eval_manifest_v2.json
CK=runs/unet4crop2s-mrstft-30k.npz

run () {  # $1 seg_hops  $2 ctx
  local s=$1 c=$2
  local name=unet4crop2s-mrstft-30k-stream-s${s}c${c}
  timeout 3600 python -m audio_denoising_tpu eval --model $CK \
    --manifest $V2 --streamed --unet-seg-hops $s --unet-ctx $c \
    --save-per-example runs/eval_v2/${name}.npz \
    > /tmp/eval_${name}.log 2>&1
  echo "stream eval s=$s c=$c rc=$?" >> /tmp/r5_stream_frontier.log
}

echo "stream frontier start $(date)" >> /tmp/r5_stream_frontier.log
run 4 960      #  52 ms
run 8 960      #  84 ms
run 16 960     # 148 ms (the serving default)
run 24 2880    # 252 ms
run 48 5760    # 504 ms
touch /tmp/r5_stream_frontier_done
echo "stream frontier done $(date)" >> /tmp/r5_stream_frontier.log
