#!/bin/bash
# Round-5 frontier, part 3: canonical per-example re-runs of the best
# zero-added-latency geometry found by the manual probes — ctx_left
# sized so the TOTAL window is ~1 s (41472 + seg + ctx; longer past
# context dilutes into zero-padding on short utterances) + join
# crossfade — at the 148 ms and 84 ms budgets.
cd /root/repo
V2=runs/eval_manifest_v2.json
CK=runs/unet4crop2s-mrstft-30k.npz

run () {  # $1 name-suffix  $2... extra eval flags
  local name=unet4crop2s-mrstft-30k-stream-$1; shift
  timeout 3600 python -m audio_denoising_tpu eval --model $CK \
    --manifest $V2 --streamed "$@" \
    --save-per-example runs/eval_v2/${name}.npz \
    > /tmp/eval_${name}.log 2>&1
  echo "stream eval $name rc=$?" >> /tmp/r5_stream_frontier3.log
}

echo "frontier3 start $(date)" >> /tmp/r5_stream_frontier3.log
run s16c960ctxl41472xf384 --unet-seg-hops 16 --unet-ctx 960 \
    --unet-ctx-left 41472 --unet-xfade 384
run s8c960ctxl44544xf384 --unet-seg-hops 8 --unet-ctx 960 \
    --unet-ctx-left 44544 --unet-xfade 384
run s16c960ctxl41472xf960 --unet-seg-hops 16 --unet-ctx 960 \
    --unet-ctx-left 41472 --unet-xfade 960
touch /tmp/r5_stream_frontier3_done
echo "frontier3 done $(date)" >> /tmp/r5_stream_frontier3.log
