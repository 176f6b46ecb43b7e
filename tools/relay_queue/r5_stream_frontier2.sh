#!/bin/bash
# Round-5 frontier, part 2: the zero-added-latency serving knobs at the
# 148 ms point (seg 16 / ctx 960) — crossfade width and latency-free
# PAST context — with per-example vectors for paired compares (part 1
# ran them without saves).
cd /root/repo
V2=runs/eval_manifest_v2.json
CK=runs/unet4crop2s-mrstft-30k.npz

run () {  # $1 name-suffix  $2... extra eval flags
  local name=unet4crop2s-mrstft-30k-stream-$1; shift
  timeout 3600 python -m audio_denoising_tpu eval --model $CK \
    --manifest $V2 --streamed --unet-seg-hops 16 --unet-ctx 960 "$@" \
    --save-per-example runs/eval_v2/${name}.npz \
    > /tmp/eval_${name}.log 2>&1
  echo "stream eval $name rc=$?" >> /tmp/r5_stream_frontier2.log
}

echo "frontier2 start $(date)" >> /tmp/r5_stream_frontier2.log
run s16c960xf960 --unet-xfade 960
run s16c960ctxl48k --unet-ctx-left 48000
run s16c960ctxl96k --unet-ctx-left 96000
run s16c960ctxl48kxf960 --unet-ctx-left 48000 --unet-xfade 960
# the best-combined geometry one step down the latency axis (84 ms)
run s8c960ctxl48kxf960 --unet-seg-hops 8 --unet-ctx-left 48000 --unet-xfade 960
touch /tmp/r5_stream_frontier2_done
echo "frontier2 done $(date)" >> /tmp/r5_stream_frontier2.log
