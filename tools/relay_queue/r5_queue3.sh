#!/bin/bash
# Round-5 queue #3 — crop-length x serving-window midpoint probe.
#
# Finding that motivates this (BENCHMARKS frontier readings): the
# streamed-LSD gap is train/serve window-length mismatch — the 1-s-crop
# unet4 streams at LSD 1.34 (vs the 2-s flagship's 1.55) at equal
# SI-SDR. A 1.5-s crop served with a 1.5-s window probes whether the
# crop axis has a better streamed operating point between them:
# expectation is SI-SDR between +5.93 and +6.23 with LSD between 1.34
# and 1.55 if the tradeoff is smooth, or a dominant point if not.
cd /root/repo
V2=runs/eval_manifest_v2.json
DATA=/root/reference/data/uncompressed/cats
NOISE=/root/reference/data/uncompressed/kaggle_audioNoiseDataset
COMMON="--data $DATA --noise-dir $NOISE --objective recon_mrstft --lr-gamma 0.97 --device-data --log-every 500"

wait_relay () {
  local waited=0
  until timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; do
    waited=$((waited + 180)); [ $waited -ge 14400 ] && return 1; sleep 60
  done
  return 0
}

seg_train () {
  local out=$1; local total=$2; shift 2
  local ckpt=""; local done=0; local seg=0; local fails=0
  while [ $done -lt $total ]; do
    seg=$((seg+1))
    local n=$(( total - done > 10000 ? 10000 : total - done ))
    local res=""; [ -n "$ckpt" ] && res="--resume $ckpt"
    timeout 2600 python -m audio_denoising_tpu train $COMMON "$@" \
      --iters $n --save runs/${out}-seg$seg.npz $res \
      >> /tmp/train_${out}.log 2>&1
    if [ -f runs/${out}-seg$seg.npz ]; then
      ckpt=runs/${out}-seg$seg.npz; done=$((done + n)); fails=0
    else
      fails=$((fails+1))
      echo "segment $seg of $out failed ($fails)" >> /tmp/train_${out}.log
      [ $fails -ge 5 ] && break
      wait_relay || { echo "relay down >4h; abandoning $out" >> /tmp/train_${out}.log; break; }
    fi
  done
  if [ -n "$ckpt" ] && [ $done -ge $total ]; then
    cp $ckpt runs/${out}.npz
    rm -f runs/${out}-seg*.npz
  fi
}

seg_train unet4crop15s-mrstft-30k 30000 \
  --preset unet4-raw480 --snr-range -10 15 --crop-samples 72000 --batch-size 8

CK=runs/unet4crop15s-mrstft-30k.npz
[ -f $CK ] || { echo "no checkpoint; abort evals" >> /tmp/r5_queue3.log; exit 1; }
if ! timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
  export ADT_FORCE_CPU=1
fi

run_eval () {  # $1 name  $2... extra eval flags
  local name=$1; shift
  timeout 14400 python -m audio_denoising_tpu eval --model $CK --manifest $V2 \
    --save-per-example runs/eval_v2/${name}.npz "$@" \
    > /tmp/eval_${name}_v2.log 2>&1
  echo "eval $name rc=$?" >> /tmp/r5_queue3.log
}

run_eval unet4crop15s-mrstft-30k
# window-matched streamed geometry: total window = the 1.5-s crop
# (ctx_left 67968 = 72000 - 3072 - 960, a whole 177 hops)
run_eval unet4crop15s-mrstft-30k-stream-s8w15 --streamed --unet-seg-hops 8 \
  --unet-ctx 960 --unet-ctx-left 67968 --unet-xfade 384
# and at the ~1-s recommended window (is window-matching or absolute
# window length the binding variable?)
run_eval unet4crop15s-mrstft-30k-stream-s8rec --streamed --unet-seg-hops 8 \
  --unet-ctx 960 --unet-ctx-left 44544 --unet-xfade 384

touch /tmp/r5_queue3_done
echo "r5 queue3 done $(date)" >> /tmp/r5_queue3.log
