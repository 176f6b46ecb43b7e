#!/bin/bash
# Round-4 session 4: the crop axis is live for the stateless family
# (2-s crops beat 1-s on every metric, paired — BENCHMARKS). Probe 4 s
# at constant samples/step (batch 4). Waits for the idp25 run to free
# the chip, then trains segmented like train_queue.sh.
cd /root/repo
while [ ! -f /tmp/train_idp25_done ]; do sleep 120; done
DATA=/root/reference/data/uncompressed/cats
NOISE=/root/reference/data/uncompressed/kaggle_audioNoiseDataset
COMMON="--data $DATA --noise-dir $NOISE --objective recon_mrstft --lr-gamma 0.97 --device-data --log-every 500"

seg_train () {
  local out=$1; local total=$2; shift 2
  local ckpt=""
  local done=0
  local seg=0
  local fails=0
  while [ $done -lt $total ]; do
    seg=$((seg+1))
    local n=$(( total - done > 10000 ? 10000 : total - done ))
    local res=""
    if [ -n "$ckpt" ]; then res="--resume $ckpt"; fi
    timeout 2000 python -m audio_denoising_tpu train $COMMON "$@" \
      --iters $n --save runs/${out}-seg$seg.npz $res \
      >> /tmp/train_${out}.log 2>&1
    if [ -f runs/${out}-seg$seg.npz ]; then
      ckpt=runs/${out}-seg$seg.npz
      done=$((done + n))
      fails=0
    else
      fails=$((fails+1))
      echo "segment $seg of $out failed ($fails consecutive)" \
        >> /tmp/train_${out}.log
      if [ $fails -ge 5 ]; then
        echo "giving up on $out after 5 consecutive deterministic failures" \
          >> /tmp/train_${out}.log
        break
      fi
      until timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; do
        echo "relay unhealthy; waiting before retry ($(date +%T))" >> /tmp/train_${out}.log
        sleep 60
      done
    fi
  done
  if [ -n "$ckpt" ] && [ $done -ge $total ]; then
    cp $ckpt runs/${out}.npz
    rm -f runs/${out}-seg*.npz
  fi
}

seg_train unet4crop4s-mrstft-30k 30000 \
  --preset unet4-raw480 --snr-range -10 15 --crop-samples 192000 --batch-size 4

touch /tmp/train_unet4crop4s_done
