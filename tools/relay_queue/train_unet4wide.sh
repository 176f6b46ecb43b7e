#!/bin/bash
# Round-4 session-5 capacity probe: UNet2d4Wide (unet2.py's 64/64/128/128/
# 256/256 channel ladder, reference unet2.py:24-60 — defined but never
# trained there) with the crop2s champion recipe. Segmented 5k-iter chunks
# under timeout (relay-wedge mitigation, CLAUDE.md); --resume is bit-exact,
# so a partial run is resumable next round.
cd /root/repo
# Stale done flags from a prior run would make eval_unet4wide.sh proceed
# against an old/partial checkpoint — clear them up front (ADVICE r4).
rm -f /tmp/train_unet4wide_done /tmp/eval_unet4wide_done
DATA=/root/reference/data/uncompressed/cats
NOISE=/root/reference/data/uncompressed/kaggle_audioNoiseDataset
COMMON="--data $DATA --noise-dir $NOISE --objective recon_mrstft --lr-gamma 0.97 --device-data --log-every 500"

seg_train () {  # $1 out-prefix  $2 total-iters  $3 seg-iters  $4... extra flags
  local out=$1; local total=$2; local segn=$3; shift 3
  local ckpt=""
  local done=0
  local seg=0
  local fails=0
  while [ $done -lt $total ]; do
    seg=$((seg+1))
    local n=$(( total - done > segn ? segn : total - done ))
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
        echo "giving up on $out after 5 consecutive failures" \
          >> /tmp/train_${out}.log
        break
      fi
      # Bounded health wait (ADVICE r4): give up after ~4 h so a dead
      # relay can't stall everything chained after this queue entry.
      local waited=0
      until timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; do
        echo "relay unhealthy; waiting before retry ($(date +%T))" >> /tmp/train_${out}.log
        waited=$((waited + 180))
        if [ $waited -ge 14400 ]; then
          echo "relay down >4h; abandoning $out" >> /tmp/train_${out}.log
          return 1
        fi
        sleep 60
      done
    fi
  done
  if [ -n "$ckpt" ] && [ $done -ge $total ]; then
    cp $ckpt runs/${out}.npz
    rm -f runs/${out}-seg*.npz
  fi
}

seg_train unet4wide-crop2s-mrstft-30k 30000 5000 \
  --preset unet4wide-raw480 --snr-range -10 15 --crop-samples 96000 --batch-size 8

touch /tmp/train_unet4wide_done
