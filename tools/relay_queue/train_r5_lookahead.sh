#!/bin/bash
# Round-5 queue #1 — the latency-quality frontier (VERDICT r4 #1).
#
# Four bounded-lookahead flagship trainings, IDENTICAL to the round-3
# flagship recipe (gruunet2-mel128 / hidden 64 / recon_mrstft /
# snr -10 15 / 50k) except for ModelConfig.lookahead_frames, so paired
# v2 deltas isolate the lookahead axis alone:
#   k=4  ->  42.7 ms of future context (512-sample hop @ 48 kHz)
#   k=10 -> 106.7 ms
#   k=24 -> 256.0 ms
#   k=48 -> 512.0 ms
# Segmented 10k-iter chunks under timeout (relay-wedge mitigation,
# CLAUDE.md); --resume is bit-exact.
#
# ADVICE r4 fixes baked in: done flags cleared at start; the relay
# health wait is BOUNDED (gives up after MAX_WAIT_S so a dead relay
# cannot stall the queue forever).
cd /root/repo
DATA=/root/reference/data/uncompressed/cats
NOISE=/root/reference/data/uncompressed/kaggle_audioNoiseDataset
COMMON="--data $DATA --noise-dir $NOISE --objective recon_mrstft --lr-gamma 0.97 --device-data --log-every 500"
MAX_WAIT_S=14400   # 4 h of relay-down tolerance, then the queue advances

rm -f /tmp/train_r5_lookahead_done /tmp/train_r5_la*_done

wait_relay () {  # bounded health wait; returns 1 on timeout
  local waited=0
  until timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; do
    waited=$((waited + 180))
    if [ $waited -ge $MAX_WAIT_S ]; then return 1; fi
    echo "relay unhealthy; waiting ($(date +%T))" >> /tmp/train_r5.log
    sleep 60
  done
  return 0
}

seg_train () {  # $1 out-prefix  $2 total-iters  $3... extra flags
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
    # ctx.save is ATOMIC (tmp+rename), so existence implies integrity
    if [ -f runs/${out}-seg$seg.npz ]; then
      ckpt=runs/${out}-seg$seg.npz
      done=$((done + n))
      fails=0
    else
      fails=$((fails+1))
      echo "segment $seg of $out failed ($fails consecutive)" \
        >> /tmp/train_${out}.log
      if [ $fails -ge 5 ]; then
        echo "giving up on $out after 5 consecutive failures with a healthy relay" \
          >> /tmp/train_${out}.log
        break
      fi
      if ! wait_relay; then
        echo "relay down >$MAX_WAIT_S s; abandoning $out" \
          >> /tmp/train_${out}.log
        break
      fi
    fi
  done
  if [ -n "$ckpt" ] && [ $done -ge $total ]; then
    cp $ckpt runs/${out}.npz
    rm -f runs/${out}-seg*.npz
    touch /tmp/train_r5_${out##gruunet2mel128w64-mrstft-}_done
  fi
}

seg_train gruunet2mel128w64-mrstft-la4-50k  50000 \
  --preset gruunet2-mel128 --hidden 64 --snr-range -10 15 --lookahead 4
seg_train gruunet2mel128w64-mrstft-la10-50k 50000 \
  --preset gruunet2-mel128 --hidden 64 --snr-range -10 15 --lookahead 10
seg_train gruunet2mel128w64-mrstft-la24-50k 50000 \
  --preset gruunet2-mel128 --hidden 64 --snr-range -10 15 --lookahead 24
seg_train gruunet2mel128w64-mrstft-la48-50k 50000 \
  --preset gruunet2-mel128 --hidden 64 --snr-range -10 15 --lookahead 48

touch /tmp/train_r5_lookahead_done
