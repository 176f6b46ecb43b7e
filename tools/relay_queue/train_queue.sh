#!/bin/bash
# Round-4 training queue — run when the relay is up (watch /tmp/relay_up).
# Segmented 10k-iter chunks under timeout (relay-wedge mitigation,
# CLAUDE.md): a stall loses one segment; --resume is bit-exact.
cd /root/repo
DATA=/root/reference/data/uncompressed/cats
NOISE=/root/reference/data/uncompressed/kaggle_audioNoiseDataset
COMMON="--data $DATA --noise-dir $NOISE --objective recon_mrstft --lr-gamma 0.97 --device-data --log-every 500"

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
        echo "giving up on $out after 5 consecutive failures with a healthy relay (deterministic error); moving to next run" \
          >> /tmp/train_${out}.log
        break
      fi
      # a wedged/down relay must not burn the failure budget: wait for a
      # tiny jit to succeed before retrying (failures past this probe are
      # deterministic errors, which the cap above handles)
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

# 1. VERDICT #1: flagship + easy-input preservation (extended curriculum
#    above +15 dB AND identity examples)
seg_train gruunet2mel128w64-mrstft-idp-50k 50000 \
  --preset gruunet2-mel128 --hidden 64 --snr-range -10 30 --identity-prob 0.10

# 2. VERDICT #4: d5 depth run at mel-128/w64
seg_train gruunet2mel128d5w64-mrstft-50k 50000 \
  --preset gruunet2-mel128d5 --hidden 64 --snr-range -10 15

# 3. VERDICT #4: unet4 2-s crops
seg_train unet4crop2s-mrstft-30k 30000 \
  --preset unet4-raw480 --snr-range -10 15 --crop-samples 96000 --batch-size 8

# 4. VERDICT #4: mrstft-weight 2.0 at the flagship config
seg_train gruunet2mel128w64-mrstft2x-50k 50000 \
  --preset gruunet2-mel128 --hidden 64 --snr-range -10 15 --mrstft-weight 2.0

# 5. 16 kHz-NATIVE causal flagship (BASELINE north star is 256x16 kHz):
#    mel-64 at 16 kHz covers 0-8 kHz with the same bins-per-Hz as
#    mel-128 at 48 kHz; hidden 40 (mel-64 saturation point); idp + wide
#    curriculum like run 1. Eval on runs/eval_manifest_v3_16k.json.
seg_train gruunet2s16kw40-mrstft-idp-50k 50000 \
  --preset gruunet2-stream16k --hidden 40 --snr-range -10 30 \
  --identity-prob 0.10 --crop-samples 16000

touch /tmp/train_queue_done
