#!/bin/bash
# Round-4 session 4: escalate the near-clean fix. Diagnosis (per-bracket
# mel-128 oracle on manifest v2: +8.98 dB ceiling at the +10 dB bracket)
# says the flagship's -2.9 dB there is model over-suppression, not basis
# loss — so train it out: identity-prob 0.25 (2.5x the idp-0.10 run that
# only moved the bracket -3.17 -> -2.93) and curriculum extended to
# +40 dB input SNR.
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

seg_train gruunet2mel128w64-mrstft-idp25-50k 50000 \
  --preset gruunet2-mel128 --hidden 64 --snr-range -10 40 --identity-prob 0.25

touch /tmp/train_idp25_done
