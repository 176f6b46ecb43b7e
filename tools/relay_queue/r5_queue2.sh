#!/bin/bash
# Round-5 queue #2 — distillation training (VERDICT r4 #5) + evals for
# every round-5 checkpoint (lookahead frontier + distilled student).
#
# Chains after train_r5_lookahead.sh (bounded wait on its done flag).
# Distillation: causal flagship recipe, target = the unet4crop2s
# teacher's denoised output (train/distill.py) — separates the causal
# family's optimization gap from its information gap.
# Evals are CPU-forced (the chip is only needed for training).
cd /root/repo
V2=runs/eval_manifest_v2.json
FLAG=runs/gruunet2mel128w64-mrstft-50k.npz
TEACHER=runs/unet4crop2s-mrstft-30k.npz
DATA=/root/reference/data/uncompressed/cats
NOISE=/root/reference/data/uncompressed/kaggle_audioNoiseDataset
COMMON="--data $DATA --noise-dir $NOISE --objective recon_mrstft --lr-gamma 0.97 --device-data --log-every 500"

rm -f /tmp/r5_queue2_done /tmp/train_r5_distill_done

# Bounded wait for queue #1 (6 h — four 50k trainings at ~45 ms/step
# finish in ~3 h on a healthy relay; a dead relay must not stall evals
# of whatever DID finish).
waited=0
until [ -f /tmp/train_r5_lookahead_done ]; do
  sleep 120
  waited=$((waited + 120))
  if [ $waited -ge 21600 ]; then
    echo "queue1 not done after 6 h; proceeding" >> /tmp/r5_queue2.log
    break
  fi
done

wait_relay () {
  local waited=0
  until timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; do
    waited=$((waited + 180))
    if [ $waited -ge 14400 ]; then return 1; fi
    sleep 60
  done
  return 0
}

seg_train () {  # $1 out-prefix  $2 total-iters  $3... extra flags
  local out=$1; local total=$2; shift 2
  local ckpt=""; local done=0; local seg=0; local fails=0
  while [ $done -lt $total ]; do
    seg=$((seg+1))
    local n=$(( total - done > 10000 ? 10000 : total - done ))
    local res=""
    if [ -n "$ckpt" ]; then res="--resume $ckpt"; fi
    timeout 2600 python -m audio_denoising_tpu train $COMMON "$@" \
      --iters $n --save runs/${out}-seg$seg.npz $res \
      >> /tmp/train_${out}.log 2>&1
    if [ -f runs/${out}-seg$seg.npz ]; then
      ckpt=runs/${out}-seg$seg.npz; done=$((done + n)); fails=0
    else
      fails=$((fails+1))
      echo "segment $seg of $out failed ($fails)" >> /tmp/train_${out}.log
      if [ $fails -ge 5 ]; then break; fi
      if ! wait_relay; then
        echo "relay down >4 h; abandoning $out" >> /tmp/train_${out}.log
        break
      fi
    fi
  done
  if [ -n "$ckpt" ] && [ $done -ge $total ]; then
    cp $ckpt runs/${out}.npz
    rm -f runs/${out}-seg*.npz
    touch /tmp/train_r5_distill_done
  fi
}

# Distillation student: identical flagship recipe except the target.
# Step pays the teacher's forward too (~2x step time; 50k ≈ 75-90 min).
seg_train gruunet2mel128w64-distill-50k 50000 \
  --preset gruunet2-mel128 --hidden 64 --snr-range -10 15 \
  --distill-from $TEACHER

# ---- evals ------------------------------------------------------------------
# On the chip when it answers (an eval is ~128 offline dispatches — minutes
# on the relay, an hour+ CPU-forced); fall back to CPU on a dead relay,
# the round-4 outage pattern.
if ! timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
  echo "relay down at eval time; CPU-forced evals" >> /tmp/r5_queue2.log
  export ADT_FORCE_CPU=1
fi

run_eval () {  # $1 ckpt
  local ckpt=$1
  [ -f "$ckpt" ] || { echo "skip eval: $ckpt" >> /tmp/r5_queue2.log; return; }
  local name=$(basename "$ckpt" .npz)
  timeout 7200 python -m audio_denoising_tpu eval --model "$ckpt" \
    --manifest $V2 --save-per-example runs/eval_v2/${name}.npz \
    > /tmp/eval_${name}_v2.log 2>&1
  echo "eval $name rc=$?" >> /tmp/r5_queue2.log
}

run_compare () {  # $1 a  $2 b
  [ -f "$1" ] && [ -f "$2" ] || { echo "skip cmp: $1 $2" >> /tmp/r5_queue2.log; return; }
  local name=$(basename "$1" .npz)-vs-$(basename "$2" .npz)
  timeout 7200 python -m audio_denoising_tpu compare "$1" "$2" \
    --manifest $V2 > /tmp/compare_${name}.log 2>&1
  echo "compare $name rc=$?" >> /tmp/r5_queue2.log
}

echo "r5 queue2 evals start $(date)" >> /tmp/r5_queue2.log
for k in 4 10 24 48; do
  CK=runs/gruunet2mel128w64-mrstft-la${k}-50k.npz
  run_eval $CK
  run_compare $CK $FLAG
done
# frontier endpoints: biggest lookahead vs the segment flagship
run_compare runs/gruunet2mel128w64-mrstft-la48-50k.npz $TEACHER

DIST=runs/gruunet2mel128w64-distill-50k.npz
run_eval $DIST
run_compare $DIST $FLAG

touch /tmp/r5_queue2_done
echo "r5 queue2 done $(date)" >> /tmp/r5_queue2.log
