#!/bin/bash
# Round-5 queue #4 — can ONE stateless checkpoint own the whole streamed
# frontier?
#
# Motivation (BENCHMARKS frontier readings): the streamed family forces
# a choice — the 2-s-crop flagship wins SI-SDR (+6.23 @84 ms) but
# streams at LSD 1.55; the 1-s-crop model streams at LSD 1.34 (its crop
# matches the ~1-s serving window) at equal SI-SDR. The 1.5-s midpoint
# probe (queue #3) is dominated, so interpolating the crop does NOT
# work. Two remaining hypotheses, both train/serve-window stories:
#   (a) serve-window FINE-TUNE: 5k extra iters on 1-s crops starting
#       from the 2-s flagship teaches the serving window while keeping
#       the 2-s representation (runs/unet4crop2s-ft1s-5k.npz);
#   (b) mixed-crop CURRICULUM: 30k fresh iters alternating 5k segments
#       of 2-s and 1-s crops — the model sees BOTH window lengths
#       (runs/unet4cropmix-30k.npz).
# Plus (c) a convergence check on the offline champion: +30k more iters
# on the identical 2-s recipe (runs/unet4crop2s-mrstft-60k.npz) — the
# 1-s model was converged at 30k (60k null), the 2-s point never tested.
cd /root/repo
V2=runs/eval_manifest_v2.json
DATA=/root/reference/data/uncompressed/cats
NOISE=/root/reference/data/uncompressed/kaggle_audioNoiseDataset
COMMON="--data $DATA --noise-dir $NOISE --objective recon_mrstft --lr-gamma 0.97 --device-data --log-every 500"
FLAGSHIP=runs/unet4crop2s-mrstft-30k.npz

wait_relay () {
  local waited=0
  until timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; do
    waited=$((waited + 180)); [ $waited -ge 14400 ] && return 1; sleep 60
  done
  return 0
}

# seg_step OUT SEGNAME RESUME N EXTRA... — one bounded training segment
# with retry; echoes the produced checkpoint path on success.
seg_step () {
  local out=$1 segname=$2 resume=$3 n=$4; shift 4
  local fails=0
  while :; do
    local res=""; [ -n "$resume" ] && res="--resume $resume"
    timeout 2600 python -m audio_denoising_tpu train $COMMON "$@" \
      --iters $n --save runs/${segname}.npz $res \
      >> /tmp/train_${out}.log 2>&1
    if [ -f runs/${segname}.npz ]; then echo runs/${segname}.npz; return 0; fi
    fails=$((fails+1))
    echo "segment $segname failed ($fails)" >> /tmp/train_${out}.log
    [ $fails -ge 5 ] && return 1
    wait_relay || { echo "relay down >4h; abandoning $out" >> /tmp/train_${out}.log; return 1; }
  done
}

# (a) serve-window fine-tune: one 5k segment at 1-s crops from the flagship.
if ck=$(seg_step unet4crop2s-ft1s-5k ft1s-seg1 $FLAGSHIP 5000 \
    --preset unet4-raw480 --snr-range -10 15 --crop-samples 48000 --batch-size 8); then
  cp $ck runs/unet4crop2s-ft1s-5k.npz && rm -f runs/ft1s-seg1.npz
fi

# (b) mixed-crop curriculum: 6 alternating 5k segments (2s,1s,...).
ck=""
ok=1
for i in 1 2 3 4 5 6; do
  if [ $((i % 2)) -eq 1 ]; then crop=96000; else crop=48000; fi
  if ck=$(seg_step unet4cropmix-30k cropmix-seg$i "$ck" 5000 \
      --preset unet4-raw480 --snr-range -10 15 --crop-samples $crop --batch-size 8); then
    :
  else ok=0; break; fi
done
if [ $ok -eq 1 ] && [ -n "$ck" ]; then
  cp $ck runs/unet4cropmix-30k.npz && rm -f runs/cropmix-seg*.npz
fi

# (c) convergence check: +30k more on the identical 2-s recipe.
ck=$FLAGSHIP
ok=1
for i in 1 2 3; do
  if ck=$(seg_step unet4crop2s-mrstft-60k c2s60k-seg$i "$ck" 10000 \
      --preset unet4-raw480 --snr-range -10 15 --crop-samples 96000 --batch-size 8); then
    :
  else ok=0; break; fi
done
if [ $ok -eq 1 ]; then
  cp $ck runs/unet4crop2s-mrstft-60k.npz && rm -f runs/c2s60k-seg*.npz
fi

# Evals: offline + recommended-geometry streamed for (a)/(b); offline for (c).
if ! timeout 120 python -c "import jax, jax.numpy as j; (j.ones((8,8))@j.ones((8,8))).block_until_ready()" >/dev/null 2>&1; then
  export ADT_FORCE_CPU=1
fi
run_eval () {  # $1 ckpt  $2 name  $3... extra eval flags
  local ckpt=$1 name=$2; shift 2
  [ -f "$ckpt" ] || { echo "eval $name SKIPPED (no ckpt)" >> /tmp/r5_queue4.log; return; }
  timeout 14400 python -m audio_denoising_tpu eval --model $ckpt --manifest $V2 \
    --save-per-example runs/eval_v2/${name}.npz "$@" \
    > /tmp/eval_${name}_v2.log 2>&1
  echo "eval $name rc=$?" >> /tmp/r5_queue4.log
}
STREAM="--streamed --unet-seg-hops 8 --unet-ctx 960 --unet-ctx-left 44544 --unet-xfade 384"

run_eval runs/unet4crop2s-ft1s-5k.npz unet4crop2s-ft1s-5k
run_eval runs/unet4crop2s-ft1s-5k.npz unet4crop2s-ft1s-5k-stream-s8rec $STREAM
run_eval runs/unet4cropmix-30k.npz unet4cropmix-30k
run_eval runs/unet4cropmix-30k.npz unet4cropmix-30k-stream-s8rec $STREAM
run_eval runs/unet4crop2s-mrstft-60k.npz unet4crop2s-mrstft-60k

touch /tmp/r5_queue4_done
echo "r5 queue4 done $(date)" >> /tmp/r5_queue4.log
