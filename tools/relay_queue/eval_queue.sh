#!/bin/bash
# Round-4 post-training evaluation queue — runs after train_queue.sh.
# CPU-forced (ADT_FORCE_CPU=1): the relay is only needed for training;
# manifest evals ran on CPU throughout the round-4 outage.
#
# For each checkpoint the training queue produced, capture:
#   - per-SNR-bracket CIs on the frozen v2 manifest (eval --manifest)
#   - the paired comparison against the relevant incumbent (compare)
# Logs under /tmp/eval_<name>.log; per-example npz under runs/eval_v2/.
cd /root/repo
export ADT_FORCE_CPU=1
V2=runs/eval_manifest_v2.json
V3=runs/eval_manifest_v3_16k.json

run_eval () {  # $1 ckpt  $2 manifest  $3... extra flags
  local ckpt=$1 manifest=$2; shift 2
  [ -f "$ckpt" ] || { echo "skip: $ckpt missing" >> /tmp/eval_queue.log; return; }
  local name=$(basename "$ckpt" .npz)
  local tag=$(basename "$manifest" .json | sed 's/eval_manifest_//')
  timeout 7200 python -m audio_denoising_tpu eval --model "$ckpt" \
    --manifest "$manifest" "$@" \
    --save-per-example runs/eval_${tag}/${name}.npz \
    > /tmp/eval_${name}_${tag}.log 2>&1
  echo "eval $name @$tag rc=$?" >> /tmp/eval_queue.log
}

run_eval_gated () {  # $1 ckpt  $2 manifest  $3 gate_db  $4 width_db
  local ckpt=$1 manifest=$2 gate=$3 width=$4
  [ -f "$ckpt" ] || { echo "skip: $ckpt missing" >> /tmp/eval_queue.log; return; }
  local name=$(basename "$ckpt" .npz)-gate${gate}w${width}
  local tag=$(basename "$manifest" .json | sed 's/eval_manifest_//')
  timeout 7200 python -m audio_denoising_tpu eval --model "$ckpt" \
    --manifest "$manifest" --snr-gate "$gate" --snr-gate-width "$width" \
    --save-per-example runs/eval_${tag}/${name}.npz \
    > /tmp/eval_${name}_${tag}.log 2>&1
  echo "eval $name @$tag rc=$?" >> /tmp/eval_queue.log
}

run_compare () {  # $1 ckpt_a  $2 ckpt_b  $3 manifest
  [ -f "$1" ] && [ -f "$2" ] || { echo "skip compare: $1 vs $2" >> /tmp/eval_queue.log; return; }
  local name=$(basename "$1" .npz)-vs-$(basename "$2" .npz)
  timeout 7200 python -m audio_denoising_tpu compare "$1" "$2" \
    --manifest "$3" > /tmp/compare_${name}.log 2>&1
  echo "compare $name rc=$?" >> /tmp/eval_queue.log
}

echo "eval queue start $(date)" >> /tmp/eval_queue.log
FLAG=runs/gruunet2mel128w64-mrstft-50k.npz

# 1. idp flagship (VERDICT #1 training prong): brackets with AND without
#    the serving gate, plus paired-vs-incumbent
run_eval runs/gruunet2mel128w64-mrstft-idp-50k.npz $V2
run_compare runs/gruunet2mel128w64-mrstft-idp-50k.npz $FLAG $V2
# serving-gate prong (tuned on runs/snr_gate_tuning.json: gate8_w4 best
# mean; VERDICT #1 'done' = +10 dB bracket >= 0): idp ckpt AND the r3
# incumbent, both gated, so the training and serving prongs separate
run_eval_gated runs/gruunet2mel128w64-mrstft-idp-50k.npz $V2 8 4
run_eval_gated $FLAG $V2 8 4

# 2. d5 depth verdict
run_eval runs/gruunet2mel128d5w64-mrstft-50k.npz $V2
run_compare runs/gruunet2mel128d5w64-mrstft-50k.npz $FLAG $V2

# 3. unet4 2-s crops
run_eval runs/unet4crop2s-mrstft-30k.npz $V2
run_compare runs/unet4crop2s-mrstft-30k.npz runs/unet4-mrstft-30k.npz $V2

# 4. mrstft-weight 2.0
run_eval runs/gruunet2mel128w64-mrstft2x-50k.npz $V2
run_compare runs/gruunet2mel128w64-mrstft2x-50k.npz $FLAG $V2

# 5. 16 kHz-native causal flagship on the 16 kHz surface, vs the current
#    16 kHz champions (unet4 basis-48k and trunet native-16k)
run_eval runs/gruunet2s16kw40-mrstft-idp-50k.npz $V3
run_compare runs/gruunet2s16kw40-mrstft-idp-50k.npz runs/unet4-mrstft-30k.npz $V3
run_compare runs/gruunet2s16kw40-mrstft-idp-50k.npz runs/trunet-realnoise.npz $V3

echo "eval queue done $(date)" >> /tmp/eval_queue.log
touch /tmp/eval_queue_done
