#!/bin/bash
# Session-5 follow-up: once train_unet4wide.sh finishes, eval the wide
# stateless probe on the frozen v2 manifest and pair it against the
# overall flagship (unet4crop2s). CPU-forced — no relay needed.
cd /root/repo
export ADT_FORCE_CPU=1
V2=runs/eval_manifest_v2.json
CKPT=runs/unet4wide-crop2s-mrstft-30k.npz
INCUMBENT=runs/unet4crop2s-mrstft-30k.npz

# Wait for the training queue (up to 3 h), then fall back to the newest
# completed segment if the full 30k never lands.
for i in $(seq 1 180); do
  [ -f /tmp/train_unet4wide_done ] && break
  sleep 60
done
if [ ! -f "$CKPT" ]; then
  # The trainer deletes seg intermediates when the full run consolidates;
  # copy the fallback to a scratch path so a mid-eval 'rm' can't race us
  # (ADVICE r4), and prefer the final checkpoint if it appeared meanwhile.
  last=$(ls -t runs/unet4wide-crop2s-mrstft-30k-seg*.npz 2>/dev/null | head -1)
  if [ -n "$last" ]; then
    cp "$last" /tmp/unet4wide-fallback.npz 2>/dev/null || true
    [ -f "$CKPT" ] || CKPT=/tmp/unet4wide-fallback.npz
  fi
fi
[ -f "$CKPT" ] || { echo "no wide checkpoint produced" > /tmp/eval_unet4wide.log; exit 1; }

name=$(basename "$CKPT" .npz)
timeout 7200 python -m audio_denoising_tpu eval --model "$CKPT" \
  --manifest $V2 --save-per-example runs/eval_v2/${name}.npz \
  > /tmp/eval_${name}_v2.log 2>&1
echo "eval $name rc=$?" >> /tmp/eval_unet4wide.log

timeout 7200 python -m audio_denoising_tpu compare "$CKPT" "$INCUMBENT" \
  --manifest $V2 > /tmp/compare_unet4wide_vs_crop2s.log 2>&1
echo "compare rc=$?" >> /tmp/eval_unet4wide.log
touch /tmp/eval_unet4wide_done
