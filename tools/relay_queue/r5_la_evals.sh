#!/bin/bash
# Round-5 lookahead evals, early pass: v2 manifest evals + paired
# compares for the la4/la10 checkpoints as soon as they exist (queue #2
# re-runs these later after ALL trainings finish; overwrites are
# idempotent — this pass just gets the frontier table written sooner).
cd /root/repo
V2=runs/eval_manifest_v2.json
FLAG=runs/gruunet2mel128w64-mrstft-50k.npz

# wait for frontier3 to release the chip
waited=0
until [ -f /tmp/r5_stream_frontier3_done ]; do
  sleep 60; waited=$((waited + 60))
  [ $waited -ge 3600 ] && break
done

for k in 4 10 24; do
  CK=runs/gruunet2mel128w64-mrstft-la${k}-50k.npz
  [ -f $CK ] || continue
  name=$(basename $CK .npz)
  timeout 3600 python -m audio_denoising_tpu eval --model $CK \
    --manifest $V2 --save-per-example runs/eval_v2/${name}.npz \
    > /tmp/eval_${name}_v2.log 2>&1
  echo "eval la$k rc=$?" >> /tmp/r5_la_evals.log
  timeout 3600 python -m audio_denoising_tpu compare $CK $FLAG \
    --manifest $V2 > /tmp/compare_${name}-vs-flagship.log 2>&1
  echo "compare la$k rc=$?" >> /tmp/r5_la_evals.log
done
touch /tmp/r5_la_evals_done
echo "la evals done $(date)" >> /tmp/r5_la_evals.log
