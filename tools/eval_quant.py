#!/usr/bin/env python
"""Quality delta of W8A8 serving (runtime/quant.py) vs fp32.

Runs a checkpoint through the offline denoise chain twice — fp32
PlanModel and PlanModel(quantized=True) — over manifest mixtures and
reports paired SI-SDR deltas + waveform agreement. CPU-safe
(ADT_FORCE_CPU honored); one block per SNR bracket by default to keep
the sweep short.

  python tools/eval_quant.py runs/gruunet2mel128w64-mrstft-50k.npz \
      --manifest runs/eval_manifest_v2.json [--full]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if os.environ.get("ADT_FORCE_CPU") == "1":
    # relay-outage escape hatch (cli.py:118): in-process, before any
    # backend init — shell-level JAX_PLATFORMS does not stick here
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("--manifest", default="runs/eval_manifest_v2.json")
    p.add_argument("--full", action="store_true",
                   help="all manifest blocks (default: one per SNR bracket)")
    args = p.parse_args()

    import jax.numpy as jnp
    from audio_denoising_tpu.apps.evaluate import build_manifest_set
    from audio_denoising_tpu.train.eval_metrics import si_sdr_db
    from audio_denoising_tpu.apps.offline import denoise_array
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.ops.resample import resample
    from audio_denoising_tpu.runtime.plan import PlanModel

    manifest = json.load(open(args.manifest))
    if not args.full:
        seen, blocks = set(), []
        for b in manifest["blocks"]:
            key = b.get("target_snr_db", b.get("noise_gain"))
            if key not in seen:
                seen.add(key)
                blocks.append(b)
        manifest["blocks"] = blocks
    mixture, clean, gains, src_sr, digest = build_manifest_set(manifest)

    cfg, model, params = load_pretrained(args.ckpt)
    sr = cfg.dsp.sample_rate
    # metrics at the model's rate, exactly like evaluate_manifest
    if src_sr != sr:
        mixture = np.asarray(resample(jnp.asarray(mixture), src_sr, sr))
        clean = np.asarray(resample(jnp.asarray(clean), src_sr, sr))
    crop = mixture.shape[-1]
    pm_fp = PlanModel(model, params)
    pm_q = PlanModel(model, params, quantized=True)

    d_fp, d_q, agree = [], [], []
    for i in range(len(mixture)):
        o_fp = np.asarray(denoise_array(cfg, pm_fp, None, mixture[i],
                                        sr))[:crop]
        o_q = np.asarray(denoise_array(cfg, pm_q, None, mixture[i],
                                       sr))[:crop]
        cl = jnp.asarray(clean[i][None, :len(o_fp)])
        d_fp.append(float(si_sdr_db(cl, jnp.asarray(o_fp[None]))[0]))
        d_q.append(float(si_sdr_db(cl, jnp.asarray(o_q[None]))[0]))
        agree.append(10 * np.log10(
            np.sum(o_fp ** 2)
            / max(np.sum((o_fp - o_q) ** 2), 1e-20)))
    d_fp, d_q = np.array(d_fp), np.array(d_q)
    delta = d_q - d_fp
    print(json.dumps({
        "ckpt": args.ckpt, "n": len(mixture),
        "si_sdr_fp32_mean": round(float(d_fp.mean()), 3),
        "si_sdr_int8_mean": round(float(d_q.mean()), 3),
        "paired_delta_mean": round(float(delta.mean()), 3),
        "paired_delta_std": round(float(delta.std()), 3),
        "paired_delta_worst": round(float(delta.min()), 3),
        "agreement_db_median": round(float(np.median(agree)), 1),
        "agreement_db_min": round(float(np.min(agree)), 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
