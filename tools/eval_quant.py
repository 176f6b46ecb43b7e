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
import sys

import numpy as np


def sisdr(est, ref):
    L = min(len(est), len(ref))
    est = np.asarray(est[:L], np.float64)
    ref = np.asarray(ref[:L], np.float64)
    a = np.dot(est, ref) / max(np.dot(ref, ref), 1e-12)
    t = a * ref
    n = est - t
    return 10 * np.log10(max(np.dot(t, t), 1e-12)
                         / max(np.dot(n, n), 1e-12))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("--manifest", default="runs/eval_manifest_v2.json")
    p.add_argument("--full", action="store_true",
                   help="all manifest blocks (default: one per SNR bracket)")
    args = p.parse_args()

    from audio_denoising_tpu.apps.evaluate import build_manifest_set
    from audio_denoising_tpu.apps.offline import denoise_array
    from audio_denoising_tpu.hub import load_pretrained
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
    pm_fp = PlanModel(model, params)
    pm_q = PlanModel(model, params, quantized=True)

    d_fp, d_q, agree = [], [], []
    for i in range(len(mixture)):
        o_fp = denoise_array(cfg, pm_fp, None, mixture[i], src_sr)
        o_q = denoise_array(cfg, pm_q, None, mixture[i], src_sr)
        cl = np.asarray(clean[i])
        L = min(len(o_fp), len(cl), len(o_q))
        d_fp.append(sisdr(o_fp, cl))
        d_q.append(sisdr(o_q, cl))
        agree.append(10 * np.log10(
            np.sum(o_fp[:L] ** 2)
            / max(np.sum((o_fp[:L] - o_q[:L]) ** 2), 1e-20)))
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
