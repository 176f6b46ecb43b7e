"""Evaluation CLI: measure denoising quality on synthesized mixtures.

Builds (clean, mixture) pairs exactly like training (random corpus crops +
noise at controlled gains), runs the full offline pipeline, and reports
SI-SDR / SNR improvement (output vs input) and log-spectral distance —
the evaluation story the reference lacks entirely (its only metric is the
training-loss record inside checkpoints).
"""

import argparse
import glob
import json
import os

import numpy as np


def evaluate(spec: str, data_dir: str, n_examples: int = 16,
             crop_seconds: float = 2.0, noise_gain: float = 0.5,
             seed: int = 0):
    import jax.numpy as jnp
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.apps.offline import denoise_array
    from audio_denoising_tpu.train.data import MixtureSampler
    from audio_denoising_tpu.train.eval_metrics import (
        log_spectral_distance, si_sdr_db, snr_db)

    cfg, model, params = load_pretrained(spec)
    sr = cfg.dsp.sample_rate
    noise_dir = os.path.abspath(os.path.join(data_dir, "noise"))
    paths = sorted(
        p for p in glob.glob(os.path.join(data_dir, "**", "*.wav"),
                             recursive=True)
        if not os.path.abspath(p).startswith(noise_dir + os.sep))
    if not paths:
        raise FileNotFoundError(f"no WAVs under {data_dir}")

    # corpus may be at a different rate (the reference cats corpus is
    # 8 kHz): crop in SOURCE samples, then resample both sides to the
    # model's rate before comparing. Mixed-rate corpora would be
    # pitch-shifted by a single ratio, so keep only the first file's rate.
    from audio_denoising_tpu.io.cache import AudioCache
    from audio_denoising_tpu.ops.resample import resample
    src_sr = AudioCache.probe_rate(paths[0])   # header-only, no decode
    paths = [p for p in paths if AudioCache.probe_rate(p) == src_sr]
    crop = int(crop_seconds * src_sr)
    sampler = MixtureSampler(paths, crop_samples=crop,
                             batch_size=n_examples,
                             noise_gain=(noise_gain, noise_gain), seed=seed)
    mixture, clean = sampler.sample()
    if src_sr != sr:
        mixture = np.asarray(resample(jnp.asarray(mixture), src_sr, sr))
        clean = np.asarray(resample(jnp.asarray(clean), src_sr, sr))
        crop = mixture.shape[-1]

    outs = []
    for i in range(n_examples):
        out = denoise_array(cfg, model, params, mixture[i], sr)
        outs.append(out[:crop])
    est = jnp.asarray(np.stack(outs))
    mix = jnp.asarray(mixture)
    cl = jnp.asarray(clean)

    report = {
        "model": spec,
        "n_examples": n_examples,
        "noise_gain": noise_gain,
        "input_si_sdr_db": round(float(si_sdr_db(cl, mix).mean()), 3),
        "output_si_sdr_db": round(float(si_sdr_db(cl, est).mean()), 3),
        "input_snr_db": round(float(snr_db(cl, mix).mean()), 3),
        "output_snr_db": round(float(snr_db(cl, est).mean()), 3),
        "input_lsd": round(float(log_spectral_distance(cl, mix).mean()), 4),
        "output_lsd": round(float(log_spectral_distance(cl, est).mean()), 4),
    }
    report["si_sdr_improvement_db"] = round(
        report["output_si_sdr_db"] - report["input_si_sdr_db"], 3)
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="audio_denoising_tpu eval",
        description="Denoising quality on synthesized mixtures")
    p.add_argument("--model", default="gruunet2-good")
    p.add_argument("--data", required=True)
    p.add_argument("--examples", type=int, default=16)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--noise-gain", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    report = evaluate(args.model, args.data, args.examples, args.seconds,
                      args.noise_gain, args.seed)
    print(json.dumps(report, indent=2))
    return 0
