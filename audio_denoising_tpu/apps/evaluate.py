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
             seed: int = 0, noise_dir: str = None,
             reconstruction: str = None, gl_iters: int = None):
    """``noise_dir``: a real noise corpus (wav/mp3/webm — the reference's
    kaggle_audioNoiseDataset decodes through io/codec.py); None keeps the
    synthetic white+brown fallback. ``reconstruction``/``gl_iters``
    override the checkpoint's DSP back-end (e.g. 'griffin_lim' to evaluate
    the app2.py-style reconstruction instead of noisy-phase reuse)."""
    import dataclasses

    import jax.numpy as jnp
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.apps.offline import denoise_array
    from audio_denoising_tpu.train.data import MixtureSampler
    from audio_denoising_tpu.train.eval_metrics import (
        log_spectral_distance, si_sdr_db, snr_db)

    cfg, model, params = load_pretrained(spec)
    # Stateless U-Nets always reconstruct via noisy-phase iSTFT
    # (pipeline.offline_denoise_stateless); a GL override would be
    # silently ignored and then misattributed in the report.
    stateless = not hasattr(model, "init_state")
    if stateless and (reconstruction is not None or gl_iters is not None):
        raise ValueError(
            f"{spec} is a stateless U-Net: reconstruction is fixed to "
            "noisy-phase iSTFT; --reconstruction/--gl-iters do not apply")
    if reconstruction is not None or gl_iters is not None:
        dsp = dataclasses.replace(
            cfg.dsp,
            reconstruction=(reconstruction if reconstruction is not None
                            else cfg.dsp.reconstruction),
            griffin_lim_iters=(gl_iters if gl_iters is not None
                               else cfg.dsp.griffin_lim_iters))
        cfg = dataclasses.replace(cfg, dsp=dsp)
    sr = cfg.dsp.sample_rate
    excluded_noise_subdir = os.path.abspath(os.path.join(data_dir, "noise"))
    paths = sorted(
        p for p in glob.glob(os.path.join(data_dir, "**", "*.wav"),
                             recursive=True)
        if not os.path.abspath(p).startswith(excluded_noise_subdir + os.sep))
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
    noise_paths = ()
    if noise_dir:
        from audio_denoising_tpu.io.codec import list_decodable_audio
        noise_paths = list_decodable_audio(noise_dir)
        if not noise_paths:
            raise FileNotFoundError(f"no decodable noise under {noise_dir}")
    sampler = MixtureSampler(paths, noise_paths=noise_paths,
                             crop_samples=crop, batch_size=n_examples,
                             noise_gain=(noise_gain, noise_gain), seed=seed,
                             sample_rate=src_sr)
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

    # Level-matched estimate: the serving chain carries the reference's
    # loudness conventions (x3 output gain + leaky-relu suppression,
    # server.py:213), so absolute level is a convention, not quality.
    # SNR/LSD are level-sensitive; report them against the least-squares
    # projection alpha = <clean, est>/|est|^2 as well (the same scale
    # alignment SI-SDR performs internally).
    alpha = (cl * est).sum(-1, keepdims=True) / (
        (est * est).sum(-1, keepdims=True) + 1e-8)
    est_matched = est * alpha

    report = {
        "model": spec,
        "n_examples": n_examples,
        "noise_gain": noise_gain,
        "noise_source": (os.path.basename(os.path.normpath(noise_dir))
                         if noise_dir else "synthetic white+brown"),
        "reconstruction": ("phase" if stateless else cfg.dsp.reconstruction),
        "input_si_sdr_db": round(float(si_sdr_db(cl, mix).mean()), 3),
        "output_si_sdr_db": round(float(si_sdr_db(cl, est).mean()), 3),
        "input_snr_db": round(float(snr_db(cl, mix).mean()), 3),
        "output_snr_db": round(float(snr_db(cl, est).mean()), 3),
        "output_snr_matched_db": round(
            float(snr_db(cl, est_matched).mean()), 3),
        "input_lsd": round(float(log_spectral_distance(cl, mix).mean()), 4),
        "output_lsd": round(float(log_spectral_distance(cl, est).mean()), 4),
        "output_lsd_matched": round(
            float(log_spectral_distance(cl, est_matched).mean()), 4),
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
    p.add_argument("--noise-dir", default=None,
                   help="real noise corpus (wav/mp3/webm); default: "
                        "synthetic white+brown")
    p.add_argument("--reconstruction", default=None,
                   choices=["phase", "griffin_lim"],
                   help="override the checkpoint's spectral back-end")
    p.add_argument("--gl-iters", type=int, default=None)
    args = p.parse_args(argv)
    report = evaluate(args.model, args.data, args.examples, args.seconds,
                      args.noise_gain, args.seed, noise_dir=args.noise_dir,
                      reconstruction=args.reconstruction,
                      gl_iters=args.gl_iters)
    print(json.dumps(report, indent=2))
    return 0
