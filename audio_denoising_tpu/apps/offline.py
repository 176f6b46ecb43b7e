"""Offline file denoising — the intended semantics of the reference's
upload path (app.py:171-223 resamples/monotizes/peak-normalizes, then was
*meant* to run STFT -> model -> iSTFT; the shipped code feeds raw waveform
into the model, a defect documented in SURVEY §3.4). Here the full chain is
one jitted graph (pipeline.offline_denoise)."""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import Config
from audio_denoising_tpu.hub import load_pretrained
from audio_denoising_tpu.io.wavio import read_wav, write_wav
from audio_denoising_tpu.ops.resample import resample
from audio_denoising_tpu.pipeline import (
    offline_denoise, offline_denoise_stateless)


_JIT_CACHE = {}


def _jitted_chain(cfg: Config, model, sample_rate: int,
                  streamed: bool = False):
    """One jitted graph for the WHOLE chain (mono, resample, peak norm,
    denoise, de-norm): eager dispatch is prohibitive on a remote-attached
    TPU (~30 ms per op round trip), so nothing runs outside jit. Cached per
    (model, input rate); jit itself caches per input length."""
    # serving config participates in the chain too (snr gate, gains):
    # keying only on dsp silently reused a stale graph across serving
    # overrides (round-4 bug found by the gate tuning sweep)
    key = (id(model), cfg.dsp, cfg.serving, sample_rate, streamed)
    if key not in _JIT_CACHE:
        def chain(params, x):
            # Offline mode is the parity surface (<=1e-3 vs the torch
            # reference): force fp32 matmuls — TPU's default bf16 inputs
            # cost ~1e-2 end-to-end error through mel/conv chains.
            with jax.default_matmul_precision("float32"):
                if x.ndim == 2:           # to mono (app.py:186-188)
                    x = jnp.mean(x, axis=0)
                if sample_rate != cfg.dsp.sample_rate:
                    x = resample(x[None], sample_rate, cfg.dsp.sample_rate)[0]
                peak = jnp.max(jnp.abs(x))
                scale = jnp.where(peak > 1e-8, peak, 1.0)
                if hasattr(model, "init_state"):      # recurrent family
                    y = offline_denoise(cfg, model, params, x / scale)
                elif streamed:            # bounded-latency segment chain
                    from audio_denoising_tpu.pipeline import (
                        offline_denoise_streamed)
                    y = offline_denoise_streamed(cfg, model, params,
                                                 x / scale)
                else:                                 # stateless U-Nets
                    y = offline_denoise_stateless(cfg, model, params,
                                                  x / scale)
                return y * scale
        _JIT_CACHE[key] = jax.jit(chain)
    return _JIT_CACHE[key]


def denoise_array(cfg: Config, model, params, samples: np.ndarray,
                  sample_rate: int, streamed: bool = False) -> np.ndarray:
    """samples: (C, N) or (N,) float32 at ``sample_rate`` -> denoised mono
    (N',) float32 at ``cfg.dsp.sample_rate``. ``streamed=True`` runs the
    stateless family through the bounded-latency segment chain
    (pipeline.offline_denoise_streamed) instead of the whole-clip window —
    the file-processing twin of engine mode 'unet'."""
    x = jnp.asarray(samples, jnp.float32)
    return np.asarray(
        _jitted_chain(cfg, model, sample_rate, streamed)(params, x))


def denoise_file(spec: str, in_path: str, out_path: str,
                 cfg: Optional[Config] = None,
                 snr_gate_db: Optional[float] = None,
                 snr_gate_width_db: Optional[float] = None,
                 snr_gate_estimator: Optional[str] = None,
                 auto_gate: bool = True, streamed: bool = False,
                 unet_seg_hops: Optional[int] = None,
                 unet_ctx: Optional[int] = None,
                 unet_xfade: Optional[int] = None,
                 unet_ctx_left: Optional[int] = None) -> str:
    """Any decodable container in (wav natively; mp3/webm through the
    system codec libs, matching the reference's decode-anything upload
    path, app.py:171-223) -> denoised WAV out. The gate args apply
    with_snr_gate AFTER the checkpoint config loads (one load, not
    two); with no gate args, eligible causal checkpoints run the TUNED
    recommended gate (config.recommended_serving, VERDICT r4 #4) —
    ``--no-snr-gate`` runs the raw model."""
    cfg, model, params = load_pretrained(spec, cfg)
    if snr_gate_db is not None:
        from audio_denoising_tpu.config import with_snr_gate
        cfg = with_snr_gate(cfg, snr_gate_db, snr_gate_width_db,
                            snr_gate_estimator)
    elif auto_gate:
        from audio_denoising_tpu.config import recommended_serving
        cfg = recommended_serving(cfg)
    from audio_denoising_tpu.config import (recommended_streaming_geometry,
                                            with_unet_geometry)
    cfg = with_unet_geometry(cfg, unet_seg_hops, unet_ctx, unet_xfade,
                             unet_ctx_left)
    if (auto_gate and streamed and unet_seg_hops is None
            and unet_ctx is None and unet_xfade is None
            and unet_ctx_left is None):
        # zero geometry flags: --streamed runs the measured-best
        # bounded-latency window (84 ms at offline SI-SDR parity,
        # round-5 frontier); any geometry flag or --no-snr-gate opts out
        cfg = recommended_streaming_geometry(cfg)
    if streamed and not hasattr(model, "compatible_frames"):
        raise ValueError(
            "--streamed runs the cadence-locked U-Net segment chain; "
            "recurrent checkpoints already process causally (bounded "
            "lookahead comes from ModelConfig.lookahead_frames)")
    if in_path.lower().endswith(".wav"):
        samples, sr = read_wav(in_path)
    else:
        from audio_denoising_tpu.io.cache import AudioCache
        samples, sr = AudioCache().load(in_path)
    out = denoise_array(cfg, model, params, samples, sr, streamed=streamed)
    write_wav(out_path, out[None], cfg.dsp.sample_rate)
    return out_path


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(
        prog="audio_denoising_tpu denoise",
        description="Offline WAV -> WAV denoising on TPU")
    p.add_argument("input", help="input WAV path")
    p.add_argument("output", help="output WAV path")
    p.add_argument("--model", default="gruunet2-good",
                   help="preset name, .npz, or reference .pth checkpoint")
    p.add_argument("--snr-gate", type=float, default=None,
                   help="SNR-gated passthrough blend (dB) — protects "
                        "near-clean input (ServingConfig.snr_gate_db). "
                        "When absent, eligible causal checkpoints run "
                        "the TUNED gate (config.recommended_serving)")
    p.add_argument("--no-snr-gate", action="store_true",
                   help="run the raw profile: disable the recommended "
                        "defaults (tuned gate on causal checkpoints; "
                        "tuned --streamed geometry)")
    p.add_argument("--snr-gate-width", type=float, default=None)
    p.add_argument("--snr-gate-estimator", default=None,
                   choices=("removed", "floor", "both"),
                   help="gate SNR estimator (ops/noisefloor.py)")
    p.add_argument("--streamed", action="store_true",
                   help="stateless U-Net checkpoints: denoise through the "
                        "bounded-latency segment chain (exactly what "
                        "engine mode 'unet' serves) instead of the "
                        "whole-file window")
    p.add_argument("--unet-seg-hops", type=int, default=None,
                   help="--streamed: segment length in hops")
    p.add_argument("--unet-ctx", type=int, default=None,
                   help="--streamed: FUTURE window context in samples")
    p.add_argument("--unet-xfade", type=int, default=None,
                   help="--streamed: segment-join crossfade in samples")
    p.add_argument("--unet-ctx-left", type=int, default=None,
                   help="--streamed: PAST window context in samples")
    args = p.parse_args(argv)
    path = denoise_file(args.model, args.input, args.output,
                        snr_gate_db=args.snr_gate,
                        snr_gate_width_db=args.snr_gate_width,
                        snr_gate_estimator=args.snr_gate_estimator,
                        auto_gate=not args.no_snr_gate,
                        streamed=args.streamed,
                        unet_seg_hops=args.unet_seg_hops,
                        unet_ctx=args.unet_ctx,
                        unet_xfade=args.unet_xfade,
                        unet_ctx_left=args.unet_ctx_left)
    print(f"wrote {path}")
    return 0
