"""Model hub: one call from a name/path to (cfg, model, params).

Resolves, in order:

- a preset name from ``config.PRESETS`` (``gruunet2-good`` ...) backed by a
  converted checkpoint in ``<repo>/checkpoints/<name>.npz``;
- a path to a native ``.npz`` checkpoint (params + JSON meta, written by
  ``TrainingContext.save`` or ``tools/import_checkpoints.py``);
- a path to a reference torch ``.pth`` checkpoint (dict format written by
  the reference's save_model, app.py:43-91) — parsed without torch.

The checkpoint's embedded config is the source of truth when present
(the reference's robust loader treats it the same way, app2.py:62-99).
"""

import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from audio_denoising_tpu.config import Config, ModelConfig, PRESETS
from audio_denoising_tpu.models import build_model

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECKPOINT_DIR = os.path.join(_REPO_ROOT, "checkpoints")

# Presets that reuse another preset's weights (same architecture + mel
# bins, different DSP/serving config).
_CKPT_ALIASES = {"gruunet2-stream16k": "gruunet2-good"}


def _as_jnp(params: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in params.items()}


def load_pretrained(spec: str, cfg: Optional[Config] = None):
    """-> (cfg, model, params). ``spec`` is a preset name, .npz path, or
    reference .pth path."""
    if spec in PRESETS:
        cfg = cfg or PRESETS[spec]
        ckpt_name = _CKPT_ALIASES.get(spec, spec)
        path = os.path.join(CHECKPOINT_DIR, f"{ckpt_name}.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"preset {spec!r} has no converted checkpoint at {path}; "
                f"run tools/import_checkpoints.py first")
        return _load_npz(path, cfg)
    if spec.endswith(".npz"):
        return _load_npz(spec, cfg)
    if spec.endswith(".pth"):
        return _load_pth(spec, cfg)
    if spec.endswith(".onnx"):
        return _load_onnx(spec, cfg)
    raise ValueError(
        f"unknown model spec {spec!r}: expected a preset name "
        f"({', '.join(sorted(PRESETS))}), a .npz, .pth or .onnx path")


def _assumed_cfg(arch: str, mc: ModelConfig, path: str) -> Config:
    """A checkpoint without a full embedded config carries only model
    hyperparameters — the DSP parameters are NOT derivable from weights
    (the reference has the same gap: STFT params differ per entry point,
    SURVEY §5 'Config'). Build the model at its architecture's reference
    bin count and assume the matching reference DSP, loudly."""
    import sys
    model = build_model(mc, num_bins=None)     # arch reference default
    bins = getattr(model, "num_bins", 64)
    dsp = dataclass_replace_dsp(n_fft=1024, hop_length=512,
                                n_mels=bins, reconstruction="phase")
    print(f"[hub] {path}: no DSP config embedded; assuming the reference "
          f"socket-path DSP (n_fft={dsp.n_fft}, hop={dsp.hop_length}, "
          f"n_mels={bins}) — pass cfg= to override", file=sys.stderr)
    return Config(dsp=dsp, model=mc)


def dataclass_replace_dsp(**kw):
    import dataclasses
    from audio_denoising_tpu.config import DSPConfig
    return dataclasses.replace(DSPConfig(), **kw)


def _reresolve_serving(cfg: Config) -> Config:
    """Reset the SNR-gate DEPLOYMENT fields of a checkpoint-embedded
    config to the current class defaults (round 5, VERDICT r4 #4).

    The gate tuning (threshold/width/estimator/tau) is a property of the
    serving deployment, not of the trained weights — but checkpoints
    embed their whole config, so a checkpoint saved while an OLDER
    default was in force silently serves that stale tuning forever (the
    round-4 idp25 episode: trained while the estimator default was
    'removed', it kept serving 'removed' under ``--snr-gate`` after the
    tuned default moved to 'both'). Model-bound serving fields
    (output_gain, state_decay, dtype, chunk geometry) stay
    checkpoint-authoritative; CLI flags still override everything."""
    import dataclasses
    from audio_denoising_tpu.config import ServingConfig
    d = ServingConfig()
    return dataclasses.replace(cfg, serving=dataclasses.replace(
        cfg.serving, snr_gate_db=d.snr_gate_db,
        snr_gate_width_db=d.snr_gate_width_db,
        snr_gate_estimator=d.snr_gate_estimator,
        snr_gate_tau_s=d.snr_gate_tau_s,
        # streamed-segment window geometry is likewise a deployment
        # property (round-5 frontier tuning) — reset so
        # recommended_streaming_geometry sees class defaults rather
        # than whatever era the checkpoint was saved under
        unet_seg_hops=d.unet_seg_hops,
        unet_ctx_samples=d.unet_ctx_samples,
        unet_xfade_samples=d.unet_xfade_samples,
        unet_ctx_left_samples=d.unet_ctx_left_samples))


def _load_npz(path: str, cfg: Optional[Config]):
    from audio_denoising_tpu.compat.npz_store import load_params_npz
    params, meta = load_params_npz(path)
    if cfg is None:
        if "full_config" in meta:
            import json
            cfg = Config.from_json(json.dumps(meta["full_config"]))
            cfg = _reresolve_serving(cfg)
        elif "arch" in meta and "config" in meta:
            mc = ModelConfig.from_reference_dict(meta["arch"],
                                                 meta["config"])
            cfg = _assumed_cfg(meta["arch"], mc, path)
        else:
            raise ValueError(f"{path} has no embedded config; pass cfg=")
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    return cfg, model, _as_jnp(params)


def _load_onnx(path: str, cfg: Optional[Config]):
    """A reference-exported MOMO2 cell graph (momo2_01/02.onnx,
    my_model.onnx) becomes a servable model: every CLI surface
    (denoise/serve/engine/eval) accepts the artifact directly, so a
    reference user's .onnx files work without conversion. Initializer
    names are the torch state-dict keys (onnx.py:547), so the weights
    drop straight into our params. ONNX carries NO DSP config; we assume
    the MOMO family's clamped RAW-spectrogram front-end at the graph's
    bin count (n_fft = 2*(bins-1), 50% hop — the momo3-4d4ea0 preset's
    reasoning, config.py) and say so loudly; pass cfg= to override."""
    import sys

    import dataclasses
    from audio_denoising_tpu.compat.onnx import (
        momo_config_from_onnx, onnx_params, parse_onnx)
    g = parse_onnx(path)
    mc, num_bins = momo_config_from_onnx(g)
    if cfg is None:
        n_fft = 2 * (num_bins - 1)
        dsp = dataclass_replace_dsp(n_fft=n_fft, hop_length=n_fft // 2,
                                    n_mels=num_bins, domain="raw",
                                    reconstruction="phase")
        from audio_denoising_tpu.config import ServingConfig
        cfg = Config(dsp=dsp, model=mc,
                     serving=ServingConfig(chunk_samples=n_fft // 2))
        print(f"[hub] {path}: ONNX carries no DSP config; assuming the "
              f"MOMO raw front-end (n_fft={n_fft}, hop={n_fft // 2}, "
              f"{num_bins} bins) — pass cfg= to override",
              file=sys.stderr)
    else:
        cfg = dataclasses.replace(cfg, model=mc)
    model = build_model(mc, num_bins=num_bins)
    return cfg, model, _as_jnp(onnx_params(g))


def _load_pth(path: str, cfg: Optional[Config]):
    from audio_denoising_tpu.compat import (
        load_torch_checkpoint, state_dict_to_params)
    ckpt = load_torch_checkpoint(path)
    arch = ckpt.get("arch") or ckpt.get("model_class") or "GRUUNet2"
    if cfg is None:
        mc = ModelConfig.from_reference_dict(arch, ckpt.get("config", {}))
        cfg = _assumed_cfg(arch, mc, path)
    model = build_model(cfg.model, num_bins=cfg.dsp.n_mels)
    params = state_dict_to_params(ckpt["model_state_dict"])
    return cfg, model, _as_jnp(params)
