"""Top-level CLI: ``python -m audio_denoising_tpu <command> ...``.

Replaces the reference's Streamlit UI chrome + ad-hoc daemons with one
dispatcher (SURVEY §7 'apps'): denoise (offline file), serve (reference
socket protocol), engine (batched multi-stream daemon), train, loopback
(mic diagnostic), convert (.pth -> .npz), info (checkpoint inspector).
"""

import sys


def _info(argv) -> int:
    import argparse
    import json
    p = argparse.ArgumentParser(prog="audio_denoising_tpu info")
    p.add_argument("checkpoint", help=".npz or reference .pth checkpoint")
    args = p.parse_args(argv)
    if args.checkpoint.endswith(".pth"):
        from audio_denoising_tpu.compat import load_torch_checkpoint
        ck = load_torch_checkpoint(args.checkpoint)
        meta = {k: v for k, v in ck.items()
                if isinstance(v, (str, int, float))}
        meta["config"] = ck.get("config")
        meta["n_params"] = sum(
            getattr(v, "size", 0) for v in ck["model_state_dict"].values())
        losses = (ck.get("loss_record") or {}).get("train") or {}
        if losses:
            vals = list(losses.values())
            meta["train_loss_first"] = vals[0]
            meta["train_loss_min"] = min(vals)
    else:
        from audio_denoising_tpu.compat.npz_store import load_params_npz
        params, meta = load_params_npz(args.checkpoint)
        meta = dict(meta)
        meta["n_params"] = int(sum(v.size for v in params.values()))
    print(json.dumps(meta, indent=2, default=str))
    return 0


def _models(argv) -> int:
    import json
    import os
    from audio_denoising_tpu.config import PRESETS
    from audio_denoising_tpu.hub import CHECKPOINT_DIR, _CKPT_ALIASES
    rows = {}
    for name, cfg in sorted(PRESETS.items()):
        ckpt = _CKPT_ALIASES.get(name, name)
        rows[name] = {
            "arch": cfg.model.arch,
            "sample_rate": cfg.dsp.sample_rate,
            "n_fft": cfg.dsp.n_fft,
            "hop": cfg.dsp.hop_length,
            "reconstruction": cfg.dsp.reconstruction,
            "weights": os.path.exists(
                os.path.join(CHECKPOINT_DIR, f"{ckpt}.npz")),
        }
    print(json.dumps(rows, indent=2))
    return 0


def _convert(argv) -> int:
    import argparse
    p = argparse.ArgumentParser(prog="audio_denoising_tpu convert")
    p.add_argument("src", help="checkpoint (preset name, .npz or "
                               "reference .pth)")
    p.add_argument("out", help="output path: .npz (weights) or .onnx "
                               "(single recurrent-cell export for the "
                               "MOMO and GRUUNet families, the "
                               "momo2_02.onnx-style artifact)")
    args = p.parse_args(argv)
    if args.out.lower().endswith(".onnx"):
        from audio_denoising_tpu.compat.onnx_export import export_cell
        from audio_denoising_tpu.hub import load_pretrained
        _cfg, model, params = load_pretrained(args.src)
        export_cell(model, params, args.out)
        print(f"wrote {args.out}")
        return 0
    from audio_denoising_tpu.compat import save_params_npz
    if args.src.lower().endswith(".pth"):
        from audio_denoising_tpu.compat import (
            load_torch_checkpoint, state_dict_to_params)
        ck = load_torch_checkpoint(args.src)
        params = state_dict_to_params(ck["model_state_dict"])
        meta = {k: v for k, v in ck.items()
                if k not in ("model_state_dict", "optimizer_state_dict",
                             "scheduler_state_dict", "state_dict")}
    else:
        # preset name or .npz (the documented src forms) resolve through
        # the hub like every other CLI
        import json as _json
        import numpy as np
        from audio_denoising_tpu.hub import load_pretrained
        cfg, _model, jparams = load_pretrained(args.src)
        params = {k: np.asarray(v) for k, v in jparams.items()}
        meta = {"arch": cfg.model.arch,
                "config": cfg.model.to_reference_dict(),
                "full_config": _json.loads(cfg.to_json())}
    save_params_npz(args.out, params, meta)
    print(f"wrote {args.out} ({len(params)} tensors)")
    return 0


COMMANDS = {
    "denoise": "audio_denoising_tpu.apps.offline",
    "serve": "audio_denoising_tpu.apps.serve",
    "engine": "audio_denoising_tpu.apps.engine_serve",
    "train": "audio_denoising_tpu.apps.trainer",
    "loopback": "audio_denoising_tpu.apps.loopback",
    "profile": "audio_denoising_tpu.apps.profile_app",
    "ws": "audio_denoising_tpu.apps.ws_serve",
    "eval": "audio_denoising_tpu.apps.evaluate",
    "compare": "audio_denoising_tpu.apps.compare",
}


def main(argv=None) -> int:
    import os
    if os.environ.get("ADT_FORCE_CPU") == "1":
        # relay-outage escape hatch: force the JAX CPU backend for any CLI
        # command (shell-level JAX_PLATFORMS does NOT stick here — a
        # sitecustomize re-pins the TPU platform at interpreter startup,
        # so the override must happen in-process before any backend init)
        import jax
        jax.config.update("jax_platforms", "cpu")
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        names = ", ".join(list(COMMANDS) + ["convert", "info", "models"])
        print(f"usage: python -m audio_denoising_tpu <command> [...]\n"
              f"commands: {names}")
        return 0 if argv else 2
    cmd, rest = argv[0], argv[1:]
    if cmd in COMMANDS:
        from audio_denoising_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
    if cmd == "info":
        return _info(rest)
    if cmd == "models":
        return _models(rest)
    if cmd == "convert":
        return _convert(rest)
    if cmd in COMMANDS:
        import importlib
        return importlib.import_module(COMMANDS[cmd]).main(rest)
    print(f"unknown command {cmd!r}", file=sys.stderr)
    return 2
