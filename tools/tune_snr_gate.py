"""Tune the SNR-gate parameters (ServingConfig.snr_gate_db/width) on a
HELD-OUT mixture set (v2's SNR-targeted design, seeds 300+ — disjoint
from the frozen manifest's 200-207), then report the chosen gate.

Keeps the frozen manifest honest: the gate is tuned here, and only the
final chosen setting is evaluated on runs/eval_manifest_v2.json (by
tools/ or the eval CLI with a gated model spec).

    ADT_FORCE_CPU=1 python tools/tune_snr_gate.py [model] [estimator]

estimator: 'floor' (round-4-session-1 tracker; gate grid 4..12 dB) or
'removed' (model-informed, default; its compressed dB scale needs the
lower 2..6 dB grid — see ServingConfig.snr_gate_estimator).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def tuning_manifest() -> dict:
    return {
        "version": "tune-snr-gate",
        "data_dir": "/root/reference/data/uncompressed/cats",
        "noise_dir":
            "/root/reference/data/uncompressed/kaggle_audioNoiseDataset",
        "crop_seconds": 2.0,
        "blocks": [
            {"seed": 300 + s, "target_snr_db": t, "n": 4}
            for t in (-5.0, 0.0, 5.0, 10.0, 15.0)
            for s in range(4)
        ],
    }


def main():
    from audio_denoising_tpu.apps.evaluate import build_manifest_set
    from audio_denoising_tpu.apps.offline import denoise_array
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.ops.resample import resample
    from audio_denoising_tpu.train.eval_metrics import si_sdr_db

    spec = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/gruunet2mel128w64-mrstft-50k.npz"
    estimator = sys.argv[2] if len(sys.argv) > 2 else "removed"
    # the 'removed' estimator's dB scale is compressed vs true input SNR
    # (ops/noisefloor.py) — tuned gates sit lower than the floor tracker's
    gates = (2.0, 3.0, 4.0, 5.0, 6.0) if estimator == "removed" \
        else (4.0, 6.0, 8.0, 10.0, 12.0)
    widths = (2.0, 4.0)
    # focused re-sweeps: ADT_TUNE_GATES="0,1,2" ADT_TUNE_WIDTHS="4,6,8"
    if os.environ.get("ADT_TUNE_GATES"):
        gates = tuple(float(g) for g in
                      os.environ["ADT_TUNE_GATES"].split(","))
    if os.environ.get("ADT_TUNE_WIDTHS"):
        widths = tuple(float(w) for w in
                       os.environ["ADT_TUNE_WIDTHS"].split(","))
    mixture, clean, gains, src_sr, _ = build_manifest_set(tuning_manifest())
    cfg0, model, params = load_pretrained(spec)
    sr = cfg0.dsp.sample_rate
    if src_sr != sr:
        mixture = np.asarray(resample(jnp.asarray(mixture), src_sr, sr))
        clean = np.asarray(resample(jnp.asarray(clean), src_sr, sr))
    crop = mixture.shape[-1]
    cl = jnp.asarray(clean)
    mix = jnp.asarray(mixture)
    in_snr = np.asarray(si_sdr_db(cl, mix))

    def run(gate_db, width_db):
        from audio_denoising_tpu.config import with_snr_gate
        cfg = with_snr_gate(cfg0, gate_db, width_db, estimator)
        outs = [denoise_array(cfg, model, params, mixture[i], sr)[:crop]
                for i in range(len(mixture))]
        est = jnp.asarray(np.stack(outs))
        d = np.asarray(si_sdr_db(cl, est)) - in_snr
        by = {}
        for t in sorted(set(gains)):
            m = gains == t
            by[f"{t:+.0f}"] = round(float(d[m].mean()), 2)
        return round(float(d.mean()), 3), by

    base_mean, base_by = run(None, None)
    print(f"no gate: mean {base_mean}  by-bracket {base_by}", flush=True)
    results = {"model": spec, "estimator": estimator,
               "no_gate": {"mean": base_mean, "by": base_by}}
    for gate in gates:
        for width in widths:
            mean, by = run(gate, width)
            key = f"gate{gate:g}_w{width:g}"
            results[key] = {"mean": mean, "by": by}
            print(f"{key}: mean {mean}  by-bracket {by}", flush=True)
    suffix = "" if estimator == "floor" else f"_{estimator}"
    out = os.environ.get("ADT_TUNE_OUT") or os.path.join(
        os.path.dirname(__file__), "..", "runs",
        f"snr_gate_tuning{suffix}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
