"""Frame-exact SNR-gate grid search with a cached model pass.

The gate blends magnitudes AFTER the model, so for a fixed checkpoint the
expensive part (STFT + model + inverse basis) is config-independent: cache
(mag, lin, phase) per example once, then any (estimator, tau, gate, width,
veto) evaluates with a cheap scan + iSTFT. One config costs seconds, so
the temporal EMA dynamics (TOTAL_TAU ~ clip length — the estimate never
fully converges inside a 2 s clip, which a finals-only analysis misses)
are swept honestly.

    ADT_FORCE_CPU=1 python tools/gate_grid.py [model] [manifest|heldout]
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def heldout_manifest() -> dict:
    """Same construction as manifest v2 (SNR-targeted blocks) on disjoint
    seeds 400+ — the round-4 sigmoid-vs-ramp episode showed the old
    80-example seeds-300 set drifts ~1-2 dB from v2's estimator
    distributions, so match size (128) and bracket set exactly."""
    return {
        "version": "gate-grid-heldout",
        "data_dir": "/root/reference/data/uncompressed/cats",
        "noise_dir":
            "/root/reference/data/uncompressed/kaggle_audioNoiseDataset",
        "crop_seconds": 2.0,
        "blocks": [
            {"seed": 400 + s, "target_snr_db": t, "n": 4}
            for t in (-5.0, 0.0, 5.0, 10.0)
            for s in range(8)
        ],
    }


def build_cache(spec: str, manifest: dict):
    """-> dict with per-example mag/lin/phase (model pass, ungated) plus
    clean/mix waveforms and bracket labels, all at the model rate."""
    from audio_denoising_tpu.apps.evaluate import build_manifest_set
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.ops.resample import resample
    from audio_denoising_tpu.ops.stft import stft
    from audio_denoising_tpu import pipeline as P

    mixture, clean, gains, src_sr, _ = build_manifest_set(manifest)
    cfg, model, params = load_pretrained(spec)
    sr = cfg.dsp.sample_rate
    if src_sr != sr:
        mixture = np.asarray(resample(jnp.asarray(mixture), src_sr, sr))
        clean = np.asarray(resample(jnp.asarray(clean), src_sr, sr))
    dsp = cfg.dsp
    fb, inv, win = P._transforms(cfg)

    def fwd(audio):
        # offline.denoise_array without the gate: peak-norm, model, linear
        peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
        scale = jnp.where(peak > 1e-8, peak, 1.0)
        x = audio / scale
        spec = stft(x, dsp.n_fft, dsp.hop_length, dsp.win, window=win)
        mag = jnp.abs(spec)
        feats = jnp.swapaxes(P._to_features(cfg, mag, fb), -1, -2)
        resid, _ = model.apply(params, feats, None)
        recon = jax.nn.leaky_relu(feats - resid, negative_slope=0.2)
        lin = P._to_linear(cfg, jnp.swapaxes(recon, -1, -2), inv)
        return mag, lin, spec / (mag + 1e-12), scale[:, 0]

    mags, lins, phases, scales = [], [], [], []
    jfwd = jax.jit(fwd)
    for i in range(0, len(mixture), 16):
        m, l, p, s = jfwd(jnp.asarray(mixture[i:i + 16]))
        mags.append(np.asarray(m)); lins.append(np.asarray(l))
        phases.append(np.asarray(p)); scales.append(np.asarray(s))
    return {
        "cfg": cfg, "gains": gains,
        "clean": clean, "mix": mixture,
        "mag": np.concatenate(mags), "lin": np.concatenate(lins),
        "phase": np.concatenate(phases),
        "scale": np.concatenate(scales),
    }


def eval_config(cache, estimator: str, gate, width, tau,
                veto_gate=None, veto_width=None):
    """-> (overall mean dSI-SDR, {bracket: mean dSI-SDR})."""
    from audio_denoising_tpu.ops.noisefloor import (
        FLOOR_VETO_GATE_DB, FLOOR_VETO_WIDTH_DB, floor_rise_per_frame,
        gate_alpha, noise_floor_scan, removed_powers, removed_snr_scan,
        smooth_beta_per_frame, snr_db_from_floor, total_beta_per_frame)
    from audio_denoising_tpu.ops.stft import istft
    from audio_denoising_tpu.train.eval_metrics import si_sdr_db

    cfg = cache["cfg"]
    dsp = cfg.dsp
    hop, sr = dsp.hop_length, dsp.sample_rate
    mag = jnp.asarray(cache["mag"])
    lin = jnp.asarray(cache["lin"])
    power = mag * mag

    def alphas():
        if gate is None:
            return jnp.ones(mag.shape[:1] + mag.shape[2:])
        a = None
        if estimator in ("removed", "both"):
            p_out, p_rem = removed_powers(power, lin * lin, axis=-2)
            snr, _ = removed_snr_scan(
                p_out, p_rem, total_beta_per_frame(hop, sr, tau))
            a = gate_alpha(snr, gate, width)
        if estimator in ("floor", "both"):
            floors, totals, _ = noise_floor_scan(
                power, floor_rise_per_frame(hop, sr),
                smooth_beta_per_frame(hop, sr),
                total_beta_per_frame(hop, sr, tau))
            snr_f = snr_db_from_floor(totals, jnp.mean(floors, axis=-2))
            gf = gate if estimator == "floor" else (
                FLOOR_VETO_GATE_DB if veto_gate is None else veto_gate)
            wf = width if estimator == "floor" else (
                FLOOR_VETO_WIDTH_DB if veto_width is None else veto_width)
            af = gate_alpha(snr_f, gf, wf)
            a = af if a is None else jnp.maximum(a, af)
        return a

    def run():
        a = alphas()[:, None, :]
        out_mag = a * lin + (1.0 - a) * mag
        rec = out_mag * jnp.asarray(cache["phase"])
        est = istft(rec, dsp.n_fft, dsp.hop_length, dsp.win,
                    length=cache["mix"].shape[-1])
        est = est * jnp.asarray(cache["scale"])[:, None]
        cl = jnp.asarray(cache["clean"])
        d = (np.asarray(si_sdr_db(cl, est))
             - np.asarray(si_sdr_db(cl, jnp.asarray(cache["mix"]))))
        return d

    d = run()
    g = cache["gains"]
    by = {f"{t:+.0f}": round(float(d[g == t].mean()), 2)
          for t in sorted(set(g))}
    return round(float(d.mean()), 3), by


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/gruunet2mel128w64-mrstft-50k.npz"
    man_arg = sys.argv[2] if len(sys.argv) > 2 else "heldout"
    manifest = (heldout_manifest() if man_arg == "heldout"
                else json.load(open(man_arg)))
    print(f"building cache for {spec} ...", flush=True)
    cache = build_cache(spec, manifest)
    base, base_by = eval_config(cache, "removed", None, None, None)
    print(f"ungated: mean {base}  {base_by}", flush=True)
    results = {"model": spec, "manifest": man_arg,
               "ungated": {"mean": base, "by": base_by}}
    grid = []
    for tau in (0.5, 1.0, 2.0):
        for gatew in ((1.0, 6.0), (2.5, 2.0), (3.0, 1.0), (2.0, 3.0)):
            grid.append(("removed", *gatew, tau, None, None))
            grid.append(("both", *gatew, tau, 3.0, 2.0))
    for cfg_t in grid:
        est, gate, width, tau, vg, vw = cfg_t
        mean, by = eval_config(cache, est, gate, width, tau, vg, vw)
        key = f"{est}_g{gate:g}_w{width:g}_tau{tau:g}" + \
            (f"_veto{vg:g}w{vw:g}" if est == "both" else "")
        results[key] = {"mean": mean, "by": by}
        print(f"{key}: mean {mean}  {by}", flush=True)
    out = os.environ.get("ADT_GRID_OUT", "/tmp/gate_grid.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
