"""Paired model comparison CLI: `compare A.npz B.npz --manifest M.json`.

Evaluates BOTH models on the identical frozen-manifest mixtures and
bootstraps the per-example metric DIFFERENCE, so mixture-difficulty
variance cancels (the unpaired CIs from two separate `eval` reports
overlap heavily because the manifest's input-SNR spread dominates).
This is the promotion of tools/compare_models.py to a first-class
subcommand; the reference has no evaluation tooling at all (SURVEY §4 —
its quality claims are README prose, README.md:37-41).
"""

import argparse
import json
import os
import tempfile

import numpy as np

METRICS = ("si_sdr_improvement", "si_sdr_out", "snr_out_matched",
           "lsd_out_matched")


def paired_report(a_path: str, b_path: str, n_boot: int = 5000,
                  seed: int = 0) -> dict:
    """Bootstrap the per-example difference between two saved
    per-example metric files (eval --save-per-example)."""
    a = np.load(a_path)
    b = np.load(b_path)
    # metrics are computed at each model's own sample rate
    # (evaluate_manifest resamples the mixtures to cfg.dsp.sample_rate), so
    # a cross-rate pairing (e.g. trunet16k vs a 48 kHz preset) is
    # statistically undefined — and would otherwise surface as a
    # misleading 'inputs differ' assert on si_sdr_in
    if "sample_rate" in a and "sample_rate" in b \
            and int(a["sample_rate"]) != int(b["sample_rate"]):
        raise ValueError(
            f"models evaluated at different sample rates "
            f"({int(a['sample_rate'])} vs {int(b['sample_rate'])} Hz); "
            f"paired comparison undefined — evaluate both at one rate "
            f"(e.g. a 16 kHz manifest with 16 kHz-basis models)")
    # same-mixture guard: different manifest mixtures differ by many dB
    # of input SI-SDR; the SAME mixtures evaluated on different backends
    # (real chip vs ADT_FORCE_CPU) differ by ~3e-3 dB of float
    # reassociation in the mixture synthesis + metric chain. 0.05 dB
    # separates the two regimes by >3 orders of magnitude.
    np.testing.assert_allclose(a["si_sdr_in"], b["si_sdr_in"], rtol=0,
                               atol=0.05,
                               err_msg="inputs differ: not the same "
                                       "manifest mixtures")
    rng = np.random.default_rng(seed)
    out = {}
    for m in METRICS:
        d = a[m] - b[m]
        idx = rng.integers(0, len(d), size=(n_boot, len(d)))
        means = d[idx].mean(axis=1)
        lo, hi = np.percentile(means, [2.5, 97.5])
        out[m] = {"mean_delta": round(float(d.mean()), 3),
                  "ci95": [round(float(lo), 3), round(float(hi), 3)],
                  "significant": bool(lo > 0 or hi < 0)}
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="audio_denoising_tpu compare",
        description="Paired two-model comparison on a frozen manifest")
    p.add_argument("model_a")
    p.add_argument("model_b")
    p.add_argument("--manifest", required=True)
    p.add_argument("--bootstrap", type=int, default=5000)
    args = p.parse_args(argv)

    from audio_denoising_tpu.apps.evaluate import evaluate_manifest

    with tempfile.TemporaryDirectory() as td:
        pa = os.path.join(td, "a.npz")
        pb = os.path.join(td, "b.npz")
        evaluate_manifest(args.model_a, args.manifest, per_example_out=pa)
        evaluate_manifest(args.model_b, args.manifest, per_example_out=pb)
        report = {
            "a": args.model_a,
            "b": args.model_b,
            "manifest": os.path.basename(args.manifest),
            "delta_a_minus_b": paired_report(pa, pb,
                                             n_boot=args.bootstrap),
        }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
