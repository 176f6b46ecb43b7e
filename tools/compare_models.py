"""Paired model comparison on the frozen eval manifest.

Both models evaluate the IDENTICAL 64 mixtures, so the per-example metric
DIFFERENCE bootstraps with mixture-difficulty variance cancelled — the
unpaired CIs in the standard reports overlap heavily because example
difficulty (input SNR spread of ~20 dB) dominates, while paired deltas
resolve model ordering at a fraction of the width.

    python -m audio_denoising_tpu eval --model A.npz --manifest M.json \
        --save-per-example /tmp/a.npz
    python -m audio_denoising_tpu eval --model B.npz --manifest M.json \
        --save-per-example /tmp/b.npz
    python tools/compare_models.py /tmp/a.npz /tmp/b.npz
"""

import json
import sys

import numpy as np

METRICS = ("si_sdr_improvement", "si_sdr_out", "snr_out_matched",
           "lsd_out_matched")


def paired_report(a_path: str, b_path: str, n_boot: int = 5000,
                  seed: int = 0) -> dict:
    a = np.load(a_path)
    b = np.load(b_path)
    assert a["si_sdr_in"].shape == b["si_sdr_in"].shape, \
        "different manifests"
    np.testing.assert_allclose(a["si_sdr_in"], b["si_sdr_in"],
                               err_msg="inputs differ: not the same "
                                       "manifest mixtures")
    rng = np.random.default_rng(seed)
    out = {}
    for m in METRICS:
        d = a[m] - b[m]
        idx = rng.integers(0, len(d), size=(n_boot, len(d)))
        means = d[idx].mean(axis=1)
        lo, hi = np.percentile(means, [2.5, 97.5])
        out[m] = {
            "mean_delta": round(float(d.mean()), 3),
            "ci95": [round(float(lo), 3), round(float(hi), 3)],
            "significant": bool(lo > 0 or hi < 0),
        }
    return out


def main():
    a, b = sys.argv[1], sys.argv[2]
    rep = paired_report(a, b)
    print(json.dumps({"a": a, "b": b, "delta_a_minus_b": rep}, indent=2))


if __name__ == "__main__":
    main()
