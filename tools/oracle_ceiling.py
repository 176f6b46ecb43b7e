"""Oracle quality ceilings on the frozen eval manifest.

Answers "what binds denoising quality?" by replacing the MODEL with an
oracle while keeping the serving reconstruction chain fixed (noisy-phase
reuse, the server.py-path back-end — reference server.py:207-216):

- ``full-stft``: clean magnitudes + noisy phase — the ceiling of ANY
  magnitude-domain model under phase reuse.
- ``mel-N``: clean magnitudes pushed through the mel-N analysis/pinv
  synthesis basis — the ceiling of a model whose representation is N mel
  bins (the GRUUNet2 presets' actual feature space).

Round-3 findings recorded in docs/BENCHMARKS.md: +19.9 dB (full STFT),
+11.6 (mel-64), +17.7 (mel-128) — the mel-64 basis, not phase reuse or
parameter count, is the binding constraint, which motivated the
``gruunet2-mel128`` preset.

    PYTHONPATH=. python tools/oracle_ceiling.py [--manifest runs/eval_manifest_v1.json]
"""

import argparse
import json
import os

# CPU is fine for an offline oracle and leaves the (single) TPU chip free;
# must be pinned in-process BEFORE any jax.devices() call (CLAUDE.md).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def oracle_report(manifest_path: str, sample_rate: int = 48000,
                  n_fft: int = 1024, hop: int = 512,
                  mel_sizes=(64, 96, 128, 160)) -> dict:
    from audio_denoising_tpu.apps.evaluate import build_manifest_set
    from audio_denoising_tpu.ops import mel as melmod
    from audio_denoising_tpu.ops.resample import resample
    from audio_denoising_tpu.ops.stft import istft, stft
    from audio_denoising_tpu.train.eval_metrics import (
        log_spectral_distance, si_sdr_db)

    manifest = json.load(open(manifest_path))
    mixture, clean, gains, src_sr, digest = build_manifest_set(manifest)
    mix = resample(jnp.asarray(mixture), src_sr, sample_rate)
    cl = resample(jnp.asarray(clean), src_sr, sample_rate)
    T = mix.shape[-1]

    S_mix = stft(mix, n_fft, hop)
    mag_cl = jnp.abs(stft(cl, n_fft, hop))
    phase = S_mix / (jnp.abs(S_mix) + 1e-12)
    base_in = float(si_sdr_db(cl, mix).mean())

    def row(mag):
        est = istft(mag * phase, n_fft, hop, length=T)
        impr = float(si_sdr_db(cl, est).mean()) - base_in
        a = (cl * est).sum(-1, keepdims=True) / (
            (est * est).sum(-1, keepdims=True) + 1e-8)
        lsd = float(log_spectral_distance(cl, est * a).mean())
        return {"si_sdr_improvement_db": round(impr, 2),
                "lsd_matched": round(lsd, 3)}

    report = {
        "manifest": os.path.basename(manifest_path),
        "manifest_hash": digest,
        "n_examples": int(len(mix)),
        "input_si_sdr_db": round(base_in, 2),
        "oracles": {"full_stft": row(mag_cl)},
    }
    n_stft = n_fft // 2 + 1
    for n_mels in mel_sizes:
        fb = melmod.mel_filterbank(n_stft, n_mels, sample_rate)
        inv = melmod.inverse_mel_matrix(n_stft, n_mels, sample_rate)
        rec = melmod.inverse_mel_scale(melmod.mel_scale(mag_cl, fb), inv)
        report["oracles"][f"mel_{n_mels}"] = row(rec)
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--manifest", default="runs/eval_manifest_v1.json")
    ap.add_argument("--mels", type=int, nargs="+", default=[64, 96, 128, 160])
    args = ap.parse_args()
    print(json.dumps(oracle_report(args.manifest, mel_sizes=tuple(args.mels)),
                     indent=2))


if __name__ == "__main__":
    main()
