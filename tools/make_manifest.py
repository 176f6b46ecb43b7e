"""Freeze the versioned quality-eval manifests (VERDICT r2 task 4).

v1 — 64 mixtures: 4 noise gains x 4 seeds x 4 examples, 2 s crops of
the reference cats corpus + real kaggle webm noise (the corpus the
shipped checkpoints were trained against). The manifest stores the
generation recipe plus a hash of the synthesized arrays so drift in the
sampler or corpus is detected at evaluation time.

v2 — 128 SNR-TARGETED mixtures: 4 target input SNRs (−5/0/5/10 dB) x
8 seeds x 4 examples, noise rescaled per example to hit the target
exactly and near-silent clean crops redrawn. v1's amplitude-gain blocks
spread effective input SNR over tens of dB (random crops of a corpus
with silence), so v1 absolute means are dominated by which crops the
seeds drew; v2 controls input difficulty, making absolute quality
claims seed-robust. Paired comparisons work on either.

v3 — the v2 design pinned to 16 kHz ("sample_rate": 16000): metrics are
computed at 16 kHz for EVERY model (a 48 kHz-basis model pays its
resampling round trip), making model families with different native
bases comparable AND pairable — the BASELINE north star speaks 256 x
16 kHz streams (VERDICT r3 task 6). Mixture synthesis (and the frozen
hash) stay at the corpus rate; only the metric rate is pinned.

NOTE (ADVICE r3): v1 is NOT a prefix of v2 — the prefix-property draft
of v2 was replaced by the SNR-targeted design (seeds 200-207). Never
pair per-example vectors across manifest versions.

    python tools/make_manifest.py       ->  runs/eval_manifest_v1.json
    python tools/make_manifest.py 2     ->  runs/eval_manifest_v2.json
    python tools/make_manifest.py 3     ->  runs/eval_manifest_v3_16k.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def manifest_spec(version: int) -> dict:
    base = {
        "version": version,
        "description": "frozen quality eval set: cats corpus + kaggle noise",
        "data_dir": "/root/reference/data/uncompressed/cats",
        "noise_dir":
            "/root/reference/data/uncompressed/kaggle_audioNoiseDataset",
        "crop_seconds": 2.0,
    }
    if version == 1:
        base["blocks"] = [
            {"seed": 100 + s, "noise_gain": g, "n": 4}
            for g in (0.5, 1.0, 2.0, 4.0)
            for s in range(4)
        ]
    else:
        base["description"] += " (SNR-targeted)"
        base["blocks"] = [
            {"seed": 200 + s, "target_snr_db": t, "n": 4}
            for t in (-5.0, 0.0, 5.0, 10.0)
            for s in range(8)
        ]
    if version == 3:
        base["description"] += ", metrics pinned to 16 kHz"
        base["sample_rate"] = 16000
    return base


def main():
    from audio_denoising_tpu.apps.evaluate import build_manifest_set

    version = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    manifest = manifest_spec(version)
    mixture, clean, gains, sr, digest = build_manifest_set(manifest)
    # determinism check: regenerate and compare hashes
    _, _, _, _, digest2 = build_manifest_set(manifest)
    assert digest == digest2, "manifest generation is not deterministic"
    manifest["sha256_16"] = digest
    name = (f"eval_manifest_v{version}_16k.json" if version == 3
            else f"eval_manifest_v{version}.json")
    out = os.path.join(os.path.dirname(__file__), "..", "runs", name)
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {out}: {len(mixture)} mixtures @ {sr} Hz, hash {digest}")


if __name__ == "__main__":
    main()
