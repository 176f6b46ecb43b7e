"""Freeze the versioned quality-eval manifest (VERDICT r2 task 4).

64 mixtures: 4 noise gains x 4 seeds x 4 examples, 2 s crops of the
reference cats corpus + real kaggle webm noise (the corpus the shipped
checkpoints were trained against). The manifest stores the generation
recipe plus a hash of the synthesized arrays so drift in the sampler or
corpus is detected at evaluation time.

    python tools/make_manifest.py   ->  runs/eval_manifest_v1.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MANIFEST = {
    "version": 1,
    "description": "frozen quality eval set: cats corpus + kaggle noise",
    "data_dir": "/root/reference/data/uncompressed/cats",
    "noise_dir": "/root/reference/data/uncompressed/kaggle_audioNoiseDataset",
    "crop_seconds": 2.0,
    "blocks": [
        {"seed": 100 + s, "noise_gain": g, "n": 4}
        for g in (0.5, 1.0, 2.0, 4.0)
        for s in range(4)
    ],
}


def main():
    from audio_denoising_tpu.apps.evaluate import build_manifest_set

    mixture, clean, gains, sr, digest = build_manifest_set(MANIFEST)
    # determinism check: regenerate and compare hashes
    _, _, _, _, digest2 = build_manifest_set(MANIFEST)
    assert digest == digest2, "manifest generation is not deterministic"
    MANIFEST["sha256_16"] = digest
    out = os.path.join(os.path.dirname(__file__), "..", "runs",
                       "eval_manifest_v1.json")
    with open(out, "w") as f:
        json.dump(MANIFEST, f, indent=1)
    print(f"wrote {out}: {len(mixture)} mixtures @ {sr} Hz, hash {digest}")


if __name__ == "__main__":
    main()
