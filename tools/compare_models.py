"""Paired model comparison on saved per-example metric files.

Thin wrapper over `audio_denoising_tpu.apps.compare.paired_report` (the
`compare` CLI subcommand evaluates both models itself; this tool
operates on files you already saved):

    python -m audio_denoising_tpu eval --model A.npz --manifest M.json \
        --save-per-example /tmp/a.npz
    python -m audio_denoising_tpu eval --model B.npz --manifest M.json \
        --save-per-example /tmp/b.npz
    python tools/compare_models.py /tmp/a.npz /tmp/b.npz
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_denoising_tpu.apps.compare import paired_report


def main():
    a, b = sys.argv[1], sys.argv[2]
    rep = paired_report(a, b)
    print(json.dumps({"a": a, "b": b, "delta_a_minus_b": rep}, indent=2))


if __name__ == "__main__":
    main()
