"""Convert the reference's shipped torch checkpoints into native .npz
param stores under checkpoints/ (weights are data; the framework must serve
the same trained models). Run once:

    python tools/import_checkpoints.py [--reference /root/reference]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audio_denoising_tpu.compat import (  # noqa: E402
    load_torch_checkpoint, save_params_npz, state_dict_to_params,
)

CHECKPOINTS = [
    "GRUUNet2-dari_tult",
    "GRUUNet2-dari_tult2",
    "GRUUNet2-good",
    "MOMO3-4d4ea0",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__),
                                                 "..", "checkpoints"))
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for name in CHECKPOINTS:
        path = os.path.join(args.reference, "saves", name, "checkpoint.pth")
        ck = load_torch_checkpoint(path)
        params = state_dict_to_params(ck["model_state_dict"])
        loss_record = ck.get("loss_record") or {}
        train_losses = loss_record.get("train") or {}
        meta = {
            "arch": ck.get("arch"),
            "config": {k: (list(v) if isinstance(v, tuple) else v)
                       for k, v in (ck.get("config") or {}).items()},
            "total_training_iters": ck.get("total_training_iters"),
            "last_target_name": ck.get("last_target_name"),
            "last_batch_size": ck.get("last_batch_size"),
            "loss_metric": ck.get("loss_metric"),
            "train_loss_first": (list(train_losses.values())[0]
                                 if train_losses else None),
            "train_loss_min": (min(train_losses.values())
                               if train_losses else None),
            "source": f"saves/{name}/checkpoint.pth",
        }
        out = os.path.join(args.out, name.lower() + ".npz")
        save_params_npz(out, params, meta)
        n = sum(int(np.prod(v.shape)) for v in params.values())
        print(f"{name}: {len(params)} tensors, {n} params "
              f"-> {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
