"""Orbax checkpoint backend — the production alternative to the flat npz
store (sharded arrays, async save, atomic directory commits).

The npz store remains the default (single-host, human-greppable, carries
the reference's metadata contract); orbax is the right backend when
training multi-host or when checkpoints grow past what one file should
hold. Both carry identical (params, meta) payloads and are
interchangeable through TrainingContext.save/load's ``backend=`` switch.
"""

import json
import os
from typing import Any, Dict, Tuple

import numpy as np


def save_params_orbax(path: str, params: Dict[str, np.ndarray],
                      meta: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), dict(params), force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, default=str)


def load_params_orbax(path: str) -> Tuple[Dict[str, np.ndarray],
                                          Dict[str, Any]]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"))
    return {k: np.asarray(v) for k, v in params.items()}, meta
