"""Native param storage: flat param dict + config as a single ``.npz``.

The converted reference checkpoints are committed under ``checkpoints/`` so
the framework is standalone (no torch, no reference tree needed at runtime).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np


def save_params_npz(path: str, params: Dict[str, np.ndarray],
                    meta: Dict[str, Any]) -> None:
    arrays = {"param:" + k: np.asarray(v) for k, v in params.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta, default=_json_default).encode(), dtype=np.uint8)
    # atomic: write to a temp sibling then rename. A process killed
    # mid-save (the relay-outage queue runs every segment under
    # `timeout`) must never leave a truncated checkpoint at the final
    # path — a later --resume would pick it up and fail forever.
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    # np.savez appends .npz to paths without the suffix
    if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, path)


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(type(o))


def load_params_npz(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        params = {k[len("param:"):]: z[k] for k in z.files if k.startswith("param:")}
    return params, meta
