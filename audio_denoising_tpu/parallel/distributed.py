"""Multi-host initialization (SURVEY §5 'distributed communication
backend': the workload is data/stream parallel — ICI within a pod, DCN
across hosts; the model replicates everywhere at 15k params).

Single-host usage never needs this. For multi-host pods call
``initialize()`` once per process before any jax computation; it wraps
``jax.distributed.initialize`` with env-based autodetection (TPU pods
autodetect coordinator/process_id from the metadata environment).
"""

import os
from typing import Optional

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Idempotent jax.distributed init. Returns True if a multi-process
    runtime was started, False when running single-process."""
    global _initialized
    if _initialized:
        return True
    import jax
    explicit = coordinator_address or os.environ.get("ADT_COORDINATOR")
    if explicit is None and os.environ.get("ADT_SINGLE_HOST", "1") == "1" \
            and num_processes is None:
        return False   # single host: plain jax, mesh over local devices
    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return True


def global_mesh(axis_name: str = "streams"):
    """1-D mesh over ALL processes' devices (DCN+ICI); requires
    initialize() on multi-host."""
    import numpy as np
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis_name,))
