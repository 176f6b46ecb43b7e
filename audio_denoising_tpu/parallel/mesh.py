"""Mesh construction and sharding helpers.

Everything is expressed through ``jax.sharding`` annotations + jit: XLA
inserts the collectives. The batch (streams or training examples) shards
over the mesh's ``streams`` axis; parameters and DSP constants replicate.
"""

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "streams") -> Mesh:
    """1-D mesh over (up to) all available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis_name: str = "streams") -> NamedSharding:
    """Shard the leading (batch/streams) axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_pytree_batch(mesh: Mesh, tree, axis_name: str = "streams"):
    """Device-put every leaf with its leading axis sharded over the mesh."""
    sh = shard_batch(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_engine_step(step_fn, mesh: Mesh, axis_name: str = "streams"):
    """Wrap an engine step ``(params, state, chunk) -> (state, out)`` so
    params replicate and state/chunks shard over the streams axis.

    The model never needs cross-chip communication (per-stream recurrence,
    replicated weights) — the only collectives XLA inserts are for the
    initial placement, so N chips give N-way throughput on ICI.
    """
    repl = replicated(mesh)
    shard = shard_batch(mesh, axis_name)

    # shardings must be pytrees matching the args; build lazily on first call
    compiled = {}

    def wrapped(params, state, chunk):
        key = (jax.tree.structure(state), chunk.shape)
        if key not in compiled:
            state_sh = jax.tree.map(lambda _: shard, state)
            compiled[key] = jax.jit(
                step_fn,
                in_shardings=(jax.tree.map(lambda _: repl, params),
                              state_sh, shard),
                out_shardings=(state_sh, shard),
                donate_argnums=(1,),
            )
        return compiled[key](params, state, chunk)

    return wrapped
