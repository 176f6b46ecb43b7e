"""Device-mesh parallelism (absent in the reference — SURVEY §2 records no
distributed anything; this is the >1-chip serving/training story designed
TPU-first).

The workload's natural axis is the stream/example batch: model params are
tiny (~15k floats) and replicate everywhere; stream state and chunks shard
over a 1-D ``streams`` mesh riding ICI. Collectives appear only in metrics
(psum) and data-parallel gradients (pmean via jax.grad under shard_map-free
jit — XLA inserts them from shardings).
"""

from audio_denoising_tpu.parallel.mesh import (
    make_mesh, replicated, shard_batch, shard_engine_step, shard_pytree_batch,
)

__all__ = ["make_mesh", "replicated", "shard_batch", "shard_engine_step",
           "shard_pytree_batch"]
