"""Device-mesh parallelism (absent in the reference — SURVEY §2 records no
distributed anything; this is the >1-chip serving/training story designed
TPU-first).

The workload's natural axis is the stream/example batch: model params are
tiny (~15k floats) and replicate everywhere; stream state and chunks shard
over a 1-D ``streams`` mesh riding ICI. Collectives appear in metrics
(psum), data-parallel gradients (pmean via jax.grad under shard_map-free
jit — XLA inserts them from shardings), and the tensor-parallel serving
cell (parallel/tp.py: Megatron col/row level sharding with psum between
pairs — the axis that keeps arbitrarily wide plans VMEM-resident).
"""

from audio_denoising_tpu.parallel.mesh import (
    make_mesh, replicated, shard_batch, shard_engine_step, shard_pytree_batch,
)
from audio_denoising_tpu.parallel.tp import make_tp_plan_cell

__all__ = ["make_mesh", "replicated", "shard_batch", "shard_engine_step",
           "shard_pytree_batch", "make_tp_plan_cell"]
