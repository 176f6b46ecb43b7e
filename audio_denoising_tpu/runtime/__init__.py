"""Stateful multi-stream serving runtime (the L5 layer, TPU-first).

The reference processes one stream per Python object with mutable state
touched from multiple threads (app2.py:130-249) or one global hx shared by
every socket connection (server.py:177,212). Here stream state is an
explicit batched pytree ([N, ...] per leaf) advanced by a single jitted
step — N streams per chip in one launch, shardable over a device mesh.
"""

from audio_denoising_tpu.runtime.engine import StreamEngine, make_fast_step, FastState
from audio_denoising_tpu.runtime.metrics import ServingMetrics

__all__ = ["StreamEngine", "make_fast_step", "FastState", "ServingMetrics"]
