"""Worker process for the two-process jax.distributed smoke test.

Run as: python tests/_dist_worker.py <coordinator_addr> <process_id>

Pins the CPU backend in-process (the axon sitecustomize re-pins the TPU
platform, so the env var alone does not stick — see tests/conftest.py),
gives each process 2 virtual devices, joins the distributed runtime via
audio_denoising_tpu.parallel.distributed.initialize, and runs one global
cross-process reduction over the 4-device global mesh.
"""

import os
import sys


def main() -> int:
    coord, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from audio_denoising_tpu.parallel.distributed import (
        global_mesh, initialize)

    started = initialize(coordinator_address=coord, num_processes=2,
                         process_id=pid)
    assert started, "initialize() returned False with explicit coordinator"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_mesh("streams")
    assert mesh.devices.size == 4, mesh.devices

    # one DCN-spanning collective: a global array sharded over all four
    # devices (two per process), summed to a replicated scalar
    shard = NamedSharding(mesh, P("streams"))
    x = jax.make_array_from_callback(
        (8,), shard, lambda idx: jnp.arange(8.0, dtype=jnp.float32)[idx])
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(x)
    val = float(total.addressable_shards[0].data)
    assert val == 28.0, val

    jax.distributed.shutdown()
    print(f"DIST-OK pid={pid} sum={val}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
