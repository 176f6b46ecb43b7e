#!/usr/bin/env python
"""Diagnose the fused_webrtc_gl8 bench row (0.004 ms/hop is physically
impossible: GL-8 at B=256/n_fft=1536 is >=0.1 ms of DFT matmul alone).

Hypothesis: the relay memoizes identical repeat dispatches, so timing a
loop that re-sends the SAME (state, chunks) args measures the cache, not
the chip. Compare:
  A. repeated identical args        (what bench._bench_variants does)
  B. fresh random chunks each round (cannot be memoized)
  C. output sanity: nonzero, changes with input
Prints one JSON line.
"""
import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from audio_denoising_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.ops.pallas.webrtc_hop import (
        make_webrtc_hop, webrtc_hop_init_state)
    from audio_denoising_tpu.runtime.plan import build_cell_plan

    N, K = 256, 24
    cfg, model, params = load_pretrained("gruunet2-dari_tult")
    cfg = dataclasses.replace(cfg, dsp=dataclasses.replace(
        cfg.dsp, griffin_lim_warm_start=True, griffin_lim_iters=8))
    plan = build_cell_plan(model, params)
    hop = cfg.dsp.hop_length
    step = make_webrtc_hop(cfg, plan, block_b=128)

    @functools.partial(jax.jit, static_argnums=2)
    def run_w(state, cks, k):
        def body(s, c):
            s, o = step(s, c)
            return s, o[:, :1]
        return jax.lax.scan(body, state, cks)

    s0 = webrtc_hop_init_state(cfg, plan, N)
    rng = np.random.default_rng(7)
    cks = jnp.asarray(rng.standard_normal((K, N, hop)) * 0.1, jnp.float32)
    for _ in range(2):
        out = run_w(s0, cks, K)
    jax.block_until_ready(out)

    # A: repeated identical args
    ts_a = []
    for _ in range(5):
        t0 = time.perf_counter()
        out_a = run_w(s0, cks, K)
        jax.block_until_ready(out_a)
        ts_a.append((time.perf_counter() - t0) * 1e3 / K)

    # B: fresh chunks each round (host->device staging included, so also
    # time a variant where the fresh array is staged BEFORE the clock)
    ts_b = []
    for i in range(5):
        fresh = jax.device_put(jnp.asarray(
            rng.standard_normal((K, N, hop)) * 0.1, jnp.float32))
        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        out_b = run_w(s0, fresh, K)
        jax.block_until_ready(out_b)
        ts_b.append((time.perf_counter() - t0) * 1e3 / K)

    # C: sanity
    y1 = np.asarray(out_a[1])
    y2 = np.asarray(out_b[1])
    print(json.dumps({
        "repeat_args_ms_per_hop": round(float(np.percentile(ts_a, 50)), 4),
        "fresh_args_ms_per_hop": round(float(np.percentile(ts_b, 50)), 4),
        "out_nonzero": bool(np.abs(y1).max() > 0),
        "out_changes_with_input": bool(np.abs(y1 - y2).max() > 1e-9),
    }))


if __name__ == "__main__":
    main()
