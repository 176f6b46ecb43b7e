"""Throughput cost of the streamed segment-serving geometries (round 5).

The round-5 frontier measurement found the best bounded-latency serving
point for the segment family is seg 16 / right-ctx 960 plus a join
crossfade (zero cost) and ~0.9 s of latency-free PAST context
(``ServingConfig.unet_ctx_left_samples``) — but the past context grows
the per-window model call ~14x (window 48576 vs 3456 samples). This
tool measures what that actually costs the engine on the real chip:
ms per engine tick (p50/p95 over the steady state) for the symmetric
default, +crossfade, and +past-context geometries, at B streams.

Engine mode 'unet' runs the heavy window under ``lax.cond`` once per
``unet_seg_hops`` ticks, so the honest figure is the amortized ms/tick
over whole cycles (boundary + free ticks together); the wall budget is
one hop = 8 ms of audio per tick at 48 kHz.

Usage: python tools/bench_stream_geom.py [batch] (default 256)
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_denoising_tpu.utils.cache import enable_compilation_cache


def bench_geometry(cfg, model, params, batch, n_cycles=12, warm_cycles=3):
    import jax
    from audio_denoising_tpu.runtime.engine import StreamEngine

    eng = StreamEngine(cfg, model, params, mode="unet", max_streams=batch)
    hop = cfg.dsp.hop_length
    P = cfg.serving.unet_seg_hops
    rng = np.random.default_rng(0)
    chunk = rng.standard_normal((batch, hop)).astype(np.float32) * 0.1

    cycle_ms = []
    for c in range(n_cycles):
        t0 = time.perf_counter()
        for _ in range(P):
            out = eng.process_batch(chunk)
        np.asarray(out)                      # force materialization
        if c >= warm_cycles:
            cycle_ms.append((time.perf_counter() - t0) * 1e3)
    per_tick = np.asarray(cycle_ms) / P
    return {
        "ms_per_tick_p50": round(float(np.percentile(per_tick, 50)), 3),
        "ms_per_tick_p95": round(float(np.percentile(per_tick, 95)), 3),
        "ms_per_cycle_p50": round(float(np.percentile(cycle_ms, 50)), 3),
        "realtime_x": round(
            8.0 * batch / float(np.percentile(per_tick, 50)), 1),
    }


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    enable_compilation_cache()
    from audio_denoising_tpu.hub import load_pretrained
    cfg, model, params = load_pretrained("runs/unet4crop2s-mrstft-30k.npz")

    geoms = {
        "s16c960 (symmetric class default)": {"unet_seg_hops": 16},
        "s16c960xf384": {"unet_seg_hops": 16, "unet_xfade_samples": 384},
        "s16c960ctxl41472xf384": {"unet_seg_hops": 16,
                                  "unet_xfade_samples": 384,
                                  "unet_ctx_left_samples": 41472},
        # the zero-flag serving default (recommended_streaming_geometry):
        # 84 ms latency at offline SI-SDR parity; the s8 cadence runs the
        # wide window TWICE as often as s16, so this is the geometry whose
        # amortized tick cost must clear the 8 ms hop budget
        "s8c960ctxl44544xf384 (recommended default)": {
            "unet_seg_hops": 8, "unet_xfade_samples": 384,
            "unet_ctx_left_samples": 44544},
    }
    report = {"batch": batch}
    for name, over in geoms.items():
        c = dataclasses.replace(
            cfg, serving=dataclasses.replace(
                cfg.serving, unet_ctx_samples=960,
                max_streams=batch, **over))
        report[name] = bench_geometry(c, model, params, batch)
        print(f"{name}: {report[name]}", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
