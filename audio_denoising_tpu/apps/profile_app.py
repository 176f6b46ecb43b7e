"""Serving profiler CLI: per-hop latency, dispatch-inclusive (true
end-to-end, one block per hop) and amortized (chip-only rate, K hops per
dispatch), for a preset/mode; optional XLA device trace for TensorBoard.

Usage: python -m audio_denoising_tpu profile --model gruunet2-good \
           --streams 256 [--trace /tmp/adt_trace]
"""

import argparse
import json

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="audio_denoising_tpu profile")
    p.add_argument("--model", default="gruunet2-good")
    p.add_argument("--streams", type=int, default=256)
    p.add_argument("--hops", type=int, default=50)
    p.add_argument("--mode", choices=["fast", "server", "webrtc"],
                   default="fast")
    p.add_argument("--plan", action="store_true",
                   help="use the matrixized cell plan")
    p.add_argument("--fused", action="store_true",
                   help="use the fused Pallas cell kernel")
    p.add_argument("--trace", default=None,
                   help="write an XLA device trace to this directory")
    p.add_argument("--stages", action="store_true",
                   help="also time front-end / model / back-end separately")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from audio_denoising_tpu.hub import load_pretrained
    from audio_denoising_tpu.pipeline import make_server_step, make_webrtc_step, webrtc_init_state
    from audio_denoising_tpu.runtime.engine import make_fast_step, fast_init_state
    from audio_denoising_tpu.runtime.plan import PlanModel
    from audio_denoising_tpu.runtime.profiler import StageProfile, device_trace

    cfg, model, params = load_pretrained(args.model)
    if args.plan or args.fused:
        model = PlanModel(model, params, fused=args.fused)
    B = args.streams
    hop = cfg.dsp.hop_length
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)), jnp.float32)

    if args.mode == "fast":
        step = jax.jit(make_fast_step(cfg, model))
        state = fast_init_state(cfg, model, B)
    elif args.mode == "webrtc":
        step = jax.jit(make_webrtc_step(cfg, model))
        state = webrtc_init_state(cfg, model, B)
    else:
        step = jax.jit(make_server_step(cfg, model))
        state = model.init_state(B)

    prof = StageProfile()
    disp = prof.measure_dispatch(lambda s, c: step(params, s, c),
                                 state, chunk, iters=args.hops)

    def make_scan(chain):
        @jax.jit
        def run(state, chunks):
            def body(s, c):
                s, out = step(params, s, c)
                return s, out
            return jax.lax.scan(body, state, chunks)
        chunks = jnp.broadcast_to(chunk[None], (chain,) + chunk.shape)
        return lambda: run(state, chunks)

    amort = prof.measure_amortized(make_scan, chain=args.hops)

    hop_ms = hop / cfg.dsp.sample_rate * 1e3
    report = {
        "device": jax.devices()[0].device_kind,
        "streams": B,
        "hop_ms": round(hop_ms, 3),
        "dispatch_inclusive": {k: round(v, 3) for k, v in disp.items()},
        "amortized_ms_per_hop": round(amort, 4),
        "aggregate_realtime_x": round(B * hop_ms / amort, 1),
    }
    if args.stages:
        from audio_denoising_tpu.ops import (
            hann_window, mel_filterbank, inverse_mel_matrix)
        from audio_denoising_tpu.ops.mel import mel_scale, inverse_mel_scale
        dsp = cfg.dsp
        fb = mel_filterbank(dsp.n_stft, dsp.n_mels, dsp.sample_rate)
        inv = inverse_mel_matrix(dsp.n_stft, dsp.n_mels, dsp.sample_rate)
        win = hann_window(dsp.n_fft)
        ring = jnp.zeros((B, dsp.n_fft))

        def frontend(x):
            spec = jnp.fft.rfft(x * win, axis=-1)
            return jnp.log1p(mel_scale(jnp.abs(spec)[..., None], fb))

        def modelstage(m):
            y, _ = model.apply(params, jnp.swapaxes(m, -1, -2),
                               model.init_state(B))
            return y

        def backend(m):
            lin = inverse_mel_scale(jnp.maximum(jnp.expm1(m), 0), inv)
            return jnp.fft.irfft(lin[..., 0] + 0j, n=dsp.n_fft, axis=-1)

        mel_in = jnp.zeros((B, dsp.n_mels, 1))
        stage_ms = {}
        for name, fn, arg in (("frontend", frontend, ring),
                              ("model", modelstage, mel_in),
                              ("backend", backend, mel_in)):
            def make_scan(chain, fn=fn, arg=arg):
                # inputs ride xs (distinct per iteration from XLA's view)
                # so loop-invariant code motion can't hoist the stage out
                xs = jnp.broadcast_to(arg[None], (chain,) + arg.shape)

                @jax.jit
                def run(xs):
                    def body(c, a):
                        out = fn(a + c)     # consume carry: no hoisting
                        return jnp.sum(out) * 1e-30, ()
                    return jax.lax.scan(body, 0.0, xs)
                return lambda: run(xs)
            stage_ms[name] = round(
                prof.measure_amortized(make_scan, chain=args.hops), 4)
        report["stage_ms_per_hop"] = stage_ms

    if args.trace:
        with device_trace(args.trace):
            for _ in range(5):
                state, out = step(params, state, chunk)
            jax.block_until_ready(out)
        report["trace_dir"] = args.trace
    print(json.dumps(report, indent=2))
    return 0
