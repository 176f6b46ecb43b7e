#!/usr/bin/env python
"""On-chip validation of the int8 fused kernel (Mosaic int8 lowering).

The W8A8 kernel variant (ops/pallas/fused_hop.py compute_dtype=int8) is
interpret-mode locked on CPU; this script confirms the int8 matmul path
COMPILES AND RUNS on the real TPU and reproduces the interpret-mode
numbers. Run it when the relay is up (the round-4 watchdog does); on
success, the engine can default mode 'fused' + dtype 'int8' to the
kernel instead of downgrading to the op-by-op quantized plan.

Prints one JSON line: {"ok": bool, "agreement_db": ..., "error": ...}.
"""

import json
import os
import sys

import numpy as np

# runnable as `python tools/validate_int8_fused.py` from the repo root
# (script-dir sys.path doesn't see the package)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    try:
        import jax
        import jax.numpy as jnp
        from audio_denoising_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.ops.pallas.fused_hop import (
            fused_hop_init_state, make_fused_hop)
        from audio_denoising_tpu.runtime.plan import build_cell_plan

        cfg, model, params = load_pretrained("gruunet2-good")
        plan = build_cell_plan(model, params)
        rng = np.random.default_rng(0)
        B, hop = 8, cfg.dsp.hop_length
        f32 = jax.jit(make_fused_hop(cfg, plan))
        i8 = jax.jit(make_fused_hop(cfg, plan, compute_dtype=jnp.int8))
        s0 = s1 = fused_hop_init_state(cfg, plan, B)
        worst = np.inf
        for _ in range(10):
            chunk = jnp.asarray(0.1 * rng.standard_normal((B, hop)),
                                jnp.float32)
            s0, o0 = f32(s0, chunk)
            s1, o1 = i8(s1, chunk)
            num = float(jnp.sum((o0 - o1) ** 2))
            den = float(jnp.sum(o0 ** 2))
            worst = min(worst, 10 * np.log10(den / max(num, 1e-20)))
        # K-hop resident variant must also lower
        multi = jax.jit(make_fused_hop(cfg, plan, compute_dtype=jnp.int8,
                                       hops_per_call=4))
        chunks = jnp.asarray(
            0.1 * rng.standard_normal((4, B, hop)), jnp.float32)
        _s, outs = multi(fused_hop_init_state(cfg, plan, B), chunks)
        jax.block_until_ready(outs)
        ok = bool(worst > 20.0 and np.isfinite(np.asarray(outs)).all())
        print(json.dumps({"ok": ok, "agreement_db": round(float(worst), 1),
                          "error": None}))
        return 0 if ok else 1
    except Exception as e:  # compile/lowering failures land here
        print(json.dumps({"ok": False, "agreement_db": None,
                          "error": f"{type(e).__name__}: {e}"[:400]}))
        return 1


if __name__ == "__main__":
    sys.exit(main())
