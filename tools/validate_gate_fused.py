#!/usr/bin/env python
"""On-chip validation of the IN-KERNEL SNR gate in the fused hop.

Both gate estimators (ServingConfig.snr_gate_estimator 'removed' and
'floor') are interpret-mode locked on CPU (tests/test_fused_hop.py);
this script confirms their Mosaic lowering on the real TPU and checks
the kernel agrees with the op-by-op gated fast step on real-ish audio.

Prints one JSON line:
{"ok": bool, "removed_db": ..., "floor_db": ..., "error": ...}.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    try:
        import jax
        import jax.numpy as jnp
        from audio_denoising_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
        from audio_denoising_tpu.config import with_snr_gate
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.ops.pallas.fused_hop import (
            fused_hop_init_state, make_fused_hop)
        from audio_denoising_tpu.runtime.plan import build_cell_plan

        cfg0, model, params = load_pretrained("gruunet2-good")
        plan = build_cell_plan(model, params)
        rng = np.random.default_rng(0)
        B, hop = 8, cfg0.dsp.hop_length
        t = np.arange(40 * hop) / cfg0.dsp.sample_rate
        voice = 0.3 * np.sin(2 * np.pi * 350 * t, dtype=np.float64)
        sigs = np.stack([
            voice + 0.2 * rng.standard_normal(t.shape)  # noisy
            if i % 2 else voice                          # clean
            for i in range(B)]).astype(np.float32)

        out = {}
        for est, gate in (("removed", 1.0), ("floor", 10.0)):
            cfg = with_snr_gate(cfg0, gate, None, est)
            kern = jax.jit(make_fused_hop(cfg, plan))
            state = fused_hop_init_state(cfg, plan, B)
            # op-by-op reference: interpret-mode kernel (same math,
            # jnp lowering) — the CPU-locked surface
            ref = jax.jit(make_fused_hop(cfg, plan, interpret=True))
            rstate = fused_hop_init_state(cfg, plan, B)
            worst = np.inf
            for k in range(40):
                chunk = jnp.asarray(sigs[:, k * hop:(k + 1) * hop])
                state, o = kern(state, chunk)
                rstate, ro = ref(rstate, chunk)
                num = float(jnp.sum((jnp.asarray(np.asarray(o))
                                     - ro) ** 2))
                den = float(jnp.sum(ro ** 2))
                if den > 1e-12:
                    worst = min(worst,
                                10 * np.log10(den / max(num, 1e-20)))
            out[f"{est}_db"] = round(float(worst), 1)
        ok = bool(out["removed_db"] > 20.0 and out["floor_db"] > 20.0)
        print(json.dumps({"ok": ok, **out, "error": None}))
        return 0 if ok else 1
    except Exception as e:
        print(json.dumps({"ok": False, "error":
                          f"{type(e).__name__}: {e}"[:400]}))
        return 1


if __name__ == "__main__":
    sys.exit(main())
