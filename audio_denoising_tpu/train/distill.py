"""Teacher-student distillation targets (round 5, VERDICT r4 #5).

The round-4 frontier left a question open: is the causal family's
quality deficit (best causal +1.82 dB ΔSI-SDR vs best 2-s segment
+6.42 on manifest v2) an OPTIMIZATION gap or an INFORMATION gap?
Distillation separates them: train the causal student against the
segment teacher's *achievable* denoised waveform instead of the ground
truth. If the student closes part of the gap, the deficit was partly
optimization (the truth is too hard a target); if it doesn't move, the
gap is information (the future context itself).

Mechanically this is a data-pipeline transform: the sampled mixture is
pushed through the teacher's full serving chain on device
(stop-gradient, no backward cost) and its output replaces ``clean`` as
the reconstruction target. The teacher's parameters ride as jit
ARGUMENTS (never traced constants — a closed-over constant would be
re-staged per dispatch on a relay-attached chip, the round-2 230
MB/step lesson in train/device_data.py).

No reference counterpart: the reference trains against clean targets
only (its TrainingContext contract, server.py:86-142).
"""

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def load_teacher(path: str, student_cfg) -> Tuple[Dict, Callable]:
    """Load a teacher checkpoint -> ``(teacher_params, fn)`` with
    ``fn(teacher_params, wave) -> denoised wave`` jit-traceable on fixed
    shapes.

    The teacher runs its own serving chain — the stateless segment path
    (pipeline.offline_denoise_stateless) for the 2D U-Net family, the
    recurrent offline path otherwise — with its serving SNR gate forced
    OFF: the gate is a deployment nicety whose per-window noise-floor
    tracker cannot converge inside a training crop, and the distilled
    mapping should be the model's, not the gate's.
    """
    from audio_denoising_tpu import pipeline
    from audio_denoising_tpu.hub import load_pretrained

    cfg_t, model_t, params_t = load_pretrained(path)
    if cfg_t.dsp.sample_rate != student_cfg.dsp.sample_rate:
        raise ValueError(
            f"distillation teacher runs at {cfg_t.dsp.sample_rate} Hz but "
            f"the student trains at {student_cfg.dsp.sample_rate} Hz; "
            f"resampling inside the train step would dominate it — pick a "
            f"same-rate teacher")
    cfg_t = dataclasses.replace(
        cfg_t, serving=dataclasses.replace(cfg_t.serving, snr_gate_db=None))
    params_t = {k: jnp.asarray(v) for k, v in params_t.items()}

    if hasattr(model_t, "compatible_frames"):      # stateless U-Net family
        def fn(tp, wave):
            return pipeline.offline_denoise_stateless(cfg_t, model_t, tp,
                                                      wave)
    else:
        def fn(tp, wave):
            return pipeline.offline_denoise(cfg_t, model_t, tp, wave)

    def teacher(tp, wave):
        return jax.lax.stop_gradient(fn(tp, wave))

    return params_t, teacher
