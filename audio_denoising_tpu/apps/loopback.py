"""Live mic->speaker loopback diagnostic — the rtmds.py equivalent
(reference rtmds.py:25-98: duplex sounddevice stream, gain knob, device
selection; its denoising path is disabled there).

Here the denoiser IS wired in (``--model``), using the streaming fast
path; pass ``--no-denoise`` for the reference's raw-loopback behavior.
Capability-gated: requires the optional ``sounddevice`` package and real
audio hardware, neither of which exists in CI — the module imports
cleanly everywhere and fails with a clear message only when run.
"""

import argparse
import numpy as np


def sounddevice_available() -> bool:
    try:
        import sounddevice  # noqa: F401
        return True
    except Exception:
        return False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="audio_denoising_tpu loopback",
        description="Mic -> speaker loopback latency/denoise diagnostic")
    p.add_argument("--model", default="gruunet2-good")
    p.add_argument("--no-denoise", action="store_true",
                   help="raw passthrough (reference rtmds behavior)")
    p.add_argument("--gain", type=float, default=2.0,
                   help="output gain (rtmds.py applies x2)")
    p.add_argument("--device", default=None, help="sounddevice device id")
    p.add_argument("--seconds", type=float, default=0.0,
                   help="auto-stop after N seconds (0 = run until Ctrl-C)")
    args = p.parse_args(argv)

    if not sounddevice_available():
        p.error("sounddevice is not installed / no audio hardware; "
                "this diagnostic needs a real audio device")
    import sounddevice as sd

    if args.no_denoise:
        step = None
    else:
        import jax
        import jax.numpy as jnp
        from audio_denoising_tpu.hub import load_pretrained
        from audio_denoising_tpu.runtime.engine import (
            make_fast_step, fast_init_state)
        cfg, model, params = load_pretrained(args.model)
        fast = jax.jit(make_fast_step(cfg, model), donate_argnums=(1,))
        state = fast_init_state(cfg, model, 1)
        hop = cfg.dsp.hop_length

        def step(chunk: np.ndarray) -> np.ndarray:
            nonlocal state
            state, out = fast(params, state, jnp.asarray(chunk[None]))
            return np.asarray(out[0])

    # reference rtmds runs the device at 48 kHz; the denoising branch must
    # clock the device at the MODEL's rate or audio is spectrally mis-mapped
    sr = 48000 if args.no_denoise else cfg.dsp.sample_rate
    hop = 768 if args.no_denoise else hop

    def callback(indata, outdata, frames, t, status):
        if status:
            print(status, flush=True)
        mono = indata[:, 0].astype(np.float32)
        out = mono if step is None else step(mono)
        outdata[:, 0] = np.clip(out * args.gain, -1.0, 1.0)

    print(f"loopback running (sr={sr}, block={hop}); Ctrl-C to stop")
    with sd.Stream(samplerate=sr, blocksize=hop, channels=1,
                   dtype="float32", callback=callback, device=args.device):
        try:
            if args.seconds > 0:
                sd.sleep(int(args.seconds * 1000))
            else:
                while True:
                    sd.sleep(1000)
        except KeyboardInterrupt:
            pass
    return 0
