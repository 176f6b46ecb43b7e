"""The ENTIRE webrtc serving hop — including warm-start Griffin-Lim — as
one Pallas TPU kernel.

The reference's flagship UX is the Griffin-Lim WebRTC path
(app2.py:174-233): ring buffer, per-window peak norm, Hann pre-window,
3-frame centered STFT, mel log1p, 3 recurrent cells, inverse mel, GL
reconstruction, overlap-add. pipeline.make_webrtc_step reproduces it
op-by-op; this kernel fuses the whole hop, with the RTISI-style streaming
warm start (carry converged phases, re-seed shifted one frame,
pipeline.py:166-204) unrolled IN-KERNEL.

Design notes (all linear algebra — Pallas has no FFT primitive, and at
these sizes the MXU beats one anyway):

- STFT frames are matmuls against a window-folded DFT pair
  ``CFw = diag(win) @ CF`` (n_fft, FP); the SAME pair serves the inverse:
  ``irfft(X) * win = ((X.re * wN) @ CFw.T + (X.im * wN) @ SFw.T)`` —
  computed as ``(CFw @ X.T).T`` so only the SMALL activation matrix is
  transposed in-kernel (transposing the weights would cost a 5.5 MB VMEM
  stack copy per call — the compile-killer).
- fp32 matmul precision on the MXU (Precision.HIGH/HIGHEST) makes Mosaic
  materialize bf16 hi/lo splits of the operands on the VMEM stack
  (~65 MB for this kernel — over the ~16 MB/core budget). Instead the DFT
  pair is PRE-SPLIT on the host into bf16 (hi, lo) planes — same total
  bytes as fp32 — and matmuls run as 3-pass splits
  (``a_hi@M_hi + a_hi@M_lo + a_lo@M_hi``, ~1e-5 relative, the bf16_3x
  scheme) with fp32 accumulate.
- torch-style centered reflect padding needs lane reversal, which Mosaic
  does not lower (lax.rev unsupported); reversal runs on the MXU against
  a precomputed exchange matrix J (hop, hop), exact in bf16 (0/1
  entries). The +-1-shifted reversal slices come via pltpu.roll so every
  lane slice stays 128-aligned.
- frequency bins are padded to FP = roundup(F, 128): Mosaic cannot lower
  lane concats at non-128-aligned offsets. Pad bins carry zero DFT
  columns and zero magnitude — they never contribute.
- hop == n_fft/2 (the reference webrtc config) makes the centered STFT of
  one analysis window exactly T=3 frames and the istft trim region a pair
  of static hop-wide slices.
- the Griffin-Lim loop (istft -> stft -> momentum -> renormalize,
  torchaudio functional.griffinlim structure) is statically unrolled; all
  phases stay in VMEM across iterations. ``compute_dtype='bfloat16'``
  runs the GL-loop matmuls hi-only (1 pass instead of 3; phases are unit
  vectors, so this costs bounded phase noise — see the parity test);
  the analysis and final synthesis always run 3-pass.

Semantics follow pipeline.make_webrtc_step with griffin_lim_warm_start
exactly; parity is tested in tests/test_webrtc_hop.py (interpret mode)
and on-chip (docs/BENCHMARKS.md).
"""

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_denoising_tpu.config import Config
from audio_denoising_tpu.ops import hann_window, mel_filterbank, inverse_mel_matrix
from audio_denoising_tpu.ops.pallas.common import pack_plan_weights, plan_cell_math


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fpad(F: int) -> int:
    """Frequency bins padded to the 128-lane boundary (see module doc)."""
    return _round_up(F, 128)


def _split_bf16(a):
    """Host-side bf16 (hi, lo) planes of an fp32 matrix: hi+lo carries
    ~16 mantissa bits; 3-pass matmuls against them reach ~1e-5 relative
    without Mosaic's on-stack operand splitting."""
    a32 = jnp.asarray(np.asarray(a, np.float32))
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


class WebRTCHopState(NamedTuple):
    ring: jnp.ndarray     # (B, n_fft) input window
    ola: jnp.ndarray      # (B, n_fft) synthesis accumulator
    hx: jnp.ndarray       # (B, hidden*compressed)
    ang_re: jnp.ndarray   # (B, 3*FP) carried GL phases (unit vectors)
    ang_im: jnp.ndarray   # (B, 3*FP); frame t's bins at [t*FP, t*FP+F)


def webrtc_const_bytes(cfg: Config) -> int:
    """VMEM bytes of this kernel's non-plan constant operands (the GL DFT
    pair, exchange matrix, mel/inverse-mel, envelopes) — what the engine's
    fused-mode VMEM gate must add on top of the dense plan for mode
    'fused-webrtc' (a near-budget plan would otherwise pass the gate and
    still OOM scoped VMEM at compile)."""
    dsp = cfg.dsp
    n_fft, hop, F, M = dsp.n_fft, dsp.hop_length, dsp.n_stft, dsp.n_mels
    FP = _fpad(F)
    return (4 * n_fft * FP * 2        # CF/SF hi+lo planes, bf16
            + hop * hop * 2           # exchange matrix J, bf16
            + (3 * FP + n_fft + 2 * FP + FP * M + M * FP + n_fft) * 4)


def webrtc_hop_init_state(cfg: Config, plan, batch: int) -> WebRTCHopState:
    n_fft, FP = cfg.dsp.n_fft, _fpad(cfg.dsp.n_stft)
    return WebRTCHopState(
        ring=jnp.zeros((batch, n_fft), jnp.float32),
        ola=jnp.zeros((batch, n_fft), jnp.float32),
        hx=jnp.zeros((batch, plan.hidden * plan.compressed), jnp.float32),
        # warm seed 1+0j, matching pipeline.webrtc_init_state
        ang_re=jnp.ones((batch, 3 * FP), jnp.float32),
        ang_im=jnp.zeros((batch, 3 * FP), jnp.float32))


def make_webrtc_hop(cfg: Config, plan, interpret: bool = False,
                    block_b: int = 32, compute_dtype=jnp.float32,
                    hops_per_call: int = 1):
    """One-kernel webrtc hop: ``step(state, chunk (B, hop)) -> (state',
    out (B, hop))``, matching pipeline.make_webrtc_step with
    griffin_lim_warm_start=True (app2.py:174-233 semantics).

    ``compute_dtype='bfloat16'`` switches the GL-loop matmuls to single
    bf16 passes (the analysis and final synthesis stay 3-pass ~fp32).

    ``hops_per_call == K > 1`` -> ``step(state, chunks (K, B, hop)) ->
    (state', outs (K, B, hop))``: K hops inside ONE pallas_call with the
    per-stream state (ring, OLA, hx, GL phases) RESIDENT IN VMEM SCRATCH
    across grid steps — the GL throughput path (the fused_hop resident
    pattern; per-hop kernel launches and state HBM round trips vanish).
    Hop-exact vs the sequential kernel (test-locked)."""
    dsp = cfg.dsp
    n_fft, hop, F, M = dsp.n_fft, dsp.hop_length, dsp.n_stft, dsp.n_mels
    assert n_fft == 2 * hop, "fused webrtc hop expects hop == n_fft/2"
    assert n_fft % 2 == 0
    assert dsp.griffin_lim_warm_start, (
        "the fused webrtc hop carries GL phases (warm start); enable "
        "dsp.griffin_lim_warm_start")
    assert dsp.domain != "raw", "webrtc path is mel-domain (app2.py:199-202)"
    n_iter = dsp.griffin_lim_iters
    mom = dsp.griffin_lim_momentum / (1 + dsp.griffin_lim_momentum)
    n = plan.hidden * plan.compressed
    assert not plan.delta, "webrtc hop serves the GRUUNet family"
    gl_fast = np.dtype(compute_dtype) != np.dtype(np.float32)

    FP = _fpad(F)
    win = np.asarray(hann_window(n_fft), np.float64)
    k = np.arange(F)
    t_ = np.arange(n_fft)
    ang = 2 * np.pi * np.outer(t_, k) / n_fft          # (n_fft, F)
    fpad = lambda a: np.pad(a, ((0, 0), (0, FP - F)))
    CF_hi, CF_lo = _split_bf16(fpad(win[:, None] * np.cos(ang)))
    SF_hi, SF_lo = _split_bf16(fpad(win[:, None] * -np.sin(ang)))
    # irfft weights: irfft(R+iI)*win = (R*wN) @ CFw.T + (I*wN) @ SFw.T
    wN = np.zeros(FP)
    wN[:F] = 2.0 / n_fft
    wN[0] = wN[F - 1] = 1.0 / n_fft
    wN3 = np.tile(wN, 3)[None, :].astype(np.float32)   # (1, 3FP)
    # exchange matrix: (v @ J)[j] = v[hop-1-j]; 0/1 entries — bf16-exact
    J = jnp.asarray(np.eye(hop)[::-1].copy()).astype(jnp.bfloat16)
    # istft OLA envelope over the trim region [hop, hop+n_fft) of the
    # 3-frame overlap-add (torch.istft normalization, ops/stft.py:96-98)
    env_full = np.zeros(n_fft + 2 * hop)
    for i in range(3):
        env_full[i * hop: i * hop + n_fft] += win * win
    env = env_full[hop: hop + n_fft]
    env = np.where(np.abs(env) > 1e-11, env, 1.0)[None, :].astype(np.float32)
    # per-bin one-hop phase advance for the extrapolated newest frame
    # (pipeline.py:166-173); pad bins rotate by 1 (stay at 0 magnitude)
    rot = np.ones(FP, np.complex128)
    rot[:F] = np.exp(2j * np.pi * np.arange(F) * hop / n_fft)
    rot_re = rot.real[None, :].astype(np.float32)
    rot_im = rot.imag[None, :].astype(np.float32)

    mel = np.pad(np.asarray(mel_filterbank(F, M, dsp.sample_rate),
                            np.float32), ((0, FP - F), (0, 0)))
    imel = np.pad(np.asarray(inverse_mel_matrix(F, M, dsp.sample_rate)
                             ).T.astype(np.float32), ((0, 0), (0, FP - F)))
    win_row = win[None, :].astype(np.float32)

    consts = [CF_hi, CF_lo, SF_hi, SF_lo, J, wN3, env, rot_re, rot_im,
              mel, imel, win_row]
    weights, skip_flags = pack_plan_weights(plan)
    operands = [jnp.asarray(c) for c in consts] + \
               [jnp.asarray(w) for w in weights]
    n_consts = len(consts)
    gain = cfg.serving.output_gain
    decay = cfg.serving.state_decay

    def _hop_math(cs, w, states, chunk):
        """One webrtc hop on plain arrays: ``states`` is [ring, ola, hx,
        a_re, a_im]; returns (new_states, out_hop). Shared by the
        single-hop kernel and the resident multi-hop kernel."""
        ring_prev, ola_prev, hx_prev, are_prev, aim_prev = states
        (cfh, cfl, sfh, sfl, jx, wn3, env_r, rre, rim, melr, imelr,
         winr) = cs
        B = ring_prev.shape[0]
        f32 = jnp.float32
        bf16 = jnp.bfloat16

        def hl(a):
            """bf16 (hi, lo) planes of an fp32 in-kernel array."""
            ah = a.astype(bf16)
            return ah, (a - ah.astype(f32)).astype(bf16)

        def dmm(a, m):
            return jnp.dot(a, m, preferred_element_type=f32)

        def msplit(a, hi_ref, lo_ref, split):
            """a (fp32) @ M where M was host-split: 3-pass ~fp32, or
            hi-only bf16 when ``split`` is False (GL fast mode)."""
            ah, al = hl(a)
            out = dmm(ah, hi_ref[:])
            if split:
                out = out + dmm(ah, lo_ref[:]) + dmm(al, hi_ref[:])
            return out

        def msplit_t(a, hi_ref, lo_ref, split):
            """a (B', FP) @ M.T for host-split M (n_fft, FP), via the
            activation transpose: (M @ a.T).T — a is small."""
            ah, al = hl(a)
            aht = jnp.transpose(ah)                   # (FP, B')
            out = jnp.transpose(dmm(hi_ref[:], aht))
            if split:
                out = out + jnp.transpose(dmm(lo_ref[:], aht))
                out = out + jnp.transpose(dmm(hi_ref[:],
                                              jnp.transpose(al)))
            return out

        def dot32(a, m_ref):
            return jnp.dot(a, m_ref[:], preferred_element_type=f32,
                           precision=jax.lax.Precision.HIGHEST)

        def stft3(x, split):
            """x (B, n_fft) fp32 -> (re, im) each (B, 3FP): torch-style
            centered reflect-padded STFT, window folded into the DFT."""
            xl = pltpu.roll(x, n_fft - 1, 1)          # xl[j] = x[j+1]
            xr = pltpu.roll(x, 1, 1)                  # xr[j] = x[j-1]

            # J is exact in bf16: 2 passes (hi@J + lo@J) reconstruct fp32
            def rev(v):
                vh, vl = hl(v)
                r = dmm(vh, jx[:])
                return r + dmm(vl, jx[:]) if split else r

            head = rev(xl[:, :hop])                   # rev(x[1:hop+1])
            tail = rev(xr[:, hop:])                   # rev(x[hop-1:2hop-1])
            f0 = jnp.concatenate([head, x[:, :hop]], axis=1)
            f2 = jnp.concatenate([x[:, hop:], tail], axis=1)
            frames = jnp.concatenate([f0, x, f2], axis=0)    # (3B, n_fft)
            re = msplit(frames, cfh, cfl, split)             # (3B, FP)
            im = msplit(frames, sfh, sfl, split)
            lanes = lambda a: jnp.concatenate(
                [a[:B], a[B:2 * B], a[2 * B:]], axis=1)      # (B, 3FP)
            return lanes(re), lanes(im)

        def istft3(xre, xim, split):
            """(B, 3FP) complex spec -> (B, n_fft) time (centered istft,
            length = n_fft, env-normalized trim region)."""
            rw = xre * wn3[0]
            iw = xim * wn3[0]
            rows = lambda a: jnp.concatenate(
                [a[:, :FP], a[:, FP:2 * FP], a[:, 2 * FP:]],
                axis=0)                                      # (3B, FP)
            frames = (msplit_t(rows(rw), cfh, cfl, split)
                      + msplit_t(rows(iw), sfh, sfl, split))
            f0, f1, f2 = frames[:B], frames[B:2 * B], frames[2 * B:]
            left = f0[:, hop:] + f1[:, :hop]
            right = f1[:, hop:] + f2[:, :hop]
            return jnp.concatenate([left, right], axis=1) / env_r[0]

        # --- analysis (app2.py:181-202); 3-pass — it feeds the model ----
        ring = jnp.concatenate([ring_prev[:, hop:], chunk], axis=-1)
        peak = jnp.max(jnp.abs(ring), axis=-1, keepdims=True)
        ok = peak > 1e-6
        normed = jnp.where(ok, ring / jnp.where(ok, peak, 1.0), ring)
        peak = jnp.where(ok, peak, 1.0)
        windowed = normed * winr[0]                   # Hann pre-window
        re, im = stft3(windowed, split=True)
        mag = jnp.sqrt(re * re + im * im)             # (B, 3FP)

        # --- mel + model (3 sequential cells, carried hx) ----------------
        mag_f = jnp.concatenate(
            [mag[:, :FP], mag[:, FP:2 * FP], mag[:, 2 * FP:]], axis=0)
        x = jnp.log(1.0 + dot32(mag_f, melr))         # (3B, M)
        hx = hx_prev
        recs = []
        for t in range(3):
            xt = x[t * B:(t + 1) * B]
            y, hx = plan_cell_math(w, skip_flags, n, M, False, xt, hx)
            rec = xt - y
            recs.append(jnp.where(rec >= 0, rec, 0.2 * rec))
        rec3 = jnp.concatenate(recs, axis=0)          # (3B, M)
        mel_mag = jnp.maximum(jnp.exp(rec3) - 1.0, 0.0)
        lin = jnp.maximum(dot32(mel_mag, imelr), 0.0) * gain   # (3B, FP)
        gl_mag = jnp.concatenate(
            [lin[:B], lin[B:2 * B], lin[2 * B:]], axis=1)      # (B, 3FP)

        # --- warm GL seed: shift one frame, rotate the newest ------------
        a_re, a_im = are_prev, aim_prev
        last_re = a_re[:, 2 * FP:]
        last_im = a_im[:, 2 * FP:]
        new_re = last_re * rre[0] - last_im * rim[0]
        new_im = last_re * rim[0] + last_im * rre[0]
        a_re = jnp.concatenate([a_re[:, FP:], new_re], axis=1)
        a_im = jnp.concatenate([a_im[:, FP:], new_im], axis=1)

        # --- Griffin-Lim, statically unrolled ----------------------------
        gl_split = not gl_fast
        tp_re = jnp.zeros_like(a_re)
        tp_im = jnp.zeros_like(a_im)
        for _ in range(n_iter):
            time = istft3(gl_mag * a_re, gl_mag * a_im, gl_split)
            r_re, r_im = stft3(time, gl_split)
            u_re = r_re - mom * tp_re
            u_im = r_im - mom * tp_im
            nrm = jnp.sqrt(u_re * u_re + u_im * u_im) + 1e-16
            a_re, a_im = u_re / nrm, u_im / nrm
            tp_re, tp_im = r_re, r_im

        # --- synthesis + OLA (app2.py:224-231); 3-pass -------------------
        frame = istft3(gl_mag * a_re, gl_mag * a_im, True) * peak
        out_hop = ola_prev[:, :hop]
        ola = jnp.concatenate(
            [ola_prev[:, hop:], jnp.zeros_like(ola_prev[:, :hop])],
            axis=-1) + frame
        return [ring, ola, hx * decay, a_re, a_im], out_hop

    N_STATE = 5

    def kernel(*refs):
        ins = refs[:N_STATE + 1]                      # states + chunk
        outs = refs[-(N_STATE + 1):]                  # states' + out
        cs = refs[N_STATE + 1:N_STATE + 1 + n_consts]
        w = list(refs[N_STATE + 1 + n_consts:-(N_STATE + 1)])
        states, out = _hop_math(cs, w, [r[:] for r in ins[:N_STATE]],
                                ins[N_STATE][:])
        for o, v in zip(outs[:N_STATE], states):
            o[:] = v
        outs[N_STATE][:] = out

    K = hops_per_call

    def kernel_multi(*refs):
        ins = refs[:N_STATE + 1]                      # states + chunks
        scratch = refs[-N_STATE:]                     # VMEM-resident
        outs = refs[-(2 * N_STATE + 1):-N_STATE]      # states' + outs
        cs = refs[N_STATE + 1:N_STATE + 1 + n_consts]
        w = list(refs[N_STATE + 1 + n_consts:-(2 * N_STATE + 1)])
        chunk_ref = ins[N_STATE]
        out_o = outs[N_STATE]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            for sc, r in zip(scratch, ins[:N_STATE]):
                sc[:] = r[:]

        states = [sc[:] for sc in scratch]
        states, out = _hop_math(cs, w, states, chunk_ref[0])
        out_o[0] = out
        for sc, v in zip(scratch, states):
            sc[:] = v

        @pl.when(k == K - 1)
        def _():
            for o, v in zip(outs[:N_STATE], states):
                o[:] = v

    def step_multi(state: WebRTCHopState, chunks: jnp.ndarray):
        k, b = chunks.shape[0], chunks.shape[1]
        assert k == K, f"expected {K} hops per call, got {k}"
        bp = _round_up(b, block_b)
        states = list(state)
        if bp != b:
            states = [jnp.pad(a, ((0, bp - b), (0, 0))) for a in states]
            chunks = jnp.pad(chunks, ((0, 0), (0, bp - b), (0, 0)))
        grid = (bp // block_b, K)
        bspec = lambda width: pl.BlockSpec(
            (block_b, width), lambda i, kk: (i, 0),
            memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((1, block_b, hop), lambda i, kk: (kk, i, 0),
                             memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(op.shape, lambda i, kk: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for op in operands]
        widths = [n_fft, n_fft, states[2].shape[1], 3 * FP, 3 * FP]
        state_specs = [bspec(wd) for wd in widths]
        res = pl.pallas_call(
            kernel_multi,
            grid=grid,
            in_specs=state_specs + [kspec] + const_specs,
            out_specs=tuple(state_specs) + (kspec,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((bp, wd), jnp.float32)
                for wd in widths)
            + (jax.ShapeDtypeStruct((K, bp, hop), jnp.float32),),
            scratch_shapes=[pltpu.VMEM((block_b, wd), jnp.float32)
                            for wd in widths],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*states, chunks, *operands)
        new_states, outs = list(res[:-1]), res[-1]
        if bp != b:
            new_states = [a[:b] for a in new_states]
            outs = outs[:, :b]
        return WebRTCHopState(*new_states), outs

    if hops_per_call > 1:
        return step_multi

    def step(state: WebRTCHopState,
             chunk: jnp.ndarray) -> Tuple[WebRTCHopState, jnp.ndarray]:
        b = chunk.shape[0]
        bp = _round_up(b, block_b)
        states = list(state)
        if bp != b:
            states = [jnp.pad(a, ((0, bp - b), (0, 0))) for a in states]
            chunk = jnp.pad(chunk, ((0, bp - b), (0, 0)))
        grid = (bp // block_b,)
        bspec = lambda width: pl.BlockSpec(
            (block_b, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(op.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for op in operands]
        widths = [n_fft, n_fft, states[2].shape[1], 3 * FP, 3 * FP]
        state_specs = [bspec(wd) for wd in widths]
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=state_specs + [bspec(hop)] + const_specs,
            out_specs=tuple(state_specs) + (bspec(hop),),
            out_shape=tuple(
                jax.ShapeDtypeStruct((bp, wd), jnp.float32)
                for wd in widths)
            + (jax.ShapeDtypeStruct((bp, hop), jnp.float32),),
            # the v5e has 128 MB VMEM; Mosaic's default 16 MB scoped
            # limit is conservative — the unrolled GL loop's live set
            # (operand double-buffers + activation transposes) needs more
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*states, chunk, *operands)
        new_states, out = list(res[:-1]), res[-1]
        if bp != b:
            new_states = [a[:b] for a in new_states]
            out = out[:b]
        return WebRTCHopState(*new_states), out

    return step
