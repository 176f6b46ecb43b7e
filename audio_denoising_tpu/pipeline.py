"""End-to-end denoise graphs.

Three pipelines mirror the reference's entry points, each built as ONE pure
jitted function (the reference crosses the Python/torch boundary per stage;
here XLA fuses the whole chain):

- ``offline_denoise``      — full-file STFT -> model scan -> reconstruct
                             (the intended semantics of app.py's upload path,
                             whose shipped version feeds raw waveform into the
                             model with no STFT — a defect, app.py:197-210).
- ``make_webrtc_step``     — the app2.py recv hot loop (app2.py:174-233):
                             per-hop ring buffer, per-frame peak norm, Hann
                             pre-window, mel log1p domain, residual subtract,
                             leaky_relu(0.2), expm1, inverse mel, Griffin-Lim,
                             overlap-add.
- ``make_server_step``     — the server.py loop (server.py:200-216): noisy
                             phase reuse, relu gain x3, hx decay x0.9, iSTFT.

All functions are batched over a leading streams axis and carry state as an
explicit pytree (no mutable processor objects — removes the reference's
cross-thread hx races, SURVEY §5).
"""

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import Config
from audio_denoising_tpu.ops import (
    hann_window, stft, istft, mel_filterbank, inverse_mel_matrix,
    mel_scale, inverse_mel_scale, griffin_lim, num_frames,
)


def _transforms(cfg: Config):
    dsp = cfg.dsp
    if dsp.domain == "raw":
        # clamped raw-spectrogram era (utils.py:82-95): features are log1p
        # of the raw magnitude at n_stft bins — no mel pair in the chain.
        assert dsp.n_mels == dsp.n_stft, (
            "raw domain: n_mels must equal n_stft (feature width)")
        return None, None, hann_window(dsp.win)
    fb = mel_filterbank(dsp.n_stft, dsp.n_mels, dsp.sample_rate)
    inv = inverse_mel_matrix(dsp.n_stft, dsp.n_mels, dsp.sample_rate)
    win = hann_window(dsp.win)
    return fb, inv, win


def _to_features(cfg: Config, mag: jnp.ndarray, fb) -> jnp.ndarray:
    """(B, F, T) magnitude -> (B, M, T) model features per cfg.dsp.domain."""
    if cfg.dsp.domain == "raw":
        return jnp.log1p(mag)     # signed-log clamp == log1p on magnitudes
    return jnp.log1p(mel_scale(mag, fb))


def _to_linear(cfg: Config, feat_out: jnp.ndarray, inv) -> jnp.ndarray:
    """(B, M, T) reconstructed features -> (B, F, T) linear magnitude."""
    lin = jnp.maximum(jnp.expm1(feat_out), 0.0)
    if cfg.dsp.domain == "raw":
        return lin
    return inverse_mel_scale(lin, inv)


def _apply_snr_gate(cfg: Config, mag: jnp.ndarray,
                    lin_mag: jnp.ndarray) -> jnp.ndarray:
    """SNR-gated output blend (ServingConfig.snr_gate_db; rationale in
    ops/noisefloor.py): per-frame alpha in [0, 1] from a causal SNR
    estimator; near-clean frames lean toward the INPUT magnitude (with
    the reused noisy phase, passthrough-exact). No-op when the gate is
    unset. mag/lin_mag: (B, F, T) linear input/output magnitudes."""
    srv = cfg.serving
    if srv.snr_gate_db is None:
        return lin_mag
    from audio_denoising_tpu.ops.noisefloor import (
        FLOOR_VETO_GATE_DB, FLOOR_VETO_WIDTH_DB, floor_rise_per_frame,
        gate_alpha, noise_floor_scan, removed_powers, removed_snr_scan,
        smooth_beta_per_frame, snr_db_from_floor, total_beta_per_frame)
    power = mag * mag
    hop, sr = cfg.dsp.hop_length, cfg.dsp.sample_rate
    tau = srv.snr_gate_tau_s
    est = srv.snr_gate_estimator

    def removed_alpha():
        p_out, p_rem = removed_powers(power, lin_mag * lin_mag, axis=-2)
        snr, _ = removed_snr_scan(
            p_out, p_rem, total_beta_per_frame(hop, sr, tau))  # (B, T)
        return gate_alpha(snr, srv.snr_gate_db, srv.snr_gate_width_db)

    def floor_alpha(gate_db, width_db):
        floors, totals, _ = noise_floor_scan(
            power, floor_rise_per_frame(hop, sr),
            smooth_beta_per_frame(hop, sr),
            total_beta_per_frame(hop, sr, tau))
        snr = snr_db_from_floor(totals, jnp.mean(floors, axis=-2))
        return gate_alpha(snr, gate_db, width_db)

    if est == "removed":
        alpha = removed_alpha()
    elif est == "floor":
        alpha = floor_alpha(srv.snr_gate_db, srv.snr_gate_width_db)
    else:  # 'both': floor veto over the removed decision
        alpha = jnp.maximum(
            removed_alpha(),
            floor_alpha(FLOOR_VETO_GATE_DB, FLOOR_VETO_WIDTH_DB))
    alpha = alpha[:, None, :]
    return alpha * lin_mag + (1.0 - alpha) * mag


# --------------------------------------------------------------------------
# Offline full-file denoise
# --------------------------------------------------------------------------

def offline_denoise(cfg: Config, model, params, audio: jnp.ndarray,
                    hx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """audio: (B, L) or (L,) -> denoised audio of the same length.

    Full-sequence mel-domain denoise: STFT -> mel log1p -> residual model
    over all frames -> subtract -> inverse mel -> phase reuse or Griffin-Lim.
    """
    dsp = cfg.dsp
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    length = audio.shape[-1]
    fb, inv, win = _transforms(cfg)

    la = getattr(cfg.model, "lookahead_frames", 0)
    if la:
        # bounded-lookahead checkpoint (ModelConfig.lookahead_frames):
        # the model's output at step t targets frame t - la, so feed la
        # extra hops of silence to flush the tail — exactly what the
        # streaming path does when the input ends — and re-align below.
        audio = jnp.pad(audio, ((0, 0), (0, la * dsp.hop_length)))
    spec = stft(audio, dsp.n_fft, dsp.hop_length, dsp.win, window=win)
    mag = jnp.abs(spec)
    logmel = _to_features(cfg, mag, fb)                    # (B, M, T)
    x = jnp.swapaxes(logmel, -1, -2)                       # (B, T, M)
    resid, _ = model.apply(params, x, hx)
    if la:
        t_use = x.shape[1] - la            # frame count of the raw input
        resid = resid[:, la:]              # pred[t+la] targets frame t
        x = x[:, :t_use]
        spec = spec[..., :t_use]
        mag = mag[..., :t_use]
    recon = jax.nn.leaky_relu(x - resid, negative_slope=0.2)
    lin_mag = _to_linear(cfg, jnp.swapaxes(recon, -1, -2), inv)  # (B, F, T)
    lin_mag = _apply_snr_gate(cfg, mag, lin_mag)

    if dsp.reconstruction == "phase":
        phase = jnp.angle(spec)
        rec = lin_mag * jnp.exp(1j * phase)
        out = istft(rec, dsp.n_fft, dsp.hop_length, dsp.win, window=win,
                    length=length)
    else:
        out = griffin_lim(lin_mag, dsp.n_fft, dsp.hop_length, dsp.win,
                          window=win, n_iter=dsp.griffin_lim_iters,
                          momentum=dsp.griffin_lim_momentum, length=length)
    return out[0] if squeeze else out


def offline_denoise_stateless(cfg: Config, model, params,
                              audio: jnp.ndarray) -> jnp.ndarray:
    """Offline denoise through a stateless 2D U-Net (unet4 family).

    The raw-spectrogram domain of the 'clamped raw-spectrogram' era
    (BINS=241, n_fft=480 — reference utils.py:32-37, unet4.py:32):
    STFT -> log1p magnitude -> model residual over the whole (freq, time)
    image -> subtract -> expm1 -> noisy-phase iSTFT. The U-Net only accepts
    specific frame counts (fixed output_paddings, unet4.py:211-230), so the
    spectrogram pads to ``model.compatible_frames`` and the output crops
    back.
    """
    dsp = cfg.dsp
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    length = audio.shape[-1]
    win = hann_window(dsp.win)

    spec = stft(audio, dsp.n_fft, dsp.hop_length, dsp.win, window=win)
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    logmag = jnp.log1p(mag)                               # (B, F, T)

    t = logmag.shape[-1]
    t_pad = model.compatible_frames(t)
    x = jnp.pad(logmag, ((0, 0), (0, 0), (0, t_pad - t)))
    resid = model.apply(params, x)[..., :dsp.n_stft, :t]
    recon = jnp.maximum(logmag - resid, 0.0)
    lin = jnp.expm1(recon)
    lin = _apply_snr_gate(cfg, mag, lin)
    rec = lin * jnp.exp(1j * phase)
    out = istft(rec, dsp.n_fft, dsp.hop_length, dsp.win, window=win,
                length=length)
    return out[0] if squeeze else out


class UNetStreamState(NamedTuple):
    """Per-slot state for cadence-locked U-Net segment streaming."""
    ring: jnp.ndarray   # (B, ctx + seg + ctx) input sample history
    out: jnp.ndarray    # (B, seg) pending output segment
    # Segment-join crossfade carry (ServingConfig.unet_xfade_samples):
    # the previous window's denoised estimate of the NEXT segment's
    # first xf samples (they lie in its right-ctx span) — blended with
    # the new window's estimate over a linear ramp at the join. None
    # when xfade is 0.
    tail: Optional[jnp.ndarray] = None        # (B, xf)
    # SNR-gate carry (ops/noisefloor.py), present only when
    # cfg.serving.snr_gate_db is set. Carried ACROSS segment windows —
    # the per-window tracker inside offline_denoise_stateless cannot
    # converge in one ~0.1-0.2 s window (its floor seeds from the
    # window's first frame), which made the gate inert in this mode.
    # estimator 'floor' uses the nf_* planes; 'removed' the em_* EMAs.
    nf_smooth: Optional[jnp.ndarray] = None   # (B, F)
    nf_floor: Optional[jnp.ndarray] = None    # (B, F)
    nf_total: Optional[jnp.ndarray] = None    # (B,)
    em_out: Optional[jnp.ndarray] = None      # (B,)
    em_rem: Optional[jnp.ndarray] = None      # (B,)


def _unet_stream_geometry(cfg: Config) -> Tuple[int, int, int, int, int]:
    """(hop, seg_hops, seg, ctx_right, ctx_left). Latency is
    ``seg + ctx_right``; ctx_left is PAST samples — free lookahead-wise,
    it only grows the per-window compute (ServingConfig
    unet_ctx_left_samples, None = symmetric)."""
    hop = cfg.dsp.hop_length
    seg_hops = cfg.serving.unet_seg_hops
    ctx = cfg.serving.unet_ctx_samples
    ctx_l = getattr(cfg.serving, "unet_ctx_left_samples", None)
    return (hop, seg_hops, seg_hops * hop, ctx,
            ctx if ctx_l is None else ctx_l)


def _unet_xfade(cfg: Config) -> int:
    xf = getattr(cfg.serving, "unet_xfade_samples", 0)
    if xf:
        _h, _p, seg, ctx, _cl = _unet_stream_geometry(cfg)
        if xf > min(seg, ctx):
            raise ValueError(
                f"unet_xfade_samples={xf} exceeds min(seg={seg}, "
                f"ctx={ctx}) — the crossfade tail must lie inside the "
                f"previous window's denoised right context")
    return xf


def unet_stream_init_state(cfg: Config, model, batch: int,
                           dtype=jnp.float32) -> UNetStreamState:
    hop, _p, seg, ctx, ctx_l = _unet_stream_geometry(cfg)
    gate = cfg.serving.snr_gate_db is not None
    from audio_denoising_tpu.ops.noisefloor import estimator_planes
    r_, f_ = estimator_planes(cfg.serving.snr_gate_estimator)
    removed, floor = gate and r_, gate and f_
    xf = _unet_xfade(cfg)
    return UNetStreamState(
        ring=jnp.zeros((batch, ctx_l + seg + ctx), dtype),
        out=jnp.zeros((batch, seg), dtype),
        tail=jnp.zeros((batch, xf), dtype) if xf else None,
        nf_smooth=(jnp.zeros((batch, cfg.dsp.n_stft), dtype)
                   if floor else None),
        nf_floor=(jnp.zeros((batch, cfg.dsp.n_stft), dtype)
                  if floor else None),
        nf_total=jnp.zeros((batch,), dtype) if floor else None,
        em_out=jnp.zeros((batch,), dtype) if removed else None,
        em_rem=jnp.zeros((batch,), dtype) if removed else None)


def make_unet_stream_step(cfg: Config, model):
    """Streaming step for the stateless 2D U-Nets (unet4 family).

    ``step(params, state, chunk[B, hop], phase[] int32) -> (state, out[B, hop])``

    The reference only runs these models offline (unet4.py:147-194 consumes
    a whole (freq, time) image); streaming semantics are therefore ours:
    cadence-locked block processing. Every tick shifts one hop into a
    ``[ctx | seg | ctx]`` sample ring; on the cycle-closing tick
    (``phase == seg_hops-1``) the full offline graph
    (:func:`offline_denoise_stateless`) runs ONCE over the ring and the
    middle ``seg`` samples become the next cycle's output buffer, which the
    following ``seg_hops`` ticks drain hop by hop. Consecutive emitted
    segments are contiguous in sample time (the ring advances exactly
    ``seg`` per cycle); the flanking ``ctx`` samples give the conv stack
    real context at joins and absorb the iSTFT edge taper. End-to-end
    latency is ``seg + ctx`` samples per emitted sample (the emitted
    middle slice lags the newest input by ``ctx`` — the lookahead — and
    drains over the following ``seg`` samples; the repo's
    test_zero_model_delay_is_identity asserts exactly this delay). The
    heavy branch sits under
    ``lax.cond`` so non-boundary ticks cost only the ring shift.
    """
    hop, seg_hops, seg, ctx, ctx_l = _unet_stream_geometry(cfg)
    gate = cfg.serving.snr_gate_db is not None
    est = cfg.serving.snr_gate_estimator
    from audio_denoising_tpu.ops.noisefloor import estimator_planes
    r_, f_ = estimator_planes(est)
    removed, floor = gate and r_, gate and f_
    if gate:
        # the window denoise runs UNGATED; the gate applies here with an
        # estimator carried ACROSS windows (see UNetStreamState note)
        import dataclasses
        from audio_denoising_tpu.ops.noisefloor import (
            FLOOR_VETO_GATE_DB, FLOOR_VETO_WIDTH_DB, FloorState,
            RemovedState, floor_rise_per_frame, gate_alpha,
            noise_floor_scan, removed_snr_db, removed_step,
            smooth_beta_per_frame, snr_db_from_floor, total_beta_per_frame)
        cfg_inner = dataclasses.replace(
            cfg, serving=dataclasses.replace(cfg.serving, snr_gate_db=None))
        if removed:
            # one EMA update per emitted SEGMENT, so the per-"frame"
            # retention uses the segment length as the hop
            beta_seg = total_beta_per_frame(
                seg, cfg.dsp.sample_rate, cfg.serving.snr_gate_tau_s)
        if floor:
            win = hann_window(cfg.dsp.win)
            rise = floor_rise_per_frame(cfg.dsp.hop_length,
                                        cfg.dsp.sample_rate)
            beta = smooth_beta_per_frame(cfg.dsp.hop_length,
                                         cfg.dsp.sample_rate)
            beta_t = total_beta_per_frame(cfg.dsp.hop_length,
                                          cfg.dsp.sample_rate,
                                          cfg.serving.snr_gate_tau_s)
            f_gate = (FLOOR_VETO_GATE_DB if est == "both"
                      else cfg.serving.snr_gate_db)
            f_width = (FLOOR_VETO_WIDTH_DB if est == "both"
                       else cfg.serving.snr_gate_width_db)
    else:
        cfg_inner = cfg

    xf = _unet_xfade(cfg)
    if xf:
        # linear join ramp: weight of the NEW window's estimate rises
        # 0->1 over the crossfade span; the previous window's estimate
        # (state.tail, computed with symmetric context from its side of
        # the join) carries the complement
        xf_ramp = jnp.arange(1, xf + 1, dtype=jnp.float32) / (xf + 1)

    def denoise_window(params, ring, g, tail):
        den = offline_denoise_stateless(cfg_inner, model, params, ring)
        mid = jax.lax.dynamic_slice_in_dim(den, ctx_l, seg, axis=1)
        if xf:
            head = (xf_ramp * mid[:, :xf]
                    + (1.0 - xf_ramp) * tail)
            mid = jnp.concatenate([head, mid[:, xf:]], axis=1)
            # the NEXT segment's first xf samples, as this window sees
            # them (they lie inside its denoised right ctx)
            tail = jax.lax.dynamic_slice_in_dim(den, ctx_l + seg, xf,
                                                axis=1)
        if not gate:
            return mid, g, tail
        # estimate over the EMITTED middle span only — those samples are
        # contiguous and non-overlapping across cycles, so the estimator
        # sees each sample exactly once
        mid_in = jax.lax.dynamic_slice_in_dim(ring, ctx_l, seg, axis=1)
        alpha = None
        new_g = ()
        if removed:
            # model-informed estimator on time-domain segment powers
            # (Parseval: equals the bin-mean spectral powers the spectral
            # paths use, minus the per-bin clip — a whole segment is long
            # enough that the segment-total removed power is the estimate)
            p_in = jnp.mean(mid_in * mid_in, axis=1)
            p_out = jnp.mean(mid * mid, axis=1)
            p_rem = jnp.maximum(p_in - p_out, 0.0)
            rs = removed_step(RemovedState(*g[:2]), p_out, p_rem, beta_seg)
            alpha = gate_alpha(removed_snr_db(rs),
                               cfg.serving.snr_gate_db,
                               cfg.serving.snr_gate_width_db)
            new_g = (rs.out, rs.rem)
        if floor:
            spec = stft(mid_in, cfg.dsp.n_fft, cfg.dsp.hop_length,
                        cfg.dsp.win, window=win)
            power = jnp.abs(spec) ** 2
            _f, _t, last = noise_floor_scan(power, rise, beta, beta_t,
                                            init=FloorState(*g[len(new_g):]))
            snr_f = snr_db_from_floor(last.total,
                                      jnp.mean(last.floor, axis=-1))
            alpha_f = gate_alpha(snr_f, f_gate, f_width)
            alpha = alpha_f if alpha is None \
                else jnp.maximum(alpha, alpha_f)
            new_g = new_g + (last.smooth, last.floor, last.total)
        alpha = alpha[:, None]
        return alpha * mid + (1.0 - alpha) * mid_in, new_g, tail

    def step(params, state: UNetStreamState, chunk: jnp.ndarray,
             phase: jnp.ndarray):
        ring = jnp.concatenate([state.ring[:, hop:], chunk], axis=-1)
        # emit from the PREVIOUS cycle's buffer before (possibly) refilling
        out_hop = jax.lax.dynamic_slice_in_dim(state.out, phase * hop, hop,
                                               axis=1)
        g = (((state.em_out, state.em_rem) if removed else ())
             + ((state.nf_smooth, state.nf_floor, state.nf_total)
                if floor else ()))
        tail = state.tail if xf else jnp.zeros((ring.shape[0], 0),
                                               ring.dtype)
        new_out, g, new_tail = jax.lax.cond(
            phase == seg_hops - 1,
            lambda r: denoise_window(params, r, g, tail),
            lambda r: (state.out, g, tail),
            ring)
        em = g[:2] if removed else (None, None)
        nf = g[2 if removed else 0:] if floor else (None, None, None)
        return UNetStreamState(ring=ring, out=new_out,
                               tail=new_tail if xf else None,
                               nf_smooth=nf[0],
                               nf_floor=nf[1], nf_total=nf[2],
                               em_out=em[0], em_rem=em[1]), out_hop

    return step


def offline_denoise_streamed(cfg: Config, model, params,
                             audio: jnp.ndarray) -> jnp.ndarray:
    """Denoise a clip EXACTLY as engine mode 'unet' serves it: the
    cadence-locked ``[ctx | seg | ctx]`` window chain of
    :func:`make_unet_stream_step`, scanned over the clip hop by hop,
    with the ``seg + ctx``-sample streaming delay removed so the output
    aligns sample-for-sample with the input (round 5, VERDICT r4 #1).

    This is the HONEST bounded-latency evaluation of the segment family:
    :func:`offline_denoise_stateless` hands the model the whole clip —
    effectively unbounded lookahead — while this path gives it exactly
    the ``seg_hops * hop + ctx`` samples of future context a live stream
    would see (``ServingConfig.unet_seg_hops`` / ``unet_ctx_samples``),
    so a manifest eval through it is a point on the latency-quality
    frontier, directly comparable against bounded-lookahead causal
    checkpoints. No reference counterpart (the reference never streams
    these models, unet4.py:147-194).
    """
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    hop, seg_hops, seg, ctx, _ctx_l = _unet_stream_geometry(cfg)
    b, length = audio.shape
    delay = seg + ctx
    n_ticks = -(-(length + delay) // hop)          # ceil to whole hops
    x = jnp.pad(audio, ((0, 0), (0, n_ticks * hop - length)))
    chunks = jnp.swapaxes(x.reshape(b, n_ticks, hop), 0, 1)  # (T, B, hop)
    phases = jnp.arange(n_ticks, dtype=jnp.int32) % seg_hops
    step = make_unet_stream_step(cfg, model)
    state = unet_stream_init_state(cfg, model, b)

    def body(st, inp):
        ph, ch = inp
        st, out = step(params, st, ch, ph)
        return st, out

    _, outs = jax.lax.scan(body, state, (phases, chunks))
    y = jnp.swapaxes(outs, 0, 1).reshape(b, n_ticks * hop)
    y = y[:, delay:delay + length]
    return y[0] if squeeze else y


def jit_offline_denoiser(cfg: Config, model):
    """Returns a jitted ``fn(params, audio) -> audio``; retraces only per
    distinct audio length (pad/bucket upstream for serving)."""
    return jax.jit(partial(offline_denoise, cfg, model))


# --------------------------------------------------------------------------
# WebRTC-path streaming step (app2.py semantics)
# --------------------------------------------------------------------------

class WebRTCState(NamedTuple):
    ring: jnp.ndarray   # (B, n_fft) input window
    ola: jnp.ndarray    # (B, n_fft) overlap-add accumulator
    hx: jnp.ndarray     # model hidden state
    # carried GL phases as REAL (B, F, T, 2) [..., (re, im)]: complex
    # arrays cannot cross host<->device on the axon TPU backend
    # (device_put of complex64 is UNIMPLEMENTED), so state leaves jit as
    # real planes and re-wraps inside the step
    gl_angles: Optional[jnp.ndarray] = None
    # SNR-gate carry (ops/noisefloor.py), present only when
    # cfg.serving.snr_gate_db is set. Tracked on the UN-normalized newest
    # STFT frame per hop (the per-hop peak normalization would otherwise
    # mix scales into the EMA; the older frames overlap previous hops).
    # estimator 'floor' uses the nf_* planes; 'removed' the em_* EMAs.
    nf_smooth: Optional[jnp.ndarray] = None   # (B, F)
    nf_floor: Optional[jnp.ndarray] = None    # (B, F)
    nf_total: Optional[jnp.ndarray] = None    # (B,)
    em_out: Optional[jnp.ndarray] = None      # (B,)
    em_rem: Optional[jnp.ndarray] = None      # (B,)


def _webrtc_frames(cfg: Config) -> int:
    """Frames in one centered n_fft window's STFT."""
    return num_frames(cfg.dsp.n_fft, cfg.dsp.n_fft, cfg.dsp.hop_length)


def webrtc_init_state(cfg: Config, model, batch: int,
                      dtype=jnp.float32) -> WebRTCState:
    n_fft = cfg.dsp.n_fft
    angles = None
    if cfg.dsp.griffin_lim_warm_start:
        # warm seed 1+0j, stored as real (re, im) planes (see WebRTCState)
        import numpy as _np
        a = _np.zeros((batch, cfg.dsp.n_stft, _webrtc_frames(cfg), 2),
                      _np.float32)
        a[..., 0] = 1.0
        angles = jnp.asarray(a)
    gate = cfg.serving.snr_gate_db is not None
    from audio_denoising_tpu.ops.noisefloor import estimator_planes
    r_, f_ = estimator_planes(cfg.serving.snr_gate_estimator)
    removed, floor = gate and r_, gate and f_
    return WebRTCState(
        ring=jnp.zeros((batch, n_fft), dtype),
        ola=jnp.zeros((batch, n_fft), dtype),
        hx=model.init_state(batch, dtype),
        gl_angles=angles,
        nf_smooth=(jnp.zeros((batch, cfg.dsp.n_stft), dtype)
                   if floor else None),
        nf_floor=(jnp.zeros((batch, cfg.dsp.n_stft), dtype)
                  if floor else None),
        nf_total=jnp.zeros((batch,), dtype) if floor else None,
        em_out=jnp.zeros((batch,), dtype) if removed else None,
        em_rem=jnp.zeros((batch,), dtype) if removed else None,
    )


def make_webrtc_step(cfg: Config, model):
    """Build ``step(params, state, chunk) -> (state, out)``; chunk/out are
    (B, hop). One hop in, one hop out, matching the app2.py loop exactly
    (output segment is emitted BEFORE the current frame enters the OLA
    buffer, app2.py:226-231)."""
    dsp = cfg.dsp
    if getattr(cfg.model, "lookahead_frames", 0):
        raise ValueError(
            "lookahead checkpoints (ModelConfig.lookahead_frames > 0) "
            "stream via engine mode 'fast' (delayed phase-reuse "
            "reconstruction); the Griffin-Lim webrtc path has no delayed "
            "magnitude ring")
    n_fft, hop = dsp.n_fft, dsp.hop_length
    fb, inv, win = _transforms(cfg)
    # per-bin linear phase advance of one hop, applied ONLY to the
    # extrapolated newest frame: the shifted frames already align with the
    # new window's earlier frames (measured: last-only + advance beats
    # rotate-all and no-rotation on steady tones; sign follows the
    # e^{-2pi i kn/N} rfft convention where advancing time by `hop`
    # multiplies bin k by e^{+2pi i k hop/N})
    # kept as a host numpy constant: it enters the graph at trace time
    # (complex arrays cannot be device_put on the axon TPU backend)
    import numpy as _np
    gl_rot = _np.exp(
        +2j * _np.pi * _np.arange(dsp.n_stft) * hop / n_fft
    )[None, :, None].astype(_np.complex64)

    def step(params, state: WebRTCState,
             chunk: jnp.ndarray) -> Tuple[WebRTCState, jnp.ndarray]:
        ring = jnp.concatenate([state.ring[:, hop:], chunk], axis=-1)

        peak = jnp.max(jnp.abs(ring), axis=-1, keepdims=True)
        ok = peak > 1e-6
        normed = jnp.where(ok, ring / jnp.where(ok, peak, 1.0), ring)
        peak = jnp.where(ok, peak, 1.0)

        windowed = normed * win                           # Hann pre-window
        spec = stft(windowed, n_fft, hop, dsp.win, window=win)
        mag = jnp.abs(spec)
        logmel = jnp.log1p(mel_scale(mag, fb))            # (B, M, T=3)
        x = jnp.swapaxes(logmel, -1, -2)
        resid, hx = model.apply(params, x, state.hx)
        recon = jax.nn.leaky_relu(x - resid, negative_slope=0.2)
        mel_mag = jnp.maximum(jnp.expm1(jnp.swapaxes(recon, -1, -2)), 0.0)
        lin_mag = inverse_mel_scale(mel_mag, inv)
        nf_s, nf_f, nf_t = state.nf_smooth, state.nf_floor, state.nf_total
        em_o, em_r = state.em_out, state.em_rem
        if cfg.serving.snr_gate_db is not None:
            # per-stream SNR gate (ops/noisefloor.py): blend the GL
            # target magnitudes toward the input magnitudes on
            # near-clean streams — Griffin-Lim then reconstructs the
            # (near-)input spectrum instead of the model's suppression.
            # The estimator eats ONE new frame per hop, UN-normalized
            # (see WebRTCState note).
            from audio_denoising_tpu.ops.noisefloor import (
                FloorState, RemovedState, floor_rise_per_frame, floor_step,
                gate_alpha, removed_powers, removed_snr_db, removed_step,
                smooth_beta_per_frame, snr_db_from_floor,
                total_beta_per_frame)
            power = (mag[..., -1] * peak) ** 2            # (B, F)
            est = cfg.serving.snr_gate_estimator
            alpha = None
            if est in ("removed", "both"):
                # model-informed: normalization cancels in the ratio, but
                # keep both sides at the same (un-normalized) scale so the
                # EMAs average consistently across hops
                p_out_bin = (lin_mag[..., -1] * peak) ** 2
                p_out, p_rem = removed_powers(power, p_out_bin)
                rs = removed_step(RemovedState(em_o, em_r), p_out, p_rem,
                                  total_beta_per_frame(
                                      hop, dsp.sample_rate,
                                      cfg.serving.snr_gate_tau_s))
                em_o, em_r = rs.out, rs.rem
                alpha = gate_alpha(removed_snr_db(rs),
                                   cfg.serving.snr_gate_db,
                                   cfg.serving.snr_gate_width_db)
            if est in ("floor", "both"):
                from audio_denoising_tpu.ops.noisefloor import (
                    FLOOR_VETO_GATE_DB, FLOOR_VETO_WIDTH_DB)
                fs = floor_step(
                    FloorState(nf_s, nf_f, nf_t), power,
                    smooth_beta_per_frame(hop, dsp.sample_rate),
                    floor_rise_per_frame(hop, dsp.sample_rate),
                    total_beta_per_frame(hop, dsp.sample_rate,
                                         cfg.serving.snr_gate_tau_s))
                nf_s, nf_f, nf_t = fs.smooth, fs.floor, fs.total
                snr_f = snr_db_from_floor(fs.total,
                                          jnp.mean(nf_f, axis=-1))
                if est == "floor":
                    alpha = gate_alpha(snr_f, cfg.serving.snr_gate_db,
                                       cfg.serving.snr_gate_width_db)
                else:
                    alpha = jnp.maximum(
                        alpha, gate_alpha(snr_f, FLOOR_VETO_GATE_DB,
                                          FLOOR_VETO_WIDTH_DB))
            alpha = alpha[:, None, None]
            lin_mag = alpha * lin_mag + (1.0 - alpha) * mag
        if dsp.griffin_lim_warm_start:
            # re-seed from the carried phases, shifted one frame (the
            # window advanced one hop); the new frame reuses the last
            # frame's estimate — RTISI-style streaming Griffin-Lim.
            carried = jax.lax.complex(state.gl_angles[..., 0],
                                      state.gl_angles[..., 1])
            seed = jnp.concatenate(
                [carried[..., 1:], carried[..., -1:] * gl_rot], axis=-1)
            frame, angles_c = griffin_lim(
                lin_mag, n_fft, hop, dsp.win, window=win,
                n_iter=dsp.griffin_lim_iters,
                momentum=dsp.griffin_lim_momentum,
                init_angles=seed, return_angles=True)
            angles = jnp.stack([angles_c.real, angles_c.imag], axis=-1)
        else:
            angles = state.gl_angles
            frame = griffin_lim(lin_mag, n_fft, hop, dsp.win, window=win,
                                n_iter=dsp.griffin_lim_iters,
                                momentum=dsp.griffin_lim_momentum)
        frame = frame * peak

        out = state.ola[:, :hop]
        ola = jnp.concatenate(
            [state.ola[:, hop:], jnp.zeros_like(state.ola[:, :hop])], axis=-1)
        ola = ola + frame
        return WebRTCState(ring=ring, ola=ola, hx=hx, gl_angles=angles,
                           nf_smooth=nf_s, nf_floor=nf_f,
                           nf_total=nf_t, em_out=em_o, em_rem=em_r), out

    return step


# --------------------------------------------------------------------------
# Socket-path step (server.py semantics): per-chunk, phase reuse
# --------------------------------------------------------------------------

def make_server_step(cfg: Config, model):
    """Build ``step(params, hx, chunk) -> (hx, out)``; chunk (B, L) is
    processed as one centered STFT exactly like a server.py recv message
    (server.py:200-216), with output gain and state decay from serving
    config."""
    dsp = cfg.dsp
    srv = cfg.serving
    if getattr(cfg.model, "lookahead_frames", 0):
        raise ValueError(
            "lookahead checkpoints (ModelConfig.lookahead_frames > 0) "
            "stream via engine mode 'fast'; the per-message server step "
            "cannot carry the cross-chunk delay ring")
    fb, inv, win = _transforms(cfg)

    def step(params, hx, chunk: jnp.ndarray):
        length = chunk.shape[-1]
        spec = stft(chunk, dsp.n_fft, dsp.hop_length, dsp.win, window=win)
        phase = jnp.angle(spec)
        mag = jnp.abs(spec)
        logmel = jnp.log1p(mel_scale(mag, fb))
        x = jnp.swapaxes(logmel, -1, -2)
        out, hx = model.apply(params, x, hx)
        out = jax.nn.relu(jnp.swapaxes(out, -1, -2)) * srv.output_gain
        hx = hx * srv.state_decay
        target = jnp.exp(logmel - out) - 1.0
        lin = inverse_mel_scale(target, inv)
        rec = lin * jnp.exp(1j * phase)
        y = istft(rec, dsp.n_fft, dsp.hop_length, dsp.win, window=win,
                  length=length)
        return hx, y

    return step
