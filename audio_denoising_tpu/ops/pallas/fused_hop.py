"""The ENTIRE serving hop as one Pallas TPU kernel.

Fuses the fast-path step (runtime/engine.make_fast_step semantics:
single-frame analysis, mel log1p — or raw-spectrogram log1p for the
'clamped raw-spectrogram' era — GRUUNet/MOMO residual cell (incl. MOMO3's
(hx, prev) delta carry), inverse mel, noisy-phase reuse, WOLA synthesis)
into a single kernel launch:

- DFT/iDFT are matmuls against precomputed real cos/sin matrices (the MXU
  does a 640-point transform for 256 streams in ~2 us; rfft is unavailable
  inside Pallas and would be slower at this size anyway);
- phase reuse needs no trigonometry: reconstruction scales the complex
  bins by (new_mag / old_mag);
- the model runs as the matrixized plan (runtime/plan.py);
- all weights (~8 MB fp32: DFT matrices, mel pair, plan) are VMEM-resident
  operands with constant index maps; the grid tiles the stream batch.

Per hop the chip touches HBM once for (chunk, ring, ola, hx) in and
(out, ring', ola', hx') out — the op-by-op graph's ~40 intermediate HBM
round trips (and, on dispatch-latency-bound backends, its ~40 op syncs)
collapse into one kernel.

Semantics follow engine.make_fast_step exactly — including the optional
serving-side SNR gate (ServingConfig.snr_gate_db, ops/noisefloor.py):
the SNR estimator runs IN-KERNEL on extra VMEM state planes (estimator
'removed': two broadcast-scalar EMA planes; 'floor': the per-bin tracker
on three planes), so the fastest serving mode keeps the
clean-audio-safety blend. Parity is tested in tests/test_fused_hop.py
(CPU interpret mode) and on-chip.
"""

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_denoising_tpu.config import Config
from audio_denoising_tpu.ops import hann_window, mel_filterbank, inverse_mel_matrix


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dft_matrices(n_fft: int):
    """(CF, SF) forward (n_fft, F) and (IC, IS) inverse (F, n_fft) real
    DFT matrices such that rfft(x) = x@CF + i.x@SF and
    irfft(R + i.I) = R@IC + I@IS."""
    F = n_fft // 2 + 1
    k = np.arange(F)
    n = np.arange(n_fft)
    ang = 2 * np.pi * np.outer(k, n) / n_fft
    CF = np.cos(ang).T.astype(np.float32)          # cos(-a) = cos(a)
    SF = (-np.sin(ang)).T.astype(np.float32)       # sin(-a)
    w = np.ones(F, np.float32)
    w[1:-1] = 2.0
    IC = (w[:, None] * np.cos(ang) / n_fft).astype(np.float32)
    IS = (-w[:, None] * np.sin(ang) / n_fft).astype(np.float32)
    return CF, SF, IC, IS


class FusedHopState(NamedTuple):
    ring: jnp.ndarray   # (B, n_fft)
    ola: jnp.ndarray    # (B, n_fft)
    hx: jnp.ndarray     # (B, hidden*compressed)
    # delta models (MOMO3): previous feature frame, the cell input's second
    # half (cat([x_t, x_t - prev]), momo3.py:286-289). None otherwise.
    prev: Optional[jnp.ndarray] = None
    # SNR-gate carry (ops/noisefloor.py), present only when
    # cfg.serving.snr_gate_db is set — the gate runs IN-KERNEL (cheap VPU
    # elementwise + row reductions), so the fastest serving mode keeps
    # the clean-audio-safety feature instead of downgrading to op-by-op.
    # estimator 'floor' carries the nf_* planes, 'removed' the em_* EMA
    # pair, 'both' (the default) all five. Scalar (B,) EMAs are stored as (B, _TOT_W) planes
    # (TPU state buffers are 2-D lane-tiled; column 0 is authoritative,
    # the rest carry the same broadcast value).
    nf_smooth: Optional[jnp.ndarray] = None   # (B, F)
    nf_floor: Optional[jnp.ndarray] = None    # (B, F)
    nf_total: Optional[jnp.ndarray] = None    # (B, _TOT_W)
    em_out: Optional[jnp.ndarray] = None      # (B, _TOT_W)
    em_rem: Optional[jnp.ndarray] = None      # (B, _TOT_W)


# lane width of the nf_total plane (the TPU vector lane tile)
_TOT_W = 128


def _feat_width(cfg: Config) -> int:
    """Model feature width: mel bins, or raw spectrum bins (n_stft) for the
    'clamped raw-spectrogram' era (utils.py:82-95)."""
    return cfg.dsp.n_stft if cfg.dsp.domain == "raw" else cfg.dsp.n_mels


def fused_hop_init_state(cfg: Config, plan, batch: int) -> FusedHopState:
    n_fft = cfg.dsp.n_fft
    prev = None
    if plan.delta:
        prev = jnp.zeros((batch, _feat_width(cfg)), jnp.float32)
    gate = cfg.serving.snr_gate_db is not None
    from audio_denoising_tpu.ops.noisefloor import estimator_planes
    removed, floor = estimator_planes(cfg.serving.snr_gate_estimator)
    removed, floor = gate and removed, gate and floor
    F = cfg.dsp.n_stft
    return FusedHopState(
        ring=jnp.zeros((batch, n_fft), jnp.float32),
        ola=jnp.zeros((batch, n_fft), jnp.float32),
        hx=jnp.zeros((batch, plan.hidden * plan.compressed), jnp.float32),
        prev=prev,
        nf_smooth=jnp.zeros((batch, F), jnp.float32) if floor else None,
        nf_floor=jnp.zeros((batch, F), jnp.float32) if floor else None,
        nf_total=(jnp.zeros((batch, _TOT_W), jnp.float32)
                  if floor else None),
        em_out=(jnp.zeros((batch, _TOT_W), jnp.float32)
                if removed else None),
        em_rem=(jnp.zeros((batch, _TOT_W), jnp.float32)
                if removed else None))


def make_fused_hop(cfg: Config, plan, interpret: bool = False,
                   block_b: int = 128, hops_per_call: int = 1,
                   hops_per_step: int = 1, io_dtype=jnp.float32,
                   compute_dtype=jnp.float32):
    """One-kernel serving hop(s).

    hops_per_call == 1 -> ``step(state, chunk (B, hop)) -> (state', out)``,
    one pallas_call per hop (the latency path).

    hops_per_call == K > 1 -> ``step(state, chunks (K, B, hop)) ->
    (state', outs (K, B, hop))`` — K hops inside ONE pallas_call with the
    per-stream state RESIDENT IN VMEM SCRATCH across grid steps
    (grid = (B_tiles, K); scratch persists per core across the grid, so
    the sequential K dimension never leaves the chip — the throughput
    path: no per-hop kernel-launch or state HBM round trips at all).

    ``compute_dtype=bfloat16``: all matrix operands (DFT pair, mel pair,
    plan matrices — biases/state stay fp32) stored bf16; matmuls run
    single-pass at 2x MXU rate and half the weight VMEM. Parity bound vs
    the fp32 kernel is test-locked (tests/test_fused_hop.py) — dead
    weight on the relay-attached chip (dispatch-bound), but the first
    knob to flip on a locally-attached deployment.

    ``compute_dtype=int8``: W8A8 plan matmuls (runtime/quant.py
    semantics — per-column weight scales packed as operand rows, dynamic
    per-frame activation scales computed in-kernel, int32 MXU
    accumulate) at a QUARTER of the fp32 weight VMEM; the DSP matmuls
    (DFT/mel) stay bf16 for reconstruction numerics. Agreement bounds
    test-locked; on-chip Mosaic lowering VALIDATED round 4
    (tools/validate_int8_fused.py on the real v5e: 33.2 dB agreement vs
    the fp32 kernel, runs/int8_fused_onchip.json) — engine mode 'fused'
    serves this variant when serving.dtype='int8'.
    """
    dsp = cfg.dsp
    srv = cfg.serving
    n_fft, hop, F, M = dsp.n_fft, dsp.hop_length, dsp.n_stft, dsp.n_mels
    assert n_fft % hop == 0, "fast path expects hop | n_fft (WOLA)"
    # _dft_matrices' inverse weighting (w[1:-1]=2, Nyquist weight 1) is
    # only correct for even n_fft; odd would silently halve the top bin
    assert n_fft % 2 == 0, "fused hop requires even n_fft"
    L = len(plan.down_mats)
    n = plan.hidden * plan.compressed
    # 'raw' = clamped raw-spectrogram era (utils.py:82-95): the model eats
    # log1p of the raw magnitude — no mel pair in the chain at all.
    raw = dsp.domain == "raw"
    feat = F if raw else M               # model feature width
    delta = plan.delta                   # MOMO3 (hx, prev) carry
    # in-kernel SNR gate (ops/noisefloor.py semantics, engine.make_fast_step
    # parity): stream-level blend toward passthrough on near-clean input.
    # Pure VPU work (EMAs, row means, one exp) — gate state rides VMEM
    # with the rest. estimator 'removed' needs only two broadcast-scalar
    # planes; 'floor' two extra (B, F) planes.
    gate = srv.snr_gate_db is not None
    g_est = srv.snr_gate_estimator
    from audio_denoising_tpu.ops.noisefloor import estimator_planes
    g_removed, g_floor = estimator_planes(g_est)
    g_removed, g_floor = gate and g_removed, gate and g_floor
    if gate:
        from audio_denoising_tpu.ops.noisefloor import (
            FLOOR_BIAS, FLOOR_VETO_GATE_DB, FLOOR_VETO_WIDTH_DB, _EPS,
            floor_rise_per_frame, smooth_beta_per_frame,
            total_beta_per_frame)
        g_beta = smooth_beta_per_frame(hop, dsp.sample_rate)
        g_rise = floor_rise_per_frame(hop, dsp.sample_rate)
        g_beta_t = total_beta_per_frame(hop, dsp.sample_rate,
                                         srv.snr_gate_tau_s)
        g_width = max(srv.snr_gate_width_db, 1e-3)
        # the floor part's (gate, width): its own when it IS the
        # decision, the fixed veto constants under 'both'
        gf_gate = (FLOOR_VETO_GATE_DB if g_est == "both"
                   else srv.snr_gate_db)
        gf_width = (FLOOR_VETO_WIDTH_DB if g_est == "both" else g_width)

    win = np.asarray(hann_window(n_fft))
    CF, SF, IC, IS = _dft_matrices(n_fft)

    overlap = n_fft // hop
    env = np.zeros(n_fft, np.float32)
    for k in range(overlap):
        env += np.roll(win * win, k * hop)
    env_hop = np.where(env[:hop] > 1e-8, env[:hop], 1.0).astype(np.float32)

    # Constant operands, all 2-D. Window/env as (1, n) rows.
    consts = [CF, SF, IC, IS]
    if not raw:
        mel = np.asarray(mel_filterbank(F, M, dsp.sample_rate))     # (F, M)
        imel = np.asarray(
            inverse_mel_matrix(F, M, dsp.sample_rate)).T            # (M, F)
        consts += [mel, imel]
    consts += [win[None, :].astype(np.float32), env_hop[None, :]]
    from audio_denoising_tpu.ops.pallas.common import (
        pack_plan_weights, plan_cell_math)
    # int8 variant: plan matrices quantized W8A8 (pack emits int8 mat +
    # fp32 per-column scale row; plan_cell_math does the dynamic row
    # quant + int32 MXU dot). The DSP matmuls (DFT pair, mel pair) run
    # bf16 — reconstruction numerics need float, and bf16 already halves
    # their VMEM.
    quant = jnp.dtype(compute_dtype) == jnp.dtype(jnp.int8)
    weights, skip_flags = pack_plan_weights(plan, quantize=quant)
    # bf16 variant: matrices (shape[0] > 1) stored bf16; bias/scale/
    # window/env rows (1, n), int8 payloads and all state stay fp32
    bf = not quant and jnp.dtype(compute_dtype) != jnp.dtype(jnp.float32)
    dsp_bf = bf or quant
    cast = (lambda a: a.astype(jnp.bfloat16)
            if (dsp_bf and a.shape[0] > 1
                and jnp.issubdtype(a.dtype, jnp.floating)) else a)
    operands = [cast(jnp.asarray(c)) for c in consts] + \
               [cast(jnp.asarray(w)) for w in weights]
    n_consts = len(consts)

    # per-stream state planes, fixed order: ring, ola, hx[, prev]
    # [, nf_smooth, nf_floor, nf_total][, em_out, em_rem]
    # (estimator 'both' carries all five)
    n_state = 3 + (1 if delta else 0) + \
        (3 if g_floor else 0) + (2 if g_removed else 0)
    state_widths = [n_fft, n_fft, plan.hidden * plan.compressed] + \
        ([feat] if delta else []) + \
        ([F, F, _TOT_W] if g_floor else []) + \
        ([_TOT_W, _TOT_W] if g_removed else [])

    def kernel(*refs):
        ins = refs[:n_state + 1]                    # states + chunk
        outs = refs[-(n_state + 1):]                # states' + out
        cs = refs[n_state + 1:n_state + 1 + n_consts]
        w = list(refs[n_state + 1 + n_consts:-(n_state + 1)])
        states, out = _hop_math(cs, w, [r[:] for r in ins[:n_state]],
                                ins[n_state][:])
        for o, v in zip(outs[:n_state], states):
            o[:] = v
        outs[n_state][:] = out

    # Shared hop body: consumes/produces plain array LISTS (state_widths
    # order) so the single-hop kernel and the resident multi-hop kernel
    # reuse identical math.
    def _hop_math(cs, w, states, chunk):
        ring_prev, ola_prev, hx_prev = states[:3]
        si = 3
        prev_prev = None
        if delta:
            prev_prev = states[si]
            si += 1
        if g_floor:
            nf_s, nf_f, nf_t = states[si:si + 3]
            si += 3
        if g_removed:
            em_o, em_r = states[si:si + 2]
        if raw:
            cf, sf, ic, is_, win_r, env_r = cs
        else:
            cf, sf, ic, is_, melr, imelr, win_r, env_r = cs

        def dot(a, b):
            if dsp_bf:
                return jnp.dot(a.astype(jnp.bfloat16), b[:],
                               preferred_element_type=jnp.float32)
            return jnp.dot(a, b[:], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        ring = jnp.concatenate([ring_prev[:, hop:], chunk], axis=-1)
        frame = ring * win_r[0]
        re = dot(frame, cf)
        im = dot(frame, sf)
        mag = jnp.sqrt(re * re + im * im)
        if raw:
            # signed-log clamp on a magnitude == log1p (utils.py:82-95)
            x = jnp.log(1.0 + mag)
        else:
            x = jnp.log(1.0 + dot(mag, melr))
        h, hi = plan_cell_math(w, skip_flags, n, feat, delta,
                               x, hx_prev, prev_prev,
                               compute_dtype=compute_dtype)
        rec = x - h
        rec = jnp.where(rec >= 0, rec, 0.2 * rec)
        feat_mag = jnp.maximum(jnp.exp(rec) - 1.0, 0.0)
        if raw:
            lin = feat_mag * srv.output_gain
        else:
            # clamp: the mel pseudo-inverse projects ~13% of bins negative;
            # inverse_mel_scale (and torchaudio) clamp to >= 0 — without it
            # those bins resynthesize with inverted phase
            lin = jnp.maximum(dot(feat_mag, imelr), 0.0) * srv.output_gain
        nf_out = []
        alpha = None
        if g_removed:
            # noisefloor.removed_step + removed_snr_db + gate_alpha in
            # Mosaic-safe form: the model's own suppression is the noise
            # estimate (measured rationale in ops/noisefloor.py). Zero
            # carry (fresh slot) LATCHES like the floor tracker.
            power = mag * mag
            p_lin = lin * lin
            p_out = jnp.mean(p_lin, axis=-1, keepdims=True)        # (B, 1)
            p_rem = jnp.mean(jnp.maximum(power - p_lin, 0.0),
                             axis=-1, keepdims=True)
            o_prev = em_o[:, :1]
            r_prev = em_r[:, :1]
            fresh = (o_prev + r_prev) <= 0.0
            o_new = jnp.where(fresh, p_out,
                              g_beta_t * o_prev + (1.0 - g_beta_t) * p_out)
            r_new = jnp.where(fresh, p_rem,
                              g_beta_t * r_prev + (1.0 - g_beta_t) * p_rem)
            snr_db = (10.0 / np.log(10.0)) * (jnp.log(o_new + _EPS)
                                              - jnp.log(r_new + _EPS))
            alpha = jnp.clip(
                (srv.snr_gate_db + g_width - snr_db) / (2.0 * g_width),
                0.0, 1.0)                                          # (B, 1)
            em_out_new = [o_new + jnp.zeros_like(em_o),
                          r_new + jnp.zeros_like(em_r)]
        if g_floor:
            # noisefloor.floor_step + snr_db_from_floor + gate_alpha in
            # Mosaic-safe form (exp/log only — no log10/expit lowering);
            # an all-zero carry (fresh slot) LATCHES rather than pinning.
            # Under 'both' this is the VETO (fixed gf_gate/gf_width).
            power = mag * mag
            smooth = g_beta * nf_s + (1.0 - g_beta) * power
            floor = jnp.where(nf_f <= 0.0, smooth,
                              jnp.minimum(smooth, nf_f * g_rise))
            p_mean = jnp.mean(power, axis=-1, keepdims=True)       # (B, 1)
            tot_prev = nf_t[:, :1]
            total = jnp.where(tot_prev <= 0.0, p_mean,
                              g_beta_t * tot_prev
                              + (1.0 - g_beta_t) * p_mean)
            nfm = FLOOR_BIAS * jnp.mean(floor, axis=-1, keepdims=True)
            sig = jnp.maximum(total - nfm, 0.0)
            snr_db = (10.0 / np.log(10.0)) * (jnp.log(sig + _EPS)
                                              - jnp.log(nfm + _EPS))
            alpha_f = jnp.clip(
                (gf_gate + gf_width - snr_db) / (2.0 * gf_width),
                0.0, 1.0)                                          # (B, 1)
            alpha = alpha_f if alpha is None \
                else jnp.maximum(alpha, alpha_f)
            nf_out = [smooth, floor, total + jnp.zeros_like(nf_t)]
        if gate:
            lin = alpha * lin + (1.0 - alpha) * mag
        if g_removed:
            nf_out = nf_out + em_out_new
        # phase reuse as complex scaling; at mag ~ 0 match the fast path's
        # polar(lin, angle(0)=0) = lin + 0j
        safe = mag > 1e-8
        scale = lin / jnp.where(safe, mag, 1.0)
        rec_re = jnp.where(safe, re * scale, lin)
        rec_im = jnp.where(safe, im * scale, 0.0)
        synth = (dot(rec_re, ic) + dot(rec_im, is_)) * win_r[0]
        acc = ola_prev + synth
        out_hop = acc[:, :hop] / env_r[0]
        ola = jnp.concatenate(
            [acc[:, hop:], jnp.zeros_like(acc[:, :hop])], axis=-1)
        # delta carry: prev' = this hop's input feature (momo3.py:297-323
        # via models/momo.py cell semantics — the fast path persists it)
        return ([ring, ola, hi * srv.state_decay]
                + ([x] if delta else []) + nf_out, out_hop)

    # int16 PCM at the kernel boundary: audio arrives as s16 in every real
    # ingest path (the reference's WebRTC frames are s16, app2.py:175-179);
    # converting on device halves the host<->device bytes per hop.
    pcm16 = io_dtype == jnp.int16

    # --- resident multi-hop kernel (throughput path) -------------------------
    K = hops_per_call
    U = hops_per_step            # hops unrolled inside one grid step
    assert K % U == 0, "hops_per_step must divide hops_per_call"
    KS = K // U                  # grid steps along the hop axis

    def kernel_multi(*refs):
        ins = refs[:n_state + 1]                    # states + chunks
        scratch = refs[-n_state:]                   # VMEM-resident states
        outs = refs[-(2 * n_state + 1):-n_state]    # states' + outs
        cs = refs[n_state + 1:n_state + 1 + n_consts]
        w = list(refs[n_state + 1 + n_consts:-(2 * n_state + 1)])
        chunk_ref = ins[n_state]
        out_o = outs[n_state]
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            for s, r in zip(scratch, ins[:n_state]):
                s[:] = r[:]

        states = [s[:] for s in scratch]
        for u in range(U):       # unrolled: amortizes per-grid-step cost
            chunk = chunk_ref[u]
            if pcm16:            # s16 -> f32 on device (app2.py:177 scale)
                chunk = chunk.astype(jnp.float32) * (1.0 / 32768.0)
            states, out = _hop_math(cs, w, states, chunk)
            if pcm16:            # f32 -> s16 with clip (app2.py:246-247)
                out = jnp.clip(out, -1.0, 1.0) * 32767.0
                out = out.astype(jnp.int16)
            out_o[u] = out
        for s, v in zip(scratch, states):
            s[:] = v

        @pl.when(k == KS - 1)
        def _():
            for o, v in zip(outs[:n_state], states):
                o[:] = v

    def _pack_state(state: FusedHopState):
        return [state.ring, state.ola, state.hx] + \
            ([state.prev] if delta else []) + \
            ([state.nf_smooth, state.nf_floor, state.nf_total]
             if g_floor else []) + \
            ([state.em_out, state.em_rem] if g_removed else [])

    def _rebuild_state(new_states) -> FusedHopState:
        si = 3
        prev = nfs = nff = nft = emo = emr = None
        if delta:
            prev = new_states[si]
            si += 1
        if g_floor:
            nfs, nff, nft = new_states[si:si + 3]
            si += 3
        if g_removed:
            emo, emr = new_states[si:si + 2]
        return FusedHopState(*new_states[:3], prev=prev, nf_smooth=nfs,
                             nf_floor=nff, nf_total=nft,
                             em_out=emo, em_rem=emr)

    def step_multi(state: FusedHopState, chunks: jnp.ndarray):
        k, b = chunks.shape[0], chunks.shape[1]
        assert k == K, f"expected {K} hops per call, got {k}"
        assert chunks.dtype == io_dtype, (chunks.dtype, io_dtype)
        bp = _round_up(b, block_b)
        states = _pack_state(state)
        if bp != b:
            states = [jnp.pad(a, ((0, bp - b), (0, 0))) for a in states]
            chunks = jnp.pad(chunks, ((0, 0), (0, bp - b), (0, 0)))
        grid = (bp // block_b, KS)
        bspec = lambda width: pl.BlockSpec(
            (block_b, width), lambda i, k: (i, 0), memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((U, block_b, hop), lambda i, k: (k, i, 0),
                             memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(op.shape, lambda i, k: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for op in operands]
        state_specs = [bspec(wd) for wd in state_widths]
        res = pl.pallas_call(
            kernel_multi,
            grid=grid,
            in_specs=state_specs + [kspec] + const_specs,
            out_specs=tuple(state_specs) + (kspec,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((bp, wd), jnp.float32)
                for wd in state_widths)
            + (jax.ShapeDtypeStruct((K, bp, hop), io_dtype),),
            scratch_shapes=[pltpu.VMEM((block_b, wd), jnp.float32)
                            for wd in state_widths],
            # default scoped-vmem limit is 16 MB; wider plans (hidden 40:
            # 29 MB stack at block_b=128) need headroom — v5e has 128 MB
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*states, chunks, *operands)
        new_states, outs = list(res[:-1]), res[-1]
        if bp != b:
            new_states = [a[:b] for a in new_states]
            outs = outs[:, :b]
        return _rebuild_state(new_states), outs

    if hops_per_call > 1:
        return step_multi

    def step(state: FusedHopState,
             chunk: jnp.ndarray) -> Tuple[FusedHopState, jnp.ndarray]:
        assert chunk.dtype == io_dtype, (chunk.dtype, io_dtype)
        if pcm16:
            chunk = chunk.astype(jnp.float32) * (1.0 / 32768.0)
        b = chunk.shape[0]
        bp = _round_up(b, block_b)
        states = _pack_state(state)
        if bp != b:
            states = [jnp.pad(a, ((0, bp - b), (0, 0))) for a in states]
            chunk = jnp.pad(chunk, ((0, bp - b), (0, 0)))
        grid = (bp // block_b,)
        bspec = lambda width: pl.BlockSpec(
            (block_b, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(op.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for op in operands]
        state_specs = [bspec(wd) for wd in state_widths]
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=state_specs + [bspec(hop)] + const_specs,
            out_specs=tuple(state_specs) + (bspec(hop),),
            out_shape=tuple(
                jax.ShapeDtypeStruct((bp, wd), jnp.float32)
                for wd in state_widths)
            + (jax.ShapeDtypeStruct((bp, hop), jnp.float32),),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*states, chunk, *operands)
        new_states, out = list(res[:-1]), res[-1]
        if bp != b:
            new_states = [a[:b] for a in new_states]
            out = out[:b]
        if pcm16:
            out = (jnp.clip(out, -1.0, 1.0) * 32767.0).astype(jnp.int16)
        return _rebuild_state(new_states), out

    return step


def make_fused_hop_sharded(cfg: Config, plan, mesh, interpret: bool = False,
                           block_b: int = 128, hops_per_call: int = 1,
                           compute_dtype=jnp.float32):
    """Multi-chip fused hop: shard_map over the mesh's first axis — each
    device runs the one-kernel hop on its shard of the stream slots
    (manual partitioning is the standard way to compose pallas_call with
    a mesh; there is no cross-chip communication in the hop).
    ``compute_dtype`` is forwarded to make_fused_hop — bf16/int8 serving
    shards exactly like fp32 (the quantized payloads are baked operands,
    not sharded state)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    import inspect
    try:
        from jax import shard_map
    except ImportError:                  # older jax
        from jax.experimental.shard_map import shard_map
    # replication checking must be off (pallas_call has no rep rule);
    # the kwarg was renamed check_rep -> check_vma across jax versions
    sig = inspect.signature(shard_map).parameters
    check_kw = {"check_vma": False} if "check_vma" in sig else \
               {"check_rep": False}

    step = make_fused_hop(cfg, plan, interpret=interpret, block_b=block_b,
                          hops_per_call=hops_per_call,
                          compute_dtype=compute_dtype)
    axis = mesh.axis_names[0]
    gate = cfg.serving.snr_gate_db is not None
    from audio_denoising_tpu.ops.noisefloor import estimator_planes
    removed, floor = estimator_planes(cfg.serving.snr_gate_estimator)
    removed, floor = gate and removed, gate and floor
    state_spec = FusedHopState(
        ring=P(axis), ola=P(axis), hx=P(axis),
        prev=P(axis) if plan.delta else None,
        nf_smooth=P(axis) if floor else None,
        nf_floor=P(axis) if floor else None,
        nf_total=P(axis) if floor else None,
        em_out=P(axis) if removed else None,
        em_rem=P(axis) if removed else None)
    chunk_spec = P(None, axis) if hops_per_call > 1 else P(axis)

    return shard_map(step, mesh=mesh,
                     in_specs=(state_spec, chunk_spec),
                     out_specs=(state_spec, chunk_spec),
                     **check_kw)
