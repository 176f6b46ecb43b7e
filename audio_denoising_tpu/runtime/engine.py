"""Batched multi-stream serving engine.

Modes:

- ``fast``   — the latency-optimal TPU path: single-frame analysis (no
               center padding, one rfft per hop), mel-domain residual model,
               noisy-phase reuse (the server.py escape hatch that avoids
               Griffin-Lim entirely, SURVEY §6), WOLA synthesis. One hop in,
               one hop out, one jitted launch for all N streams.
- ``webrtc`` — bit-faithful app2.py semantics (3-frame centered STFT +
               Griffin-Lim, pipeline.make_webrtc_step).
- ``fused-webrtc`` / ``fused`` — one-kernel Pallas hops (webrtc incl.
               in-kernel warm Griffin-Lim; fast-path GRUUNet/MOMO).
- ``unet``   — cadence-locked segment streaming for the stateless 2D
               U-Nets (pipeline.make_unet_stream_step; the reference has
               no streaming path for these, unet4.py:147-194).

State is a batched pytree; slots are admitted/evicted by index updates, and
inactive slots simply compute on zeros (fixed shapes, no retracing).
"""

from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.config import Config
from audio_denoising_tpu.ops import hann_window, mel_filterbank, inverse_mel_matrix
from audio_denoising_tpu.ops.mel import mel_scale, inverse_mel_scale
from audio_denoising_tpu.pipeline import make_webrtc_step, webrtc_init_state, WebRTCState


class FastState(NamedTuple):
    ring: jnp.ndarray   # (B, n_fft) analysis window
    ola: jnp.ndarray    # (B, n_fft) synthesis accumulator
    hx: jnp.ndarray     # model hidden state (B, ...)
    # SNR-gate carry (ops/noisefloor.py); present only when
    # cfg.serving.snr_gate_db is set (None leaves keep old snapshots and
    # the ungated step bit-identical). estimator 'floor' uses the nf_*
    # planes; 'removed' the em_* scalar EMAs.
    nf_smooth: Optional[jnp.ndarray] = None   # (B, F)
    nf_floor: Optional[jnp.ndarray] = None    # (B, F)
    nf_total: Optional[jnp.ndarray] = None    # (B,) long power EMA
    em_out: Optional[jnp.ndarray] = None      # (B,) output-power EMA
    em_rem: Optional[jnp.ndarray] = None      # (B,) removed-power EMA
    # Bounded-lookahead delay rings (ModelConfig.lookahead_frames = k > 0):
    # the model's residual at tick t targets frame t - k, so the frame
    # magnitudes/phases wait k hops here before reconstruction. Index 0
    # is the OLDEST frame (the one the current residual applies to).
    la_mag: Optional[jnp.ndarray] = None      # (B, k, F)
    la_phase: Optional[jnp.ndarray] = None    # (B, k, F)


def _init_carry(model, batch: int, dtype=jnp.float32):
    fn = getattr(model, "init_carry", None)
    return fn(batch, dtype) if fn else model.init_state(batch, dtype)


def _decay_carry(model, carry, factor):
    fn = getattr(model, "decay_carry", None)
    if fn:
        return fn(carry, factor)
    return jax.tree.map(lambda h: h * factor, carry)


def fast_init_state(cfg: Config, model, batch: int,
                    dtype=jnp.float32) -> FastState:
    n_fft = cfg.dsp.n_fft
    gate = cfg.serving.snr_gate_db is not None
    from audio_denoising_tpu.ops.noisefloor import estimator_planes
    removed, floor = estimator_planes(cfg.serving.snr_gate_estimator)
    removed, floor = gate and removed, gate and floor
    la = getattr(cfg.model, "lookahead_frames", 0)
    # distinct arrays: donation-based slot updates reject one buffer
    # appearing twice in the argument pytree
    return FastState(
        ring=jnp.zeros((batch, n_fft), dtype),
        ola=jnp.zeros((batch, n_fft), dtype),
        hx=_init_carry(model, batch, dtype),
        nf_smooth=(jnp.zeros((batch, cfg.dsp.n_stft), dtype)
                   if floor else None),
        nf_floor=(jnp.zeros((batch, cfg.dsp.n_stft), dtype)
                  if floor else None),
        nf_total=jnp.zeros((batch,), dtype) if floor else None,
        em_out=jnp.zeros((batch,), dtype) if removed else None,
        em_rem=jnp.zeros((batch,), dtype) if removed else None,
        la_mag=(jnp.zeros((batch, la, cfg.dsp.n_stft), dtype)
                if la else None),
        la_phase=(jnp.zeros((batch, la, cfg.dsp.n_stft), dtype)
                  if la else None),
    )


def make_fast_step(cfg: Config, model):
    """``step(params, state, chunk[B, hop]) -> (state, out[B, hop])``.

    Per hop: one windowed rfft (no center padding -> no redundant frames),
    mel log1p, one model cell, inverse mel, noisy-phase resynthesis, WOLA.
    Latency = one jitted launch; algorithmic cost ~3 rfft-equivalents per
    hop vs the reference WebRTC path's 3-frame STFT + 32x2 Griffin-Lim FFTs.
    """
    dsp = cfg.dsp
    srv = cfg.serving
    n_fft, hop = dsp.n_fft, dsp.hop_length
    assert n_fft % hop == 0, "fast mode expects hop | n_fft (WOLA)"
    # 'raw' = the clamped raw-spectrogram era (utils.py:82-95): the model
    # eats log1p of the raw magnitude at n_stft bins, no mel pair at all.
    raw = dsp.domain == "raw"
    if raw:
        assert dsp.n_mels == dsp.n_stft, (
            "raw domain: n_mels must equal n_stft (feature width)")
        fb = inv = None
    else:
        fb = mel_filterbank(dsp.n_stft, dsp.n_mels, dsp.sample_rate)
        inv = inverse_mel_matrix(dsp.n_stft, dsp.n_mels, dsp.sample_rate)
    win = hann_window(n_fft)
    # WOLA envelope: sum of win^2 across overlapping offsets (constant for
    # periodic Hann at hop | n_fft); guard tiny values.
    overlap = n_fft // hop
    env = np.zeros(n_fft, np.float32)
    w = np.asarray(win)
    for k in range(overlap):
        env += np.roll(w * w, k * hop)
    env_hop = jnp.asarray(np.where(env[:hop] > 1e-8, env[:hop], 1.0))

    la = getattr(cfg.model, "lookahead_frames", 0)

    def step(params, state: FastState, chunk: jnp.ndarray):
        ring = jnp.concatenate([state.ring[:, hop:], chunk], axis=-1)
        frame = ring * win                                   # (B, n_fft)
        spec = jnp.fft.rfft(frame, n=n_fft, axis=-1)         # (B, F)
        mag = jnp.abs(spec)
        phase = jnp.angle(spec)
        if raw:
            # signed-log clamp on a magnitude == log1p (utils.py:82-95)
            x_t = jnp.log1p(mag)                             # (B, F)
        else:
            logmel = jnp.log1p(mel_scale(mag[..., None], fb))  # (B, M, 1)
            x_t = logmel[..., 0]                             # (B, M)
        # single-cell step with the FULL carry (init_carry): delta models
        # (MOMO3) persist their previous frame across hops here — apply()
        # would re-zero the delta every hop
        resid_t, hx = model.cell(params, x_t, state.hx)
        la_mag, la_phase = state.la_mag, state.la_phase
        if la:
            # bounded lookahead (ModelConfig.lookahead_frames): the model
            # just consumed frame t, but its residual targets frame t - la
            # — pop the delayed frame from the rings, reconstruct THAT,
            # and push the new frame. Everything downstream (features to
            # subtract from, gate estimator, phase reuse) switches to the
            # delayed frame; the recurrence above stays on the newest.
            mag_new, phase_new = mag, phase
            mag = la_mag[:, 0]
            phase = la_phase[:, 0]
            la_mag = jnp.concatenate([la_mag[:, 1:], mag_new[:, None]],
                                     axis=1)
            la_phase = jnp.concatenate([la_phase[:, 1:],
                                        phase_new[:, None]], axis=1)
            if raw:
                x_rec = jnp.log1p(mag)
            else:
                x_rec = jnp.log1p(mel_scale(mag[..., None], fb))[..., 0]
        else:
            x_rec = x_t
        out = jax.nn.leaky_relu(x_rec - resid_t, negative_slope=0.2)
        if raw:
            lin = jnp.maximum(jnp.expm1(out), 0.0)           # (B, F)
        else:
            mel_mag = jnp.maximum(jnp.expm1(out), 0.0)[..., None]
            lin = inverse_mel_scale(mel_mag, inv)[..., 0]    # (B, F)
        lin = lin * srv.output_gain
        hx = _decay_carry(model, hx, srv.state_decay)
        nf_s = state.nf_smooth
        nf_f = state.nf_floor
        nf_t = state.nf_total
        em_o, em_r = state.em_out, state.em_rem
        if srv.snr_gate_db is not None:
            # per-stream SNR gate (ops/noisefloor.py rationale): blend
            # the output magnitude toward passthrough on near-clean input
            from audio_denoising_tpu.ops.noisefloor import (
                FLOOR_VETO_GATE_DB, FLOOR_VETO_WIDTH_DB, FloorState,
                RemovedState, floor_rise_per_frame, floor_step,
                gate_alpha, removed_powers, removed_snr_db, removed_step,
                smooth_beta_per_frame, snr_db_from_floor,
                total_beta_per_frame)
            power = mag * mag                                # (B, F)
            est = srv.snr_gate_estimator
            alpha = None
            if est in ("removed", "both"):
                p_out, p_rem = removed_powers(power, lin * lin)
                rs = removed_step(RemovedState(em_o, em_r), p_out, p_rem,
                                  total_beta_per_frame(hop, dsp.sample_rate,
                                                       srv.snr_gate_tau_s))
                em_o, em_r = rs.out, rs.rem
                alpha = gate_alpha(removed_snr_db(rs), srv.snr_gate_db,
                                   srv.snr_gate_width_db)       # (B,)
            if est in ("floor", "both"):
                fs = floor_step(FloorState(nf_s, nf_f, nf_t), power,
                                smooth_beta_per_frame(hop, dsp.sample_rate),
                                floor_rise_per_frame(hop, dsp.sample_rate),
                                total_beta_per_frame(hop, dsp.sample_rate,
                                                       srv.snr_gate_tau_s))
                nf_s, nf_f, nf_t = fs.smooth, fs.floor, fs.total
                snr_f = snr_db_from_floor(fs.total,
                                          jnp.mean(nf_f, axis=-1))  # (B,)
                if est == "floor":
                    alpha = gate_alpha(snr_f, srv.snr_gate_db,
                                       srv.snr_gate_width_db)
                else:   # floor veto over the removed decision
                    alpha = jnp.maximum(
                        alpha, gate_alpha(snr_f, FLOOR_VETO_GATE_DB,
                                          FLOOR_VETO_WIDTH_DB))
            lin = alpha[:, None] * lin + (1.0 - alpha[:, None]) * mag
        rec = lin * jnp.exp(1j * phase)
        synth = jnp.fft.irfft(rec, n=n_fft, axis=-1) * win   # (B, n_fft)
        acc = state.ola + synth
        out_hop = acc[:, :hop] / env_hop
        ola = jnp.concatenate(
            [acc[:, hop:], jnp.zeros_like(acc[:, :hop])], axis=-1)
        return FastState(ring=ring, ola=ola, hx=hx, nf_smooth=nf_s,
                         nf_floor=nf_f, nf_total=nf_t,
                         em_out=em_o, em_rem=em_r,
                         la_mag=la_mag, la_phase=la_phase), out_hop

    return step


class StreamEngine:
    """Admission-controlled batched serving over a fixed slot table.

    Per-stream state lives at a slot index of the batched pytree; a stream's
    lifecycle is add -> process xN -> remove (slot state zeroed on add).
    Underruns (no chunk for an active stream this tick) are served
    pass-through zeros-in, matching the reference's degrade-to-passthrough
    behavior (app2.py:235-243) without stalling the batch.
    """

    def __init__(self, cfg: Config, model, params, mode: str = "fast",
                 max_streams: Optional[int] = None, jit: bool = True,
                 mesh=None, pallas_interpret: bool = False):
        """``mesh``: optional jax.sharding.Mesh — params replicate, the
        stream-slot axis shards over it (multi-chip serving; the model
        needs no cross-chip communication, so N chips give N-way
        throughput on ICI). ``pallas_interpret``: run the Pallas kernels
        of the fused modes in interpreter mode — for exercising the real
        serving paths on a CPU mesh (tests, the driver's multichip
        dryrun); never set on TPU."""
        self.cfg = cfg
        self.model = model
        self.params = params
        self.mode = mode
        self.mesh = mesh
        self.n = max_streams or cfg.serving.max_streams
        if mesh is not None:
            assert self.n % mesh.devices.size == 0, (
                "max_streams must divide evenly over the mesh")
        self.hop = cfg.dsp.hop_length

        if getattr(cfg.model, "lookahead_frames", 0) and mode != "fast":
            # bounded-lookahead checkpoints reconstruct a DELAYED frame
            # (delay rings in FastState); only the op-by-op fast step
            # implements the rings. 'fused' degrades gracefully (same
            # audio semantics, op-by-op dispatch); the GL/unet paths have
            # no delayed-reconstruction semantics at all.
            if mode == "fused":
                import warnings
                warnings.warn(
                    "lookahead checkpoints are served by the op-by-op "
                    "fast step (the fused kernel has no delay rings); "
                    "engine mode 'fused' downgraded to 'fast'",
                    stacklevel=2)
                mode = self.mode = "fast"
            else:
                raise ValueError(
                    f"engine mode {mode!r} does not support lookahead "
                    f"checkpoints (ModelConfig.lookahead_frames > 0); "
                    f"use mode 'fast'")

        if cfg.serving.snr_gate_db is not None and mode == "fused-webrtc":
            # the SNR gate is implemented in the op-by-op fast step, the
            # segment path (offline_denoise_stateless), IN-KERNEL in the
            # fused Pallas hop, and the op-by-op webrtc GL step; the
            # fused webrtc kernel does not carry the noise-floor state —
            # downgrade to the op-by-op GL path (same audio semantics)
            # rather than silently serve ungated
            import warnings
            warnings.warn(
                "snr_gate_db is set but the fused webrtc kernel does not "
                "implement the gate; downgrading to 'webrtc'",
                stacklevel=2)
            mode = self.mode = "webrtc"

        if cfg.serving.dtype == "int8" and mode not in ("fast", "fused"):
            # int8 serving is implemented in the op-by-op plan path
            # (runtime/quant.py via PlanModel) and the one-kernel fused
            # hop (W8A8 variant, on-chip Mosaic lowering validated by
            # tools/validate_int8_fused.py: 33 dB agreement vs fp32);
            # the webrtc/unet kernels have no int8 variant — don't let
            # their bf16 cast path misinterpret the dtype
            import warnings
            warnings.warn(
                f"serving dtype 'int8' is implemented for engine modes "
                f"'fast' and 'fused' only; downgrading mode {mode!r} to "
                f"'fast'", stacklevel=2)
            mode = self.mode = "fast"

        if mode in ("fused", "fused-webrtc") and not pallas_interpret \
                and not hasattr(model, "geo"):
            # VMEM capacity gate (mirrors PlanModel): the one-kernel hops
            # hold every dense plan matrix VMEM-resident, so a wide
            # checkpoint (hidden 64 x mel-128 = 137 MB fp32) fails TPU
            # compile with a scoped-vmem OOM. Downgrade to the equivalent
            # op-by-op mode, which streams weights from HBM.
            import warnings
            from audio_denoising_tpu.runtime.plan import (
                PlanModel, build_cell_plan)
            import numpy as _np
            _plan = build_cell_plan(model, params)
            # the fused hops store matrix operands at the serving compute
            # dtype (bf16 halves the resident bytes — wide checkpoints
            # that OOM in fp32 can still fuse with serving.dtype=bfloat16)
            _item = jnp.dtype(cfg.serving.dtype).itemsize
            _bytes = sum(_np.prod(_np.shape(m)) * _item
                         for m in jax.tree_util.tree_leaves(_plan))
            if mode == "fused-webrtc":
                # the webrtc kernel additionally holds its GL DFT pair,
                # mel matrices and envelopes VMEM-resident (~19 MB at
                # n_fft=1536) — count them or a near-budget plan passes
                # the gate and still OOMs scoped VMEM at compile
                from audio_denoising_tpu.ops.pallas.webrtc_hop import (
                    webrtc_const_bytes)
                _bytes += webrtc_const_bytes(cfg)
            if _bytes > PlanModel.FUSED_VMEM_BUDGET:
                fallback = "fast" if mode == "fused" else "webrtc"
                warnings.warn(
                    f"fused-kernel resident operands ({_bytes / 2**20:.0f} "
                    f"MB at serving dtype {cfg.serving.dtype}) exceed the "
                    f"VMEM budget; engine mode {mode!r} downgraded to "
                    f"{fallback!r}", stacklevel=2)
                mode = self.mode = fallback

        if mode == "fast":
            if cfg.serving.dtype == "int8":
                # W8A8 serving (runtime/quant.py): swap the zoo model for
                # the quantized matrixized plan — same cell interface, so
                # the fast step, masked commit and snapshots are untouched
                from audio_denoising_tpu.runtime.plan import PlanModel
                model = self.model = PlanModel(model, params,
                                               quantized=True)
            step = make_fast_step(cfg, model)
            self.state = fast_init_state(cfg, model, self.n)
            self._zero_one = fast_init_state(cfg, model, 1)
        elif mode == "webrtc":
            step = make_webrtc_step(cfg, model)
            self.state = webrtc_init_state(cfg, model, self.n)
            self._zero_one = webrtc_init_state(cfg, model, 1)
        elif mode == "fused-webrtc":
            # one-kernel webrtc hop with in-kernel warm-start Griffin-Lim
            # (app2.py:174-233 fused; the GL matmuls live in VMEM).
            from audio_denoising_tpu.ops.pallas.webrtc_hop import (
                make_webrtc_hop, webrtc_hop_init_state)
            from audio_denoising_tpu.runtime.plan import build_cell_plan
            plan = build_cell_plan(model, params)
            # batch tile: 128 saturates the MXU; smaller engines tile to
            # their (8-aligned) slot count to avoid padded compute
            block = min(128, (self.n + 7) // 8 * 8)
            hop_step = make_webrtc_hop(
                cfg, plan, block_b=block,
                compute_dtype=jnp.dtype(cfg.serving.dtype),
                interpret=pallas_interpret)
            step = lambda params, state, chunk: hop_step(state, chunk)
            self.state = webrtc_hop_init_state(cfg, plan, self.n)
            self._zero_one = webrtc_hop_init_state(cfg, plan, 1)
        elif mode == "unet":
            # cadence-locked segment streaming for the stateless U-Nets:
            # the heavy U-Net runs once per unet_seg_hops ticks under
            # lax.cond; between boundaries ticks only shift the sample ring
            # and drain the output buffer (pipeline.make_unet_stream_step).
            from audio_denoising_tpu.pipeline import (
                make_unet_stream_step, unet_stream_init_state)
            if not hasattr(model, "compatible_frames"):
                raise ValueError(
                    f"mode='unet' needs a stateless U-Net (model "
                    f"{type(model).__name__} has no compatible_frames); "
                    f"recurrent models stream via 'fast'/'webrtc'/'fused'")
            step = make_unet_stream_step(cfg, model)
            self.state = unet_stream_init_state(cfg, model, self.n)
            self._zero_one = unet_stream_init_state(cfg, model, 1)
        elif mode == "fused":
            # one-kernel Pallas hop (GRUUNet + MOMO families); params baked
            # in. pallas_call is not auto-partitionable, so with a mesh the
            # kernel is wrapped in shard_map (each device runs its shard).
            from audio_denoising_tpu.ops.pallas.fused_hop import (
                fused_hop_init_state, make_fused_hop, make_fused_hop_sharded)
            from audio_denoising_tpu.runtime.plan import (
                build_cell_plan, build_cell_plan_momo)
            if hasattr(model, "geo"):       # MOMO family (delta carry)
                plan = build_cell_plan_momo(model, params)
            else:
                plan = build_cell_plan(model, params)
            if mesh is not None:
                hop_step = make_fused_hop_sharded(
                    cfg, plan, mesh, interpret=pallas_interpret,
                    compute_dtype=jnp.dtype(cfg.serving.dtype))
            else:
                hop_step = make_fused_hop(
                    cfg, plan, compute_dtype=jnp.dtype(cfg.serving.dtype),
                    interpret=pallas_interpret)
            step = lambda params, state, chunk: hop_step(state, chunk)
            self.state = fused_hop_init_state(cfg, plan, self.n)
            self._zero_one = fused_hop_init_state(cfg, plan, 1)
        else:
            raise ValueError(f"unknown engine mode {mode!r}")

        # internal step signature is normalized to
        # step4(params, state, chunk, phase): only 'unet' consumes the
        # phase scalar (segment cycle position); other modes ignore it.
        self._cadence_locked = mode == "unet"
        if self._cadence_locked:
            raw4 = step
            self._seg_hops = cfg.serving.unet_seg_hops
        else:
            raw4 = lambda params, state, chunk, phase: step(params, state,
                                                            chunk)
            self._seg_hops = 1

        def step4(params, state, chunk, phase):
            # ingress sanitization: a client chunk carrying NaN/Inf would
            # otherwise poison the slot's recurrent state PERMANENTLY (the
            # carry never forgets a NaN, and masked commit can't help — the
            # poisoned tick IS a real chunk). Neutralize non-finite samples
            # to 0 under the same jit (fused, zero extra dispatch); finite
            # samples pass through untouched. The reference has no such
            # guard (server.py:191 feeds conn.recv() straight to the
            # model) — a production serving surface needs one.
            chunk = jnp.where(jnp.isfinite(chunk), chunk,
                              jnp.zeros_like(chunk))
            return raw4(params, state, chunk, phase)
        self._phase = 0
        self._phase_consts = [jnp.int32(i) for i in range(self._seg_hops)]

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            shard = NamedSharding(mesh, P(mesh.axis_names[0]))
            state_sh = jax.tree.map(lambda _: shard, self.state)
            params_sh = jax.tree.map(lambda _: repl, params)
            self._step = jax.jit(
                step4,
                in_shardings=(params_sh, state_sh, shard, repl),
                out_shardings=(state_sh, shard),
                donate_argnums=(1,))
            self.params = jax.device_put(params, repl)
            self.state = jax.device_put(self.state, shard)
            self._zero_one = jax.device_put(self._zero_one, repl)
        else:
            self._step = jax.jit(step4, donate_argnums=(1,)) if jit else step4
        self._reset_slot = jax.jit(self._reset_slot_impl, donate_argnums=(0,))

        def masked_step(params, state, batch, mask, phase):
            # advance all slots, but COMMIT state only where a chunk
            # actually arrived (mask) — a stream's recurrence must not be
            # mutated by the zero inputs of other streams' ticks.
            new_state, out = step4(params, state, batch, phase)
            committed = jax.tree.map(
                lambda new, old: jnp.where(
                    mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                new_state, state)
            return committed, out

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard1 = NamedSharding(mesh, P(mesh.axis_names[0]))
            repl1 = NamedSharding(mesh, P())
            state_sh1 = jax.tree.map(lambda _: shard1, self.state)
            self._masked_step = jax.jit(
                masked_step,
                in_shardings=(jax.tree.map(lambda _: repl1, params),
                              state_sh1, shard1, shard1, repl1),
                out_shardings=(state_sh1, shard1))
        else:
            self._masked_step = jax.jit(masked_step) if jit else masked_step

        self.slots: Dict[str, int] = {}
        self._free = list(range(self.n - 1, -1, -1))

    @staticmethod
    def _reset_slot_impl(state, zero_one, slot):
        return jax.tree.map(lambda s, z: s.at[slot].set(z[0]), state, zero_one)

    # -- lifecycle ---------------------------------------------------------
    def add_stream(self, stream_id: str) -> int:
        if stream_id in self.slots:
            raise KeyError(f"stream {stream_id!r} already active")
        if not self._free:
            raise RuntimeError("engine full: no free stream slots")
        slot = self._free.pop()
        self.state = self._reset_slot(self.state, self._zero_one,
                                      jnp.asarray(slot))
        self.slots[stream_id] = slot
        return slot

    def remove_stream(self, stream_id: str) -> None:
        slot = self.slots.pop(stream_id)
        self._free.append(slot)

    @property
    def active_streams(self) -> int:
        return len(self.slots)

    @property
    def algorithmic_latency_samples(self) -> int:
        """Honest end-to-end ALGORITHMIC latency of this engine config,
        in samples at ``cfg.dsp.sample_rate`` — what the serving mode
        itself delays the audio by, independent of compute/network time
        (round 5, VERDICT r4 #1: every point on the latency-quality
        frontier must account its own latency).

        - ``fast``/``fused`` (hop-synchronous OLA): ``n_fft - hop`` of
          synthesis overlap, plus ``lookahead_frames * hop`` when the
          checkpoint is a bounded-lookahead one (the delay rings hold k
          frames before reconstruction).
        - ``webrtc``/``fused-webrtc``: the reference's own budget — the
          segment is emitted before the newest frame enters the OLA
          buffer (app2.py:226-231), i.e. one ``n_fft - hop`` window tail.
        - ``unet`` (cadence-locked segments): ``seg + ctx`` samples —
          a segment is emitted only after its right context arrived
          (pipeline.make_unet_stream_step).
        """
        dsp = self.cfg.dsp
        if self._cadence_locked:
            srv = self.cfg.serving
            return srv.unet_seg_hops * dsp.hop_length + srv.unet_ctx_samples
        base = dsp.n_fft - dsp.hop_length
        la = getattr(self.cfg.model, "lookahead_frames", 0)
        if self.mode in ("fast", "fused") and la:
            base += la * dsp.hop_length
        return base

    @property
    def algorithmic_latency_ms(self) -> float:
        return (self.algorithmic_latency_samples
                / self.cfg.dsp.sample_rate * 1e3)

    # -- data path -----------------------------------------------------------
    def process(self, chunks: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """chunks: {stream_id: (hop,) float32} -> same keyed outputs.

        One jitted launch advances every slot WITH a chunk this tick; the
        other slots' state is masked back to its previous value — a stream
        must advance only when its audio arrives, or its recurrent state
        would be corrupted by zero-input steps whenever the tick scheduler
        batches other streams without it.

        'unet' mode is CADENCE-LOCKED instead: segment boundaries are a
        property of the engine tick, not of any one stream, so every slot
        advances every tick and an active stream that misses a tick gets
        zero samples spliced into its segment (the same degrade-to-zeros
        underrun semantics real-time systems use; per-slot pausing would
        need a per-slot U-Net dispatch)."""
        batch = np.zeros((self.n, self.hop), np.float32)
        mask = np.zeros((self.n,), np.bool_)
        for sid, chunk in chunks.items():
            slot = self.slots[sid]
            batch[slot] = chunk
            mask[slot] = True
        if self._cadence_locked:
            self.state, out = self._step(self.params, self.state,
                                         jnp.asarray(batch),
                                         self._phase_consts[self._phase])
            self._advance_phase()     # only after the step succeeded
        else:
            self.state, out = self._masked_step(self.params, self.state,
                                                jnp.asarray(batch),
                                                jnp.asarray(mask),
                                                self._phase_consts[0])
        out = np.asarray(out)
        return {sid: out[self.slots[sid]] for sid in chunks}

    def process_async(self, chunks: Dict[str, np.ndarray]):
        """Like process() but returns the device array WITHOUT blocking:
        ``(out_jnp, slot_map)``. The caller materializes later
        (np.asarray), letting the next tick's dispatch overlap this one's
        device round trip — on remote-attached chips the dispatch RTT
        dominates the tick."""
        batch = np.zeros((self.n, self.hop), np.float32)
        mask = np.zeros((self.n,), np.bool_)
        slot_map = {}
        for sid, chunk in chunks.items():
            slot = self.slots[sid]
            batch[slot] = chunk
            mask[slot] = True
            slot_map[sid] = slot
        if self._cadence_locked:
            self.state, out = self._step(self.params, self.state,
                                         jnp.asarray(batch),
                                         self._phase_consts[self._phase])
            self._advance_phase()
        else:
            self.state, out = self._masked_step(self.params, self.state,
                                                jnp.asarray(batch),
                                                jnp.asarray(mask),
                                                self._phase_consts[0])
        return out, slot_map

    def _advance_phase(self) -> None:
        """Advance the segment-cycle phase — call AFTER a successful step:
        advancing first would desync phase from the ring when a step
        raises (the tick thread's crash guard keeps serving afterwards)."""
        self._phase = (self._phase + 1) % self._seg_hops

    def process_batch(self, batch: jnp.ndarray) -> jnp.ndarray:
        """Raw fixed-shape path for benchmarking/serving fabrics:
        (N, hop) in -> (N, hop) out."""
        self.state, out = self._step(self.params, self.state, batch,
                                     self._phase_consts[self._phase])
        self._advance_phase()
        return out

    # -- failure recovery (SURVEY §5: snapshot/restore of stream state) -----
    def snapshot(self) -> Dict:
        """Host-side copy of all per-stream state + the slot table. Cheap
        (a few n_fft-sized buffers per stream); take periodically so a
        crashed serving process can resume mid-stream."""
        return {
            "state": jax.tree.map(lambda x: np.asarray(x), self.state),
            "slots": dict(self.slots),
            "free": list(self._free),
            "mode": self.mode,
            "phase": self._phase,
        }

    def restore(self, snap: Dict) -> None:
        if snap["mode"] != self.mode:
            raise ValueError(f"snapshot mode {snap['mode']!r} != engine "
                             f"mode {self.mode!r}")
        state = jax.tree.map(jnp.asarray, snap["state"])
        if jax.tree.structure(state) != jax.tree.structure(self.state):
            raise ValueError("snapshot state layout mismatch")
        mismatched = [
            (a.shape, b.shape)
            for a, b in zip(jax.tree.leaves(state),
                            jax.tree.leaves(self.state))
            if a.shape != b.shape]
        if mismatched:
            raise ValueError(
                f"snapshot shapes {mismatched} do not match this engine "
                f"(different max_streams or DSP config?)")
        self.state = state
        self.slots = dict(snap["slots"])
        self._free = list(snap["free"])
        self._phase = int(snap.get("phase", 0)) % self._seg_hops
