"""TrainingContext: AdamW + exponential LR decay, residual-MSE objective,
per-iteration loss records, native checkpointing.

Mirrors the reference contract (TrainingContext, server.py:86-142: AdamW,
ExponentialLR(gamma=0.9), batch 64, loss records keyed by total_iters,
best-eval tracking) rebuilt on optax with pure jitted steps. The train step
computes features (STFT -> mel log1p) on device and supports data-parallel
sharding over a mesh (params replicated, batch sharded — XLA inserts the
gradient psums from shardings).
"""

import json
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from audio_denoising_tpu.compat.npz_store import load_params_npz, save_params_npz
from audio_denoising_tpu.config import Config
from audio_denoising_tpu.ops import hann_window, mel_filterbank, mel_scale, stft
from audio_denoising_tpu.train.losses import LOSSES


class TrainState(NamedTuple):
    params: Dict[str, jnp.ndarray]
    opt_state: Any
    step: jnp.ndarray


def make_feature_fn(cfg: Config):
    """waveform (B, L) -> log1p frames (B, T, F), on device.

    domain='mel': mel-filterbank features (the recurrent models' input).
    domain='raw': plain log1p magnitude at n_stft bins (the 2D U-Nets'
    'clamped raw-spectrogram' era, SURVEY §2 #3)."""
    dsp = cfg.dsp
    win = hann_window(dsp.win)
    fb = (mel_filterbank(dsp.n_stft, dsp.n_mels, dsp.sample_rate)
          if dsp.domain == "mel" else None)

    def features(wave: jnp.ndarray) -> jnp.ndarray:
        spec = stft(wave, dsp.n_fft, dsp.hop_length, dsp.win, window=win)
        mag = jnp.abs(spec)
        if fb is not None:
            mag = mel_scale(mag, fb)
        return jnp.swapaxes(jnp.log1p(mag), -1, -2)

    return features


class TrainingContext:
    def __init__(self, cfg: Config, model, params: Optional[Dict] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.model = model
        tr = cfg.train
        if getattr(cfg.model, "lookahead_frames", 0) and hasattr(
                model, "compatible_frames"):
            raise ValueError(
                "lookahead_frames applies to the recurrent family only; "
                "stateless U-Nets already see their whole segment "
                "(their lookahead is the serving ctx/seg window)")
        if params is None:
            params = model.init(jax.random.PRNGKey(seed))

        # Teacher-student distillation (train/distill.py): when set, the
        # training target is the teacher's denoised output on each
        # mixture (stop-gradient), not the clean crop. _teacher =
        # (teacher_params, fn); params ride as jit arguments.
        self._teacher = None
        if getattr(tr, "distill_from", None):
            from audio_denoising_tpu.train.distill import load_teacher
            self._teacher = load_teacher(tr.distill_from, cfg)

        # ExponentialLR(0.9) decays per scheduler step; the reference steps
        # it per epoch. transition_steps makes the epoch length explicit.
        self.schedule = optax.exponential_decay(
            init_value=tr.learning_rate, transition_steps=1000,
            decay_rate=tr.lr_gamma, staircase=True)
        self.optim = optax.adamw(self.schedule, weight_decay=tr.weight_decay)
        self.state = TrainState(params=params,
                                opt_state=self.optim.init(params),
                                step=jnp.zeros((), jnp.int32))

        self.features = make_feature_fn(cfg)
        self.train_loss = LOSSES[tr.loss_metric_train]
        self.eval_loss = LOSSES[tr.loss_metric_eval]
        self.train_loss_record: Dict[int, float] = {}
        self.test_loss_record: Dict[int, float] = {}
        self.best_eval_loss: Optional[float] = None
        self.total_iters = 0

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- pure steps ---------------------------------------------------------
    def _forward(self, params, x, dropout_rng=None):
        """Model forward for training. For GRUUNet-family models the
        matrixized plan is built INSIDE the step — build_cell_plan probes
        the conv ops, so it is differentiable and gradients flow through
        the dense plan back to the conv weights — and the sequence runs
        with the encoder/decoder lifted out of the scan
        (plan_apply_parallel): the backward pass through the recurrence
        then touches only the tiny gating, not 9 matmuls per frame."""
        from audio_denoising_tpu.runtime.plan import (
            build_cell_plan, build_cell_plan_momo, plan_apply_parallel)
        if getattr(self.model, "levels", None) is not None and hasattr(
                self.model, "smears_down"):
            plan = build_cell_plan(self.model, params)
        elif hasattr(self.model, "geo"):                  # MOMO2/MOMO3
            plan = build_cell_plan_momo(self.model, params)
        elif hasattr(self.model, "compatible_frames"):    # stateless U-Nets
            # (B, T, F) frames -> (B, F, T) image, padded to a frame count
            # the fixed-output_padding decoder accepts, cropped back.
            img = jnp.swapaxes(x, -1, -2)
            t = img.shape[-1]
            t_pad = self.model.compatible_frames(t)
            img = jnp.pad(img, ((0, 0), (0, 0), (0, t_pad - t)))
            # training-time dropout matches the reference's nn.Dropout
            # in every conv block (unet4.py:118, dropout=0.01); eval and
            # inference pass dropout_rng=None (identity)
            resid = self.model.apply(
                params, img, dropout_rng=dropout_rng,
                dropout=getattr(self.cfg.model, "dropout", 0.0),
            )[..., :x.shape[-1], :t]
            return jnp.swapaxes(resid, -1, -2), None
        else:
            return self.model.apply(params, x)
        hx = jnp.zeros((x.shape[0], plan.hidden * plan.compressed), x.dtype)
        return plan_apply_parallel(plan, x, hx)

    def _loss(self, params, mixture, clean, loss_fn, dropout_rng=None):
        if self.cfg.train.objective == "recon_mrstft":
            return self._loss_recon(params, mixture, clean, dropout_rng)
        la = getattr(self.cfg.model, "lookahead_frames", 0)
        if la:
            # bounded lookahead (ModelConfig.lookahead_frames): pad la
            # hops of silence so the model sees la future frames past the
            # crop, then align pred[t + la] against frame t's target —
            # the same flush-and-shift the serving paths perform.
            padded = jnp.pad(mixture,
                             ((0, 0), (0, la * self.cfg.dsp.hop_length)))
            x_all = self.features(padded)        # (B, T + la, M)
            pred, _ = self._forward(params, x_all, dropout_rng=dropout_rng)
            x = x_all[:, :x_all.shape[1] - la]
            pred = pred[:, la:]
        else:
            x = self.features(mixture)          # (B, T, M) noisy input
            pred, _ = self._forward(params, x, dropout_rng=dropout_rng)
        target = x - self.features(clean)    # residual target (noisy - clean)
        return loss_fn(pred, target)

    def _loss_recon(self, params, mixture, clean, dropout_rng=None):
        """Train THROUGH the serving reconstruction (objective
        'recon_mrstft'): run the same differentiable phase-reuse chain the
        offline/eval path uses (pipeline.offline_denoise semantics — STFT,
        features, model residual, leaky_relu(0.2) subtract, expm1,
        inverse-mel, noisy-phase iSTFT) and score the denoised WAVEFORM
        against clean with multi-resolution STFT + waveform L1, plus the
        contract's residual MSE as a stabilizing auxiliary. The residual
        objective cannot see past the model (inverse-mel loss, synthesis);
        this one scores exactly what evaluation measures."""
        from audio_denoising_tpu.ops import istft
        from audio_denoising_tpu.pipeline import (
            _to_features, _to_linear, _transforms)
        from audio_denoising_tpu.train.losses import multi_res_stft

        tr, dsp = self.cfg.train, self.cfg.dsp
        fb, inv, win = _transforms(self.cfg)
        length = mixture.shape[-1]
        la = getattr(self.cfg.model, "lookahead_frames", 0)
        wave_in = (jnp.pad(mixture, ((0, 0), (0, la * dsp.hop_length)))
                   if la else mixture)
        spec = stft(wave_in, dsp.n_fft, dsp.hop_length, dsp.win, window=win)
        mag = jnp.abs(spec)
        x = jnp.swapaxes(_to_features(self.cfg, mag, fb), -1, -2)  # (B,T,M)
        pred, _ = self._forward(params, x, dropout_rng=dropout_rng)
        if la:
            # pred[t + la] targets frame t (ModelConfig.lookahead_frames);
            # trim the la flush frames back off so the reconstruction
            # aligns sample-exact with the unpadded mixture/clean
            t_use = x.shape[1] - la
            pred = pred[:, la:]
            x = x[:, :t_use]
            spec = spec[..., :t_use]
        recon = jax.nn.leaky_relu(x - pred, negative_slope=0.2)
        lin = _to_linear(self.cfg, jnp.swapaxes(recon, -1, -2), inv)
        est = istft(lin * jnp.exp(1j * jnp.angle(spec)), dsp.n_fft,
                    dsp.hop_length, dsp.win, window=win, length=length)

        target = x - self.features(clean)
        loss = (tr.mrstft_weight * multi_res_stft(est, clean)
                + tr.wave_l1_weight * jnp.mean(jnp.abs(est - clean))
                + tr.residual_aux_weight * jnp.mean((pred - target) ** 2))
        if tr.si_sdr_weight:
            from audio_denoising_tpu.train.eval_metrics import si_sdr_db
            loss = loss - tr.si_sdr_weight * jnp.mean(
                si_sdr_db(clean, est)) / 10.0
        return loss

    def _train_step_impl(self, state: TrainState, mixture, clean):
        # per-step dropout key derived from the step counter: stateless,
        # resumable (the same step re-draws the same mask after a resume)
        rng = jax.random.fold_in(
            jax.random.PRNGKey(self.cfg.train.seed), state.step)
        loss, grads = jax.value_and_grad(
            lambda p: self._loss(p, mixture, clean, self.train_loss,
                                 dropout_rng=rng)
        )(state.params)
        updates, opt_state = self.optim.update(grads, state.opt_state,
                                               state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def _eval_step_impl(self, params, mixture, clean):
        return self._loss(params, mixture, clean, self.eval_loss)

    # -- host loop ------------------------------------------------------------
    def train_step(self, mixture: np.ndarray, clean: np.ndarray) -> float:
        mixture = jnp.asarray(mixture)
        if self._teacher is not None:
            if not hasattr(self, "_distill_target"):
                self._distill_target = jax.jit(self._teacher[1])
            clean = self._distill_target(self._teacher[0], mixture)
        self.state, loss = self._train_step(self.state, mixture,
                                            jnp.asarray(clean))
        self.total_iters += 1
        val = float(loss)
        self.train_loss_record[self.total_iters] = val
        return val

    def eval_step(self, mixture: np.ndarray, clean: np.ndarray) -> float:
        val = float(self._eval_step(self.state.params, jnp.asarray(mixture),
                                    jnp.asarray(clean)))
        self.test_loss_record[self.total_iters] = val
        if self.best_eval_loss is None or val < self.best_eval_loss:
            self.best_eval_loss = val
        return val

    def fit(self, sampler, iters: int, eval_every: int = 0,
            log_every: int = 0) -> Dict[int, float]:
        for i, (mixture, clean) in enumerate(sampler):
            if i >= iters:
                break
            loss = self.train_step(mixture, clean)
            if log_every and (i + 1) % log_every == 0:
                print(f"iter {self.total_iters}: train "
                      f"{self.cfg.train.loss_metric_train}={loss:.5f}")
            if eval_every and (i + 1) % eval_every == 0:
                m, c = sampler.sample()
                self.eval_step(m, c)
        return self.train_loss_record

    def fit_on_device(self, corpus, iters: int, steps_per_dispatch: int = 10,
                      log_every: int = 0, seed: int = 0, noise_corpus=None,
                      noise_gain=(0.2, 1.0), snr_range_db=None):
        """Fully device-resident training (train/device_data.py): batch
        synthesis + K train steps per dispatch; per-dispatch host traffic
        is one key in, K loss scalars out. The corpus buffers ride as jit
        ARGUMENTS (device-resident across dispatches, never re-staged);
        ``noise_corpus`` (a second DeviceCorpus) switches noise synthesis
        to real noise crops."""
        import functools
        from audio_denoising_tpu.train.device_data import make_device_sampler

        if snr_range_db is None:
            snr_range_db = self.cfg.train.snr_range_db
        sample = make_device_sampler(corpus, self.cfg.train.crop_samples,
                                     self.cfg.train.batch_size,
                                     noise_gain=tuple(noise_gain),
                                     noise_corpus=noise_corpus,
                                     snr_range_db=snr_range_db,
                                     identity_prob=self.cfg.train
                                     .identity_prob)
        K = steps_per_dispatch
        buf = corpus.buffer
        nbuf = noise_corpus.buffer if noise_corpus is not None else None
        teacher_fn = self._teacher[1] if self._teacher is not None else None

        def one(bufs, carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            sbufs, tparams = bufs
            mixture, clean = sample(sub, *sbufs)
            if teacher_fn is not None:
                # distillation: the target is the teacher's denoised
                # output on this mixture (train/distill.py); tparams are
                # jit arguments like the corpus buffers (never re-staged)
                clean = teacher_fn(tparams, mixture)
            state, loss = self._train_step_impl(state, mixture, clean)
            return (state, key), loss

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("length",))
        def run_n(carry, bufs, length):
            return jax.lax.scan(functools.partial(one, bufs), carry, None,
                                length=length)

        bufs = ((buf,) if nbuf is None else (buf, nbuf),
                self._teacher[0] if self._teacher is not None else None)
        carry = (self.state, jax.random.PRNGKey(seed))
        done = 0
        while done < iters:
            carry, losses = run_n(carry, bufs,
                                  length=min(K, iters - done))
            losses = np.asarray(losses)
            for v in losses:
                self.total_iters += 1
                self.train_loss_record[self.total_iters] = float(v)
            done += len(losses)
            if log_every and (done % log_every == 0 or done >= iters):
                print(f"iter {self.total_iters}: train "
                      f"{self.cfg.train.loss_metric_train}="
                      f"{losses[-1]:.5f}", flush=True)
        self.state = carry[0]
        return self.train_loss_record

    # -- checkpointing ----------------------------------------------------------
    def save(self, path: str, backend: str = "npz") -> None:
        """Native checkpoint: params + loss records + config + metadata —
        carrying the same contract fields as the reference's save_model
        (app.py:43-91). backend='npz' (default, one flat file) or
        'orbax' (directory; sharded/production store)."""
        meta = {
            "arch": self.cfg.model.arch,
            "config": self.cfg.model.to_reference_dict(),
            "full_config": json.loads(self.cfg.to_json()),
            "total_training_iters": self.total_iters,
            "last_target_name": self.cfg.train.target_name,
            "last_batch_size": self.cfg.train.batch_size,
            "loss_metric": {"train": self.cfg.train.loss_metric_train,
                            "test": self.cfg.train.loss_metric_eval},
            "loss_record": {"train": {str(k): v for k, v in
                                      self.train_loss_record.items()},
                            "test": {str(k): v for k, v in
                                     self.test_loss_record.items()}},
        }
        params_np = {k: np.asarray(v) for k, v in self.state.params.items()}
        # optimizer + schedule state travel too (the reference persists
        # model/optimizer/scheduler, app.py:43-91) — resuming without them
        # would restart AdamW moments and the LR decay at a converged model
        opt_leaves = jax.tree.leaves(self.state.opt_state)
        store = dict(params_np)
        store.update({f"__opt__{i}": np.asarray(v)
                      for i, v in enumerate(opt_leaves)})
        meta["opt_n_leaves"] = len(opt_leaves)
        meta["opt_step"] = int(self.state.step)
        if backend == "orbax":
            from audio_denoising_tpu.compat.orbax_store import save_params_orbax
            save_params_orbax(path, store, meta)
        else:
            save_params_npz(path, store, meta)

    @classmethod
    def load(cls, path: str, cfg: Config, model) -> "TrainingContext":
        if os.path.isdir(path):      # orbax checkpoints are directories
            from audio_denoising_tpu.compat.orbax_store import load_params_orbax
            params, meta = load_params_orbax(path)
        else:
            params, meta = load_params_npz(path)
        opt_stored = {k: v for k, v in params.items()
                      if k.startswith("__opt__")}
        params = {k: v for k, v in params.items()
                  if not k.startswith("__opt__")}
        self = cls(cfg, model, params={k: jnp.asarray(v)
                                       for k, v in params.items()})
        n = meta.get("opt_n_leaves")
        if n is not None and len(opt_stored) == n:
            # rebuild via the fresh opt_state's treedef (same optimizer
            # config -> same structure)
            treedef = jax.tree.structure(self.state.opt_state)
            leaves = [jnp.asarray(opt_stored[f"__opt__{i}"])
                      for i in range(n)]
            self.state = TrainState(
                params=self.state.params,
                opt_state=jax.tree.unflatten(treedef, leaves),
                step=jnp.asarray(meta.get("opt_step", 0), jnp.int32))
        self.total_iters = meta.get("total_training_iters") or 0
        rec = meta.get("loss_record") or {}
        self.train_loss_record = {int(k): v for k, v in
                                  (rec.get("train") or {}).items()}
        self.test_loss_record = {int(k): v for k, v in
                                 (rec.get("test") or {}).items()}
        if self.test_loss_record:
            self.best_eval_loss = min(self.test_loss_record.values())
        return self


def make_sharded_train_step(ctx: TrainingContext, mesh):
    """Data-parallel train step over a mesh: params/opt-state replicated,
    batch sharded on the leading axis; gradient all-reduce is inserted by
    XLA from the output shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    state_sh = jax.tree.map(lambda _: repl, ctx.state)

    return jax.jit(
        ctx._train_step_impl,
        in_shardings=(state_sh, shard, shard),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
