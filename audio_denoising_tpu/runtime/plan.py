"""Matrixized serving plan for GRUUNet-family cells.

The reference cell is ~60 tiny ops per frame (strided convs on 64..4 bins
with ~17 channels, smear concats, gate arithmetic — gruunet2.py:228-244).
On TPU that is dispatch/fusion-overhead bound: each op moves a few KB.
Serving weights are static, so the whole cell is compiled ONCE PER
CHECKPOINT into an affine plan:

- every conv level (weights + bias + the constant GaussianSmearing
  channels) is an affine map on the flattened (C*L) activation vector;
  the dense matrix is recovered by probing the existing conv ops with a
  basis batch — exact semantics (padding, strides, output_padding) for
  free, no index math to maintain;
- decoder skip-concats become split matmuls:
  ``conv_T(cat(h, skip)) = h @ U_h + skip @ U_s + c`` — the concat never
  materializes;
- the cell becomes 9 small dense matmuls + the GRU gate arithmetic, which
  XLA maps straight onto the MXU (and ops.pallas fuses into one kernel).

~2x the reference's FLOPs (band matrices stored dense) for ~10x fewer ops;
at 15k params the FLOPs are irrelevant and the MXU does dense at full rate.
"""

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class CellPlan(NamedTuple):
    """Affine plan: all leaves are jnp arrays -> the plan is a pytree and
    can be donated/replicated/sharded like params."""
    down_mats: Tuple[jnp.ndarray, ...]    # [i]: (n_in_i, n_out_i)
    down_biases: Tuple[jnp.ndarray, ...]
    reset_mat: jnp.ndarray                # (hidden*comp, 3*hidden*comp)
    reset_bias: jnp.ndarray
    up_h_mats: Tuple[jnp.ndarray, ...]    # [i]: (n_h_i, n_out_i)
    up_s_mats: Tuple[Optional[jnp.ndarray], ...]  # skip part (None for i=0)
    up_biases: Tuple[jnp.ndarray, ...]
    hidden: int
    compressed: int
    # MOMO3: level-0 input is affine in (x_t, prev) jointly (delta feature
    # x_t - prev, momo3.py:286-289); down_mats[0] then has 2F input rows.
    delta: bool = False


def _probe_affine(fn, n_in: int, dtype=jnp.float32):
    """fn maps (B, n_in) -> (B, n_out) affinely; recover (matrix, bias).

    Probing runs at fp32 matmul precision: on TPU the conv ops being
    probed default to bf16 inputs, which would bake ~1e-3 relative error
    INTO the plan matrices themselves (one-time cost, so precision is
    free here)."""
    eye = jnp.concatenate([jnp.zeros((1, n_in), dtype),
                           jnp.eye(n_in, dtype=dtype)], axis=0)
    with jax.default_matmul_precision("float32"):
        out = fn(eye)
    bias = out[0]
    mat = out[1:] - bias[None, :]
    return mat, bias


def build_cell_plan(model, params) -> CellPlan:
    """Compile a GRUUNet2/GRUUNet model + params into a CellPlan.

    Probes model.cell's conv stages through the public conv ops, so any
    config (kernel sizes, strides, asymmetric paddings) is supported.
    """
    from audio_denoising_tpu.ops.convs import conv1d, conv_transpose1d

    c = model.config
    L = model.levels
    sizes = model.bin_sizes                     # e.g. [64, 32, 16, 8, 4]
    chans = [1] + list(c.hidden_sizes[:-1]) + [model.gate_ch]

    down_mats, down_biases = [], []
    for i in range(L):
        C_in, L_in = chans[i], sizes[i]
        smear = model.smears_down[i]

        def g(v, i=i, C_in=C_in, L_in=L_in, smear=smear):
            x = v.reshape(v.shape[0], C_in, L_in)
            s = jnp.broadcast_to(smear[None], (v.shape[0],) + smear.shape)
            out = conv1d(jnp.concatenate([x, s], axis=1),
                         params[f"cell.input_gate.downs.{i}.conv.weight"],
                         params[f"cell.input_gate.downs.{i}.conv.bias"],
                         stride=c.strides[i], padding=c.paddings[i])
            return out.reshape(v.shape[0], -1)

        m, b = _probe_affine(g, C_in * L_in)
        down_mats.append(m)
        down_biases.append(b)

    comp, hidden = model.compressed, model.hidden

    def g_reset(v):
        hx = v.reshape(v.shape[0], hidden, comp)
        s = jnp.broadcast_to(model.smear_hx[None],
                             (v.shape[0],) + model.smear_hx.shape)
        out = conv1d(jnp.concatenate([hx, s], axis=1),
                     params["cell.reset_gate.downs.0.conv.weight"],
                     params["cell.reset_gate.downs.0.conv.bias"],
                     stride=1, padding=1)
        return out.reshape(v.shape[0], -1)

    reset_mat, reset_bias = _probe_affine(g_reset, hidden * comp)

    up_h_mats, up_s_mats, up_biases = [], [], []
    rev = ([1] + list(c.hidden_sizes))[::-1]    # [17,17,17,17,1]
    for i in range(L):
        C_h = rev[i]                             # conv-input h channels
        C_s = 0 if i == 0 else rev[i]            # concatenated skip channels
        L_in = sizes[L - i]
        smear = model.smears_up[i]
        n_h, n_s = C_h * L_in, C_s * L_in

        def g(v, i=i, C=C_h + C_s, L_in=L_in, smear=smear):
            x = v.reshape(v.shape[0], C, L_in)
            s = jnp.broadcast_to(smear[None], (v.shape[0],) + smear.shape)
            out = conv_transpose1d(
                jnp.concatenate([x, s], axis=1),
                params[f"cell.output_gate.ups.{i}.conv.weight"],
                params[f"cell.output_gate.ups.{i}.conv.bias"],
                stride=c.strides[::-1][i], padding=c.paddings[::-1][i],
                output_padding=model.up_output_paddings[i])
            return out.reshape(v.shape[0], -1)

        m, b = _probe_affine(g, n_h + n_s)
        up_h_mats.append(m[:n_h])
        up_s_mats.append(m[n_h:] if n_s else None)
        up_biases.append(b)

    return CellPlan(
        down_mats=tuple(down_mats), down_biases=tuple(down_biases),
        reset_mat=reset_mat, reset_bias=reset_bias,
        up_h_mats=tuple(up_h_mats), up_s_mats=tuple(up_s_mats),
        up_biases=tuple(up_biases), hidden=hidden, compressed=comp)


def build_cell_plan_momo(model, params) -> CellPlan:
    """Compile a MOMO2/MOMO3 model + params into a CellPlan.

    Same topology as GRUUNet2 with two differences (momo3.py vs
    gruunet2.py): smearing happens ONCE at the input (not per level), and
    MOMO3's level-0 input is the stack [x_t, x_t - prev] — affine in
    (x_t, prev) jointly, so down_mats[0] takes the concatenated 2F vector.
    """
    from audio_denoising_tpu.ops.convs import conv1d, conv_transpose1d

    c = model.config
    geo = model.geo
    L = geo.levels
    sizes = geo.bin_sizes
    F = model.num_bins
    delta = model.delta

    # level 0: (x, prev) -> conv(cat(stack([x, x-prev]), smear))
    def g0(v):
        b = v.shape[0]
        if delta:
            x, prev = v[:, :F], v[:, F:]
            xin = jnp.stack([x, x - prev], axis=1)
        else:
            xin = v[:, None, :]
        s = jnp.broadcast_to(geo.smear_in[None], (b,) + geo.smear_in.shape)
        out = conv1d(jnp.concatenate([xin, s], axis=1),
                     params["cell.input_gate.downs.0.conv.weight"],
                     params["cell.input_gate.downs.0.conv.bias"],
                     stride=c.strides[0], padding=c.paddings[0])
        return out.reshape(b, -1)

    down_mats, down_biases = [], []
    m, b = _probe_affine(g0, (2 * F) if delta else F)
    down_mats.append(m)
    down_biases.append(b)

    chans = list(c.hidden_sizes[:-1]) + [3 * geo.hidden]
    for i in range(1, L):
        C_in, L_in = chans[i - 1], sizes[i]

        def g(v, i=i, C_in=C_in, L_in=L_in):
            out = conv1d(v.reshape(v.shape[0], C_in, L_in),
                         params[f"cell.input_gate.downs.{i}.conv.weight"],
                         params[f"cell.input_gate.downs.{i}.conv.bias"],
                         stride=c.strides[i], padding=c.paddings[i])
            return out.reshape(v.shape[0], -1)

        m, b = _probe_affine(g, C_in * L_in)
        down_mats.append(m)
        down_biases.append(b)

    comp, hidden = geo.compressed, geo.hidden

    def g_reset(v):
        hx = v.reshape(v.shape[0], hidden, comp)
        s = jnp.broadcast_to(geo.smear_hx[None],
                             (v.shape[0],) + geo.smear_hx.shape)
        out = conv1d(jnp.concatenate([hx, s], axis=1),
                     params["cell.reset_gate.downs.0.conv.weight"],
                     params["cell.reset_gate.downs.0.conv.bias"],
                     stride=1, padding=1)
        return out.reshape(v.shape[0], -1)

    reset_mat, reset_bias = _probe_affine(g_reset, hidden * comp)

    up_h_mats, up_s_mats, up_biases = [], [], []
    rev = ([1] + list(c.hidden_sizes))[::-1]
    for i in range(L):
        C_h = rev[i]
        C_s = 0 if i == 0 else rev[i]
        L_in = sizes[L - i]
        n_h, n_s = C_h * L_in, C_s * L_in

        def g(v, i=i, C=C_h + C_s, L_in=L_in):
            out = conv_transpose1d(
                v.reshape(v.shape[0], C, L_in),
                params[f"cell.output_gate.ups.{i}.conv.weight"],
                params[f"cell.output_gate.ups.{i}.conv.bias"],
                stride=c.strides[::-1][i], padding=c.paddings[::-1][i],
                output_padding=geo.up_output_paddings[i])
            return out.reshape(v.shape[0], -1)

        m, b = _probe_affine(g, n_h + n_s)
        up_h_mats.append(m[:n_h])
        up_s_mats.append(m[n_h:] if n_s else None)
        up_biases.append(b)

    return CellPlan(
        down_mats=tuple(down_mats), down_biases=tuple(down_biases),
        reset_mat=reset_mat, reset_bias=reset_bias,
        up_h_mats=tuple(up_h_mats), up_s_mats=tuple(up_s_mats),
        up_biases=tuple(up_biases), hidden=hidden, compressed=comp,
        delta=delta)


def plan_cell(plan: CellPlan, x_t: jnp.ndarray, hx: jnp.ndarray,
              prev: Optional[jnp.ndarray] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One frame through the plan. x_t: (B, F); hx: (B, hidden*comp)
    flattened; prev: previous frame for delta plans. Returns
    (y (B, F), hx')."""
    L = len(plan.down_mats)
    x_in = jnp.concatenate([x_t, prev], axis=-1) if plan.delta else x_t
    skips = [x_in]
    h = x_in
    for m, b in zip(plan.down_mats, plan.down_biases):
        h = jax.nn.relu(h @ m + b)
        skips.append(h)

    gate_x = h                                        # (B, 3*hidden*comp)
    gate_h = jax.nn.relu(hx @ plan.reset_mat + plan.reset_bias)

    n = plan.hidden * plan.compressed
    i_r, i_i, i_n = gate_x[:, :n], gate_x[:, n:2 * n], gate_x[:, 2 * n:]
    h_r, h_i, h_n = gate_h[:, :n], gate_h[:, n:2 * n], gate_h[:, 2 * n:]
    inputgate = jax.nn.sigmoid(i_i + h_i)
    resetgate = jax.nn.sigmoid(i_r + h_r)
    newgate = jnp.tanh(i_n + resetgate * h_n)
    hi = newgate + inputgate * (hx - newgate)

    ups_in = skips[:-1]                               # [x, d1, ..., d_{L-1}]
    h = hi
    for i in range(L):
        out = h @ plan.up_h_mats[i] + plan.up_biases[i]
        if plan.up_s_mats[i] is not None:
            out = out + ups_in[L - i] @ plan.up_s_mats[i]
        if i != L - 1:
            h = jax.nn.relu(out)
            # skip concat is folded into the NEXT level's split matmul;
            # keep relu(out) as the h part only
        else:
            h = out
    return h, hi


def plan_apply_parallel(plan: CellPlan, x: jnp.ndarray, hx: jnp.ndarray,
                        vpu_gate: bool = False):
    """Sequence mode with the recurrence minimized.

    The GRUUNet cell's encoder depends only on x_t and its decoder only on
    (hi_t, skips_t) — neither is part of the recurrence. So:

    1. encoder: ONE batched matmul chain over all (B*T) frames;
    2. scan over T carrying hx: GRU gating only (one tiny reset-gate
       matmul + elementwise) — the narrowest possible sequential core;
    3. decoder: ONE batched matmul chain over all (B*T) frames.

    vs. scanning the whole cell: 9 sequential matmuls per frame become 1
    (or 0 MXU ops with ``vpu_gate``, which evaluates the 68x204 reset-gate
    product as a VPU broadcast-sum — profitable on backends with a flat
    per-scan-step MXU latency; see BENCHMARKS note in bench.py).
    """
    B, T, F = x.shape
    n = plan.hidden * plan.compressed
    if plan.delta:
        # prev_t = x_{t-1} (prev_0 = x_0, momo3.py delta-0 at t=0) is known
        # for the whole sequence — the delta feature lifts out of the scan.
        prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        flat = jnp.concatenate([x, prev], axis=-1).reshape(B * T, 2 * F)
    else:
        flat = x.reshape(B * T, F)

    skips = [flat]
    h = flat
    for m, b in zip(plan.down_mats, plan.down_biases):
        h = jax.nn.relu(h @ m + b)
        skips.append(h)
    gate_x_all = h.reshape(B, T, -1)

    R, rb = plan.reset_mat, plan.reset_bias

    def gate_step(carry, gx):
        if vpu_gate:
            rh = jnp.sum(carry[:, :, None] * R[None, :, :], axis=1) + rb
        else:
            rh = carry @ R + rb
        gh = jax.nn.relu(rh)
        i_r, i_i, i_n = gx[:, :n], gx[:, n:2 * n], gx[:, 2 * n:]
        h_r, h_i, h_n = gh[:, :n], gh[:, n:2 * n], gh[:, 2 * n:]
        inputgate = jax.nn.sigmoid(i_i + h_i)
        resetgate = jax.nn.sigmoid(i_r + h_r)
        newgate = jnp.tanh(i_n + resetgate * h_n)
        hi = newgate + inputgate * (carry - newgate)
        return hi, hi

    hx, his = jax.lax.scan(gate_step, hx, jnp.swapaxes(gate_x_all, 0, 1))
    his = jnp.swapaxes(his, 0, 1).reshape(B * T, n)     # (B*T, n)

    L = len(plan.up_h_mats)
    ups_in = skips[:-1]
    h = his
    for i in range(L):
        out = h @ plan.up_h_mats[i] + plan.up_biases[i]
        if plan.up_s_mats[i] is not None:
            out = out + ups_in[L - i] @ plan.up_s_mats[i]
        h = jax.nn.relu(out) if i != L - 1 else out
    return h.reshape(B, T, -1), hx


class PlanModel:
    """Drop-in model adapter: same interface as the zoo models
    (init_state / cell / apply) but executing the matrixized plan.
    ``fused=True`` runs the cell as one Pallas TPU kernel (GRUUNet
    family only)."""

    # Weights the fused one-kernel cell may hold VMEM-resident: v5e has
    # 128 MB of VMEM; leave headroom for activation tiles + double
    # buffering (the shipped configs use ~4 MB; hidden 40 ~ 33 MB).
    FUSED_VMEM_BUDGET = 100 * 2**20

    def __init__(self, model, params, fused: bool = False,
                 interpret: bool = False, quantized: bool = False):
        self.inner = model
        self.is_momo = hasattr(model, "geo")
        if self.is_momo:
            self.plan = build_cell_plan_momo(model, params)
        else:
            self.plan = build_cell_plan(model, params)
        self.num_bins = model.num_bins
        self.fused = fused
        self.interpret = interpret
        self.quantized = quantized
        if quantized:
            # W8A8 serving (runtime/quant.py): every dense plan matmul in
            # int8 with dynamic per-frame activation scales — the MXU
            # int8-rate / quarter-VMEM knob. Composes with the op-by-op
            # path only (the fused int8 kernel is a separate variant).
            if fused:
                raise ValueError("quantized=True requires fused=False")
            from audio_denoising_tpu.runtime.quant import (
                plan_cell_q, quantize_plan)
            self.qplan = quantize_plan(self.plan)
            if self.plan.delta:
                self._cell = lambda x, hx, prev: plan_cell_q(
                    self.qplan, x, hx, prev=prev)
            else:
                self._cell = lambda x, hx: plan_cell_q(self.qplan, x, hx)
            return
        if fused and not interpret:
            # VMEM capacity gate: the one-kernel cell holds EVERY plan
            # matrix resident in VMEM (constant index maps), so a wide
            # checkpoint whose dense plan exceeds the chip's VMEM (v5e:
            # 128 MB) would fail compile with a scoped-vmem OOM (seen at
            # hidden 64 x mel-128: 137 MB of plan weights -> 156 MB
            # scoped). Fall back to the XLA op-by-op plan path, which
            # streams weights from HBM and has no such limit.
            import numpy as _np
            mats = jax.tree_util.tree_leaves(self.plan)
            plan_bytes = sum(_np.prod(_np.shape(m)) * 4 for m in mats)
            if plan_bytes > self.FUSED_VMEM_BUDGET:
                import warnings
                warnings.warn(
                    f"plan weights ({plan_bytes / 2**20:.0f} MB fp32) "
                    f"exceed the fused-kernel VMEM budget "
                    f"({self.FUSED_VMEM_BUDGET / 2**20:.0f} MB); serving "
                    f"falls back to the unfused plan path", stacklevel=2)
                fused = self.fused = False
        if fused:
            from audio_denoising_tpu.ops.pallas.gruunet_cell import (
                make_fused_cell)
            self._cell = make_fused_cell(self.plan, interpret=interpret)
        elif self.plan.delta:
            self._cell = lambda x, hx, prev: plan_cell(self.plan, x, hx,
                                                       prev=prev)
        else:
            self._cell = lambda x, hx: plan_cell(self.plan, x, hx)

    def init_state(self, batch: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((batch, self.plan.hidden * self.plan.compressed),
                         dtype)

    def init_carry(self, batch: int, dtype=jnp.float32):
        hx = self.init_state(batch, dtype)
        if self.plan.delta:
            return (hx, jnp.zeros((batch, self.num_bins), dtype))
        return hx

    def decay_carry(self, carry, factor):
        if self.plan.delta:
            hx, prev = carry
            return (hx * factor, prev)
        return carry * factor

    def cell(self, params, x_t, carry):
        """carry: hx, or (hx, prev) for delta plans."""
        if self.plan.delta:
            hx, prev = carry
            y, hx2 = self._cell(x_t, hx, prev)
            return y, (hx2, x_t)
        y, hx2 = self._cell(x_t, carry)
        return y, hx2

    def apply(self, params, x: jnp.ndarray, hx: Optional[jnp.ndarray] = None):
        """x: (B, T, F) -> (y, hx'); params argument ignored (baked into
        the plan) — kept for interface compatibility. Sequences run with
        the encoder/decoder lifted out of the scan (plan_apply_parallel);
        single frames go through the (possibly Pallas-fused) cell."""
        if x.ndim == 2:
            x = x[None]
        if hx is None:
            hx = self.init_state(x.shape[0], x.dtype)
        if hx.ndim == 3:                     # accept model-layout state
            hx = hx.reshape(hx.shape[0], -1)
        if x.shape[1] == 1 and not self.plan.delta:
            y, hx = self._cell(x[:, 0], hx)
            return y[:, None], hx
        if self.quantized:
            from audio_denoising_tpu.runtime.quant import (
                plan_apply_parallel_q)
            return plan_apply_parallel_q(self.qplan, x, hx)
        return plan_apply_parallel(self.plan, x, hx)

    def __call__(self, params, x, hx=None):
        return self.apply(params, x, hx)
