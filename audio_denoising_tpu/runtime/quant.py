"""int8-quantized serving plan: MXU-native W8A8 with dynamic activations.

The CellPlan's dense level matrices quantize to int8 with per-output-
column symmetric scales; activations quantize per row (per stream, per
frame) at serve time from their live max — no calibration set needed.
Matmuls then run int8 x int8 -> int32 on the MXU (multiple times the
fp32/bf16 rate on TPU; weight bytes quarter, which also quarters the
fused kernel's VMEM residency), and dequantization is a rank-1 rescale
folded into the following elementwise stage.

The GRU gate arithmetic and biases stay fp32: the recurrence is the
error-accumulation path, and its elementwise cost is negligible. The
reset-gate matmul IS quantized — its input (hx) is bounded by the
tanh/sigmoid gating, so dynamic row scales stay tight.

Accuracy: every matmul sees <= 0.8% relative error (1/127 quant step x
per-column scaling); measured end-to-end agreement between int8 and
fp32 serving is test-locked (tests/test_quant.py) and the audible
quality delta is evaluated on the frozen manifest with
tools/eval_quant.py. Reference counterpart: none (torch fp32 serving,
server.py:178-227); this is the TPU serving-throughput knob.
"""

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from audio_denoising_tpu.runtime.plan import CellPlan


class QuantMat(NamedTuple):
    q: jnp.ndarray       # (rows, cols) int8
    scale: jnp.ndarray   # (cols,) fp32: dequant = int32 * row_scale * scale


class QuantCellPlan(NamedTuple):
    down_mats: Tuple[QuantMat, ...]
    down_biases: Tuple[jnp.ndarray, ...]
    reset_mat: QuantMat
    reset_bias: jnp.ndarray
    up_h_mats: Tuple[QuantMat, ...]
    up_s_mats: Tuple[Optional[QuantMat], ...]
    up_biases: Tuple[jnp.ndarray, ...]
    hidden: int
    compressed: int
    delta: bool = False


def quantize_mat(m: jnp.ndarray) -> QuantMat:
    """Symmetric per-output-column int8 quantization."""
    m = jnp.asarray(m, jnp.float32)
    amax = jnp.max(jnp.abs(m), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(m / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantMat(q=q, scale=scale)


def quantize_plan(plan: CellPlan) -> QuantCellPlan:
    return QuantCellPlan(
        down_mats=tuple(quantize_mat(m) for m in plan.down_mats),
        down_biases=tuple(plan.down_biases),
        reset_mat=quantize_mat(plan.reset_mat),
        reset_bias=plan.reset_bias,
        up_h_mats=tuple(quantize_mat(m) for m in plan.up_h_mats),
        up_s_mats=tuple(None if m is None else quantize_mat(m)
                        for m in plan.up_s_mats),
        up_biases=tuple(plan.up_biases),
        hidden=plan.hidden, compressed=plan.compressed, delta=plan.delta)


def qdot(x: jnp.ndarray, qm: QuantMat) -> jnp.ndarray:
    """(B, rows) fp32 @ int8 matrix -> (B, cols) fp32.

    Dynamic per-row symmetric activation quantization (the live max of
    THIS frame's activation vector — no calibration pass), int32
    accumulation (``preferred_element_type``: the MXU's native int8
    path), rank-1 dequant."""
    ax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.where(ax > 0, ax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, qm.q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * qm.scale[None, :]


def plan_cell_q(qplan: QuantCellPlan, x_t: jnp.ndarray, hx: jnp.ndarray,
                prev: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One frame through the quantized plan — runtime.plan.plan_cell with
    every dense matmul in W8A8."""
    x_in = jnp.concatenate([x_t, prev], axis=-1) if qplan.delta else x_t
    skips = [x_in]
    h = x_in
    for qm, b in zip(qplan.down_mats, qplan.down_biases):
        h = jax.nn.relu(qdot(h, qm) + b)
        skips.append(h)

    gate_x = h
    gate_h = jax.nn.relu(qdot(hx, qplan.reset_mat) + qplan.reset_bias)

    n = qplan.hidden * qplan.compressed
    i_r, i_i, i_n = gate_x[:, :n], gate_x[:, n:2 * n], gate_x[:, 2 * n:]
    h_r, h_i, h_n = gate_h[:, :n], gate_h[:, n:2 * n], gate_h[:, 2 * n:]
    inputgate = jax.nn.sigmoid(i_i + h_i)
    resetgate = jax.nn.sigmoid(i_r + h_r)
    newgate = jnp.tanh(i_n + resetgate * h_n)
    hi = newgate + inputgate * (hx - newgate)

    L = len(qplan.up_h_mats)
    ups_in = skips[:-1]
    h = hi
    for i in range(L):
        out = qdot(h, qplan.up_h_mats[i]) + qplan.up_biases[i]
        if qplan.up_s_mats[i] is not None:
            out = out + qdot(ups_in[L - i], qplan.up_s_mats[i])
        h = jax.nn.relu(out) if i != L - 1 else out
    return h, hi


def plan_apply_parallel_q(qplan: QuantCellPlan, x: jnp.ndarray,
                          hx: jnp.ndarray):
    """Sequence mode (runtime.plan.plan_apply_parallel) in W8A8: the
    feedforward encoder/decoder run as batched (B*T)-row quantized
    matmuls — per-row dynamic scales make this frame-exact vs the cell —
    and the scan carries only the GRU gating (quantized reset matmul)."""
    B, T, F = x.shape
    n = qplan.hidden * qplan.compressed
    if qplan.delta:
        prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
        flat = jnp.concatenate([x, prev], axis=-1).reshape(B * T, 2 * F)
    else:
        flat = x.reshape(B * T, F)

    skips = [flat]
    h = flat
    for qm, b in zip(qplan.down_mats, qplan.down_biases):
        h = jax.nn.relu(qdot(h, qm) + b)
        skips.append(h)
    gate_x_all = h.reshape(B, T, -1)

    def gate_step(carry, gx):
        gh = jax.nn.relu(qdot(carry, qplan.reset_mat) + qplan.reset_bias)
        i_r, i_i, i_n = gx[:, :n], gx[:, n:2 * n], gx[:, 2 * n:]
        h_r, h_i, h_n = gh[:, :n], gh[:, n:2 * n], gh[:, 2 * n:]
        inputgate = jax.nn.sigmoid(i_i + h_i)
        resetgate = jax.nn.sigmoid(i_r + h_r)
        newgate = jnp.tanh(i_n + resetgate * h_n)
        hi = newgate + inputgate * (carry - newgate)
        return hi, hi

    hx, his = jax.lax.scan(gate_step, hx, jnp.swapaxes(gate_x_all, 0, 1))
    his = jnp.swapaxes(his, 0, 1).reshape(B * T, n)

    L = len(qplan.up_h_mats)
    ups_in = skips[:-1]
    h = his
    for i in range(L):
        out = qdot(h, qplan.up_h_mats[i]) + qplan.up_biases[i]
        if qplan.up_s_mats[i] is not None:
            out = out + qdot(ups_in[L - i], qplan.up_s_mats[i])
        h = jax.nn.relu(out) if i != L - 1 else out
    return h.reshape(B, T, -1), hx
