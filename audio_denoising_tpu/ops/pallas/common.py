"""Shared in-kernel building blocks for the Pallas serving kernels.

The matrixized cell (runtime/plan.py) executes identically inside the
single-hop kernel (fused_hop.py), the resident multi-hop kernel, and the
fused webrtc hop (webrtc_hop.py); this module holds the one copy of the
weight packing and the cell math so the kernels cannot drift apart.
"""

from typing import List, Tuple

import jax
import jax.numpy as jnp


def hdot(a, b):
    """MXU matmul with fp32 accumulate at HIGHEST precision (in-kernel
    jnp.dot defaults to bf16 inputs; parity paths need fp32)."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def pack_plan_weights(plan, quantize: bool = False
                      ) -> Tuple[List, List[bool]]:
    """Flatten a CellPlan into the kernel operand list (fixed order:
    down (mat, bias) pairs, reset (mat, bias), up (mat, bias[, skip_mat])
    per level) + the per-level skip flags. Biases become (1, n) rows (TPU
    wants >= 2-D operands).

    ``quantize=True`` (the int8 kernel variant): every MATRIX is emitted
    as the pair (int8 matrix, (1, cols) fp32 per-column scale row) —
    runtime.quant.quantize_mat semantics — so the kernel's weight VMEM
    quarters and the MXU runs its native int8 path; biases stay fp32."""
    def mat(m):
        if not quantize:
            return [m]
        from audio_denoising_tpu.runtime.quant import quantize_mat
        qm = quantize_mat(m)
        return [qm.q, qm.scale[None, :]]

    weights = []
    for m, b in zip(plan.down_mats, plan.down_biases):
        weights += mat(m) + [b[None, :]]
    weights += mat(plan.reset_mat) + [plan.reset_bias[None, :]]
    skip_flags = []
    L = len(plan.down_mats)
    for i in range(L):
        weights += mat(plan.up_h_mats[i]) + [plan.up_biases[i][None, :]]
        if plan.up_s_mats[i] is not None:
            weights += mat(plan.up_s_mats[i])
            skip_flags.append(True)
        else:
            skip_flags.append(False)
    return weights, skip_flags


def plan_cell_math(w, skip_flags, n: int, feat: int, delta: bool,
                   x, hx, prev=None, compute_dtype=None):
    """One cell step on in-kernel arrays/refs.

    ``w``: packed weight refs/arrays (pack_plan_weights order); ``x``:
    (B, feat) input feature; ``hx``: (B, n) flattened state; ``prev``:
    (B, feat) previous feature for delta (MOMO3) plans. Returns
    (y (B, feat_out), hi (B, n)) — the caller applies state decay and
    carries prev' = x. Semantics: runtime/plan.plan_cell (gruunet2.py
    :228-244 / momo3.py:286-289 via the probed plan).

    ``compute_dtype=bfloat16``: the caller stores the weight MATRICES in
    bf16 (biases stay fp32); activations cast to bf16 at each matmul,
    fp32 accumulate — the reduced-precision serving variant.

    ``compute_dtype=int8``: the caller packed with
    ``pack_plan_weights(quantize=True)`` — each matrix slot is the pair
    (int8 matrix, (1, cols) fp32 scale row); activations quantize per
    row from their live max, the dot runs int8 x int8 -> int32 (the
    MXU's native int8 path), and the rank-1 dequant folds into the
    following elementwise stage (runtime/quant.qdot semantics)."""
    L = len(skip_flags)
    quant = compute_dtype is not None and \
        jnp.dtype(compute_dtype) == jnp.dtype(jnp.int8)
    bf = compute_dtype is not None and not quant and \
        jnp.dtype(compute_dtype) != jnp.dtype(jnp.float32)

    def mdot(a, m, scale=None, row_scale=None):
        if quant:
            acc = jnp.dot(a, m, preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * row_scale * scale
        if bf:
            return jnp.dot(a.astype(jnp.bfloat16), m,
                           preferred_element_type=jnp.float32)
        return hdot(a, m)

    def quantize_rows(a):
        ax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
        sx = jnp.where(ax > 0, ax / 127.0, 1.0)
        aq = jnp.clip(jnp.round(a / sx), -127, 127).astype(jnp.int8)
        return aq, sx

    # weight walk: a matrix slot is (mat[, scale]) depending on quant
    wi = 0

    def next_mat():
        nonlocal wi
        m = w[wi]
        wi += 1
        if quant:
            s = w[wi][0]
            wi += 1
            return m, s
        return m, None

    def next_bias():
        nonlocal wi
        b = w[wi][0]
        wi += 1
        return b

    def dot(a, mat, scale):
        if quant:
            aq, sx = quantize_rows(a)
            return mdot(aq, mat[:] if hasattr(mat, "shape") else mat,
                        scale, sx)
        return mdot(a, mat[:] if hasattr(mat, "shape") else mat)

    h = x
    skips = [h]
    for i in range(L):
        m, s = next_mat()
        if i == 0 and delta:
            # level 0 is affine in (x, prev) jointly — split the 2F-row
            # matrix instead of materializing cat(x, prev)
            w0 = m[:]
            if quant:
                hq, h_s = quantize_rows(h)
                pq, p_s = quantize_rows(prev)
                lin = mdot(hq, w0[:feat], s, h_s) + \
                    mdot(pq, w0[feat:], s, p_s)
            else:
                lin = mdot(h, w0[:feat]) + mdot(prev, w0[feat:])
            h = jnp.maximum(lin + next_bias(), 0.0)
        else:
            h = jnp.maximum(dot(h, m, s) + next_bias(), 0.0)
        skips.append(h)
    gate_x = h
    m, s = next_mat()
    gate_h = jnp.maximum(dot(hx, m, s) + next_bias(), 0.0)
    i_r, i_i, i_n = (gate_x[:, :n], gate_x[:, n:2 * n], gate_x[:, 2 * n:])
    h_r, h_i, h_n = (gate_h[:, :n], gate_h[:, n:2 * n], gate_h[:, 2 * n:])
    inputgate = jax.nn.sigmoid(i_i + h_i)
    resetgate = jax.nn.sigmoid(i_r + h_r)
    newgate = jnp.tanh(i_n + resetgate * h_n)
    hi = newgate + inputgate * (hx - newgate)
    h = hi
    for i in range(L):
        m, s = next_mat()
        out = dot(h, m, s) + next_bias()
        if skip_flags[i]:
            m2, s2 = next_mat()
            out = out + dot(skips[L - i], m2, s2)
        h = jnp.maximum(out, 0.0) if i != L - 1 else out
    return h, hi
