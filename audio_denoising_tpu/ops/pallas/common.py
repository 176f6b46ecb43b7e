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


def pack_plan_weights(plan) -> Tuple[List, List[bool]]:
    """Flatten a CellPlan into the kernel operand list (fixed order:
    down (mat, bias) pairs, reset (mat, bias), up (mat, bias[, skip_mat])
    per level) + the per-level skip flags. Biases become (1, n) rows (TPU
    wants >= 2-D operands)."""
    weights = []
    for m, b in zip(plan.down_mats, plan.down_biases):
        weights += [m, b[None, :]]
    weights += [plan.reset_mat, plan.reset_bias[None, :]]
    skip_flags = []
    L = len(plan.down_mats)
    for i in range(L):
        weights += [plan.up_h_mats[i], plan.up_biases[i][None, :]]
        if plan.up_s_mats[i] is not None:
            weights.append(plan.up_s_mats[i])
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
    fp32 accumulate — the reduced-precision serving variant."""
    L = len(skip_flags)
    bf = compute_dtype is not None and \
        jnp.dtype(compute_dtype) != jnp.dtype(jnp.float32)

    def mdot(a, m):
        if bf:
            return jnp.dot(a.astype(jnp.bfloat16), m,
                           preferred_element_type=jnp.float32)
        return hdot(a, m)

    def dot(a, b):
        return mdot(a, b[:] if hasattr(b, "shape") else b)

    wi = 0
    h = x
    skips = [h]
    for i in range(L):
        if i == 0 and delta:
            # level 0 is affine in (x, prev) jointly — split the 2F-row
            # matrix instead of materializing cat(x, prev)
            w0 = w[0][:]
            h = jnp.maximum(mdot(h, w0[:feat]) + mdot(prev, w0[feat:])
                            + w[1][0], 0.0)
        else:
            h = jnp.maximum(dot(h, w[wi]) + w[wi + 1][0], 0.0)
        wi += 2
        skips.append(h)
    gate_x = h
    gate_h = jnp.maximum(dot(hx, w[wi]) + w[wi + 1][0], 0.0)
    wi += 2
    i_r, i_i, i_n = (gate_x[:, :n], gate_x[:, n:2 * n], gate_x[:, 2 * n:])
    h_r, h_i, h_n = (gate_h[:, :n], gate_h[:, n:2 * n], gate_h[:, 2 * n:])
    inputgate = jax.nn.sigmoid(i_i + h_i)
    resetgate = jax.nn.sigmoid(i_r + h_r)
    newgate = jnp.tanh(i_n + resetgate * h_n)
    hi = newgate + inputgate * (hx - newgate)
    h = hi
    for i in range(L):
        out = dot(h, w[wi]) + w[wi + 1][0]
        wi += 2
        if skip_flags[i]:
            out = out + dot(skips[L - i], w[wi])
            wi += 1
        h = jnp.maximum(out, 0.0) if i != L - 1 else out
    return h, hi
