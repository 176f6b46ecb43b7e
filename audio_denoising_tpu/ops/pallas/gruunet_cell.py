"""Fused GRUUNet cell as ONE Pallas TPU kernel.

Executes the whole matrixized cell (runtime/plan.py: encoder matmul chain,
GRU gating, decoder with split skip matmuls) inside a single kernel, grid
over stream-batch tiles:

- all plan weights (~4 MB fp32 for the shipped GRUUNet2 config) are
  VMEM-resident operands with constant index maps — fetched once, reused
  by every batch tile;
- per-tile activations live entirely in VMEM/registers: one HBM read of
  x/hx and one write of y/hx' per tile is the only traffic, vs ~60
  intermediate HBM round trips in the op-by-op reference graph;
- the matmul chain runs on the MXU (`preferred_element_type=float32`),
  gate arithmetic on the VPU, with no kernel-launch boundaries between.

Reference semantics: gruunet2.py:228-244 (via the probed plan, so padding/
stride/output_padding behavior is inherited exactly).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def make_fused_cell(plan, interpret: bool = False, block_b: int = 128):
    """-> ``cell(x (B, F), hx (B, H)) -> (y (B, F), hx' (B, H))``, or for
    delta plans (MOMO3) ``cell(x, hx, prev) -> (y, hx')`` (the caller
    carries prev' = x).

    B is padded to a multiple of ``block_b`` internally (zeros rows are
    computed and discarded; the weights make that cheap)."""
    L = len(plan.down_mats)
    n = plan.hidden * plan.compressed
    delta = plan.delta
    f_in = plan.down_mats[0].shape[0] // (2 if delta else 1)
    f_out = plan.up_h_mats[-1].shape[1]

    # Flatten weights in a fixed order; biases as (1, n) rows (TPU wants
    # >=2D operands).
    weights = []
    for m, b in zip(plan.down_mats, plan.down_biases):
        weights += [m, b[None, :]]
    weights += [plan.reset_mat, plan.reset_bias[None, :]]
    skip_flags = []
    for i in range(L):
        weights += [plan.up_h_mats[i], plan.up_biases[i][None, :]]
        if plan.up_s_mats[i] is not None:
            weights.append(plan.up_s_mats[i])
            skip_flags.append(True)
        else:
            skip_flags.append(False)

    def kernel(x_ref, hx_ref, *refs):
        y_ref, hxo_ref = refs[-2], refs[-1]
        if delta:
            prev_ref, refs = refs[0], refs[1:]
            y_ref, hxo_ref = refs[-2], refs[-1]
        w = list(refs[:-2])
        wi = 0

        def dot(a, m_ref):
            # HIGHEST: default bf16 MXU passes cost ~1e-2 through the
            # matmul chain (see fused_hop.py)
            return jnp.dot(a, m_ref[:], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        h = x_ref[:]
        skips = [h]
        for i in range(L):
            if i == 0 and delta:
                # joint-affine level 0: split the 2F-row matrix instead of
                # materializing concat(x, prev)
                w0 = w[0][:]
                h = jnp.maximum(
                    jnp.dot(h, w0[:f_in],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    + jnp.dot(prev_ref[:], w0[f_in:],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                    + w[1][0], 0.0)
                wi += 2
            else:
                h = jnp.maximum(dot(h, w[wi]) + w[wi + 1][0], 0.0)
                wi += 2
            skips.append(h)

        gate_x = h
        gate_h = jnp.maximum(dot(hx_ref[:], w[wi]) + w[wi + 1][0], 0.0)
        wi += 2

        hx = hx_ref[:]
        i_r, i_i, i_n = gate_x[:, :n], gate_x[:, n:2 * n], gate_x[:, 2 * n:]
        h_r, h_i, h_n = gate_h[:, :n], gate_h[:, n:2 * n], gate_h[:, 2 * n:]
        inputgate = jax.nn.sigmoid(i_i + h_i)
        resetgate = jax.nn.sigmoid(i_r + h_r)
        newgate = jnp.tanh(i_n + resetgate * h_n)
        hi = newgate + inputgate * (hx - newgate)
        hxo_ref[:] = hi

        h = hi
        for i in range(L):
            out = dot(h, w[wi]) + w[wi + 1][0]
            wi += 2
            if skip_flags[i]:
                out = out + dot(skips[L - i], w[wi])
                wi += 1
            h = jnp.maximum(out, 0.0) if i != L - 1 else out
        y_ref[:] = h

    def cell(x: jnp.ndarray, hx: jnp.ndarray,
             prev: jnp.ndarray = None):
        b = x.shape[0]
        bp = _round_up(b, block_b)
        if bp != b:
            x = jnp.pad(x, ((0, bp - b), (0, 0)))
            hx = jnp.pad(hx, ((0, bp - b), (0, 0)))
            if delta:
                prev = jnp.pad(prev, ((0, bp - b), (0, 0)))
        grid = (bp // block_b,)

        batch_spec = lambda width: pl.BlockSpec(
            (block_b, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
        weight_specs = [
            pl.BlockSpec(wt.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for wt in weights
        ]
        extra = [prev] if delta else []
        extra_specs = [batch_spec(f_in)] if delta else []
        y, hxo = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[batch_spec(f_in), batch_spec(hx.shape[1])]
            + extra_specs + weight_specs,
            out_specs=(batch_spec(f_out), batch_spec(hx.shape[1])),
            out_shape=(
                jax.ShapeDtypeStruct((bp, f_out), jnp.float32),
                jax.ShapeDtypeStruct((bp, hx.shape[1]), jnp.float32),
            ),
            interpret=interpret,
        )(x, hx, *extra, *weights)
        if bp != b:
            y, hxo = y[:b], hxo[:b]
        return y, hxo

    return cell
