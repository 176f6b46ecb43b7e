"""Tensor-parallel serving of the matrixized cell plan.

Megatron-style sharding of the CellPlan's dense level matrices over a
device mesh axis (the scaling-book recipe: pick a mesh, shard the
weights, let collectives ride ICI):

- **col** levels split the matrix's OUTPUT columns across devices — no
  collective; the level's activation comes out feature-sharded;
- **row** levels split the INPUT rows — each device contributes a
  partial product and one ``psum`` over the axis restores the full
  activation (the bias is added once, post-psum);
- alternating col→row pairs the two so the intermediate never leaves
  the device (one psum per pair, the classic Megatron MLP block).

The U-Net skip topology cooperates: for even level counts the skip a
row-sharded decoder level consumes is exactly the feature-sharded
output of the matching col-sharded encoder level (same contiguous
block partition), and the skip a col-sharded level consumes is full —
no extra gathers. Odd level counts (the d5 preset) get one
``all_gather`` where the parity breaks. Levels whose dimensions don't
divide the axis fall back to replicated compute (full matrix on every
device, no collective) — correctness never depends on divisibility.

The GRU gate arithmetic, the reset-gate matmul (hidden*comp square-ish,
tiny) and the carried ``hx`` stay replicated: the recurrence is the
latency-critical serial core, and its elementwise cost is noise next to
the level matmuls this shards.

Why: a wide plan (hidden 64 x mel-128 = 137 MB fp32) exceeds a single
v5e's VMEM for the fused kernel and pays HBM streaming op-by-op; over a
TP axis each device holds 1/D of the level weights, restoring VMEM
residency for arbitrarily wide checkpoints — and the per-hop collectives
are (B, few-hundred-float) rows on ICI. Reference counterpart: none
(torch serving is single-GPU, server.py:178-227); this is the TPU-native
scaling path for the serving cell.
"""

from typing import List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map as _shard_map
import inspect

from audio_denoising_tpu.runtime.plan import CellPlan

_CHECK_KW = ({"check_vma": False}
             if "check_vma" in inspect.signature(_shard_map).parameters
             else {"check_rep": False})


class _Level(NamedTuple):
    mode: str                 # 'col' | 'row' | 'rep'
    mat: jnp.ndarray          # col/row: (D, rows, cols) stacked; rep: full
    bias: jnp.ndarray         # col: (D, cols/D); row/rep: full (post-psum)
    s_mat: Optional[jnp.ndarray] = None   # decoder skip part, same mode


def _split_cols(mat: np.ndarray, D: int) -> np.ndarray:
    return np.stack(np.split(mat, D, axis=-1))        # (D, rows, cols/D)


def _split_rows(mat: np.ndarray, D: int) -> np.ndarray:
    return np.stack(np.split(mat, D, axis=0))         # (D, rows/D, cols)


def _plan_levels(plan: CellPlan, D: int):
    """Assign col/row/rep modes to encoder and decoder levels.

    Greedy alternation starting col; a level falls back to 'rep' when
    the required split doesn't divide D or (for col) its input/skip is
    sharded. Returns (down_modes, up_modes)."""
    down, state = [], "full"      # parity of the flowing activation
    skip_state = ["full"]         # parity of each saved skip (index 0 = x)
    for m in plan.down_mats:
        rows, cols = int(m.shape[0]), int(m.shape[1])
        if state == "full" and cols % D == 0:
            down.append("col")
            state = "shard"
        elif rows % D == 0:
            # row-sharding accepts full input (each device slices its
            # row block locally) or matching col-sharded input
            down.append("row")
            state = "full"
        else:
            if state == "shard":
                down.append("gather-row")   # gather input, then replicate
            else:
                down.append("rep")
            state = "full"
        skip_state.append(state)
    # the GRU gates need the full (B, 3n) vector
    gates_gather = state == "shard"

    up, state = [], "full"        # hi is replicated after gating
    L = len(plan.up_h_mats)
    for i in range(L):
        m = plan.up_h_mats[i]
        sk = plan.up_s_mats[i]
        rows, cols = int(m.shape[0]), int(m.shape[1])
        skip_par = skip_state[L - i] if sk is not None else "full"
        sk_rows_ok = sk is None or int(sk.shape[0]) % D == 0
        if state == "full" and cols % D == 0 and skip_par == "full" \
                and (sk is None or int(sk.shape[1]) == cols):
            up.append("col")
            state = "shard"
        elif rows % D == 0 and sk_rows_ok and skip_par in ("full", "shard"):
            up.append("row")
            state = "full"
        else:
            up.append("gather-row" if state == "shard" else "rep")
            state = "full"
    out_gather = state == "shard"
    return down, up, gates_gather, out_gather, skip_state


def make_tp_plan_cell(plan: CellPlan, mesh: Mesh, axis: Optional[str] = None):
    """``step(x_t (B, F), hx (B, n)) -> (y (B, F), hx')`` executing the
    plan tensor-parallel over ``mesh[axis]``; inputs/outputs replicated.

    Semantics == runtime.plan.plan_cell (parity-tested on the CPU mesh,
    tests/test_tp.py). Compose with jit; the returned callable closes
    over device-put sharded weight stacks."""
    axis = axis or mesh.axis_names[0]
    D = int(mesh.shape[axis])
    down_modes, up_modes, gates_gather, out_gather, skip_state = \
        _plan_levels(plan, D)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def _prep(mat, bias, mode):
        mat = np.asarray(mat)
        b = None if bias is None else np.asarray(bias)
        if mode == "col":
            return (jax.device_put(jnp.asarray(_split_cols(mat, D)), shard),
                    None if b is None else
                    jax.device_put(jnp.asarray(np.stack(np.split(b, D))),
                                   shard))
        if mode in ("row", "gather-row"):
            return (jax.device_put(jnp.asarray(_split_rows(mat, D)), shard),
                    None if b is None else jax.device_put(jnp.asarray(b),
                                                          repl))
        return (jax.device_put(jnp.asarray(mat), repl),
                None if b is None else jax.device_put(jnp.asarray(b), repl))

    downs = []
    for mode, m, b in zip(down_modes, plan.down_mats, plan.down_biases):
        mat, bias = _prep(m, b, mode)
        downs.append(_Level(mode, mat, bias))
    ups = []
    for i, mode in enumerate(up_modes):
        mat, bias = _prep(plan.up_h_mats[i], plan.up_biases[i], mode)
        s = plan.up_s_mats[i]
        s_mat = None
        if s is not None:
            s_mat, _ = _prep(s, None, mode)
        ups.append(_Level(mode, mat, bias, s_mat))
    reset_mat = jax.device_put(jnp.asarray(plan.reset_mat), repl)
    reset_bias = jax.device_put(jnp.asarray(plan.reset_bias), repl)
    n = plan.hidden * plan.compressed

    def _apply(lvl: _Level, h, h_par, skip=None, skip_par="full"):
        """One level on the LOCAL shard. Returns (act, parity) PRE-relu."""
        if lvl.mode == "col":
            # full input x (rows, cols/D) slice -> feature-sharded out
            out = h @ lvl.mat[0] + lvl.bias[0]
            if skip is not None:
                out = out + skip @ lvl.s_mat[0]
            return out, "shard"
        if lvl.mode in ("row", "gather-row"):
            mat = lvl.mat[0]
            rows = mat.shape[0]
            if lvl.mode == "gather-row" or h_par == "shard":
                hj = (jax.lax.all_gather(h, axis, axis=1, tiled=True)
                      if h_par == "shard" and lvl.mode == "gather-row"
                      else h)
            else:
                hj = h
            if h_par == "shard" and lvl.mode == "row":
                part = h @ mat                  # shards already match
            else:
                idx = jax.lax.axis_index(axis)
                part = jax.lax.dynamic_slice_in_dim(
                    hj, idx * rows, rows, axis=1) @ mat
            if skip is not None:
                s = lvl.s_mat[0]
                if skip_par == "shard":
                    part = part + skip @ s
                else:
                    idx = jax.lax.axis_index(axis)
                    part = part + jax.lax.dynamic_slice_in_dim(
                        skip, idx * s.shape[0], s.shape[0], axis=1) @ s
            out = jax.lax.psum(part, axis) + lvl.bias
            return out, "full"
        out = h @ lvl.mat + lvl.bias           # replicated
        if skip is not None:
            out = out + skip @ lvl.s_mat
        return out, "full"

    def local_step(x_in, hx, *weights):
        # re-wire the closed-over levels to the shard_map-local leaves
        it = iter(weights)
        loc_downs = [lvl._replace(mat=next(it),
                                  bias=None if lvl.bias is None
                                  else next(it)) for lvl in downs]
        loc_ups = []
        for lvl in ups:
            m = next(it)
            b = None if lvl.bias is None else next(it)
            s = None if lvl.s_mat is None else next(it)
            loc_ups.append(lvl._replace(mat=m, bias=b, s_mat=s))
        r_mat, r_bias = next(it), next(it)

        h, par = x_in, "full"
        skips = [(h, par)]
        for lvl in loc_downs:
            h, par = _apply(lvl, h, par)
            h = jax.nn.relu(h)
            skips.append((h, par))
        gate_x = h
        if gates_gather:
            gate_x = jax.lax.all_gather(gate_x, axis, axis=1, tiled=True)

        gate_h = jax.nn.relu(hx @ r_mat + r_bias)
        i_r, i_i, i_n = gate_x[:, :n], gate_x[:, n:2 * n], gate_x[:, 2 * n:]
        h_r, h_i, h_n = gate_h[:, :n], gate_h[:, n:2 * n], gate_h[:, 2 * n:]
        inputgate = jax.nn.sigmoid(i_i + h_i)
        resetgate = jax.nn.sigmoid(i_r + h_r)
        newgate = jnp.tanh(i_n + resetgate * h_n)
        hi = newgate + inputgate * (hx - newgate)

        L = len(loc_ups)
        ups_in = skips[:-1]
        h, par = hi, "full"
        for i, lvl in enumerate(loc_ups):
            skip, skip_par = (ups_in[L - i] if lvl.s_mat is not None
                              else (None, "full"))
            h, par = _apply(lvl, h, par, skip, skip_par)
            if i != L - 1:
                h = jax.nn.relu(h)
        if out_gather or par == "shard":
            h = jax.lax.all_gather(h, axis, axis=1, tiled=True)
        return h, hi

    # flatten weights in the same order local_step re-reads them
    flat_weights, flat_specs = [], []
    for lvl in downs + ups:
        flat_weights.append(lvl.mat)
        flat_specs.append(P(axis) if lvl.mode in ("col", "row",
                                                  "gather-row") else P())
        if lvl.bias is not None:
            flat_weights.append(lvl.bias)
            flat_specs.append(P(axis) if lvl.mode == "col" else P())
        if lvl.s_mat is not None:
            flat_weights.append(lvl.s_mat)
            flat_specs.append(P(axis) if lvl.mode in ("col", "row",
                                                      "gather-row")
                              else P())
    flat_weights += [reset_mat, reset_bias]
    flat_specs += [P(), P()]

    mapped = _shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P()) + tuple(flat_specs),
        out_specs=(P(), P()),
        **_CHECK_KW)

    def step(x_t: jnp.ndarray, hx: jnp.ndarray,
             prev: Optional[jnp.ndarray] = None):
        # delta (MOMO3) plans: level 0 is affine in (x_t, prev) jointly
        # (momo3.py:286-289) — the concat is full/replicated, so it rides
        # the same col/row schedule with 2F input rows; the caller carries
        # prev' = x_t exactly like runtime.plan.plan_cell
        if plan.delta:
            if prev is None:
                raise ValueError("delta plan: prev frame required")
            x_t = jnp.concatenate([x_t, prev], axis=-1)
        return mapped(x_t, hx, *flat_weights)

    step.modes = {"down": down_modes, "up": up_modes,
                  "gates_gather": gates_gather, "out_gather": out_gather}
    return step
