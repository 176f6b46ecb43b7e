"""Convolution primitives with PyTorch calling conventions.

The model zoo's encoders/decoders are built from nn.Conv1d/ConvTranspose1d
(gruunet2.py:71-96) and nn.Conv2d/ConvTranspose2d (unet4.py:211-248). These
wrappers keep PyTorch's (N, C, spatial...) layout and weight shapes so that
imported ``.pth`` weights drop in unchanged, while lowering to
``lax.conv_general_dilated`` — which XLA tiles onto the MXU.

ConvTranspose's ``output_size`` ambiguity (SURVEY §7 hard-part #4): PyTorch
resolves the output length at call time via an output_padding computed from
the skip tensor's length (gruunet2.py:91, momo3.py:93). Shapes here are
static per config, so ``transpose_output_padding`` computes that padding at
trace time and the kernel lowers to a single dilated convolution.
"""

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOrPair = Union[int, Tuple[int, ...], Sequence[int]]


def _pair(v: IntOrPair, n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    t = tuple(int(x) for x in v)
    assert len(t) == n, (v, n)
    return t


def transpose_output_padding(in_size: int, out_size: int, kernel: int,
                             stride: int, padding: int, dilation: int = 1) -> int:
    """The output_padding PyTorch infers from ConvTranspose's output_size."""
    base = (in_size - 1) * stride - 2 * padding + dilation * (kernel - 1) + 1
    op = out_size - base
    if not (0 <= op < max(stride, dilation)):
        raise ValueError(
            f"requested output size {out_size} unreachable from input {in_size} "
            f"(k={kernel}, s={stride}, p={padding}, d={dilation}; base {base})")
    return op


def conv1d(x: jnp.ndarray, weight: jnp.ndarray, bias=None,
           stride: int = 1, padding: int = 0, dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """x: (N, C_in, L); weight: (C_out, C_in/groups, K) — nn.Conv1d."""
    out = lax.conv_general_dilated(
        x, weight,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv_transpose1d(x: jnp.ndarray, weight: jnp.ndarray, bias=None,
                     stride: int = 1, padding: int = 0, output_padding: int = 0,
                     dilation: int = 1) -> jnp.ndarray:
    """x: (N, C_in, L); weight: (C_in, C_out, K) — nn.ConvTranspose1d.

    Implemented as the gradient convolution: input dilated by ``stride``,
    kernel flipped, padding (d*(K-1) - p) with output_padding on the right.
    """
    k = weight.shape[-1]
    w = jnp.flip(weight, axis=-1).swapaxes(0, 1)  # (C_out, C_in, K)
    lo = dilation * (k - 1) - padding
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(lo, lo + output_padding)],
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def conv2d(x: jnp.ndarray, weight: jnp.ndarray, bias=None,
           stride: IntOrPair = 1, padding: IntOrPair = 0,
           dilation: IntOrPair = 1, groups: int = 1) -> jnp.ndarray:
    """x: (N, C_in, H, W); weight: (C_out, C_in/groups, KH, KW) — nn.Conv2d."""
    s, p, d = _pair(stride, 2), _pair(padding, 2), _pair(dilation, 2)
    out = lax.conv_general_dilated(
        x, weight,
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        rhs_dilation=d,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def conv_transpose2d(x: jnp.ndarray, weight: jnp.ndarray, bias=None,
                     stride: IntOrPair = 1, padding: IntOrPair = 0,
                     output_padding: IntOrPair = 0,
                     dilation: IntOrPair = 1) -> jnp.ndarray:
    """x: (N, C_in, H, W); weight: (C_in, C_out, KH, KW) — nn.ConvTranspose2d."""
    s, p, op, d = (_pair(stride, 2), _pair(padding, 2),
                   _pair(output_padding, 2), _pair(dilation, 2))
    kh, kw = weight.shape[-2:]
    w = jnp.flip(weight, axis=(-2, -1)).swapaxes(0, 1)
    lo_h = d[0] * (kh - 1) - p[0]
    lo_w = d[1] * (kw - 1) - p[1]
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=[(lo_h, lo_h + op[0]), (lo_w, lo_w + op[1])],
        lhs_dilation=s,
        rhs_dilation=d,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out
