"""Self-contained ONNX reader + executor (no onnx/onnxruntime deps).

The reference ships single-cell-step ONNX exports of the MOMO2 model
(``my_model.onnx`` == ``momo2_01.onnx``, ``momo2_02.onnx`` with explicit
``hx``/``h0`` state IO — SURVEY §2 #24); they are the numeric parity
target for the MOMO family (BASELINE config 4). Neither the onnx package
nor onnxruntime exists in this environment, so this module implements

- a minimal protobuf wire-format decoder for the ModelProto subset the
  exports use (graph, nodes, attributes, initializers, value infos), and
- a small eager executor over jax.numpy for the exported op set
  (Conv, ConvTranspose, Relu/Sigmoid/Tanh, Concat/Split/Slice, shape ops).

This doubles as a generic "run a small ONNX graph" capability for
checkpoint-free model interchange.
"""

import struct
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np

# ----------------------------------------------------------------------------
# protobuf wire decoding
# ----------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) triples."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
           7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64}


class Tensor(NamedTuple):
    name: str
    array: np.ndarray


def _parse_tensor(buf: bytes) -> Tensor:
    dims: List[int] = []
    dtype = 1
    name = ""
    raw = b""
    floats: List[float] = []
    ints: List[int] = []
    for field, wire, val in _fields(buf):
        if field == 1:
            if wire == 0:
                dims.append(val)
            else:  # packed
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    dims.append(v)
        elif field == 2:
            dtype = val
        elif field == 4:   # float_data
            if wire == 2:
                floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
            else:
                floats.append(struct.unpack("<f", val)[0])
        elif field == 7:   # int64_data (sign-extend: negatives are 10-byte
            # varints encoding v + 2^64)
            if wire == 2:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    ints.append(v - (1 << 64) if v >= (1 << 63) else v)
            else:
                ints.append(val - (1 << 64) if val >= (1 << 63) else val)
        elif field == 8:
            name = val.decode()
        elif field == 9:
            raw = val
    np_dtype = _DTYPES.get(dtype, np.float32)
    if raw:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif ints:
        arr = np.asarray(ints, np.int64)
    else:
        arr = np.zeros(0, np_dtype)
    return Tensor(name, arr.reshape(dims) if dims else arr.reshape(()))


class Attribute(NamedTuple):
    name: str
    value: Any


def _parse_attribute(buf: bytes) -> Attribute:
    name = ""
    f = i = s = t = None
    floats: List[float] = []
    ints: List[int] = []
    for field, wire, val in _fields(buf):
        if field == 1:
            name = val.decode()
        elif field == 2:
            f = struct.unpack("<f", val)[0]
        elif field == 3:
            i = val - (1 << 64) if val >= (1 << 63) else val
        elif field == 4:
            s = val.decode(errors="replace")
        elif field == 5:
            t = _parse_tensor(val).array
        elif field == 7:
            if wire == 2:
                floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
            else:
                floats.append(struct.unpack("<f", val)[0])
        elif field == 8:
            if wire == 2:
                p = 0
                while p < len(val):
                    v, p = _read_varint(val, p)
                    ints.append(v - (1 << 64) if v >= (1 << 63) else v)
            else:
                ints.append(val - (1 << 64) if val >= (1 << 63) else val)
    for v in (t, s, f, i):
        if v is not None:
            return Attribute(name, v)
    if ints:
        return Attribute(name, ints)
    if floats:
        return Attribute(name, floats)
    return Attribute(name, None)


class Node(NamedTuple):
    op_type: str
    name: str
    inputs: Tuple[str, ...]
    outputs: Tuple[str, ...]
    attrs: Dict[str, Any]


class Graph(NamedTuple):
    nodes: List[Node]
    initializers: Dict[str, np.ndarray]
    inputs: List[Tuple[str, Optional[Tuple[int, ...]]]]
    outputs: List[str]


def _parse_value_info(buf: bytes) -> Tuple[str, Optional[Tuple[int, ...]]]:
    name = ""
    shape = None
    for field, _w, val in _fields(buf):
        if field == 1:
            name = val.decode()
        elif field == 2:  # TypeProto
            for f2, _w2, v2 in _fields(val):
                if f2 == 1:  # tensor_type
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 2:  # shape
                            dims = []
                            for f4, _w4, v4 in _fields(v3):
                                if f4 == 1:  # dim
                                    dv = 0
                                    for f5, _w5, v5 in _fields(v4):
                                        if f5 == 1:
                                            dv = v5
                                    dims.append(dv)
                            shape = tuple(dims)
    return name, shape


def _parse_node(buf: bytes) -> Node:
    inputs: List[str] = []
    outputs: List[str] = []
    name = op = ""
    attrs: Dict[str, Any] = {}
    for field, _w, val in _fields(buf):
        if field == 1:
            inputs.append(val.decode())
        elif field == 2:
            outputs.append(val.decode())
        elif field == 3:
            name = val.decode()
        elif field == 4:
            op = val.decode()
        elif field == 5:
            a = _parse_attribute(val)
            attrs[a.name] = a.value
    return Node(op, name, tuple(inputs), tuple(outputs), attrs)


def parse_onnx(path: str) -> Graph:
    with open(path, "rb") as f:
        data = f.read()
    graph_buf = None
    for field, _w, val in _fields(data):
        if field == 7:       # ModelProto.graph
            graph_buf = val
    if graph_buf is None:
        raise ValueError(f"{path}: no graph found")
    nodes, inits, inputs, outputs = [], {}, [], []
    for field, _w, val in _fields(graph_buf):
        if field == 1:
            nodes.append(_parse_node(val))
        elif field == 5:
            t = _parse_tensor(val)
            inits[t.name] = t.array
        elif field == 11:
            inputs.append(_parse_value_info(val))
        elif field == 12:
            outputs.append(_parse_value_info(val)[0])
    return Graph(nodes, inits, inputs, outputs)


# --------------------------------------------------------------------------
# executor
# --------------------------------------------------------------------------


def run_graph(graph: Graph, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Eager-execute the graph with numpy/jax ops; returns outputs dict."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    env: Dict[str, Any] = dict(graph.initializers)
    env.update(feeds)

    def conv(x, w, b, attrs, transpose=False):
        x = jnp.asarray(x, jnp.float32)
        w = jnp.asarray(w, jnp.float32)
        dil = attrs.get("dilations")
        if dil is not None and any(d != 1 for d in dil):
            raise NotImplementedError(f"ONNX conv dilations {dil}")
        if attrs.get("auto_pad") not in (None, "NOTSET"):
            raise NotImplementedError(
                f"ONNX conv auto_pad {attrs['auto_pad']!r}")
        group = attrs.get("group", 1)
        if transpose and group != 1:
            raise NotImplementedError("grouped ONNX ConvTranspose")
        strides = tuple(attrs.get("strides", [1] * (x.ndim - 2)))
        pads = attrs.get("pads")
        rank = x.ndim - 2
        if pads is None:
            padding = [(0, 0)] * rank
        else:
            padding = [(pads[i], pads[i + rank]) for i in range(rank)]
        if transpose:
            out_pad = tuple(attrs.get("output_padding", [0] * rank))
            # ONNX ConvTranspose == gradient of conv: lax with lhs dilation
            padding_t = [
                (w.shape[2 + i] - 1 - padding[i][0],
                 w.shape[2 + i] - 1 - padding[i][1] + out_pad[i])
                for i in range(rank)
            ]
            y = lax.conv_general_dilated(
                x, jnp.flip(w, axis=tuple(range(2, w.ndim))).swapaxes(0, 1),
                window_strides=(1,) * rank, padding=padding_t,
                lhs_dilation=strides,
                dimension_numbers=_dims(rank))
        else:
            y = lax.conv_general_dilated(
                x, w, window_strides=strides, padding=padding,
                feature_group_count=group,
                dimension_numbers=_dims(rank))
        if b is not None:
            y = y + jnp.asarray(b, jnp.float32).reshape(
                (1, -1) + (1,) * rank)
        return y

    def _dims(rank):
        s = "".join(chr(ord("X") + i) for i in range(rank))  # X, Y
        return (f"NC{s}", f"OI{s}", f"NC{s}")

    for node in graph.nodes:
        ins = [env[i] if i else None for i in node.inputs]
        op = node.op_type
        a = node.attrs
        if op == "Conv":
            out = conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
        elif op == "ConvTranspose":
            out = conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a,
                       transpose=True)
        elif op == "Relu":
            out = jnp.maximum(ins[0], 0)
        elif op == "PRelu":
            x_, slope = jnp.asarray(ins[0]), jnp.asarray(ins[1])
            # unidirectional broadcast from the channel axis (ONNX spec);
            # our exports use a scalar/(1,) slope, which broadcasts plainly
            if slope.ndim not in (0, 1) and slope.ndim != x_.ndim:
                slope = slope.reshape((1, -1) + (1,) * (x_.ndim - 2))
            out = jnp.maximum(x_, 0) + slope * jnp.minimum(x_, 0)
        elif op == "BatchNormalization":
            # inference mode: stored running statistics
            x_ = jnp.asarray(ins[0], jnp.float32)
            scale, bias, mean, var = (jnp.asarray(v, jnp.float32)
                                      for v in ins[1:5])
            eps = a.get("epsilon", 1e-5)
            shp = (1, -1) + (1,) * (x_.ndim - 2)
            # lax.rsqrt: bit-identical to models/trunet.batch_norm_1d
            out = (x_ - mean.reshape(shp)) \
                * lax.rsqrt(var.reshape(shp) + eps) \
                * scale.reshape(shp) + bias.reshape(shp)
        elif op == "GRU":
            # torch-semantics GRU (linear_before_reset=1): X (T, B, I),
            # W (D, 3H, I), R (D, 3H, H), B (D, 6H) in ONNX gate order
            # z, r, h. Gate math mirrors models/gru.gru_cell expression
            # for expression so round-trips are bit-exact.
            X = jnp.asarray(ins[0], jnp.float32)
            W = jnp.asarray(ins[1], jnp.float32)
            Rm = jnp.asarray(ins[2], jnp.float32)
            hidden = a["hidden_size"]
            if a.get("linear_before_reset", 0) != 1:
                raise NotImplementedError(
                    "ONNX GRU with linear_before_reset=0 (torch exports "
                    "use 1)")
            n_dir = W.shape[0]
            Bv = (jnp.asarray(ins[3], jnp.float32)
                  if len(ins) > 3 and ins[3] is not None
                  else jnp.zeros((n_dir, 6 * hidden), jnp.float32))
            direction = a.get("direction", "forward")
            T, Bsz, _ = X.shape
            ys = []
            h_fin = []
            # delegate to models/gru.gru_layer (ONNX z,r,h rows reordered
            # back to torch r,z,n): the scan-compiled body is the same
            # XLA computation the jax models run, so round trips are
            # bit-exact (an eager per-step loop differs by ~1 ulp/step
            # from the fused scan body)
            from audio_denoising_tpu.models.gru import gru_layer
            H = hidden
            rzn = lambda m: jnp.concatenate([m[H:2 * H], m[:H], m[2 * H:]])
            for d in range(n_dir):
                rev = (direction == "reverse") or d == 1
                w_ih, w_hh = rzn(W[d]), rzn(Rm[d])
                b_ih, b_hh = rzn(Bv[d][:3 * H]), rzn(Bv[d][3 * H:])
                xbtc = jnp.swapaxes(X, 0, 1)        # (B, T, I)
                ybtc, h = gru_layer(xbtc, jnp.zeros((Bsz, H), jnp.float32),
                                    w_ih, b_ih, w_hh, b_hh, reverse=rev)
                ys.append(jnp.swapaxes(ybtc, 0, 1))  # (T, B, H)
                h_fin.append(h)
            Y = jnp.stack(ys, axis=1)               # (T, D, B, H)
            env[node.outputs[0]] = Y
            if len(node.outputs) > 1 and node.outputs[1]:
                env[node.outputs[1]] = jnp.stack(h_fin)   # (D, B, H)
            continue
        elif op == "InstanceNormalization":
            x_ = jnp.asarray(ins[0], jnp.float32)
            scale = jnp.asarray(ins[1], jnp.float32)
            bias = jnp.asarray(ins[2], jnp.float32)
            eps = a.get("epsilon", 1e-5)
            axes = tuple(range(2, x_.ndim))
            mean = x_.mean(axis=axes, keepdims=True)
            var = ((x_ - mean) ** 2).mean(axis=axes, keepdims=True)
            shp = (1, -1) + (1,) * (x_.ndim - 2)
            # lax.rsqrt: bit-identical to models/unet2d.instance_norm_2d
            out = (x_ - mean) * lax.rsqrt(var + eps) * scale.reshape(shp) \
                + bias.reshape(shp)
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + jnp.exp(-jnp.asarray(ins[0])))
        elif op == "Tanh":
            out = jnp.tanh(jnp.asarray(ins[0]))
        elif op == "Add":
            out = jnp.asarray(ins[0]) + jnp.asarray(ins[1])
        elif op == "Sub":
            out = jnp.asarray(ins[0]) - jnp.asarray(ins[1])
        elif op == "Mul":
            out = jnp.asarray(ins[0]) * jnp.asarray(ins[1])
        elif op == "Concat":
            out = jnp.concatenate([jnp.asarray(x) for x in ins],
                                  axis=a.get("axis", 0))
        elif op == "Split":
            axis = a.get("axis", 0)
            if len(ins) > 1 and ins[1] is not None:
                sizes = np.asarray(ins[1]).tolist()
            else:
                sizes = a.get("split")
            if sizes:
                idx = np.cumsum(sizes)[:-1].tolist()
            else:
                k = len(node.outputs)
                idx = [(np.asarray(ins[0]).shape[axis] // k) * (i + 1)
                       for i in range(k - 1)]
            parts = jnp.split(jnp.asarray(ins[0]), idx, axis=axis)
            for nm, pt in zip(node.outputs, parts):
                env[nm] = pt
            continue
        elif op == "Slice":
            data = jnp.asarray(ins[0])
            starts = np.asarray(ins[1]).tolist()
            ends = np.asarray(ins[2]).tolist()
            axes = (np.asarray(ins[3]).tolist() if len(ins) > 3 and
                    ins[3] is not None else list(range(len(starts))))
            steps = (np.asarray(ins[4]).tolist() if len(ins) > 4 and
                     ins[4] is not None else [1] * len(starts))
            sl = [slice(None)] * data.ndim
            for st, en, ax, sp in zip(starts, ends, axes, steps):
                sl[ax] = slice(int(st), int(en), int(sp))
            out = data[tuple(sl)]
        elif op == "Squeeze":
            axes = (np.asarray(ins[1]).tolist() if len(ins) > 1 and
                    ins[1] is not None else a.get("axes"))
            out = jnp.squeeze(jnp.asarray(ins[0]),
                              axis=tuple(int(x) for x in axes)
                              if axes else None)
        elif op == "Unsqueeze":
            axes = (np.asarray(ins[1]).tolist() if len(ins) > 1 and
                    ins[1] is not None else a.get("axes"))
            out = jnp.asarray(ins[0])
            for ax in sorted(int(x) for x in axes):
                out = jnp.expand_dims(out, ax)
        elif op == "Transpose":
            out = jnp.transpose(jnp.asarray(ins[0]), axes=a.get("perm"))
        elif op == "Gather":
            out = jnp.take(jnp.asarray(ins[0]), jnp.asarray(ins[1]),
                           axis=a.get("axis", 0))
        elif op == "Shape":
            out = np.asarray(np.shape(ins[0]), np.int64)
        elif op == "Constant":
            out = a.get("value")
        elif op == "Cast":
            to = a.get("to", 1)
            out = jnp.asarray(ins[0]).astype(_DTYPES.get(to, np.float32))
        elif op == "Identity":
            out = ins[0]
        elif op == "Div":
            x0, x1 = jnp.asarray(ins[0]), jnp.asarray(ins[1])
            if (np.issubdtype(np.asarray(ins[0]).dtype, np.integer)
                    and np.issubdtype(np.asarray(ins[1]).dtype, np.integer)):
                # ONNX integer Div truncates TOWARD ZERO (unlike Python //,
                # which floors: -7 // 2 == -4 but ONNX gives -3)
                out = (jnp.sign(x0) * jnp.sign(x1)
                       * (jnp.abs(x0) // jnp.abs(x1))).astype(x0.dtype)
            else:
                out = x0 / x1
        elif op == "Pow":
            out = jnp.power(jnp.asarray(ins[0], jnp.float32),
                            jnp.asarray(ins[1], jnp.float32))
        elif op == "Exp":
            out = jnp.exp(jnp.asarray(ins[0]))
        elif op == "Equal":
            out = jnp.asarray(ins[0]) == jnp.asarray(ins[1])
        elif op == "Where":
            out = jnp.where(jnp.asarray(ins[0]), jnp.asarray(ins[1]),
                            jnp.asarray(ins[2]))
        elif op == "Expand":
            shape = [int(x) for x in np.asarray(ins[1])]
            data = jnp.asarray(ins[0])
            # ONNX Expand: dims of 1 broadcast; -1/smaller keep input dim
            target = list(np.broadcast_shapes(tuple(data.shape),
                                              tuple(shape)))
            out = jnp.broadcast_to(data, target)
        elif op == "ConstantOfShape":
            shape = [int(x) for x in np.asarray(ins[0])]
            value = a.get("value")
            fill = (np.asarray(value).reshape(-1)[0]
                    if value is not None else 0.0)
            out = jnp.full(shape, fill)
        elif op == "Reshape":
            out = jnp.reshape(jnp.asarray(ins[0]),
                              [int(x) for x in np.asarray(ins[1])])
        else:
            raise NotImplementedError(f"ONNX op {op} ({node.name})")
        env[node.outputs[0]] = out

    return {name: np.asarray(env[name]) for name in graph.outputs}


# -----------------------------------------------------------------------------
# MOMO-cell parity helpers (reference exports momo2_01/02.onnx)
# -----------------------------------------------------------------------------


def momo_config_from_onnx(graph: Graph):
    """Reconstruct (ModelConfig, num_bins) for the exported MOMO2 cell from
    the graph's conv nodes + initializer shapes (initializer names equal
    the torch state-dict keys, so weights drop straight into our params)."""
    from audio_denoising_tpu.config import ModelConfig

    downs = sorted(
        (n for n in graph.nodes
         if n.op_type == "Conv" and "/input_gate/downs." in n.name),
        key=lambda n: n.name)
    strides, paddings, kernels, hidden = [], [], [], []
    for n in downs:
        strides.append(n.attrs["strides"][0])
        paddings.append(n.attrs["pads"][0])
        kernels.append(n.attrs["kernel_shape"][0])
        hidden.append(graph.initializers[n.inputs[1]].shape[0])
    hidden[-1] //= 3                      # last level emits 3x gate channels
    num_bins = next(s[-1] for name, s in graph.inputs
                    if name == "input" and s)
    cfg = ModelConfig(
        arch="MOMO2", in_size=1,
        hidden_sizes=tuple(hidden), kernel_sizes=tuple(kernels),
        strides=tuple(strides), paddings=tuple(paddings),
        num_compressed_bins=_down_out(num_bins, kernels, strides, paddings),
        num_gaussians=_onnx_num_gaussians(graph))
    return cfg, num_bins


def _down_out(n, ks, ss, ps):
    for k, s, p in zip(ks, ss, ps):
        n = (n + 2 * p - k) // s + 1
    return n


def _onnx_num_gaussians(graph: Graph) -> int:
    """The smearing channel count = conv0 in_channels - model in_size."""
    for n in graph.nodes:
        if n.op_type == "Conv" and "/input_gate/downs.0/" in n.name:
            return graph.initializers[n.inputs[1]].shape[1] - 1
    return 6


def onnx_params(graph: Graph) -> Dict[str, np.ndarray]:
    """Initializers whose names are torch state-dict keys -> params dict."""
    return {k: np.asarray(v, np.float32)
            for k, v in graph.initializers.items() if k.startswith("cell.")}
