"""Minimal ONNX → JAX executor (no onnx / onnxruntime dependency).

The reference scores DNSMOS/SigMOS through onnxruntime sessions over
committed .onnx weights (separation/look2hear/metrics/dnsmos.py:22-95).
Neither onnxruntime nor the onnx package exists in this environment, so
this module parses the protobuf wire format directly (the small subset of
ModelProto/GraphProto/NodeProto/TensorProto/AttributeProto the MOS models
use) and interprets the graph with jax.numpy ops. Supported op set covers
the DNSMOS-style CNN/GRU regressors; unsupported ops raise with the op name
so coverage gaps are explicit.
"""

from __future__ import annotations

import struct
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# --- protobuf wire-format reader -------------------------------------------


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: memoryview):
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _fields(buf) -> dict[int, list]:
    out: dict[int, list] = {}
    for field, _wire, val in _iter_fields(memoryview(bytes(buf))):
        out.setdefault(field, []).append(val)
    return out


_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
           9: np.bool_, 10: np.float16, 11: np.float64}


def _parse_tensor(buf) -> tuple[str, np.ndarray]:
    f = _fields(buf)
    dims = [int(v) for v in f.get(1, [])]
    dtype = _DTYPES[int(f.get(2, [1])[0])]
    name = bytes(f.get(8, [b""])[0]).decode()
    if 9 in f:  # raw_data
        arr = np.frombuffer(bytes(f[9][0]), dtype=dtype)
    elif 4 in f:  # float_data (packed)
        arr = np.frombuffer(bytes(f[4][0]), dtype="<f4")
    elif 7 in f:  # int64_data (packed varints)
        vals = []
        mv = memoryview(bytes(f[7][0]))
        pos = 0
        while pos < len(mv):
            v, pos = _read_varint(mv, pos)
            if v >= 1 << 63:
                v -= 1 << 64
            vals.append(v)
        arr = np.array(vals, np.int64)
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims) if dims else arr


def _parse_attr(buf) -> tuple[str, object]:
    f = _fields(buf)
    name = bytes(f[1][0]).decode()
    atype = int(f.get(20, [0])[0])
    if atype == 1:  # FLOAT
        return name, struct.unpack("<f", bytes(f[2][0]))[0]
    if atype == 2:  # INT
        v = int(f[3][0])
        return name, v - (1 << 64) if v >= 1 << 63 else v
    if atype == 3:  # STRING
        return name, bytes(f[4][0]).decode()
    if atype == 4:  # TENSOR
        return name, _parse_tensor(f[5][0])[1]
    if atype == 6:  # FLOATS
        raw = bytes(f[7][0]) if 7 in f else b""
        return name, np.frombuffer(raw, "<f4").tolist()
    if atype == 7:  # INTS
        vals = []
        if 8 in f:
            for item in f[8]:
                if isinstance(item, int):
                    vals.append(item)
                else:  # packed
                    mv = memoryview(bytes(item))
                    pos = 0
                    while pos < len(mv):
                        v, pos = _read_varint(mv, pos)
                        vals.append(v - (1 << 64) if v >= 1 << 63 else v)
        return name, vals
    return name, None


def parse_onnx(path: str | Path) -> dict:
    """→ {"nodes": [...], "initializers": {name: array},
         "inputs": [names], "outputs": [names]}"""
    data = Path(path).read_bytes()
    model = _fields(data)
    graph = _fields(model[7][0])  # ModelProto.graph
    nodes = []
    for nb in graph.get(1, []):
        nf = _fields(nb)
        nodes.append(
            {
                "inputs": [bytes(v).decode() for v in nf.get(1, [])],
                "outputs": [bytes(v).decode() for v in nf.get(2, [])],
                "op": bytes(nf.get(4, [b""])[0]).decode(),
                "attrs": dict(_parse_attr(a) for a in nf.get(5, [])),
            }
        )
    inits = dict(_parse_tensor(t) for t in graph.get(5, []))

    def _vi_name(buf):
        return bytes(_fields(buf)[1][0]).decode()

    inputs = [
        n for n in (_vi_name(v) for v in graph.get(11, [])) if n not in inits
    ]
    outputs = [_vi_name(v) for v in graph.get(12, [])]
    return {"nodes": nodes, "initializers": inits, "inputs": inputs,
            "outputs": outputs}


# --- op interpreter ---------------------------------------------------------


def _pool2d(x, kshape, strides, pads, reducer, init):
    # x: (N, C, H, W); ONNX pads = [t, l, b, r]
    t_, l_, b_, r_ = (pads + [0, 0, 0, 0])[:4] if pads else (0, 0, 0, 0)
    x = jnp.pad(x, ((0, 0), (0, 0), (t_, b_), (l_, r_)),
                constant_values=init)
    return jax.lax.reduce_window(
        x, init, reducer, (1, 1, *kshape), (1, 1, *strides), "VALID"
    )


def _conv(x, w, b, attrs):
    strides = tuple(attrs.get("strides", [1] * (w.ndim - 2)))
    pads = attrs.get("pads")
    dil = tuple(attrs.get("dilations", [1] * (w.ndim - 2)))
    group = int(attrs.get("group", 1))
    spatial = w.ndim - 2
    auto = attrs.get("auto_pad")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        # Explicit asymmetric pads: ONNX puts the surplus cell at the END
        # for SAME_UPPER (== XLA "SAME") and at the BEGINNING for
        # SAME_LOWER (XLA has no equivalent string).
        padding = []
        for i in range(spatial):
            in_i = x.shape[2 + i]
            eff_k = (w.shape[2 + i] - 1) * dil[i] + 1
            total = max(
                (-(-in_i // strides[i]) - 1) * strides[i] + eff_k - in_i, 0
            )
            small, big = total // 2, total - total // 2
            padding.append(
                (small, big) if auto == "SAME_UPPER" else (big, small)
            )
    elif pads:
        padding = [(pads[i], pads[i + spatial]) for i in range(spatial)]
    else:
        padding = [(0, 0)] * spatial
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCH", "OIH", "NCH"),
    )
    out = jax.lax.conv_general_dilated(
        x, w, strides, padding, rhs_dilation=dil, dimension_numbers=dn,
        feature_group_count=group,
    )
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * spatial)
    return out


def _gemm(a, b, c, attrs):
    if attrs.get("transA"):
        a = a.T
    if attrs.get("transB"):
        b = b.T
    out = attrs.get("alpha", 1.0) * (a @ b)
    if c is not None:
        out = out + attrs.get("beta", 1.0) * c
    return out


class OnnxJaxModel:
    """Interpret a parsed ONNX graph with jax.numpy ops."""

    def __init__(self, path: str | Path):
        g = parse_onnx(path)
        self.nodes = g["nodes"]
        self.inits = {k: jnp.asarray(v) for k, v in g["initializers"].items()}
        self.input_names = g["inputs"]
        self.output_names = g["outputs"]

    def ops_used(self) -> set[str]:
        return {n["op"] for n in self.nodes}

    def __call__(self, *args):
        env: dict[str, jax.Array] = dict(self.inits)
        for name, arr in zip(self.input_names, args):
            env[name] = jnp.asarray(arr)
        for node in self.nodes:
            op = node["op"]
            ins = [env[i] if i else None for i in node["inputs"]]
            at = node["attrs"]
            if op == "Conv":
                out = _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, at)
            elif op == "Gemm":
                out = _gemm(ins[0], ins[1], ins[2] if len(ins) > 2 else None, at)
            elif op == "MatMul":
                out = ins[0] @ ins[1]
            elif op == "Relu":
                out = jax.nn.relu(ins[0])
            elif op == "Sigmoid":
                out = jax.nn.sigmoid(ins[0])
            elif op == "Tanh":
                out = jnp.tanh(ins[0])
            elif op == "Add":
                out = ins[0] + ins[1]
            elif op == "Sub":
                out = ins[0] - ins[1]
            elif op == "Mul":
                out = ins[0] * ins[1]
            elif op == "Div":
                out = ins[0] / ins[1]
            elif op == "Sqrt":
                out = jnp.sqrt(ins[0])
            elif op == "Pow":
                out = ins[0] ** ins[1]
            elif op == "Exp":
                out = jnp.exp(ins[0])
            elif op == "Log":
                out = jnp.log(ins[0])
            elif op == "Clip":
                # opset 11+: min/max are optional INPUTS 1 and 2
                lo = ins[1] if len(ins) > 1 and ins[1] is not None else at.get("min")
                hi = ins[2] if len(ins) > 2 and ins[2] is not None else at.get("max")
                out = jnp.clip(ins[0], lo, hi)
            elif op == "MaxPool":
                k = at["kernel_shape"]
                out = _pool2d(
                    ins[0], k, at.get("strides", [1] * len(k)),
                    at.get("pads"), jax.lax.max, -jnp.inf,
                )
            elif op == "AveragePool":
                k = at["kernel_shape"]
                strides = at.get("strides", [1] * len(k))
                pads = at.get("pads")
                summed = _pool2d(ins[0], k, strides, pads, jax.lax.add, 0.0)
                if pads and any(pads) and not at.get("count_include_pad", 0):
                    # ONNX default excludes padded cells from the mean:
                    # divide by the per-position count of real cells.
                    ones = jnp.ones_like(ins[0])
                    count = _pool2d(ones, k, strides, pads, jax.lax.add, 0.0)
                    out = summed / count
                else:
                    out = summed / float(np.prod(k))
            elif op == "GlobalAveragePool":
                out = jnp.mean(ins[0], axis=tuple(range(2, ins[0].ndim)),
                               keepdims=True)
            elif op == "Flatten":
                ax = at.get("axis", 1)
                out = ins[0].reshape((int(np.prod(ins[0].shape[:ax])), -1))
            elif op == "Reshape":
                shape = [int(s) for s in np.asarray(ins[1])]
                out = ins[0].reshape(
                    [ins[0].shape[i] if s == 0 else s for i, s in enumerate(shape)]
                )
            elif op == "Transpose":
                out = jnp.transpose(ins[0], at.get("perm"))
            elif op == "Concat":
                out = jnp.concatenate([i for i in ins], axis=at.get("axis", 0))
            elif op == "Squeeze":
                axes = at.get("axes")
                if axes is None and len(ins) > 1 and ins[1] is not None:
                    axes = [int(v) for v in np.asarray(ins[1])]
                if axes is None:  # axes omitted: squeeze ALL unit dims
                    axes = [i for i, s in enumerate(ins[0].shape) if s == 1]
                out = ins[0]
                for ax in sorted(axes, reverse=True):
                    out = jnp.squeeze(out, axis=ax)
            elif op == "Unsqueeze":
                axes = at.get("axes")
                if axes is None and len(ins) > 1 and ins[1] is not None:
                    axes = [int(v) for v in np.asarray(ins[1])]
                if axes is None:
                    raise ValueError("Unsqueeze node without axes")
                out = ins[0]
                for ax in sorted(axes):
                    out = jnp.expand_dims(out, axis=ax)
            elif op == "Softmax":
                out = jax.nn.softmax(ins[0], axis=at.get("axis", -1))
            elif op == "Max":
                out = ins[0]
                for other in ins[1:]:
                    out = jnp.maximum(out, other)
            elif op == "Min":
                out = ins[0]
                for other in ins[1:]:
                    out = jnp.minimum(out, other)
            elif op in ("ReduceMax", "ReduceSum", "ReduceMean"):
                # opset 18 moved axes from attribute to input 2 for all
                # Reduce* ops; absent axes means reduce everything.
                axes = at.get("axes")
                if axes is None and len(ins) > 1 and ins[1] is not None:
                    axes = np.asarray(ins[1]).tolist()
                axes = tuple(axes) if axes else None
                fn = {"ReduceMax": jnp.max, "ReduceSum": jnp.sum,
                      "ReduceMean": jnp.mean}[op]
                out = fn(ins[0], axis=axes,
                         keepdims=bool(at.get("keepdims", 1)))
            elif op == "BatchNormalization":
                x, scale, bias, mean, var = ins[:5]
                eps = at.get("epsilon", 1e-5)
                shape = (1, -1) + (1,) * (x.ndim - 2)
                out = (x - mean.reshape(shape)) / jnp.sqrt(
                    var.reshape(shape) + eps
                ) * scale.reshape(shape) + bias.reshape(shape)
            elif op == "Identity":
                out = ins[0]
            elif op == "Shape":
                out = jnp.asarray(ins[0].shape, jnp.int64)
            elif op == "Gather":
                out = jnp.take(ins[0], ins[1].astype(jnp.int32),
                               axis=at.get("axis", 0))
            elif op == "Cast":
                to = int(at.get("to", 1))
                out = ins[0].astype(_DTYPES.get(to, np.float32))
            elif op == "Slice":
                starts = np.asarray(ins[1]).tolist()
                ends = np.asarray(ins[2]).tolist()
                axes = (np.asarray(ins[3]).tolist() if len(ins) > 3 and
                        ins[3] is not None else list(range(len(starts))))
                steps = (np.asarray(ins[4]).tolist() if len(ins) > 4 and
                         ins[4] is not None else [1] * len(starts))
                sl = [slice(None)] * ins[0].ndim
                for s_, e_, a_, st_ in zip(starts, ends, axes, steps):
                    # tf2onnx encodes "to the end" as -1 (despite ONNX spec
                    # reading it as last-exclusive); INT_MAX likewise.
                    end = None if (e_ == -1 or e_ >= 2**31 - 1) else e_
                    sl[a_] = slice(s_, end, st_)
                out = ins[0][tuple(sl)]
            else:
                raise NotImplementedError(f"ONNX op not supported: {op}")
            for oname in node["outputs"]:
                env[oname] = out
        return [env[o] for o in self.output_names]
