"""Generic ONNX graph -> jittable JAX function (an onnxruntime replacement).

The reference executes its entire model zoo as ONNX graphs under the
onnxruntime C++ EPs (reference: requirements.txt:6-7, src/model.py:10,64;
the zoo is SURVEY.md §2.2 — ERes2Net speaker ONNX, SenseVoice int8, silero
VAD, optional Paraformer/Transducer/Whisper ONNX). The graph-aware
importers in `onnx_graph_map` handle the case where a graph's topology
matches this framework's own modules; THIS module removes that restriction:
it interprets any parsed `OnnxGraph` (models/convert/onnx_import) directly
as JAX operations, producing a function XLA compiles for TPU. A user of the
reference can point the framework at their actual .onnx checkpoint files
and run them natively — exact topology, exact weights.

Execution model
---------------
* Nodes run in file order (ONNX requires topological order). The
  environment maps value names to either **numpy arrays (constants)** or
  **JAX values (traced)**.
* **Partial evaluation**: any node whose inputs are all constants and whose
  op has a numpy path is folded at trace time. `Shape` always returns a
  numpy constant (shapes are static under jit), so the shape-arithmetic
  chains ONNX exporters emit (Shape→Gather→Unsqueeze→Concat→Reshape)
  resolve to static reshapes instead of dynamic ops XLA cannot compile.
* Initializers are split into **params** (floating-point / large int8
  weight tensors, passed as a pytree argument so checkpoints reload without
  recompiling) and **baked constants** (int64 shape vectors, indices,
  scalars — these must stay numpy so they can drive static shapes).
* Control flow: `If` with a constant condition inlines the taken branch;
  with a traced condition it lowers to `lax.cond` (both branches must
  produce matching shapes). `Loop` supports a constant trip count
  (Python-unrolled); recurrences (LSTM/GRU/RNN) lower to `lax.scan`.

Dtype notes: jax runs with 32-bit ints; int64 graph tensors stay numpy
int64 while constant and degrade to int32 once traced — harmless for the
index/length semantics these audio graphs use. `QuantizeLinear`/`Round` use
round-half-to-even per the ONNX spec.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .onnx_import import OnnxGraph, OnnxNode, load_onnx_graph

_DTYPE_CODES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _is_const(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, bool))


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _as_list(v, default=None):
    if v is None:
        return default
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v]


def _attr_str(node: OnnxNode, key: str, default: str = "") -> str:
    v = node.attrs.get(key)
    if v is None:
        return default
    return v.decode() if isinstance(v, bytes) else str(v)


class UnsupportedOnnxOp(NotImplementedError):
    pass


class _Ctx:
    """Per-execution state: value environment + module namespaces."""

    def __init__(self, env: Dict[str, Any], parent: Optional["_Ctx"] = None):
        import jax
        import jax.numpy as jnp

        self.env = env
        self.parent = parent
        self.jax = jax
        self.jnp = jnp

    def lookup(self, name: str):
        ctx: Optional[_Ctx] = self
        while ctx is not None:
            if name in ctx.env:
                return ctx.env[name]
            ctx = ctx.parent
        raise KeyError(f"onnx_exec: undefined value '{name}'")

    def inputs(self, node: OnnxNode) -> List[Any]:
        # ONNX uses "" for omitted optional inputs.
        return [self.lookup(n) if n else None for n in node.inputs]

    def xp(self, ins: Sequence[Any]):
        """numpy for all-constant inputs (fold), jnp otherwise."""
        if all(x is None or _is_const(x) for x in ins):
            return np
        return self.jnp

    def const(self, node: OnnxNode, value, what: str) -> np.ndarray:
        if value is None or not _is_const(value):
            raise UnsupportedOnnxOp(
                f"{node.op_type} '{node.name}': {what} must be constant "
                f"(static shapes are required under jit)"
            )
        return _np(value)


_HANDLERS: Dict[str, Callable] = {}


def _op(*names: str):
    def deco(fn):
        for n in names:
            _HANDLERS[n] = fn
        return fn
    return deco


# --------------------------------------------------------------- elementwise

_UNARY = {
    "Relu": lambda xp, x: xp.maximum(x, 0),
    "Sigmoid": lambda xp, x: 1.0 / (1.0 + xp.exp(-x)),
    "Tanh": lambda xp, x: xp.tanh(x),
    "Exp": lambda xp, x: xp.exp(x),
    "Log": lambda xp, x: xp.log(x),
    "Sqrt": lambda xp, x: xp.sqrt(x),
    "Neg": lambda xp, x: -x,
    "Abs": lambda xp, x: xp.abs(x),
    "Floor": lambda xp, x: xp.floor(x),
    "Ceil": lambda xp, x: xp.ceil(x),
    "Round": lambda xp, x: xp.round(x),  # half-to-even in np & jnp
    "Reciprocal": lambda xp, x: 1.0 / x,
    "Not": lambda xp, x: xp.logical_not(x),
    "Sign": lambda xp, x: xp.sign(x),
    "Sin": lambda xp, x: xp.sin(x),
    "Cos": lambda xp, x: xp.cos(x),
    "Erf": lambda xp, x: (np.vectorize(math.erf, otypes=[np.float32]) if xp is np
                          else __import__("jax").scipy.special.erf)(x),
    "Softplus": lambda xp, x: xp.logaddexp(x, 0.0),
}


@_op(*_UNARY)
def _unary(ctx, node, ins):
    (x,) = ins
    return [_UNARY[node.op_type](ctx.xp([x]), x)]


_BINARY = {
    "Add": lambda x, y: x + y,
    "Sub": lambda x, y: x - y,
    "Mul": lambda x, y: x * y,
    "Div": lambda x, y: x / y,
    "Pow": lambda x, y: x ** y,
}


@_op(*_BINARY)
def _binary(ctx, node, ins):
    x, y = ins
    xp = ctx.xp(ins)
    if node.op_type == "Div" and np.issubdtype(_dtype_of(x), np.integer) \
            and np.issubdtype(_dtype_of(y), np.integer):
        return [xp.floor_divide(x, y)]  # ONNX integer Div truncates toward 0 for
        # non-negative operands (shape arithmetic); see spec Div.
    return [_BINARY[node.op_type](x, y)]


def _dtype_of(x):
    return _np(x).dtype if _is_const(x) else x.dtype


@_op("Mod")
def _mod(ctx, node, ins):
    x, y = ins
    xp = ctx.xp(ins)
    if node.attrs.get("fmod", 0):
        return [xp.fmod(x, y)]
    return [xp.mod(x, y)]


@_op("Min", "Max", "Sum", "Mean")
def _variadic(ctx, node, ins):
    xp = ctx.xp(ins)
    out = ins[0]
    if node.op_type == "Min":
        for v in ins[1:]:
            out = xp.minimum(out, v)
    elif node.op_type == "Max":
        for v in ins[1:]:
            out = xp.maximum(out, v)
    else:
        for v in ins[1:]:
            out = out + v
        if node.op_type == "Mean":
            out = out / len(ins)
    return [out]


@_op("Equal", "Greater", "GreaterOrEqual", "Less", "LessOrEqual", "And",
     "Or", "Xor")
def _compare(ctx, node, ins):
    x, y = ins
    xp = ctx.xp(ins)
    fn = {
        "Equal": xp.equal, "Greater": xp.greater,
        "GreaterOrEqual": xp.greater_equal, "Less": xp.less,
        "LessOrEqual": xp.less_equal, "And": xp.logical_and,
        "Or": xp.logical_or, "Xor": xp.logical_xor,
    }[node.op_type]
    return [fn(x, y)]


@_op("Where")
def _where(ctx, node, ins):
    cond, x, y = ins
    return [ctx.xp(ins).where(cond, x, y)]


@_op("Clip")
def _clip(ctx, node, ins):
    x = ins[0]
    lo = ins[1] if len(ins) > 1 and ins[1] is not None else node.attrs.get("min")
    hi = ins[2] if len(ins) > 2 and ins[2] is not None else node.attrs.get("max")
    xp = ctx.xp([x, lo, hi])
    if lo is not None:
        x = xp.maximum(x, lo)
    if hi is not None:
        x = xp.minimum(x, hi)
    return [x]


@_op("LeakyRelu")
def _leaky(ctx, node, ins):
    (x,) = ins
    alpha = node.attrs.get("alpha", 0.01)
    return [ctx.xp(ins).where(x >= 0, x, alpha * x)]


@_op("PRelu")
def _prelu(ctx, node, ins):
    x, slope = ins
    xp = ctx.xp(ins)
    # ONNX: slope broadcasts unidirectionally to x (per-channel [C] against
    # NC* x aligns on the channel axis, like torch's PReLU).
    s = _np(slope) if _is_const(slope) else slope
    xnd = len(_shape_of(x))
    if s.ndim == 1 and s.shape[0] != 1 and xnd > 2:
        s = s.reshape((s.shape[0],) + (1,) * (xnd - 2))
    return [xp.where(x >= 0, x, s * x)]


@_op("Elu")
def _elu(ctx, node, ins):
    (x,) = ins
    alpha = node.attrs.get("alpha", 1.0)
    xp = ctx.xp(ins)
    return [xp.where(x > 0, x, alpha * (xp.exp(x) - 1.0))]


@_op("HardSigmoid")
def _hardsigmoid(ctx, node, ins):
    (x,) = ins
    a = node.attrs.get("alpha", 0.2)
    b = node.attrs.get("beta", 0.5)
    return [ctx.xp(ins).clip(a * x + b, 0.0, 1.0)]


@_op("HardSwish")
def _hardswish(ctx, node, ins):
    (x,) = ins
    return [x * ctx.xp(ins).clip(x / 6.0 + 0.5, 0.0, 1.0)]


@_op("Gelu")
def _gelu(ctx, node, ins):
    (x,) = ins
    import jax
    approx = _attr_str(node, "approximate", "none") == "tanh"
    return [jax.nn.gelu(x, approximate=approx)]


@_op("Softmax", "LogSoftmax")
def _softmax(ctx, node, ins):
    (x,) = ins
    import jax
    axis = node.attrs.get("axis", -1)
    fn = jax.nn.softmax if node.op_type == "Softmax" else jax.nn.log_softmax
    return [fn(x, axis=axis)]


@_op("Cast")
def _cast(ctx, node, ins):
    (x,) = ins
    dt = _DTYPE_CODES.get(node.attrs.get("to"))
    if dt is None:
        raise UnsupportedOnnxOp(f"Cast to dtype code {node.attrs.get('to')}")
    if _is_const(x):
        return [_np(x).astype(dt)]
    return [x.astype(dt)]


@_op("Identity", "CastLike")
def _identity(ctx, node, ins):
    if node.op_type == "CastLike":
        x, like = ins
        dt = _dtype_of(like)
        return [_np(x).astype(dt) if _is_const(x) else x.astype(dt)]
    return [ins[0]]


@_op("Dropout")
def _dropout(ctx, node, ins):
    x = ins[0]
    outs: List[Any] = [x]
    if len(node.outputs) > 1 and node.outputs[1]:
        xp = ctx.xp([x])
        outs.append(xp.ones(_shape_of(x), dtype=bool))
    return outs


def _shape_of(x) -> Tuple[int, ...]:
    return tuple(_np(x).shape) if _is_const(x) else tuple(x.shape)


# ------------------------------------------------------------------- shapes

@_op("Shape")
def _shape(ctx, node, ins):
    (x,) = ins
    shp = _shape_of(x)
    start = node.attrs.get("start", 0)
    end = node.attrs.get("end", len(shp))
    return [np.asarray(shp[start:end], dtype=np.int64)]


@_op("Size")
def _size(ctx, node, ins):
    (x,) = ins
    return [np.asarray(int(np.prod(_shape_of(x), dtype=np.int64)), np.int64)]


@_op("Reshape")
def _reshape(ctx, node, ins):
    x, shape = ins
    tgt = ctx.const(node, shape, "shape").astype(np.int64).tolist()
    src = _shape_of(x)
    if not node.attrs.get("allowzero", 0):
        tgt = [src[i] if d == 0 else d for i, d in enumerate(tgt)]
    return [ctx.xp([x]).reshape(x, tgt)]


@_op("Transpose")
def _transpose(ctx, node, ins):
    (x,) = ins
    perm = _as_list(node.attrs.get("perm"))
    return [ctx.xp(ins).transpose(x, perm)]


@_op("Concat")
def _concat(ctx, node, ins):
    axis = node.attrs.get("axis", 0)
    return [ctx.xp(ins).concatenate(ins, axis=axis)]


@_op("Split")
def _split(ctx, node, ins):
    x = ins[0]
    axis = node.attrs.get("axis", 0)
    xp = ctx.xp([x])
    sizes = None
    if len(ins) > 1 and ins[1] is not None:
        sizes = ctx.const(node, ins[1], "split sizes").astype(np.int64).tolist()
    elif "split" in node.attrs:
        sizes = _as_list(node.attrs["split"])
    n_out = len([o for o in node.outputs if o])
    dim = _shape_of(x)[axis]
    if sizes is None:
        q, r = divmod(dim, n_out)
        sizes = [q + (1 if i < r else 0) for i in range(n_out)]
    offs = np.cumsum([0] + sizes)
    return [
        xp.take(x, np.arange(offs[i], offs[i + 1]), axis=axis)
        if xp is np else
        __import__("jax").lax.slice_in_dim(x, int(offs[i]), int(offs[i + 1]),
                                           axis=axis)
        for i in range(len(sizes))
    ]


@_op("Slice")
def _slice(ctx, node, ins):
    x = ins[0]
    if len(ins) > 1:  # opset >= 10: inputs
        starts = ctx.const(node, ins[1], "starts").astype(np.int64).tolist()
        ends = ctx.const(node, ins[2], "ends").astype(np.int64).tolist()
        axes = (ctx.const(node, ins[3], "axes").astype(np.int64).tolist()
                if len(ins) > 3 and ins[3] is not None
                else list(range(len(starts))))
        steps = (ctx.const(node, ins[4], "steps").astype(np.int64).tolist()
                 if len(ins) > 4 and ins[4] is not None else [1] * len(starts))
    else:  # opset < 10: attributes
        starts = _as_list(node.attrs.get("starts"), [])
        ends = _as_list(node.attrs.get("ends"), [])
        axes = _as_list(node.attrs.get("axes"), list(range(len(starts))))
        steps = [1] * len(starts)
    nd = len(_shape_of(x))
    big = np.iinfo(np.int32).max
    sl = [slice(None)] * nd
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = a % nd
        # Exporters use INT64/INT32_MAX (or its negation) as "to the end".
        end: Optional[int] = e
        if st > 0 and e >= big:
            end = None
        elif st < 0 and e <= -big:
            end = None
        sl[a] = slice(s, end, st)
    return [x[tuple(sl)]]


@_op("Gather")
def _gather(ctx, node, ins):
    x, idx = ins
    axis = node.attrs.get("axis", 0)
    xp = ctx.xp(ins)
    if xp is np:
        return [np.take(_np(x), _np(idx).astype(np.int64), axis=axis)]
    jnp = ctx.jnp
    dim = _shape_of(x)[axis]
    idx = jnp.asarray(idx)
    idx = jnp.where(idx < 0, idx + dim, idx)  # jnp.take fill-mode would NaN
    return [jnp.take(x, idx, axis=axis)]


@_op("GatherElements")
def _gather_elements(ctx, node, ins):
    x, idx = ins
    axis = node.attrs.get("axis", 0)
    return [ctx.xp(ins).take_along_axis(x, idx, axis=axis)]


@_op("GatherND")
def _gather_nd(ctx, node, ins):
    xp = ctx.xp(ins)
    x = xp.asarray(ins[0])
    idx = xp.asarray(ins[1])
    b = int(node.attrs.get("batch_dims", 0))
    k = _shape_of(idx)[-1]
    if b:
        # fold the shared leading batch dims into explicit index columns,
        # reducing to the batch_dims=0 case
        pre = _shape_of(idx)[:-1]
        grids = []
        for d in range(b):
            shape = [1] * len(pre)
            shape[d] = pre[d]
            g = xp.arange(pre[d]).reshape(shape)
            grids.append(xp.broadcast_to(g, tuple(pre))[..., None])
        idx = xp.concatenate(grids + [idx], axis=-1)
        k += b
    return [x[tuple(idx[..., i] for i in range(k))]]


@_op("ScatterND")
def _scatter_nd(ctx, node, ins):
    data, indices, updates = ins
    xp = ctx.xp(ins)
    k = _shape_of(indices)[-1]
    red = node.attrs.get("reduction", b"none")
    red = red.decode() if isinstance(red, bytes) else str(red)
    if xp is np:
        out = _np(data).copy()
        tup = tuple(_np(indices)[..., i] for i in range(k))
        if red == "add":
            np.add.at(out, tup, _np(updates))
        else:
            out[tup] = _np(updates)
        return [out]
    jnp = ctx.jnp
    tup = tuple(jnp.asarray(indices)[..., i] for i in range(k))
    ref = jnp.asarray(data).at[tup]
    return [ref.add(updates) if red == "add" else ref.set(updates)]


@_op("ReverseSequence")
def _reverse_sequence(ctx, node, ins):
    """Per-row reversal of the first sequence_lens[b] steps — the op
    bidirectional-RNN exports (silero/wenet style) wrap their backward
    pass in."""
    x, seq_lens = ins
    batch_axis = int(node.attrs.get("batch_axis", 1))
    time_axis = int(node.attrs.get("time_axis", 0))
    xp = ctx.xp(ins)
    x = xp.asarray(x)
    x2 = xp.moveaxis(x, (batch_axis, time_axis), (0, 1))
    t = x2.shape[1]
    lens = xp.asarray(seq_lens).astype(np.int64 if xp is np else ctx.jnp.int32)
    lens = lens.reshape(-1)
    ar = xp.arange(t)[None, :]
    idx = lens[:, None] - 1 - ar
    idx = xp.where(idx >= 0, idx, ar)
    idx = idx.reshape(idx.shape + (1,) * (x2.ndim - 2))
    out = xp.take_along_axis(x2, xp.broadcast_to(idx, x2.shape), axis=1)
    return [xp.moveaxis(out, (0, 1), (batch_axis, time_axis))]


@_op("Squeeze")
def _squeeze(ctx, node, ins):
    x = ins[0]
    axes = None
    if len(ins) > 1 and ins[1] is not None:
        axes = ctx.const(node, ins[1], "axes").astype(np.int64).tolist()
    elif "axes" in node.attrs:
        axes = _as_list(node.attrs["axes"])
    xp = ctx.xp([x])
    if axes is None:
        return [xp.squeeze(x)]
    return [xp.squeeze(x, axis=tuple(a % len(_shape_of(x)) for a in axes))]


@_op("Unsqueeze")
def _unsqueeze(ctx, node, ins):
    x = ins[0]
    if len(ins) > 1 and ins[1] is not None:
        axes = ctx.const(node, ins[1], "axes").astype(np.int64).tolist()
    else:
        axes = _as_list(node.attrs.get("axes"), [])
    out_nd = len(_shape_of(x)) + len(axes)
    axes = sorted(a % out_nd for a in axes)
    xp = ctx.xp([x])
    for a in axes:
        x = xp.expand_dims(x, a)
    return [x]


@_op("Flatten")
def _flatten(ctx, node, ins):
    (x,) = ins
    axis = node.attrs.get("axis", 1)
    shp = _shape_of(x)
    lead = int(np.prod(shp[:axis], dtype=np.int64)) if axis else 1
    return [ctx.xp(ins).reshape(x, (lead, -1))]


@_op("Expand")
def _expand(ctx, node, ins):
    x, shape = ins
    tgt = ctx.const(node, shape, "shape").astype(np.int64).tolist()
    # ONNX Expand is bidirectional broadcast.
    out = np.broadcast_shapes(_shape_of(x), tuple(tgt))
    return [ctx.xp([x]).broadcast_to(x, out)]


@_op("Tile")
def _tile(ctx, node, ins):
    x, reps = ins
    r = ctx.const(node, reps, "repeats").astype(np.int64).tolist()
    return [ctx.xp([x]).tile(x, r)]


@_op("Constant")
def _constant(ctx, node, ins):
    for key in ("value", "value_float", "value_int", "value_floats",
                "value_ints"):
        if key in node.attrs:
            v = node.attrs[key]
            return [np.asarray(v)]
    raise UnsupportedOnnxOp("Constant node without a value attribute")


@_op("ConstantOfShape")
def _constant_of_shape(ctx, node, ins):
    shape = ctx.const(node, ins[0], "shape").astype(np.int64).tolist()
    v = node.attrs.get("value")
    if v is None:
        v = np.zeros(1, np.float32)
    v = _np(v)
    return [np.full(shape, v.reshape(-1)[0], dtype=v.dtype)]


@_op("Range")
def _range(ctx, node, ins):
    start, limit, delta = (ctx.const(node, v, "range operand") for v in ins)
    return [np.arange(start.item(), limit.item(), delta.item(),
                      dtype=start.dtype)]


@_op("OneHot")
def _onehot(ctx, node, ins):
    idx, depth, values = ins
    d = int(ctx.const(node, depth, "depth").item())
    axis = node.attrs.get("axis", -1)
    vals = ctx.const(node, values, "values")  # [off, on]
    import jax
    oh = jax.nn.one_hot(idx, d, axis=axis)
    return [oh * (vals[1] - vals[0]) + vals[0]]


@_op("Trilu")
def _trilu(ctx, node, ins):
    x = ins[0]
    k = int(ctx.const(node, ins[1], "k").item()) if len(ins) > 1 and \
        ins[1] is not None else 0
    xp = ctx.xp([x])
    return [xp.triu(x, k) if node.attrs.get("upper", 1) else xp.tril(x, k)]


@_op("Pad")
def _pad(ctx, node, ins):
    x = ins[0]
    mode = _attr_str(node, "mode", "constant")
    if len(ins) > 1 and ins[1] is not None:
        pads = ctx.const(node, ins[1], "pads").astype(np.int64).tolist()
        cval = ins[2] if len(ins) > 2 and ins[2] is not None else 0.0
    else:
        pads = _as_list(node.attrs.get("pads"), [])
        cval = node.attrs.get("value", 0.0)
    nd = len(_shape_of(x))
    axes = (ctx.const(node, ins[3], "axes").astype(np.int64).tolist()
            if len(ins) > 3 and ins[3] is not None else list(range(nd)))
    width = [(0, 0)] * nd
    half = len(pads) // 2
    for i, a in enumerate(axes):
        width[a % nd] = (pads[i], pads[half + i])
    xp = ctx.xp([x])
    mode_map = {"constant": "constant", "reflect": "reflect", "edge": "edge",
                "wrap": "wrap"}
    if mode == "constant":
        c = cval if _is_const(cval) else cval
        return [xp.pad(x, width, mode="constant",
                       constant_values=_np(c).item() if _is_const(c) else c)]
    return [xp.pad(x, width, mode=mode_map[mode])]


# ------------------------------------------------------------------ reduces

@_op("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin", "ReduceProd",
     "ReduceL2", "ReduceLogSumExp")
def _reduce(ctx, node, ins):
    x = ins[0]
    keep = bool(node.attrs.get("keepdims", 1))
    axes = None
    if len(ins) > 1 and ins[1] is not None:  # opset >= 18
        axes = tuple(ctx.const(node, ins[1], "axes").astype(np.int64).tolist())
    elif "axes" in node.attrs:
        axes = tuple(_as_list(node.attrs["axes"]))
    if axes is not None and len(axes) == 0:
        axes = None
        if node.attrs.get("noop_with_empty_axes", 0):
            return [x]
    xp = ctx.xp([x])
    op = node.op_type
    if op == "ReduceL2":
        return [xp.sqrt(xp.sum(xp.square(x), axis=axes, keepdims=keep))]
    if op == "ReduceLogSumExp":
        if xp is np:
            m = np.max(x, axis=axes, keepdims=True)
            out = np.log(np.sum(np.exp(x - m), axis=axes, keepdims=True)) + m
            return [out if keep else np.squeeze(out, axis=axes)]
        import jax
        return [jax.scipy.special.logsumexp(x, axis=axes, keepdims=keep)]
    fn = {"ReduceMean": xp.mean, "ReduceSum": xp.sum, "ReduceMax": xp.max,
          "ReduceMin": xp.min, "ReduceProd": xp.prod}[op]
    return [fn(x, axis=axes, keepdims=keep)]


@_op("ArgMax", "ArgMin")
def _argmax(ctx, node, ins):
    (x,) = ins
    axis = node.attrs.get("axis", 0)
    keep = bool(node.attrs.get("keepdims", 1))
    xp = ctx.xp(ins)
    fn = xp.argmax if node.op_type == "ArgMax" else xp.argmin
    out = fn(x, axis=axis)
    if keep:
        out = xp.expand_dims(out, axis)
    return [out.astype(np.int64) if xp is np else out.astype(np.int32)]


@_op("CumSum")
def _cumsum(ctx, node, ins):
    x, axis = ins
    a = int(ctx.const(node, axis, "axis").item())
    if node.attrs.get("exclusive", 0) or node.attrs.get("reverse", 0):
        raise UnsupportedOnnxOp("CumSum exclusive/reverse")
    return [ctx.xp([x]).cumsum(x, axis=a)]


@_op("TopK")
def _topk(ctx, node, ins):
    x, k = ins
    kk = int(ctx.const(node, k, "k").item())
    axis = node.attrs.get("axis", -1)
    import jax
    nd = len(_shape_of(x))
    axis = axis % nd
    if axis != nd - 1:
        xt = ctx.jnp.moveaxis(x, axis, -1)
        vals, idx = jax.lax.top_k(xt, kk)
        return [ctx.jnp.moveaxis(vals, -1, axis),
                ctx.jnp.moveaxis(idx, -1, axis).astype(np.int32)]
    vals, idx = jax.lax.top_k(x, kk)
    return [vals, idx.astype(np.int32)]


# --------------------------------------------------------------- linear alg

@_op("MatMul")
def _matmul(ctx, node, ins):
    x, y = ins
    return [ctx.xp(ins).matmul(x, y)]


@_op("Gemm")
def _gemm(ctx, node, ins):
    a, b = ins[0], ins[1]
    c = ins[2] if len(ins) > 2 else None
    xp = ctx.xp(ins)
    if node.attrs.get("transA", 0):
        a = xp.swapaxes(a, -1, -2)
    if node.attrs.get("transB", 0):
        b = xp.swapaxes(b, -1, -2)
    out = node.attrs.get("alpha", 1.0) * xp.matmul(a, b)
    if c is not None:
        out = out + node.attrs.get("beta", 1.0) * c
    return [out]


@_op("Einsum")
def _einsum(ctx, node, ins):
    eq = _attr_str(node, "equation")
    return [ctx.jnp.einsum(eq, *ins)]


def _int_matmul_core(ctx, a, b, azp, bzp):
    """(a - azp) @ (b - bzp) in exact int32 (core of MatMulInteger /
    QLinearMatMul, ORT's dynamic- and static-quant linear layers).

    On TPU the product itself runs as a NATIVE int8 MXU matmul
    (lax.dot_general with s8 operands and preferred_element_type=s32 —
    2x the bf16 MXU rate on v5e) instead of upcasting to int32 first.
    Zero points come out exactly via the algebraic expansion
      (a - za)(b - zb) = ab - za*colsum(b) - zb*rowsum(a) + K*za*zb
    (integer math; bit-identical to the upcast form). uint8 operands
    shift to s8 by -128 with the zero point shifted to match. The b zero
    point may be per-column ([N], ORT per-channel weight quantization) —
    the correction terms broadcast over the output columns; a per-row a
    zero point falls back to the upcast form."""
    xp = ctx.xp([a, b, azp, bzp])
    a_dt, b_dt = _dtype_of(a), _dtype_of(b)

    def _zp_rank(z):
        # size-1 vectors count as per-tensor scalars ([1]-shaped zps occur
        # in the wild even though the spec says shape [])
        if z is None:
            return 0
        if _is_const(z):
            return 0 if _np(z).size == 1 else _np(z).ndim
        if getattr(z, "ndim", 1) == 1 and z.shape[0] == 1:
            return 0
        return getattr(z, "ndim", 1)

    n_cols = _shape_of(b)[-1] if len(_shape_of(b)) == 2 else -1
    bzp_ok = _zp_rank(bzp) == 0 or (
        _zp_rank(bzp) == 1
        and (_np(bzp).shape[0] if _is_const(bzp) else bzp.shape[0]) == n_cols)
    if (xp is not np and _zp_rank(azp) == 0 and bzp_ok
            and a_dt in (np.int8, np.uint8) and b_dt in (np.int8, np.uint8)
            and len(_shape_of(a)) >= 2 and len(_shape_of(b)) == 2):
        import jax.lax as lax
        jnp = ctx.jnp

        def to_s8(x, zp, dt):
            # zero point: None if it statically vanishes, else an int32
            # scalar/[N] vector (python int for scalar const zp, array for
            # per-column, traced for dynamic zp — DynamicQuantizeLinear
            # emits its zp as a runtime value)
            if zp is None:
                zv = None
            elif _is_const(zp):
                zn = _np(zp).astype(np.int32)
                zv = (int(zn.reshape(())) or None) if zn.size == 1 \
                    else zn.reshape(-1)
            else:
                zv = zp.astype(np.int32).reshape(() if zp.ndim == 0 else -1)
            if dt == np.uint8:
                # u8 - 128 fits s8 exactly; shift the zero point to match
                x = (x.astype(np.int16) - 128).astype(np.int8)
                zv = -128 if zv is None else zv - 128
            return x, zv

        a8, za = to_s8(jnp.asarray(a), azp, a_dt)
        b8, zb = to_s8(jnp.asarray(b), bzp, b_dt)
        k = np.int32(a8.shape[-1])
        corr = lax.dot_general(
            a8, b8,
            dimension_numbers=(((a8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=np.int32,
        )  # [..., M, N]
        if za is not None:
            colsum = jnp.sum(b8.astype(np.int32), axis=0)  # [N]
            corr = corr - za * colsum
        if zb is not None:
            # scalar zb broadcasts; per-column zb [N] broadcasts over the
            # output columns against rowsum's [..., M, 1]
            rowsum = jnp.sum(a8.astype(np.int32), axis=-1, keepdims=True)
            corr = corr - zb * rowsum
        if za is not None and zb is not None:
            corr = corr + k * za * zb
        return corr
    a32 = xp.asarray(_np(a) if _is_const(a) else a, np.int32)
    b32 = xp.asarray(_np(b) if _is_const(b) else b, np.int32)
    if azp is not None:
        a32 = a32 - xp.asarray(_np(azp) if _is_const(azp) else azp, np.int32)
    if bzp is not None:
        b32 = b32 - xp.asarray(_np(bzp) if _is_const(bzp) else bzp, np.int32)
    return xp.matmul(a32, b32)


@_op("MatMulInteger")
def _matmul_integer(ctx, node, ins):
    """See _int_matmul_core (sherpa-onnx int8 exports, e.g. SenseVoice:
    DynamicQuantizeLinear activations x int8 weights)."""
    a, b = ins[0], ins[1]
    azp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    bzp = ins[3] if len(ins) > 3 and ins[3] is not None else None
    return [_int_matmul_core(ctx, a, b, azp, bzp)]


@_op("QLinearMatMul")
def _qlinear_matmul(ctx, node, ins):
    """Static-quant matmul: deq(a) @ deq(b) requantized to y's scale/zp.

    Integer core via _int_matmul_core (s8 MXU path), then one fused
    float rescale: y = saturate(round(acc * (sa*sb/sy)) + y_zp)."""
    a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp = ins[:8]
    acc = _int_matmul_core(ctx, a, b, a_zp, b_zp)
    xp = ctx.xp(ins)
    scale = _fval(a_s) * _fval(b_s) / _fval(y_s)
    if getattr(scale, "ndim", 0) == 1 and scale.shape[0] > 1:
        scale = scale.reshape(-1)  # per-column b scale broadcasts over N
    return [_requant_scaled(xp, acc, scale, y_zp)]


def _fval(x):
    """scale/zero-point operand -> float32 (const or traced)."""
    return (_np(x) if _is_const(x) else x).astype(np.float32)


def _deq_f32(x, scale, zp):
    """dequantize to float32 (per-tensor scale/zp, const or traced)."""
    xf = (_np(x) if _is_const(x) else x).astype(np.float32)
    if zp is not None:
        xf = xf - _fval(zp)
    return xf * _fval(scale)


def _requant(xp, y_f32, y_scale, y_zp):
    """round/shift/saturate float32 back onto y's integer grid."""
    return _requant_scaled(xp, y_f32, 1.0 / _fval(y_scale), y_zp)


def _requant_scaled(xp, acc, scale, y_zp):
    """saturate(round(acc * scale) + y_zp) — the single rescale step shared
    by every QLinear output (matmul/conv pass sa*sb/sy pre-combined,
    possibly per-channel-shaped; eltwise passes 1/sy)."""
    y_dt = _dtype_of(y_zp) if y_zp is not None else np.uint8
    info = np.iinfo(y_dt)
    q = xp.round(acc.astype(np.float32) * scale)
    if y_zp is not None:
        q = q + _fval(y_zp)
    return xp.clip(q, info.min, info.max).astype(y_dt)


def _qlinear_eltwise(fn):
    """com.microsoft QLinear elementwise family (QLinearAdd/Mul/...):
    deq -> float op -> requant, the same float-rescale semantics ORT's
    contrib kernels implement. On TPU the whole chain fuses into one
    VPU program under jit."""
    def handler(ctx, node, ins):
        a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp = ins[:8]
        xp = ctx.xp(ins)
        y = fn(xp, _deq_f32(a, a_s, a_zp), _deq_f32(b, b_s, b_zp), node)
        return [_requant(xp, y, y_s, y_zp)]
    return handler


_op("QLinearAdd")(_qlinear_eltwise(lambda xp, a, b, node: a + b))
_op("QLinearMul")(_qlinear_eltwise(lambda xp, a, b, node: a * b))


def _qlinear_unary(fn):
    def handler(ctx, node, ins):
        x, x_s, x_zp, y_s, y_zp = ins[:5]
        xp = ctx.xp(ins)
        return [_requant(xp, fn(ctx, node, _deq_f32(x, x_s, x_zp)), y_s, y_zp)]
    return handler


def _sigmoid_f(ctx, node, x):
    xp = np if isinstance(x, np.ndarray) else ctx.jnp
    return 1.0 / (1.0 + xp.exp(-x))


_op("QLinearSigmoid")(_qlinear_unary(_sigmoid_f))
_op("QLinearLeakyRelu")(_qlinear_unary(
    lambda ctx, node, x: (np if isinstance(x, np.ndarray) else ctx.jnp).where(
        x >= 0, x, np.float32(node.attrs.get("alpha", 0.01)) * x)))


@_op("QLinearGlobalAveragePool")
def _qlinear_global_avgpool(ctx, node, ins):
    x, x_s, x_zp, y_s, y_zp = ins[:5]
    xp = ctx.xp(ins)
    nd = len(_shape_of(x))
    axes = tuple(range(1, nd - 1)) if node.attrs.get("channels_last", 0) \
        else tuple(range(2, nd))
    # mean over the integer grid first (exact up to one float division),
    # then one rescale: avoids materializing the dequantized tensor
    mean = xp.mean((_np(x) if _is_const(x) else x).astype(np.float32),
                   axis=axes, keepdims=True)
    if x_zp is not None:
        mean = mean - _fval(x_zp)
    return [_requant(xp, mean * _fval(x_s), y_s, y_zp)]


@_op("QGemm")
def _qgemm(ctx, node, ins):
    """com.microsoft QGemm: alpha * deq(A') @ deq(B') + bias, with
    A'/B' optionally transposed; integer core via _int_matmul_core (s8
    MXU path). Bias is int32 at scale a_scale*b_scale. Output is
    quantized when y_scale is given, float32 otherwise (per contrib-op
    spec)."""
    a, a_s, a_zp, b, b_s, b_zp = ins[:6]
    bias = ins[6] if len(ins) > 6 and ins[6] is not None else None
    y_s = ins[7] if len(ins) > 7 and ins[7] is not None else None
    y_zp = ins[8] if len(ins) > 8 and ins[8] is not None else None
    xp = ctx.xp(ins)
    if node.attrs.get("transA", 0):
        a = xp.swapaxes(_np(a) if _is_const(a) else a, -1, -2)
    if node.attrs.get("transB", 0):
        b = xp.swapaxes(_np(b) if _is_const(b) else b, -1, -2)
    acc = _int_matmul_core(ctx, a, b, a_zp, b_zp)
    if bias is not None:
        acc = acc + (_np(bias) if _is_const(bias) else bias).astype(np.int32)
    alpha = np.float32(node.attrs.get("alpha", 1.0))
    scale = alpha * _fval(a_s) * _fval(b_s)
    if getattr(scale, "ndim", 0) == 1 and scale.shape[0] > 1:
        scale = scale.reshape(-1)
    y = acc.astype(np.float32) * scale
    if y_s is None:
        return [y]
    return [_requant(xp, y, y_s, y_zp)]


@_op("DequantizeLinear")
def _dequantize(ctx, node, ins):
    x, scale = ins[0], ins[1]
    zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    axis = node.attrs.get("axis", 1)
    xp = ctx.xp(ins)
    s = _np(scale) if _is_const(scale) else scale
    z = (_np(zp) if _is_const(zp) else zp) if zp is not None else None
    nd = len(_shape_of(x))
    if getattr(s, "ndim", 0) == 1 and s.shape[0] > 1 and nd > 1:
        shape = [1] * nd
        shape[axis % nd] = s.shape[0]
        s = s.reshape(shape)
        if z is not None and getattr(z, "ndim", 0) == 1:
            z = z.reshape(shape)
    xf = _np(x).astype(np.float32) if _is_const(x) else x.astype(np.float32)
    if z is not None:
        zf = _np(z).astype(np.float32) if _is_const(z) else z.astype(np.float32)
        xf = xf - zf
    return [xf * (s.astype(np.float32) if hasattr(s, "astype") else s)]


@_op("QuantizeLinear")
def _quantize(ctx, node, ins):
    x, scale = ins[0], ins[1]
    zp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    dt = _dtype_of(zp) if zp is not None else np.uint8
    info = np.iinfo(dt)
    xp = ctx.xp(ins)
    q = xp.round(x / scale)
    if zp is not None:
        q = q + (_np(zp).astype(np.float32) if _is_const(zp)
                 else zp.astype(np.float32))
    q = xp.clip(q, info.min, info.max)
    return [q.astype(dt)]


@_op("DynamicQuantizeLinear")
def _dyn_quantize(ctx, node, ins):
    (x,) = ins
    jnp = ctx.jnp
    # Spec: scale over [min(x,0), max(x,0)] onto uint8.
    xmin = jnp.minimum(jnp.min(x), 0.0)
    xmax = jnp.maximum(jnp.max(x), 0.0)
    scale = (xmax - xmin) / 255.0
    scale = jnp.where(scale == 0, 1.0, scale)
    zp = jnp.clip(jnp.round(0.0 - xmin / scale), 0, 255).astype(np.uint8)
    y = jnp.clip(jnp.round(x / scale) + zp.astype(np.float32), 0, 255)
    return [y.astype(np.uint8), scale.astype(np.float32), zp]


# ----------------------------------------------------------- conv / pooling

def _conv_padding(node: OnnxNode, in_spatial, k_eff, strides):
    auto = _attr_str(node, "auto_pad", "NOTSET")
    nsp = len(in_spatial)
    if auto in ("", "NOTSET"):
        pads = _as_list(node.attrs.get("pads"), [0] * (2 * nsp))
        return [(pads[i], pads[nsp + i]) for i in range(nsp)]
    if auto == "VALID":
        return [(0, 0)] * nsp
    out = []
    for i in range(nsp):
        o = -(-in_spatial[i] // strides[i])  # ceil
        total = max(0, (o - 1) * strides[i] + k_eff[i] - in_spatial[i])
        if auto == "SAME_UPPER":
            out.append((total // 2, total - total // 2))
        else:  # SAME_LOWER
            out.append((total - total // 2, total // 2))
    return out


@_op("Conv")
def _conv(ctx, node, ins):
    import jax
    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 else None
    nsp = len(_shape_of(w)) - 2
    strides = _as_list(node.attrs.get("strides"), [1] * nsp)
    dil = _as_list(node.attrs.get("dilations"), [1] * nsp)
    groups = node.attrs.get("group", 1)
    k = _shape_of(w)[2:]
    k_eff = [(kk - 1) * d + 1 for kk, d in zip(k, dil)]
    pads = _conv_padding(node, _shape_of(x)[2:], k_eff, strides)
    spatial = "".join("DHW"[3 - nsp + i] for i in range(nsp))
    dn = jax.lax.conv_dimension_numbers(
        _shape_of(x), _shape_of(w),
        (f"NC{spatial}", f"OI{spatial}", f"NC{spatial}"))
    out = jax.lax.conv_general_dilated(
        ctx.jnp.asarray(x), ctx.jnp.asarray(w), window_strides=strides,
        padding=pads, rhs_dilation=dil, dimension_numbers=dn,
        feature_group_count=groups)
    if b is not None:
        out = out + ctx.jnp.reshape(b, (1, -1) + (1,) * nsp)
    return [out]


def _int_conv_core(ctx, node, x, w, xzp, wzp):
    """Integer conv accumulating in int32 (core of ConvInteger/QLinearConv).

    Zero points are subtracted BEFORE the conv so XLA's zero padding is
    exact (a padded cell represents x_zero_point, i.e. dequantized 0 —
    onnxruntime's semantics). When both zero points statically vanish the
    conv runs as a native s8xs8->s32 MXU conv; otherwise the operands ride
    as int32 (still exact — products fit 18 bits, accumulation < 2^31 for
    any real kernel). The w zero point may be per-output-channel [M]."""
    import jax
    jnp = ctx.jnp
    nsp = len(_shape_of(w)) - 2
    strides = _as_list(node.attrs.get("strides"), [1] * nsp)
    dil = _as_list(node.attrs.get("dilations"), [1] * nsp)
    groups = node.attrs.get("group", 1)
    k = _shape_of(w)[2:]
    k_eff = [(kk - 1) * d + 1 for kk, d in zip(k, dil)]
    pads = _conv_padding(node, _shape_of(x)[2:], k_eff, strides)

    def shift(t, zp, channel_shape=None):
        # returns (tensor, statically_zero) with zp subtracted in int32
        if zp is not None and _is_const(zp) and not _np(zp).any():
            zp = None
        if zp is None:
            return jnp.asarray(t), True
        z = (_np(zp) if _is_const(zp) else zp).astype(np.int32)
        if getattr(z, "ndim", 0) == 1 and z.size > 1 and channel_shape:
            z = z.reshape(channel_shape)
        return jnp.asarray(t).astype(np.int32) - z, False

    xs, x0 = shift(x, xzp)
    ws, w0 = shift(w, wzp, channel_shape=(-1,) + (1,) * (nsp + 1))
    if not (x0 and w0 and _dtype_of(x) == np.int8 and _dtype_of(w) == np.int8):
        xs = xs.astype(np.int32)
        ws = ws.astype(np.int32)
    spatial = "".join("DHW"[3 - nsp + i] for i in range(nsp))
    dn = jax.lax.conv_dimension_numbers(
        _shape_of(x), _shape_of(w),
        (f"NC{spatial}", f"OI{spatial}", f"NC{spatial}"))
    return jax.lax.conv_general_dilated(
        xs, ws, window_strides=strides, padding=pads, rhs_dilation=dil,
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=np.int32)


@_op("ConvInteger")
def _conv_integer(ctx, node, ins):
    """See _int_conv_core (ORT dynamic-quant conv)."""
    x, w = ins[0], ins[1]
    xzp = ins[2] if len(ins) > 2 and ins[2] is not None else None
    wzp = ins[3] if len(ins) > 3 and ins[3] is not None else None
    return [_int_conv_core(ctx, node, x, w, xzp, wzp)]


@_op("QLinearConv")
def _qlinear_conv(ctx, node, ins):
    """Static-quant conv: deq(x) * deq(w) (+ int32 bias pre-scaled to
    x_scale*w_scale) requantized to y's scale/zp. Integer core via
    _int_conv_core, then one fused float rescale (per-output-channel
    w scale supported)."""
    x, x_s, x_zp, w, w_s, w_zp, y_s, y_zp = ins[:8]
    bias = ins[8] if len(ins) > 8 and ins[8] is not None else None
    acc = _int_conv_core(ctx, node, x, w, x_zp, w_zp)
    nsp = acc.ndim - 2
    jnp = ctx.jnp
    if bias is not None:
        b32 = (_np(bias) if _is_const(bias) else bias).astype(np.int32)
        acc = acc + jnp.reshape(b32, (1, -1) + (1,) * nsp)
    scale = _fval(x_s) * _fval(w_s) / _fval(y_s)
    if getattr(scale, "ndim", 0) == 1 and scale.shape[0] > 1:
        scale = scale.reshape((1, -1) + (1,) * nsp)  # per-channel w scale
    return [_requant_scaled(jnp, acc, scale, y_zp)]


@_op("ConvTranspose")
def _conv_transpose(ctx, node, ins):
    import jax
    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 else None
    wshape = _shape_of(w)  # [C_in, C_out/g, *k]
    nsp = len(wshape) - 2
    strides = _as_list(node.attrs.get("strides"), [1] * nsp)
    dil = _as_list(node.attrs.get("dilations"), [1] * nsp)
    groups = node.attrs.get("group", 1)
    if groups != 1:
        raise UnsupportedOnnxOp("grouped ConvTranspose")
    out_pad = _as_list(node.attrs.get("output_padding"), [0] * nsp)
    pads = _as_list(node.attrs.get("pads"), [0] * (2 * nsp))
    jnp = ctx.jnp
    # Equivalent dilated conv: lhs_dilation=strides, flipped kernel, IO->OI.
    wj = jnp.asarray(w)
    wj = jnp.swapaxes(wj, 0, 1)  # -> [C_out, C_in, *k]
    wj = jnp.flip(wj, axis=tuple(range(2, 2 + nsp)))
    k_eff = [(wshape[2 + i] - 1) * dil[i] + 1 for i in range(nsp)]
    padding = [
        (k_eff[i] - 1 - pads[i],
         k_eff[i] - 1 - pads[nsp + i] + out_pad[i])
        for i in range(nsp)
    ]
    spatial = "".join("DHW"[3 - nsp + i] for i in range(nsp))
    dn = jax.lax.conv_dimension_numbers(
        _shape_of(x), tuple(wj.shape),
        (f"NC{spatial}", f"OI{spatial}", f"NC{spatial}"))
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), wj, window_strides=[1] * nsp, padding=padding,
        lhs_dilation=strides, rhs_dilation=dil, dimension_numbers=dn)
    if b is not None:
        out = out + jnp.reshape(b, (1, -1) + (1,) * nsp)
    return [out]


def _pool(ctx, node, ins, kind: str):
    import jax
    (x,) = ins[:1]
    jnp = ctx.jnp
    shp = _shape_of(x)
    nsp = len(shp) - 2
    k = _as_list(node.attrs.get("kernel_shape"))
    strides = _as_list(node.attrs.get("strides"), [1] * nsp)
    dil = _as_list(node.attrs.get("dilations"), [1] * nsp)
    k_eff = [(kk - 1) * d + 1 for kk, d in zip(k, dil)]
    pads = _conv_padding(node, shp[2:], k_eff, strides)
    if node.attrs.get("ceil_mode", 0):
        pads = list(pads)
        for i in range(nsp):
            span = shp[2 + i] + pads[i][0] + pads[i][1] - k_eff[i]
            out_ceil = -(-span // strides[i]) + 1
            need = (out_ceil - 1) * strides[i] + k_eff[i] - shp[2 + i] - pads[i][0]
            pads[i] = (pads[i][0], max(pads[i][1], need))
    window = (1, 1) + tuple(k)
    wstrides = (1, 1) + tuple(strides)
    wdil = (1, 1) + tuple(dil)
    wpad = ((0, 0), (0, 0)) + tuple(pads)
    dt = _dtype_of(x)
    if kind == "max":
        init = np.asarray(
            -np.inf if np.issubdtype(dt, np.floating) else np.iinfo(dt).min,
            dtype=dt)
        out = jax.lax.reduce_window(
            jnp.asarray(x), init, jax.lax.max, window, wstrides, wpad,
            window_dilation=wdil)
        return [out]
    total = jax.lax.reduce_window(
        jnp.asarray(x), np.zeros((), dt), jax.lax.add, window, wstrides, wpad,
        window_dilation=wdil)
    if node.attrs.get("count_include_pad", 0):
        return [total / float(np.prod(k))]
    ones = jnp.ones(shp, dtype=total.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, window, wstrides, wpad, window_dilation=wdil)
    return [total / counts]


@_op("MaxPool")
def _maxpool(ctx, node, ins):
    return _pool(ctx, node, ins, "max")


@_op("AveragePool")
def _avgpool(ctx, node, ins):
    return _pool(ctx, node, ins, "avg")


@_op("GlobalAveragePool", "GlobalMaxPool")
def _globalpool(ctx, node, ins):
    (x,) = ins
    jnp = ctx.jnp
    axes = tuple(range(2, len(_shape_of(x))))
    fn = jnp.mean if node.op_type == "GlobalAveragePool" else jnp.max
    return [fn(x, axis=axes, keepdims=True)]


# ------------------------------------------------------------ normalization

@_op("BatchNormalization")
def _batchnorm(ctx, node, ins):
    x, scale, bias, mean, var = ins[:5]
    eps = node.attrs.get("epsilon", 1e-5)
    jnp = ctx.jnp
    nsp = len(_shape_of(x)) - 2
    shape = (1, -1) + (1,) * nsp
    inv = jnp.reshape(scale, shape) / jnp.sqrt(jnp.reshape(var, shape) + eps)
    return [x * inv + (jnp.reshape(bias, shape)
                       - jnp.reshape(mean, shape) * inv)]


@_op("LayerNormalization")
def _layernorm(ctx, node, ins):
    x, scale = ins[0], ins[1]
    bias = ins[2] if len(ins) > 2 else None
    axis = node.attrs.get("axis", -1)
    eps = node.attrs.get("epsilon", 1e-5)
    jnp = ctx.jnp
    nd = len(_shape_of(x))
    axes = tuple(range(axis % nd, nd))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=axes, keepdims=True)
    out = (x - mu) / jnp.sqrt(var + eps) * scale
    if bias is not None:
        out = out + bias
    outs = [out]
    if len(node.outputs) > 1:
        outs += [mu, 1.0 / jnp.sqrt(var + eps)][: len(node.outputs) - 1]
    return outs


@_op("InstanceNormalization")
def _instancenorm(ctx, node, ins):
    x, scale, bias = ins
    eps = node.attrs.get("epsilon", 1e-5)
    jnp = ctx.jnp
    nsp = len(_shape_of(x)) - 2
    axes = tuple(range(2, 2 + nsp))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * nsp
    return [(x - mu) / jnp.sqrt(var + eps) * jnp.reshape(scale, shape)
            + jnp.reshape(bias, shape)]


@_op("LpNormalization")
def _lpnorm(ctx, node, ins):
    (x,) = ins
    axis = node.attrs.get("axis", -1)
    p = node.attrs.get("p", 2)
    jnp = ctx.jnp
    if p == 2:
        n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    else:
        n = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    return [x / jnp.maximum(n, 1e-12)]


# -------------------------------------------------------------- recurrences

def _rnn_common(ctx, node, ins):
    """Shared unpack for LSTM/GRU: returns (x[T,B,I], w, r, b, h0, layout,
    directions)."""
    x, w, r = ins[0], ins[1], ins[2]
    layout = node.attrs.get("layout", 0)
    jnp = ctx.jnp
    x = jnp.asarray(x)
    if layout == 1:  # [B,T,I] -> [T,B,I]
        x = jnp.swapaxes(x, 0, 1)
    direction = _attr_str(node, "direction", "forward")
    ndir = 2 if direction == "bidirectional" else 1
    return x, jnp.asarray(w), jnp.asarray(r), layout, direction, ndir


@_op("LSTM")
def _lstm(ctx, node, ins):
    import jax
    jnp = ctx.jnp
    x, w, r, layout, direction, ndir = _rnn_common(ctx, node, ins)
    T, B, _ = x.shape
    H = node.attrs.get("hidden_size", r.shape[-1])
    b = ins[3] if len(ins) > 3 and ins[3] is not None else None
    seq_lens = ins[4] if len(ins) > 4 and ins[4] is not None else None
    h0 = ins[5] if len(ins) > 5 and ins[5] is not None else None
    c0 = ins[6] if len(ins) > 6 and ins[6] is not None else None
    if len(ins) > 7 and ins[7] is not None:
        raise UnsupportedOnnxOp("LSTM peepholes")

    def run_dir(d: int, reverse: bool):
        wd, rd = w[d], r[d]  # [4H, I], [4H, H]
        if b is not None:
            bd = jnp.asarray(b)[d]
            bias = bd[: 4 * H] + bd[4 * H:]
        else:
            bias = jnp.zeros((4 * H,), x.dtype)
        hi = (jnp.asarray(h0)[d] if h0 is not None
              else jnp.zeros((B, H), x.dtype))
        ci = (jnp.asarray(c0)[d] if c0 is not None
              else jnp.zeros((B, H), x.dtype))
        xs = jnp.flip(x, 0) if reverse else x
        pre_x = jnp.einsum("tbi,gi->tbg", xs, wd) + bias
        if seq_lens is not None:
            steps = jnp.arange(T)
            tidx = (T - 1 - steps) if reverse else steps
            valid = (tidx[:, None] < jnp.asarray(seq_lens)[None, :])
        else:
            valid = jnp.ones((T, B), bool)

        def step(carry, inp):
            h, c = carry
            z, ok = inp
            z = z + h @ rd.T
            i = jax.nn.sigmoid(z[:, 0 * H:1 * H])
            o = jax.nn.sigmoid(z[:, 1 * H:2 * H])
            f = jax.nn.sigmoid(z[:, 2 * H:3 * H])
            g = jnp.tanh(z[:, 3 * H:4 * H])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            m = ok[:, None]
            h2 = jnp.where(m, h_new, h)
            c2 = jnp.where(m, c_new, c)
            y = jnp.where(m, h_new, 0.0)
            return (h2, c2), y

        (hT, cT), ys = jax.lax.scan(step, (hi, ci), (pre_x, valid))
        if reverse:
            ys = jnp.flip(ys, 0)
        return ys, hT, cT

    dirs = [(0, direction == "reverse")]
    if ndir == 2:
        dirs = [(0, False), (1, True)]
    ys, hs, cs = zip(*(run_dir(d, rev) for d, rev in dirs))
    Y = jnp.stack(ys, axis=1)  # [T, D, B, H]
    Yh = jnp.stack(hs, axis=0)  # [D, B, H]
    Yc = jnp.stack(cs, axis=0)
    if layout == 1:
        Y = jnp.transpose(Y, (2, 0, 1, 3))  # -> [B, T, D, H]
        Yh = jnp.swapaxes(Yh, 0, 1)
        Yc = jnp.swapaxes(Yc, 0, 1)
    return [Y, Yh, Yc][: max(1, len(node.outputs))]


@_op("GRU")
def _gru(ctx, node, ins):
    import jax
    jnp = ctx.jnp
    x, w, r, layout, direction, ndir = _rnn_common(ctx, node, ins)
    T, B, _ = x.shape
    H = node.attrs.get("hidden_size", r.shape[-1])
    b = ins[3] if len(ins) > 3 and ins[3] is not None else None
    seq_lens = ins[4] if len(ins) > 4 and ins[4] is not None else None
    h0 = ins[5] if len(ins) > 5 and ins[5] is not None else None
    lbr = node.attrs.get("linear_before_reset", 0)

    def run_dir(d: int, reverse: bool):
        wd, rd = w[d], r[d]  # [3H, I], [3H, H]
        if b is not None:
            bd = jnp.asarray(b)[d]
            wb, rb = bd[: 3 * H], bd[3 * H:]
        else:
            wb = rb = jnp.zeros((3 * H,), x.dtype)
        hi = (jnp.asarray(h0)[d] if h0 is not None
              else jnp.zeros((B, H), x.dtype))
        xs = jnp.flip(x, 0) if reverse else x
        pre_x = jnp.einsum("tbi,gi->tbg", xs, wd) + wb
        if seq_lens is not None:
            steps = jnp.arange(T)
            tidx = (T - 1 - steps) if reverse else steps
            valid = (tidx[:, None] < jnp.asarray(seq_lens)[None, :])
        else:
            valid = jnp.ones((T, B), bool)

        def step(h, inp):
            zx, ok = inp
            hr = h @ rd.T + rb
            zt = jax.nn.sigmoid(zx[:, :H] + hr[:, :H])
            rt = jax.nn.sigmoid(zx[:, H:2 * H] + hr[:, H:2 * H])
            if lbr:
                ht = jnp.tanh(zx[:, 2 * H:] + rt * hr[:, 2 * H:])
            else:
                ht = jnp.tanh(zx[:, 2 * H:] + (rt * h) @ rd[2 * H:].T
                              + rb[2 * H:])
            h_new = (1.0 - zt) * ht + zt * h
            m = ok[:, None]
            h2 = jnp.where(m, h_new, h)
            return h2, jnp.where(m, h_new, 0.0)

        hT, ys = jax.lax.scan(step, hi, (pre_x, valid))
        if reverse:
            ys = jnp.flip(ys, 0)
        return ys, hT

    dirs = [(0, direction == "reverse")]
    if ndir == 2:
        dirs = [(0, False), (1, True)]
    ys, hs = zip(*(run_dir(d, rev) for d, rev in dirs))
    Y = jnp.stack(ys, axis=1)
    Yh = jnp.stack(hs, axis=0)
    if layout == 1:
        Y = jnp.transpose(Y, (2, 0, 1, 3))
        Yh = jnp.swapaxes(Yh, 0, 1)
    return [Y, Yh][: max(1, len(node.outputs))]


# ------------------------------------------------------------------- signal

@_op("STFT")
def _stft(ctx, node, ins):
    jnp = ctx.jnp
    signal, frame_step = ins[0], ins[1]
    window = ins[2] if len(ins) > 2 and ins[2] is not None else None
    frame_len = ins[3] if len(ins) > 3 and ins[3] is not None else None
    step = int(ctx.const(node, frame_step, "frame_step").item())
    sig = jnp.asarray(signal)
    if sig.ndim == 3:  # [B, L, 1]
        sig = sig[..., 0]
    if frame_len is not None:
        flen = int(ctx.const(node, frame_len, "frame_length").item())
    elif window is not None:
        flen = _shape_of(window)[0]
    else:
        raise UnsupportedOnnxOp("STFT without frame_length or window")
    B, L = sig.shape
    n_frames = 1 + (L - flen) // step
    idx = np.arange(flen)[None, :] + step * np.arange(n_frames)[:, None]
    frames = sig[:, idx]  # [B, F, flen]
    if window is not None:
        frames = frames * jnp.asarray(window)
    if node.attrs.get("onesided", 1):
        spec = jnp.fft.rfft(frames, n=flen, axis=-1)
    else:
        spec = jnp.fft.fft(frames, n=flen, axis=-1)
    return [jnp.stack([spec.real, spec.imag], axis=-1)]


@_op("Resize")
def _resize(ctx, node, ins):
    import jax
    x = ins[0]
    shp = _shape_of(x)
    sizes = None
    if len(ins) > 3 and ins[3] is not None:
        sizes = ctx.const(node, ins[3], "sizes").astype(np.int64).tolist()
    elif len(ins) > 2 and ins[2] is not None:
        scales = ctx.const(node, ins[2], "scales").astype(np.float64)
        if scales.size:
            sizes = [int(math.floor(s * d)) for s, d in zip(scales, shp)]
    if sizes is None:
        raise UnsupportedOnnxOp("Resize without scales/sizes")
    mode = _attr_str(node, "mode", "nearest")
    method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[mode]
    return [jax.image.resize(ctx.jnp.asarray(x), sizes, method=method)]


# ------------------------------------------------------------- control flow

@_op("If")
def _if(ctx, node, ins):
    (cond,) = ins
    then_g = node.attrs.get("then_branch")
    else_g = node.attrs.get("else_branch")
    if _is_const(cond):
        chosen = then_g if bool(_np(cond).reshape(-1)[0]) else else_g
        sub = _Ctx({}, parent=ctx)
        outs = _run_graph(chosen, sub)
        return outs
    import jax

    def mk(branch):
        def f(_):
            sub = _Ctx({}, parent=ctx)
            outs = _run_graph(branch, sub)
            return tuple(ctx.jnp.asarray(o) for o in outs)
        return f

    outs = jax.lax.cond(ctx.jnp.reshape(cond, ()).astype(bool),
                        mk(then_g), mk(else_g), None)
    return list(outs)


@_op("Loop")
def _loop(ctx, node, ins):
    trip = ins[0]
    cond = ins[1]
    carried = list(ins[2:])
    body: OnnxGraph = node.attrs.get("body")
    if trip is None or not _is_const(trip):
        raise UnsupportedOnnxOp("Loop with non-constant trip count")
    M = int(_np(trip).item())
    cond_val = True if cond is None else bool(_np(cond).reshape(-1)[0]) \
        if _is_const(cond) else None
    if cond_val is None:
        raise UnsupportedOnnxOp("Loop with traced initial condition")
    n_carry = len(carried)
    body_inputs = body.input_names  # iter_num, cond, carried...
    scan_outs: List[List[Any]] = [[] for _ in
                                  range(len(body.output_names) - 1 - n_carry)]
    it = 0
    while it < M and cond_val:
        sub = _Ctx({}, parent=ctx)
        sub.env[body_inputs[0]] = np.asarray(it, np.int64)
        sub.env[body_inputs[1]] = np.asarray(cond_val)
        for name, v in zip(body_inputs[2:], carried):
            sub.env[name] = v
        outs = _run_graph(body, sub)
        cond_out = outs[0]
        if not _is_const(cond_out):
            raise UnsupportedOnnxOp("Loop with traced continuation condition")
        cond_val = bool(_np(cond_out).reshape(-1)[0])
        carried = list(outs[1: 1 + n_carry])
        for i, so in enumerate(outs[1 + n_carry:]):
            scan_outs[i].append(so)
        it += 1
    result = carried
    jnp = ctx.jnp
    for col in scan_outs:
        result.append(jnp.stack(col, axis=0) if col
                      else np.zeros((0,), np.float32))
    return result


# ---------------------------------------------------------------- execution

def _run_graph(graph: OnnxGraph, ctx: _Ctx) -> List[Any]:
    for name, arr in graph.initializers.items():
        if name not in ctx.env:
            ctx.env[name] = arr
    for node in graph.nodes:
        handler = _HANDLERS.get(node.op_type)
        if handler is None:
            raise UnsupportedOnnxOp(
                f"op '{node.op_type}' (node '{node.name}') is not "
                f"implemented; supported: {sorted(_HANDLERS)}")
        ins = ctx.inputs(node)
        outs = handler(ctx, node, ins)
        for oname, val in zip(node.outputs, outs):
            if oname:
                ctx.env[oname] = val
    return [ctx.lookup(n) for n in graph.output_names]


# Input slots whose value must be a trace-time constant because it drives
# static shapes or other non-traceable decisions (mirrors each handler's
# ctx.const() calls above).
_CONST_SLOTS = {
    ("Reshape", 1), ("Expand", 1), ("Tile", 1), ("ConstantOfShape", 0),
    ("Slice", 1), ("Slice", 2), ("Slice", 3), ("Slice", 4),
    ("Resize", 2), ("Resize", 3),
    ("Range", 0), ("Range", 1), ("Range", 2),
    ("Pad", 1), ("Pad", 3),
    ("Unsqueeze", 1), ("Squeeze", 1), ("Split", 1),
    ("TopK", 1), ("CumSum", 1), ("OneHot", 1), ("OneHot", 2),
    ("Trilu", 1), ("STFT", 1), ("STFT", 3),
    ("Loop", 0), ("Loop", 1),
} | {
    (op, 1) for op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin",
                       "ReduceProd", "ReduceL2", "ReduceLogSumExp")
}


def _const_demanded(graph: OnnxGraph, out: set) -> None:
    for node in graph.nodes:
        for i, name in enumerate(node.inputs):
            if name and (node.op_type, i) in _CONST_SLOTS:
                out.add(name)
        for v in node.attrs.values():
            if isinstance(v, OnnxGraph):
                _const_demanded(v, out)
            elif isinstance(v, list):
                for g in v:
                    if isinstance(g, OnnxGraph):
                        _const_demanded(g, out)


def split_params(graph: OnnxGraph) -> Tuple[Dict[str, np.ndarray],
                                            Dict[str, np.ndarray]]:
    """Initializers -> (params, baked constants), classified by usage.

    Floating and quantized (int8/uint8) weight tensors become reloadable
    params — UNLESS some node consumes them in a shape-driving input slot
    (Reshape shapes, Slice bounds, Resize scales, ...), in which case they
    must stay numpy to keep shapes static during tracing. Integer tensors
    always stay numpy: they are shape/index vectors in these graphs and
    would otherwise degrade to traced int32.
    """
    demanded: set = set()
    _const_demanded(graph, demanded)
    params: Dict[str, np.ndarray] = {}
    consts: Dict[str, np.ndarray] = {}
    for name, arr in graph.initializers.items():
        floaty = np.issubdtype(arr.dtype, np.floating)
        quanty = arr.dtype in (np.int8, np.uint8)
        if (floaty or quanty) and name not in demanded:
            params[name] = arr
        else:
            consts[name] = arr
    return params, consts


class OnnxModel:
    """A loaded ONNX graph, callable on TPU via jit.

    >>> m = OnnxModel("model.onnx")
    >>> outs = m(x=feats, x_length=lens)   # dict name -> array

    `m.params` is the reloadable weight pytree (name -> array); pass
    `params=` to __call__ to run with swapped weights (same shapes, no
    recompile). Set `bake_params=True` to fold all weights into the
    compiled executable as constants (small models).
    """

    def __init__(self, model: object, bake_params: bool = False,
                 jit: bool = True):
        self.graph = (model if isinstance(model, OnnxGraph)
                      else load_onnx_graph(str(model)))
        if bake_params:
            self.params, self._consts = {}, dict(self.graph.initializers)
        else:
            self.params, self._consts = split_params(self.graph)
        self.input_names = self.graph.input_names
        self.output_names = self.graph.output_names
        # raw_fn is the pure (params, feeds) -> {name: out} function; callers
        # embedding the graph inside a larger jitted program (engine stage
        # fusion) use it directly so XLA fuses across the boundary.
        self.raw_fn = self._make_fn()
        self._fn = self.raw_fn
        if jit:
            import jax
            self._fn = jax.jit(self.raw_fn)

    def _make_fn(self):
        consts = self._consts
        graph = self.graph

        def fn(params: Dict[str, Any], feeds: Dict[str, Any]):
            env: Dict[str, Any] = dict(consts)
            env.update(params)
            env.update(feeds)
            ctx = _Ctx(env)
            outs = _run_graph(graph, ctx)
            jnp = ctx.jnp
            return {n: jnp.asarray(o)
                    for n, o in zip(graph.output_names, outs)}

        return fn

    def __call__(self, params: Optional[Dict[str, Any]] = None, **feeds):
        missing = [n for n in self.input_names if n not in feeds]
        if missing:
            raise TypeError(f"missing graph inputs: {missing} "
                            f"(expected {self.input_names})")
        extra = [n for n in feeds if n not in self.input_names]
        if extra:
            raise TypeError(f"unknown graph inputs: {extra} "
                            f"(expected {self.input_names})")
        return self._fn(self.params if params is None else params, feeds)

    def describe(self) -> str:
        """Human-readable IO + op census (for `convert_models --probe`)."""
        from collections import Counter
        census = Counter(n.op_type for n in self.graph.nodes)
        lines = [f"graph '{self.graph.name}'"]
        for vi in self.graph.inputs:
            if vi.name not in self.graph.initializers:
                lines.append(f"  in  {vi.name}: "
                             f"{np.dtype(vi.dtype).name if vi.dtype else '?'}"
                             f"{list(vi.shape)}")
        for vi in self.graph.outputs:
            lines.append(f"  out {vi.name}: "
                         f"{np.dtype(vi.dtype).name if vi.dtype else '?'}"
                         f"{list(vi.shape)}")
        lines.append(f"  params: {len(self.params)} tensors, "
                     f"{sum(v.size for v in self.params.values()):,} elems")
        lines.append("  ops: " + ", ".join(
            f"{k}×{v}" for k, v in sorted(census.items())))
        unsup = sorted({n.op_type for n in self.graph.nodes}
                       - set(_HANDLERS))
        if unsup:
            lines.append(f"  UNSUPPORTED: {', '.join(unsup)}")
        return "\n".join(lines)


def supported_ops() -> List[str]:
    return sorted(_HANDLERS)
