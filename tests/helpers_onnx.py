"""Minimal ONNX writer for converter tests (protobuf wire encoding).

Builds just enough of ModelProto/GraphProto/NodeProto/TensorProto/
AttributeProto to synthesize fixture graphs with the same topology the
graph-aware importers (models/convert/onnx_graph_map) expect. Pure stdlib +
numpy — the image has no `onnx` package.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Sequence

import numpy as np

_NP_TO_ONNX = {
    np.dtype(np.float32): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.int8): 3,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.bool_): 9,
    np.dtype(np.float64): 11,
}


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _varint_field(field: int, v: int) -> bytes:
    return _key(field, 0) + _varint(v)


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    code = _NP_TO_ONNX[arr.dtype]
    out = b"".join(_varint_field(1, int(d)) for d in arr.shape)
    out += _varint_field(2, code)
    out += _len_field(8, name.encode())
    out += _len_field(9, arr.astype(arr.dtype.newbyteorder("<")).tobytes())
    return out


class Subgraph:
    """Marks an attribute value as a GraphProto payload (If/Loop bodies)."""

    def __init__(self, graph_bytes: bytes):
        self.graph_bytes = graph_bytes


def value_info(name: str, dtype, shape: Sequence[int]) -> bytes:
    """ValueInfoProto: name=1, type=2(tensor_type=1(elem_type=1, shape=2))."""
    code = _NP_TO_ONNX[np.dtype(dtype)]
    dims = b"".join(
        _len_field(1, _varint_field(1, int(d)) if not isinstance(d, str)
                   else _len_field(2, d.encode()))
        for d in shape
    )
    tensor_type = _varint_field(1, code) + _len_field(2, dims)
    type_proto = _len_field(1, tensor_type)
    return _len_field(1, name.encode()) + _len_field(2, type_proto)


def _attr(name: str, val) -> bytes:
    out = _len_field(1, name.encode())
    if isinstance(val, Subgraph):
        return out + _len_field(6, val.graph_bytes) + _varint_field(20, 5)
    if isinstance(val, float):
        out += _key(2, 5) + struct.pack("<f", val) + _varint_field(20, 1)
    elif isinstance(val, bool) or isinstance(val, (int, np.integer)):
        out += _varint_field(3, int(val) & ((1 << 64) - 1)) + _varint_field(20, 2)
    elif isinstance(val, (bytes, str)):
        b = val.encode() if isinstance(val, str) else val
        out += _len_field(4, b) + _varint_field(20, 3)
    elif isinstance(val, np.ndarray):
        out += _len_field(5, tensor_proto("", val)) + _varint_field(20, 4)
    elif isinstance(val, (list, tuple)) and all(isinstance(x, (int, np.integer)) for x in val):
        packed = b"".join(_varint(int(x) & ((1 << 64) - 1)) for x in val)
        out += _len_field(8, packed) + _varint_field(20, 7)
    else:
        raise TypeError(f"unsupported attribute type for {name}: {type(val)}")
    return out


def node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
         name: str = "", **attrs) -> bytes:
    out = b"".join(_len_field(1, i.encode()) for i in inputs)
    out += b"".join(_len_field(2, o.encode()) for o in outputs)
    if name:
        out += _len_field(3, name.encode())
    out += _len_field(4, op_type.encode())
    out += b"".join(_len_field(5, _attr(k, v)) for k, v in attrs.items())
    return out


def graph_bytes(nodes: List[bytes], initializers: Dict[str, np.ndarray],
                inputs: Sequence[bytes] = (), outputs: Sequence[bytes] = (),
                name: bytes = b"fixture") -> bytes:
    """GraphProto body: node=1, name=2, initializer=5, input=11, output=12.
    `inputs`/`outputs` are encoded value_info() entries."""
    graph = b"".join(_len_field(1, n) for n in nodes)
    graph += b"".join(
        _len_field(5, tensor_proto(k, v)) for k, v in initializers.items()
    )
    graph += _len_field(2, name)
    graph += b"".join(_len_field(11, vi) for vi in inputs)
    graph += b"".join(_len_field(12, vi) for vi in outputs)
    return graph


def model_bytes(nodes: List[bytes], initializers: Dict[str, np.ndarray],
                inputs: Sequence[bytes] = (),
                outputs: Sequence[bytes] = (),
                metadata: Dict[str, str] = None) -> bytes:
    graph = graph_bytes(nodes, initializers, inputs, outputs)
    opset = _len_field(1, b"") + _varint_field(2, 17)
    out = _varint_field(1, 8) + _len_field(7, graph) + _len_field(8, opset)
    for k, v in (metadata or {}).items():  # metadata_props = field 14
        entry = _len_field(1, k.encode()) + _len_field(2, str(v).encode())
        out += _len_field(14, entry)
    return out


class GraphBuilder:
    """Sequentially-wired node builder: each op consumes the previous value."""

    def __init__(self):
        self.nodes: List[bytes] = []
        self.init: Dict[str, np.ndarray] = {}
        self.value = "input"
        self._n = 0

    def _name(self, stem: str) -> str:
        self._n += 1
        return f"{stem}_{self._n}"

    def add_init(self, stem: str, arr: np.ndarray) -> str:
        name = self._name(stem)
        self.init[name] = np.asarray(arr)
        return name

    def op(self, op_type: str, extra_inputs: Sequence[str] = (), **attrs) -> str:
        out = self._name(op_type.lower())
        self.nodes.append(
            node(op_type, [self.value, *extra_inputs], [out],
                 name=self._name(op_type), **attrs)
        )
        self.value = out
        return out

    def conv(self, w: np.ndarray, b: np.ndarray, **attrs) -> str:
        return self.op("Conv", [self.add_init("w", w), self.add_init("b", b)], **attrs)

    def gemm(self, w_out_in: np.ndarray, b: np.ndarray) -> str:
        """torch-style Gemm: W stored [out, in], transB=1."""
        return self.op("Gemm", [self.add_init("w", w_out_in), self.add_init("b", b)],
                       transB=1)

    def batchnorm(self, scale, bias, mean, var) -> str:
        return self.op("BatchNormalization", [
            self.add_init("s", scale), self.add_init("b", bias),
            self.add_init("m", mean), self.add_init("v", var),
        ])

    def layernorm(self, scale, bias) -> str:
        return self.op("LayerNormalization", [
            self.add_init("s", scale), self.add_init("b", bias),
        ])

    def relu(self) -> str:
        return self.op("Relu")

    def raw(self, op_type: str, inputs: Sequence[str], outputs: Sequence[str],
            **attrs) -> str:
        """Free-form node (e.g. Gather from an initializer, Concat,
        DequantizeLinear); does not advance the sequential value."""
        self.nodes.append(node(op_type, inputs, outputs, name=self._name(op_type), **attrs))
        return outputs[0]

    def to_bytes(self, inputs=None, outputs=None) -> bytes:
        """`inputs`/`outputs`: [(name, np dtype, shape)] ValueInfo triples;
        defaults declare float32 'input' -> the last produced value (rank
        info unspecified), which is what OnnxModel needs to execute."""
        ins = [value_info(*t) for t in (inputs or [("input", np.float32, [])])]
        outs = [value_info(*t) for t in (outputs or [(self.value, np.float32, [])])]
        return model_bytes(self.nodes, self.init, ins, outs)

    def write(self, path, inputs=None, outputs=None) -> str:
        with open(path, "wb") as f:
            f.write(self.to_bytes(inputs=inputs, outputs=outputs))
        return str(path)
