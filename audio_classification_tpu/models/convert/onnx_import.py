"""ONNX weight extraction without the onnx package (pure protobuf parsing).

The reference's model zoo ships as ONNX graphs executed by onnxruntime
(reference: SURVEY.md §2.2-2.3 — 3D-Speaker ERes2Net embedder, SenseVoice
int8, silero VAD). Converting those weights into JAX pytrees only needs the
initializer tensors, so this module implements a minimal protobuf wire
reader for ModelProto -> GraphProto -> TensorProto and returns
{tensor_name: np.ndarray}. No third-party deps; int8-quantized tensors are
returned raw together with any scale/zero-point tensors so callers can
dequantize to bf16/f32.

Wire format reference: protobuf encoding docs (varint, 64-bit, length-
delimited, 32-bit field types).
"""
from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np

# TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _iter_fields(buf: memoryview) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over one message body."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field_no = key >> 3
        wire = key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = bytes(buf[pos : pos + 8])
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = bytes(buf[pos : pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field_no, wire, val


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype_code = 1
    name = ""
    raw = b""
    float_data: List[float] = []
    int32_data: List[int] = []
    int64_data: List[int] = []
    double_data: List[float] = []
    for field_no, wire, val in _iter_fields(buf):
        if field_no == 1:  # dims
            if wire == 0:
                dims.append(int(val))
            else:  # packed
                pos = 0
                mv = val
                while pos < len(mv):
                    v, pos = _read_varint(mv, pos)
                    dims.append(v)
        elif field_no == 2 and wire == 0:
            dtype_code = int(val)
        elif field_no == 4:  # float_data (packed or repeated 32-bit)
            if wire == 2:
                float_data.extend(np.frombuffer(bytes(val), dtype="<f4").tolist())
            else:
                float_data.append(struct.unpack("<f", val)[0])
        elif field_no == 5:  # int32_data
            if wire == 2:
                pos = 0
                mv = val
                while pos < len(mv):
                    v, pos = _read_varint(mv, pos)
                    int32_data.append(v)
            else:
                int32_data.append(int(val))
        elif field_no == 7:  # int64_data
            if wire == 2:
                pos = 0
                mv = val
                while pos < len(mv):
                    v, pos = _read_varint(mv, pos)
                    int64_data.append(v)
            else:
                int64_data.append(int(val))
        elif field_no == 8 and wire == 2:
            name = bytes(val).decode("utf-8", errors="replace")
        elif field_no == 9 and wire == 2:
            raw = bytes(val)
        elif field_no == 10:  # double_data
            if wire == 2:
                double_data.extend(np.frombuffer(bytes(val), dtype="<f8").tolist())
            else:
                double_data.append(struct.unpack("<d", val)[0])
    dtype = _DTYPES.get(dtype_code)
    if dtype is None:
        raise ValueError(f"unsupported ONNX tensor dtype {dtype_code} for '{name}'")
    if raw:
        arr = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder("<")).copy()
    elif float_data:
        arr = np.asarray(float_data, dtype=np.float32)
    elif double_data:
        arr = np.asarray(double_data, dtype=np.float64)
    elif int64_data:
        arr = np.asarray(int64_data, dtype=np.int64)
    elif int32_data:
        # int32_data carries int32/int16/int8/bool/fp16 payloads
        arr = np.asarray(int32_data, dtype=np.int32).astype(dtype)
    else:
        arr = np.zeros(0, dtype=dtype)
    if dims:
        arr = arr.reshape(dims)
    return name, arr


def load_onnx_weights(path: str) -> Dict[str, np.ndarray]:
    """Extract initializer tensors from an ONNX file -> {name: array}."""
    data = memoryview(open(path, "rb").read())
    graph = None
    for field_no, wire, val in _iter_fields(data):  # ModelProto
        if field_no == 7 and wire == 2:  # graph
            graph = val
            break
    if graph is None:
        raise ValueError(f"{path}: no GraphProto found (not an ONNX model?)")
    out: Dict[str, np.ndarray] = {}
    for field_no, wire, val in _iter_fields(graph):  # GraphProto
        if field_no == 5 and wire == 2:  # initializer (TensorProto)
            name, arr = _parse_tensor(val)
            out[name] = arr
    return out


def dequantize_int8(weights: Dict[str, np.ndarray], name: str) -> np.ndarray:
    """Dequantize `name` using its conventional scale/zero-point companions
    (ORT naming: <name>_scale / <name>_zero_point)."""
    w = weights[name]
    scale = weights.get(f"{name}_scale")
    zp = weights.get(f"{name}_zero_point")
    if scale is None:
        raise KeyError(f"no scale tensor for {name}")
    z = zp.astype(np.float32) if zp is not None else 0.0
    return (w.astype(np.float32) - z) * scale.astype(np.float32)
