"""Bounded SPSC ring buffer for streaming capture (native C++ + Python fallback).

Replaces the reference's thread-per-chunk streaming design
(reference: streaming_overlap3_core.py:142-144) with a bounded producer/
consumer buffer: a capture source pushes float samples, the pipeline pump
pops fixed-size blocks for batched device dispatch.
"""
from __future__ import annotations

import ctypes
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    p = Path(__file__).resolve().parent.parent / "native" / "libringbuffer.so"
    if p.is_file():
        try:
            lib = ctypes.CDLL(str(p))
            lib.rb_create.restype = ctypes.c_void_p
            lib.rb_create.argtypes = [ctypes.c_longlong]
            lib.rb_destroy.argtypes = [ctypes.c_void_p]
            for fn in ("rb_size", "rb_capacity", "rb_dropped"):
                getattr(lib, fn).restype = ctypes.c_longlong
                getattr(lib, fn).argtypes = [ctypes.c_void_p]
            lib.rb_push.restype = ctypes.c_longlong
            lib.rb_push.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
            lib.rb_pop.restype = ctypes.c_longlong
            lib.rb_pop.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


class RingBuffer:
    """Bounded float ring buffer. Push never blocks; overflow samples drop."""

    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        lib = _lib()
        self._native = None
        if lib is not None:
            h = lib.rb_create(self.capacity)
            if h:
                self._native = ctypes.c_void_p(h)
                self._lib = lib
        if self._native is None:
            # Python fallback: deque-like numpy buffer guarded by a lock
            self._buf = np.empty(self.capacity, dtype=np.float32)
            self._head = 0
            self._tail = 0
            self._dropped = 0
            self._lock = threading.Lock()

    def __del__(self):
        if getattr(self, "_native", None) is not None:
            self._lib.rb_destroy(self._native)
            self._native = None

    def push(self, samples: np.ndarray) -> int:
        x = np.ascontiguousarray(samples, dtype=np.float32).reshape(-1)
        if self._native is not None:
            return int(self._lib.rb_push(self._native, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size))
        with self._lock:
            free = self.capacity - (self._head - self._tail)
            n = min(x.size, free)
            idx = (self._head + np.arange(n)) % self.capacity
            self._buf[idx] = x[:n]
            self._head += n
            self._dropped += x.size - n
            return int(n)

    def pop(self, n: int) -> np.ndarray:
        out = np.empty(int(n), dtype=np.float32)
        if self._native is not None:
            got = int(self._lib.rb_pop(self._native, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(n)))
            return out[:got]
        with self._lock:
            avail = self._head - self._tail
            got = min(int(n), avail)
            idx = (self._tail + np.arange(got)) % self.capacity
            out[:got] = self._buf[idx]
            self._tail += got
            return out[:got]

    @property
    def size(self) -> int:
        if self._native is not None:
            return int(self._lib.rb_size(self._native))
        with self._lock:
            return int(self._head - self._tail)

    @property
    def dropped(self) -> int:
        if self._native is not None:
            return int(self._lib.rb_dropped(self._native))
        with self._lock:
            return int(self._dropped)
