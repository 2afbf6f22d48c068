"""Ring buffer tests: native + Python fallback, bounded overflow semantics."""
import threading

import numpy as np

from audio_classification_tpu.audio_io import RingBuffer
from audio_classification_tpu.audio_io import stream_buffer as sb_mod


def test_push_pop_fifo():
    rb = RingBuffer(1024)
    x = np.arange(100, dtype=np.float32)
    assert rb.push(x) == 100
    assert rb.size == 100
    y = rb.pop(60)
    np.testing.assert_array_equal(y, x[:60])
    y2 = rb.pop(100)  # only 40 left
    np.testing.assert_array_equal(y2, x[60:])
    assert rb.size == 0


def test_overflow_drops():
    rb = RingBuffer(16)
    wrote = rb.push(np.ones(32, dtype=np.float32))
    assert wrote == 16
    assert rb.dropped == 16


def test_wraparound():
    rb = RingBuffer(8)
    rb.push(np.arange(6, dtype=np.float32))
    rb.pop(6)
    x = np.arange(10, 18, dtype=np.float32)
    assert rb.push(x) == 8
    np.testing.assert_array_equal(rb.pop(8), x)


def test_python_fallback(monkeypatch):
    monkeypatch.setattr(sb_mod, "_LIB", None)
    monkeypatch.setattr(sb_mod, "_TRIED", True)
    rb = RingBuffer(32)
    assert rb._native is None
    rb.push(np.arange(20, dtype=np.float32))
    np.testing.assert_array_equal(rb.pop(20), np.arange(20, dtype=np.float32))
    rb.push(np.ones(40, dtype=np.float32))
    assert rb.dropped == 8


def test_concurrent_spsc():
    rb = RingBuffer(1 << 14)
    total = 50_000
    out = []

    def producer():
        sent = 0
        while sent < total:
            n = min(997, total - sent)
            chunk = np.arange(sent, sent + n, dtype=np.float32)
            done = 0
            while done < n:
                done += rb.push(chunk[done:])
            sent += n

    def consumer():
        got = 0
        while got < total:
            y = rb.pop(1024)
            if y.size:
                out.append(y)
                got += y.size

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(); tc.join()
    all_vals = np.concatenate(out)
    np.testing.assert_array_equal(all_vals, np.arange(total, dtype=np.float32))
