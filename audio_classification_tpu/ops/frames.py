"""Framing and window functions (static-shape, jit-friendly).

These are the building blocks under the fbank/STFT frontend that the
reference delegates to kaldi-native-fbank inside sherpa-onnx C++
(reference: src/model.py:70-99 builds recognizers whose C++ core computes
80-dim fbank). Here framing is a strided gather and windows are precomputed
constants so XLA fuses window-multiply into the downstream DFT matmul.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def num_frames(n_samples: int, frame_length: int, frame_shift: int, snip_edges: bool = True) -> int:
    """Frame count for a signal of n_samples (kaldi snip_edges semantics)."""
    if snip_edges:
        if n_samples < frame_length:
            return 0
        return 1 + (n_samples - frame_length) // frame_shift
    return (n_samples + frame_shift // 2) // frame_shift


def frame_signal(x: jnp.ndarray, frame_length: int, frame_shift: int) -> jnp.ndarray:
    """[..., T] -> [..., N, frame_length] by strided gather (snip_edges).

    Implemented as a gather with a static index matrix; XLA lowers this to an
    efficient dynamic-slice loop on TPU and it keeps every shape static.
    """
    t = x.shape[-1]
    n = num_frames(t, frame_length, frame_shift)
    if n <= 0:
        return jnp.zeros(x.shape[:-1] + (0, frame_length), x.dtype)
    idx = (
        np.arange(n, dtype=np.int32)[:, None] * frame_shift
        + np.arange(frame_length, dtype=np.int32)[None, :]
    )
    return x[..., idx]


@functools.lru_cache(maxsize=32)
def _window_np(kind: str, length: int) -> np.ndarray:
    n = np.arange(length, dtype=np.float64)
    if kind == "hann":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * n / (length - 1))
    elif kind == "hamming":
        w = 0.54 - 0.46 * np.cos(2 * np.pi * n / (length - 1))
    elif kind == "povey":
        # kaldi's default: hann ** 0.85
        w = (0.5 - 0.5 * np.cos(2 * np.pi * n / (length - 1))) ** 0.85
    elif kind == "rectangular":
        w = np.ones(length)
    elif kind == "periodic_hann":
        w = 0.5 - 0.5 * np.cos(2 * np.pi * n / length)
    else:
        raise ValueError(f"unknown window: {kind}")
    return w.astype(np.float32)


def window(kind: str, length: int) -> jnp.ndarray:
    return jnp.asarray(_window_np(kind, length))
