"""Small signal helpers shared across pipelines."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def l2norm(v):
    """Zero-safe L2 normalization (reference: src/model.py:32-34).

    Works for numpy and jax arrays; [..., D] normalizes the last axis.
    """
    xp = jnp if isinstance(v, jnp.ndarray) else np
    n = xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True))
    return xp.where(n > 0, v / xp.where(n > 0, n, 1.0), v)


def frame_rms(x: jnp.ndarray, frame_length: int, frame_shift: int) -> jnp.ndarray:
    """Per-frame RMS energy [..., T] -> [..., N].

    Used for the energy-based ground-truth overlap mask in evaluation
    (reference: evaluate_with_sources.py:181-196).
    """
    from .frames import frame_signal

    frames = frame_signal(x, frame_length, frame_shift)
    return jnp.sqrt(jnp.mean(frames * frames, axis=-1) + 1e-12)


def peak_limit(x: jnp.ndarray, peak: float = 0.98) -> jnp.ndarray:
    """Scale down iff max |x| exceeds `peak` (reference: mix_wavs.py limiter)."""
    m = jnp.max(jnp.abs(x))
    scale = jnp.where(m > peak, peak / jnp.maximum(m, 1e-12), 1.0)
    return x * scale


def mix_with_gains(sources, gains_db) -> jnp.ndarray:
    """Mix [S, T] sources with per-source dB gains -> [T]."""
    src = jnp.asarray(sources, dtype=jnp.float32)
    g = 10.0 ** (jnp.asarray(gains_db, dtype=jnp.float32) / 20.0)
    return jnp.sum(src * g[:, None], axis=0)
