"""Dynamic int8 quantized compute for serving (TPU s8 MXU path).

The v5e MXU runs s8 x s8 -> s32 matmuls/convs at 2x the bf16 rate
(394 vs 197 TOPs peak per chip), and int8 operands halve the HBM
traffic for the weight stream. This module provides the functional
building blocks for the engine's ``quant="int8"`` serving mode
(a capability the reference only reaches by exporting through
onnxruntime's dynamic quantization — requirements.txt:6-7; here it is
a one-flag switch on the native JAX models):

- activations are quantized dynamically PER SAMPLE (leading batch row),
  with the absmax taken over an optional validity mask, so a sample's
  result can never depend on batch composition or padding — the repo's
  padded-vs-solo exactness rule (CLAUDE.md) applies to the quantized
  path too, up to float rounding in the dequant rescale;
- weights are quantized per output channel (symmetric, zero-point-free,
  so no correction terms are needed on the integer accumulator).

Everything here is shape-polymorphic jittable JAX; the rescale fuses
into the surrounding program.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def _per_sample_scale(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """absmax over every axis but the leading batch axis -> [B, 1, ..., 1].

    ``mask`` (broadcastable to x, 1=valid) keeps padded positions out of
    the reduction; their (clipped) quantized values only ever feed padded
    outputs, which callers mask downstream.
    """
    ax = tuple(range(1, x.ndim))
    a = jnp.abs(x)
    if mask is not None:
        a = a * mask.astype(a.dtype)
    amax = jnp.max(a, axis=ax, keepdims=True)
    return jnp.maximum(amax, _EPS) / 127.0


def quantize_dynamic(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
    """float [B, ...] -> (int8 values, float32 per-sample scale)."""
    scale = _per_sample_scale(x.astype(jnp.float32), mask)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_weight(w: jnp.ndarray, channel_axis: int = -1):
    """float kernel -> (int8 kernel, float32 per-out-channel scale).

    Symmetric per-channel: scale shape has 1s everywhere except
    ``channel_axis``. Runs under jit each call — one elementwise pass
    over the (small) weight tensor, negligible next to the matmul it
    feeds and free of any params-tree surgery.
    """
    ax = tuple(i for i in range(w.ndim) if i != channel_axis % w.ndim)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=ax, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv1d(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
                dilation: int = 1, padding: str | Sequence = "SAME",
                mask: Optional[jnp.ndarray] = None,
                out_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """conv1d (feature-last, groups=1) on the s8 MXU path.

    x: [B, T, Cin] float; kernel: [K, Cin, Cout] float;
    mask: optional [B, T] validity (scale reduction only).
    Zero padding survives quantization exactly (0 -> 0), so boundary
    semantics match the float path.
    """
    out_dtype = out_dtype or x.dtype
    x8, sx = quantize_dynamic(x, None if mask is None else mask[..., None])
    w8, sw = quantize_weight(kernel, channel_axis=-1)  # [1, 1, Cout]
    acc = jax.lax.conv_general_dilated(
        x8, w8,
        window_strides=(stride,),
        padding=padding if isinstance(padding, str) else list(padding),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, -1))).astype(out_dtype)


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None,
                out_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """x [B, ..., K] @ w [K, N] via s8 dot_general with per-sample
    activation scales and per-column weight scales."""
    out_dtype = out_dtype or x.dtype
    x8, sx = quantize_dynamic(x, mask)
    w8, sw = quantize_weight(w, channel_axis=-1)  # [1, N]
    acc = jax.lax.dot_general(
        x8, w8,
        dimension_numbers=(((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * sw.reshape(-1))).astype(out_dtype)
