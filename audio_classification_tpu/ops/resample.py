"""Sample-rate conversion on device.

Two implementations mirroring the reference's two behaviors:

- ``resample_poly``: windowed-sinc polyphase resampler (quality path),
  the TPU-native replacement for torchaudio's C++ ``AF.resample``
  (reference: overlap3_core.py:136-143). Expressed as a strided conv
  (``lax.conv_general_dilated``) so XLA maps it onto the MXU.
- ``resample_linear``: linear interpolation, matching the reference's
  explicit fallback resamplers (reference: separation.py:91-103,
  benchmark_pipeline.py:126-138).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _polyphase_kernel_np(up: int, down: int, width: int = 16, rolloff: float = 0.9475937167399596) -> np.ndarray:
    """Windowed-sinc lowpass for rational resampling -> [up, 1, taps].

    Cutoff at min(1/up, 1/down) * rolloff (in units of the intermediate
    nyquist). Kaiser window (beta=14.77) like a high-quality resampler.
    Organized as `up` polyphase branches of a shared prototype filter.
    """
    base_freq = min(1.0 / up, 1.0 / down) * rolloff
    half = int(width * max(up, down))
    n = np.arange(-half, half + 1, dtype=np.float64)
    t = n * base_freq
    kernel = np.sinc(t) * base_freq
    win = np.kaiser(n.size, 14.769656459379492)
    kernel = (kernel * win) * up
    # pad so taps divisible by up, then split into polyphase branches
    taps_total = kernel.size
    pad = (-taps_total) % up
    kernel = np.concatenate([kernel, np.zeros(pad)])
    return kernel.astype(np.float32)


def resample_poly(x: jnp.ndarray, orig_sr: int, new_sr: int, width: int = 16) -> jnp.ndarray:
    """[..., T] -> [..., ceil(T * new/orig)] windowed-sinc resample.

    Implemented as zero-stuffing upsample (via conv input dilation) followed
    by a strided convolution with the lowpass prototype — one fused XLA conv.
    """
    if orig_sr == new_sr:
        return x
    g = math.gcd(orig_sr, new_sr)
    up, down = new_sr // g, orig_sr // g
    kernel = _polyphase_kernel_np(up, down, width)
    taps = kernel.size
    half = taps // 2

    lead_shape = x.shape[:-1]
    t = x.shape[-1]
    xb = x.reshape((-1, 1, t)).astype(jnp.float32)  # [B, C=1, T]
    k = jnp.asarray(kernel[::-1].copy()).reshape(1, 1, taps)  # conv = correlation with flipped kernel

    # output length convention: ceil(T * up / down)
    t_out = -(-t * up // down)
    # pad so that output sample j draws from input centered at j*down/up
    pad_left = half
    pad_right = half + down * ((t_out * down + taps) // down)  # generous, trimmed below
    y = jax.lax.conv_general_dilated(
        xb,
        k,
        window_strides=(down,),
        padding=[(pad_left, pad_right)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = y[..., :t_out]
    return y.reshape(lead_shape + (t_out,))


def resample_linear(x: jnp.ndarray, orig_sr: int, new_sr: int) -> jnp.ndarray:
    """Linear-interp resample, matching the reference fallback
    (reference: separation.py:91-103): n_new = round(T * new/orig), endpoints
    mapped via linspace over [0, T-1].
    """
    if orig_sr == new_sr:
        return x
    t = x.shape[-1]
    n_new = int(round(t * float(new_sr) / float(orig_sr)))
    pos = jnp.linspace(0.0, t - 1.0, n_new)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    i1 = jnp.clip(i0 + 1, 0, t - 1)
    frac = pos - i0.astype(jnp.float32)
    return x[..., i0] * (1.0 - frac) + x[..., i1] * frac
