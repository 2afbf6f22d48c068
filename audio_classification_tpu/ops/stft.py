"""STFT / iSTFT as MXU matmuls.

On TPU, small fixed-size DFTs (n_fft 256..1024) map better onto the 128x128
systolic array as a framed matmul against precomputed DFT basis matrices than
onto a generic FFT: frames [N, n_fft] x basis [n_fft, n_bins] is exactly the
shape the MXU wants, and XLA fuses the window multiply and the power/log
epilogues into the same program. This replaces the FFT inside
kaldi-native-fbank / torch.stft that the reference uses via native libraries
(reference: SURVEY.md §2.3).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .frames import frame_signal, window


@functools.lru_cache(maxsize=8)
def _dft_basis_np(n_fft: int):
    """Real-input DFT basis: returns (cos [n_fft, F], -sin [n_fft, F])."""
    f = n_fft // 2 + 1
    k = np.arange(f)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_basis_np(n_fft: int):
    """Inverse basis mapping (real, imag) bins back to time samples.

    x[n] = (1/n_fft) * sum_k w_k * (Re X_k cos(ang) - Im X_k sin(ang)),
    with w_k = 1 for DC/nyquist and 2 for interior bins (conjugate symmetry).
    """
    f = n_fft // 2 + 1
    k = np.arange(f)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    wk = np.full((1, f), 2.0)
    wk[0, 0] = 1.0
    if n_fft % 2 == 0:
        wk[0, -1] = 1.0
    re_b = (np.cos(ang) * wk / n_fft).astype(np.float32)
    im_b = (-np.sin(ang) * wk / n_fft).astype(np.float32)
    return re_b, im_b


def stft(
    x: jnp.ndarray,
    n_fft: int = 512,
    frame_length: int | None = None,
    frame_shift: int = 160,
    win: str = "hann",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., T] -> (real, imag) each [..., N, n_fft//2+1]."""
    frame_length = frame_length or n_fft
    frames = frame_signal(x, frame_length, frame_shift)
    w = window(win, frame_length)
    frames = frames * w
    if frame_length < n_fft:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - frame_length)]
        frames = jnp.pad(frames, pad)
    cos_b, msin_b = _dft_basis_np(n_fft)
    cos_b = jnp.asarray(cos_b)
    msin_b = jnp.asarray(msin_b)
    re = jnp.matmul(frames, cos_b, preferred_element_type=jnp.float32, precision='highest')
    im = jnp.matmul(frames, msin_b, preferred_element_type=jnp.float32, precision='highest')
    return re, im


def istft(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int = 512,
    frame_length: int | None = None,
    frame_shift: int = 160,
    win: str = "hann",
    length: int | None = None,
) -> jnp.ndarray:
    """(real, imag) [..., N, F] -> [..., T] via windowed overlap-add.

    Uses the standard synthesis normalization: sum of squared analysis
    windows in the overlap-add denominator.
    """
    frame_length = frame_length or n_fft
    re_b, im_b = _idft_basis_np(n_fft)
    frames = (
        jnp.matmul(re, jnp.asarray(re_b).T, preferred_element_type=jnp.float32, precision='highest')
        + jnp.matmul(im, jnp.asarray(im_b).T, preferred_element_type=jnp.float32, precision='highest')
    )
    frames = frames[..., :frame_length]
    w = window(win, frame_length)
    frames = frames * w

    n = frames.shape[-2]
    t_out = (n - 1) * frame_shift + frame_length
    sig = overlap_add(frames, frame_shift)
    # window-squared normalization
    wsq = jnp.tile(w * w, (n, 1))
    norm = overlap_add(wsq, frame_shift)
    sig = sig / jnp.maximum(norm, 1e-8)
    if length is not None:
        sig = sig[..., :length] if length <= t_out else jnp.pad(
            sig, [(0, 0)] * (sig.ndim - 1) + [(0, length - t_out)]
        )
    return sig


def overlap_add(frames: jnp.ndarray, frame_shift: int) -> jnp.ndarray:
    """[..., N, L] -> [..., (N-1)*shift + L] by scatter-add of frames.

    Expressed as a segment scatter with static indices so it jits with fixed
    shapes.
    """
    n, l = frames.shape[-2], frames.shape[-1]
    t_out = (n - 1) * frame_shift + l
    idx = (
        np.arange(n, dtype=np.int32)[:, None] * frame_shift
        + np.arange(l, dtype=np.int32)[None, :]
    ).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (n * l,))
    out = jnp.zeros(frames.shape[:-2] + (t_out,), frames.dtype)
    return out.at[..., idx].add(flat)
