"""Kaldi-compatible log-mel filterbank frontend, fully on device.

TPU-native equivalent of the kaldi-native-fbank feature extraction inside
sherpa-onnx's C++ core (reference: SURVEY.md §2.3; every recognizer and the
speaker embedding extractor consume 80-dim fbank at 16 kHz). The whole
frontend — DC removal, pre-emphasis, povey window, DFT power spectrum, mel
projection, log — compiles to one XLA program whose heavy ops are two MXU
matmuls (frames x DFT basis, power x mel weights).

Defaults mirror kaldi: frame 25 ms / shift 10 ms, preemph 0.97, povey window,
snip_edges, 80 bins over [20 Hz, nyquist], no dither (deterministic).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .frames import frame_signal, num_frames, window
from .stft import _dft_basis_np


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.lru_cache(maxsize=16)
def mel_filterbank_np(
    num_bins: int,
    n_fft: int,
    sample_rate: int,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank -> [n_fft//2 + 1, num_bins].

    high_freq <= 0 means nyquist + high_freq (kaldi semantics).
    """
    nyq = sample_rate / 2.0
    if high_freq <= 0.0:
        high_freq = nyq + high_freq

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    mel_lo, mel_hi = mel(low_freq), mel(high_freq)
    mel_pts = np.linspace(mel_lo, mel_hi, num_bins + 2)
    fft_freqs = np.arange(n_fft // 2 + 1) * (sample_rate / n_fft)
    fft_mel = mel(fft_freqs)

    fb = np.zeros((n_fft // 2 + 1, num_bins), dtype=np.float32)
    for b in range(num_bins):
        left, center, right = mel_pts[b], mel_pts[b + 1], mel_pts[b + 2]
        up = (fft_mel - left) / (center - left)
        down = (right - fft_mel) / (right - center)
        fb[:, b] = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    return fb


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    preemph: float = 0.97
    window: str = "povey"
    low_freq: float = 20.0
    high_freq: float = 0.0
    remove_dc: bool = True
    use_energy: bool = False
    log_floor: float = 1.1920928955078125e-07  # FLT_EPSILON, kaldi's floor

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def n_fft(self) -> int:
        return _next_pow2(self.frame_length)

    def frames_for(self, n_samples: int) -> int:
        return num_frames(n_samples, self.frame_length, self.frame_shift)


def _use_pallas_default() -> bool:
    import jax

    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def log_mel_fbank(
    x: jnp.ndarray, cfg: FbankConfig = FbankConfig(), use_pallas: Optional[bool] = None
) -> jnp.ndarray:
    """[..., T] float waveform in [-1, 1] -> [..., N, num_bins] log-mel.

    Kaldi operates on int16-range waveforms; inputs here are float in
    [-1, 1], scaled by 32768 internally so magnitudes match kaldi-native-fbank
    conventions (matters for log-domain CMVN stats reused across models).

    On TPU the DFT-power-mel-log chain runs as a fused Pallas kernel
    (ops/pallas/fbank_kernel.py); elsewhere (or with use_pallas=False) the
    plain XLA matmul path below is both implementation and numeric oracle.
    """
    x = x.astype(jnp.float32) * 32768.0
    frames = frame_signal(x, cfg.frame_length, cfg.frame_shift)
    if cfg.remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemph > 0:
        first = frames[..., :1] * (1.0 - cfg.preemph)
        rest = frames[..., 1:] - cfg.preemph * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    w = window(cfg.window, cfg.frame_length)
    frames = frames * w
    n_fft = cfg.n_fft
    if cfg.frame_length < n_fft:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, n_fft - cfg.frame_length)]
        frames = jnp.pad(frames, pad)
    explicit = use_pallas is not None
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from .pallas.fbank_kernel import choose_tile, fbank_power_mel_pallas

        # wide frontends (e.g. 64 ms / 128 mel) can overflow the kernel's
        # scoped-VMEM budget even at the minimum tile — use the XLA path
        if choose_tile(n_fft, cfg.num_bins) is not None:
            return fbank_power_mel_pallas(
                frames, n_fft, cfg.num_bins, cfg.sample_rate, cfg.low_freq,
                cfg.high_freq, cfg.log_floor,
            )
        if explicit:
            # an EXPLICIT use_pallas=True that can't be honored is visible
            # once (fbank_power_mel_pallas itself raises for this config;
            # the dispatcher reroutes, so warn instead of diverging
            # silently — a perf cliff the caller asked not to have)
            import warnings

            warnings.warn(
                f"log_mel_fbank(use_pallas=True): n_fft={n_fft}/"
                f"num_bins={cfg.num_bins} exceeds the fused kernel's VMEM "
                "budget; using the XLA path", stacklevel=2)
    cos_b, msin_b = _dft_basis_np(n_fft)
    re = jnp.matmul(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32, precision='highest')
    im = jnp.matmul(frames, jnp.asarray(msin_b), preferred_element_type=jnp.float32, precision='highest')
    power = re * re + im * im
    mel_w = jnp.asarray(
        mel_filterbank_np(cfg.num_bins, n_fft, cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    )
    mel_e = jnp.matmul(power, mel_w, preferred_element_type=jnp.float32, precision='highest')
    return jnp.log(jnp.maximum(mel_e, cfg.log_floor))


def apply_lfr(feats: jnp.ndarray, lfr_m: int = 7, lfr_n: int = 6) -> jnp.ndarray:
    """Low-frame-rate stacking (Paraformer/SenseVoice frontend).

    [..., N, D] -> [..., ceil(N/lfr_n), lfr_m*D]: each output frame stacks
    lfr_m consecutive input frames, hopping lfr_n, left-padded by repeating
    the first frame (funasr convention).
    """
    n = feats.shape[-2]
    d = feats.shape[-1]
    left = (lfr_m - 1) // 2
    head = jnp.repeat(feats[..., :1, :], left, axis=-2)
    padded = jnp.concatenate([head, feats], axis=-2)
    n_pad = padded.shape[-2]
    n_out = int(np.ceil(n / lfr_n))
    need = (n_out - 1) * lfr_n + lfr_m
    if need > n_pad:
        tail = jnp.repeat(padded[..., -1:, :], need - n_pad, axis=-2)
        padded = jnp.concatenate([padded, tail], axis=-2)
    idx = (
        np.arange(n_out, dtype=np.int32)[:, None] * lfr_n
        + np.arange(lfr_m, dtype=np.int32)[None, :]
    )
    stacked = padded[..., idx, :]  # [..., n_out, lfr_m, D]
    return stacked.reshape(stacked.shape[:-2] + (lfr_m * d,))


def apply_cmvn(feats: jnp.ndarray, mean: jnp.ndarray | None, istd: jnp.ndarray | None) -> jnp.ndarray:
    """Global CMVN: (x + neg_mean) * inv_stddev, identity when stats absent."""
    if mean is not None:
        feats = feats + mean
    if istd is not None:
        feats = feats * istd
    return feats
