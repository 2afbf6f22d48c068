"""Overlapped-speech detection segmenter.

TPU-native replacement for the pyannote `OverlappedSpeechDetection` pipeline
the reference wraps (reference: src/osd/osd.py:20-147). Instead of
SincNet+LSTM (sequential, TPU-hostile), the segmenter is a small
transformer over the shared log-mel frontend: conv subsampling x4, then
MHSA blocks — fully parallel over time, MXU-friendly, one XLA program per
length bucket.

Heads emit per-frame probabilities for {speech, overlap}; the pipeline
thresholds `overlap`, projects frame probabilities onto the reference's
win/hop raster grid, and reuses the identical flags->segments algebra
(engine/segments.py) so post-processing semantics match the reference
exactly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import Conv1d, TransformerBlock, sinusoidal_positions


@dataclass(frozen=True)
class OSDConfig:
    num_mel: int = 80
    dim: int = 256
    heads: int = 4
    layers: int = 4
    conv_kernel: int = 9
    subsample: int = 4          # output frame rate = fbank rate / subsample
    sample_rate: int = 16000
    frame_shift_ms: float = 10.0

    @property
    def out_frame_sec(self) -> float:
        return self.frame_shift_ms / 1000.0 * self.subsample


class OSDNet(nn.Module):
    """[B, T, mel] fbank (+ frame mask) -> [B, T//subsample, 2] probs.

    Output channels: [:, :, 0] = p(speech), [:, :, 1] = p(overlap).
    """

    cfg: OSDConfig = OSDConfig()

    @nn.compact
    def __call__(self, feats: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        x = Conv1d(c.dim, 5, stride=2, name="sub1")(feats)
        x = jax.nn.gelu(x)
        x = Conv1d(c.dim, 5, stride=2, name="sub2")(x)
        x = jax.nn.gelu(x)
        t = x.shape[1]
        mask = None
        if frame_mask is not None:
            lengths = jnp.sum(frame_mask.astype(jnp.int32), axis=-1)
            out_len = jnp.maximum((lengths + c.subsample - 1) // c.subsample, 1)
            mask = jnp.arange(t)[None, :] < out_len[:, None]
        pos = jnp.asarray(sinusoidal_positions(t, c.dim))
        x = x + pos[None]
        for i in range(c.layers):
            x = TransformerBlock(c.dim, c.heads, conv_kernel=c.conv_kernel, name=f"block_{i}")(x, mask)
        logits = nn.Dense(2, name="head")(x)
        probs = jax.nn.sigmoid(logits)
        if mask is not None:
            probs = probs * mask[..., None]
        return probs


def probs_to_hop_flags(
    overlap_probs: np.ndarray,
    n_out_frames: int,
    dur: float,
    out_frame_sec: float,
    threshold: float,
    win_sec: float,
    hop_sec: float,
) -> np.ndarray:
    """Project model-frame overlap probabilities onto the reference's
    win/hop raster grid (reference: src/osd/osd.py:99-108).

    Model frames above `threshold` become overlap intervals on their own
    timeline; a hop-grid point g is flagged when g >= s - win/2 and g <= e
    for some flagged model interval — identical to how the reference maps
    pyannote Annotation tracks to flags.
    """
    from ..engine.segments import rasterize_intervals

    p = np.asarray(overlap_probs)[:n_out_frames]
    on = p > threshold
    intervals = []
    i = 0
    while i < len(on):
        if on[i]:
            j = i
            while j + 1 < len(on) and on[j + 1]:
                j += 1
            intervals.append((i * out_frame_sec, min((j + 1) * out_frame_sec, dur)))
            i = j + 1
        else:
            i += 1
    return rasterize_intervals(intervals, dur, win_sec, hop_sec)
