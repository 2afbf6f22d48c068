"""Voice activity detection (silero-VAD-equivalent slot).

The reference builds a sherpa-onnx silero-VAD detector with min_silence /
min_speech hysteresis (reference: speaker-identification-with-vad-...py:
510-520 — constructed though never fed in its eval loop; the streaming and
run.sh paths use it). Here:

- `VADNet`: small conv encoder + per-frame speech probability, sharing the
  log-mel frontend (parallel over time; the reference model's recurrence is
  replaced by a temporal conv stack with an equivalent receptive field).
- `VoiceActivityDetector`: hysteresis state machine turning frame
  probabilities into speech segments with min_silence/min_speech rules.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import Conv1d


@dataclass(frozen=True)
class VADConfig:
    num_mel: int = 80
    dim: int = 96
    layers: int = 3
    kernel: int = 5
    sample_rate: int = 16000
    frame_shift_ms: float = 10.0
    threshold: float = 0.5
    min_silence_duration: float = 0.25   # reference defaults (:512-516)
    min_speech_duration: float = 0.25


class VADNet(nn.Module):
    """[B, T, mel] -> [B, T] speech probability."""

    cfg: VADConfig = VADConfig()

    @nn.compact
    def __call__(self, feats: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        x = feats
        for i in range(c.layers):
            x = Conv1d(c.dim, c.kernel, dilation=2**i, name=f"conv_{i}")(x)
            x = jax.nn.gelu(x)
        p = jax.nn.sigmoid(nn.Dense(1, name="head")(x))[..., 0]
        if frame_mask is not None:
            p = p * frame_mask
        return p


class VoiceActivityDetector:
    """Hysteresis post-processing: frame probs -> [(start_sec, end_sec)]."""

    def __init__(self, cfg: VADConfig = VADConfig()):
        self.cfg = cfg

    def segments(self, probs, dur: float) -> List[Tuple[float, float]]:
        import numpy as np

        c = self.cfg
        frame_sec = c.frame_shift_ms / 1000.0
        on = np.asarray(probs) > c.threshold
        segs: List[Tuple[float, float]] = []
        start = None
        last_true = None
        for i, f in enumerate(on):
            t = i * frame_sec
            if f:
                if start is None:
                    start = t
                last_true = t + frame_sec
            elif start is not None and t - last_true >= c.min_silence_duration:
                segs.append((start, min(last_true, dur)))
                start = None
        if start is not None:
            segs.append((start, min(dur, last_true if last_true else dur)))
        return [(s, e) for s, e in segs if e - s >= c.min_speech_duration - 1e-9]
