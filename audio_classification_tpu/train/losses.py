"""Training losses: permutation-invariant negative SI-SDR.

The reference ships no training loop (SURVEY.md §5.4 — inference only); the
framework adds one so separators can be trained/fine-tuned natively on TPU.
The PIT loss reuses the same static assignment enumeration as evaluation
(metrics/sisdr.py), fully batched on device and differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.sisdr import _assignments


def si_sdr_loss_matrix(refs: jnp.ndarray, ests: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Differentiable pairwise SI-SDR [B, K, N] (dB) over masked samples."""
    m = mask[:, None, :]
    count = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)[:, None, None]
    r = (refs - jnp.sum(refs * m, -1, keepdims=True) / count) * m
    e = (ests - jnp.sum(ests * m, -1, keepdims=True) / count) * m
    dots = jnp.einsum("bkt,bnt->bkn", r, e)
    r_e = jnp.sum(r * r, -1) + eps
    e_e = jnp.sum(e * e, -1) + eps
    scale = dots / r_e[..., None]
    proj = scale * scale * r_e[..., None] + eps
    noise = jnp.maximum(e_e[:, None, :] - 2 * scale * dots + scale * scale * r_e[..., None], eps)
    return 10.0 * (jnp.log10(proj) - jnp.log10(noise))


def frame_bce_loss(probs: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Masked binary cross-entropy over frames (OSD / VAD heads).

    probs, labels [..., T(, C)], mask broadcastable over the frame axis.
    """
    p = jnp.clip(probs, eps, 1.0 - eps)
    bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    m = mask.astype(bce.dtype)
    while m.ndim < bce.ndim:
        m = m[..., None]
    return jnp.sum(bce * m) / jnp.maximum(jnp.sum(m) * (bce.size / m.size if m.size else 1.0), 1.0)


def aam_softmax_loss(
    embeddings: jnp.ndarray, labels: jnp.ndarray, weight: jnp.ndarray,
    margin: float = 0.2, scale: float = 30.0,
) -> jnp.ndarray:
    """Additive-angular-margin softmax (speaker-embedding training).

    embeddings [B, D] (any norm), labels [B] int, weight [C, D] class
    centers. The standard ArcFace objective used to train ERes2Net-style
    speaker models.
    """
    e = embeddings / jnp.maximum(jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12)
    w = weight / jnp.maximum(jnp.linalg.norm(weight, axis=-1, keepdims=True), 1e-12)
    cos = e @ w.T  # [B, C]
    theta = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
    onehot = jax.nn.one_hot(labels, w.shape[0])
    cos_m = jnp.cos(theta + margin)
    logits = scale * (onehot * cos_m + (1.0 - onehot) * cos)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def pit_si_sdr_loss(ests: jnp.ndarray, refs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over batch of -(best mean SI-SDR over source permutations).

    ests [B, N, T], refs [B, K, T], mask [B, T]. K == N in training.
    """
    k, n = refs.shape[1], ests.shape[1]
    sdr = si_sdr_loss_matrix(refs, ests, mask)  # [B, K, N]
    assigns = np.asarray(_assignments(n, k), dtype=np.int32)  # [M, K]
    picked = sdr[:, np.arange(k)[None, :], assigns]  # [B, M, K]
    best = jnp.max(jnp.mean(picked, axis=-1), axis=-1)  # [B]
    return -jnp.mean(best)
