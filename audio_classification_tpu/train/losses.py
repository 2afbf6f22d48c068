"""Training losses: permutation-invariant negative SI-SDR.

The reference ships no training loop (SURVEY.md §5.4 — inference only); the
framework adds one so separators can be trained/fine-tuned natively on TPU.
The PIT loss reuses the same static assignment enumeration as evaluation
(metrics/sisdr.py), fully batched on device and differentiable.
"""
from __future__ import annotations

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
