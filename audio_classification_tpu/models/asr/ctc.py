"""Greedy CTC decode on device.

Replaces the greedy_search decode inside sherpa-onnx's C++ recognizer
(reference: src/model.py:37-100, decoding_method="greedy_search"). The whole
batch decodes in one XLA program: framewise argmax, repeat-collapse and
blank-removal run as vectorized ops over the padded time axis; only the
final (ids, lengths) arrays cross back to the host where the token table
renders text.
"""
from __future__ import annotations

import jax.numpy as jnp


def ctc_greedy_decode(
    logits: jnp.ndarray, frame_mask: jnp.ndarray, blank_id: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T, V] logits + [B, T] mask -> (ids [B, T], lengths [B]).

    ids[b, :lengths[b]] are the collapsed non-blank tokens, left-packed;
    positions beyond the length are blank_id.
    """
    best = jnp.argmax(logits, axis=-1)  # [B, T]
    prev = jnp.concatenate([jnp.full_like(best[:, :1], blank_id), best[:, :-1]], axis=1)
    keep = (best != blank_id) & (best != prev) & frame_mask.astype(bool)
    # left-pack kept tokens: position = cumsum(keep) - 1
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    lengths = jnp.sum(keep.astype(jnp.int32), axis=1)
    t = best.shape[1]
    out = jnp.full_like(best, blank_id)
    # scatter kept tokens to their packed positions (dropped ones go to slot T)
    scatter_pos = jnp.where(keep, pos, t)
    padded = jnp.concatenate([out, jnp.full_like(best[:, :1], blank_id)], axis=1)
    packed = padded.at[jnp.arange(best.shape[0])[:, None], scatter_pos].set(best)[:, :t]
    return packed, lengths


def ctc_loss(
    logits: jnp.ndarray,
    frame_mask: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Mean CTC negative log-likelihood (training path) via optax."""
    import optax

    logit_pad = 1.0 - frame_mask.astype(jnp.float32)
    label_pad = (
        jnp.arange(labels.shape[1])[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=blank_id)
    return jnp.mean(per_seq)
