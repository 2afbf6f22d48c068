"""Modified beam search core shared by the transducer decoders.

The reference's recognizers accept ``decoding_method="modified_beam_search"``
and route it to sherpa-onnx's beam decoder with ``num_active_paths``
hypotheses (reference: src/model.py:47-99 passes the flag through to
OfflineRecognizer). This module is that search restated once for the MXU,
used by BOTH the native flax transducer (models/asr/transducer.Transducer
.beam_decode) and the imported-graph decoder (models/convert/onnx_stage
.OnnxTransducerStage._beam_search) — only the per-frame scoring callback
differs between them.

Search shape: hypotheses live on a static beam axis next to the batch axis,
every frame scores all beam*vocab continuations with one batched
predictor/joiner call, and a top-k over the flattened candidates (blank
continuation included) re-forms the beam — one lax.scan over frames, then a
reverse scan over recorded (parent, symbol) pairs backtracks the best
hypothesis. No hypothesis merging: sherpa sums probabilities of beams that
reach identical token prefixes; keeping slots distinct is cheaper on device
and can only under-report a hypothesis's true mass (scores stay admissible
lower bounds). ``beam=1`` reduces exactly to the greedy argmax recursion.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = jnp.float32(-1e30)


def left_pack_symbols(syms_bt: jnp.ndarray, blank_id: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] per-frame symbols (blank at non-emitting frames) ->
    (ids [B, T] left-packed + blank-padded, counts [B])."""
    b, t = syms_bt.shape
    emit = syms_bt != blank_id
    counts = jnp.sum(emit.astype(jnp.int32), axis=1)
    pos = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1
    scatter = jnp.where(emit, pos, t)
    packed = jnp.full((b, t + 1), blank_id, jnp.int32)
    packed = packed.at[jnp.arange(b)[:, None], scatter].set(syms_bt)[:, :t]
    return packed, counts


def modified_beam_search(
    enc: jnp.ndarray,
    mask: jnp.ndarray,
    score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    *,
    blank_id: int,
    context: int,
    beam: int,
    return_score: bool = False,
):
    """Run the search over encoder frames.

    ``enc`` [B, T, D], ``mask`` [B, T] bool. ``score_fn(e_t, ctx)`` maps one
    frame's encoder output [B, D] plus every hypothesis's predictor context
    [B, K, context] int32 to joiner logits [B, K, V].

    Returns ``(ids [B, T], counts [B])`` — ids left-packed, blank-padded —
    plus the best hypothesis's accumulated log-probability [B] when
    ``return_score`` is set.
    """
    b, t, _ = enc.shape
    k = int(beam)
    beam_iota = jnp.arange(k, dtype=jnp.int32)[None, :]  # [1, K]

    def step(carry, inputs):
        ctx, scores = carry        # [B, K, context], [B, K]
        e_t, m_t = inputs          # [B, D], [B]
        logits = score_fn(e_t, ctx)                      # [B, K, V]
        vocab = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = scores[:, :, None] + logp                 # [B, K, V]
        top_scores, top_idx = jax.lax.top_k(
            cand.reshape(b, k * vocab), k)               # [B, K]
        parent = (top_idx // vocab).astype(jnp.int32)
        sym = (top_idx % vocab).astype(jnp.int32)
        emit = sym != blank_id
        parent_ctx = jnp.take_along_axis(ctx, parent[:, :, None], axis=1)
        new_ctx = jnp.where(
            emit[:, :, None],
            jnp.concatenate([parent_ctx[:, :, 1:], sym[:, :, None]], axis=2),
            parent_ctx,
        )
        # padded frame: freeze the beam (identity parents, no emission)
        live = m_t[:, None]                              # [B, 1]
        new_ctx = jnp.where(live[:, :, None], new_ctx, ctx)
        new_scores = jnp.where(live, top_scores, scores)
        parent = jnp.where(live, parent, beam_iota)
        out_sym = jnp.where(live & emit, sym, blank_id)
        return (new_ctx, new_scores), (parent, out_sym)

    ctx0 = jnp.full((b, k, context), blank_id, jnp.int32)
    # only slot 0 starts alive, else top_k would fill the beam with k
    # copies of the same empty hypothesis
    scores0 = jnp.where(beam_iota == 0, 0.0, _NEG_INF) * jnp.ones((b, 1))
    (_, final_scores), (parents, syms) = jax.lax.scan(
        step, (ctx0, scores0.astype(jnp.float32)),
        (enc.transpose(1, 0, 2), mask.T),
    )  # parents/syms: [T, B, K]

    best = jnp.argmax(final_scores, axis=-1).astype(jnp.int32)  # [B]

    def back(cur, inputs):
        par_t, sym_t = inputs  # [B, K]
        s = jnp.take_along_axis(sym_t, cur[:, None], axis=1)[:, 0]
        nxt = jnp.take_along_axis(par_t, cur[:, None], axis=1)[:, 0]
        return nxt, s

    _, best_syms = jax.lax.scan(back, best, (parents, syms), reverse=True)
    packed, counts = left_pack_symbols(best_syms.T, blank_id)
    if return_score:
        return packed, counts, jnp.max(final_scores, axis=-1)
    return packed, counts
