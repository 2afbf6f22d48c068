"""Paraformer: non-autoregressive ASR with a CIF predictor.

The reference's alternate primary recognizer family
(reference: src/model.py:69-78, `OfflineRecognizer.from_paraformer`).
Structure (Paraformer, Gao et al. 2022), laid out for XLA:

- encoder: SAN-M-style transformer over LFR-stacked fbank (shared blocks);
- predictor: CIF (continuous integrate-and-fire) — per-frame weights alpha
  accumulate until threshold 1.0, each firing integrates the weighted
  frames into one acoustic token embedding. Implemented as one lax.scan
  with a static token capacity so shapes stay fixed;
- decoder: bidirectional (non-causal) transformer over the fired acoustic
  embeddings -> vocab logits; greedy output is a parallel argmax.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common import TransformerBlock, lengths_to_mask, sinusoidal_positions
from ...ops.fbank import FbankConfig, apply_lfr, log_mel_fbank


@dataclass(frozen=True)
class ParaformerConfig:
    vocab_size: int = 512
    dim: int = 320
    heads: int = 4
    enc_layers: int = 8
    dec_layers: int = 4
    ffn_mult: int = 4
    conv_kernel: int = 11
    lfr_m: int = 7
    lfr_n: int = 6
    num_mel: int = 80
    max_tokens: int = 128       # CIF output capacity per utterance
    cif_threshold: float = 1.0
    quant: str = "none"         # "int8": encoder projections on the s8 MXU
    fbank: FbankConfig = field(default_factory=FbankConfig)


def cif_integrate(h: jnp.ndarray, alpha: jnp.ndarray, max_tokens: int, threshold: float = 1.0):
    """Continuous integrate-and-fire with static output capacity.

    h [B, T, D] encoder states, alpha [B, T] non-negative firing weights ->
    (tokens [B, max_tokens, D], counts [B]). One lax.scan over T; each step
    accumulates alpha until it crosses `threshold`, splitting the crossing
    frame's weight between the firing token and the next accumulation.
    """
    b, t, d = h.shape

    def step(carry, inputs):
        acc_w, acc_v, count, out = carry  # [B], [B, D], [B], [B, max_tokens, D]
        a_t, h_t = inputs                  # [B], [B, D]
        total = acc_w + a_t
        fire = total >= threshold
        # weight used to finish the current token vs carried to the next
        used = jnp.where(fire, threshold - acc_w, a_t)
        rem = jnp.where(fire, total - threshold, 0.0)
        token = acc_v + used[:, None] * h_t
        idx = jnp.minimum(count, max_tokens - 1)
        out = jnp.where(
            fire[:, None, None],
            out.at[jnp.arange(b), idx].set(token),
            out,
        )
        count = count + fire.astype(jnp.int32)
        acc_v = jnp.where(fire[:, None], rem[:, None] * h_t, acc_v + used[:, None] * h_t)
        acc_w = jnp.where(fire, rem, total)
        return (acc_w, acc_v, count, out), None

    init = (
        jnp.zeros((b,)), jnp.zeros((b, d)), jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, max_tokens, d)),
    )
    (acc_w, acc_v, count, out), _ = jax.lax.scan(
        step, init, (alpha.T, h.transpose(1, 0, 2))
    )
    # tail: fire the residual if it carries enough mass (funasr tail handling)
    tail_fire = acc_w >= threshold * 0.5
    idx = jnp.minimum(count, max_tokens - 1)
    out = jnp.where(tail_fire[:, None, None], out.at[jnp.arange(b), idx].set(acc_v), out)
    count = jnp.minimum(count + tail_fire.astype(jnp.int32), max_tokens)
    return out, count


class Paraformer(nn.Module):
    cfg: ParaformerConfig = ParaformerConfig()

    @nn.compact
    def __call__(self, feats: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None,
                 mesh=None, sp_axis: str = "data"):
        """[B, T_lfr, lfr_m*mel] -> (logits [B, max_tokens, V], counts [B]).

        ``mesh`` runs the ENCODER blocks sequence-parallel (ring attention
        over ``sp_axis``); the CIF integration and the NAR decoder over
        acoustic tokens stay dense — max_tokens is short and CIF's
        cumulative firing is inherently sequential over frames.
        """
        c = self.cfg
        x = nn.Dense(c.dim, name="in_proj")(feats)
        t = x.shape[1]
        mask = frame_mask if frame_mask is not None else jnp.ones(x.shape[:2], bool)
        x = x + jnp.asarray(sinusoidal_positions(t, c.dim))[None]
        blk_mask = mask
        if mesh is not None:
            # warning-clean SP entry/exit (parallel/sp_encoder.sp_seq_shard)
            from ...parallel.sp_encoder import sp_seq_shard, sp_seq_unshard

            x, blk_mask, orig_t = sp_seq_shard(x, mask, mesh, sp_axis)
        for i in range(c.enc_layers):
            x = TransformerBlock(c.dim, c.heads, c.ffn_mult, c.conv_kernel,
                                 quant=c.quant,
                                 name=f"enc_{i}")(x, blk_mask, mesh, sp_axis)
        if mesh is not None:
            x = sp_seq_unshard(x, mesh, orig_t)
        x = nn.LayerNorm(name="enc_ln")(x)

        # CIF predictor: per-frame firing weight
        a = nn.Dense(c.dim, name="cif_hidden")(x)
        a = jax.nn.relu(a)
        alpha = jax.nn.sigmoid(nn.Dense(1, name="cif_out")(a))[..., 0]
        alpha = alpha * mask.astype(alpha.dtype)
        tokens, counts = cif_integrate(x, alpha, c.max_tokens, c.cif_threshold)

        # NAR decoder over acoustic tokens
        tok_mask = jnp.arange(c.max_tokens)[None, :] < counts[:, None]
        y = tokens + jnp.asarray(sinusoidal_positions(c.max_tokens, c.dim))[None]
        for i in range(c.dec_layers):
            y = TransformerBlock(c.dim, c.heads, c.ffn_mult, 0, name=f"dec_{i}")(y, tok_mask)
        y = nn.LayerNorm(name="dec_ln")(y)
        logits = nn.Dense(c.vocab_size, name="out")(y)
        return logits, counts


def paraformer_greedy(logits: jnp.ndarray, counts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Parallel argmax over fired tokens -> (ids [B, max_tokens], lengths)."""
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    mask = jnp.arange(ids.shape[1])[None, :] < counts[:, None]
    return jnp.where(mask, ids, 0), counts


def paraformer_frontend(wav: jnp.ndarray, wav_lengths: jnp.ndarray, cfg: ParaformerConfig,
                        cmvn_mean=None, cmvn_istd=None):
    """CMVN semantics match sensevoice_frontend (am.mvn AddShift/Rescale,
    post-LFR for lfr_m*num_mel stats, pre-LFR for per-mel stats)."""
    feats = log_mel_fbank(wav, cfg.fbank)
    pre_lfr = cmvn_mean is not None and cmvn_mean.shape[-1] == feats.shape[-1]
    if pre_lfr:
        feats = feats + cmvn_mean
        if cmvn_istd is not None:
            feats = feats * cmvn_istd
    lfr = apply_lfr(feats, cfg.lfr_m, cfg.lfr_n)
    if cmvn_mean is not None and not pre_lfr:
        lfr = lfr + cmvn_mean
        if cmvn_istd is not None:
            lfr = lfr * cmvn_istd
    f_len = jnp.maximum((wav_lengths - cfg.fbank.frame_length) // cfg.fbank.frame_shift + 1, 0)
    lfr_len = jnp.maximum(jnp.ceil(f_len / cfg.lfr_n).astype(jnp.int32), 1)
    return lfr, lengths_to_mask(lfr_len, lfr.shape[1])
