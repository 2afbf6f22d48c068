"""Whisper-style encoder-decoder ASR (autoregressive family slot).

The reference registers a Whisper recognizer branch
(reference: speaker-identification-with-vad-non-streaming-asr.py:316-345,
`from_whisper(encoder, decoder, ...)`). This module implements the family
natively: mel-spectrogram encoder (transformer over the shared fbank
frontend) and a causal decoder with cross-attention, decoded greedily on
device with one lax.scan over output positions.

Decode keeps static shapes by re-running the (small) decoder over the full
max_decode_len prefix each step with a causal mask — O(L^2) recompute that
is trivially fused by XLA at these sizes; a KV-cache variant is the obvious
upgrade when long transcripts matter.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common import Conv1d, MultiHeadSelfAttention, lengths_to_mask, sinusoidal_positions
from ...ops.fbank import FbankConfig, log_mel_fbank


@dataclass(frozen=True)
class WhisperStyleConfig:
    vocab_size: int = 512
    dim: int = 256
    heads: int = 4
    enc_layers: int = 4
    dec_layers: int = 2
    ffn_mult: int = 4
    num_mel: int = 80
    max_decode_len: int = 96
    bos_id: int = 1
    eos_id: int = 2
    fbank: FbankConfig = field(default_factory=FbankConfig)


class CrossAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mem, mem_mask):
        d_head = self.dim // self.heads
        q = nn.Dense(self.dim, name="q")(x)
        k = nn.Dense(self.dim, name="k")(mem)
        v = nn.Dense(self.dim, name="v")(mem)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d_head)
        logits = logits + jnp.where(mem_mask[:, None, None, :], 0.0, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], self.dim)
        return nn.Dense(self.dim, name="out")(out)


class CausalSelfAttention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        t = x.shape[1]
        d_head = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(z):
            return z.reshape(z.shape[0], z.shape[1], self.heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d_head)
        causal = jnp.tril(jnp.ones((t, t), bool))
        logits = jnp.where(causal[None, None], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], t, self.dim)
        return nn.Dense(self.dim, name="out")(out)


class DecoderBlock(nn.Module):
    dim: int
    heads: int
    ffn_mult: int

    @nn.compact
    def __call__(self, x, mem, mem_mask):
        x = x + CausalSelfAttention(self.dim, self.heads, name="self_attn")(nn.LayerNorm()(x))
        x = x + CrossAttention(self.dim, self.heads, name="cross_attn")(nn.LayerNorm()(x), mem, mem_mask)
        h = nn.LayerNorm()(x)
        x = x + nn.Dense(self.dim)(jax.nn.gelu(nn.Dense(self.dim * self.ffn_mult)(h)))
        return x


class WhisperStyle(nn.Module):
    cfg: WhisperStyleConfig = WhisperStyleConfig()

    def setup(self):
        c = self.cfg
        self.sub1 = Conv1d(c.dim, 3, name="sub1")
        self.sub2 = Conv1d(c.dim, 3, stride=2, name="sub2")
        self.enc_blocks = [
            _EncBlock(c.dim, c.heads, c.ffn_mult, name=f"enc_{i}") for i in range(c.enc_layers)
        ]
        self.enc_ln = nn.LayerNorm(name="enc_ln")
        self.tok_embed = nn.Embed(c.vocab_size, c.dim, name="tok_embed")
        self.dec_blocks = [
            DecoderBlock(c.dim, c.heads, c.ffn_mult, name=f"dec_{i}") for i in range(c.dec_layers)
        ]
        self.dec_ln = nn.LayerNorm(name="dec_ln")

    def encode(self, feats, frame_mask):
        c = self.cfg
        x = jax.nn.gelu(self.sub1(feats))
        x = jax.nn.gelu(self.sub2(x))
        t = x.shape[1]
        if frame_mask is not None:
            lengths = jnp.sum(frame_mask.astype(jnp.int32), axis=-1)
            mask = jnp.arange(t)[None, :] < jnp.maximum((lengths + 1) // 2, 1)[:, None]
        else:
            mask = jnp.ones(x.shape[:2], bool)
        x = x + jnp.asarray(sinusoidal_positions(t, c.dim))[None]
        for blk in self.enc_blocks:
            x = blk(x, mask)
        return self.enc_ln(x), mask

    def decode_logits(self, tokens, mem, mem_mask):
        """tokens [B, L] -> logits [B, L, V] (teacher forcing / decode)."""
        c = self.cfg
        y = self.tok_embed(tokens)
        y = y + jnp.asarray(sinusoidal_positions(tokens.shape[1], c.dim))[None]
        for blk in self.dec_blocks:
            y = blk(y, mem, mem_mask)
        y = self.dec_ln(y)
        return y @ self.tok_embed.embedding.T

    def __call__(self, feats, frame_mask, tokens):
        mem, mem_mask = self.encode(feats, frame_mask)
        return self.decode_logits(tokens, mem, mem_mask)

    def greedy_decode(self, feats, frame_mask):
        """-> (ids [B, max_decode_len], lengths [B]); BOS/EOS stripped."""
        c = self.cfg
        mem, mem_mask = self.encode(feats, frame_mask)
        b = mem.shape[0]
        l = c.max_decode_len

        # materialize decoder params OUTSIDE the scan (flax init inside
        # lax.scan leaks tracers)
        _ = self.decode_logits(jnp.full((b, l), c.eos_id, jnp.int32), mem, mem_mask)

        def step(carry, i):
            tokens, done, count = carry
            logits = self.decode_logits(tokens, mem, mem_mask)  # [B, L, V]
            nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, c.eos_id, nxt)
            tokens = tokens.at[:, i + 1].set(jnp.where(i + 1 < l, nxt, tokens[:, -1]))
            emitted = (~done) & (nxt != c.eos_id)
            count = count + emitted.astype(jnp.int32)
            done = done | (nxt == c.eos_id)
            return (tokens, done, count), None

        tokens0 = jnp.full((b, l), c.eos_id, jnp.int32).at[:, 0].set(c.bos_id)
        (tokens, done, count), _ = jax.lax.scan(
            step, (tokens0, jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32)),
            jnp.arange(l - 1),
        )
        # strip BOS; positions beyond count hold EOS
        return tokens[:, 1:], count


class _EncBlock(nn.Module):
    dim: int
    heads: int
    ffn_mult: int

    @nn.compact
    def __call__(self, x, mask):
        x = x + MultiHeadSelfAttention(self.dim, self.heads, name="attn")(nn.LayerNorm()(x), mask)
        h = nn.LayerNorm()(x)
        x = x + nn.Dense(self.dim)(jax.nn.gelu(nn.Dense(self.dim * self.ffn_mult)(h)))
        if mask is not None:
            x = x * mask[..., None]
        return x


def whisper_frontend(wav: jnp.ndarray, wav_lengths: jnp.ndarray, cfg: WhisperStyleConfig):
    feats = log_mel_fbank(wav, cfg.fbank)
    f_len = jnp.maximum((wav_lengths - cfg.fbank.frame_length) // cfg.fbank.frame_shift + 1, 1)
    return feats, lengths_to_mask(f_len, feats.shape[1])
