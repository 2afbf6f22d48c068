"""Whisper-style encoder-decoder ASR (autoregressive family).

The reference registers a Whisper recognizer branch
(reference: speaker-identification-with-vad-non-streaming-asr.py:316-345,
`from_whisper(encoder, decoder, ...)`). This module implements the family
natively: mel-spectrogram encoder (transformer over the shared fbank
frontend) and a causal decoder with cross-attention.

Greedy decode runs on device as one lax.scan over output positions with
per-layer KV caches: self-attention K/V append into [B, L, H, Dh] cache
arrays carried through the scan, and cross-attention K/V are precomputed
once from the encoder memory — O(L) decode instead of full-prefix
recompute.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..common import (Conv1d, DenseQ, MultiHeadSelfAttention, lengths_to_mask,
                      sinusoidal_positions)
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
    quant: str = "none"   # "int8": encoder projections on the s8 MXU
                          # (decoder stays float: per-step AR matmuls)
    fbank: FbankConfig = field(default_factory=FbankConfig)


def _split_heads(t, heads):
    b, l, d = t.shape
    return t.reshape(b, l, heads, d // heads)


class CausalSelfAttention(nn.Module):
    dim: int
    heads: int

    def setup(self):
        self.qkv = nn.Dense(3 * self.dim, name="qkv")
        self.out = nn.Dense(self.dim, name="out")

    def __call__(self, x):
        """Full-sequence causal attention (teacher forcing)."""
        t = x.shape[1]
        q, k, v = jnp.split(self.qkv(x), 3, axis=-1)
        q, k, v = (_split_heads(z, self.heads) for z in (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(self.dim // self.heads)
        causal = jnp.tril(jnp.ones((t, t), bool))
        attn = jax.nn.softmax(jnp.where(causal[None, None], logits, -1e9), axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(x.shape)
        return self.out(o)

    def step(self, x_t, k_cache, v_cache, pos):
        """One token with KV cache.

        x_t [B, 1, D]; k_cache/v_cache [B, L, H, Dh]; pos scalar int.
        -> (y_t [B, 1, D], k_cache, v_cache)
        """
        q, k, v = jnp.split(self.qkv(x_t), 3, axis=-1)
        q = _split_heads(q, self.heads)  # [B, 1, H, Dh]
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, _split_heads(k, self.heads), pos, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, _split_heads(v, self.heads), pos, axis=1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache) / np.sqrt(self.dim // self.heads)
        valid = (jnp.arange(k_cache.shape[1]) <= pos)[None, None, None, :]
        attn = jax.nn.softmax(jnp.where(valid, logits, -1e9), axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v_cache).reshape(x_t.shape)
        return self.out(o), k_cache, v_cache


class CrossAttention(nn.Module):
    dim: int
    heads: int

    def setup(self):
        self.q_proj = nn.Dense(self.dim, name="q")
        self.k_proj = nn.Dense(self.dim, name="k")
        self.v_proj = nn.Dense(self.dim, name="v")
        self.out = nn.Dense(self.dim, name="out")

    def precompute(self, mem):
        return _split_heads(self.k_proj(mem), self.heads), _split_heads(self.v_proj(mem), self.heads)

    def attend(self, x, mem_k, mem_v, mem_mask):
        q = _split_heads(self.q_proj(x), self.heads)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, mem_k) / np.sqrt(self.dim // self.heads)
        logits = logits + jnp.where(mem_mask[:, None, None, :], 0.0, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, mem_v).reshape(x.shape)
        return self.out(o)

    def __call__(self, x, mem, mem_mask):
        mem_k, mem_v = self.precompute(mem)
        return self.attend(x, mem_k, mem_v, mem_mask)


class DecoderBlock(nn.Module):
    dim: int
    heads: int
    ffn_mult: int

    def setup(self):
        self.ln1 = nn.LayerNorm()
        self.ln2 = nn.LayerNorm()
        self.ln3 = nn.LayerNorm()
        self.self_attn = CausalSelfAttention(self.dim, self.heads, name="self_attn")
        self.cross_attn = CrossAttention(self.dim, self.heads, name="cross_attn")
        self.fc1 = nn.Dense(self.dim * self.ffn_mult)
        self.fc2 = nn.Dense(self.dim)

    def _ffn(self, x):
        return x + self.fc2(jax.nn.gelu(self.fc1(self.ln3(x))))

    def __call__(self, x, mem, mem_mask):
        x = x + self.self_attn(self.ln1(x))
        x = x + self.cross_attn(self.ln2(x), mem, mem_mask)
        return self._ffn(x)

    def step(self, x_t, k_cache, v_cache, pos, mem_k, mem_v, mem_mask):
        a, k_cache, v_cache = self.self_attn.step(self.ln1(x_t), k_cache, v_cache, pos)
        x_t = x_t + a
        x_t = x_t + self.cross_attn.attend(self.ln2(x_t), mem_k, mem_v, mem_mask)
        return self._ffn(x_t), k_cache, v_cache


class _EncBlock(nn.Module):
    dim: int
    heads: int
    ffn_mult: int
    quant: str = "none"  # "int8": attention + FFN projections on the s8 MXU

    @nn.compact
    def __call__(self, x, mask, mesh=None, sp_axis: str = "data"):
        quant = self.quant if mesh is None else "none"
        x = x + MultiHeadSelfAttention(self.dim, self.heads, quant=quant,
                                       name="attn")(
            nn.LayerNorm()(x), mask, mesh, sp_axis)
        h = nn.LayerNorm()(x)
        # explicit names keep the flax-auto param paths ("Dense_0" = down
        # proj, "Dense_1" = up proj — construction order) every checkpoint
        # and ONNX mapping already uses
        up = DenseQ(self.dim * self.ffn_mult, quant=quant, name="Dense_1")(h, mask)
        x = x + DenseQ(self.dim, quant=quant, name="Dense_0")(jax.nn.gelu(up), mask)
        if mask is not None:
            x = x * mask[..., None]
        return x


class WhisperStyle(nn.Module):
    cfg: WhisperStyleConfig = WhisperStyleConfig()

    def setup(self):
        c = self.cfg
        self.sub1 = Conv1d(c.dim, 3, name="sub1")
        # kernel-centered explicit padding (torch pad=k//2): XLA "SAME"
        # under stride 2 splits pads by input-length parity, which would
        # break cross-bucket padded-vs-solo exactness
        self.sub2 = Conv1d(c.dim, 3, stride=2, padding=((1, 1),), name="sub2")
        self.enc_blocks = [
            _EncBlock(c.dim, c.heads, c.ffn_mult, quant=c.quant,
                      name=f"enc_{i}") for i in range(c.enc_layers)
        ]
        self.enc_ln = nn.LayerNorm(name="enc_ln")
        self.tok_embed = nn.Embed(c.vocab_size, c.dim, name="tok_embed")
        self.dec_blocks = [
            DecoderBlock(c.dim, c.heads, c.ffn_mult, name=f"dec_{i}") for i in range(c.dec_layers)
        ]
        self.dec_ln = nn.LayerNorm(name="dec_ln")

    def encode(self, feats, frame_mask, mesh=None, sp_axis: str = "data"):
        """``mesh`` enables sequence parallelism: every encoder block's
        attention runs ring-parallel over ``sp_axis`` with the frame mask
        rotating the ring (same params as the dense path; the SenseVoice
        encoder has the identical switch)."""
        c = self.cfg
        if frame_mask is not None:
            # padded fbank frames hold the log-mel floor (nonzero); zero
            # them so sub1's boundary windows match a solo run's SAME pad
            feats = feats * frame_mask[..., None].astype(feats.dtype)
        x = jax.nn.gelu(self.sub1(feats))
        if frame_mask is not None:
            # boundary-frame leak guard (the repo-wide padded-vs-solo rule,
            # CLAUDE.md): gelu(bias) at padded positions is nonzero and
            # sub2's stride-2 window at the last valid frame would read it;
            # a solo run sees SAME zero-padding there instead.
            x = x * frame_mask[..., None].astype(x.dtype)
        x = jax.nn.gelu(self.sub2(x))
        t = x.shape[1]
        if frame_mask is not None:
            lengths = jnp.sum(frame_mask.astype(jnp.int32), axis=-1)
            mask = jnp.arange(t)[None, :] < jnp.maximum((lengths + 1) // 2, 1)[:, None]
        else:
            mask = jnp.ones(x.shape[:2], bool)
        x = x + jnp.asarray(sinusoidal_positions(t, c.dim))[None]
        blk_mask = mask
        if mesh is not None:
            # warning-clean SP entry/exit (parallel/sp_encoder.sp_seq_shard)
            from ...parallel.sp_encoder import sp_seq_shard, sp_seq_unshard

            x, blk_mask, orig_t = sp_seq_shard(x, mask, mesh, sp_axis)
        for blk in self.enc_blocks:
            x = blk(x, blk_mask, mesh, sp_axis)
        if mesh is not None:
            x = sp_seq_unshard(x, mesh, orig_t)
        return self.enc_ln(x), mask

    def decode_logits(self, tokens, mem, mem_mask):
        """tokens [B, L] -> logits [B, L, V] (teacher forcing)."""
        c = self.cfg
        y = self.tok_embed(tokens)
        y = y + jnp.asarray(sinusoidal_positions(tokens.shape[1], c.dim))[None]
        for blk in self.dec_blocks:
            y = blk(y, mem, mem_mask)
        return self.dec_ln(y) @ self.tok_embed.embedding.T

    def __call__(self, feats, frame_mask, tokens):
        mem, mem_mask = self.encode(feats, frame_mask)
        return self.decode_logits(tokens, mem, mem_mask)

    def greedy_decode(self, feats, frame_mask, max_len: int = None):
        """-> (ids [B, l-1], lengths [B]); BOS/EOS stripped.

        ``max_len`` (static) overrides cfg.max_decode_len — no parameter
        depends on the decode budget (positions are host constants, caches
        are zero-init), so long-form callers scale it with audio length
        (engine/runtime.transcribe_long) against the same checkpoint."""
        c = self.cfg
        mem, mem_mask = self.encode(feats, frame_mask)
        b = mem.shape[0]
        l = int(max_len) if max_len is not None else c.max_decode_len
        heads, d_head = c.heads, c.dim // c.heads
        n_layers = len(self.dec_blocks)

        # cross-attention K/V once per layer; positional table as a constant
        cross = [blk.cross_attn.precompute(mem) for blk in self.dec_blocks]
        pos_table = jnp.asarray(sinusoidal_positions(l, c.dim))

        # materialize every decoder param OUTSIDE the scan (flax init inside
        # lax.scan leaks tracers): one throwaway step at position 0
        k0 = jnp.zeros((b, l, heads, d_head))
        v0 = jnp.zeros((b, l, heads, d_head))
        x_warm = self.tok_embed(jnp.full((b, 1), c.bos_id, jnp.int32)) + pos_table[0]
        for li, blk in enumerate(self.dec_blocks):
            x_warm, _, _ = blk.step(x_warm, k0, v0, 0, cross[li][0], cross[li][1], mem_mask)
        _ = self.dec_ln(x_warm)

        def step(carry, i):
            tokens, done, count, caches = carry
            prev = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)  # [B, 1]
            x_t = self.tok_embed(prev) + pos_table[i]
            new_caches = []
            for li, blk in enumerate(self.dec_blocks):
                kc, vc = caches[li]
                x_t, kc, vc = blk.step(x_t, kc, vc, i, cross[li][0], cross[li][1], mem_mask)
                new_caches.append((kc, vc))
            logits = (self.dec_ln(x_t) @ self.tok_embed.embedding.T)[:, 0]  # [B, V]
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, c.eos_id, nxt)
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None], jnp.minimum(i + 1, l - 1), axis=1)
            emitted = (~done) & (nxt != c.eos_id)
            count = count + emitted.astype(jnp.int32)
            done = done | (nxt == c.eos_id)
            return (tokens, done, count, tuple(new_caches)), None

        tokens0 = jnp.full((b, l), c.eos_id, jnp.int32).at[:, 0].set(c.bos_id)
        caches0 = tuple(
            (jnp.zeros((b, l, heads, d_head)), jnp.zeros((b, l, heads, d_head)))
            for _ in range(n_layers)
        )
        (tokens, done, count, _), _ = jax.lax.scan(
            step,
            (tokens0, jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32), caches0),
            jnp.arange(l - 1),
        )
        # strip BOS; positions beyond count hold EOS
        return tokens[:, 1:], count


def whisper_frontend(wav: jnp.ndarray, wav_lengths: jnp.ndarray, cfg: WhisperStyleConfig):
    feats = log_mel_fbank(wav, cfg.fbank)
    f_len = jnp.maximum((wav_lengths - cfg.fbank.frame_length) // cfg.fbank.frame_shift + 1, 1)
    return feats, lengths_to_mask(f_len, feats.shape[1])
