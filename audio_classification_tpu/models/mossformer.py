"""MossFormer-style gated-attention separator (2nd separation backend).

The reference treats MossFormer as an alternative separation backend via a
ModelScope CUDA pipeline (reference: src/mossformer/infer.py:13-23 —
`iic/speech_mossformer_separation_temporal_8k`, 8 kHz, int16 branches; noted
in SURVEY.md §2 as a first-class backend the rebuild must own). This module
implements the architecture natively in JAX: convolutional encoder/decoder
around a masker of gated single-head attention units (GAU, FLASH-style)
with convolutional position-wise branches — attention and gating are MXU
matmuls, fully parallel over time.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import Conv1d, ChannelLayerNorm
from .convtasnet import _overlap_add_frames


@dataclass(frozen=True)
class MossFormerConfig:
    n_src: int = 2
    enc_dim: int = 512
    enc_kernel: int = 16
    dim: int = 384
    qk_dim: int = 128
    expansion: int = 2
    layers: int = 8
    conv_kernel: int = 17
    sample_rate: int = 8000

    @property
    def stride(self) -> int:
        return self.enc_kernel // 2


class GAUBlock(nn.Module):
    """Gated attention unit: u ⊙ (relu(qkᵀ)² v) with conv position mixing."""

    cfg: MossFormerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.cfg
        d_e = c.dim * c.expansion
        h = ChannelLayerNorm(c.dim, name="ln")(x)
        # convolutional token mixing before attention
        h = h + jax.nn.silu(Conv1d(c.dim, c.conv_kernel, groups=c.dim, name="dwconv")(h))
        u = jax.nn.silu(nn.Dense(d_e, name="to_u")(h))
        v = jax.nn.silu(nn.Dense(d_e, name="to_v")(h))
        z = nn.Dense(c.qk_dim, name="to_qk")(h)
        gamma = self.param("gamma", nn.initializers.ones, (2, c.qk_dim))
        beta = self.param("beta", nn.initializers.zeros, (2, c.qk_dim))
        q = z * gamma[0] + beta[0]
        k = z * gamma[1] + beta[1]
        t = x.shape[1]

        from ..ops.pallas.attention_kernel import flash_enabled, gau_attention

        if flash_enabled(t):
            # Blockwise Pallas path: identical relu² scores (multiplicative
            # key mask -> masked keys contribute exactly 0) but the [T, T]
            # score matrix never touches HBM — at 8 kHz/stride-8 frames a
            # 16 s segment is T≈16k, i.e. ~1 GB of scores per layer dense.
            out = u * gau_attention(q, k, v, mask, 1.0 / t)
        else:
            logits = jnp.einsum("btd,bsd->bts", q, k, preferred_element_type=jnp.float32) / t
            if mask is not None:
                logits = logits * mask[:, None, :].astype(logits.dtype)
            attn = jax.nn.relu(logits) ** 2
            out = u * jnp.einsum("bts,bse->bte", attn, v, preferred_element_type=jnp.float32)
        out = nn.Dense(c.dim, name="to_out")(out)
        if mask is not None:
            out = out * mask[..., None]
        return x + out


class MossFormer(nn.Module):
    """[B, T] mixture (+ sample mask) -> [B, n_src, T]."""

    cfg: MossFormerConfig = MossFormerConfig()

    @nn.compact
    def __call__(self, mix: jnp.ndarray, sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        b, t = mix.shape
        stride = c.stride
        pad = (-(t - c.enc_kernel)) % stride if t >= c.enc_kernel else c.enc_kernel - t
        x = jnp.pad(mix, ((0, 0), (0, pad)))[..., None]
        if sample_mask is not None:
            x = x * jnp.pad(sample_mask.astype(x.dtype), ((0, 0), (0, pad)))[..., None]

        w = Conv1d(c.enc_dim, c.enc_kernel, stride=stride, use_bias=False,
                   padding="VALID", name="encoder")(x)
        w = jax.nn.relu(w)
        n_frames = w.shape[1]
        frame_mask = None
        if sample_mask is not None:
            lengths = jnp.sum(sample_mask, axis=-1)
            f_len = jnp.maximum((lengths - c.enc_kernel) // stride + 1, 1)
            frame_mask = jnp.arange(n_frames)[None, :] < f_len[:, None]

        h = nn.Dense(c.dim, name="in_proj")(w)
        for i in range(c.layers):
            h = GAUBlock(c, name=f"gau_{i}")(h, frame_mask)
        h = ChannelLayerNorm(c.dim, name="ln_out")(h)
        m = nn.Dense(c.n_src * c.enc_dim, name="mask_head")(h)
        m = jax.nn.relu(m).reshape(b, n_frames, c.n_src, c.enc_dim)

        masked = w[:, :, None, :] * m
        dec = self.param("decoder", nn.initializers.lecun_normal(), (c.enc_kernel, c.enc_dim))
        frames = jnp.einsum("bfsn,kn->bsfk", masked, dec, preferred_element_type=jnp.float32)
        sig = _overlap_add_frames(frames, stride)[..., :t]
        if sig.shape[-1] < t:
            sig = jnp.pad(sig, ((0, 0), (0, 0), (0, t - sig.shape[-1])))
        if sample_mask is not None:
            sig = sig * sample_mask[:, None, :].astype(sig.dtype)
        return sig
