"""Sequence-parallel transformer encoder block.

Drop-in encoder block for long-audio ASR/OSD encoders whose attention runs
ring-parallel over the mesh (parallel/ring_attention) while the pointwise
pieces (LN, QKV/out projections, FFN) stay shard-local — under jit with the
sequence axis sharded, XLA keeps them local automatically.

This is the capability SURVEY.md §5.7 calls out as NEW relative to the
reference (which only ever time-segments long audio): when one segment's
O(T^2) attention exceeds a chip, shard T instead of splitting the segment.

The underlying primitive supports a kv_mask whose blocks rotate the ring
with K/V (parallel/ring_attention), so padded frames are excluded exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ring_attention import reference_attention, ring_attention


class SPMultiHeadSelfAttention(nn.Module):
    """MHSA whose attention core is ring-parallel when a mesh is supplied.

    The same parameters serve both paths, so the dense path is the numeric
    oracle for the ring path.
    """

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mesh=None, axis: str = "data") -> jnp.ndarray:
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads4d(t):
            b, l, d = t.shape
            return t.reshape(b, l, self.heads, d // self.heads)

        q, k, v = heads4d(q), heads4d(k), heads4d(v)
        if mesh is not None:
            out = ring_attention(q, k, v, mesh, axis=axis)
        else:
            out = reference_attention(q, k, v)
        b, l = x.shape[:2]
        return nn.Dense(self.dim, name="out")(out.reshape(b, l, self.dim))


class SPTransformerBlock(nn.Module):
    """Pre-LN transformer block with sequence-parallel attention."""

    dim: int
    heads: int
    ffn_mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, mesh=None, axis: str = "data") -> jnp.ndarray:
        h = nn.LayerNorm()(x)
        x = x + SPMultiHeadSelfAttention(self.dim, self.heads, name="attn")(h, mesh, axis)
        h = nn.LayerNorm()(x)
        x = x + nn.Dense(self.dim)(jax.nn.gelu(nn.Dense(self.dim * self.ffn_mult)(h)))
        return x
