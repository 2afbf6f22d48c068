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


def sp_seq_shard(x: jnp.ndarray, mask, mesh, sp_axis: str = "data"):
    """Enter the sequence-parallel regime without involuntary reshards.

    Encoders build their sequence with shard-hostile ops — prompt concats
    (SenseVoice prepends 4 frames), position adds, subsampling — whose
    offsets never align with shard boundaries. Left to propagation, the
    SPMD partitioner reshards those ops with "involuntary full
    rematerialization" (observed: spmd_partitioner warnings over
    SenseVoiceEncoder/slice|concatenate in the round-2 dryrun). Instead:
    pin the prologue REPLICATED (per-frame work, cheap), pad the sequence
    to a multiple of the axis size, and cross into the sharded regime with
    ONE explicit constraint — a local slice per device, no collective, no
    warning. Returns ``(x, mask, orig_t)``; padded positions are masked out.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[sp_axis]
    b, t = x.shape[0], x.shape[1]
    if mask is None:
        mask = jnp.ones((b, t), bool)
    mask = mask.astype(bool)
    rep = NamedSharding(mesh, P())
    x = jax.lax.with_sharding_constraint(x, rep)
    mask = jax.lax.with_sharding_constraint(mask, rep)
    pad = (-t) % n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, sp_axis, None)))
    mask = jax.lax.with_sharding_constraint(
        mask, NamedSharding(mesh, P(None, sp_axis)))
    return x, mask, t


def sp_seq_unshard(x: jnp.ndarray, mesh, orig_t: int) -> jnp.ndarray:
    """Leave the sequence-parallel regime: ONE explicit all-gather (cheap on
    d-dim activations), then slice the ring padding off replicated — the
    misaligned slice never touches a sharded tensor, so no remat."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))
    if x.shape[1] != orig_t:
        x = x[:, :orig_t]
    return x


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
