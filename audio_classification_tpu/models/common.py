"""Shared model-layer building blocks (flax.linen).

Conventions:
- time-major feature tensors are [B, T, C] (lax.conv wants NCH; the conv
  helpers here transpose internally so model code stays readable);
- every module takes an optional boolean frame/sample mask and keeps padded
  positions inert, because the engine feeds padded length-bucketed batches;
- params stay f32; matmul inputs may be cast to bf16 by the caller's policy.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class GlobalLayerNorm(nn.Module):
    """Global LN over (time, channels) jointly — the gLN used by Conv-TasNet.

    Input [B, T, C]; statistics over both T and C, masked for padding.
    """

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        # statistics in f32 (mixed-precision recipe), output in input dtype
        xf = x.astype(jnp.float32)
        if mask is None:
            mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
            var = jnp.mean((xf - mean) ** 2, axis=(1, 2), keepdims=True)
        else:
            m = mask[..., None].astype(jnp.float32)  # [B, T, 1]
            count = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1.0)
            mean = jnp.sum(xf * m, axis=(1, 2), keepdims=True) / count
            var = jnp.sum(((xf - mean) * m) ** 2, axis=(1, 2), keepdims=True) / count
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


class ChannelLayerNorm(nn.Module):
    """Per-frame LN over channels (cLN). Input [B, T, C]."""

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope (torch default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("alpha", nn.initializers.constant(self.init), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def conv1d(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1, dilation: int = 1,
           padding: str | list = "SAME", groups: int = 1) -> jnp.ndarray:
    """[B, T, Cin] x [K, Cin/groups, Cout] -> [B, T', Cout] (feature-last)."""
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding=padding if isinstance(padding, str) else padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


class Conv1d(nn.Module):
    """Feature-last 1-D convolution with optional depthwise grouping.

    ``quant="int8"`` (groups=1 only) runs the conv on the s8 MXU path
    (ops/quant.int8_conv1d): dynamic per-sample activation quant with an
    optional ``mask`` bounding the scale reduction to valid positions,
    symmetric per-out-channel weight quant, int32 accumulation. Bias and
    everything around the conv stay in the activation dtype.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    padding: str = "SAME"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, cin // self.groups, self.features),
        )
        if self.quant == "int8" and self.groups == 1:
            from ..ops.quant import int8_conv1d
            y = int8_conv1d(x, k, self.stride, self.dilation, self.padding,
                            mask=mask, out_dtype=x.dtype)
        else:
            # harmonize with the activation dtype (mixed-precision safety:
            # conv requires identical lhs/rhs dtypes)
            y = conv1d(x, k.astype(x.dtype), self.stride, self.dilation,
                       self.padding, self.groups)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(x.dtype)
        return y


class DenseQ(nn.Module):
    """``nn.Dense``-compatible projection with an optional dynamic-int8 path.

    Same param names ("kernel"/"bias"), same initializers and the same
    dtype-promotion semantics as ``nn.Dense(dtype=None)``, so swapping it
    in (under an explicit ``name=``) leaves every checkpoint, ONNX weight
    mapping and seeded init bit-identical. ``quant="int8"`` routes the
    matmul through ops/quant.int8_matmul (s8 MXU, 2x the bf16 rate on
    v5e): dynamic per-sample activation scales bounded to ``mask`` (so
    padded frames can't shift a sample's quantization grid), symmetric
    per-column weight scales, f32 rescale fused into the program.
    """

    features: int
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.quant == "int8":
            from ..ops.quant import int8_matmul

            out_dtype = jnp.promote_types(x.dtype, kernel.dtype)
            m = None if mask is None else mask[..., None]
            return int8_matmul(x, kernel, mask=m, out_dtype=out_dtype) + bias
        return x @ kernel + bias


def sinusoidal_positions(n: int, d: int, offset: int = 0) -> np.ndarray:
    """Standard transformer sin/cos position table [n, d] (host constant)."""
    pos = np.arange(offset, offset + n, dtype=np.float64)[:, None]
    i = np.arange(d, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / d)
    table = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


class MultiHeadSelfAttention(nn.Module):
    """Masked MHSA, [B, T, D] with boolean frame mask [B, T].

    With ``mesh`` supplied, the attention core runs sequence-parallel ring
    attention over ``sp_axis`` (parallel/ring_attention: shard_map +
    ppermute over ICI) — the SAME parameters serve both paths, so the dense
    path is the numeric oracle for the ring path (SURVEY.md §5.7: capability
    the reference lacks; it only ever time-segments long audio)."""

    dim: int
    heads: int
    quant: str = "none"  # "int8": q/k/v/out projections on the s8 MXU
                         # (dense path only; SP keeps float projections so
                         # the scale reduction never crosses shards)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 mesh=None, sp_axis: str = "data") -> jnp.ndarray:
        d_head = self.dim // self.heads
        quant = self.quant if mesh is None else "none"
        qkv = DenseQ(3 * self.dim, quant=quant, name="qkv")(x, mask)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t = x.shape[:2]

        if mesh is not None:
            from ..parallel.ring_attention import ring_attention

            def heads4d(z):
                return z.reshape(b, t, self.heads, d_head)

            q, k, v = heads4d(q), heads4d(k), heads4d(v)
            kv_mask = mask if mask is not None else jnp.ones((b, t), bool)
            n = mesh.shape[sp_axis]
            # Encoders aligned via sp_seq_shard arrive with T divisible by
            # the axis size, so this fallback pad/slice (which costs a
            # misaligned reshard) stays dead in the warning-clean SP path.
            pad = (-t) % n  # ring blocks need T divisible by the axis size
            if pad:
                q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
                k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
                v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
                kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad)))
            out = ring_attention(q, k, v, mesh, axis=sp_axis, kv_mask=kv_mask)
            if pad:
                out = out[:, :t]
            out = out.reshape(b, t, self.dim)
            return DenseQ(self.dim, quant="none", name="out")(out)

        def heads_split(z):
            return z.reshape(b, z.shape[1], self.heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)

        from ..ops.pallas.attention_kernel import flash_attention, flash_enabled

        if flash_enabled(t):
            # Blockwise streaming-softmax Pallas kernel: same mask semantics
            # and f32 accumulation as the einsum path below (its numeric
            # oracle), but the [B, H, T, T] logits never touch HBM — the
            # long-form single-chip path stops being O(T^2) memory. Applies
            # to int8 packs too: DenseQ quantizes the projections only, the
            # attention core is f32 on either branch.
            out = flash_attention(q, k, v, mask)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
            return DenseQ(self.dim, quant=quant, name="out")(out, mask)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(d_head)
        if mask is not None:
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)
            logits = logits + bias
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], self.dim)
        return DenseQ(self.dim, quant=quant, name="out")(out, mask)


class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block with optional depthwise conv branch
    (a light conformer flavor: attn -> conv -> ffn). ``mesh`` routes the
    attention core through sequence-parallel ring attention."""

    dim: int
    heads: int
    ffn_mult: int = 4
    conv_kernel: int = 0  # 0 disables the conv branch
    quant: str = "none"   # "int8": attention + FFN projections on the s8
                          # MXU (dense path only; see MultiHeadSelfAttention)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 mesh=None, sp_axis: str = "data") -> jnp.ndarray:
        quant = self.quant if mesh is None else "none"
        h = nn.LayerNorm()(x)
        x = x + MultiHeadSelfAttention(self.dim, self.heads, quant=quant)(h, mask, mesh, sp_axis)
        if self.conv_kernel > 0:
            h = nn.LayerNorm()(x)
            if mask is not None:
                h = h * mask[..., None]
            c = Conv1d(self.dim, self.conv_kernel, groups=self.dim, name="dwconv")(h)
            x = x + jax.nn.silu(c)
        h = nn.LayerNorm()(x)
        # explicit names keep the flax-auto "Dense_0"/"Dense_1" param paths
        # every checkpoint and ONNX mapper already uses
        h = DenseQ(self.dim * self.ffn_mult, quant=quant, name="Dense_0")(h, mask)
        h = jax.nn.gelu(h)
        x = x + DenseQ(self.dim, quant=quant, name="Dense_1")(h, mask)
        if mask is not None:
            x = x * mask[..., None]
        return x


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] int lengths -> [B, max_len] boolean mask."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]
