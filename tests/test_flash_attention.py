"""Flash (blockwise streaming-softmax) attention kernel vs the dense oracle.

The dense einsum path in models/common.MultiHeadSelfAttention is the numeric
reference (SURVEY.md §2.3: the reference delegates attention to onnxruntime
kernels; here both paths are ours and must agree).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_classification_tpu.ops.pallas.attention_kernel import (
    flash_attention,
    flash_enabled,
)


def dense_attention(q, k, v, mask=None):
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    if mask is not None:
        logits = logits + jnp.where(mask[:, None, None, :], 0.0, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                      preferred_element_type=jnp.float32)


def _rand(shape, seed, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=dtype)


@pytest.mark.parametrize("t,d", [(64, 32), (300, 64), (512, 48)])
def test_flash_matches_dense(t, d):
    b, h = 2, 3
    q, k, v = (_rand((b, h, t, d), i) for i in range(3))
    mask = jnp.arange(t)[None, :] < jnp.array([t, max(1, t - 37)])[:, None]
    out = flash_attention(q, k, v, mask, block_q=128, block_k=128, interpret=True)
    ref = dense_attention(q, k, v, mask)
    valid = np.asarray(mask)[:, None, :, None]
    err = np.abs(np.asarray(out) - np.asarray(ref)) * valid
    assert err.max() < 1e-4


def test_flash_no_mask_and_non_tiling_blocks():
    b, h, t, d = 1, 2, 130, 64
    q, k, v = (_rand((b, h, t, d), 10 + i) for i in range(3))
    out = flash_attention(q, k, v, None, block_q=128, block_k=256, interpret=True)
    ref = dense_attention(q, k, v)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-4


def test_flash_bf16_inputs():
    b, h, t, d = 2, 2, 256, 64
    q, k, v = (_rand((b, h, t, d), 20 + i, jnp.bfloat16) for i in range(3))
    mask = jnp.arange(t)[None, :] < jnp.array([200, 256])[:, None]
    out = flash_attention(q, k, v, mask, interpret=True)
    ref = dense_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32), mask)
    valid = np.asarray(mask)[:, None, :, None]
    err = np.abs(np.asarray(out) - np.asarray(ref)) * valid
    assert err.max() < 3e-2  # bf16 matmul noise


def test_flash_gradients_match_dense():
    b, h, t, d = 2, 2, 192, 32  # b>1: catches bias-rank broadcast bugs
    q, k, v = (_rand((b, h, t, d), 30 + i) for i in range(3))
    mask = jnp.arange(t)[None, :] < jnp.array([t - 11, t])[:, None]
    g = _rand((b, h, t, d), 40)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask, block_q=64, block_k=64, interpret=True)
        return jnp.sum(out * g * mask[:, None, :, None])

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, mask) * g * mask[:, None, :, None])

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        assert np.abs(np.asarray(a) - np.asarray(b_)).max() < 1e-4


def test_mhsa_module_flash_parity(monkeypatch):
    """The module's flash branch == its dense branch, same params."""
    import flax.linen as nn

    from audio_classification_tpu.models.common import MultiHeadSelfAttention

    mod = MultiHeadSelfAttention(dim=64, heads=4)
    x = _rand((2, 96, 64), 50)
    mask = jnp.arange(96)[None, :] < jnp.array([96, 70])[:, None]
    params = mod.init(jax.random.PRNGKey(0), x, mask)

    monkeypatch.setenv("ACT_FLASH_ATTN", "0")
    ref = mod.apply(params, x, mask)
    monkeypatch.setenv("ACT_FLASH_ATTN", "1")
    out = mod.apply(params, x, mask)
    valid = np.asarray(mask)[..., None]
    err = np.abs(np.asarray(out) - np.asarray(ref)) * valid
    assert err.max() < 1e-4


def test_flash_stats_normalize_matches_dense():
    """(o_unnorm, m, l) contract: o/l == exact softmax attention; l is the
    exp-sum under the row max m (ring-attention merge semantics)."""
    from audio_classification_tpu.ops.pallas.attention_kernel import flash_attention_stats

    b, h, t, d = 2, 2, 256, 64
    q, k, v = (_rand((b, h, t, d), 60 + i) for i in range(3))
    mask = jnp.arange(t)[None, :] < jnp.array([t, t - 29])[:, None]
    o, m, l = flash_attention_stats(q, k, v, mask, block_q=128, block_k=128,
                                    interpret=True)
    out = o / jnp.maximum(l[..., None], 1e-30)
    ref = dense_attention(q, k, v, mask)
    valid = np.asarray(mask)[:, None, :, None]
    assert (np.abs(np.asarray(out) - np.asarray(ref)) * valid).max() < 1e-4

    # m/l match the direct biased-logit stats
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    logits = logits + jnp.where(mask[:, None, None, :], 0.0, -1e9)
    m_ref = jnp.max(logits, axis=-1)
    l_ref = jnp.sum(jnp.exp(logits - m_ref[..., None]), axis=-1)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), rtol=1e-4)


@pytest.mark.slow
def test_ring_attention_flash_block(monkeypatch):
    """Ring attention with its per-shard blocks forced through the Pallas
    streaming kernel (interpret on CPU) == the dense single-device oracle,
    forward and backward."""
    import jax.numpy as jnp2

    from audio_classification_tpu.parallel.mesh import make_mesh
    from audio_classification_tpu.parallel.ring_attention import (
        reference_attention,
        ring_attention,
    )

    mesh = make_mesh(8, model_axis=1)
    b, t, h, d = 2, 256, 2, 32  # 32 frames per shard
    q, k, v = (_rand((b, t, h, d), 70 + i) for i in range(3))
    mask = jnp.arange(t)[None, :] < jnp.array([t, t - 50])[:, None]

    monkeypatch.setenv("ACT_FLASH_ATTN", "1")
    out = ring_attention(q, k, v, mesh, axis="data", kv_mask=mask)
    monkeypatch.setenv("ACT_FLASH_ATTN", "0")
    ref = reference_attention(q, k, v, kv_mask=mask)
    valid = np.asarray(mask)[:, :, None, None]
    assert (np.abs(np.asarray(out) - np.asarray(ref)) * valid).max() < 1e-4

    g = _rand((b, t, h, d), 80)

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v)
            return jnp2.sum(o * g * mask[:, :, None, None])
        return f

    monkeypatch.setenv("ACT_FLASH_ATTN", "1")
    gf = jax.grad(loss(lambda a, b_, c: ring_attention(
        a, b_, c, mesh, axis="data", kv_mask=mask)), argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("ACT_FLASH_ATTN", "0")
    gd = jax.grad(loss(lambda a, b_, c: reference_attention(
        a, b_, c, kv_mask=mask)), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        assert np.abs(np.asarray(a) - np.asarray(b_)).max() < 1e-4


def dense_gau(q, k, v, mask, scale):
    s = jnp.einsum("btd,bsd->bts", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = s * mask[:, None, :].astype(s.dtype)
    p = jax.nn.relu(s) ** 2
    return jnp.einsum("bts,bse->bte", p, v, preferred_element_type=jnp.float32)


@pytest.mark.parametrize("t,dqk,de", [(128, 64, 96), (300, 128, 256)])
def test_gau_matches_dense(t, dqk, de):
    from audio_classification_tpu.ops.pallas.attention_kernel import gau_attention

    b = 2
    q = _rand((b, t, dqk), 1)
    k = _rand((b, t, dqk), 2)
    v = _rand((b, t, de), 3)
    mask = jnp.arange(t)[None, :] < jnp.array([t, max(1, t - 41)])[:, None]
    scale = 1.0 / t
    out = gau_attention(q, k, v, mask, scale, block_q=128, block_k=128,
                        interpret=True)
    ref = dense_gau(q, k, v, mask, scale)
    valid = np.asarray(mask)[:, :, None]
    assert (np.abs(np.asarray(out) - np.asarray(ref)) * valid).max() < 1e-4


def test_gau_gradients_match_dense():
    from audio_classification_tpu.ops.pallas.attention_kernel import gau_attention

    b, t, dqk, de = 1, 192, 32, 48
    q, k, v = _rand((b, t, dqk), 4), _rand((b, t, dqk), 5), _rand((b, t, de), 6)
    mask = jnp.arange(t)[None, :] < (t - 13)
    g = _rand((b, t, de), 7)
    scale = 1.0 / t

    def lf(q, k, v):
        out = gau_attention(q, k, v, mask, scale, block_q=64, block_k=64,
                            interpret=True)
        return jnp.sum(out * g * mask[..., None])

    def ld(q, k, v):
        return jnp.sum(dense_gau(q, k, v, mask, scale) * g * mask[..., None])

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(ld, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        assert np.abs(np.asarray(a) - np.asarray(b_)).max() < 1e-4


@pytest.mark.slow
def test_gau_module_flash_parity(monkeypatch):
    """MossFormer's GAUBlock flash branch == its dense branch, same params."""
    from audio_classification_tpu.models.mossformer import GAUBlock, MossFormerConfig

    cfg = MossFormerConfig(dim=64, qk_dim=32, enc_dim=48, expansion=2, layers=1)
    mod = GAUBlock(cfg)
    x = _rand((2, 160, 64), 8)
    mask = jnp.arange(160)[None, :] < jnp.array([160, 117])[:, None]
    params = mod.init(jax.random.PRNGKey(0), x, mask)

    monkeypatch.setenv("ACT_FLASH_ATTN", "0")
    ref = mod.apply(params, x, mask)
    monkeypatch.setenv("ACT_FLASH_ATTN", "1")
    out = mod.apply(params, x, mask)
    valid = np.asarray(mask)[..., None]
    assert (np.abs(np.asarray(out) - np.asarray(ref)) * valid).max() < 1e-4


def test_mhsa_int8_flash_parity(monkeypatch):
    """int8 packs take the flash branch too (DenseQ quantizes projections
    only; the attention core is f32 on either branch) — long-form must not
    fall back to dense [T,T] logits just because quant is on."""
    from audio_classification_tpu.models.common import MultiHeadSelfAttention

    mod = MultiHeadSelfAttention(dim=64, heads=4, quant="int8")
    x = _rand((2, 96, 64), 90)
    mask = jnp.arange(96)[None, :] < jnp.array([96, 71])[:, None]
    params = mod.init(jax.random.PRNGKey(0), x, mask)

    monkeypatch.setenv("ACT_FLASH_ATTN", "0")
    ref = mod.apply(params, x, mask)
    monkeypatch.setenv("ACT_FLASH_ATTN", "1")
    out = mod.apply(params, x, mask)
    valid = np.asarray(mask)[..., None]
    assert (np.abs(np.asarray(out) - np.asarray(ref)) * valid).max() < 1e-4


def test_flash_enabled_resolution(monkeypatch):
    monkeypatch.setenv("ACT_FLASH_ATTN", "1")
    assert flash_enabled(8)
    monkeypatch.setenv("ACT_FLASH_ATTN", "0")
    assert not flash_enabled(10_000)
    monkeypatch.delenv("ACT_FLASH_ATTN")
    # conftest forces the cpu backend -> auto mode stays dense
    assert not flash_enabled(10_000)
