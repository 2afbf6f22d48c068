"""Fused Conv-TasNet TCN masker kernel (ops/pallas/tcn_kernel) vs the dense
block loop — interpret mode on the CPU mesh.

The kernel runs the whole masker (all R*X dilated blocks) with the
bottleneck stream VMEM-resident; these tests pin it to the dense
models/convtasnet path: masker-level parity, full-model parity, padded-vs-
solo exactness, exact-dense gradients through the custom_vjp, bf16, and the
auto-enable gating.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_classification_tpu.models.convtasnet import ConvTasNet, ConvTasNetConfig
from audio_classification_tpu.ops.pallas.tcn_kernel import (
    fused_tcn_enabled,
    fused_tcn_masker,
    stack_tcn_params,
    tcn_masker_reference,
)

NB_PER, NREP, C, H = 4, 2, 128, 128


def _blocks(rng, dtype=np.float32):
    def mk():
        return {
            "in_conv": {"kernel": rng.normal(size=(1, C, H)).astype(dtype) * 0.1,
                        "bias": rng.normal(size=(H,)).astype(dtype) * 0.1},
            "prelu1": {"alpha": np.array([0.25], dtype)},
            "norm1": {"gamma": rng.normal(size=(H,)).astype(dtype) * 0.5 + 1.0,
                      "beta": rng.normal(size=(H,)).astype(dtype) * 0.1},
            "dw_conv": {"kernel": rng.normal(size=(3, 1, H)).astype(dtype) * 0.3,
                        "bias": rng.normal(size=(H,)).astype(dtype) * 0.1},
            "prelu2": {"alpha": np.array([0.3], dtype)},
            "norm2": {"gamma": rng.normal(size=(H,)).astype(dtype) * 0.5 + 1.0,
                      "beta": rng.normal(size=(H,)).astype(dtype) * 0.1},
            "res_conv": {"kernel": rng.normal(size=(1, H, C)).astype(dtype) * 0.1,
                         "bias": rng.normal(size=(C,)).astype(dtype) * 0.1},
            "skip_conv": {"kernel": rng.normal(size=(1, H, C)).astype(dtype) * 0.1,
                          "bias": rng.normal(size=(C,)).astype(dtype) * 0.1},
        }

    return [jax.tree.map(jnp.asarray, mk()) for _ in range(NB_PER * NREP)]


def test_kernel_matches_reference():
    rng = np.random.default_rng(0)
    st = stack_tcn_params(_blocks(rng), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 150, C)).astype(np.float32))
    f_len = jnp.array([150, 97], jnp.int32)
    ref = np.asarray(tcn_masker_reference(x, f_len, st, n_per_repeat=NB_PER))
    out = np.asarray(fused_tcn_masker(x, f_len, st, n_per_repeat=NB_PER,
                                      tile=64, interpret=True))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def test_kernel_tile_not_dividing_frames():
    # F far from a tile multiple + F < tile both exercise the pad/slice edge
    rng = np.random.default_rng(3)
    st = stack_tcn_params(_blocks(rng), jnp.float32)
    for f, tile in [(65, 64), (40, 64), (128, 128)]:
        x = jnp.asarray(rng.normal(size=(1, f, C)).astype(np.float32))
        f_len = jnp.array([f], jnp.int32)
        ref = np.asarray(tcn_masker_reference(x, f_len, st, n_per_repeat=NB_PER))
        out = np.asarray(fused_tcn_masker(x, f_len, st, n_per_repeat=NB_PER,
                                          tile=tile, interpret=True))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5, (f, tile)


@pytest.mark.slow
def test_gradients_match_dense():
    rng = np.random.default_rng(1)
    st = stack_tcn_params(_blocks(rng), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 100, C)).astype(np.float32))
    f_len = jnp.array([100, 63], jnp.int32)

    def loss(fn):
        return lambda xx, ss: jnp.sum(
            fn(xx, f_len, ss, n_per_repeat=NB_PER) ** 2)

    fused = lambda xx, fl, ss, n_per_repeat: fused_tcn_masker(
        xx, fl, ss, n_per_repeat=n_per_repeat, tile=64, interpret=True)
    gx_f, gs_f = jax.grad(loss(fused), argnums=(0, 1))(x, st)
    gx_r, gs_r = jax.grad(loss(tcn_masker_reference), argnums=(0, 1))(x, st)
    assert np.abs(np.asarray(gx_f) - np.asarray(gx_r)).max() / np.abs(np.asarray(gx_r)).max() < 1e-5
    for a, b in zip(jax.tree.leaves(gs_f), jax.tree.leaves(gs_r)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-9) < 1e-5


@pytest.fixture
def _force_fused(monkeypatch):
    monkeypatch.setenv("ACT_FUSED_TCN", "1")
    monkeypatch.setenv("ACT_FUSED_TCN_TILE", "64")


def _model_pair():
    cfg = ConvTasNetConfig(n_src=3, enc_dim=128, enc_kernel=16, bottleneck=C,
                           hidden=H, n_blocks=NB_PER, n_repeats=NREP)
    return ConvTasNet(cfg), ConvTasNet(dataclasses.replace(cfg, fused_tcn="off"))


def test_full_model_fused_matches_dense(_force_fused):
    m_fused, m_dense = _model_pair()
    rng = np.random.default_rng(2)
    mix = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32))
    mask = jnp.asarray(np.arange(4000)[None, :] < np.array([4000, 2513])[:, None])
    params = jax.jit(m_dense.init)(jax.random.PRNGKey(0), mix, mask)
    yd = np.asarray(m_dense.apply(params, mix, mask))
    yf = np.asarray(m_fused.apply(params, mix, mask))
    assert np.abs(yd - yf).max() / np.abs(yd).max() < 1e-5

    # padded-vs-solo exactness must survive the fused masker
    solo = np.asarray(m_fused.apply(params, mix[1:2, :2513], jnp.ones((1, 2513), bool)))
    assert np.abs(yf[1, :, :2513] - solo[0]).max() / np.abs(solo).max() < 1e-5


def test_full_model_fused_bf16(_force_fused):
    m_fused, m_dense = _model_pair()
    rng = np.random.default_rng(4)
    mix = jnp.asarray(rng.normal(size=(1, 4000)).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.ones((1, 4000), bool)
    params = jax.jit(m_dense.init)(jax.random.PRNGKey(0), mix, mask)
    yd = np.asarray(m_dense.apply(params, mix, mask).astype(jnp.float32))
    yf = np.asarray(m_fused.apply(params, mix, mask).astype(jnp.float32))
    # bf16 residual streams round at every block in both paths, but the
    # kernel fuses matmul+bias where XLA may not — allow bf16-scale slack
    assert np.abs(yd - yf).max() / np.abs(yd).max() < 0.1


@pytest.mark.slow
def test_fused_training_step(_force_fused):
    # gradients flow through the flax-wired fused path (custom_vjp bwd)
    m_fused, m_dense = _model_pair()
    rng = np.random.default_rng(5)
    mix = jnp.asarray(rng.normal(size=(1, 3200)).astype(np.float32))
    mask = jnp.ones((1, 3200), bool)
    params = jax.jit(m_dense.init)(jax.random.PRNGKey(1), mix, mask)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, mix, mask) ** 2)

    gf = jax.grad(loss(m_fused))(params)
    gd = jax.grad(loss(m_dense))(params)

    def check(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 1e-4, path

    jax.tree_util.tree_map_with_path(check, gf, gd)


def test_enabled_gating(monkeypatch):
    monkeypatch.delenv("ACT_FUSED_TCN", raising=False)
    # CPU backend -> off by default
    assert not fused_tcn_enabled(1000, 128, 512, 3, 8, jnp.bfloat16)
    monkeypatch.setenv("ACT_FUSED_TCN", "0")
    assert not fused_tcn_enabled(1000, 128, 512, 3, 8, jnp.bfloat16)
    monkeypatch.setenv("ACT_FUSED_TCN", "1")
    # forced on (fits) regardless of backend
    assert fused_tcn_enabled(1000, 128, 512, 3, 8, jnp.bfloat16)
    # structural rejections: non-3 conv kernel, non-lane-multiple channels
    assert not fused_tcn_enabled(1000, 128, 512, 5, 8, jnp.bfloat16)
    assert not fused_tcn_enabled(1000, 96, 512, 3, 8, jnp.bfloat16)
    # VMEM overflow: very long inputs fall back to the dense loop
    assert not fused_tcn_enabled(3_000_000, 128, 512, 3, 8, jnp.float32)


def test_planner_tile_exceeds_margin(monkeypatch):
    # tile == margin makes pass C store zero rows per step — a hardware
    # Mosaic lowering failure (observed: MLIRError "Invalid type" at
    # tile == margin == 128). The planner floor is margin + sublane.
    from audio_classification_tpu.ops.pallas.tcn_kernel import (
        _plan_tile, _round_up, _sublane)

    monkeypatch.delenv("ACT_FUSED_TCN_TILE", raising=False)
    itemsize = 2  # bf16: margin for 8 dilations rounds to 128
    margin = _round_up(2 ** 7, _sublane(itemsize))
    for f in (4000, 10000, 16000, 20000):
        tile = _plan_tile(f, 128, 512, margin, itemsize)
        assert tile is None or tile > margin, (f, tile)
    # env override clamps up too
    monkeypatch.setenv("ACT_FUSED_TCN_TILE", "128")
    t = _plan_tile(4000, 128, 512, margin, itemsize)
    assert t is None or t > margin


def test_vmem_plan_admits_serving_buckets():
    # hardware-verified admission band (probed on a real v5e): 10/16/20 s
    # flagship shapes compile and match the dense reference with the
    # raised Mosaic vmem limit; 40 s overflows the budget -> dense path
    from audio_classification_tpu.ops.pallas.tcn_kernel import _plan_tile

    assert _plan_tile(10000, 128, 512, 128, 2) == 2048
    assert _plan_tile(16000, 128, 512, 128, 2) == 2048
    assert _plan_tile(20000, 128, 512, 128, 2) == 2048
    assert _plan_tile(40000, 128, 512, 128, 2) is None
    # short segments must not pad up to a full huge tile: fp stays at 1024
    assert _plan_tile(1000, 128, 512, 128, 2) == 1024


def test_s8_weight_stream_matches_dequant_reference():
    """stack_tcn_params(weight_quant=True) streams int8 weights + scales;
    the kernel's in-kernel dequant must match the dense reference run on
    the SAME dequantized weights (weight-only quant: activations keep the
    float path exactly)."""
    from audio_classification_tpu.ops.quant import quantize_weight

    rng = np.random.default_rng(7)
    blocks = _blocks(rng)
    st_q = stack_tcn_params(blocks, jnp.float32, weight_quant=True)
    assert st_q["w_in"].dtype == jnp.int8
    assert st_q["vecs"].shape[1] == 10 and st_q["cvecs"].shape[1] == 4

    # host-side dequant of the SAME per-block per-out-channel grid
    def deq(blks):
        out = []
        for b in blks:
            b = jax.tree.map(lambda x: x, b)  # copy
            for name in ("in_conv", "dw_conv", "res_conv", "skip_conv"):
                k = b[name]["kernel"]
                q, s = quantize_weight(jnp.asarray(k, jnp.float32), channel_axis=-1)
                b[name] = dict(b[name], kernel=(q.astype(jnp.float32) * s).astype(k.dtype))
            out.append(b)
        return out

    st_deq = stack_tcn_params(deq(blocks), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 150, C)).astype(np.float32))
    f_len = jnp.array([150, 97], jnp.int32)
    ref = np.asarray(tcn_masker_reference(x, f_len, st_deq, n_per_repeat=NB_PER))
    out = np.asarray(fused_tcn_masker(x, f_len, st_q, n_per_repeat=NB_PER,
                                      tile=64, interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def test_int8_quant_uses_fused_weight_stream(_force_fused):
    """quant="int8" no longer falls back to the dense loop: the fused
    masker runs with the s8 weight stream. Output stays close to the float
    model (8-bit weight rounding only) and padded-vs-solo exactness holds
    (weight scales are activation-independent)."""
    cfg = ConvTasNetConfig(n_src=2, enc_dim=128, enc_kernel=16, bottleneck=C,
                           hidden=H, n_blocks=NB_PER, n_repeats=1, quant="int8")
    m = ConvTasNet(cfg)

    m_float = ConvTasNet(dataclasses.replace(cfg, quant="none", fused_tcn="off"))
    rng = np.random.default_rng(3)
    mix = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32))
    mask = jnp.asarray(np.arange(4000)[None, :] < np.array([4000, 2513])[:, None])
    params = jax.jit(m_float.init)(jax.random.PRNGKey(0), mix, mask)
    # quant no longer vetoes the fused masker (bound module: is_initializing
    # needs a scope)
    assert m.bind(params)._use_fused_tcn(1000, jnp.float32)
    yq = np.asarray(m.apply(params, mix, mask))
    yf = np.asarray(m_float.apply(params, mix, mask))
    assert np.isfinite(yq).all()
    # int8 everywhere (encoder/decoder s8 MXU + s8 masker weights): loose
    # but non-vacuous bound vs float
    assert np.abs(yq - yf).max() / np.abs(yf).max() < 0.5

    solo = np.asarray(m.apply(params, mix[1:2, :2513], jnp.ones((1, 2513), bool)))
    assert np.abs(yq[1, :, :2513] - solo[0]).max() / (np.abs(solo).max() + 1e-9) < 1e-5


def test_s8_weight_stream_is_inference_only():
    rng = np.random.default_rng(9)
    st_q = stack_tcn_params(_blocks(rng), jnp.float32, weight_quant=True)
    x = jnp.asarray(rng.normal(size=(1, 128, C)).astype(np.float32))
    f_len = jnp.array([128], jnp.int32)
    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(lambda xx: jnp.sum(fused_tcn_masker(
            xx, f_len, st_q, n_per_repeat=NB_PER, tile=64, interpret=True)))(x)
