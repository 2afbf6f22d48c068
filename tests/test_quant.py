"""int8 serving path (ops/quant + ConvTasNet quant="int8").

Properties under test:
- the s8 kernels approximate their float counterparts to dynamic-quant
  SNR (symmetric 127-level grids);
- per-sample activation scales make results independent of batch
  composition (another sample can't shift my quantization grid);
- masked scales keep padded-vs-solo exactness for the full separator,
  the repo-wide invariant (CLAUDE.md conventions).
"""
import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from audio_classification_tpu.models import ConvTasNet, ConvTasNetConfig
from audio_classification_tpu.ops.quant import (
    int8_conv1d, int8_matmul, quantize_dynamic, quantize_weight)

TINY = ConvTasNetConfig(n_src=3, enc_dim=64, enc_kernel=16, bottleneck=32,
                        hidden=64, n_blocks=2, n_repeats=2)
TINY_Q = dataclasses.replace(TINY, quant="int8")
RNG = np.random.default_rng(0)


def test_int8_matmul_close_to_float():
    x = jnp.asarray(RNG.standard_normal((4, 50, 96)).astype(np.float32))
    w = jnp.asarray(RNG.standard_normal((96, 64)).astype(np.float32) * 0.1)
    got = np.asarray(int8_matmul(x, w))
    ref = np.asarray(x) @ np.asarray(w)
    # 127-level symmetric grids: relative L2 error well under 2%
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_conv1d_close_to_float():
    x = jnp.asarray(RNG.standard_normal((2, 80, 32)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((3, 32, 48)).astype(np.float32) * 0.1)
    got = np.asarray(int8_conv1d(x, k, dilation=2))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, k, (1,), "SAME", rhs_dilation=(2,),
        dimension_numbers=("NHC", "HIO", "NHC")))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_per_sample_scale_batch_independence():
    """Sample 0's quantized result must be bit-identical whether it shares
    the batch with a quiet or a 100x louder sample."""
    x0 = RNG.standard_normal((1, 20, 16)).astype(np.float32)
    other_quiet = RNG.standard_normal((1, 20, 16)).astype(np.float32) * 0.01
    other_loud = other_quiet * 1e4
    w = jnp.asarray(RNG.standard_normal((16, 8)).astype(np.float32))
    a = np.asarray(int8_matmul(jnp.asarray(np.concatenate([x0, other_quiet])), w))
    b = np.asarray(int8_matmul(jnp.asarray(np.concatenate([x0, other_loud])), w))
    np.testing.assert_array_equal(a[0], b[0])


def test_masked_scale_ignores_padded_positions():
    """Garbage at masked positions must not shift the quantization grid:
    valid rows of the output are bit-identical."""
    x = RNG.standard_normal((1, 30, 16)).astype(np.float32)
    garbage = x.copy()
    garbage[0, 20:] = 1e3
    mask = (np.arange(30) < 20).astype(np.float32)[None]
    w = jnp.asarray(RNG.standard_normal((16, 8)).astype(np.float32))
    a = np.asarray(int8_matmul(jnp.asarray(x), w, mask=jnp.asarray(mask)[..., None]))
    b = np.asarray(int8_matmul(jnp.asarray(garbage), w, mask=jnp.asarray(mask)[..., None]))
    np.testing.assert_array_equal(a[0, :20], b[0, :20])


def test_quantize_roundtrip_grid():
    x = jnp.asarray(RNG.standard_normal((2, 40)).astype(np.float32))
    q, s = quantize_dynamic(x)
    assert q.dtype == jnp.int8 and int(np.abs(np.asarray(q)).max()) <= 127
    # absmax element sits exactly on +-127
    assert np.abs(np.asarray(q)).max() == 127
    qw, sw = quantize_weight(jnp.asarray(RNG.standard_normal((5, 16)).astype(np.float32)))
    assert qw.dtype == jnp.int8 and sw.shape == (1, 16)
    # per-channel: every column touches the grid edge
    assert (np.abs(np.asarray(qw)).max(axis=0) == 127).all()


def test_convtasnet_int8_close_to_float():
    model_f = ConvTasNet(TINY)
    model_q = ConvTasNet(TINY_Q)
    wav = jnp.asarray(RNG.standard_normal((2, 4000)).astype(np.float32))
    mask = jnp.ones((2, 4000), np.float32)
    params = model_f.init(jax.random.PRNGKey(0), wav, mask)
    out_f = np.asarray(model_f.apply(params, wav, mask))
    out_q = np.asarray(model_q.apply(params, wav, mask))  # same params tree
    assert out_q.shape == out_f.shape
    cos = np.sum(out_f * out_q) / (np.linalg.norm(out_f) * np.linalg.norm(out_q))
    assert cos > 0.98, cos


@pytest.mark.slow
def test_convtasnet_int8_padded_equals_solo():
    """The masked quantization scales keep the repo's padded-vs-solo
    exactness invariant on the int8 path."""
    model = ConvTasNet(TINY_Q)
    short = RNG.standard_normal(2000).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)),
                        jnp.ones((1, 2000)))
    solo = model.apply(params, jnp.asarray(short)[None], jnp.ones((1, 2000)))
    padded = np.zeros((1, 3200), np.float32)
    padded[0, :2000] = short
    m = (np.arange(3200) < 2000).astype(np.float32)[None]
    packed = model.apply(params, jnp.asarray(padded), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(packed[0, :, :2000]),
                               np.asarray(solo[0]), atol=2e-4)
    # padded tail still exactly zero
    assert np.abs(np.asarray(packed[0, :, 2000:])).max() == 0.0


def test_denseq_none_matches_nn_dense_exactly():
    """DenseQ under quant="none" is a drop-in for nn.Dense: identical param
    tree (names, shapes, seeded values) and bit-identical output — the
    contract that keeps every checkpoint and ONNX mapping loadable."""
    from flax import linen as nn

    from audio_classification_tpu.models.common import DenseQ

    x = jnp.asarray(RNG.standard_normal((3, 7, 24)).astype(np.float32))

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(16, name="proj")(x)

    class Got(nn.Module):
        @nn.compact
        def __call__(self, x):
            return DenseQ(16, quant="none", name="proj")(x)

    p_ref = Ref().init(jax.random.PRNGKey(7), x)
    p_got = Got().init(jax.random.PRNGKey(7), x)
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_got)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(Ref().apply(p_ref, x)),
                                  np.asarray(Got().apply(p_got, x)))


@pytest.mark.slow
def test_sensevoice_int8_same_params_close_logits():
    """The quantized encoder consumes the float param tree unchanged and
    stays close to the float logits (dynamic 127-level grids through a
    2-layer encoder)."""
    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig, SenseVoiceEncoder)

    cfg = SenseVoiceConfig(vocab_size=32, dim=64, heads=2, layers=2,
                           conv_kernel=3)
    cfg_q = dataclasses.replace(cfg, quant="int8")
    feats = jnp.asarray(RNG.standard_normal((2, 12, cfg.lfr_m * cfg.num_mel))
                        .astype(np.float32) * 0.3)
    mask = jnp.ones((2, 12), bool)
    params = SenseVoiceEncoder(cfg).init(jax.random.PRNGKey(0), feats, mask)
    out_f = np.asarray(SenseVoiceEncoder(cfg).apply(params, feats, mask))
    out_q = np.asarray(SenseVoiceEncoder(cfg_q).apply(params, feats, mask))
    assert out_q.shape == out_f.shape
    rel = np.linalg.norm(out_q - out_f) / np.linalg.norm(out_f)
    assert rel < 0.05, rel


@pytest.mark.slow
def test_sensevoice_int8_padded_equals_solo():
    """Masked per-sample scales keep padded-vs-solo exactness through the
    quantized attention/FFN projections."""
    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig, SenseVoiceEncoder)

    cfg = SenseVoiceConfig(vocab_size=32, dim=64, heads=2, layers=2,
                           conv_kernel=3, quant="int8")
    d_in = cfg.lfr_m * cfg.num_mel
    f_short = RNG.standard_normal((1, 8, d_in)).astype(np.float32) * 0.3
    model = SenseVoiceEncoder(cfg)
    m_short = jnp.ones((1, 8), bool)  # frame mask excludes the prompt slots
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(f_short), m_short)
    solo = np.asarray(model.apply(params, jnp.asarray(f_short), m_short))

    f_pad = np.zeros((1, 14, d_in), np.float32)
    f_pad[:, :8] = f_short
    m_pad = jnp.asarray(np.arange(14)[None] < 8)
    padded = np.asarray(model.apply(params, jnp.asarray(f_pad), m_pad))
    n_valid = 8 + cfg.num_prompt  # output rows: prompt slots + valid frames
    np.testing.assert_array_equal(padded[:, :n_valid], solo[:, :n_valid])


@pytest.mark.slow
def test_whisper_encoder_int8_same_params_close_memory():
    """The whisper-style encoder's int8 path consumes the float param tree
    unchanged (DenseQ keeps the flax-auto Dense_0/Dense_1 paths) and stays
    close to the float encoder memory."""
    from audio_classification_tpu.models.asr.whisper_style import (
        WhisperStyle, WhisperStyleConfig)

    cfg = WhisperStyleConfig(vocab_size=32, dim=64, heads=2, enc_layers=2,
                             dec_layers=1, max_decode_len=8)
    cfg_q = dataclasses.replace(cfg, quant="int8")
    feats = jnp.asarray(RNG.standard_normal((2, 16, cfg.num_mel))
                        .astype(np.float32) * 0.3)
    mask = jnp.ones((2, 16), bool)
    params = WhisperStyle(cfg).init(jax.random.PRNGKey(0), feats, mask,
                                    jnp.zeros((2, 4), jnp.int32))
    mem_f, _ = WhisperStyle(cfg).apply(params, feats, mask, method="encode")
    mem_q, _ = WhisperStyle(cfg_q).apply(params, feats, mask, method="encode")
    rel = (np.linalg.norm(np.asarray(mem_q) - np.asarray(mem_f))
           / np.linalg.norm(np.asarray(mem_f)))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_whisper_encoder_int8_padded_equals_solo():
    """Masked per-sample scales keep padded-vs-solo exactness through the
    quantized whisper encoder (frame mask covers the conv-subsampled axis)."""
    from audio_classification_tpu.models.asr.whisper_style import (
        WhisperStyle, WhisperStyleConfig)

    cfg = WhisperStyleConfig(vocab_size=32, dim=64, heads=2, enc_layers=2,
                             dec_layers=1, max_decode_len=8, quant="int8")
    f_short = RNG.standard_normal((1, 12, cfg.num_mel)).astype(np.float32) * 0.3
    model = WhisperStyle(cfg)
    m_short = jnp.ones((1, 12), bool)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(f_short), m_short,
                        jnp.zeros((1, 4), jnp.int32))
    solo, _ = model.apply(params, jnp.asarray(f_short), m_short, method="encode")
    solo = np.asarray(solo)

    f_pad = np.zeros((1, 20, cfg.num_mel), np.float32)
    f_pad[:, :12] = f_short
    m_pad = jnp.asarray(np.arange(20)[None] < 12)
    padded, _ = model.apply(params, jnp.asarray(f_pad), m_pad, method="encode")
    n_valid = solo.shape[1]  # conv-subsampled valid frames
    np.testing.assert_array_equal(np.asarray(padded)[:, :n_valid], solo)


@pytest.mark.slow
def test_convtasnet_int8_batch_independence():
    """A 1000x louder batchmate must not change a sample's separation."""
    model = ConvTasNet(TINY_Q)
    wav = RNG.standard_normal((1, 2000)).astype(np.float32)
    mate = RNG.standard_normal((1, 2000)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)),
                        jnp.ones((1, 2000)))
    m = jnp.ones((2, 2000), np.float32)
    a = model.apply(params, jnp.asarray(np.concatenate([wav, mate])), m)
    b = model.apply(params, jnp.asarray(np.concatenate([wav, mate * 1e3])), m)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
