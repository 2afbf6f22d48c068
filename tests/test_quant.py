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
