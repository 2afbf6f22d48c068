"""Sequence-parallel ring attention vs single-device softmax oracle."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from audio_classification_tpu.parallel.mesh import make_mesh
from audio_classification_tpu.parallel.ring_attention import (
    reference_attention,
    ring_attention,
)


def test_ring_attention_matches_reference():
    mesh = make_mesh(8, model_axis=1)
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 64, 4, 16  # t divisible by 8 devices
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    out = ring_attention(q, k, v, mesh, axis="data")
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ring_attention_masked():
    mesh = make_mesh(8, model_axis=1)
    rng = np.random.default_rng(2)
    b, t, h, d = 2, 64, 2, 8
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    # item 0 valid up to 40 frames, item 1 full length
    mask = jnp.asarray(np.stack([np.arange(t) < 40, np.ones(t)]).astype(bool))
    out = ring_attention(q, k, v, mesh, axis="data", kv_mask=mask)
    ref = reference_attention(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # masked keys must not influence the output at all
    v2 = v.at[0, 40:].set(999.0)
    out2 = ring_attention(q, k, v2, mesh, axis="data", kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out[0]), atol=2e-5)


def test_ring_attention_2dev_axis():
    mesh = make_mesh(4, model_axis=2)  # data axis has 2 devices
    rng = np.random.default_rng(1)
    b, t, h, d = 1, 32, 2, 8
    q = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    out = ring_attention(q, k, v, mesh, axis="data")
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
