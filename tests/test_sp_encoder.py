"""Sequence-parallel transformer block vs its dense oracle (same params)."""
import jax
import jax.numpy as jnp
import numpy as np

from audio_classification_tpu.parallel.mesh import data_sharding, make_mesh
from audio_classification_tpu.parallel.sp_encoder import SPTransformerBlock


def test_sp_block_matches_dense():
    mesh = make_mesh(8, model_axis=1)
    block = SPTransformerBlock(dim=32, heads=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x)
    dense = block.apply(params, x)
    ring = block.apply(params, x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=5e-5)


def test_sp_block_under_jit_with_sharded_input():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, model_axis=1)
    block = SPTransformerBlock(dim=32, heads=2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 128, 32)).astype(np.float32))
    params = block.init(jax.random.PRNGKey(0), x)
    seq_sharded = NamedSharding(mesh, P(None, "data", None))
    xs = jax.device_put(x, seq_sharded)
    fn = jax.jit(lambda p, v: block.apply(p, v, mesh=mesh))
    out = fn(params, xs)
    dense = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=5e-5)
