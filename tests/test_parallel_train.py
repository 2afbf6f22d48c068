"""Mesh sharding + sharded train step on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_classification_tpu.models.convtasnet import ConvTasNetConfig
from audio_classification_tpu.parallel.mesh import (
    apply_param_specs,
    convtasnet_param_spec,
    data_sharding,
    make_mesh,
)
from audio_classification_tpu.train.losses import pit_si_sdr_loss
from audio_classification_tpu.train.trainer import SeparatorTrainer

TINY = ConvTasNetConfig(n_src=2, enc_dim=32, enc_kernel=16, bottleneck=16,
                        hidden=32, n_blocks=2, n_repeats=1)


def test_make_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must give 8 virtual devices"
    m = make_mesh(8, model_axis=2)
    assert m.shape == {"data": 4, "model": 2}
    m1 = make_mesh(4, model_axis=1)
    assert m1.shape == {"data": 4, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(8, model_axis=3)


def test_pit_loss_identity_is_optimal():
    rng = np.random.default_rng(0)
    refs = jnp.asarray(rng.standard_normal((2, 2, 1000)).astype(np.float32))
    mask = jnp.ones((2, 1000), jnp.float32)
    # perfect estimates (any permutation) -> very negative loss
    perm = refs[:, ::-1]
    loss_perfect = float(pit_si_sdr_loss(perm, refs, mask))
    noise = jnp.asarray(rng.standard_normal((2, 2, 1000)).astype(np.float32))
    loss_noise = float(pit_si_sdr_loss(noise, refs, mask))
    assert loss_perfect < -40
    assert loss_noise > loss_perfect


def test_trainer_loss_decreases_dp_tp():
    mesh = make_mesh(8, model_axis=2)
    trainer = SeparatorTrainer(TINY, mesh=mesh, lr=1e-3, seed=0)
    rng = np.random.default_rng(0)
    b, t = 8, 4000
    refs = rng.standard_normal((b, 2, t)).astype(np.float32) * 0.3
    mix = refs.sum(axis=1)
    mask = np.ones((b, t), np.float32)
    losses = [trainer.train_step(mix, refs, mask) for _ in range(8)]
    assert losses[-1] < losses[0], f"loss did not improve: {losses}"


def test_param_shardings_cover_model_axis():
    mesh = make_mesh(8, model_axis=2)
    trainer = SeparatorTrainer(TINY, mesh=mesh, seed=0)
    specs = apply_param_specs(mesh, trainer.state.params, convtasnet_param_spec)
    leaves = jax.tree_util.tree_leaves(specs)
    sharded = [s for s in leaves if "model" in str(s.spec)]
    assert sharded, "expected at least some TP-sharded params"


def test_data_sharding_distributes_batch():
    mesh = make_mesh(8, model_axis=1)
    x = jnp.zeros((8, 100))
    xs = jax.device_put(x, data_sharding(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (1, 100)


def test_warmup_cosine_schedule_shape():
    """warmup_cosine: ramps from peak/25, hits peak at the warmup knee,
    anneals monotonically to the floor (spiky-loss recipe for ctc)."""
    from audio_classification_tpu.train.trainer import warmup_cosine

    sched = warmup_cosine(1e-3, total_steps=1000, warmup_frac=0.1,
                          floor_frac=0.05)
    lrs = np.asarray([float(sched(s)) for s in range(0, 1001, 25)])
    assert abs(lrs[0] - 1e-3 / 25.0) < 1e-9          # init = peak/25
    assert abs(lrs.max() - 1e-3) < 1e-6              # reaches the peak
    assert np.argmax(lrs) == 4                       # ...at step 100
    tail = lrs[4:]
    assert np.all(np.diff(tail) <= 1e-12)            # monotone decay
    assert abs(lrs[-1] - 5e-5) < 1e-6                # floor = 5% of peak


def test_module_trainer_accepts_schedule():
    """ModuleTrainer(lr=<schedule>) trains and the loss moves."""
    from flax import linen as nn

    from audio_classification_tpu.train.trainer import (ModuleTrainer,
                                                        warmup_cosine)

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(x)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    model = Lin()
    params = model.init(jax.random.PRNGKey(0), x0)
    loss_fn = lambda f, p, b: jnp.mean((f(p, b["x"])[:, 0] - b["y"]) ** 2)
    tr = ModuleTrainer(model, params, loss_fn, lr=warmup_cosine(5e-2, 150))
    batch = {"x": x0, "y": x0.sum(1)}
    losses = [tr.train_step(batch) for _ in range(150)]
    assert losses[-1] < 0.1 * losses[0]
