"""Time-sharded Conv-TasNet (parallel/sp_convtasnet) vs the dense oracle.

The dense masked forward (models/convtasnet.py) is the numeric oracle:
sharding the frame axis over the 8-device CPU mesh with halo exchanges
must reproduce it exactly (encoder halos, per-dilation dw-conv halos,
psum gLN statistics, overlap-add tail exchange).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_classification_tpu.models.convtasnet import ConvTasNet, ConvTasNetConfig
from audio_classification_tpu.parallel.mesh import make_mesh
from audio_classification_tpu.parallel.sp_convtasnet import sp_separate

pytestmark = pytest.mark.slow  # deep-verification tier (see pyproject)

CFG = ConvTasNetConfig(n_src=2, enc_dim=16, enc_kernel=16, bottleneck=8,
                       hidden=16, conv_kernel=3, n_blocks=3, n_repeats=2,
                       sample_rate=8000)


@pytest.fixture(scope="module")
def setup():
    model = ConvTasNet(CFG)
    t = 1000
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t)),
                        jnp.ones((1, t)))
    mesh = make_mesh(8, model_axis=1)
    return model, params, mesh


def test_sp_matches_dense_with_padded_rows(setup):
    model, params, mesh = setup
    t = 1000
    rng = np.random.default_rng(0)
    mix = (rng.standard_normal((2, t)) * 0.3).astype(np.float32)
    lengths = np.asarray([t, 700], np.int32)
    mix[1, 700:] = 0.0

    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)
    ref = np.asarray(model.apply(params, jnp.asarray(mix), jnp.asarray(mask)))
    got = np.asarray(sp_separate(params, CFG, jnp.asarray(mix),
                                 jnp.asarray(lengths), mesh))
    assert got.shape == ref.shape == (2, 2, t)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 1e-4, f"relative err {err}"
    # padded tail stays silent
    assert np.all(got[1, :, 700:] == 0.0)


def test_sp_default_lengths_full(setup):
    model, params, mesh = setup
    t = 777  # does not tile the stride: exercises host padding
    mix = (np.random.default_rng(1).standard_normal((1, t)) * 0.3).astype(np.float32)
    mask = np.ones((1, t), np.float32)
    ref = np.asarray(model.apply(params, jnp.asarray(mix), jnp.asarray(mask)))
    got = np.asarray(sp_separate(params, CFG, jnp.asarray(mix), None, mesh))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 1e-4, f"relative err {err}"


def test_sp_rejects_too_short_audio(setup):
    _, params, mesh = setup
    with pytest.raises(ValueError, match="frames/shard"):
        sp_separate(params, CFG, jnp.zeros((1, 100)), None, mesh)


def test_separator_facade_separate_long(setup):
    """Separator.separate_long == Separator.separate on the same engine."""
    _, _, mesh = setup
    from audio_classification_tpu.engine import (BucketSpec, ModelPack,
                                                 StageEngine, tiny_preset)
    from audio_classification_tpu.models.facades import Separator

    pack = ModelPack(tiny_preset(), seed=0)
    eng = StageEngine(pack, BucketSpec(lengths=(16000,), max_batch=2))
    sep = Separator(n_src=2, engine=eng)
    wav = (np.random.default_rng(2).standard_normal(9000) * 0.3).astype(np.float32)
    sharded = sep.separate_long(wav, 16000, mesh)
    assert len(sharded) == 2 and sharded[0].shape == (9000,)
    # oracle = the dense masked forward on the SAME pack params (the engine's
    # own `separate` uploads audio as int16 by design — CLAUDE.md — so it is
    # not bit-comparable; sp_separate matches the float dense math exactly)
    from audio_classification_tpu.models.convtasnet import ConvTasNet

    dense = np.asarray(ConvTasNet(pack.preset.sep2).apply(
        pack.params["sep2"], jnp.asarray(wav)[None],
        jnp.ones((1, 9000), np.float32)))[0]
    for a, b_ in zip(dense, sharded):
        err = np.max(np.abs(a - b_)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, f"facade long-path mismatch {err}"

    # mossformer backend routes through the ring-GAU variant
    moss = Separator(n_src=2, engine=eng, backend="mossformer")
    wav8 = (np.random.default_rng(5).standard_normal(8000) * 0.3).astype(np.float32)
    outs = moss.separate_long(wav8, 8000, mesh)
    assert len(outs) == 2 and outs[0].shape == (8000,)
    from audio_classification_tpu.models.mossformer import MossFormer

    dense_m = np.asarray(MossFormer(pack.preset.mossformer).apply(
        pack.params["mossformer"], jnp.asarray(wav8)[None],
        jnp.ones((1, 8000), np.float32)))[0]
    for a, b_ in zip(dense_m, outs):
        err = np.max(np.abs(a - b_)) / (np.max(np.abs(a)) + 1e-9)
        assert err < 1e-4, f"mossformer long-path mismatch {err}"


def test_sp_mossformer_matches_dense(setup):
    """GAU relu² attention has no softmax -> the ring pass is a plain
    partial sum; parity vs the dense masked MossFormer forward, incl. a
    padded row and a non-tiling length."""
    from audio_classification_tpu.models.mossformer import (
        MossFormer, MossFormerConfig)
    from audio_classification_tpu.parallel.sp_convtasnet import (
        sp_separate_mossformer)

    _, _, mesh = setup
    cfg = MossFormerConfig(n_src=2, enc_dim=16, enc_kernel=16, dim=16,
                           qk_dim=8, layers=2, conv_kernel=5,
                           sample_rate=8000)
    model = MossFormer(cfg)
    t = 1003
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, t)),
                        jnp.ones((1, t)))
    rng = np.random.default_rng(3)
    mix = (rng.standard_normal((2, t)) * 0.3).astype(np.float32)
    lengths = np.asarray([t, 700], np.int32)
    mix[1, 700:] = 0.0
    mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.float32)

    ref = np.asarray(model.apply(params, jnp.asarray(mix), jnp.asarray(mask)))
    got = np.asarray(sp_separate_mossformer(params, cfg, jnp.asarray(mix),
                                            jnp.asarray(lengths), mesh))
    assert got.shape == ref.shape == (2, 2, t)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 1e-4, f"relative err {err}"
    assert np.all(got[1, :, 700:] == 0.0)


def test_time_sharded_training_matches_dense(setup):
    """SeparatorTrainer(time_shard=True): one train step through the
    shard_map'd forward produces the same loss AND the same updated params
    as the dense batch-sharded step — shard_map differentiates, so the
    backward pass is the transposed halo/psum traffic."""
    from audio_classification_tpu.train.trainer import SeparatorTrainer

    _, _, mesh = setup
    rng = np.random.default_rng(7)
    t = 1024
    b = 8  # divisible by the dense trainer's 8-way batch sharding
    refs = (rng.standard_normal((b, 2, t)) * 0.3).astype(np.float32)
    mix = refs.sum(axis=1)
    mask = np.ones((b, t), np.float32)

    dense_tr = SeparatorTrainer(CFG, mesh=mesh, lr=1e-3, seed=0)
    sp_tr = SeparatorTrainer(CFG, mesh=mesh, lr=1e-3, seed=0, time_shard=True)
    loss_d = dense_tr.train_step(mix, refs, mask)
    loss_s = sp_tr.train_step(mix, refs, mask)
    assert loss_s == pytest.approx(loss_d, rel=1e-4)

    leaves_d = jax.tree.leaves(dense_tr.state.params)
    leaves_s = jax.tree.leaves(sp_tr.state.params)
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(leaves_d, leaves_s))
    assert worst < 1e-4, f"post-step param drift {worst}"


def test_time_sharded_training_mossformer(setup):
    """time_shard=True also trains the GAU backend: the ring partial-sum
    attention differentiates (static-bound fori_loop lowers to scan)."""
    from audio_classification_tpu.models.mossformer import MossFormerConfig
    from audio_classification_tpu.train.trainer import SeparatorTrainer

    _, _, mesh = setup
    cfg = MossFormerConfig(n_src=2, enc_dim=16, enc_kernel=16, dim=16,
                           qk_dim=8, layers=2, conv_kernel=5,
                           sample_rate=8000)
    rng = np.random.default_rng(7)
    refs = (rng.standard_normal((8, 2, 1024)) * 0.3).astype(np.float32)
    mix = refs.sum(axis=1)
    mask = np.ones((8, 1024), np.float32)
    loss_d = SeparatorTrainer(cfg, mesh=mesh, lr=1e-3, seed=0).train_step(
        mix, refs, mask)
    loss_s = SeparatorTrainer(cfg, mesh=mesh, lr=1e-3, seed=0,
                              time_shard=True).train_step(mix, refs, mask)
    assert loss_s == pytest.approx(loss_d, rel=1e-4)


def test_sp_rejects_int8(setup):
    import dataclasses

    _, params, mesh = setup
    q = dataclasses.replace(CFG, quant="int8")
    with pytest.raises(ValueError, match="int8"):
        sp_separate(params, q, jnp.zeros((1, 4000)), None, mesh)
