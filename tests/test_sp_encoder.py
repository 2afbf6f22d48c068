"""Sequence-parallel transformer block vs its dense oracle (same params)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_classification_tpu.parallel.mesh import data_sharding, make_mesh
from audio_classification_tpu.parallel.sp_encoder import SPTransformerBlock

pytestmark = pytest.mark.slow  # deep-verification tier (see pyproject)


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


def test_sensevoice_seq_parallel_matches_dense():
    """VERDICT round-1 item 6: a BUNDLED ASR encoder runs sequence-parallel
    end-to-end on the mesh — SenseVoiceEncoder(mesh=...) routes every
    block's attention through ring attention with the frame mask rotating
    the ring, under jit with the sequence axis actually sharded, and must
    match the dense path (same params) <=1e-4."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig,
        SenseVoiceEncoder,
    )
    from audio_classification_tpu.parallel.mesh import make_mesh

    cfg = SenseVoiceConfig(vocab_size=12, dim=16, heads=2, layers=2,
                           ffn_mult=2, conv_kernel=3)
    mesh = make_mesh(8, model_axis=1)  # data axis = 8 for SP
    model = SenseVoiceEncoder(cfg)
    rng = np.random.default_rng(0)
    feat_dim = 10
    # input T must shard evenly; prompt+t = 28/20, neither divisible by 8,
    # so the encoder's internal ring padding path is exercised both times
    for t in (24, 16):
        feats = jnp.asarray(rng.standard_normal((2, t, feat_dim)).astype(np.float32))
        mask = jnp.asarray(np.arange(t)[None, :] < np.array([[t], [t - 6]]))
        params = model.init(jax.random.PRNGKey(0), feats, mask)
        dense = np.asarray(model.apply(params, feats, mask, language_id=1))

        fsh = jax.device_put(feats, NamedSharding(mesh, P(None, "data", None)))
        msh = jax.device_put(mask, NamedSharding(mesh, P(None, "data")))
        sp = jax.jit(
            lambda p, f, m: model.apply(p, f, m, language_id=1,
                                        mesh=mesh, sp_axis="data")
        )(params, fsh, msh)
        np.testing.assert_allclose(np.asarray(sp), dense, atol=1e-4, rtol=1e-4)


def test_whisper_encoder_seq_parallel_matches_dense():
    """WhisperStyle.encode(mesh=...) — the second bundled ASR family with
    the sequence-parallel switch; ring attention with the post-subsample
    frame mask rotating the ring must match the dense path <=1e-4."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audio_classification_tpu.models.asr.whisper_style import (
        WhisperStyle,
        WhisperStyleConfig,
    )
    from audio_classification_tpu.parallel.mesh import make_mesh

    cfg = WhisperStyleConfig(vocab_size=12, dim=16, heads=2, enc_layers=2,
                             dec_layers=1, ffn_mult=2)
    mesh = make_mesh(8, model_axis=1)
    model = WhisperStyle(cfg)
    rng = np.random.default_rng(2)
    t, mel = 32, cfg.num_mel
    feats = jnp.asarray(rng.standard_normal((2, t, mel)).astype(np.float32))
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[t], [t - 10]]))
    params = model.init(jax.random.PRNGKey(0), feats, mask,
                        jnp.zeros((2, 3), jnp.int32))
    dense, dmask = model.apply(params, feats, mask, method=WhisperStyle.encode)

    fsh = jax.device_put(feats, NamedSharding(mesh, P(None, "data", None)))
    msh = jax.device_put(mask, NamedSharding(mesh, P(None, "data")))
    sp, smask = jax.jit(
        lambda p, f, m: model.apply(p, f, m, mesh=mesh, sp_axis="data",
                                    method=WhisperStyle.encode)
    )(params, fsh, msh)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(dense),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(smask), np.asarray(dmask))


def test_transducer_encoder_seq_parallel_matches_dense():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audio_classification_tpu.models.asr.transducer import (
        TransducerConfig,
        TransducerEncoder,
    )
    from audio_classification_tpu.parallel.mesh import make_mesh

    cfg = TransducerConfig(vocab_size=12, dim=16, heads=2, layers=2,
                           ffn_mult=2)
    mesh = make_mesh(8, model_axis=1)
    model = TransducerEncoder(cfg)
    rng = np.random.default_rng(3)
    t, mel = 40, cfg.num_mel
    feats = jnp.asarray(rng.standard_normal((2, t, mel)).astype(np.float32))
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[t], [t - 13]]))
    params = model.init(jax.random.PRNGKey(0), feats, mask)
    dense, dmask = model.apply(params, feats, mask)

    fsh = jax.device_put(feats, NamedSharding(mesh, P(None, "data", None)))
    msh = jax.device_put(mask, NamedSharding(mesh, P(None, "data")))
    sp, smask = jax.jit(
        lambda p, f, m: model.apply(p, f, m, mesh=mesh, sp_axis="data")
    )(params, fsh, msh)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(dense),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(smask), np.asarray(dmask))


def test_paraformer_seq_parallel_matches_dense():
    """Encoder blocks ring-parallel; CIF + NAR decoder stay dense — full
    forward (logits, counts) must match the dense path."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audio_classification_tpu.models.asr.paraformer import (
        Paraformer,
        ParaformerConfig,
    )
    from audio_classification_tpu.parallel.mesh import make_mesh

    cfg = ParaformerConfig(vocab_size=12, dim=16, heads=2, enc_layers=2,
                           dec_layers=1, ffn_mult=2, max_tokens=8)
    mesh = make_mesh(8, model_axis=1)
    model = Paraformer(cfg)
    rng = np.random.default_rng(4)
    t = 24
    lfr_dim = cfg.lfr_m * cfg.num_mel
    feats = jnp.asarray(rng.standard_normal((2, t, lfr_dim)).astype(np.float32))
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[t], [t - 7]]))
    params = model.init(jax.random.PRNGKey(0), feats, mask)
    d_logits, d_counts = model.apply(params, feats, mask)

    fsh = jax.device_put(feats, NamedSharding(mesh, P(None, "data", None)))
    msh = jax.device_put(mask, NamedSharding(mesh, P(None, "data")))
    s_logits, s_counts = jax.jit(
        lambda p, f, m: model.apply(p, f, m, mesh=mesh, sp_axis="data")
    )(params, fsh, msh)
    np.testing.assert_allclose(np.asarray(s_logits), np.asarray(d_logits),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(s_counts), np.asarray(d_counts))


def test_sp_encoders_lower_without_remat_warnings(capfd):
    """VERDICT round-2 item 2: the SP path must compile WITHOUT the SPMD
    partitioner's "Involuntary full rematerialization" warnings (round-2
    dryrun showed a wall of them over SenseVoiceEncoder/slice|concatenate).
    capfd reads the OS-level fd, which is where XLA's C++ logger writes.
    Distinctive dims force fresh compiles (a cache hit would be vacuous)."""
    import jax
    import jax.numpy as jnp

    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig,
        SenseVoiceEncoder,
    )
    from audio_classification_tpu.models.asr.whisper_style import (
        WhisperStyle,
        WhisperStyleConfig,
    )
    from audio_classification_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, model_axis=1)
    rng = np.random.default_rng(11)
    capfd.readouterr()  # drain anything earlier

    sv_cfg = SenseVoiceConfig(vocab_size=13, dim=16, heads=2, layers=2,
                              ffn_mult=2, conv_kernel=3)
    sv = SenseVoiceEncoder(sv_cfg)
    t = 26  # prompt+t misaligned with the 8-way axis: pads must stay clean
    feats = jnp.asarray(rng.standard_normal((1, t, 10)).astype(np.float32))
    mask = jnp.asarray(np.arange(t)[None, :] < t - 3)
    params = sv.init(jax.random.PRNGKey(0), feats, mask)
    # inputs arrive UNSHARDED (exactly how transcribe_long calls it); the
    # encoder's sp_seq_shard pads + pins the sharding internally
    jax.jit(lambda p, f, m: sv.apply(p, f, m, mesh=mesh, sp_axis="data")
            )(params, feats, mask).block_until_ready()

    wcfg = WhisperStyleConfig(vocab_size=13, dim=16, heads=2, enc_layers=2,
                              dec_layers=1, ffn_mult=2)
    wm = WhisperStyle(wcfg)
    t2, mel = 34, wcfg.num_mel
    wf = jnp.asarray(rng.standard_normal((1, t2, mel)).astype(np.float32))
    wmask = jnp.asarray(np.arange(t2)[None, :] < t2 - 5)
    wparams = wm.init(jax.random.PRNGKey(0), wf, wmask,
                      jnp.zeros((1, 3), jnp.int32))
    enc_out = jax.jit(
        lambda p, f, m: wm.apply(p, f, m, mesh=mesh, sp_axis="data",
                                 method=WhisperStyle.encode)
    )(wparams, wf, wmask)
    jax.block_until_ready(enc_out)

    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[:2000]


def test_sp_encoder_gradients_match_dense():
    """Sequence-parallel TRAINING: the CTC gradient through ring attention
    (shard_map + ppermute, streaming softmax) matches the dense gradient —
    the backward pass of the ring is the transposed ring."""
    from audio_classification_tpu.models.asr.ctc import ctc_loss
    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig, SenseVoiceEncoder)

    cfg = SenseVoiceConfig(vocab_size=12, dim=16, heads=2, layers=2,
                           ffn_mult=2, conv_kernel=3)
    enc = SenseVoiceEncoder(cfg)
    mesh = make_mesh(8, model_axis=1)
    t = 64
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, t, 10)).astype(np.float32))
    fmask = jnp.asarray(np.arange(t)[None, :] < np.asarray([t, t - 9])[:, None])
    params = enc.init(jax.random.PRNGKey(0), feats, fmask)
    labels = jnp.asarray(rng.integers(1, 12, size=(2, 6)).astype(np.int32))
    lab_lens = jnp.asarray([6, 4], np.int32)

    def loss(p, mesh_arg):
        logits = enc.apply(p, feats, fmask, mesh=mesh_arg)[:, cfg.num_prompt:]
        return ctc_loss(logits, fmask.astype(jnp.float32), labels, lab_lens,
                        blank_id=0)

    ld, gd = jax.value_and_grad(loss)(params, None)
    ls, gs = jax.value_and_grad(lambda p: loss(p, mesh))(params)
    assert float(ls) == pytest.approx(float(ld), rel=1e-5)
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)))
    assert worst < 2e-4, f"SP gradient drift {worst}"
