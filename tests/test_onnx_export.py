"""ONNX exporter round-trip: flax forward == exported graph executed by the
framework's OWN parser + graph executor (and therefore by onnxruntime,
which implements the same opset semantics).

The oracle chain is deliberately self-contained: onnx_export writes the
protobuf, onnx_import re-reads it, onnx_exec runs it — three independent
code paths that must agree with the flax module bit-for-bit up to f32
accumulation order.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from audio_classification_tpu.models.convtasnet import ConvTasNet, ConvTasNetConfig
from audio_classification_tpu.models.convert.onnx_exec import OnnxModel
from audio_classification_tpu.models.convert.onnx_export import export_convtasnet
from audio_classification_tpu.models.convert.onnx_import import (
    load_onnx_graph, load_onnx_metadata)


def _make(cfg, seed=0):
    import jax

    model = ConvTasNet(cfg)
    t = 4000
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, t)),
                        jnp.ones((1, t)))
    return model, params


@pytest.mark.parametrize("n_src,mask_act", [(2, "relu"), (3, "sigmoid")])
def test_convtasnet_roundtrip(tmp_path, n_src, mask_act):
    cfg = ConvTasNetConfig(n_src=n_src, enc_dim=32, enc_kernel=16,
                           bottleneck=16, hidden=24, conv_kernel=3,
                           n_blocks=3, n_repeats=2, mask_act=mask_act,
                           sample_rate=8000)
    model, params = _make(cfg)
    path = str(tmp_path / "sep.onnx")
    export_convtasnet(params, cfg, path, seconds=0.5)

    t = int(0.5 * cfg.sample_rate)
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((3, t)).astype(np.float32) * 0.3

    ref = np.asarray(model.apply(params, jnp.asarray(mix)))
    m = OnnxModel(path)
    got = np.asarray(m(mix=jnp.asarray(mix))["est"])
    assert got.shape == ref.shape == (3, n_src, t)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 2e-3, f"relative err {err}"


def test_export_pads_odd_length(tmp_path):
    """seconds that do NOT tile the encoder stride exercise the Pad node."""
    cfg = ConvTasNetConfig(n_src=2, enc_dim=16, enc_kernel=16, bottleneck=8,
                           hidden=16, conv_kernel=3, n_blocks=2, n_repeats=1,
                           sample_rate=8000)
    model, params = _make(cfg)
    path = str(tmp_path / "sep.onnx")
    export_convtasnet(params, cfg, path, seconds=0.3013)  # 2410 samples
    t = int(round(0.3013 * 8000))
    mix = np.random.default_rng(1).standard_normal((2, t)).astype(np.float32)
    ref = np.asarray(model.apply(params, jnp.asarray(mix)))
    got = np.asarray(OnnxModel(path)(mix=jnp.asarray(mix))["est"])
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 2e-3


@pytest.mark.parametrize("lang,use_itn,conv_kernel", [(0, True, 3), (2, False, 0)])
def test_sensevoice_roundtrip(tmp_path, lang, use_itn, conv_kernel):
    """Trained CTC encoder -> ONNX: flax forward == exported graph (incl.
    the runtime `language` input, baked itn row, and symbolic batch)."""
    import jax

    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig, SenseVoiceEncoder)
    from audio_classification_tpu.models.convert.onnx_export import (
        export_sensevoice)

    cfg = SenseVoiceConfig(vocab_size=16, dim=32, heads=2, layers=2,
                           ffn_mult=2, conv_kernel=conv_kernel)
    model = SenseVoiceEncoder(cfg)
    t, din = 9, cfg.lfr_m * cfg.num_mel
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((3, t, din)).astype(np.float32) * 0.4
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t, din)))

    ref = np.asarray(model.apply(params, jnp.asarray(feats),
                                 language_id=lang, use_itn=use_itn))
    path = str(tmp_path / "sv.onnx")
    export_sensevoice(params, cfg, path, frames=t, use_itn=use_itn)
    got = np.asarray(OnnxModel(path)(
        feats=jnp.asarray(feats),
        language=np.asarray([lang], np.int64))["logits"])
    assert got.shape == ref.shape == (3, cfg.num_prompt + t, 16)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 2e-3, f"relative err {err}"

    meta = load_onnx_metadata(path)
    assert meta["model_type"] == "sensevoice"
    assert int(meta["num_prompt"]) == cfg.num_prompt
    assert int(meta["use_itn"]) == int(use_itn)


def test_sensevoice_int8_export(tmp_path):
    """quant='int8' emits dynamic-quant MatMulInteger graphs (the artifact
    type of the reference's own int8 SenseVoice export): output tracks the
    float forward within quantization error, and the file shrinks."""
    import jax

    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig, SenseVoiceEncoder)
    from audio_classification_tpu.models.convert.onnx_export import (
        export_sensevoice)

    cfg = SenseVoiceConfig(vocab_size=16, dim=32, heads=2, layers=2,
                           ffn_mult=2, conv_kernel=3)
    model = SenseVoiceEncoder(cfg)
    t, din = 9, cfg.lfr_m * cfg.num_mel
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t, din)))
    feats = np.random.default_rng(0).standard_normal(
        (2, t, din)).astype(np.float32) * 0.4

    ref = np.asarray(model.apply(params, jnp.asarray(feats)))
    f32_path, q_path = str(tmp_path / "sv.onnx"), str(tmp_path / "svq.onnx")
    export_sensevoice(params, cfg, f32_path, frames=t)
    export_sensevoice(params, cfg, q_path, frames=t, quant="int8")

    import os

    # the block projections dominate the weight bytes -> real shrink
    assert os.path.getsize(q_path) < 0.55 * os.path.getsize(f32_path)
    got = np.asarray(OnnxModel(q_path)(
        feats=jnp.asarray(feats),
        language=np.asarray([0], np.int64))["logits"])
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 0.08, f"int8 deviates {err} from the float forward"
    assert load_onnx_metadata(q_path)["quant"] == "int8"


def test_mossformer_roundtrip(tmp_path):
    """Second separation backend: flax forward == exported GAU graph."""
    import jax

    from audio_classification_tpu.models.mossformer import (
        MossFormer, MossFormerConfig)
    from audio_classification_tpu.models.convert.onnx_export import (
        export_mossformer)

    cfg = MossFormerConfig(n_src=2, enc_dim=24, enc_kernel=16, dim=20,
                           qk_dim=12, layers=2, conv_kernel=5,
                           sample_rate=8000)
    model = MossFormer(cfg)
    t = int(0.3 * cfg.sample_rate)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t)),
                        jnp.ones((1, t)))
    mix = np.random.default_rng(0).standard_normal((2, t)).astype(np.float32) * 0.3

    ref = np.asarray(model.apply(params, jnp.asarray(mix)))
    path = str(tmp_path / "mf.onnx")
    export_mossformer(params, cfg, path, seconds=0.3)
    got = np.asarray(OnnxModel(path)(mix=jnp.asarray(mix))["est"])
    assert got.shape == ref.shape == (2, 2, t)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 2e-3, f"relative err {err}"
    assert load_onnx_metadata(path)["model_type"] == "mossformer"


def test_osdnet_roundtrip(tmp_path):
    """Fast OSD head (e.g. distilled): flax forward == exported graph,
    including the stride-2 SAME subsampling convs on an odd frame count."""
    import jax

    from audio_classification_tpu.models.osd import OSDConfig, OSDNet
    from audio_classification_tpu.models.convert.onnx_export import (
        export_osdnet)

    cfg = OSDConfig(num_mel=20, dim=24, heads=2, layers=2, conv_kernel=5)
    model = OSDNet(cfg)
    frames = 37  # odd: exercises asymmetric SAME pads in both convs
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, frames, cfg.num_mel)))
    feats = np.random.default_rng(1).standard_normal(
        (3, frames, cfg.num_mel)).astype(np.float32)

    ref = np.asarray(model.apply(params, jnp.asarray(feats)))
    path = str(tmp_path / "osd.onnx")
    export_osdnet(params, cfg, path, frames=frames)
    got = np.asarray(OnnxModel(path)(feats=jnp.asarray(feats))["probs"])
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref))
    assert err < 2e-4, f"abs err {err}"  # probs are already in [0, 1]


def test_speaker_roundtrip(tmp_path):
    """ERes2Net-style embedder: flax forward == exported graph (2-D SAME
    convs with strides, inference-mode BatchNorm, Res2 channel split,
    attentive stats pooling)."""
    import jax

    from audio_classification_tpu.models.speaker import (
        SpeakerEmbedder, SpeakerEmbedderConfig)
    from audio_classification_tpu.models.convert.onnx_export import (
        export_speaker)

    cfg = SpeakerEmbedderConfig(num_mel=20, channels=(8, 16), scale=4,
                                embed_dim=24, asp_hidden=16)
    model = SpeakerEmbedder(cfg)
    frames = 31  # odd: asymmetric SAME pads + ceil-div stride-2 shapes
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, frames, cfg.num_mel)))
    # nudge BN stats off init so the BatchNormalization emission is tested
    # against non-trivial statistics
    variables = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 1 else a, variables)
    feats = np.random.default_rng(2).standard_normal(
        (3, frames, cfg.num_mel)).astype(np.float32)

    ref = np.asarray(model.apply(variables, jnp.asarray(feats)))
    path = str(tmp_path / "spk.onnx")
    export_speaker(variables, cfg, path, frames=frames)
    got = np.asarray(OnnxModel(path)(feats=jnp.asarray(feats))["emb"])
    assert got.shape == ref.shape == (3, 24)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 2e-3, f"relative err {err}"
    assert load_onnx_metadata(path)["model_type"] == "speaker_embedder"


def test_pyannet_roundtrip(tmp_path):
    """Exact-parity OSD: flax forward (full-length rows) == exported graph
    (baked SincNet kernel, BiLSTM gate reorder, InstanceNorm, MaxPool)."""
    from audio_classification_tpu.models.pyannet import PyanNet, PyanNetConfig
    from audio_classification_tpu.models.convert.onnx_export import (
        export_pyannet)

    cfg = PyanNetConfig(n_filters=8, kernel_size=51, stride=10,
                        conv_channels=(8,), conv_kernel=5, pool=3,
                        lstm_hidden=8, lstm_layers=2, linear_dims=(8,),
                        num_classes=3)
    model = PyanNet(cfg)
    params = model.init(seed=0)
    samples = 2000
    wav = np.random.default_rng(3).standard_normal(
        (2, samples)).astype(np.float32) * 0.3
    lengths = np.full(2, samples, np.int32)

    ref = np.asarray(model.apply(params, jnp.asarray(wav),
                                 jnp.asarray(lengths)))
    path = str(tmp_path / "pn.onnx")
    export_pyannet(params, cfg, path, samples=samples)
    got = np.asarray(OnnxModel(path)(wav=jnp.asarray(wav))["probs"])
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref))
    assert err < 2e-4, f"abs err {err}"  # sigmoid probs in [0, 1]
    assert load_onnx_metadata(path)["model_type"] == "pyannet"


def test_vadnet_roundtrip(tmp_path):
    """VAD head: flax forward == exported graph (dilated SAME convs)."""
    import jax

    from audio_classification_tpu.models.vad import VADConfig, VADNet
    from audio_classification_tpu.models.convert.onnx_export import (
        export_vadnet)

    cfg = VADConfig(num_mel=20, dim=16, layers=3, kernel=5)
    model = VADNet(cfg)
    frames = 40
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, frames, cfg.num_mel)))
    feats = np.random.default_rng(4).standard_normal(
        (2, frames, cfg.num_mel)).astype(np.float32)

    ref = np.asarray(model.apply(params, jnp.asarray(feats)))
    path = str(tmp_path / "vad.onnx")
    export_vadnet(params, cfg, path, frames=frames)
    got = np.asarray(OnnxModel(path)(feats=jnp.asarray(feats))["probs"])
    assert got.shape == ref.shape == (2, frames)
    assert np.max(np.abs(got - ref)) < 2e-4
    assert load_onnx_metadata(path)["model_type"] == "vadnet"


def test_export_metadata_and_signature(tmp_path):
    cfg = ConvTasNetConfig(n_src=3, enc_dim=16, enc_kernel=16, bottleneck=8,
                           hidden=16, conv_kernel=3, n_blocks=2, n_repeats=1,
                           sample_rate=8000)
    _, params = _make(cfg)
    path = str(tmp_path / "sep.onnx")
    export_convtasnet(params, cfg, path, seconds=0.5)
    meta = load_onnx_metadata(path)
    assert meta["model_type"] == "convtasnet"
    assert int(meta["n_src"]) == 3 and int(meta["sample_rate"]) == 8000
    g = load_onnx_graph(path)
    assert g.input_names == ["mix"]
    assert g.output_names == ["est"]
    (vi,) = [v for v in g.inputs if v.name == "mix"]
    assert vi.shape == ["batch", 4000]
