"""Op-census regression for int8 QDQ exports of every family.

The weights-day contract (docs/ACCEPTANCE.md, reference install.sh:52-61)
delivers quantized ONNX graphs in two shapes: sherpa's dynamic-quant
(DynamicQuantizeLinear/MatMulInteger — covered by quant="int8" tests) and
ORT static-quant QDQ (QuantizeLinear/DequantizeLinear pairs + per-channel
int8 weights). These tests synthesize the QDQ form for EVERY family via
the exporter's quant="qdq" mode and assert the graph executor's
`--probe` gate ("zero unsupported ops") is KNOWN-TRUE for those graph
shapes — plus a loose numeric sanity bound vs the float module (QDQ fake
quantization bounds the error by the activation grid).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from audio_classification_tpu.models.convert.onnx_exec import (
    OnnxModel, supported_ops)


def _census_ok(model: OnnxModel):
    ops = {n.op_type for n in model.graph.nodes}
    unsup = ops - set(supported_ops())
    assert not unsup, f"unsupported ops in QDQ graph: {sorted(unsup)}"
    # the QDQ transform actually fired
    assert "QuantizeLinear" in ops and "DequantizeLinear" in ops
    desc = model.describe()
    assert "UNSUPPORTED" not in desc
    return ops


def test_convtasnet_qdq_census(tmp_path):
    import jax

    from audio_classification_tpu.models.convtasnet import (
        ConvTasNet, ConvTasNetConfig)
    from audio_classification_tpu.models.convert.onnx_export import (
        export_convtasnet)

    cfg = ConvTasNetConfig(n_src=3, enc_dim=16, enc_kernel=16, bottleneck=8,
                           hidden=16, conv_kernel=3, n_blocks=2, n_repeats=1,
                           sample_rate=8000)
    model = ConvTasNet(cfg)
    t = 2000
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, t)),
                        jnp.ones((1, t)))
    path = str(tmp_path / "sep_qdq.onnx")
    export_convtasnet(params, cfg, path, seconds=t / cfg.sample_rate,
                      quant="qdq")
    m = OnnxModel(path)
    _census_ok(m)
    mix = np.random.default_rng(0).standard_normal((2, t)).astype(np.float32) * 0.3
    ref = np.asarray(model.apply(params, jnp.asarray(mix)))
    got = np.asarray(m(mix=jnp.asarray(mix))["est"])
    assert got.shape == ref.shape
    # loose: per-layer activation grids compound through the TCN
    assert np.max(np.abs(got - ref)) < 0.5


def test_sensevoice_qdq_census(tmp_path):
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
    path = str(tmp_path / "sv_qdq.onnx")
    export_sensevoice(params, cfg, path, frames=t, quant="qdq")
    m = OnnxModel(path)
    _census_ok(m)
    feats = np.random.default_rng(0).standard_normal(
        (2, t, din)).astype(np.float32) * 0.4
    got = np.asarray(m(feats=jnp.asarray(feats),
                       language=np.asarray([0], np.int64))["logits"])
    ref = np.asarray(model.apply(params, jnp.asarray(feats)))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1.0


def test_osdnet_qdq_census(tmp_path):
    import jax

    from audio_classification_tpu.models.osd import OSDConfig, OSDNet
    from audio_classification_tpu.models.convert.onnx_export import (
        export_osdnet)

    cfg = OSDConfig(num_mel=20, dim=24, heads=2, layers=1, conv_kernel=5)
    model = OSDNet(cfg)
    frames = 37
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, frames, cfg.num_mel)))
    path = str(tmp_path / "osd_qdq.onnx")
    export_osdnet(params, cfg, path, frames=frames, quant="qdq")
    m = OnnxModel(path)
    _census_ok(m)
    feats = np.random.default_rng(1).standard_normal(
        (2, frames, cfg.num_mel)).astype(np.float32)
    got = np.asarray(m(feats=jnp.asarray(feats))["probs"])
    ref = np.asarray(model.apply(params, jnp.asarray(feats)))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 0.35  # sigmoid probs


def test_speaker_qdq_census(tmp_path):
    import jax

    from audio_classification_tpu.models.speaker import (
        SpeakerEmbedder, SpeakerEmbedderConfig)
    from audio_classification_tpu.models.convert.onnx_export import (
        export_speaker)

    cfg = SpeakerEmbedderConfig(num_mel=20, channels=(8, 16), scale=4,
                                embed_dim=24, asp_hidden=16)
    model = SpeakerEmbedder(cfg)
    frames = 31
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, frames, cfg.num_mel)))
    path = str(tmp_path / "spk_qdq.onnx")
    export_speaker(variables, cfg, path, frames=frames, quant="qdq")
    m = OnnxModel(path)
    _census_ok(m)
    feats = np.random.default_rng(2).standard_normal(
        (2, frames, cfg.num_mel)).astype(np.float32)
    got = np.asarray(m(feats=jnp.asarray(feats))["emb"])
    ref = np.asarray(model.apply(variables, jnp.asarray(feats)))
    assert got.shape == ref.shape
    # embeddings are used through cosine: direction must survive QDQ
    cos = float(np.sum(got * ref, axis=-1).mean()
                / (np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)).mean())
    assert cos > 0.95, f"QDQ embedding drifted: cos={cos}"


def test_vadnet_qdq_census(tmp_path):
    import jax

    from audio_classification_tpu.models.vad import VADConfig, VADNet
    from audio_classification_tpu.models.convert.onnx_export import (
        export_vadnet)

    cfg = VADConfig(num_mel=20, dim=16, layers=2, kernel=5)
    model = VADNet(cfg)
    frames = 40
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, frames, cfg.num_mel)))
    path = str(tmp_path / "vad_qdq.onnx")
    export_vadnet(params, cfg, path, frames=frames, quant="qdq")
    m = OnnxModel(path)
    _census_ok(m)
    feats = np.random.default_rng(3).standard_normal(
        (2, frames, cfg.num_mel)).astype(np.float32)
    got = np.asarray(m(feats=jnp.asarray(feats))["probs"])
    ref = np.asarray(model.apply(params, jnp.asarray(feats)))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 0.35


def test_qdq_weight_per_channel_roundtrip(tmp_path):
    """The per-channel int8 weight scheme is exact for weights that sit on
    the quantization grid (unit scale check of _qdq_weight semantics)."""
    from audio_classification_tpu.models.convert.onnx_export import (
        OnnxGraphWriter, _qdq_weight)

    g = OnnxGraphWriter("t")
    w = np.asarray([[127.0, -127.0], [63.0, 1.0], [0.0, -2.0]], np.float32)
    out = _qdq_weight(g, w, axis=1)
    g.add("Identity", [out], out="w_dq")
    blob = g.serialize(inputs=[], outputs=[("w_dq", np.float32, [3, 2])])
    p = tmp_path / "w.onnx"
    p.write_bytes(blob)
    got = np.asarray(OnnxModel(str(p))()["w_dq"])
    np.testing.assert_allclose(got, w, rtol=0, atol=1e-5)
