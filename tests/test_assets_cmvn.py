"""CMVN (am.mvn) loading + frontend application + engine/CLI wiring."""
import numpy as np
import pytest

from audio_classification_tpu.models.convert.assets import load_kaldi_cmvn


def _write_mvn(path, shift, scale):
    s = " ".join(f"{x:.6f}" for x in shift)
    r = " ".join(f"{x:.6f}" for x in scale)
    path.write_text(
        "<Nnet>\n"
        f"<AddShift> {len(shift)} {len(shift)}\n"
        f"<LearnRateCoef> 0 [ {s} ]\n"
        f"<Rescale> {len(scale)} {len(scale)}\n"
        f"<LearnRateCoef> 0 [ {r} ]\n"
        "</Nnet>\n"
    )


def test_load_kaldi_cmvn_funasr_format(tmp_path):
    rng = np.random.default_rng(0)
    shift = rng.normal(size=6).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, 6).astype(np.float32)
    p = tmp_path / "am.mvn"
    _write_mvn(p, shift, scale)
    s, r = load_kaldi_cmvn(p)
    np.testing.assert_allclose(s, shift, atol=1e-5)
    np.testing.assert_allclose(r, scale, atol=1e-5)


def test_load_kaldi_cmvn_bare_vectors(tmp_path):
    p = tmp_path / "mvn.txt"
    p.write_text("[ 1.0 2.0 ]\n[ 0.5 0.25 ]\n")
    s, r = load_kaldi_cmvn(p)
    np.testing.assert_allclose(s, [1.0, 2.0])
    np.testing.assert_allclose(r, [0.5, 0.25])


def test_load_kaldi_cmvn_rejects_garbage(tmp_path):
    p = tmp_path / "bad.mvn"
    p.write_text("nothing here")
    with pytest.raises(ValueError):
        load_kaldi_cmvn(p)


def test_sensevoice_frontend_cmvn_post_lfr():
    import jax.numpy as jnp

    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig,
        sensevoice_frontend,
    )

    cfg = SenseVoiceConfig(vocab_size=8, dim=8, heads=2, layers=1,
                           lfr_m=3, lfr_n=2)
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32) * 0.1)
    lens = jnp.asarray([4000])
    base, _ = sensevoice_frontend(wav, lens, cfg)
    d = base.shape[-1]
    assert d == cfg.lfr_m * cfg.num_mel
    shift = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
    post, _ = sensevoice_frontend(wav, lens, cfg, shift, scale)
    np.testing.assert_allclose(np.asarray(post), np.asarray((base + shift) * scale),
                               atol=1e-5)
    # per-mel stats apply before LFR stacking
    shift80 = jnp.asarray(rng.standard_normal(cfg.num_mel).astype(np.float32))
    scale80 = jnp.asarray(rng.uniform(0.5, 1.5, cfg.num_mel).astype(np.float32))
    pre, _ = sensevoice_frontend(wav, lens, cfg, shift80, scale80)
    assert not np.allclose(np.asarray(pre), np.asarray(base))
    # wrong dim is a loud error
    with pytest.raises(ValueError):
        sensevoice_frontend(wav, lens, cfg, jnp.zeros(7), jnp.ones(7))


def test_build_engine_imports_onnx_and_cmvn(tmp_path):
    """End-to-end wiring: --spk-embed-model/--sense-voice .onnx files and
    --cmvn am.mvn flow through build_engine into served weights."""
    from helpers_onnx import GraphBuilder
    from test_onnx_graph_map import _build_sensevoice_fixture, _build_speaker_fixture

    from audio_classification_tpu.engine.runtime import tiny_preset
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    preset = tiny_preset()
    rng = np.random.default_rng(2)
    gb = GraphBuilder()
    _build_speaker_fixture(preset.spk, rng, gb)
    spk_path = gb.write(tmp_path / "spk.onnx")

    # engine clamps ASR vocab to max(cfg.vocab, token table)=64 for tiny
    import dataclasses

    asr_cfg = dataclasses.replace(preset.asr, vocab_size=64)
    gb2 = GraphBuilder()
    _build_sensevoice_fixture(asr_cfg, asr_cfg.lfr_m * asr_cfg.num_mel, rng, gb2)
    sv_path = gb2.write(tmp_path / "sv.onnx")

    d = asr_cfg.lfr_m * asr_cfg.num_mel
    mvn = tmp_path / "am.mvn"
    _write_mvn(mvn, rng.standard_normal(d).astype(np.float32),
               rng.uniform(0.5, 1.5, d).astype(np.float32))

    cfg = Overlap3Config(preset="tiny", spk_embed_model=str(spk_path),
                         sense_voice=str(sv_path), cmvn=str(mvn), max_batch=2)
    eng = build_engine(cfg)
    # imported (not seed) weights are being served
    served = np.asarray(eng.pack.params["spk"]["params"]["proj"]["kernel"])
    from audio_classification_tpu.models.convert.onnx_graph_map import import_onnx

    expect = import_onnx(spk_path, "speaker", preset.spk)["params"]["proj"]["kernel"]
    np.testing.assert_array_equal(served, expect)
    assert eng.pack.cmvn_shift is not None and eng.pack.cmvn_shift.shape == (d,)

    wav = (rng.standard_normal(6000) * 0.1).astype(np.float32)
    emb = eng.embed([wav])
    assert emb.shape == (1, preset.spk.embed_dim) and np.isfinite(emb).all()
    text = eng.transcribe([wav])
    assert isinstance(text[0], str)


def test_convert_models_map_cli(tmp_path):
    from helpers_onnx import GraphBuilder
    from test_onnx_graph_map import _build_speaker_fixture

    from audio_classification_tpu.cli.convert_models import main
    from audio_classification_tpu.engine.runtime import ModelPack, tiny_preset
    from audio_classification_tpu.train.checkpoint import load_model_pack

    preset = tiny_preset()
    rng = np.random.default_rng(3)
    gb = GraphBuilder()
    _build_speaker_fixture(preset.spk, rng, gb)
    spk_path = gb.write(tmp_path / "spk.onnx")
    out = tmp_path / "ckpt"
    main(["--out", str(out), "--preset", "tiny",
          "--onnx", str(spk_path), "--map", "speaker"])

    pack = ModelPack(tiny_preset(), seed=9)
    before = np.asarray(pack.params["spk"]["params"]["proj"]["kernel"]).copy()
    load_model_pack(pack, str(out))
    after = np.asarray(pack.params["spk"]["params"]["proj"]["kernel"])
    assert not np.array_equal(before, after)
