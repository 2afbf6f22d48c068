"""Direct ONNX graph execution as engine stages (models/convert/onnx_stage).

The reference serves its zoo as ONNX sessions (src/model.py:79-124); these
tests prove an exported graph file can be plugged into ModelPack/StageEngine
and produce outputs matching an independent numpy oracle through the full
bucketed dispatch path.
"""
import numpy as np
import pytest

from audio_classification_tpu.engine import ModelPack, StageEngine, tiny_preset
from audio_classification_tpu.models.convert.onnx_stage import OnnxStage
from helpers_onnx import GraphBuilder

SR = 16000


def _tone(n, f=440.0, amp=0.3):
    t = np.arange(n, dtype=np.float32) / SR
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _speaker_graph(tmp_path, rng, mel=80, dim=32):
    """fbank feats [B,T,mel] -> mean over time -> Gemm -> embedding [B,dim]."""
    w = rng.randn(dim, mel).astype(np.float32)
    b = rng.randn(dim).astype(np.float32)
    g = GraphBuilder()
    g.op("ReduceMean", axes=[1], keepdims=0)
    g.gemm(w, b)
    path = g.write(tmp_path / "spk.onnx",
                   inputs=[("input", np.float32, ["B", "T", mel])],
                   outputs=[(g.value, np.float32, ["B", dim])])
    return path, w, b


def _asr_graph(tmp_path, rng, lfr_dim, vocab):
    """LFR feats x [B,T,D] (+ x_length/language/textnorm like the real
    SenseVoice export, src/model.py:79-87) -> MatMul+Add -> logits."""
    w = rng.randn(lfr_dim, vocab).astype(np.float32) * 0.5
    b = rng.randn(vocab).astype(np.float32)
    g = GraphBuilder()
    wn = g.add_init("w", w)
    bn = g.add_init("b", b)
    g.raw("MatMul", ["x", wn], ["mm"])
    g.raw("Add", ["mm", bn], ["logits"])
    path = g.write(tmp_path / "asr.onnx",
                   inputs=[("x", np.float32, ["B", "T", lfr_dim]),
                           ("x_length", np.int32, ["B"]),
                           ("language", np.int32, ["B"]),
                           ("textnorm", np.int32, ["B"])],
                   outputs=[("logits", np.float32, ["B", "T", vocab])])
    return path, w, b


def test_stage_signature_classification(tmp_path):
    rng = np.random.RandomState(0)
    path, _, _ = _asr_graph(tmp_path, rng, lfr_dim=16, vocab=8)
    stage = OnnxStage(path)
    assert stage.feats_input == "x"
    assert stage.length_input == "x_length"
    assert set(stage.int_inputs) == {"language", "textnorm"}
    assert stage.output == "logits"
    assert "OnnxStage" in stage.describe()


def _as_engine_sees(eng, wav):
    """The engine uplinks audio as int16 (runtime.py design rule); oracles
    must apply the same quantization — log-mel is very sensitive near the
    noise floor."""
    return eng._quantize_i16(wav).astype(np.float32) / 32768.0


def test_speaker_stage_through_engine(tmp_path):
    rng = np.random.RandomState(1)
    path, w, b = _speaker_graph(tmp_path, rng)
    pack = ModelPack(tiny_preset(), seed=0)
    pack.set_onnx_stage("spk", OnnxStage(path, verbose=False))
    eng = StageEngine(pack)

    wav = _tone(8000)  # bucket-boundary length: full mask, exact padding
    emb = eng.embed([wav])
    assert emb.shape == (1, 32)

    from audio_classification_tpu.ops.fbank import log_mel_fbank

    feats = np.asarray(log_mel_fbank(_as_engine_sees(eng, wav)[None], eng.fbank_cfg))
    e = feats.mean(axis=1) @ w.T + b
    e = e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(emb, e, atol=1e-4)


def test_asr_stage_through_engine(tmp_path):
    rng = np.random.RandomState(2)
    pack = ModelPack(tiny_preset(), seed=0)
    cfg = pack.asr_cfg
    lfr_dim = cfg.lfr_m * cfg.num_mel
    path, w, b = _asr_graph(tmp_path, rng, lfr_dim, cfg.vocab_size)
    pack.set_onnx_stage("asr", OnnxStage(path, skip_frames=0))
    eng = StageEngine(pack)

    # varied signal so framewise argmax changes over time
    wav = (0.3 * rng.randn(8000)).astype(np.float32)
    got_ids, got_n = eng._collect_bucketed(eng.launch_transcribe([wav]))[0]
    text = pack.tokens.decode(got_ids[: int(got_n)])

    # independent oracle: frontend feats -> matmul -> numpy greedy collapse
    import jax.numpy as jnp

    from audio_classification_tpu.models.asr.sensevoice import sensevoice_frontend

    feats, mask = sensevoice_frontend(
        jnp.asarray(_as_engine_sees(eng, wav))[None], jnp.asarray([len(wav)]), cfg)
    logits = np.asarray(feats) @ w + b
    best = logits.argmax(-1)[0]
    valid = np.asarray(mask)[0].astype(bool)
    ids, prev = [], 0
    for t_i, v in zip(best, valid):
        if v and t_i != 0 and t_i != prev:
            ids.append(int(t_i))
        prev = t_i
    assert len(ids) > 0  # non-vacuous: the oracle emitted tokens
    assert list(got_ids[: int(got_n)]) == ids
    assert text == pack.tokens.decode(ids)


def test_skip_frames_drops_prompt_logits(tmp_path):
    rng = np.random.RandomState(3)
    path, w, b = _asr_graph(tmp_path, rng, lfr_dim=12, vocab=6)
    stage = OnnxStage(path, skip_frames=2)
    x = rng.randn(1, 5, 12).astype(np.float32)
    mask = np.ones((1, 5), bool)
    out = np.asarray(stage(stage.params, x, mask))
    full = x @ w + b
    assert out.shape == (1, 3, 6)
    np.testing.assert_allclose(out, full[:, 2:], atol=1e-5)


def test_fused_clean_path_with_onnx_stages(tmp_path):
    """Both overrides live inside ONE fused device program (clean path)."""
    rng = np.random.RandomState(4)
    spk_path, w, b = _speaker_graph(tmp_path, rng)
    pack = ModelPack(tiny_preset(), seed=0)
    cfg = pack.asr_cfg
    asr_path, _, _ = _asr_graph(tmp_path, rng, cfg.lfr_m * cfg.num_mel, cfg.vocab_size)
    pack.set_onnx_stage("spk", OnnxStage(spk_path, verbose=False))
    pack.set_onnx_stage("asr", OnnxStage(asr_path, skip_frames=0))
    eng = StageEngine(pack)

    wav = _tone(8000)
    target = eng.embed([wav])[0]
    (score, text), = eng.process_clean([wav], [target])
    assert score == pytest.approx(1.0, abs=1e-3)  # self-similarity
    assert text == eng.transcribe([wav])[0]


def test_build_engine_direct_and_auto_modes(tmp_path):
    rng = np.random.RandomState(5)
    spk_path, w, b = _speaker_graph(tmp_path, rng)
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    # direct: serve the graph itself
    cfg = Overlap3Config(preset="tiny", spk_embed_model=str(spk_path),
                         onnx_exec="direct")
    eng = build_engine(cfg)
    assert "spk" in eng.pack.onnx_stages
    emb = eng.embed([_tone(8000)])
    assert emb.shape == (1, 32) and np.isfinite(emb).all()

    # auto: this trivial topology cannot map onto SpeakerEmbedder -> falls
    # back to direct execution instead of raising
    cfg = Overlap3Config(preset="tiny", spk_embed_model=str(spk_path),
                         onnx_exec="auto")
    eng = build_engine(cfg)
    assert "spk" in eng.pack.onnx_stages

    # map (default): the mismatch stays loud
    cfg = Overlap3Config(preset="tiny", spk_embed_model=str(spk_path),
                         onnx_exec="map")
    with pytest.raises(Exception):
        build_engine(cfg)


def test_set_onnx_stage_rejects_unsupported(tmp_path):
    rng = np.random.RandomState(6)
    path, _, _ = _speaker_graph(tmp_path, rng)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="whisper")
    stage = OnnxStage(path, verbose=False)
    with pytest.raises(ValueError, match="sensevoice"):
        pack.set_onnx_stage("asr", stage)
    with pytest.raises(ValueError, match="not supported"):
        pack.set_onnx_stage("sep3", stage)
