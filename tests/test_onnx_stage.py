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
    got_ids, got_n = eng.collect_tokens(eng.launch_transcribe([wav]))[0]
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


def _paraformer_graph(tmp_path, rng, lfr_dim, vocab, n_head=5, fire=4):
    """speech [B,T,D] + speech_lengths [B] -> (logits [B,n_head,V],
    token_num [B]) like the funasr/sherpa paraformer export
    (reference: src/model.py:69-77)."""
    w = (rng.randn(lfr_dim, vocab) * 0.5).astype(np.float32)
    b = rng.randn(vocab).astype(np.float32)
    g = GraphBuilder()
    wn, bn = g.add_init("w", w), g.add_init("b", b)
    s0 = g.add_init("starts", np.array([0], np.int64))
    e0 = g.add_init("ends", np.array([n_head], np.int64))
    a0 = g.add_init("axes", np.array([1], np.int64))
    g.raw("Slice", ["speech", s0, e0, a0], ["head"])
    g.raw("MatMul", ["head", wn], ["mm"])
    g.raw("Add", ["mm", bn], ["logits"])
    cap = g.add_init("cap", np.array([fire], np.int32))
    g.raw("Min", ["speech_lengths", cap], ["token_num"])
    path = g.write(tmp_path / "pf.onnx",
                   inputs=[("speech", np.float32, ["B", "T", lfr_dim]),
                           ("speech_lengths", np.int32, ["B"])],
                   outputs=[("logits", np.float32, ["B", n_head, vocab]),
                            ("token_num", np.int32, ["B"])])
    return path, w, b


def test_paraformer_direct_through_engine(tmp_path):
    rng = np.random.RandomState(7)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="paraformer")
    cfg = pack.paraformer_cfg
    lfr_dim = cfg.lfr_m * cfg.num_mel
    path, w, b = _paraformer_graph(tmp_path, rng, lfr_dim, cfg.vocab_size)
    pack.set_onnx_stage("asr", OnnxStage(path, n_outputs=2))
    eng = StageEngine(pack)

    wav = (0.3 * rng.randn(8000)).astype(np.float32)
    got_ids, got_n = eng.collect_tokens(eng.launch_transcribe([wav]))[0]

    import jax.numpy as jnp

    from audio_classification_tpu.models.asr.paraformer import paraformer_frontend

    feats, mask = paraformer_frontend(
        jnp.asarray(_as_engine_sees(eng, wav))[None], jnp.asarray([len(wav)]), cfg)
    logits = np.asarray(feats)[:, :5] @ w + b
    counts = min(int(np.asarray(mask).sum()), 4)
    exp = logits.argmax(-1)[0][:counts]
    assert int(got_n) == counts
    assert list(got_ids[: int(got_n)]) == list(exp)


def test_paraformer_direct_requires_two_outputs(tmp_path):
    rng = np.random.RandomState(8)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="paraformer")
    cfg = pack.paraformer_cfg
    path, _, _ = _paraformer_graph(tmp_path, rng, cfg.lfr_m * cfg.num_mel,
                                   cfg.vocab_size)
    with pytest.raises(ValueError, match="token_num"):
        pack.set_onnx_stage("asr", OnnxStage(path))  # n_outputs defaults to 1


def test_build_engine_paraformer_direct(tmp_path):
    rng = np.random.RandomState(9)
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    pack_probe = ModelPack(tiny_preset(), seed=0, asr_family="paraformer")
    cfg_m = pack_probe.paraformer_cfg
    path, _, _ = _paraformer_graph(tmp_path, rng, cfg_m.lfr_m * cfg_m.num_mel,
                                   cfg_m.vocab_size)
    cfg = Overlap3Config(preset="tiny", paraformer=str(path), onnx_exec="direct")
    eng = build_engine(cfg)
    assert len(eng.pack.onnx_stages["asr"].outputs) == 2
    text = eng.transcribe([(0.3 * rng.randn(8000)).astype(np.float32)])
    assert isinstance(text[0], str)


def _transducer_triple(tmp_path, rng, mel=80, d=16, emb_dim=8, V=64):
    """encoder/decoder/joiner fixture graphs shaped like the sherpa export
    (reference: src/model.py:88-99)."""
    from helpers_onnx import node, value_info, model_bytes

    we = (rng.randn(mel, d) * 0.5).astype(np.float32)
    enc = model_bytes(
        [node("MatMul", ["x", "we"], ["encoder_out"]),
         node("Identity", ["x_lens"], ["encoder_out_lens"])],
        {"we": we},
        inputs=[value_info("x", np.float32, ["B", "T", mel]),
                value_info("x_lens", np.int32, ["B"])],
        outputs=[value_info("encoder_out", np.float32, ["B", "T", d]),
                 value_info("encoder_out_lens", np.int32, ["B"])])
    (tmp_path / "enc.onnx").write_bytes(enc)

    emb = (rng.randn(V, emb_dim) * 0.5).astype(np.float32)
    wd = (rng.randn(d, 2 * emb_dim) * 0.5).astype(np.float32)
    bd = rng.randn(d).astype(np.float32)
    dec = model_bytes(
        [node("Gather", ["emb", "y"], ["ge"]),
         node("Reshape", ["ge", "flat_shape"], ["flat"]),
         node("Gemm", ["flat", "wd", "bd"], ["decoder_out"], transB=1)],
        {"emb": emb, "flat_shape": np.array([0, 2 * emb_dim], np.int64),
         "wd": wd, "bd": bd},
        inputs=[value_info("y", np.int64, ["B", 2])],
        outputs=[value_info("decoder_out", np.float32, ["B", d])])
    (tmp_path / "dec.onnx").write_bytes(dec)

    wj = (rng.randn(V, d) * 0.5).astype(np.float32)
    bj = rng.randn(V).astype(np.float32)
    join = model_bytes(
        [node("Add", ["encoder_out", "decoder_out"], ["s"]),
         node("Tanh", ["s"], ["h"]),
         node("Gemm", ["h", "wj", "bj"], ["logit"], transB=1)],
        {"wj": wj, "bj": bj},
        inputs=[value_info("encoder_out", np.float32, ["B", d]),
                value_info("decoder_out", np.float32, ["B", d])],
        outputs=[value_info("logit", np.float32, ["B", V])])
    (tmp_path / "join.onnx").write_bytes(join)
    paths = tuple(str(tmp_path / n) for n in ("enc.onnx", "dec.onnx", "join.onnx"))
    return paths, (we, emb, wd, bd, wj, bj)


def test_transducer_triple_direct_through_engine(tmp_path):
    rng = np.random.RandomState(10)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="transducer")
    cfg = pack.transducer_cfg
    paths, (we, emb, wd, bd, wj, bj) = _transducer_triple(
        tmp_path, rng, mel=cfg.num_mel, V=cfg.vocab_size)
    from audio_classification_tpu.models.convert.onnx_stage import OnnxTransducerStage

    stage = OnnxTransducerStage(*paths)
    assert stage.context == 2 and stage.enc_lens_out == "encoder_out_lens"
    pack.set_onnx_stage("asr", stage)
    eng = StageEngine(pack)

    wav = (0.3 * rng.randn(8000)).astype(np.float32)
    got_ids, got_n = eng.collect_tokens(eng.launch_transcribe([wav]))[0]

    # independent numpy greedy loop over the same graphs' math
    import jax.numpy as jnp

    from audio_classification_tpu.models.asr.transducer import transducer_frontend

    feats, mask = transducer_frontend(
        jnp.asarray(_as_engine_sees(eng, wav))[None], jnp.asarray([len(wav)]), cfg)
    n_valid = int(np.asarray(mask).sum())
    enc = np.asarray(feats)[0] @ we  # [T, d]

    def pred(ctx):
        return emb[np.asarray(ctx)].reshape(-1) @ wd.T + bd

    ctx, ids = [0, 0], []
    for t in range(n_valid):
        logit = np.tanh(enc[t] + pred(ctx)) @ wj.T + bj
        s = int(logit.argmax())
        if s != 0:
            ids.append(s)
            ctx = [ctx[1], s]
    assert len(ids) > 0
    assert int(got_n) == len(ids)
    assert list(got_ids[: int(got_n)]) == ids


def test_transducer_triple_beam_matches_numpy_beam(tmp_path):
    """Direct-exec modified beam search (decode(..., beam=K)) against an
    independent numpy beam search over the same graphs' math (reference:
    src/model.py:47-99, sherpa's num_active_paths beam decoder)."""
    rng = np.random.RandomState(12)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="transducer")
    cfg = pack.transducer_cfg
    paths, (we, emb, wd, bd, wj, bj) = _transducer_triple(
        tmp_path, rng, mel=cfg.num_mel, V=cfg.vocab_size)
    from audio_classification_tpu.models.convert.onnx_stage import OnnxTransducerStage

    stage = OnnxTransducerStage(*paths)

    import jax.numpy as jnp

    from audio_classification_tpu.models.asr.transducer import transducer_frontend

    wav = (0.4 * rng.randn(8000)).astype(np.float32)
    feats, mask = transducer_frontend(jnp.asarray(wav)[None],
                                      jnp.asarray([len(wav)]), cfg)
    K = 3
    got_ids, got_n = stage.decode(stage.params, feats, mask, beam=K)
    got_ids, got_n = np.asarray(got_ids), np.asarray(got_n)

    # independent numpy modified beam search (no merging, <=1 emit/frame)
    n_valid = int(np.asarray(mask).sum())
    enc = np.asarray(feats)[0] @ we  # [T, d]

    def pred(ctx):
        return emb[np.asarray(ctx)].reshape(-1) @ wd.T + bd

    def logsoftmax(x):
        x = x - x.max()
        return x - np.log(np.exp(x).sum())

    beams = [([0, 0], 0.0, [])]  # (ctx, score, emitted)
    for t in range(n_valid):
        cands = []
        for ctx, score, out in beams:
            logit = np.tanh(enc[t] + pred(ctx)) @ wj.T + bj
            lp = logsoftmax(logit.astype(np.float64))
            for v in range(len(lp)):
                cands.append((score + lp[v], v, ctx, out))
        cands.sort(key=lambda c: -c[0])
        beams = []
        for sc, v, ctx, out in cands[:K]:
            if v == 0:
                beams.append((ctx, sc, out))
            else:
                beams.append(([ctx[1], v], sc, out + [v]))
    best = max(beams, key=lambda bm: bm[1])[2]

    assert int(got_n[0]) == len(best)
    assert list(got_ids[0][: len(best)]) == best


def test_transducer_direct_rejects_single_graph(tmp_path):
    rng = np.random.RandomState(11)
    path, _, _ = _speaker_graph(tmp_path, rng)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="transducer")
    with pytest.raises(ValueError, match="triple"):
        pack.set_onnx_stage("asr", OnnxStage(path, verbose=False))


def _whisper_pair(tmp_path, rng, mel=80, d=8, V=64, metadata=None):
    """encoder/decoder fixture like the sherpa whisper export (reference:
    sp-id script:316-345): channels-first mel encoder -> cross tensor;
    decoder with tokens/offset/self-cache IO and an AR transition matrix
    whose greedy chain is sot(3) -> 4 -> 5 -> 6 -> eot(2)."""
    from helpers_onnx import node, value_info, model_bytes

    we = (rng.randn(mel, d) * 0.5).astype(np.float32)
    enc = model_bytes(
        [node("Transpose", ["mel_in"], ["tm"], perm=[0, 2, 1]),
         node("MatMul", ["tm", "we"], ["proj"]),
         node("ReduceMean", ["proj"], ["cross"], axes=[1], keepdims=1)],
        {"we": we},
        inputs=[value_info("mel_in", np.float32, ["B", mel, "T"])],
        outputs=[value_info("cross", np.float32, ["B", 1, d])],
        metadata=metadata)
    (tmp_path / "wenc.onnx").write_bytes(enc)

    tmat = np.zeros((V, V), np.float32)
    for a, b_ in ((3, 4), (4, 5), (5, 6), (6, 2)):
        tmat[a, b_] = 5.0
    wc = (rng.randn(d, V) * 0.1).astype(np.float32)
    dec = model_bytes(
        [node("Gather", ["tmat", "tokens"], ["tl"]),
         node("MatMul", ["cross", "wc"], ["cl"]),
         node("Mul", ["cl", "small"], ["cls"]),
         node("Add", ["tl", "cls"], ["logits"]),
         node("Add", ["in_self_cache", "one"], ["out_self_cache"])],
        {"tmat": tmat, "wc": wc,
         "small": np.asarray(0.01, np.float32),
         "one": np.asarray(1.0, np.float32)},
        inputs=[value_info("tokens", np.int64, ["B", "n"]),
                value_info("offset", np.int64, ["B"]),
                value_info("in_self_cache", np.float32, [2, "B", 4, d]),
                value_info("cross", np.float32, ["B", 1, d])],
        outputs=[value_info("logits", np.float32, ["B", "n", V]),
                 value_info("out_self_cache", np.float32, [2, "B", 4, d])])
    (tmp_path / "wdec.onnx").write_bytes(dec)
    return str(tmp_path / "wenc.onnx"), str(tmp_path / "wdec.onnx")


def test_whisper_pair_direct_through_engine(tmp_path):
    rng = np.random.RandomState(12)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="whisper")
    wc = pack.whisper_cfg
    enc_p, dec_p = _whisper_pair(tmp_path, rng, mel=wc.num_mel, V=wc.vocab_size)
    from audio_classification_tpu.models.convert.onnx_stage import OnnxWhisperStage

    stage = OnnxWhisperStage(enc_p, dec_p, sot_sequence=(3,), eot_id=2,
                             max_decode_len=10, num_mel=wc.num_mel)
    assert stage.channels_first
    assert stage.cross_names == ["cross"]
    assert stage.cache_map == {"in_self_cache": "out_self_cache"}
    pack.set_onnx_stage("asr", stage)
    eng = StageEngine(pack)

    wav = (0.3 * rng.randn(8000)).astype(np.float32)
    got_ids, got_n = eng.collect_tokens(eng.launch_transcribe([wav]))[0]
    # greedy chain: prime(sot=3)->4, then 5, 6, then eot(2) stops emission
    assert int(got_n) == 3
    assert list(got_ids[:3]) == [4, 5, 6]


def test_whisper_metadata_configures_stage(tmp_path):
    """sherpa whisper exports self-describe via metadata_props; metadata
    wins over argument fallbacks (sp-id script:316-345 relies on
    sherpa-onnx reading exactly these keys)."""
    from audio_classification_tpu.models.convert.onnx_import import load_onnx_metadata
    from audio_classification_tpu.models.convert.onnx_stage import OnnxWhisperStage

    rng = np.random.RandomState(15)
    meta = {
        "sot_sequence": "50258,50259,50359",
        "eot": "50257", "n_mels": "80", "no_timestamps": "50363",
        "all_language_codes": "en,zh",
        "all_language_tokens": "50259,50260",
        "translate": "50358",
    }
    enc_p, dec_p = _whisper_pair(tmp_path, rng, metadata=meta)
    assert load_onnx_metadata(enc_p)["eot"] == "50257"
    stage = OnnxWhisperStage(enc_p, dec_p, sot_sequence=(3,), eot_id=2,
                             max_decode_len=4, num_mel=80, language="zh",
                             verbose=False)
    # language slot replaced, no_timestamps appended, args overridden
    assert stage.sot == (50258, 50260, 50359, 50363)
    assert stage.eot == 50257 and stage.num_mel == 80
    tr = OnnxWhisperStage(enc_p, dec_p, max_decode_len=4, task="translate",
                          verbose=False)
    assert tr.sot == (50258, 50259, 50358, 50363)


def test_whisper_direct_rejects_single_graph(tmp_path):
    rng = np.random.RandomState(13)
    path, _, _ = _speaker_graph(tmp_path, rng)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="whisper")
    with pytest.raises(ValueError, match="pair"):
        pack.set_onnx_stage("asr", OnnxStage(path, verbose=False))


def test_build_engine_whisper_direct(tmp_path):
    rng = np.random.RandomState(14)
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    probe = ModelPack(tiny_preset(), seed=0, asr_family="whisper")
    enc_p, dec_p = _whisper_pair(tmp_path, rng, mel=probe.whisper_cfg.num_mel,
                                 V=probe.whisper_cfg.vocab_size)
    cfg = Overlap3Config(preset="tiny", onnx_exec="direct")
    cfg.whisper_encoder = enc_p
    cfg.whisper_decoder = dec_p
    eng = build_engine(cfg)
    assert eng.pack.onnx_stages["asr"].family == "whisper"
    text = eng.transcribe([(0.3 * rng.randn(8000)).astype(np.float32)])
    assert isinstance(text[0], str)


def test_build_engine_wenet_ctc_direct(tmp_path):
    """--wenet-ctc serves the export directly: plain fbank frames (LFR
    collapsed to 1), no prompt skip, shared CTC decode (reference
    sp-id:346-357 from_wenet_ctc)."""
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    rng = np.random.RandomState(22)
    probe = ModelPack(tiny_preset(), seed=0)
    mel = probe.asr_cfg.num_mel
    V = probe.asr_cfg.vocab_size
    # wenet-style signature: fbank frames + lengths only (no prompts)
    w = (rng.randn(mel, V) * 0.5).astype(np.float32)
    from helpers_onnx import model_bytes, node, value_info

    graph = model_bytes(
        [node("MatMul", ["speech", "w"], ["logits"])],
        {"w": w},
        inputs=[value_info("speech", np.float32, ["B", "T", mel]),
                value_info("speech_lengths", np.int32, ["B"])],
        outputs=[value_info("logits", np.float32, ["B", "T", V])])
    (tmp_path / "wenet.onnx").write_bytes(graph)

    cfg = Overlap3Config(preset="tiny", seed=0, max_batch=2)
    cfg.wenet_ctc = str(tmp_path / "wenet.onnx")
    eng = build_engine(cfg)
    assert eng.pack.asr_cfg.lfr_m == 1 and eng.pack.asr_cfg.lfr_n == 1
    assert eng.pack.onnx_stages["asr"].skip_frames == 0

    wav = (0.3 * rng.randn(8000)).astype(np.float32)
    got_ids, got_n = eng.collect_tokens(eng.launch_transcribe([wav]))[0]

    # oracle: the frontend with LFR collapsed must emit mel-dim frames
    # (a leftover LFR stack would shape-error the matmul here)
    import jax.numpy as jnp

    from audio_classification_tpu.models.asr.sensevoice import sensevoice_frontend

    feats, mask = sensevoice_frontend(
        jnp.asarray(_as_engine_sees(eng, wav))[None],
        jnp.asarray([len(wav)]), eng.pack.asr_cfg)
    logits = np.asarray(feats) @ w
    best = logits.argmax(-1)[0]
    valid = np.asarray(mask)[0].astype(bool)
    ids, prev = [], 0
    for t_i, v in zip(best, valid):
        if v and t_i != 0 and t_i != prev:
            ids.append(int(t_i))
        prev = t_i
    assert list(got_ids[: int(got_n)]) == ids


def test_fused_paths_with_direct_onnx_stages(tmp_path):
    """Direct ONNX spk+ASR graphs inside the FUSED clean/overlap device
    programs — the actual serving configuration when real checkpoints are
    served with --onnx-exec direct. Fused outputs must match granular
    stage composition (same contract as tests/test_fused_paths.py)."""
    rng = np.random.RandomState(21)
    pack = ModelPack(tiny_preset(), seed=0)
    spk_path, _, _ = _speaker_graph(tmp_path, rng)
    lfr_dim = pack.asr_cfg.lfr_m * pack.asr_cfg.num_mel
    asr_path, _, _ = _asr_graph(tmp_path, rng, lfr_dim, pack.asr_cfg.vocab_size)
    pack.set_onnx_stage("spk", OnnxStage(spk_path, verbose=False))
    pack.set_onnx_stage("asr", OnnxStage(asr_path, skip_frames=0))
    eng = StageEngine(pack)

    chunks = [(0.3 * rng.randn(5000)).astype(np.float32),
              (0.3 * rng.randn(8000)).astype(np.float32)]
    target = eng.embed([_tone(8000)])[0]

    fused = eng.process_clean(chunks, [target, target])
    embs = eng.embed(chunks)
    texts = eng.transcribe(chunks)
    for (score, text), emb, ref_text in zip(fused, embs, texts):
        assert abs(score - float(emb @ target)) < 5e-3
        assert text == ref_text

    ov = eng.process_overlap(chunks, [target, target])
    branches = eng.separate(chunks, n_src=3)
    for rec, br in zip(ov, branches):
        scores = eng.embed([br[i] for i in range(3)]) @ target
        assert np.abs(np.asarray(rec["scores"]) - scores).max() < 5e-3
        assert rec["best"] == int(np.argmax(scores))
        assert rec["text"] == eng.transcribe([br[rec["best"]]])[0]


def test_set_onnx_stage_rejects_unsupported(tmp_path):
    rng = np.random.RandomState(6)
    path, _, _ = _speaker_graph(tmp_path, rng)
    pack = ModelPack(tiny_preset(), seed=0, asr_family="wenet")
    stage = OnnxStage(path, verbose=False)
    with pytest.raises(ValueError, match="sensevoice"):
        pack.set_onnx_stage("asr", stage)
    with pytest.raises(ValueError, match="not supported"):
        pack.set_onnx_stage("sep3", stage)
