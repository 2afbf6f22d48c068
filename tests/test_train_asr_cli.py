"""cli/train_asr: manifest data, resume, export -> --sense-voice serving.

Second training family with a product surface (the reference never trains
anything — src/model.py:37-100 only instantiates sherpa recognizers from
exported .onnx files).
"""
import json

import numpy as np
import pytest

from audio_classification_tpu.audio_io import write_wav
from audio_classification_tpu.cli import train_asr as ta

TINY = ["--dim", "64", "--heads", "2", "--layers", "2", "--conv-kernel", "3",
        "--batch", "2", "--log-every", "100"]


def _write_tokens(path, chars):
    lines = ["<blk> 0"] + [f"{ch} {i}" for i, ch in enumerate(sorted(chars), 1)]
    # pad the table to the tiny preset's vocab (build_engine sizes the CTC
    # head from the token table; training must match)
    lines += [f"<unused{i}> {i}" for i in range(len(chars) + 1, 64)]
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(path)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("asr_corpus")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        word = "".join(rng.choice(list("abcd")) for _ in range(3))
        wav = ta._speak(rng, word)
        p = root / f"u{i}.wav"
        write_wav(p, wav, ta.SR)
        rows.append({"wav": str(p), "text": word})
    man = root / "train.jsonl"
    man.write_text("\n".join(json.dumps(r) for r in rows), encoding="utf-8")
    tokens = _write_tokens(root / "tokens.txt", "abcdefgh")
    return root, str(man), tokens


@pytest.mark.slow
def test_manifest_train_ckpt_resume_export(corpus, capsys, tmp_path):
    root, man, tokens = corpus
    ck, export = str(tmp_path / "ck"), str(tmp_path / "export")
    onnx_path = str(tmp_path / "sv.onnx")
    c0, c1 = ta.main(["--manifest", man, "--tokens", tokens, "--steps", "3",
                      "--max-seconds", "1.5", "--ckpt-dir", ck,
                      "--save-every", "2", "--export", export,
                      "--export-onnx", onnx_path] + TINY)
    assert np.isfinite(c0) and np.isfinite(c1)
    out = capsys.readouterr().out
    assert "checkpoint @ step 2" in out

    # the ONNX export runs on the framework's own graph executor and emits
    # [batch, prompt+frames, vocab] logits
    from audio_classification_tpu.models.convert.onnx_exec import OnnxModel
    from audio_classification_tpu.models.convert.onnx_import import (
        load_onnx_metadata)

    meta = load_onnx_metadata(onnx_path)
    assert meta["model_type"] == "sensevoice"
    m = OnnxModel(onnx_path)
    (vi,) = [v for v in m.graph.inputs if v.name == "feats"]
    t_in, d_in = int(vi.shape[1]), int(vi.shape[2])
    logits = np.asarray(m(
        feats=np.random.default_rng(0).standard_normal(
            (1, t_in, d_in)).astype(np.float32),
        language=np.asarray([0], np.int64))["logits"])
    assert logits.shape == (1, int(meta["num_prompt"]) + t_in, 64)

    # resume picks up at step 3, not 0
    ta.main(["--manifest", man, "--tokens", tokens, "--steps", "4",
             "--max-seconds", "1.5", "--ckpt-dir", ck, "--resume"] + TINY)
    out = capsys.readouterr().out
    assert "resumed" in out and "at step 3" in out

    # the exported dir serves through build_engine --sense-voice <dir>
    import argparse

    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine

    cfg = argparse.Namespace(preset="tiny", seed=0, sense_voice=export,
                             tokens=tokens, max_batch=2, max_segment_sec=2.0)
    eng = build_engine(cfg)
    text = eng.transcribe([ta._speak(np.random.default_rng(1), "abc")], "auto")[0]
    assert isinstance(text, str)


def test_seq_parallel_training_smoke():
    """--seq-parallel: gradients flow through ring attention (frame axis on
    the data mesh axis, batch replicated); loss stays finite."""
    c0, c1 = ta.main(["--synthetic", "--steps", "2", "--batch", "2",
                      "--seq-parallel", "--data-parallel", "8",
                      "--dim", "32", "--heads", "2", "--layers", "1",
                      "--conv-kernel", "3", "--log-every", "100"])
    assert np.isfinite(c0) and np.isfinite(c1)


def test_tsv_manifest_and_char_vocab(corpus, tmp_path):
    root, man, _ = corpus
    rows = [json.loads(ln) for ln in open(man, encoding="utf-8")]
    tsv = tmp_path / "train.tsv"
    tsv.write_text("\n".join(f"{r['wav']}\t{r['text']}" for r in rows),
                   encoding="utf-8")
    c0, c1 = ta.main(["--manifest", str(tsv), "--steps", "2",
                      "--max-seconds", "1.5"] + TINY)
    assert np.isfinite(c0) and np.isfinite(c1)


def test_init_onnx_finetunes_mapped_export(corpus, tmp_path, capsys):
    """--init-onnx: a (synthetic) SenseVoice export's weights map onto the
    trainable encoder and training continues from them — the fine-tune-the-
    reference's-own-model-on-TPU route."""
    import numpy as np
    from helpers_onnx import GraphBuilder
    from test_onnx_graph_map import _build_sensevoice_fixture

    from audio_classification_tpu.models.asr.sensevoice import SenseVoiceConfig

    _, man, tokens = corpus
    # tiny-preset asr dims (engine/runtime.py:73), vocab = the padded table
    cfg = SenseVoiceConfig(vocab_size=64, dim=64, heads=2, layers=2,
                           conv_kernel=3)
    gb = GraphBuilder()
    _build_sensevoice_fixture(cfg, cfg.lfr_m * cfg.num_mel,
                              np.random.default_rng(9), gb)
    onnx_path = str(tmp_path / "sv_ref.onnx")
    gb.write(onnx_path)

    c0, c1 = ta.main(["--manifest", man, "--tokens", tokens, "--steps", "2",
                      "--max-seconds", "1.0", "--batch", "2",
                      "--log-every", "100", "--init-onnx", onnx_path,
                      "--preset", "tiny"])
    assert np.isfinite(c0) and np.isfinite(c1)
    out = capsys.readouterr().out
    assert "fine-tuning mapped weights" in out


@pytest.mark.slow
def test_export_dim_mismatch_fails_loud(corpus, tmp_path):
    _, man, tokens = corpus
    export = str(tmp_path / "export32")
    ta.main(["--manifest", man, "--tokens", tokens, "--steps", "1",
             "--max-seconds", "1.5", "--export", export, "--dim", "32",
             "--heads", "2", "--layers", "1", "--conv-kernel", "3",
             "--batch", "2", "--log-every", "100"])
    import argparse

    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine

    cfg = argparse.Namespace(preset="tiny", seed=0, sense_voice=export,
                             tokens=tokens, max_batch=2, max_segment_sec=2.0)
    with pytest.raises(ValueError, match="does not match"):
        build_engine(cfg)
