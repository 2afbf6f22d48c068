"""cli/train_speaker: AAM training, resume, export -> --spk-embed-model.

Fourth training family with a product surface (the reference's speaker
extractor is a frozen 3D-Speaker ONNX — src/model.py:103-124 — and never
trains).
"""
import json

import numpy as np
import pytest

from audio_classification_tpu.audio_io import write_wav
from audio_classification_tpu.cli import train_speaker as tsp

TINY = ["--channels", "8,16", "--embed-dim", "32", "--batch", "4",
        "--max-seconds", "0.5", "--log-every", "100"]


@pytest.mark.slow
def test_synthetic_train_ckpt_resume_export_serve(tmp_path, capsys):
    ck, export = str(tmp_path / "ck"), str(tmp_path / "export")
    onnx_path = str(tmp_path / "spk.onnx")
    a0, a1 = tsp.main(["--synthetic", "--num-speakers", "4", "--steps", "3",
                       "--ckpt-dir", ck, "--save-every", "2",
                       "--export", export, "--export-onnx", onnx_path] + TINY)
    assert np.isfinite(a0) and np.isfinite(a1)
    out = capsys.readouterr().out
    assert "checkpoint @ step 2" in out

    # the ONNX export runs standalone and emits [batch, embed_dim]
    from audio_classification_tpu.models.convert.onnx_exec import OnnxModel

    om = OnnxModel(onnx_path)
    (vi,) = [v for v in om.graph.inputs if v.name == "feats"]
    emb = np.asarray(om(feats=np.zeros((1, int(vi.shape[1]),
                                        int(vi.shape[2])), np.float32))["emb"])
    assert emb.shape == (1, 32)

    # resume picks up at step 3, not 0
    tsp.main(["--synthetic", "--num-speakers", "4", "--steps", "4",
              "--ckpt-dir", ck, "--resume"] + TINY)
    out = capsys.readouterr().out
    assert "resumed" in out and "at step 3" in out

    # the exported embedder serves through build_engine --spk-embed-model
    # <dir> (tiny preset dims = the TINY training flags) and differs from
    # the seed init
    import argparse

    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine

    cfg0 = argparse.Namespace(preset="tiny", seed=0, max_batch=2,
                              max_segment_sec=1.0)
    cfg1 = argparse.Namespace(preset="tiny", seed=0, max_batch=2,
                              max_segment_sec=1.0, spk_embed_model=export)
    eng0, eng1 = build_engine(cfg0), build_engine(cfg1)
    k0 = np.asarray(eng0.pack.params["spk"]["params"]["proj"]["kernel"])
    k1 = np.asarray(eng1.pack.params["spk"]["params"]["proj"]["kernel"])
    assert not np.array_equal(k0, k1)

    wav = tsp.synth_utterance(np.random.default_rng(0), 1, 0.5)
    emb = eng1.embed([wav])
    assert np.asarray(emb).shape == (1, 32)


def test_manifest_mode_and_mismatch_fails_loud(tmp_path):
    root = tmp_path
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        spk = i % 2
        wav = tsp.synth_utterance(rng, spk, 0.5)
        p = root / f"u{i}.wav"
        write_wav(p, wav, tsp.SR)
        rows.append({"wav": str(p), "speaker": f"s{spk}"})
    man = root / "train.jsonl"
    man.write_text("\n".join(json.dumps(r) for r in rows), encoding="utf-8")

    # a held-out manifest containing a speaker ABSENT from training must
    # not crash the gate (open-set bank search; review finding r3)
    w = tsp.synth_utterance(rng, 7, 0.5)
    p = root / "unseen.wav"
    write_wav(p, w, tsp.SR)
    val = root / "val.jsonl"
    val.write_text(json.dumps({"wav": str(p), "speaker": "mystery"}),
                   encoding="utf-8")
    a0u, a1u = tsp.main(["--manifest", str(man), "--val-manifest", str(val),
                         "--steps", "1", "--channels", "8",
                         "--embed-dim", "16", "--batch", "4",
                         "--max-seconds", "0.5", "--log-every", "100"])
    assert np.isfinite(a0u) and np.isfinite(a1u)

    export = str(root / "export16")
    a0, a1 = tsp.main(["--manifest", str(man), "--steps", "2",
                       "--channels", "8", "--embed-dim", "16",
                       "--batch", "4", "--max-seconds", "0.5",
                       "--log-every", "100", "--export", export])
    assert np.isfinite(a0) and np.isfinite(a1)

    # a 16-dim export must NOT silently serve through the 32-dim tiny preset
    import argparse

    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine

    cfg = argparse.Namespace(preset="tiny", seed=0, max_batch=2,
                             max_segment_sec=1.0, spk_embed_model=export)
    with pytest.raises(ValueError, match="does not match"):
        build_engine(cfg)
