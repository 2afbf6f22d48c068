"""`convert_models --verify` acceptance harness over a synthetic model dir.

Lays out a directory exactly like the reference's install.sh models tree
(speaker ONNX, a sherpa-style SenseVoice dir with model.onnx + tokens.txt,
a MossFormer torch checkpoint), runs the harness, and asserts the report:
per-graph jit-vs-eager exec parity passes on executable graphs, the
map-vs-direct check degrades to an explained SKIP when a graph's topology
doesn't match the graph-aware mapper (these synthetic graphs don't — the
mapper's own parity is unit-tested in test_onnx_graph_map against its
structural fixtures), and the torch import smoke passes.
"""
import json

import numpy as np
import pytest

from test_onnx_stage import _asr_graph, _speaker_graph


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from test_convert import _mossformer_state_dict

    from audio_classification_tpu.engine import tiny_preset

    root = tmp_path_factory.mktemp("reference_models")
    preset = tiny_preset()
    rng = np.random.RandomState(0)

    spk_dir = root / "models" / "speaker-recognition"
    spk_dir.mkdir(parents=True)
    path, _, _ = _speaker_graph(spk_dir, rng, mel=80, dim=preset.spk.embed_dim)
    (spk_dir / "spk.onnx").rename(
        spk_dir / "3dspeaker_speech_eres2net_tiny_sv_16k.onnx")

    sv_dir = root / "models" / "asr" / "sherpa-onnx-sense-voice-tiny"
    sv_dir.mkdir(parents=True)
    syms = ["<blk>", "a", "b", "c", "d", "e", "f", "g"]
    (sv_dir / "tokens.txt").write_text(
        "\n".join(f"{s} {i}" for i, s in enumerate(syms)), encoding="utf-8")
    feat_dim = preset.asr.lfr_m * preset.asr.num_mel
    _asr_graph(sv_dir, rng, lfr_dim=feat_dim, vocab=len(syms))
    (sv_dir / "asr.onnx").rename(sv_dir / "model.onnx")

    sep_dir = root / "models" / "separation"
    sep_dir.mkdir(parents=True)
    torch.save(
        {"state_dict": _mossformer_state_dict(torch, preset.mossformer)},
        sep_dir / "mossformer_temporal_8k.bin")
    return root


def test_discovery(model_dir):
    from audio_classification_tpu.models.convert.verify import discover_models

    kinds = {d.kind for d in discover_models(model_dir)}
    assert kinds == {"speaker", "sensevoice", "mossformer"}
    sv = next(d for d in discover_models(model_dir) if d.kind == "sensevoice")
    assert "tokens" in sv.extras


def test_verify_model_dir_end_to_end(model_dir, tmp_path):
    from audio_classification_tpu.cli.convert_models import main

    out = tmp_path / "verify.json"
    main(["--verify", str(model_dir), "--verify-out", str(out),
          "--preset", "tiny"])  # SystemExit(1) on any failure
    report = json.loads(out.read_text())
    assert report["ok"]
    by = {(r["model"].split(":")[0], r["check"].split("[")[0]): r
          for r in report["checks"]}
    assert by[("speaker", "exec_consistency")]["status"] == "pass"
    assert by[("speaker", "exec_consistency")]["max_abs_err"] <= 2e-3
    assert by[("sensevoice", "exec_consistency")]["status"] == "pass"
    # these simple executable graphs don't match the graph-aware mapper's
    # expected topology: the harness must SKIP with the mapping diagnostic,
    # not fail (direct execution is the serving route)
    for kind in ("speaker", "sensevoice"):
        mv = by[(kind, "map_vs_direct")]
        assert mv["status"] == "skipped", mv
        assert "mapping unavailable" in mv["reason"]
    assert by[("mossformer", "torch_import")]["status"] == "pass"


def test_verify_reports_failure(tmp_path):
    """A checkpoint that cannot import must fail the run (exit code 1) and
    the report must carry the diagnostic."""
    torch = pytest.importorskip("torch")
    from audio_classification_tpu.cli.convert_models import main

    root = tmp_path / "models"
    root.mkdir()
    torch.save({"bogus.weight": torch.randn(3, 3)},
               root / "mossformer_broken.bin")
    out = tmp_path / "verify.json"
    with pytest.raises(SystemExit):
        main(["--verify", str(root), "--verify-out", str(out),
              "--preset", "tiny"])
    report = json.loads(out.read_text())
    assert not report["ok"]
    assert any(r["status"] == "error" and "MossFormer" in r.get("reason", "")
               for r in report["checks"])
