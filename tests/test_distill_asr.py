"""cli/distill_asr: ONNX teacher -> small trainable student via logit KD.

The teacher runs through the same OnnxStage the serving engine uses, so a
real sherpa export or this framework's own export both work; the fixture
uses the latter (export_sensevoice of a random 'big' encoder).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_classification_tpu.cli import distill_asr as da
from audio_classification_tpu.cli.train_asr import _ALPHABET
from audio_classification_tpu.models.asr.sensevoice import (
    SenseVoiceConfig, SenseVoiceEncoder)
from audio_classification_tpu.models.asr.tokens import TokenTable
from audio_classification_tpu.models.convert.onnx_export import export_sensevoice

pytestmark = pytest.mark.slow  # deep-verification tier (see pyproject)

STUDENT = ["--dim", "32", "--heads", "2", "--layers", "1",
           "--conv-kernel", "3", "--batch", "2", "--log-every", "100",
           "--max-seconds", "1.2"]


@pytest.fixture(scope="module")
def teacher(tmp_path_factory):
    root = tmp_path_factory.mktemp("kd")
    lines = ["<blk> 0"] + [f"{ch} {i}" for i, ch in enumerate(_ALPHABET, 1)]
    lines += [f"<unused{i}> {i}" for i in range(9, 64)]
    tok_path = root / "tokens.txt"
    tok_path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    tokens = TokenTable.load(str(tok_path))

    cfg = SenseVoiceConfig(vocab_size=tokens.vocab_size, dim=32, heads=2,
                           layers=2, ffn_mult=2, conv_kernel=3)
    model = SenseVoiceEncoder(cfg)
    # frames for 1.2 s of 16 kHz audio through the shared frontend
    frames = cfg.out_frames(int(1.2 * 16000)) - cfg.num_prompt
    params = model.init(jax.random.PRNGKey(5),
                        jnp.zeros((1, frames, cfg.lfr_m * cfg.num_mel)))
    onnx_path = str(root / "teacher.onnx")
    export_sensevoice(params, cfg, onnx_path, frames=frames)
    return onnx_path, str(tok_path)


def test_distill_synthetic_ckpt_resume_export(teacher, tmp_path, capsys):
    onnx_path, tok_path = teacher
    ck, export = str(tmp_path / "ck"), str(tmp_path / "export")
    a0, a1 = da.main(["--teacher-onnx", onnx_path, "--tokens", tok_path,
                      "--synthetic", "--steps", "3", "--ckpt-dir", ck,
                      "--save-every", "2", "--export", export,
                      "--kd-temp", "2.0"] + STUDENT)
    assert np.isfinite(a0) and np.isfinite(a1)
    out = capsys.readouterr().out
    assert "checkpoint @ step 2" in out

    # resume continues at step 3
    da.main(["--teacher-onnx", onnx_path, "--tokens", tok_path,
             "--synthetic", "--steps", "4", "--ckpt-dir", ck,
             "--resume"] + STUDENT)
    out = capsys.readouterr().out
    assert "resumed" in out and "at step 3" in out

    # exported student params load back into the same-arch encoder
    from audio_classification_tpu.train.checkpoint import load_params

    cfg = SenseVoiceConfig(vocab_size=64, dim=32, heads=2, layers=1,
                           conv_kernel=3)
    template = SenseVoiceEncoder(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, cfg.lfr_m * cfg.num_mel)))
    restored = load_params(template, export)
    assert any(not np.allclose(a, b) for a, b in zip(
        jax.tree.leaves(template), jax.tree.leaves(restored)))


def test_distill_ctc_weight_path(teacher, tmp_path):
    onnx_path, tok_path = teacher
    a0, a1 = da.main(["--teacher-onnx", onnx_path, "--tokens", tok_path,
                      "--synthetic", "--steps", "2",
                      "--ctc-weight", "0.3"] + STUDENT)
    assert np.isfinite(a0) and np.isfinite(a1)


def test_distillation_converges_toward_teacher(teacher, tmp_path):
    """More steps -> student greedy decode agrees with the teacher more
    than at init (the actual point of KD)."""
    onnx_path, tok_path = teacher
    a0, a1 = da.main(["--teacher-onnx", onnx_path, "--tokens", tok_path,
                      "--synthetic", "--steps", "60", "--lr", "2e-3",
                      "--kd-temp", "2.0"] + STUDENT)
    assert a1 < a0, f"agreement did not improve: {a0} -> {a1}"
