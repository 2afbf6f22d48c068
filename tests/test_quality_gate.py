"""Quality-gate plumbing smoke (tiny steps_scale — trains for a handful of
steps, so GATE VALUES are not asserted here; the committed QUALITY_r*.json
artifact comes from a full-scale run of the same code path)."""
import json

import numpy as np
import pytest

from audio_classification_tpu.pipelines.quality_gate import span_truth


def test_span_truth_rule():
    # letters are 250 ms; >=50% of a slot inside the span counts
    assert span_truth("abcd", 0.0, 1.0) == "abcd"
    assert span_truth("abcd", 0.0, 0.624) == "ab"    # c has 49.6% coverage
    assert span_truth("abcd", 0.0, 0.626) == "abc"   # c has 50.4%
    # a covers [0,.25): span starts .13 -> 48% -> out; d covers [.75,1.0):
    # span ends .9 -> 60% -> in
    assert span_truth("abcd", 0.13, 0.9) == "bcd"
    assert span_truth("ab", 2.0, 3.0) == ""          # span past the word


@pytest.mark.slow
def test_quality_gate_plumbing(tmp_path):
    """End-to-end CLI at ~1% step budget: artifact schema + gate logic.

    Random-ish weights won't pass the quality gates — --no-gate-exit keeps
    exit 0; the test asserts the artifact carries every field the judge
    and the full-scale run rely on."""
    from audio_classification_tpu.cli.quality_gate import main

    out = tmp_path / "QUALITY_smoke.json"
    artifact = main(["--out", str(out), "--steps-scale", "0.01",
                     "--scenes", "2", "--no-gate-exit"])
    on_disk = json.loads(out.read_text())
    assert on_disk["kind"] == "quality_gate"
    for key in ("quality_ok", "gates", "target_hit_rate_segments",
                "cer_mean", "cer_concat_mean", "sep_sisdr_mean",
                "sep_sisdri_mean", "sv_threshold_calibrated",
                "sep_final_loss", "asr_final_loss", "train_wall_sec",
                "pipeline_wall_sec", "backend"):
        assert key in on_disk, key
    assert on_disk["n_scenes"] == 2
    assert isinstance(on_disk["quality_ok"], bool)
    assert artifact["quality_ok"] == on_disk["quality_ok"]
    if on_disk["cer_mean"] is not None:
        assert 0.0 <= on_disk["cer_mean"] <= 1.5
