"""Full-system demo: every stage trained in-framework, then the flagship
pipeline end-to-end with REAL speaker gating.

The construction lives in the package as the executable quality gate
(audio_classification_tpu/pipelines/quality_gate.py; CLI:
``python -m audio_classification_tpu.cli.quality_gate``) — a synthetic
world with linguistic content and speaker identity:
- a speaker is an octave band (base 500*2^spk Hz);
- letters a-h are eighth-octave offsets within the speaker's band;
- an utterance is a word voiced as a 250 ms tone per letter.

All four stages train on this world (3-src Conv-TasNet PIT, OSD frame-BCE,
speaker AAM-softmax, SenseVoice-CTC), then the flagship Overlap3Pipeline
runs on scenes where the enrolled target talks throughout while interferers
overlap the middle — with a dev-calibrated sv_threshold, so the SV gate
genuinely selects the target's branch.

Reported: the reference's headline quality metrics (BASELINE.md) —
target_hit_rate_segments, sep SI-SDR/SI-SDRi (PIT) — plus per-record CER
between each record's emitted text and the letters the target actually
voiced in that record's span. The committed artifact (QUALITY_r*.json at
the repo root) is produced by the CLI with the same code path.

Run: python examples/full_system_demo.py        (~20 min on one TPU v5e)
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from audio_classification_tpu.runtime.device import enable_compilation_cache

    enable_compilation_cache()
    from audio_classification_tpu.pipelines.quality_gate import run_quality_gate

    return run_quality_gate(steps_scale=1.0, n_scenes=6)


if __name__ == "__main__":
    main()
