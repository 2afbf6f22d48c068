"""Flagship pipeline benchmark on real hardware.

Runs the full-preset offline overlap3 pipeline (OSD -> Conv-TasNet-3 ->
SV gate -> SenseVoice-CTC ASR) end-to-end over synthetic 3-speaker
mixtures and reports the pipeline real-time factor, the same metric the
reference records (rtf_total = compute_time / audio_time; reference
formula overlap3_core.py:871-872, implied baseline ≈0.175 from
BASELINE.md's 18.7 s compute / ~107 s audio run log).

Prints ONE JSON line:
  {"metric": "pipeline_rtf_total", "value": <rtf>, "unit": "rtf",
   "vs_baseline": <baseline_rtf / rtf>}   (vs_baseline > 1 == faster)
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RTF = 0.175  # reference run log, BASELINE.md (todo.md:7,11)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_mixtures(n: int, dur_sec: float, sr: int = 16000, seed: int = 0):
    """Synthetic 3-speaker mixtures with real overlap structure."""
    rng = np.random.default_rng(seed)
    items = []
    t = int(dur_sec * sr)
    for i in range(n):
        srcs = []
        for k in range(3):
            hz = 180.0 * (k + 1) + 37.0 * i
            tt = np.arange(t) / sr
            env = np.clip(np.sin(2 * np.pi * (0.11 + 0.07 * k) * tt + k), 0, None)
            s = (0.25 * np.sin(2 * np.pi * hz * tt) * env
                 + 0.02 * rng.standard_normal(t)).astype(np.float32)
            srcs.append(s)
        mix = np.sum(srcs, axis=0).astype(np.float32)
        items.append((mix, srcs))
    return items


def main():
    import tempfile
    from pathlib import Path

    from audio_classification_tpu.audio_io import write_wav
    from audio_classification_tpu.pipelines.offline_overlap3 import Overlap3Pipeline
    from audio_classification_tpu.utils.config import Overlap3Config

    sr = 16000
    n_mix, dur = 32, 10.0
    items = make_mixtures(n_mix, dur, sr)

    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        paths = []
        for i, (mix, srcs) in enumerate(items):
            p = tdp / f"mix_{i}.wav"
            write_wav(p, mix, sr)
            paths.append(str(p))
        target = tdp / "target.wav"
        write_wav(target, items[0][1][0][: sr * 3], sr)

        cfg = Overlap3Config(
            input_wavs=paths,
            target_wav=str(target),
            preset="full",
            seed=0,
            sv_threshold=-1.0,   # random weights: exercise the full path
            osd_thr=0.3,
            min_overlap_dur=0.4,
            max_batch=8,
            max_segment_sec=16.0,
            wave_mixtures=16,
            enable_metrics=False,
        )

        # --- warmup run: identical full pass so every (bucket, batch) stage
        # program is compiled; steady-state serving reuses compiled programs,
        # so the measured pass excludes one-time XLA compilation.
        log("bench: warmup/compile pass ...")
        pipe = Overlap3Pipeline(cfg)
        t0 = time.time()
        pipe.run()
        log(f"bench: warmup done in {time.time()-t0:.1f}s")

        # --- measured run, reusing the compiled engine
        cfg_run = Overlap3Config(**{**cfg.__dict__})
        pipeline = Overlap3Pipeline(cfg_run, engine=pipe.engine)
        t0 = time.time()
        result = pipeline.run()
        wall = time.time() - t0

    m = result.metrics
    rtf = m["rtf_total"]
    log(f"bench: audio={m['total_audio_sec']}s compute={m['time_compute_total_sec']}s "
        f"osd={m['time_osd_sec']} sep={m['time_sep_sec']} asr={m['time_asr_sec']} "
        f"segments={m['segments_total']} wall={wall:.2f}s")
    print(json.dumps({
        "metric": "pipeline_rtf_total",
        "value": rtf,
        "unit": "rtf",
        "vs_baseline": round(BASELINE_RTF / rtf, 4) if rtf else None,
    }))


if __name__ == "__main__":
    main()
