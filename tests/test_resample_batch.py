"""Batched resampler vs single-item resampler + dataset-mode pipeline run."""
import json

import numpy as np
import pytest

from audio_classification_tpu.audio_io import write_wav
from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine, tiny_preset


@pytest.fixture(scope="module")
def engine():
    pack = ModelPack(tiny_preset(), seed=0)
    return StageEngine(pack, BucketSpec(lengths=(8000, 16000, 32000), max_batch=4))


def _tone(n, hz=440.0, sr=8000):
    t = np.arange(n) / sr
    return (0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_resample_batch_matches_single(engine):
    wavs = [_tone(4000), _tone(6100, 700), _tone(2500, 300)]
    batch = engine.resample_batch(wavs, 8000, 16000)
    for w, b in zip(wavs, batch):
        solo = engine.resample(w, 8000, 16000)
        assert b.shape == solo.shape
        # padded-batch edges only differ within half a filter length
        n = solo.shape[0]
        guard = 600
        np.testing.assert_allclose(b[:n - guard], solo[:n - guard], atol=1e-4)


def test_resample_batch_identity_and_empty(engine):
    wavs = [_tone(100)]
    same = engine.resample_batch(wavs, 16000, 16000)
    np.testing.assert_array_equal(same[0], wavs[0])
    tiny = engine.resample_batch([np.zeros(1, np.float32)], 8000, 16000)
    assert tiny[0].shape == (1,)


def test_dataset_mode_pipeline_8k(tmp_path):
    """Libri3Mix-style 8k dataset run exercises the wave batch resampler."""
    from audio_classification_tpu.pipelines.offline_overlap3 import Overlap3Pipeline
    from audio_classification_tpu.utils.config import Overlap3Config

    sr = 8000
    base = tmp_path / "Libri3Mix" / "wav8k" / "min" / "test"
    for sub in ("mix_clean", "s1", "s2", "s3"):
        (base / sub).mkdir(parents=True)
    for i in range(2):
        srcs = [_tone(int(2.5 * sr), 250 + 120 * k, sr=sr) for k in range(3)]
        mix = np.sum(srcs, axis=0)
        name = f"m{i}.wav"
        for k, s in enumerate(srcs):
            write_wav(base / f"s{k+1}" / name, s, sr)
        write_wav(base / "mix_clean" / name, mix, sr)

    cfg = Overlap3Config(
        librimix_root=str(tmp_path), subset="test", sample_rate=8000,
        preset="tiny", seed=0, sv_threshold=-1.0, max_segment_sec=8.0,
        max_files=2, enable_metrics=False, eval_separation=True,
        min_overlap_dur=0.1, osd_thr=0.0,
    )
    result = Overlap3Pipeline(cfg).run()
    m = result.metrics
    assert result.processed_mixtures == 2
    # 2 mixtures x 2.5 s (resampled to 16 k keeps duration)
    assert m["total_audio_sec"] == pytest.approx(5.0, abs=0.05)
    assert m["segments_total"] >= 1
    assert m["sep_eval_segments"] >= 1  # K=3 PIT ran against resampled sources
    for rec in result.segments:
        assert rec["target_src"] is not None  # dataset-mode target pick wired
