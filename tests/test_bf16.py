"""bfloat16 compute mode: numeric closeness + pipeline wiring."""
import numpy as np
import pytest

from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine, tiny_preset


@pytest.fixture(scope="module")
def engines():
    pack = ModelPack(tiny_preset(), seed=0)
    spec = BucketSpec(lengths=(4000, 8000), max_batch=2)
    return StageEngine(pack, spec), StageEngine(pack, spec, compute_dtype="bfloat16")


def _sig(n=4000):
    return (np.random.default_rng(0).standard_normal(n) * 0.1).astype(np.float32)


def test_bf16_separation_close(engines):
    e32, e16 = engines
    x = _sig()
    a, b = e32.separate([x])[0], e16.separate([x])[0]
    scale = max(np.abs(a).max(), 1e-6)
    assert np.abs(a - b).max() / scale < 0.05


def test_bf16_embedding_cosine(engines):
    e32, e16 = engines
    x = _sig()
    ea, eb = e32.embed([x])[0], e16.embed([x])[0]
    assert float(ea @ eb) > 0.999


def test_bf16_osd_and_asr_match(engines):
    e32, e16 = engines
    x = _sig(8000)
    assert e32.osd_segments(x, 16000, 0.5, 0.5, 0.1) == e16.osd_segments(x, 16000, 0.5, 0.5, 0.1)
    assert e32.transcribe([x]) == e16.transcribe([x])


def test_bf16_param_reload_visible(engines):
    # exec_params must track pack.load_params updates (version bump)
    _, e16 = engines
    import jax

    x = _sig()
    before = e16.separate([x])[0]
    new = jax.tree.map(lambda v: v * 0.5, e16.pack.params["sep3"])
    old = e16.pack.params["sep3"]
    e16.pack.load_params("sep3", new)
    after = e16.separate([x])[0]
    e16.pack.load_params("sep3", old)
    assert np.abs(before - after).max() > 1e-6


def test_bf16_pipeline_flag(tmp_path):
    from audio_classification_tpu.audio_io import write_wav
    from audio_classification_tpu.pipelines.offline_overlap3 import Overlap3Pipeline
    from audio_classification_tpu.utils.config import Overlap3Config

    sr = 16000
    t = np.arange(2 * sr) / sr
    mix = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    write_wav(tmp_path / "m.wav", mix, sr)
    write_wav(tmp_path / "t.wav", mix[:sr], sr)
    cfg = Overlap3Config(
        input_wavs=[str(tmp_path / "m.wav")], target_wav=str(tmp_path / "t.wav"),
        preset="tiny", seed=0, sv_threshold=-1.0, max_segment_sec=8.0,
        compute_dtype="bfloat16",
    )
    result = Overlap3Pipeline(cfg).run()
    assert result.metrics["segments_total"] >= 1
