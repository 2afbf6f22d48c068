"""Dataset-mode --seed reproducibility (reference parity: overlap3_core
seeds random/np and picks a random source per mixture, :189-198,557-559)."""
import numpy as np
import pytest

from audio_classification_tpu.audio_io import write_wav
from audio_classification_tpu.pipelines.offline_overlap3 import Overlap3Pipeline, build_engine
from audio_classification_tpu.utils.config import Overlap3Config


@pytest.fixture(scope="module")
def librimix3(tmp_path_factory):
    root = tmp_path_factory.mktemp("lm3")
    sr = 8000
    base = root / "Libri3Mix" / "wav8k" / "min" / "test"
    for sub in ("mix_clean", "s1", "s2", "s3"):
        (base / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        srcs = [(0.2 * np.sin(2 * np.pi * (200 + 90 * k + 30 * i) * np.arange(2 * sr) / sr)).astype(np.float32)
                for k in range(3)]
        name = f"m{i}.wav"
        for k, s in enumerate(srcs):
            write_wav(base / f"s{k+1}" / name, s, sr)
        write_wav(base / "mix_clean" / name, np.sum(srcs, axis=0), sr)
    return str(root)


def _cfg(root, seed, **kw):
    base = dict(librimix_root=root, subset="test", sample_rate=8000, preset="tiny",
                seed=seed, sv_threshold=-1.0, max_segment_sec=8.0, max_files=4,
                osd_thr=0.0, min_overlap_dur=0.1)
    base.update(kw)
    return Overlap3Config(**base)


def test_same_seed_same_targets(librimix3):
    engine = build_engine(_cfg(librimix3, 0))
    r1 = Overlap3Pipeline(_cfg(librimix3, 7), engine=engine).run()
    r2 = Overlap3Pipeline(_cfg(librimix3, 7), engine=engine).run()
    t1 = [rec["target_src"] for rec in r1.segments]
    t2 = [rec["target_src"] for rec in r2.segments]
    assert t1 == t2 and t1, "same seed must reproduce the target-source picks"
    assert [r["text"] for r in r1.segments] == [r["text"] for r in r2.segments]


@pytest.mark.slow
def test_wave_size_does_not_change_picks(librimix3):
    engine = build_engine(_cfg(librimix3, 0))
    r1 = Overlap3Pipeline(_cfg(librimix3, 7, wave_mixtures=1), engine=engine).run()
    r2 = Overlap3Pipeline(_cfg(librimix3, 7, wave_mixtures=4), engine=engine).run()
    assert [x["target_src"] for x in r1.segments] == [x["target_src"] for x in r2.segments]


@pytest.mark.slow
def test_different_seed_may_differ(librimix3):
    engine = build_engine(_cfg(librimix3, 0))
    picks = set()
    for seed in (1, 2, 3, 4, 5):
        r = Overlap3Pipeline(_cfg(librimix3, seed), engine=engine).run()
        picks.add(tuple(rec["target_src"] for rec in r.segments))
    # 4 mixtures x 3 sources: five seeds virtually never all collide
    assert len(picks) > 1
