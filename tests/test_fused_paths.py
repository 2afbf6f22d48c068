"""Fused clean/overlap path programs vs granular stage composition."""
import numpy as np
import pytest

from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine, tiny_preset


@pytest.fixture(scope="module")
def engine():
    pack = ModelPack(tiny_preset(), seed=0)
    return StageEngine(pack, BucketSpec(lengths=(4000, 8000, 16000), max_batch=4))


def _tone(n, hz=440.0, sr=16000):
    t = np.arange(n) / sr
    return (0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_clean_path_matches_granular(engine):
    chunks = [_tone(5000), _tone(7000, 880)]
    target = engine.embed([_tone(8000)])[0]
    fused = engine.process_clean(chunks, [target, target])
    embs = engine.embed(chunks)
    texts = engine.transcribe(chunks)
    for (score, text), emb, ref_text in zip(fused, embs, texts):
        assert abs(score - float(emb @ target)) < 5e-3
        assert text == ref_text


def test_overlap_path_matches_granular(engine):
    chunks = [_tone(5000), _tone(6000, 700)]
    target = engine.embed([_tone(8000)])[0]
    fused = engine.process_overlap(chunks, [target, target])
    branches = engine.separate(chunks, n_src=3)
    for rec, br, chunk in zip(fused, branches, chunks):
        embs = engine.embed([br[i] for i in range(3)])
        scores = embs @ target
        assert np.abs(np.asarray(rec["scores"]) - scores).max() < 5e-3
        assert rec["best"] == int(np.argmax(scores))
        ref_text = engine.transcribe([br[rec["best"]]])[0]
        assert rec["text"] == ref_text


def test_overlap_path_branches_roundtrip(engine):
    chunks = [_tone(5000)]
    target = engine.embed([_tone(8000)])[0]
    fused = engine.process_overlap(chunks, [target], return_branches=True)
    granular = engine.separate(chunks, n_src=3)[0]
    assert fused[0]["branches"].shape == granular.shape
    # int16 uplink quantization bounds the difference
    np.testing.assert_allclose(fused[0]["branches"], granular, atol=5e-3)


def test_lazy_branches_match_eager(engine):
    # lazy_branches keeps separated waveforms on device; indexing a branch
    # must pull exactly the eager value (serving/streaming read only rare
    # non-best above-threshold branches this way)
    chunks = [_tone(5000), _tone(6000, 700)]
    target = engine.embed([_tone(8000)])[0]
    eager = engine.process_overlap(chunks, [target, target], return_branches=True)
    lazy = engine.process_overlap(chunks, [target, target], return_branches=True,
                                  lazy_branches=True)
    for er, lr, chunk in zip(eager, lazy, chunks):
        assert len(lr["branches"]) == er["branches"].shape[0]
        np.testing.assert_array_equal(np.asarray(er["scores"]),
                                      np.asarray(lr["scores"]))
        assert er["text"] == lr["text"] and er["best"] == lr["best"]
        for bi in range(len(lr["branches"])):
            got = lr["branches"][bi]
            assert got.shape == (chunk.shape[-1],)
            np.testing.assert_array_equal(got, np.asarray(er["branches"][bi]))
    # batched pull across rows/branches (what serving/streaming use)
    refs, expect = [], []
    for er, lr, chunk in zip(eager, lazy, chunks):
        for bi in (0, 2):
            refs.append(lr["branches"].ref(bi))
            expect.append(np.asarray(er["branches"][bi]))
    from audio_classification_tpu.engine import StageEngine
    pulled = StageEngine.pull_branch_rows(refs)
    assert len(pulled) == len(expect)
    for got, exp in zip(pulled, expect):
        np.testing.assert_array_equal(got, exp)


def test_transcribe_branches_matches_host_path(engine):
    # the device-resident extras path (on-device gather+quantize into the
    # ASR stage program) must decode exactly what pulling the branch to
    # host and re-uploading it through transcribe() decodes
    chunks = [_tone(5000), _tone(6000, 700), _tone(4096, 500)]
    target = engine.embed([_tone(8000)])[0]
    lazy = engine.process_overlap(chunks, [target] * 3, return_branches=True,
                                  lazy_branches=True)
    refs = [rec["branches"].ref(bi) for rec in lazy for bi in (0, 1, 2)]
    from audio_classification_tpu.engine import StageEngine
    host_wavs = StageEngine.pull_branch_rows(refs)
    host_texts = engine.transcribe(host_wavs)
    dev_texts = engine.transcribe_branches(refs)
    assert dev_texts == host_texts
    assert engine.transcribe_branches([]) == []


def test_empty_inputs(engine):
    assert engine.process_clean([], []) == []
    assert engine.process_overlap([], []) == []
