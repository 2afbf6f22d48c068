"""Engine tests: bucketing math + batched stage dispatch on tiny models."""
import numpy as np
import pytest

from audio_classification_tpu.engine import (
    BucketSpec,
    ModelPack,
    StageEngine,
    group_by_bucket,
    pad_batch,
    tiny_preset,
)


def test_bucket_spec():
    spec = BucketSpec(lengths=(8000, 16000, 32000), max_batch=8)
    assert spec.bucket_for(100) == 8000
    assert spec.bucket_for(8000) == 8000
    assert spec.bucket_for(8001) == 16000
    assert spec.batch_size_for(1) == 1
    assert spec.batch_size_for(3) == 4
    assert spec.batch_size_for(100) == 8


def test_bucket_extends_past_cap_instead_of_truncating():
    # Items longer than the configured cap get an ad-hoc doubled bucket (with
    # a warning) so no audio is ever silently truncated (ADVICE round 1).
    spec = BucketSpec(lengths=(8000, 16000, 32000), max_batch=8)
    with pytest.warns(UserWarning, match="exceeds the largest configured bucket"):
        assert spec.bucket_for(99999) == 128000
    with pytest.warns(UserWarning):
        assert spec.bucket_for(32001) == 64000


def test_pad_batch():
    wav, lengths = pad_batch([np.ones(5, np.float32), np.ones(3, np.float32)], 8, 4)
    assert wav.shape == (4, 8)
    assert list(lengths) == [5, 3, 0, 0]
    assert wav[0, :5].sum() == 5 and wav[0, 5:].sum() == 0


def test_pad_batch_rejects_overflow():
    with pytest.raises(ValueError, match="bucket"):
        pad_batch([np.ones(9, np.float32)], 8, 1)


def test_pad_batch_i16_bit_exact_with_pad_then_quantize():
    # the direct int16 uplink path must equal pad_batch -> the engine's
    # int16 quantization exactly, including clipping, rint ties-to-even
    # and untouched padding rows/tails
    from audio_classification_tpu.engine.bucketing import pad_batch_i16

    rng = np.random.default_rng(0)
    items = [
        (rng.standard_normal(n).astype(np.float32) * s)
        for n, s in ((5, 0.3), (8, 1.7), (1, 0.0), (7, 0.99))
    ]
    # exact rint ties (0.5/32768 scales to 16384.5) + out-of-range values
    items[0][:4] = np.array([0.5 / 32768.0, 1.5 / 32768.0, 2.0, -2.0],
                            np.float32)
    ref_wav, ref_len = pad_batch(items, 8, 8)
    ref_q = np.clip(np.rint(ref_wav * 32768.0), -32768, 32767).astype(np.int16)
    got, lengths = pad_batch_i16(items, 8, 8)
    assert got.dtype == np.int16
    np.testing.assert_array_equal(got, ref_q)
    np.testing.assert_array_equal(lengths, ref_len)


def test_pad_batch_i16_rejects_overflow():
    from audio_classification_tpu.engine.bucketing import pad_batch_i16

    with pytest.raises(ValueError, match="bucket"):
        pad_batch_i16([np.ones(9, np.float32)], 8, 1)


def test_overlong_item_processed_at_full_length():
    # End-to-end: an item longer than every configured bucket still comes
    # back at its native length from a stage call (separate slices to the
    # true chunk length, which only works if nothing truncated).
    pack = ModelPack(tiny_preset(), seed=0)
    eng = StageEngine(pack, BucketSpec(lengths=(4000, 8000), max_batch=2))
    chunk = _tone(9000)
    with pytest.warns(UserWarning):
        out = eng.separate([chunk], n_src=3)
    assert out[0].shape == (3, 9000)


def test_group_by_bucket():
    spec = BucketSpec(lengths=(10, 20), max_batch=8)
    items = [np.ones(5), np.ones(15), np.ones(9), np.ones(20)]
    groups = dict(group_by_bucket(items, spec))
    assert groups[10] == [0, 2]
    assert groups[20] == [1, 3]


@pytest.fixture(scope="module")
def engine():
    pack = ModelPack(tiny_preset(), seed=0)
    return StageEngine(pack, BucketSpec(lengths=(4000, 8000, 16000, 32000, 64000), max_batch=4))


def _tone(n, hz=440.0, sr=16000, amp=0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_engine_resample(engine):
    y = engine.resample(_tone(4000, sr=8000), 8000, 16000)
    assert y.shape[0] == 8000


def test_engine_osd_segments_full_coverage(engine):
    wav = _tone(16000 * 2)
    segs = engine.osd_segments(wav, 16000, threshold=0.5, win_sec=0.5, hop_sec=0.1)
    assert segs, "must return full-coverage segments"
    assert segs[0][0] == 0.0
    assert abs(segs[-1][1] - 2.0) < 1e-6
    for a, b in zip(segs, segs[1:]):
        assert b[0] <= a[1] + 1e-9


def test_engine_separate_batches(engine):
    chunks = [_tone(5000), _tone(7000, hz=880), _tone(12000, hz=660)]
    outs = engine.separate(chunks, n_src=3)
    assert len(outs) == 3
    for o, c in zip(outs, chunks):
        assert o.shape == (3, c.shape[0])
        assert np.isfinite(o).all()


def test_engine_separate_matches_single(engine):
    # batching/bucketing must not change per-item results
    chunks = [_tone(5000), _tone(6500, hz=880)]
    batch = engine.separate(chunks, n_src=3)
    solo0 = engine.separate([chunks[0]], n_src=3)[0]
    np.testing.assert_allclose(batch[0], solo0, atol=1e-4)


def test_engine_embed(engine):
    embs = engine.embed([_tone(8000), _tone(8000, hz=1200)])
    assert embs.shape[0] == 2
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-4)
    # same audio -> same embedding regardless of batch composition
    # (XLA picks different matmul reduction strategies per batch shape, so
    # allow small numeric drift; irrelevant at sv_threshold granularity)
    solo = engine.embed([_tone(8000)])
    np.testing.assert_allclose(embs[0], solo[0], atol=5e-3)
    assert engine.embed([]).shape == (0, 32)


def test_engine_transcribe_shapes(engine):
    texts = engine.transcribe([_tone(8000), _tone(4000)])
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)
    assert engine.transcribe([]) == []


def test_engine_vad_probs(engine):
    p = engine.vad_probs(_tone(8000))
    assert p.ndim == 1
    assert ((p >= 0) & (p <= 1)).all()


# ---------------------------------------------------------------- arena path

def test_flat_pack_i16_bit_exact_and_layout():
    from audio_classification_tpu.engine.bucketing import flat_pack_i16, pad_batch_i16

    rng = np.random.default_rng(3)
    items = [rng.standard_normal(n).astype(np.float32) * s
             for n, s in ((7, 0.4), (0, 1.0), (12, 1.8), (5, 0.9))]
    buf, off, ln = flat_pack_i16(items, tail=10, grid=16)
    assert buf.dtype == np.int16
    assert buf.shape[0] % 16 == 0 and buf.shape[0] >= sum(len(x) for x in items) + 10
    assert list(ln) == [7, 0, 12, 5]
    assert list(off) == [0, 7, 7, 19]
    for x, o, n in zip(items, off, ln):
        ref = np.clip(np.rint(np.asarray(x, np.float32) * 32768.0), -32768, 32767)
        np.testing.assert_array_equal(buf[o:o + n], ref.astype(np.int16))
    assert buf[24:].sum() == 0  # tail + grid padding stays zero


def test_gather_program_matches_host_pad(engine):
    # the device gather from a packed arena must be bit-identical to the
    # host pad_batch_i16 path, including the zeroed window tails and a
    # window whose bucket over-runs its item into the arena tail
    import jax.numpy as jnp

    from audio_classification_tpu.engine.bucketing import pad_batch_i16

    eng = engine
    rng = np.random.default_rng(11)
    wavs = [rng.standard_normal(n).astype(np.float32) for n in (9000, 4000)]
    arena = eng.upload_arena(wavs)
    assert arena is not None
    # windows: mid-item, whole-item, end-of-last-item (bucket overrun into
    # tail), empty
    spans = [(1000, 2500), (int(arena.offsets[1]), 4000),
             (int(arena.offsets[1]) + 3500, 500), (0, 0)]
    host_slices = [
        np.concatenate(wavs)[s:s + n] for s, n in spans
    ]
    for (s, n), hs in zip(spans, host_slices):
        bucket = eng.buckets.bucket_for(max(n, 1))
        got = np.asarray(eng._gather(
            arena.dev, jnp.asarray(np.array([s], np.int32)),
            jnp.asarray(np.array([n], np.int32)), seg_len=bucket))
        ref, _ = pad_batch_i16([hs], bucket, 1)
        np.testing.assert_array_equal(got, ref)


def test_osd_arena_matches_osd_batch(engine):
    eng = engine
    rng = np.random.default_rng(5)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.3
            for n in (16000, 9000, 31999)]
    a = eng.osd_segments_batch(wavs, 16000, 0.5, 0.5, 0.1)
    arena = eng.upload_arena(wavs)
    b = eng.collect_osd_batch(eng.launch_osd_arena(arena), 0.5, 0.5, 0.1)
    assert a == b


def test_chunked_arena_matches_single_shot(engine, monkeypatch):
    """A part-chunked uplink (upload_arena splitting the wave into
    sub-arenas stitched by a device concat) must be invisible: same OSD
    segments, and every combined-arena gather bit-identical to the
    single-shot arena's."""
    import jax.numpy as jnp

    eng = engine
    rng = np.random.default_rng(7)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.3
            for n in (16000, 9000, 31999, 7000, 12000, 5000)]
    single = eng.upload_arena(wavs)
    assert single.parts is None
    # ~one item per part: force the chunked path regardless of size
    monkeypatch.setenv("ACT_ARENA_PART_MB", "0.01")
    chunked = eng.upload_arena(wavs)
    assert chunked.parts and len(chunked.parts) >= 2
    np.testing.assert_array_equal(chunked.lengths, single.lengths)
    # per-item gathers from the combined arena == single-shot arena
    for i, w in enumerate(wavs):
        n = int(chunked.lengths[i])
        bucket = eng.buckets.bucket_for(n)
        got = np.asarray(eng._gather(
            chunked.dev, jnp.asarray(np.array([int(chunked.offsets[i])], np.int32)),
            jnp.asarray(np.array([n], np.int32)), seg_len=bucket))
        ref = np.asarray(eng._gather(
            single.dev, jnp.asarray(np.array([int(single.offsets[i])], np.int32)),
            jnp.asarray(np.array([n], np.int32)), seg_len=bucket))
        np.testing.assert_array_equal(got, ref)
    # part-aware OSD launch == batch OSD over the raw wavs
    a = eng.osd_segments_batch(wavs, 16000, 0.5, 0.5, 0.1)
    b = eng.collect_osd_batch(eng.launch_osd_arena(chunked), 0.5, 0.5, 0.1)
    assert a == b


def test_upload_arena_rejects_overlong_items(engine):
    # items past the bucket cap must fall back to the per-batch uplink
    # (their ad-hoc buckets could out-range the arena tail)
    cap = engine.buckets.lengths[-1]
    assert engine.upload_arena([np.zeros(cap + 1, np.float32)]) is None


def test_upload_arena_tail_sized_to_items(engine):
    # short waves must not drag the fattest declared bucket (64 s) of
    # zeros through the uplink: the tail is bucket_for(longest item)
    wavs = [np.zeros(n, np.float32) for n in (9000, 4000)]
    arena = engine.upload_arena(wavs)
    assert arena.tail == engine.buckets.bucket_for(9000) == 16000
    total = sum(w.shape[-1] for w in wavs) + arena.tail
    grid = 1 << 14
    assert arena.dev.shape[-1] == -(-total // grid) * grid
    assert engine.upload_arena([]) is None


def test_mulaw_codec_roundtrip():
    """mu-law encode/decode SNR and exact-zero fill semantics."""
    from audio_classification_tpu.engine.bucketing import (
        MULAW_ZERO, mulaw_decode_lut, mulaw_encode)

    rng = np.random.default_rng(3)
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
         + 0.01 * rng.standard_normal(16000)).astype(np.float32)
    lut = mulaw_decode_lut()
    y = lut[mulaw_encode(x)]
    err = x - y
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean(err ** 2))
    assert snr > 33.0, f"mu-law SNR {snr:.1f} dB"
    assert mulaw_encode(np.zeros(4, np.float32))[0] == MULAW_ZERO
    assert lut[MULAW_ZERO] == 0.0


def test_mulaw_arena_matches_decoded_audio():
    """A mulaw engine's arena gather must reproduce the mu-law-decoded
    waveform exactly (the codec is the ONLY difference vs the i16 path),
    and OSD segments through the mulaw arena must match OSD on the
    decoded-audio host path bit-for-bit."""
    import jax.numpy as jnp

    from audio_classification_tpu.engine.bucketing import (
        mulaw_decode_lut, mulaw_encode)

    pack = ModelPack(tiny_preset(), seed=0)
    eng = StageEngine(pack, BucketSpec(lengths=(4000, 8000, 16000, 32000),
                                       max_batch=4), arena_codec="mulaw")
    rng = np.random.default_rng(11)
    wavs = [0.3 * rng.standard_normal(n).astype(np.float32)
            for n in (16000, 9000)]
    arena = eng.upload_arena(wavs)
    assert arena is not None and arena.dev.dtype == jnp.uint8
    lut = mulaw_decode_lut()
    decoded = [lut[mulaw_encode(w)] for w in wavs]
    # gather windows decode to exactly the mu-law-decoded samples
    for i, w in enumerate(wavs):
        n = int(arena.lengths[i])
        bucket = eng.buckets.bucket_for(n)
        got = np.asarray(eng._gather(
            arena.dev, jnp.asarray(np.array([int(arena.offsets[i])], np.int32)),
            jnp.asarray(np.array([n], np.int32)), seg_len=bucket))[0]
        ref = lut[mulaw_encode(w)]
        np.testing.assert_array_equal(got[:n], mulaw_encode(w))
        assert np.all(got[n:] == 128)  # fill decodes to exact silence
    # the mulaw arena serves the OSD stage end to end (full-coverage
    # segment lists; exact-prob parity vs the host path is NOT asserted —
    # the host path re-quantizes through int16 while the arena decodes
    # mu-law directly, so values differ at the quantization-grid level)
    segs = eng.collect_osd_batch(eng.launch_osd_arena(arena), 0.5, 0.5, 0.1)
    for w, sl in zip(wavs, segs):
        assert sl and abs(sl[-1][1] - len(w) / 16000.0) < 1e-6
