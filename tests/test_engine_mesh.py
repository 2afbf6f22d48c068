"""DP-sharded StageEngine on the virtual 8-device mesh vs single-device."""
import numpy as np
import pytest

from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine, tiny_preset
from audio_classification_tpu.parallel.mesh import make_mesh


def _tone(n, hz=440.0, sr=16000):
    t = np.arange(n) / sr
    return (0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


@pytest.fixture(scope="module")
def engines():
    pack = ModelPack(tiny_preset(), seed=0)
    spec = BucketSpec(lengths=(4000, 8000, 16000), max_batch=8)
    single = StageEngine(pack, spec)
    mesh = make_mesh(8, model_axis=1)
    sharded = StageEngine(pack, spec, mesh=mesh)
    return single, sharded


def test_mesh_engine_batch_multiple(engines):
    _, sharded = engines
    assert sharded.buckets.batch_multiple == 8
    assert sharded.buckets.batch_size_for(1) == 8  # padded to data-axis size


def test_mesh_separate_matches_single(engines):
    single, sharded = engines
    chunks = [_tone(5000), _tone(7000, 880), _tone(3000, 660)]
    a = single.separate(chunks, n_src=3)
    b = sharded.separate(chunks, n_src=3)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-4)


def test_mesh_embed_and_transcribe(engines):
    single, sharded = engines
    chunks = [_tone(8000), _tone(8000, 1200)]
    ea = single.embed(chunks)
    eb = sharded.embed(chunks)
    np.testing.assert_allclose(ea, eb, atol=5e-3)
    ta = single.transcribe(chunks)
    tb = sharded.transcribe(chunks)
    assert ta == tb


def test_mesh_fused_paths_match_single(engines):
    single, sharded = engines
    chunks = [_tone(5000), _tone(7000, 880)]
    tv = single.embed([_tone(8000)])[0]
    a = single.process_clean(chunks, [tv, tv])
    b = sharded.process_clean(chunks, [tv, tv])
    for (sa, ta), (sb, tb) in zip(a, b):
        assert abs(sa - sb) < 5e-3
        assert ta == tb
    oa = single.process_overlap(chunks, [tv, tv])
    ob = sharded.process_overlap(chunks, [tv, tv])
    for ra, rb in zip(oa, ob):
        assert ra["best"] == rb["best"]
        assert ra["text"] == rb["text"]
        np.testing.assert_allclose(ra["scores"], rb["scores"], atol=5e-3)


def test_mesh_osd_segments(engines):
    single, sharded = engines
    wav = _tone(16000 * 2)
    sa = single.osd_segments(wav, 16000, 0.5, 0.5, 0.1)
    sb = sharded.osd_segments(wav, 16000, 0.5, 0.5, 0.1)
    assert sa == sb


def test_transcribe_long_sequence_parallel(engines):
    """transcribe_long shards ONE utterance's frame axis over the mesh
    (ring attention) and must decode the same text as the batched dense
    path; without a mesh it falls back to transcribe()."""
    single, sharded = engines
    wav = np.concatenate([_tone(16000, 300), _tone(16000, 550),
                          _tone(8000, 800)])
    dense = single.transcribe([wav])[0]
    assert single.transcribe_long(wav) == dense  # no-mesh fallback
    assert sharded.transcribe_long(wav) == dense
    # program is cached per bucket: a second call with a same-bucket
    # length reuses it
    wav2 = wav[: len(wav) - 2000]
    assert sharded.transcribe_long(wav2) == single.transcribe([wav2])[0]

    # facade surface: ASRRecognizer.transcribe(long_form=True)
    from audio_classification_tpu.models.facades import ASRRecognizer

    rec = ASRRecognizer(sharded)
    assert rec.transcribe(wav, 16000, long_form=True) == dense


def test_tp_engine_matches_single():
    """TP serving: a (data 4, model 2) mesh shards the separators' TCN
    hidden dim over "model" (convtasnet_param_spec, same rules as the
    trainer) — separate() and the fused overlap path must match the
    single-device engine."""
    pack = ModelPack(tiny_preset(), seed=0)
    spec = BucketSpec(lengths=(4000, 8000, 16000), max_batch=8)
    single = StageEngine(pack, spec)
    tp = StageEngine(pack, spec, mesh=make_mesh(8, model_axis=2))
    assert tp._psh is not None
    chunks = [_tone(5000), _tone(7000, 880)]
    a = single.separate(chunks, n_src=3)
    b = tp.separate(chunks, n_src=3)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-4)

    target = single.embed([_tone(8000)])[0]
    f1 = single.process_overlap(chunks, [target, target])
    f2 = tp.process_overlap(chunks, [target, target])
    for r1, r2 in zip(f1, f2):
        np.testing.assert_allclose(np.asarray(r1["scores"]),
                                   np.asarray(r2["scores"]), atol=5e-3)
        assert r1["best"] == r2["best"] and r1["text"] == r2["text"]


def test_build_engine_model_parallel_flag():
    """--data-parallel 4 --model-parallel 2 builds the (4, 2) mesh with TP
    param shardings installed."""
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    eng = build_engine(Overlap3Config(preset="tiny", seed=0, max_batch=4,
                                      data_parallel=4, model_parallel=2))
    assert dict(eng.mesh.shape) == {"data": 4, "model": 2}
    assert eng._psh is not None
    assert eng.buckets.batch_multiple == 4


def test_mesh_engine_observability(engines):
    """VERDICT round-2 item 6: with mesh= set, program_stats /
    executed_flops / compile_summary must report real numbers (the sharded
    stage programs AOT-compile exactly like single-chip ones)."""
    _, sharded = engines
    chunks = [_tone(5000), _tone(7000, 880)]
    flops0 = sharded.executed_flops()
    sharded.separate(chunks, n_src=3)
    stats = sharded.program_stats()
    assert stats, "mesh engine should record compiled programs"
    names = {s["name"] for s in stats}
    assert "sep3" in names
    sep = next(s for s in stats if s["name"] == "sep3")
    assert sep["calls"] >= 1 and sep["flops"] > 0
    assert sharded.executed_flops() > flops0
    cs = sharded.compile_summary()
    assert cs["n_programs"] == len(stats) and cs["compile_total_s"] >= 0


def test_transcribe_long_paraformer_and_bucket_grid(engines):
    """Round-2 verdict item 9: (a) paraformer joins the long-form families
    (CIF decode is frame-parallel, so the full forward runs with ring
    attention over the mesh); (b) long inputs snap to the PRE-DECLARED long
    bucket grid — no ad-hoc-bucket UserWarning."""
    import warnings

    from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine, tiny_preset

    pack = ModelPack(tiny_preset(), seed=0, asr_family="paraformer")
    spec = BucketSpec(lengths=(4000, 8000, 16000), max_batch=8)
    single = StageEngine(pack, spec)
    sharded = StageEngine(pack, spec, mesh=make_mesh(8, model_axis=1))
    wav = np.concatenate([_tone(16000, 300), _tone(12000, 550)])
    dense = single.transcribe([wav])[0]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # ad-hoc bucket warning would raise
        assert sharded.transcribe_long(wav) == dense

    # sensevoice long-form over the 16000-sample cap: the long grid kicks
    # in (48000 -> 64000 bucket), still warning-free; text matches the
    # segment path's (mask-aware decode, same weights)
    sv_single, sv_sharded = engines
    long_wav = np.concatenate([_tone(16000 * 2, 420), _tone(16000, 650)])
    dense_long = sv_single.transcribe([long_wav])[0]  # warns (ad-hoc bucket)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert sv_sharded.transcribe_long(long_wav) == dense_long


def test_transcribe_long_single_chip_full_context(engines):
    """Without a mesh, transcribe_long runs the SAME full-context long-form
    program on one chip (dense MHSA on CPU; the Pallas flash path at T≥512
    on TPU — tests/test_flash_attention.py proves their parity) and snaps
    to the long bucket grid, so a single-device engine gets warning-free
    long-form instead of the segment fallback."""
    import warnings

    sv_single, _ = engines
    long_wav = np.concatenate([_tone(16000 * 2, 420), _tone(16000, 650)])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # segment path's ad-hoc bucket
        segment_text = sv_single.transcribe([long_wav])[0]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # long path must stay warning-free
        assert sv_single.transcribe_long(long_wav) == segment_text


def test_transcribe_long_scan_decoders_single_chip():
    """transducer/whisper can't ride the mesh (frame/token-sequential scan
    decode) but DO get the single-chip full-context long path: only their
    encoders need to scale, which the flash-attention route covers. With a
    mesh they still fall back to segment mode."""
    import warnings

    from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine, tiny_preset

    spec = BucketSpec(lengths=(4000, 8000, 16000), max_batch=8)
    wav = np.concatenate([_tone(16000, 350), _tone(12000, 520)])
    for family in ("transducer", "whisper"):
        pack = ModelPack(tiny_preset(), seed=0, asr_family=family)
        single = StageEngine(pack, spec)
        segment_text = single.transcribe([wav])[0]
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # long grid: no ad-hoc buckets
            assert single.transcribe_long(wav) == segment_text, family

        sharded = StageEngine(pack, spec, mesh=make_mesh(8, model_axis=1))
        assert sharded.transcribe_long(wav) == sharded.transcribe([wav])[0]


def test_long_bucket_for_no_warning():
    import warnings

    from audio_classification_tpu.engine.bucketing import BucketSpec

    spec = BucketSpec(lengths=(4000, 8000))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert spec.long_bucket_for(5000) == 8000
        assert spec.long_bucket_for(9000) == 16000
        assert spec.long_bucket_for(70000) == 128000
    with pytest.warns(UserWarning):
        spec.bucket_for(9000)  # segment path still warns


def test_mesh_arena_gather(engines):
    """The device-resident arena path works UNDER A MESH: one replicated
    uplink per wave, start/length rows sharded over "data", every gathered
    batch bit-identical to the per-batch uplink path (so the flagship
    pipeline keeps the single-uplink design with --data-parallel set)."""
    single, sharded = engines
    wavs = [_tone(5000), _tone(7000, 880), _tone(3000, 660)]
    arena = sharded.upload_arena(wavs)
    assert arena is not None, "mesh engine must serve the arena path"

    # OSD via the arena vs the per-batch path, and vs the single engine
    h = sharded.launch_osd_arena(arena)
    segs_arena = sharded.collect_osd_batch(h, 0.5, 0.5, 0.1)
    segs_batch = sharded.osd_segments_batch(wavs, 16000, 0.5, 0.5, 0.1)
    segs_single = single.osd_segments_batch(wavs, 16000, 0.5, 0.5, 0.1)
    assert segs_arena == segs_batch == segs_single

    # fused clean path through arena spans vs host chunks
    tv = single.embed([_tone(8000)])[0]
    spans = [(int(arena.offsets[i]), len(w)) for i, w in enumerate(wavs)]
    out_arena = sharded.collect_clean(
        sharded.launch_clean(wavs, [tv] * 3, arena=arena, spans=spans))
    out_batch = sharded.collect_clean(sharded.launch_clean(wavs, [tv] * 3))
    for (sa, ta), (sb, tb) in zip(out_arena, out_batch):
        assert abs(sa - sb) < 1e-6 and ta == tb


def test_mesh_mulaw_arena_serves_fused_paths():
    """mulaw arena + mesh: the uint8 arena replicates across the mesh and
    the fused arena-stage programs (uint8-keyed AOT variants) serve OSD
    and the clean path end to end."""
    import jax.numpy as jnp

    pack = ModelPack(tiny_preset(), seed=0)
    mesh = make_mesh(8, model_axis=2)
    eng = StageEngine(pack, BucketSpec(lengths=(4000, 8000, 16000),
                                       max_batch=8),
                      mesh=mesh, arena_codec="mulaw")
    rng = np.random.default_rng(5)
    wavs = [0.3 * rng.standard_normal(n).astype(np.float32)
            for n in (16000, 9000, 12000, 8000)]
    arena = eng.upload_arena(wavs)
    assert arena is not None and arena.dev.dtype == jnp.uint8
    segs = eng.collect_osd_batch(eng.launch_osd_arena(arena), 0.5, 0.5, 0.1)
    assert all(sl and abs(sl[-1][1] - len(w) / 16000.0) < 1e-6
               for w, sl in zip(wavs, segs))
    vec = eng.embed([wavs[0]])[0]
    spans = [(int(arena.offsets[0]), 16000), (int(arena.offsets[1]), 9000)]
    out = eng.collect_clean(eng.launch_clean(None, [vec, vec],
                                             arena=arena, spans=spans))
    assert len(out) == 2 and all(isinstance(s, float) for s, _ in out)
