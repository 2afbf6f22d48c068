"""End-to-end flagship pipeline tests on synthetic fixtures (tiny preset)."""
import json
from pathlib import Path

import numpy as np
import pytest

from audio_classification_tpu.audio_io import write_wav
from audio_classification_tpu.utils.config import Overlap3Config
from audio_classification_tpu.pipelines.offline_overlap3 import Overlap3Pipeline


SR = 16000


def _tone(dur, hz, amp=0.3, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("overlap3_fixtures")
    # 3 "speakers" at distinct frequencies; mixture has overlap in the middle
    a = _tone(3.0, 440)
    b = np.concatenate([np.zeros(SR, np.float32), _tone(2.0, 880)])
    mix = a + b[: a.shape[0]]
    write_wav(d / "mix.wav", mix, SR)
    write_wav(d / "target.wav", _tone(2.0, 440), SR)
    write_wav(d / "ref1.wav", a, SR)
    write_wav(d / "ref2.wav", b[: a.shape[0]], SR)
    return d


def _base_cfg(fixture_dir, **kw) -> Overlap3Config:
    defaults = dict(
        input_wavs=[str(fixture_dir / "mix.wav")],
        target_wav=str(fixture_dir / "target.wav"),
        preset="tiny",
        seed=0,
        sv_threshold=-1.0,  # random-weight embeddings: pass everything through
        max_batch=4,
        max_segment_sec=8.0,
        enable_metrics=False,
    )
    defaults.update(kw)
    return Overlap3Config(**defaults)


@pytest.fixture(scope="module")
def file_mode_result(fixture_dir):
    cfg = _base_cfg(fixture_dir)
    return Overlap3Pipeline(cfg).run(), cfg


def test_file_mode_runs(file_mode_result):
    result, _ = file_mode_result
    assert result.dataset_name == "manual-files"
    assert result.processed_mixtures == 1
    m = result.metrics
    assert m["total_audio_sec"] == pytest.approx(3.0, abs=0.01)
    # full coverage: seen segments exist, all matched at threshold -1
    seen = m["segments_seen_clean"] + m["segments_seen_overlap"]
    assert seen >= 1
    assert m["segments_matched"] == seen
    assert m["target_hit_rate_segments"] == 1.0
    assert m["time_compute_total_sec"] > 0
    assert m["rtf_total"] is not None


def test_record_schema(file_mode_result):
    result, _ = file_mode_result
    assert result.segments, "pipeline must emit records"
    required = {"wav", "start", "end", "kind", "stream", "text", "asr_time",
                "sv_score", "target_src", "target_src_text"}
    for rec in result.segments:
        assert required == set(rec.keys())
        assert rec["kind"] in ("clean", "overlap")
        if rec["kind"] == "overlap":
            assert isinstance(rec["stream"], int)
        else:
            assert rec["stream"] is None
        assert rec["end"] > rec["start"]


def test_metric_fields_match_reference(file_mode_result):
    result, _ = file_mode_result
    expected = {
        "total_audio_sec", "audio_overlap_sec", "audio_clean_sec",
        "audio_matched_sec", "audio_seen_clean_sec", "audio_seen_overlap_sec",
        "audio_missed_sec", "segments_total", "segments_clean",
        "segments_overlap_streams", "separated_streams", "segments_matched",
        "segments_seen_clean", "segments_seen_overlap", "segments_missed",
        "segments_missed_clean", "segments_missed_overlap",
        "target_hit_rate_segments", "time_osd_sec", "time_sep_sec",
        "time_asr_sec", "time_compute_total_sec", "rtf_total", "rtf_asr",
    }
    assert expected.issubset(result.metrics.keys())


def test_file_mode_non16k_inputs(fixture_dir, tmp_path):
    """8 kHz input wavs resample at load (one bucketed batch per source
    rate, not one device dispatch per file) and the pipeline runs on the
    16 kHz result — durations and coverage must survive the rate change."""
    mix8 = (_tone(3.0, 440, sr=8000)
            + np.concatenate([np.zeros(8000, np.float32),
                              _tone(2.0, 880, sr=8000)]))
    p8 = tmp_path / "mix8k.wav"
    write_wav(p8, mix8, 8000)
    cfg = _base_cfg(fixture_dir, input_wavs=[str(p8)])
    result = Overlap3Pipeline(cfg).run()
    assert result.processed_mixtures == 1
    m = result.metrics
    assert m["total_audio_sec"] == pytest.approx(3.0, abs=0.01)
    assert m["segments_matched"] == (m["segments_seen_clean"]
                                     + m["segments_seen_overlap"])
    assert result.segments


def test_sv_gate_blocks_everything(fixture_dir):
    # impossible threshold: every segment missed, no records
    cfg = _base_cfg(fixture_dir, sv_threshold=2.0)
    result = Overlap3Pipeline(cfg).run()
    m = result.metrics
    assert m["segments_matched"] == 0
    assert m["segments_missed"] == m["segments_seen_clean"] + m["segments_seen_overlap"]
    assert result.segments == []


def test_eval_separation_with_ref_wavs(fixture_dir):
    cfg = _base_cfg(
        fixture_dir,
        ref_wavs=[str(fixture_dir / "ref1.wav"), str(fixture_dir / "ref2.wav")],
        eval_separation=True,
        save_sep_details=True,
        osd_thr=0.0,  # force everything to be overlap so separation runs
        min_overlap_dur=0.1,
    )
    result = Overlap3Pipeline(cfg).run()
    m = result.metrics
    assert "sep_sisdr_mean" in m and "sep_sisdri_mean" in m
    if m["sep_eval_segments"]:
        assert len(result.sep_details_rows) == m["sep_eval_segments"]
        row = result.sep_details_rows[0]
        assert len(row) == 7  # wav,start,end,k_refs,sisdr,sisdri,indices


def test_missing_target_raises(fixture_dir):
    cfg = _base_cfg(fixture_dir, target_wav="")
    with pytest.raises(ValueError):
        Overlap3Pipeline(cfg).run()


def test_cli_writes_artifacts(fixture_dir, tmp_path):
    from audio_classification_tpu.cli.offline_overlap_3src import main

    out = tmp_path / "out"
    main([
        "--input-wavs", str(fixture_dir / "mix.wav"),
        "--target-wav", str(fixture_dir / "target.wav"),
        "--preset", "tiny", "--seed", "0",
        "--sv-threshold", "-1",
        "--max-segment-sec", "8",
        "--out-dir", str(out),
        "--enable-metrics",
    ])
    run_dirs = list(out.iterdir())
    assert len(run_dirs) == 1
    d = run_dirs[0]
    assert (d / "segments.jsonl").is_file()
    assert (d / "segments.csv").is_file()
    assert (d / "metrics.json").is_file()
    summary = json.loads((d / "summary.json").read_text())
    for key in ("segments", "dataset", "subset", "num_speakers", "sample_rate",
                "processed_mixtures", "notes", "target_hits_segments",
                "target_misses_segments", "metrics"):
        assert key in summary
    csv_head = (d / "segments.csv").read_text().splitlines()[0]
    assert csv_head == "wav,start,end,kind,stream,text,asr_time,sv_score,target_src,target_src_text"


def test_granular_paths_match_fused(fixture_dir, file_mode_result):
    """--no-fused-paths: granular stage programs produce the same records
    and gate decisions as the fused paths (same weights, same math), while
    time_sep/time_asr become reference-comparable per-stage walls."""
    fused_result, _ = file_mode_result
    cfg = _base_cfg(fixture_dir, fused_paths=False)
    res = Overlap3Pipeline(cfg).run()
    assert len(res.segments) == len(fused_result.segments)
    for a, b in zip(res.segments, fused_result.segments):
        assert a["kind"] == b["kind"]
        assert a["text"] == b["text"]
        assert a["stream"] == b["stream"]
        if a["sv_score"] is not None:
            assert abs(a["sv_score"] - b["sv_score"]) < 5e-3
    m = res.metrics
    assert m["segments_total"] == fused_result.metrics["segments_total"]
    # granular wall: ASR was actually timed (whether the random-weight OSD
    # flags any overlap on this fixture is borderline — the sep wall is
    # asserted in test_granular_books_time_sep with a forced threshold)
    assert m["time_asr_sec"] > 0
    assert m["rtf_total"] > 0


@pytest.mark.slow
def test_int8_quant_pipeline_runs(fixture_dir):
    """--quant int8: the separators run on the s8 MXU path end to end;
    records keep the schema and the all-overlap threshold forces the
    quantized separation program to actually execute."""
    cfg = _base_cfg(fixture_dir, quant="int8", osd_thr=0.0)
    res = Overlap3Pipeline(cfg).run()
    assert res.segments and all(r["kind"] == "overlap" for r in res.segments)
    assert all(np.isfinite(rec["sv_score"]) for rec in res.segments
               if rec["sv_score"] is not None)
    assert res.metrics["rtf_total"] > 0


def test_granular_books_time_sep(fixture_dir):
    """With osd_thr=0 every segment is overlap regardless of the random
    OSD weights, so the granular separation path must run and book a
    reference-comparable time_sep wall (overlap3_core.py:689-691)."""
    cfg = _base_cfg(fixture_dir, fused_paths=False, osd_thr=0.0)
    res = Overlap3Pipeline(cfg).run()
    assert res.segments and all(r["kind"] == "overlap" for r in res.segments)
    m = res.metrics
    assert m["time_sep_sec"] > 0 and m["time_asr_sec"] > 0
    # overlap records carry per-branch SV scores + a chosen stream
    assert all(isinstance(r["stream"], int) for r in res.segments)


@pytest.mark.slow
def test_mesh_pipeline_record_parity(fixture_dir, tmp_path):
    """The flagship pipeline runs END TO END on the virtual 8-device mesh
    (--data-parallel 4 --model-parallel 2): fused paths, device arena,
    target-span ASR and the separation eval all execute over the sharded
    engine, and records / sep-detail rows / non-timing metrics match the
    single-device run (reference semantics: overlap3_core.py:492-840).

    osd_thr=0 flags every frame as overlap; min_overlap_dur sits between
    the two input durations so the 3.0 s mixture takes the overlap path
    and the 1.5 s one the clean path — BOTH fused programs run sharded
    in one pipeline pass."""
    short = _tone(1.5, 550)
    write_wav(tmp_path / "short.wav", short, SR)
    refs_csv = tmp_path / "refs.csv"
    refs_csv.write_text(
        "mix,ref1,ref2\n"
        f"{fixture_dir / 'mix.wav'},{fixture_dir / 'ref1.wav'},"
        f"{fixture_dir / 'ref2.wav'}\n")
    kw = dict(
        input_wavs=[str(fixture_dir / "mix.wav"), str(tmp_path / "short.wav")],
        osd_thr=0.0,
        min_overlap_dur=2.0,
        eval_separation=True,
        refs_csv=str(refs_csv),
    )
    base = Overlap3Pipeline(_base_cfg(fixture_dir, **kw)).run()
    mesh = Overlap3Pipeline(
        _base_cfg(fixture_dir, data_parallel=4, model_parallel=2, **kw)).run()

    kinds = {r["kind"] for r in base.segments}
    assert kinds == {"clean", "overlap"}, kinds
    assert len(mesh.segments) == len(base.segments) >= 2
    for a, b in zip(mesh.segments, base.segments):
        for k in ("wav", "start", "end", "kind", "stream", "target_src",
                  "target_src_text", "text"):
            assert a[k] == b[k], k
        if b["sv_score"] is not None:
            assert abs(a["sv_score"] - b["sv_score"]) < 5e-3

    # PIT separation eval ran over mesh-separated branches
    assert len(mesh.sep_details_rows) == len(base.sep_details_rows) >= 1
    for ra, rb in zip(mesh.sep_details_rows, base.sep_details_rows):
        assert ra[0] == rb[0] and ra[3] == rb[3]          # wav, k_refs
        assert abs(float(ra[4]) - float(rb[4])) < 0.1     # si_sdr (dB)
        assert abs(float(ra[5]) - float(rb[5])) < 0.1     # si_sdri (dB)

    timing = {k for k in base.metrics if k.startswith(("time_", "rtf_"))}
    for k in set(base.metrics) - timing:
        va, vb = mesh.metrics[k], base.metrics[k]
        if isinstance(vb, float) and k.startswith("sep_"):
            assert va == pytest.approx(vb, abs=0.1), k
        else:
            assert va == vb, k


def test_device_gather_matches_host_uplink(fixture_dir, file_mode_result):
    """--no-device-gather: the per-batch host uplink path must match the
    arena path EXACTLY — the on-device gather feeds the same stage
    programs bit-identical int16 batches (slice-then-quantize ==
    quantize-then-slice), so records agree to the bit, not a tolerance."""
    arena_result, _ = file_mode_result  # default: device_gather=True
    cfg = _base_cfg(fixture_dir, device_gather=False)
    res = Overlap3Pipeline(cfg).run()
    assert len(res.segments) == len(arena_result.segments)
    for a, b in zip(res.segments, arena_result.segments):
        assert a["kind"] == b["kind"]
        assert a["text"] == b["text"]
        assert a["stream"] == b["stream"]
        assert a["sv_score"] == b["sv_score"]
        assert a["target_src_text"] == b["target_src_text"]
    assert res.metrics["segments_total"] == arena_result.metrics["segments_total"]
