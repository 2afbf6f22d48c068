"""overlap MVP + evaluate_with_sources + speaker_id_vad CLIs over a
synthetic LibriMix tree (tiny preset)."""
import json

import numpy as np
import pytest

from audio_classification_tpu.audio_io import write_wav
from audio_classification_tpu.data.librimix import Libri2Mix8kDataset, LibriMixDataset

SR8 = 8000


def _tone(dur, hz, amp=0.3, sr=SR8):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


@pytest.fixture(scope="module")
def librimix_root(tmp_path_factory):
    """Two-mixture Libri2Mix 8k 'test' subset with real overlap structure."""
    root = tmp_path_factory.mktemp("librimix")
    base = root / "Libri2Mix" / "wav8k" / "min" / "test"
    for sub in ("mix_clean", "s1", "s2"):
        (base / sub).mkdir(parents=True)
    for i in range(2):
        s1 = _tone(3.0, 300 + 50 * i)
        s2 = np.concatenate([np.zeros(SR8, np.float32), _tone(2.0, 700 + 60 * i)])
        mix = s1 + s2
        name = f"mix_{i}.wav"
        write_wav(base / "s1" / name, s1, SR8)
        write_wav(base / "s2" / name, s2, SR8)
        write_wav(base / "mix_clean" / name, mix, SR8)
    return str(root)


def test_librimix_walker(librimix_root):
    ds = LibriMixDataset(librimix_root, subset="test", num_speakers=2, sample_rate=8000)
    assert len(ds) == 2
    sr, mix, sources = ds[0]
    assert sr == SR8
    assert sources is not None and len(sources) == 2
    np.testing.assert_allclose(mix, sources[0] + sources[1], atol=2e-4)
    sr_m, rel, srcs = ds.get_metadata(0)
    assert rel.startswith("Libri2Mix/")
    assert len(srcs) == 2


def test_librimix_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        LibriMixDataset(str(tmp_path), subset="test", num_speakers=2, sample_rate=8000)


def test_libri2mix8k_shim(librimix_root):
    ds = Libri2Mix8kDataset.load_test(librimix_root)
    assert len(ds) == 2
    rec = ds[0]
    assert set(rec) >= {"id", "mix_wav:FILE", "s1_wav:FILE", "s2_wav:FILE", "length"}


def test_overlap_mvp_cli(librimix_root, tmp_path):
    from audio_classification_tpu.cli.offline_overlap_mvp import main

    out = tmp_path / "mvp"
    main([
        "--librimix-root", librimix_root,
        "--preset", "tiny",
        "--max-files", "2",
        "--out-dir", str(out),
        "--enable-metrics",
        "--max-segment-sec", "8",
        "--osd-thr", "0.0",       # force overlap so separation path runs
        "--min-overlap-dur", "0.1",
    ])
    d = list(out.iterdir())[0]
    assert (d / "segments.jsonl").is_file()
    metrics = json.loads((d / "metrics.json").read_text())
    for key in ("total_audio_sec", "segments_total", "share_osd", "share_sep",
                "share_asr", "rtf_total", "rtf_asr", "time_wall_sec"):
        assert key in metrics
    assert metrics["separated_streams"] > 0
    head = (d / "segments.csv").read_text().splitlines()[0]
    assert head == "wav,start,end,kind,stream,text,asr_time"
    summary = json.loads((d / "summary.json").read_text())
    assert summary["dataset"] == "Libri2Mix_8k"
    assert summary["processed_mixtures"] == 2


def test_evaluate_with_sources_cli(librimix_root, tmp_path):
    from audio_classification_tpu.cli.evaluate_with_sources import main

    out = tmp_path / "eval"
    main([
        "--librimix-root", librimix_root,
        "--preset", "tiny",
        "--max-files", "2",
        "--out-dir", str(out),
        "--save-details",
        "--enable-asr",
        "--sep-nsrc", "2",
        "--osd-thr", "0.0",
        "--min-overlap-dur", "0.1",
        "--max-segment-sec", "8",
    ])
    d = list(out.iterdir())[0]
    ev = json.loads((d / "evaluation.json").read_text())
    assert ev["sep_nsrc"] == 2
    # FULL ordered key schema (field-for-field, reference:
    # evaluate_with_sources.py:961-1036) — json.load preserves writer
    # insertion order, so a renamed/reordered/dropped field fails here,
    # not just a missing section
    assert list(ev.keys()) == [
        "dataset", "files_limit", "elapsed_sec", "hop_sec", "win_sec",
        "sep_nsrc", "activity_thr", "min_overlap_dur",
        "gt_overlap_total_sec", "pred_overlap_total_sec", "audio_total_sec",
        "timing", "osd", "separation", "notes", "cpu", "asr"]
    assert list(ev["timing"].keys()) == [
        "time_wall_sec", "time_osd_sec", "time_sep_sec", "time_asr_sec",
        "overlap_predicted_sec_for_sep", "rtf_total", "rtf_osd",
        "rtf_sep_total", "rtf_sep_overlap", "rtf_asr"]
    assert list(ev["osd"].keys()) == [
        "precision", "recall", "f1", "iou", "tp_frames", "fp_frames",
        "fn_frames"]
    assert list(ev["separation"].keys()) == ["si_sdr", "si_sdri"]
    assert list(ev["separation"]["si_sdr"].keys()) == [
        "count", "mean", "median", "p25", "p75", "min", "max"]
    assert ev["separation"]["si_sdr"]["count"] >= 1
    assert ev["asr"]["overlap_separated"]["count"] >= 0
    details = (d / "overlap_details.csv").read_text().splitlines()
    assert details[0] == ("wav,seg_start,seg_end,dur,si_sdr,si_sdri,perm_swapped,"
                          "selected_pred_indices,sep_nsrc,k_refs")
    assert len(details) >= 2


def test_speaker_id_vad_cli(tmp_path):
    from audio_classification_tpu.cli.speaker_id_vad_asr import main
    import audio_classification_tpu.models.facades as facades

    facades._DEFAULT_ENGINE = None
    sr = 16000
    d = tmp_path
    lines_en, lines_te = [], []
    for spk, hz in (("a", 220.0), ("b", 400.0)):
        w = d / f"{spk}.wav"
        write_wav(w, _tone(1.0, hz, sr=sr), sr)
        lines_en.append(f"{spk} {w}")
        t = d / f"{spk}_t.wav"
        write_wav(t, _tone(1.0, hz, sr=sr), sr)
        lines_te.append(f"{spk} {t}")
    (d / "spk.txt").write_text("\n".join(lines_en))
    (d / "test.txt").write_text("\n".join(lines_te))
    out = d / "out"
    main([
        "--speaker-file", str(d / "spk.txt"),
        "--test-list", str(d / "test.txt"),
        "--threshold", "-1",
        "--preset", "tiny",
        "--out-dir", str(out),
        "--sense-voice", "builtin",
    ])
    run = list(out.iterdir())[0]
    preds = (run / "predictions.csv").read_text().splitlines()
    assert preds[0] == "wav,speaker_true,speaker_pred,text,score"
    assert len(preds) == 3
    report = (run / "report.txt").read_text()
    assert "Accuracy:" in report and "Train speakers: 2" in report


def test_speaker_id_vad_cli_apply_vad(tmp_path, capsys):
    """--apply-vad trims non-speech before embedding/ASR (VERDICT item 7);
    the VADNet path runs for real and the run still produces full outputs."""
    from audio_classification_tpu.cli.speaker_id_vad_asr import main
    import audio_classification_tpu.models.facades as facades

    facades._DEFAULT_ENGINE = None
    sr = 16000
    d = tmp_path
    w = d / "a.wav"
    write_wav(w, _tone(1.0, 220.0, sr=sr), sr)
    (d / "spk.txt").write_text(f"a {w}")
    t = d / "a_t.wav"
    # tone padded with silence: VAD has something to trim
    import numpy as np

    sig = np.concatenate([np.zeros(sr // 2, np.float32), _tone(1.0, 220.0, sr=sr),
                          np.zeros(sr // 2, np.float32)])
    write_wav(t, sig, sr)
    (d / "test.txt").write_text(f"a {t}")
    out = d / "out"
    main([
        "--speaker-file", str(d / "spk.txt"),
        "--test-list", str(d / "test.txt"),
        "--threshold", "-1",
        "--preset", "tiny",
        "--out-dir", str(out),
        "--sense-voice", "builtin",
        "--apply-vad",
    ])
    assert "VAD applied: kept" in capsys.readouterr().out
    run = list(out.iterdir())[0]
    preds = (run / "predictions.csv").read_text().splitlines()
    assert len(preds) == 2  # header + 1 row


def test_engine_vad_probs_batch():
    from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine, tiny_preset
    import numpy as np

    pack = ModelPack(tiny_preset(), seed=0)
    eng = StageEngine(pack, BucketSpec(lengths=(4000, 8000), max_batch=2))
    wavs = [_tone(0.3, 300.0), _tone(0.45, 500.0)]
    probs = eng.vad_probs_batch(wavs)
    assert len(probs) == 2
    for w, p in zip(wavs, probs):
        assert p.shape == (eng.fbank_cfg.frames_for(len(w)),)
        assert np.all((p >= 0) & (p <= 1))
    # batch results match the single-item path (different batch shapes fuse
    # differently in XLA, so exact bitwise equality is not expected)
    np.testing.assert_allclose(probs[0], eng.vad_probs(wavs[0]), atol=1e-4)
