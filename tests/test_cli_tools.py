"""Data tool CLIs: mix_wavs, split_speakers, generate_speaker_list, batch_eval, version."""
import json

import numpy as np
import pytest

from audio_classification_tpu.audio_io import read_wav, write_wav

SR = 16000


def _tone(dur, hz, amp=0.3):
    t = np.arange(int(dur * SR)) / SR
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_mix_wavs_offsets_and_gains(tmp_path):
    from audio_classification_tpu.cli.mix_wavs import main

    a, b = _tone(1.0, 440), _tone(1.0, 880)
    write_wav(tmp_path / "a.wav", a, SR)
    write_wav(tmp_path / "b.wav", b, SR)
    out = tmp_path / "mix.wav"
    main([str(tmp_path / "a.wav"), str(tmp_path / "b.wav"),
          "--out", str(out), "--offsets", "0,0.5", "--gains-db", "0,-6"])
    y, sr = read_wav(out)
    assert sr == SR
    assert y.shape[0] == int(1.5 * SR)
    # first 0.5 s contains only source a
    ref = a[: SR // 2]
    assert np.abs(y[: SR // 2] - ref).max() < 2e-3


def test_mix_wavs_snr_mode_and_peak_limit(tmp_path):
    from audio_classification_tpu.cli.mix_wavs import mix

    a, b = _tone(0.5, 440, amp=0.9), _tone(0.5, 880, amp=0.9)
    write_wav(tmp_path / "a.wav", a, SR)
    write_wav(tmp_path / "b.wav", b, SR)
    out = tmp_path / "m.wav"
    mix([str(tmp_path / "a.wav"), str(tmp_path / "b.wav")], str(out), sr=SR, snr_dbs=[0.0, 6.0])
    y, _ = read_wav(out)
    assert np.abs(y).max() <= 0.9801


def test_mix_wavs_rejects_both_modes(tmp_path):
    from audio_classification_tpu.cli.mix_wavs import mix

    write_wav(tmp_path / "a.wav", _tone(0.1, 440), SR)
    with pytest.raises(ValueError):
        mix([str(tmp_path / "a.wav")], str(tmp_path / "o.wav"), snr_dbs=[0.0], gains_db=[0.0])


def test_split_speakers_utterance_mode(tmp_path):
    from audio_classification_tpu.cli.split_speakers import main

    lines = [f"spk{i} /x/spk{i}_{j}.wav" for i in range(3) for j in range(5)]
    inp = tmp_path / "speaker.txt"
    inp.write_text("\n".join(lines) + "\n")
    tr, te = tmp_path / "train.txt", tmp_path / "test.txt"
    main(["--input", str(inp), "--train-out", str(tr), "--test-out", str(te),
          "--train-ratio", "0.8", "--seed", "42", "--mode", "utterance"])
    train = tr.read_text().splitlines()
    test = te.read_text().splitlines()
    assert len(train) + len(test) == 15
    assert len(train) == 12  # 4 per speaker
    # determinism
    main(["--input", str(inp), "--train-out", str(tmp_path / "t2.txt"),
          "--test-out", str(tmp_path / "e2.txt"), "--seed", "42"])
    assert (tmp_path / "t2.txt").read_text().splitlines() == train


def test_split_speakers_speaker_mode_disjoint(tmp_path):
    from audio_classification_tpu.cli.split_speakers import main

    lines = [f"spk{i} /x/{i}_{j}.wav" for i in range(5) for j in range(2)]
    inp = tmp_path / "s.txt"
    inp.write_text("\n".join(lines) + "\n")
    tr, te = tmp_path / "tr.txt", tmp_path / "te.txt"
    main(["--input", str(inp), "--train-out", str(tr), "--test-out", str(te), "--mode", "speaker"])
    tr_spk = {l.split()[0] for l in tr.read_text().splitlines()}
    te_spk = {l.split()[0] for l in te.read_text().splitlines()}
    assert tr_spk and te_spk
    assert not (tr_spk & te_spk)


def test_generate_speaker_list(tmp_path):
    from audio_classification_tpu.cli.generate_speaker_list import main

    for spk in ("alice", "bob"):
        d = tmp_path / "data" / spk
        d.mkdir(parents=True)
        write_wav(d / "u1.wav", _tone(0.1, 440), SR)
    out = tmp_path / "speaker.txt"
    main([str(tmp_path / "data"), "--out", str(out)])
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("alice ")


def test_batch_eval_aggregation(tmp_path, capsys):
    from audio_classification_tpu.cli.batch_eval import main

    for i in range(3):
        d = tmp_path / f"run_{i}"
        d.mkdir()
        (d / "metrics.json").write_text(json.dumps({
            "rtf_total": 0.1 + 0.05 * i,
            "rtf_asr": 0.05,
            "time_compute_total_sec": 10 + i,
            "time_osd_sec": 1.0, "time_sep_sec": 2.0, "time_asr_sec": 5.0,
            "target_hit_rate_segments": 0.9,
            "segments_matched": 10, "segments_total": 12,
            "sep_sisdr_mean": 10.0, "sep_sisdri_mean": 13.0, "sep_eval_segments": 5,
            "cpu_avg": 50.0, "cpu_peak": 80.0,
            "rss_avg_mb": 1000.0, "rss_peak_mb": 1200.0,
            "total_audio_sec": 100.0, "audio_overlap_sec": 30.0,
        }))
    (tmp_path / "not_a_run").mkdir()  # no metrics.json -> skipped
    out = tmp_path / "batch_analysis.json"
    main(["--results-dir", str(tmp_path), "--output", str(out)])
    summary = json.loads(out.read_text())
    assert summary["total_results"] == 3
    m = summary["metrics"]
    assert m["rtf_total"]["count"] == 3
    assert m["rtf_total"]["mean"] == pytest.approx(0.15)
    assert m["overlap_ratio"]["mean"] == pytest.approx(0.3)
    assert (tmp_path / "batch_analysis.txt").is_file()
    text = capsys.readouterr().out
    assert "实时因子" in text


def test_version_runs(capsys):
    from audio_classification_tpu.cli.version import main

    main([])
    out = capsys.readouterr().out
    assert "framework" in out and "jax" in out
