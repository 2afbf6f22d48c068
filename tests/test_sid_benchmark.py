"""SID benchmark pipeline + CLI tests on synthetic speakers."""
import json
from pathlib import Path

import numpy as np
import pytest

from audio_classification_tpu.audio_io import write_wav
from audio_classification_tpu.pipelines.sid_benchmark import load_pairs, load_refs

SR = 16000


def _voice(hz, dur=1.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * SR)) / SR
    # speaker identity = comb of harmonics at a fundamental
    x = sum(0.2 / (k + 1) * np.sin(2 * np.pi * hz * (k + 1) * t) for k in range(4))
    return (x + 0.01 * rng.standard_normal(t.size)).astype(np.float32)


@pytest.fixture(scope="module")
def bench_fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("sid_bench")
    speakers = {"alice": 220.0, "bob": 340.0}
    enroll_lines, test_lines, ref_lines = [], [], []
    for spk, hz in speakers.items():
        for i in range(2):
            p = d / f"{spk}_enroll_{i}.wav"
            write_wav(p, _voice(hz, seed=i), SR)
            enroll_lines.append(f"{spk} {p}")
        tp = d / f"{spk}_test.wav"
        write_wav(tp, _voice(hz, seed=7), SR)
        test_lines.append(f"{spk} {tp}")
        ref_lines.append(f"{tp}\thello world")
    (d / "speakers.txt").write_text("\n".join(enroll_lines))
    (d / "test.txt").write_text("\n".join(test_lines))
    (d / "refs.tsv").write_text("\n".join(ref_lines))
    return d


def test_load_pairs(bench_fixtures):
    m = load_pairs(str(bench_fixtures / "speakers.txt"))
    assert set(m) == {"alice", "bob"}
    assert len(m["alice"]) == 2


def test_load_pairs_bad_line(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("only_one_field\n")
    with pytest.raises(ValueError):
        load_pairs(str(p))


def test_load_refs_tsv(bench_fixtures):
    refs = load_refs(str(bench_fixtures / "refs.tsv"))
    assert len(refs) == 2
    assert all(v == "hello world" for v in refs.values())


def test_load_refs_core_id_broadcast(tmp_path):
    wavs = ["/x/3D_SPK_06154_003_Device03_Dist01.wav", "/x/3D_SPK_06154_003_Device06_Dist02.wav"]
    p = tmp_path / "refs.txt"
    p.write_text("3D_SPK_06154_003 你好世界\n")
    refs = load_refs(str(p), wavs)
    assert refs == {w: "你好世界" for w in wavs}


def test_benchmark_batch_mode(bench_fixtures, tmp_path):
    from audio_classification_tpu.cli.benchmark_pipeline import main
    import audio_classification_tpu.models.facades as facades

    facades._DEFAULT_ENGINE = None
    out = tmp_path / "bm"
    main([
        "--speaker-file", str(bench_fixtures / "speakers.txt"),
        "--test-list", str(bench_fixtures / "test.txt"),
        "--ref-text-list", str(bench_fixtures / "refs.tsv"),
        "--threshold", "-1",
        "--preset", "tiny",
        "--out-dir", str(out),
        "--batch-mode",
    ])
    d = list(out.iterdir())[0]
    summary = json.loads((d / "summary.json").read_text())
    assert summary["total_utts"] == 2
    assert summary["avg_rtf"] >= 0
    rows = (d / "predictions.csv").read_text().splitlines()
    assert len(rows) == 3


def test_benchmark_cli_end_to_end(bench_fixtures, tmp_path):
    from audio_classification_tpu.cli.benchmark_pipeline import main
    import audio_classification_tpu.models.facades as facades

    out = tmp_path / "bench_out"
    emb_cache = tmp_path / "emb_cache"
    main([
        "--speaker-file", str(bench_fixtures / "speakers.txt"),
        "--test-list", str(bench_fixtures / "test.txt"),
        "--ref-text-list", str(bench_fixtures / "refs.tsv"),
        "--threshold", "-1",
        "--preset", "tiny",
        "--out-dir", str(out),
        "--emb-cache-dir", str(emb_cache),
        "--save-speaker-embeds", str(tmp_path / "spk.npz"),
    ])
    run_dirs = list(out.iterdir())
    assert len(run_dirs) == 1
    d = run_dirs[0]
    assert (d / "detail.jsonl").is_file()
    assert (d / "predictions.csv").is_file()
    summary = json.loads((d / "summary.json").read_text())
    for key in ("total_utts", "train_speakers", "correct", "unknown", "accuracy",
                "avg_sid_time", "avg_asr_time", "avg_total_time", "p95_rtf",
                "avg_rtf", "cer_mean", "duration_audio_sum_sec", "elapsed_wall_sec"):
        assert key in summary
    assert summary["total_utts"] == 2
    assert summary["train_speakers"] == 2
    # embedding caches were written per enrollment wav
    assert len(list(emb_cache.glob("*.npy"))) == 4
    assert (tmp_path / "spk.npz").is_file()
    csv_head = (d / "predictions.csv").read_text().splitlines()[0]
    assert csv_head == ("wav,speaker_true,speaker_pred,score,text,dur_sec,sid_time,"
                        "asr_time,total_time,rtf,cpu_pct_before,cpu_pct_after,cer")
    # reload from npz (enrollment shortcut path)
    facades._DEFAULT_ENGINE = None
    main([
        "--speaker-file", str(bench_fixtures / "speakers.txt"),
        "--test-list", str(bench_fixtures / "test.txt"),
        "--threshold", "-1",
        "--preset", "tiny",
        "--out-dir", str(out),
        "--load-speaker-embeds", str(tmp_path / "spk.npz"),
    ])
    assert len(list(out.iterdir())) >= 1
