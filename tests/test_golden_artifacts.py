"""Golden byte-schema tests for the artifact writers.

The reference's artifacts are a cross-tool contract: batch_eval.py consumes
metrics.json from run dirs (reference: batch_eval.py:219-224), and the
acceptance runbook diffs segments.jsonl/evaluation.json field-for-field.
Field-PRESENCE tests (test_pipeline_overlap3.py) can't catch a renamed
field, a reordered CSV column, or a float-formatting change — these tests
byte-compare the writers' output against checked-in goldens built from
FIXED synthetic results (no models, no device).

Regenerate after an intentional schema change:
    python -m tests.test_golden_artifacts
"""
import json
from pathlib import Path

GOLDEN = Path(__file__).parent / "goldens"


# ---------------------------------------------------------------- fixtures
def _overlap3_result():
    """A fixed PipelineResult exercising every field shape: clean + overlap
    records, unicode text, None stream, sep-detail rows."""
    from audio_classification_tpu.pipelines.offline_overlap3 import PipelineResult

    segments = [
        {"wav": "mix_0001.wav", "start": 0.0, "end": 1.5, "kind": "clean",
         "stream": None, "text": "你好 hello", "asr_time": 0.0123456,
         "sv_score": 0.8123456, "target_src": "s1", "target_src_text": "你好"},
        {"wav": "mix_0001.wav", "start": 1.5, "end": 3.25, "kind": "overlap",
         "stream": 2, "text": "abc", "asr_time": 0.2,
         "sv_score": 0.7015, "target_src": "s1", "target_src_text": "abcd"},
        {"wav": "mix_0002.wav", "start": 0.25, "end": 2.0, "kind": "overlap",
         "stream": 0, "text": "", "asr_time": 0.05,
         "sv_score": None, "target_src": None, "target_src_text": ""},
    ]
    sep_rows = [
        ["mix_0001.wav", "1.500", "3.250", 3, "10.1234", "13.5678", "0|2"],
        ["mix_0002.wav", "0.250", "2.000", 2, "-1.5000", "2.2500", "1|0"],
    ]
    metrics = {
        "total_audio_sec": 5.25, "audio_overlap_sec": 3.5,
        "audio_clean_sec": 1.75, "audio_matched_sec": 3.25,
        "audio_seen_clean_sec": 1.5, "audio_seen_overlap_sec": 3.5,
        "audio_missed_sec": 2.0, "segments_total": 3, "segments_clean": 1,
        "segments_overlap_streams": 2, "separated_streams": 6,
        "segments_matched": 2, "segments_seen_clean": 1,
        "segments_seen_overlap": 2, "segments_missed": 1,
        "segments_missed_clean": 0, "segments_missed_overlap": 1,
        "target_hit_rate_segments": 0.6667, "time_osd_sec": 0.1,
        "time_sep_sec": 0.5, "time_asr_sec": 0.3,
        "time_compute_total_sec": 0.9, "rtf_total": 0.1714, "rtf_asr": 0.0571,
        "sep_eval_k_refs": 2, "sep_eval_segments": 2,
        "sep_sisdr_mean": 4.3117, "sep_sisdr_median": 4.3117,
        "sep_sisdr_std": 5.8117, "sep_sisdri_mean": 7.9089,
        "sep_sisdri_median": 7.9089, "sep_sisdri_std": 5.6589,
    }
    return PipelineResult(segments, sep_rows, metrics, "Libri3Mix", "test", 2, 16000)


def _overlap3_cfg():
    from audio_classification_tpu.utils.config import Overlap3Config

    return Overlap3Config(eval_separation=True, save_sep_details=True,
                          enable_metrics=True)


def _write_overlap3(out_dir: Path):
    from audio_classification_tpu.cli.offline_overlap_3src import write_artifacts

    out_dir.mkdir(parents=True, exist_ok=True)
    write_artifacts(out_dir, _overlap3_result(), _overlap3_cfg())
    return ["segments.jsonl", "segments.csv", "overlap_sep_details.csv",
            "metrics.json", "summary.json"]


def _sid_runner():
    """A BenchmarkRunner shell carrying fixed accumulated rows (write_outputs
    only reads instance attributes; reference schema:
    benchmark_pipeline.py:317-371)."""
    from types import SimpleNamespace

    from audio_classification_tpu.pipelines.sid_benchmark import BenchmarkRunner

    r = object.__new__(BenchmarkRunner)
    r.args = SimpleNamespace(plot_cpu=False)
    r.rows_csv = [
        ["a/u1.wav", "spk1", "spk1", "0.812", "你好", "1.500", "0.010",
         "0.120", "0.130", "0.087", "12.500", "14.000", "0.000"],
        ["a/u2.wav", "spk2", "unknown", "0.300", "", "2.000", "0.011",
         "0.200", "0.211", "0.105", "", "", ""],
    ]
    r.detail_records = [
        {"wav": "a/u1.wav", "speaker_true": "spk1", "speaker_pred": "spk1",
         "score": 0.812, "text": "你好", "text_norm": "你好",
         "ref_text": "你好", "ref_text_norm": "你好", "dur_sec": 1.5,
         "sid_time": 0.01, "asr_time": 0.12, "total_time": 0.13,
         "rtf": 0.087, "cpu_before": 12.5, "cpu_after": 14.0, "cer": 0.0},
        {"wav": "a/u2.wav", "speaker_true": "spk2", "speaker_pred": "unknown",
         "score": 0.3, "text": "", "text_norm": "", "ref_text": None,
         "ref_text_norm": None, "dur_sec": 2.0, "sid_time": 0.011,
         "asr_time": 0.2, "total_time": 0.211, "rtf": 0.105,
         "cpu_before": None, "cpu_after": None, "cer": None},
    ]
    r.metrics = {
        "total_utts": 2, "train_speakers": 2, "correct": 1, "unknown": 1,
        "accuracy": 0.5, "avg_sid_time": 0.011, "avg_asr_time": 0.16,
        "avg_total_time": 0.171, "p95_rtf": 0.104, "avg_rtf": 0.096,
        "cer_mean": 0.0, "duration_audio_sum_sec": 3.5,
        "elapsed_wall_sec": 1.234, "threshold": 0.5,
        "model": "pack:tiny", "asr_model_type": "sense_voice",
        "output_dir": "test/benchmark/fixed",
    }
    r._cpu_before_seq = [12.5, None]
    r._cpu_after_seq = [14.0, None]
    return r


def _write_sid(out_dir: Path):
    from audio_classification_tpu.pipelines.sid_benchmark import BenchmarkRunner

    out_dir.mkdir(parents=True, exist_ok=True)
    BenchmarkRunner.write_outputs(_sid_runner(), out_dir)
    return ["predictions.csv", "detail.jsonl", "summary.json", "summary.txt"]


CASES = {"overlap3": _write_overlap3, "sid_benchmark": _write_sid}


# ------------------------------------------------------------------- tests
def _assert_golden(case: str, tmp_path: Path):
    files = CASES[case](tmp_path / case)
    gdir = GOLDEN / case
    assert gdir.exists(), (
        f"missing goldens for {case}: run `python -m tests.test_golden_artifacts`")
    for name in files:
        got = (tmp_path / case / name).read_bytes()
        want = (gdir / name).read_bytes()
        assert got == want, (
            f"{case}/{name} drifted from its checked-in golden — if the "
            "schema change is intentional, regenerate with "
            "`python -m tests.test_golden_artifacts` and review the diff")


def test_overlap3_writers_golden(tmp_path):
    _assert_golden("overlap3", tmp_path)


def test_sid_benchmark_writers_golden(tmp_path):
    _assert_golden("sid_benchmark", tmp_path)


def test_overlap3_metrics_json_loads_like_batch_eval(tmp_path):
    """metrics.json must parse and carry the series batch_eval aggregates
    (reference: batch_eval.py:17-135 reads these names from metrics.json)."""
    files = CASES["overlap3"](tmp_path / "o3")
    assert "metrics.json" in files
    m = json.loads((tmp_path / "o3" / "metrics.json").read_text())
    for k in ("rtf_total", "sep_sisdri_mean", "target_hit_rate_segments",
              "time_osd_sec", "time_sep_sec", "time_asr_sec"):
        assert k in m


if __name__ == "__main__":
    for case, fn in CASES.items():
        names = fn(GOLDEN / case)
        print(f"regenerated {case}: {names}")
