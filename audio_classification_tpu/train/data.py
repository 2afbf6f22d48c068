"""Shared manifest + waveform plumbing for the training CLIs.

cli/train_asr and cli/train_speaker consume the same two on-disk shapes:
a JSONL manifest of ``{"wav": ..., <value>: ...}`` records (or a
``wav<TAB>value`` TSV), and 16 kHz mono waveforms decoded through the
framework's own codec/resampler.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

SR = 16000


def read_manifest(path: str, value_field: str):
    """-> [(wav_path, value)]; JSONL {"wav", value_field} or TSV."""
    items = []
    for ln in Path(path).read_text(encoding="utf-8").splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln.startswith("{"):
            rec = json.loads(ln)
            items.append((rec["wav"], str(rec[value_field])))
        else:
            wav, value = ln.split("\t", 1)
            items.append((wav, value))
    if not items:
        raise SystemExit(f"empty manifest: {path}")
    return items


class WavCache:
    """Decode + resample to 16 kHz mono, memoized; flushed wholesale past
    ``limit`` entries (bounds memory over large corpora)."""

    def __init__(self, limit: int = 512):
        self.limit = limit
        self._cache: dict = {}

    def __call__(self, path: str) -> np.ndarray:
        if path not in self._cache:
            from ..audio_io import read_wav, to_mono
            from ..ops.resample import resample_poly

            wav, sr = read_wav(path)
            wav = to_mono(wav)
            if sr != SR:
                wav = np.asarray(resample_poly(wav, sr, SR))
            if len(self._cache) > self.limit:
                self._cache.clear()
            self._cache[path] = wav.astype(np.float32)
        return self._cache[path]


def write_run_manifest(out_dir, args, extra: dict | None = None) -> str:
    """Drop a run.json next to a checkpoint/export: argv namespace, seed,
    git revision and library versions — enough to reproduce or audit a
    training run (the reference's only run provenance is timestamped dir
    names, overlap3_core.py:189-198)."""
    import json
    import subprocess
    from pathlib import Path

    rev = ""
    try:
        rev = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             timeout=10).stdout.strip()
    except Exception:
        pass
    import jax

    meta = {
        "argv": {k: v for k, v in sorted(vars(args).items())},
        "git_rev": rev,
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "n_devices": len(jax.devices()),
    }
    meta.update(extra or {})
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / "run.json"
    path.write_text(json.dumps(meta, indent=2, default=str) + "\n",
                    encoding="utf-8")
    return str(path)
