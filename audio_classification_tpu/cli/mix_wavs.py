"""N-source WAV mixer (fixture/synthesis tool).

Reimplements the reference tool (reference: scripts/tools/mix_wavs.py:
49-243): per-source start offsets, either relative-SNR-to-source-0 or
absolute per-source dB gains (mutually exclusive), auto-resample to the
target rate, and a global peak limiter at 0.98. Decode/encode use the
framework's own codec; resampling uses the device polyphase resampler.
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..audio_io import read_wav, to_mono, write_wav
from ..ops.resample import resample_poly

import jax.numpy as jnp


def _rms(x: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.square(x.astype(np.float64))) + 1e-12))


def _load_wav(path: str, target_sr: int) -> np.ndarray:
    wav, sr = read_wav(path)
    wav = to_mono(wav)
    if sr != target_sr:
        wav = np.asarray(resample_poly(jnp.asarray(wav), sr, target_sr))
    return wav.astype(np.float32)


def _parse_floats_csv(s: Optional[str], n: int, default: float) -> List[float]:
    if not s:
        return [default] * n
    vals = [float(p.strip()) for p in s.split(",") if p.strip() != ""]
    if len(vals) == 1:
        return [vals[0]] * n
    if len(vals) != n:
        raise ValueError(f"List length mismatch: expected {n}, got {len(vals)}")
    return vals


def mix(
    inputs: List[str],
    out_path: str,
    sr: int = 16000,
    offsets: Optional[List[float]] = None,
    snr_dbs: Optional[List[float]] = None,
    gains_db: Optional[List[float]] = None,
    peak_limit: float = 0.98,
) -> None:
    n = len(inputs)
    if n == 0:
        raise ValueError("No input files provided")
    offsets = offsets or [0.0] * n
    if len(offsets) != n:
        raise ValueError("offsets length must match number of inputs")
    if snr_dbs is not None and gains_db is not None:
        raise ValueError("Use either --snr or --gains-db, not both")

    waves = [_load_wav(p, sr) for p in inputs]
    starts = [int(max(0.0, o) * sr) for o in offsets]
    total_len = max(s + w.shape[-1] for s, w in zip(starts, waves))

    scales = np.ones(n, dtype=np.float64)
    if gains_db is not None:
        if len(gains_db) != n:
            raise ValueError("gains-db length must match number of inputs")
        scales = 10.0 ** (np.asarray(gains_db, dtype=np.float64) / 20.0)
    elif snr_dbs is not None:
        if len(snr_dbs) != n:
            raise ValueError("snr length must match number of inputs")
        # SNRs relative to source 0: positive value -> quieter source
        ref_rms = _rms(waves[0]) or 1e-3
        ratios = 10.0 ** (-np.asarray(snr_dbs, dtype=np.float64) / 20.0)
        rms_arr = np.asarray([max(_rms(w), 1e-6) for w in waves])
        scales = ratios * (ref_rms / rms_arr)

    mix_tmp = np.zeros(total_len, dtype=np.float64)
    for w, s, sc in zip(waves, starts, scales):
        mix_tmp[s : s + w.shape[-1]] += w.astype(np.float64) * sc
    peak = float(np.max(np.abs(mix_tmp)) + 1e-12)
    g = peak_limit / peak if peak > peak_limit else 1.0
    mix_out = (mix_tmp * g).astype(np.float32)

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    write_wav(out_path, mix_out, sr)
    print(f"Saved mixture: {out_path}")
    print(f"- target SR     : {sr}")
    print(f"- duration (s)  : {len(mix_out)/sr:.3f}")
    print(f"- peak (before) : {peak:.4f}, global gain: {g:.4f}")
    print("- per-source scales (linear):", ", ".join(f"{s:.4f}" for s in scales))


def main(argv=None):
    ap = argparse.ArgumentParser(description="Mix multiple WAVs into one mixture.")
    ap.add_argument("inputs", nargs="+", help="Input WAV files (mono or multi-channel)")
    ap.add_argument("--out", required=True, help="Output WAV file path")
    ap.add_argument("--sr", type=int, default=16000, help="Target sample rate (Hz)")
    ap.add_argument("--offsets", default="", help="Comma list of start offsets in seconds")
    ap.add_argument("--snr", default="", help="Comma list of per-source SNR dB relative to source 0")
    ap.add_argument("--gains-db", default="", help="Comma list of absolute per-source gains in dB")
    ap.add_argument("--peak-limit", type=float, default=0.98)
    args = ap.parse_args(argv)

    n = len(args.inputs)
    offsets = _parse_floats_csv(args.offsets, n, 0.0)
    snr = _parse_floats_csv(args.snr, n, 0.0) if args.snr else None
    gains = _parse_floats_csv(args.gains_db, n, 0.0) if args.gains_db else None
    mix(args.inputs, args.out, sr=args.sr, offsets=offsets, snr_dbs=snr,
        gains_db=gains, peak_limit=args.peak_limit)


if __name__ == "__main__":
    main()
