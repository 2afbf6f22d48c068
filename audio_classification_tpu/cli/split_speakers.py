"""Split a `<spk> <wav>` list into train/test sets.

Reimplements the reference tool (reference: scripts/split_speakers.py:36-167)
with the same two modes and rebalancing guards:
- speaker   : disjoint speaker IDs between splits
- utterance : per-speaker stratified utterance split (default)
Deterministic via --seed (default 42); default 80/20 ratio.
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Split speaker list into train/test")
    p.add_argument("--input", "-i", type=Path, required=True, help="Path to input speaker.txt")
    p.add_argument("--train-out", type=Path, required=True)
    p.add_argument("--test-out", type=Path, required=True)
    p.add_argument("--train-ratio", type=float, default=0.8, help="Ratio for train set (0-1)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mode", type=str, choices=["speaker", "utterance"], default="utterance")
    return p.parse_args(argv)


def split_lines(lines, mode: str, train_ratio: float, seed: int):
    by_spk = {}
    for ln in lines:
        spk, *_ = ln.split(maxsplit=1)
        by_spk.setdefault(spk, []).append(ln)
    unique_speakers = sorted(by_spk)
    if not unique_speakers:
        raise SystemExit("No speakers found in input file")
    rng = random.Random(seed)

    if mode == "speaker":
        spk_shuffled = unique_speakers.copy()
        rng.shuffle(spk_shuffled)
        split_idx = int(len(spk_shuffled) * train_ratio)
        train_set = set(spk_shuffled[:split_idx])
        test_set = set(spk_shuffled[split_idx:])
        if not train_set and test_set:
            s = next(iter(test_set)); test_set.remove(s); train_set.add(s)
        if not test_set and train_set:
            s = next(iter(train_set)); train_set.remove(s); test_set.add(s)
        train_lines = [ln for ln in lines if ln.split(maxsplit=1)[0] in train_set]
        test_lines = [ln for ln in lines if ln.split(maxsplit=1)[0] in test_set]
        return train_lines, test_lines, unique_speakers

    train_lines, test_lines = [], []
    for spk in unique_speakers:
        utts = by_spk[spk].copy()
        rng.shuffle(utts)
        n = len(utts)
        if n == 1:
            n_train = 1
        else:
            n_train = min(max(int(n * train_ratio), 1), n - 1)
        train_lines.extend(utts[:n_train])
        test_lines.extend(utts[n_train:])
    # rebalancing guards for tiny datasets
    if not test_lines and train_lines:
        for spk in reversed(unique_speakers):
            spk_trains = [ln for ln in train_lines if ln.split(maxsplit=1)[0] == spk]
            if len(spk_trains) >= 2:
                mv = spk_trains[-1]
                train_lines.remove(mv)
                test_lines.append(mv)
                break
    if not train_lines and test_lines:
        train_lines.append(test_lines.pop())
    return train_lines, test_lines, unique_speakers


def main(argv=None) -> None:
    args = parse_args(argv)
    assert 0.0 < args.train_ratio < 1.0, "train-ratio must be in (0,1)"
    with args.input.open("r", encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    train_lines, test_lines, unique_speakers = split_lines(lines, args.mode, args.train_ratio, args.seed)

    args.train_out.parent.mkdir(parents=True, exist_ok=True)
    args.test_out.parent.mkdir(parents=True, exist_ok=True)
    args.train_out.write_text("\n".join(train_lines) + ("\n" if train_lines else ""), encoding="utf-8")
    args.test_out.write_text("\n".join(test_lines) + ("\n" if test_lines else ""), encoding="utf-8")

    if args.mode == "speaker":
        tr = {ln.split(maxsplit=1)[0] for ln in train_lines}
        te = {ln.split(maxsplit=1)[0] for ln in test_lines}
        print("Mode: speaker")
        print(f"Speakers: total={len(unique_speakers)}, train={len(tr)}, test={len(te)}")
    else:
        tr = {ln.split(maxsplit=1)[0] for ln in train_lines}
        te = {ln.split(maxsplit=1)[0] for ln in test_lines}
        print("Mode: utterance")
        print(f"Speakers: total={len(unique_speakers)}, in-train={len(tr)}, in-test={len(te)}")
    print(f"Lines: train={len(train_lines)}, test={len(test_lines)}")
    print(f"Wrote: {args.train_out} and {args.test_out}")


if __name__ == "__main__":
    main()
