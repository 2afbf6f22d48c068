"""Property tests locking reference-parity semantics on randomized inputs."""
import random

import numpy as np
import pytest

from audio_classification_tpu.engine.segments import (
    complement_intervals,
    exclusive_segments,
    flags_to_segments,
    merge_intervals,
)
from audio_classification_tpu.metrics import cer, edit_distance, pit_best_si_sdr, si_sdr


def _random_osd(rng, dur):
    """Random alternating OSD output like the analyzer emits."""
    segs = []
    t = 0.0
    flag = bool(rng.integers(0, 2))
    while t < dur:
        ln = float(rng.uniform(0.05, 1.5))
        segs.append((t, min(t + ln, dur), flag))
        t += ln
        flag = not flag
    return segs


@pytest.mark.parametrize("seed", range(20))
def test_exclusive_segments_invariants(seed):
    rng = np.random.default_rng(seed)
    dur = float(rng.uniform(2.0, 20.0))
    osd = _random_osd(rng, dur)
    min_dur = float(rng.uniform(0.0, 0.8))
    segs = exclusive_segments(osd, dur, min_dur)
    # full coverage, no gaps, no overlaps
    assert segs[0][0] == 0.0
    assert abs(segs[-1][1] - dur) < 1e-9
    for a, b in zip(segs, segs[1:]):
        assert abs(a[1] - b[0]) < 1e-9
    # every overlap segment >= min_dur (inputs below threshold became clean)
    for s, e, is_ol in segs:
        if is_ol:
            assert e - s >= min_dur - 1e-9
    # clean complement: no two adjacent segments share a flag
    for a, b in zip(segs, segs[1:]):
        assert not (a[2] and b[2]), "merged overlaps must not be adjacent"


@pytest.mark.parametrize("seed", range(10))
def test_merge_complement_partition(seed):
    rng = np.random.default_rng(seed)
    dur = 10.0
    iv = [(float(s), float(s + rng.uniform(0.1, 2.0)))
          for s in rng.uniform(0, dur, size=8)]
    merged = merge_intervals(iv, dur)
    comp = complement_intervals(merged, 0.0, dur)
    total = sum(e - s for s, e in merged) + sum(e - s for s, e in comp)
    assert total == pytest.approx(dur, abs=1e-9)
    # disjointness
    allv = sorted(merged + comp)
    for a, b in zip(allv, allv[1:]):
        assert a[1] <= b[0] + 1e-12


@pytest.mark.parametrize("seed", range(10))
def test_flags_segments_cover(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))
    flags = rng.integers(0, 2, size=n).astype(bool)
    dur = n * 0.1 + 0.4
    segs = flags_to_segments(flags, dur, 0.5, 0.1)
    assert segs[0][0] == 0.0 and abs(segs[-1][1] - dur) < 1e-9
    for a, b in zip(segs, segs[1:]):
        assert b[0] <= a[1] + 1e-9  # expanded windows may overlap, never gap


@pytest.mark.parametrize("seed", range(5))
def test_edit_distance_triangle(seed):
    rng = random.Random(seed)
    alpha = "abcd"
    s = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))) for _ in range(3)]
    d01 = edit_distance(s[0], s[1])
    d12 = edit_distance(s[1], s[2])
    d02 = edit_distance(s[0], s[2])
    assert d02 <= d01 + d12
    assert edit_distance(s[0], s[0]) == 0
    assert d01 == edit_distance(s[1], s[0])


def test_cer_bounds():
    rng = random.Random(0)
    for _ in range(20):
        ref = "".join(rng.choice("xyz") for _ in range(rng.randint(1, 10)))
        hyp = "".join(rng.choice("xyz") for _ in range(rng.randint(0, 10)))
        v = cer(ref, hyp)
        assert 0.0 <= v <= max(1.0, len(hyp) / len(ref))


@pytest.mark.parametrize("seed", range(5))
def test_pit_is_permutation_invariant(seed):
    rng = np.random.default_rng(seed)
    refs = [rng.standard_normal(2000).astype(np.float32) for _ in range(3)]
    preds = [r + 0.2 * rng.standard_normal(2000).astype(np.float32) for r in refs]
    best1, _ = pit_best_si_sdr(refs, preds)
    perm = [preds[2], preds[0], preds[1]]
    best2, _ = pit_best_si_sdr(refs, perm)
    assert best1 == pytest.approx(best2, abs=1e-6)


def test_si_sdr_scale_invariance_property():
    rng = np.random.default_rng(0)
    ref = rng.standard_normal(4000).astype(np.float32)
    est = ref + 0.1 * rng.standard_normal(4000).astype(np.float32)
    base = si_sdr(ref, est)
    for scale in (0.1, 2.0, 17.0):
        assert si_sdr(ref, scale * est) == pytest.approx(base, abs=0.05)
