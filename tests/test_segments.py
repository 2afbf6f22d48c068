"""Segment algebra tests (parity with reference interval semantics)."""
import numpy as np

from audio_classification_tpu.engine.segments import (
    complement_intervals,
    exclusive_segments,
    flags_to_segments,
    hop_grid,
    masks_to_segments,
    merge_intervals,
    rasterize_intervals,
    segments_to_mask,
)


def test_hop_grid():
    g = hop_grid(2.0, 0.5, 0.1)
    assert g[0] == 0.0
    assert abs(g[-1] - 1.5) < 1e-6
    assert len(g) == 16


def test_rasterize_and_back():
    dur, win, hop = 3.0, 0.5, 0.1
    flags = rasterize_intervals([(1.0, 1.8)], dur, win, hop)
    segs = flags_to_segments(flags, dur, win, hop)
    # full coverage, alternating
    assert segs[0][0] == 0.0 and segs[-1][1] == dur
    for a, b in zip(segs, segs[1:]):
        assert b[0] <= a[1] + 1e-9
    ol = [s for s in segs if s[2]]
    assert len(ol) == 1
    s, e, _ = ol[0]
    assert s <= 1.0 <= e and e >= 1.8


def test_flags_to_segments_empty():
    assert flags_to_segments(np.zeros(0, bool), 2.5, 0.5, 0.1) == [(0.0, 2.5, False)]


def test_flags_to_segments_all_true():
    flags = np.ones(16, bool)
    segs = flags_to_segments(flags, 2.0, 0.5, 0.1)
    assert segs == [(0.0, 2.0, True)]


def test_flags_win_extension():
    # single flagged hop at i=5: run [0..4]=F, [5]=T, [6..]=F
    flags = np.zeros(20, bool)
    flags[5] = True
    segs = flags_to_segments(flags, 2.4, 0.5, 0.1)
    # the False->True boundary emits (0, 5*hop + win, False) then True run
    assert segs[0] == (0.0, 1.0, False)
    assert segs[1][0] == 0.5 and segs[1][2] is True
    assert abs(segs[1][1] - 1.1) < 1e-9  # 6*hop + win


def test_merge_intervals():
    out = merge_intervals([(0.5, 1.0), (0.9, 1.4), (2.0, 2.2), (-1.0, 0.2)], 3.0)
    assert out == [(0.0, 0.2), (0.5, 1.4), (2.0, 2.2)]


def test_complement():
    out = complement_intervals([(0.5, 1.0), (2.0, 2.5)], 0.0, 3.0)
    assert out == [(0.0, 0.5), (1.0, 2.0), (2.5, 3.0)]


def test_exclusive_segments_reference_semantics():
    osd = [(0.0, 1.0, False), (0.8, 1.6, True), (1.5, 2.2, True), (2.2, 5.0, False), (3.0, 3.2, True)]
    # min_overlap_dur 0.4 drops the 0.2s overlap at 3.0
    segs = exclusive_segments(osd, 5.0, 0.4)
    assert segs == [
        (0.0, 0.8, False),
        (0.8, 2.2, True),
        (2.2, 5.0, False),
    ]
    # full coverage without holes
    assert segs[0][0] == 0.0 and segs[-1][1] == 5.0
    for a, b in zip(segs, segs[1:]):
        assert abs(a[1] - b[0]) < 1e-9


def test_exclusive_segments_no_overlap():
    segs = exclusive_segments([(0.0, 4.0, False)], 4.0, 0.4)
    assert segs == [(0.0, 4.0, False)]


def test_masks_roundtrip():
    dur, win, hop = 4.0, 0.5, 0.1
    segs = [(1.0, 2.0, True), (2.0, 4.0, False)]
    mask = segments_to_mask(segs, dur, hop, win)
    out = masks_to_segments(mask, hop, win, dur)
    assert len(out) == 1
    s, e = out[0]
    assert s <= 1.0 and e >= 2.0 and e - s < 1.0 + 2 * win + 1e-6
