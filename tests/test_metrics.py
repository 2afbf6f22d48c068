"""Metric tests: SI-SDR/PIT host-vs-device parity, CER/WER, OSD masks."""
import numpy as np
import pytest
import jax.numpy as jnp

from audio_classification_tpu.metrics import (
    build_gt_overlap_mask,
    cer,
    compute_osd_metrics,
    edit_distance,
    normalize_for_cer,
    pit_best_si_sdr,
    pit_si_sdr_batch,
    sdr_improvement_pit,
    sdr_improvement_pit_batch,
    si_sdr,
    si_sdr_matrix,
    wer,
)


def _srcs(seed=0, t=4000, k=3):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(t).astype(np.float32) * 0.3 for _ in range(k)]


# ------------------------------------------------------------------ si_sdr


def test_si_sdr_perfect_and_scaled():
    x = _srcs()[0]
    assert si_sdr(x, x) > 100
    # scale-invariance
    assert si_sdr(x, 3.0 * x) > 100


def test_si_sdr_noise_level():
    x = _srcs()[0]
    n = _srcs(seed=9)[0]
    # 10 dB SNR-ish construction
    y = x + 0.1 * n
    v = si_sdr(x, y)
    expected = 10 * np.log10(np.sum(x**2) / np.sum((0.1 * n) ** 2))
    assert abs(v - expected) < 1.0


def test_si_sdr_length_mismatch_truncates():
    x = _srcs()[0]
    assert si_sdr(x, x[:3000]) > 100


def test_si_sdr_zero_ref_large_negative():
    # the reference formula never actually yields NaN for a zero ref: the
    # projection has epsilon energy, so the value is just a huge negative dB
    # (a constant est zero-means to nothing and lands exactly at 0 dB)
    est = np.linspace(-1, 1, 100).astype(np.float32)
    assert si_sdr(np.zeros(100, np.float32), est) < -80
    assert si_sdr(np.zeros(100, np.float32), np.ones(100, np.float32)) == 0.0


# ------------------------------------------------------------------ PIT


def test_pit_recovers_permutation():
    s = _srcs(k=3)
    preds = [s[2], s[0], s[1]]  # cyclic shift
    best, idx = pit_best_si_sdr(s, preds)
    assert best > 100
    assert idx == [1, 2, 0]


def test_pit_k2_with_3_preds():
    s = _srcs(k=3)
    refs = s[:2]
    preds = [s[2], s[1], s[0]]
    best, idx = pit_best_si_sdr(refs, preds)
    assert best > 100
    assert idx == [2, 1]


def test_pit_insufficient_preds():
    s = _srcs(k=3)
    best, idx = pit_best_si_sdr(s, s[:2])
    assert np.isnan(best) and idx == []


def test_sdr_improvement():
    s = _srcs(k=3)
    mix = sum(s)
    best, sdri, idx = sdr_improvement_pit(mix, s, s)
    assert best > 100
    assert sdri > 100  # from mixture baseline (~ -3 dB) to perfect
    assert sorted(idx) == [0, 1, 2]


# ---------------------------------------------------------- device parity


def test_device_si_sdr_matrix_matches_numpy():
    s = _srcs(k=3)
    preds = [p + 0.05 * _srcs(seed=7)[0] for p in s]
    refs = jnp.asarray(np.stack(s))[None]
    pr = jnp.asarray(np.stack(preds))[None]
    mask = jnp.ones((1, s[0].size), jnp.float32)
    mat = np.asarray(si_sdr_matrix(refs, pr, mask))[0]
    for i in range(3):
        for j in range(3):
            assert abs(mat[i, j] - si_sdr(s[i], preds[j])) < 0.05


def test_device_pit_matches_numpy_padded():
    # two segments of different lengths in one padded batch
    s1 = _srcs(seed=1, t=3000, k=3)
    s2 = _srcs(seed=2, t=4500, k=3)
    n1 = _srcs(seed=11, t=3000, k=3)
    # noisy estimates keep SDRs finite so f32 device values stay comparable
    pred1 = [s1[1] + 0.1 * n1[0], s1[2] + 0.1 * n1[1], s1[0] + 0.1 * n1[2]]
    pred2 = [s2[0] + 0.2 * s2[1], s2[1] + 0.05 * s2[0], s2[2] + 0.1 * s2[0]]
    t_max = 4500
    def pad(arrs):
        return np.stack([np.pad(a, (0, t_max - a.size)) for a in arrs])
    refs = jnp.asarray(np.stack([pad(s1), pad(s2)]))
    preds = jnp.asarray(np.stack([pad(pred1), pad(pred2)]))
    mask = jnp.asarray(np.stack([
        (np.arange(t_max) < 3000).astype(np.float32),
        (np.arange(t_max) < 4500).astype(np.float32),
    ]))
    best_d, idx_d = pit_si_sdr_batch(refs, preds, mask, k_refs=3)
    for b, (refs_np, preds_np) in enumerate([(s1, pred1), (s2, pred2)]):
        best_np, idx_np = pit_best_si_sdr(refs_np, preds_np)
        assert abs(float(best_d[b]) - best_np) < 0.1
        assert list(np.asarray(idx_d[b])) == idx_np


def test_device_sdri_matches_numpy():
    s = _srcs(k=3, t=4000)
    mix = sum(s)
    preds = [x + 0.1 * mix for x in s]
    best_np, sdri_np, idx_np = sdr_improvement_pit(mix, s, preds)
    best_d, sdri_d, idx_d = sdr_improvement_pit_batch(
        jnp.asarray(mix)[None],
        jnp.asarray(np.stack(s))[None],
        jnp.asarray(np.stack(preds))[None],
        jnp.ones((1, 4000), jnp.float32),
        k_refs=3,
    )
    assert abs(float(best_d[0]) - best_np) < 0.05
    assert abs(float(sdri_d[0]) - sdri_np) < 0.1
    assert list(np.asarray(idx_d[0])) == idx_np


# ------------------------------------------------------------------ text


def test_normalize_for_cer():
    assert normalize_for_cer("你好, world! 123") == "你好world123"
    assert normalize_for_cer("") == ""


def test_cer_wer():
    assert cer("abc", "abc") == 0.0
    assert cer("abc", "axc") == 1 / 3
    assert cer("", "x") == 1.0
    assert cer("", "") == 0.0
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the dog sat") == 1 / 3
    assert edit_distance("kitten", "sitting") == 3


def test_cer_normalized_mode():
    assert cer("你好 世界", "你好世界", normalize=True) == 0.0


# ------------------------------------------------------------------ OSD


def test_gt_overlap_mask_and_metrics():
    sr = 16000
    t = np.arange(sr * 3) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    s1 = np.where(t < 2.0, tone, 0.0).astype(np.float32)  # active [0, 2)
    s2 = np.where(t >= 1.0, tone, 0.0).astype(np.float32)  # active [1, 3)
    gt = build_gt_overlap_mask([s1, s2], sr, 0.5, 0.1, 0.05)
    # overlap approx [1.0, 2.0): frame starts in [1.0, 1.5] fully inside
    centers = np.arange(len(gt)) * 0.1
    assert gt[(centers >= 1.05) & (centers <= 1.4)].all()
    assert not gt[centers < 0.4].any()
    assert not gt[centers > 2.2].any()

    m = compute_osd_metrics(gt, gt)
    assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["iou"] == 1.0
    m2 = compute_osd_metrics(gt, np.zeros_like(gt))
    assert m2["recall"] == 0.0


def test_eer_separable_and_overlapping():
    from audio_classification_tpu.metrics import eer

    # perfectly separable -> EER 0, threshold between the distributions
    e, thr = eer([0.8, 0.9, 0.95], [0.1, 0.2, 0.3])
    assert e == pytest.approx(0.0, abs=1e-9)
    assert 0.3 <= thr <= 0.8

    # fully overlapping identical distributions -> EER 0.5
    rng = np.random.default_rng(0)
    x = rng.standard_normal(500)
    y = rng.standard_normal(500)
    e, _ = eer(x, y)
    assert e == pytest.approx(0.5, abs=0.06)

    # known asymmetric case: one impostor above all targets
    e, _ = eer([0.5, 0.6, 0.7, 0.8], [0.0, 0.1, 0.9, 0.2])
    assert 0.0 < e <= 0.25 + 1e-9

    e, _ = eer([], [0.1])
    assert np.isnan(e)
