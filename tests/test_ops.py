"""Signal-op tests vs independent numpy/scipy references."""
import numpy as np
import pytest

import jax.numpy as jnp

from audio_classification_tpu.ops import (
    FbankConfig,
    apply_lfr,
    frame_rms,
    frame_signal,
    istft,
    l2norm,
    log_mel_fbank,
    mel_filterbank_np,
    num_frames,
    overlap_add,
    peak_limit,
    resample_linear,
    resample_poly,
    stft,
    window,
)


def _sig(n=4000, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1333 * t)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


# ---------------------------------------------------------------- framing


def test_num_frames_kaldi_semantics():
    assert num_frames(400, 400, 160) == 1
    assert num_frames(399, 400, 160) == 0
    assert num_frames(560, 400, 160) == 2
    assert num_frames(16000, 400, 160) == 98


def test_frame_signal_values():
    x = np.arange(20, dtype=np.float32)
    f = np.asarray(frame_signal(jnp.asarray(x), 8, 4))
    assert f.shape == (4, 8)
    np.testing.assert_array_equal(f[0], x[:8])
    np.testing.assert_array_equal(f[2], x[8:16])


def test_window_povey_is_hann_pow():
    h = np.asarray(window("hann", 400))
    p = np.asarray(window("povey", 400))
    np.testing.assert_allclose(p, h**0.85, rtol=1e-5)


# ---------------------------------------------------------------- stft


def test_stft_matches_numpy_rfft():
    x = _sig(2048)
    re, im = stft(jnp.asarray(x), n_fft=512, frame_length=400, frame_shift=160, win="hann")
    re, im = np.asarray(re), np.asarray(im)
    # independent reference
    w = np.hanning(400).astype(np.float32)  # np.hanning == symmetric hann
    n = 1 + (2048 - 400) // 160
    for i in range(n):
        fr = x[i * 160 : i * 160 + 400] * w
        ref = np.fft.rfft(fr, 512)
        np.testing.assert_allclose(re[i], ref.real, atol=2e-2)
        np.testing.assert_allclose(im[i], ref.imag, atol=2e-2)


def test_stft_istft_roundtrip():
    x = _sig(3200)
    re, im = stft(jnp.asarray(x), n_fft=512, frame_length=512, frame_shift=128)
    y = np.asarray(istft(re, im, n_fft=512, frame_length=512, frame_shift=128, length=3200))
    # interior reconstruction (edges lack full overlap)
    np.testing.assert_allclose(y[512:-512], x[512:-512], atol=1e-3)


def test_overlap_add():
    frames = jnp.ones((3, 4))
    y = np.asarray(overlap_add(frames, 2))
    np.testing.assert_array_equal(y, [1, 1, 2, 2, 2, 2, 1, 1])


# ---------------------------------------------------------------- fbank


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank_np(80, 512, 16000)
    assert fb.shape == (257, 80)
    assert (fb >= 0).all()
    # every interior fft bin between low and high freq should hit >= 1 filter
    freqs = np.arange(257) * (16000 / 512)
    covered = fb.sum(axis=1) > 0
    inner = (freqs > 60) & (freqs < 7900)
    assert covered[inner].all()


def test_fbank_shapes_and_finite():
    x = _sig(16000)
    cfg = FbankConfig()
    f = np.asarray(log_mel_fbank(jnp.asarray(x), cfg))
    assert f.shape == (98, 80)
    assert np.isfinite(f).all()
    # louder signal -> larger mean log energy
    f2 = np.asarray(log_mel_fbank(jnp.asarray(x * 4.0), cfg))
    assert f2.mean() > f.mean()


def test_fbank_batched_matches_single():
    x = _sig(8000)
    y = _sig(8000, seed=3)
    batch = np.asarray(log_mel_fbank(jnp.stack([jnp.asarray(x), jnp.asarray(y)])))
    single = np.asarray(log_mel_fbank(jnp.asarray(y)))
    np.testing.assert_allclose(batch[1], single, atol=1e-3)


def test_fbank_tone_peak_bin():
    # a pure 1 kHz tone should put its energy near the 1 kHz mel bin
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    f = np.asarray(log_mel_fbank(jnp.asarray(x)))
    peak_bin = f.mean(axis=0).argmax()
    # locate which mel bin 1 kHz falls into
    fb = mel_filterbank_np(80, 512, sr)
    bin_1k = fb[int(1000 / (sr / 512))].argmax()
    assert abs(int(peak_bin) - int(bin_1k)) <= 1


def test_lfr_stacking():
    f = jnp.arange(20, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
    out = np.asarray(apply_lfr(f, lfr_m=7, lfr_n=6))
    assert out.shape == (4, 28)
    # first output frame: 3 copies of frame0 (left pad) + frames 0..3
    np.testing.assert_array_equal(out[0].reshape(7, 4)[:, 0], [0, 0, 0, 0, 1, 2, 3])


# ---------------------------------------------------------------- resample


def test_resample_poly_tone_fidelity():
    sr1, sr2 = 8000, 16000
    t = np.arange(4000) / sr1
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), sr1, sr2))
    assert y.shape[0] == 8000
    t2 = np.arange(8000) / sr2
    ref = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    # interior fidelity (edge transients excluded)
    err = np.abs(y[500:-500] - ref[500:-500]).max()
    assert err < 5e-3


def test_resample_poly_downsample_antialias():
    # energy above the new nyquist must be attenuated
    sr1, sr2 = 16000, 8000
    t = np.arange(8000) / sr1
    x = np.sin(2 * np.pi * 6000 * t).astype(np.float32)  # above 4 kHz nyquist
    y = np.asarray(resample_poly(jnp.asarray(x), sr1, sr2))
    assert y.shape[0] == 4000
    assert np.sqrt(np.mean(y[200:-200] ** 2)) < 0.02


def test_resample_poly_vs_scipy():
    from scipy.signal import resample_poly as sp_resample

    x = _sig(4000, sr=8000)
    y = np.asarray(resample_poly(jnp.asarray(x), 8000, 16000))
    ref = sp_resample(x, 2, 1)
    # different filters -> compare via correlation of interiors
    a, b = y[500:7500], ref[500:7500]
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert corr > 0.999


def test_resample_linear_matches_reference_semantics():
    x = np.arange(10, dtype=np.float32)
    y = np.asarray(resample_linear(jnp.asarray(x), 8000, 16000))
    assert y.shape[0] == 20
    ref = np.interp(np.linspace(0, 9, 20), np.arange(10), x)
    np.testing.assert_allclose(y, ref, atol=1e-5)


def test_resample_identity():
    x = jnp.asarray(_sig(1000))
    assert resample_poly(x, 16000, 16000) is x
    assert resample_linear(x, 16000, 16000) is x


# ---------------------------------------------------------------- signal


def test_l2norm_zero_safe():
    v = np.zeros(4, dtype=np.float32)
    np.testing.assert_array_equal(l2norm(v), v)
    u = np.array([3.0, 4.0], dtype=np.float32)
    np.testing.assert_allclose(l2norm(u), [0.6, 0.8])


def test_frame_rms():
    x = jnp.concatenate([jnp.zeros(400), jnp.ones(400)])
    r = np.asarray(frame_rms(x, 400, 400))
    np.testing.assert_allclose(r, [0.0, 1.0], atol=1e-5)


def test_peak_limit():
    x = jnp.asarray([0.5, -2.0])
    y = np.asarray(peak_limit(x, 0.98))
    assert abs(y).max() == pytest.approx(0.98, abs=1e-5)
    x2 = jnp.asarray([0.5, -0.7])
    np.testing.assert_allclose(np.asarray(peak_limit(x2, 0.98)), np.asarray(x2))
