"""Pallas fused fbank kernel vs the XLA oracle (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_classification_tpu.ops import FbankConfig, log_mel_fbank
from audio_classification_tpu.ops.frames import frame_signal, window
from audio_classification_tpu.ops.pallas.fbank_kernel import fbank_power_mel_pallas


def _windowed_frames(x, cfg):
    xf = jnp.asarray(x, jnp.float32) * 32768.0
    fr = frame_signal(xf, cfg.frame_length, cfg.frame_shift)
    fr = fr - jnp.mean(fr, -1, keepdims=True)
    fr = jnp.concatenate(
        [fr[..., :1] * (1 - cfg.preemph), fr[..., 1:] - cfg.preemph * fr[..., :-1]], -1
    )
    fr = fr * window(cfg.window, cfg.frame_length)
    pad = [(0, 0)] * (fr.ndim - 1) + [(0, cfg.n_fft - cfg.frame_length)]
    return jnp.pad(fr, pad)


@pytest.mark.parametrize("n", [16000, 4000])
def test_pallas_fbank_matches_xla(n):
    cfg = FbankConfig()
    rng = np.random.default_rng(0)
    t = np.arange(n) / cfg.sample_rate
    x = (0.3 * np.sin(2 * np.pi * 523 * t) + 0.01 * rng.standard_normal(n)).astype(np.float32)
    ref = np.asarray(log_mel_fbank(jnp.asarray(x), cfg, use_pallas=False))
    fr = _windowed_frames(x, cfg)
    out = np.asarray(fbank_power_mel_pallas(
        fr, cfg.n_fft, cfg.num_bins, cfg.sample_rate, cfg.low_freq,
        cfg.high_freq, cfg.log_floor, interpret=True))
    assert out.shape == ref.shape
    # active bins (well above the log floor) must match tightly; near-silent
    # bins suffer cancellation noise in f32 and only need loose agreement
    active = ref > ref.max() - 25.0  # within 25 nats of the peak
    assert np.abs(out[active] - ref[active]).max() < 0.05
    assert np.abs(out - ref).max() < 1.0


def test_pallas_fbank_batched():
    cfg = FbankConfig()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    fr = _windowed_frames(x, cfg)
    out = np.asarray(fbank_power_mel_pallas(
        fr, cfg.n_fft, cfg.num_bins, cfg.sample_rate, cfg.low_freq,
        cfg.high_freq, cfg.log_floor, interpret=True))
    ref = np.asarray(log_mel_fbank(jnp.asarray(x), cfg, use_pallas=False))
    assert out.shape == ref.shape
    active = ref > ref.max() - 25.0
    assert np.abs(out[active] - ref[active]).max() < 0.05


def test_choose_tile_vmem_admission():
    """Default config keeps the full 512 tile; the wide 64 ms/128-mel
    frontend shrinks (Mosaic double-buffers operand blocks — tile 512
    measured 19.5 MiB demanded vs the 16 MiB scoped budget); monster
    configs are inadmissible -> dispatcher falls back to XLA."""
    from audio_classification_tpu.ops.pallas.fbank_kernel import choose_tile

    assert choose_tile(512, 80) == 512
    wide = choose_tile(1024, 128)
    assert wide is not None and wide < 512
    assert choose_tile(2048, 256) is None


def test_wide_frontend_matches_xla():
    """64 ms / 128-mel config (quality-gate recognizer frontend) through the
    fused kernel at its shrunken tile == the XLA oracle."""
    cfg = FbankConfig(frame_length_ms=64.0, num_bins=128)
    rng = np.random.default_rng(2)
    n = 8000
    t = np.arange(n) / cfg.sample_rate
    x = (0.3 * np.sin(2 * np.pi * 523 * t) + 0.01 * rng.standard_normal(n)).astype(np.float32)
    ref = np.asarray(log_mel_fbank(jnp.asarray(x), cfg, use_pallas=False))
    fr = _windowed_frames(x, cfg)
    out = np.asarray(fbank_power_mel_pallas(
        fr, cfg.n_fft, cfg.num_bins, cfg.sample_rate, cfg.low_freq,
        cfg.high_freq, cfg.log_floor, interpret=True))
    assert out.shape == ref.shape
    active = ref > ref.max() - 25.0
    assert np.abs(out[active] - ref[active]).max() < 0.05


def test_inadmissible_config_dispatches_to_xla():
    """log_mel_fbank(use_pallas=True) on an over-budget config must not
    raise — the dispatcher's admission check routes it to the XLA path."""
    cfg = FbankConfig(frame_length_ms=128.0, num_bins=256)
    x = np.zeros(4000, np.float32)
    out = np.asarray(log_mel_fbank(jnp.asarray(x), cfg, use_pallas=True))
    ref = np.asarray(log_mel_fbank(jnp.asarray(x), cfg, use_pallas=False))
    assert np.allclose(out, ref)
