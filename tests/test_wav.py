"""WAV codec round-trip tests (numpy reference path + native fast path)."""
import numpy as np
import pytest

from audio_classification_tpu.audio_io import read_wav, to_mono, write_wav
from audio_classification_tpu.audio_io import wav as wav_mod


def _sine(sr=16000, dur=0.25, hz=440.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_pcm16_roundtrip(tmp_path):
    x = _sine()
    p = tmp_path / "a.wav"
    write_wav(p, x, 16000, encoding="pcm16")
    y, sr = read_wav(p)
    assert sr == 16000
    assert y.shape == x.shape
    assert np.max(np.abs(y - x)) < 1.0 / 32000


def test_float32_roundtrip(tmp_path):
    x = _sine(sr=8000)
    p = tmp_path / "f.wav"
    write_wav(p, x, 8000, encoding="float32")
    y, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_allclose(y, x, atol=0)


def test_stereo_and_mono_fold(tmp_path):
    l = _sine(hz=440.0)
    r = _sine(hz=880.0)
    x = np.stack([l, r])
    p = tmp_path / "st.wav"
    write_wav(p, x, 16000, encoding="float32")
    y, sr = read_wav(p)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=0)
    m = to_mono(y)
    np.testing.assert_allclose(m, (l + r) / 2, atol=1e-7)


def test_always_2d(tmp_path):
    x = _sine()
    p = tmp_path / "m.wav"
    write_wav(p, x, 16000)
    y, _ = read_wav(p, always_2d=True)
    assert y.shape == (1, x.shape[0])


def test_pcm24_decode(tmp_path):
    # hand-construct a 24-bit PCM file through the private writer-less path
    x = _sine(dur=0.01)
    ints = np.rint(np.clip(x, -1, 1) * 8388607).astype(np.int32)
    b = np.zeros((ints.size, 3), dtype=np.uint8)
    u = ints.astype(np.uint32)
    b[:, 0] = u & 0xFF
    b[:, 1] = (u >> 8) & 0xFF
    b[:, 2] = (u >> 16) & 0xFF
    payload = b.tobytes()
    import struct

    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE" + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000 * 3, 3, 24)
        + b"data" + struct.pack("<I", len(payload))
    )
    p = tmp_path / "p24.wav"
    p.write_bytes(hdr + payload)
    y, sr = read_wav(p)
    assert sr == 16000
    assert np.max(np.abs(y - x)) < 1e-4


def test_numpy_fallback_matches_native(tmp_path, monkeypatch):
    x = _sine()
    p = tmp_path / "n.wav"
    write_wav(p, x, 16000, encoding="pcm16")
    y_native, _ = read_wav(p)
    monkeypatch.setattr(wav_mod, "_NATIVE_LIB", None)
    monkeypatch.setattr(wav_mod, "_NATIVE_TRIED", True)
    y_np, _ = read_wav(p)
    np.testing.assert_array_equal(y_native, y_np)


def test_truncated_file_decodes_prefix_only(tmp_path):
    x = _sine()
    p = tmp_path / "t.wav"
    write_wav(p, x, 16000, encoding="pcm16")
    trunc = tmp_path / "trunc.wav"
    trunc.write_bytes(p.read_bytes()[:144])  # 44-byte header + 100 bytes = 50 samples
    y, _ = read_wav(trunc)
    assert y.shape[0] == 50
    assert np.max(np.abs(y - x[:50])) < 1.0 / 32000


def test_bad_file_raises(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav at all")
    with pytest.raises(ValueError):
        read_wav(p)


def test_corrupt_giant_data_size_is_clamped(tmp_path):
    # A streaming-style header declaring csize=0xFFFFFFFF must not trigger a
    # multi-GB allocation; decode is bounded by the actual file size.
    import struct

    x = _sine(dur=0.01)
    pcm = np.rint(np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE" + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFFF)
    )
    p = tmp_path / "giant.wav"
    p.write_bytes(hdr + pcm)
    y, sr = read_wav(p)
    assert sr == 16000
    assert y.shape[0] == x.shape[0]
    assert np.max(np.abs(y - x)) < 1.0 / 32000


def test_pcm16_write_paths_byte_identical(tmp_path, monkeypatch):
    # Native and numpy pcm16 writers must round identically (half-to-even) so
    # the same float input yields byte-identical files either way.
    rng = np.random.default_rng(7)
    # include exact .5-LSB cases where the rounding rules differ
    x = np.concatenate([
        rng.uniform(-1, 1, 1000).astype(np.float32),
        np.array([0.5 / 32767, -0.5 / 32767, 1.5 / 32767, -1.5 / 32767], np.float32),
    ])
    p_nat = tmp_path / "nat.wav"
    p_np = tmp_path / "np.wav"
    if wav_mod._native_lib() is None:
        pytest.skip("native wavcodec not built")
    write_wav(p_nat, x, 16000, encoding="pcm16")
    monkeypatch.setattr(wav_mod, "_NATIVE_LIB", None)
    monkeypatch.setattr(wav_mod, "_NATIVE_TRIED", True)
    write_wav(p_np, x, 16000, encoding="pcm16")
    assert p_nat.read_bytes() == p_np.read_bytes()
