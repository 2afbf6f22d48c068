"""PyanNet (pyannote segmentation arch) import + numerics tests.

The oracle is a REAL torch forward: conv/instance-norm/max-pool/LSTM/linear
stages run through genuine torch modules (the same ops pyannote's PyanNet
composes, reference: src/osd/osd.py:60-71), fed from a state dict using
pyannote's parameter naming. The sinc filterbank — whose filters are
synthesized from band edges, not stored — is re-derived in numpy
independently of the JAX implementation.
"""
import numpy as np
import pytest

from audio_classification_tpu.engine import ModelPack, StageEngine, tiny_preset
from audio_classification_tpu.models.pyannet import (
    PyanNet, PyanNetConfig, init_pyannet_params, reduce_overlap_channels,
)

TINY = PyanNetConfig(
    sample_rate=8000, n_filters=8, kernel_size=31, stride=5,
    analytic=True, conv_channels=(6, 6), conv_kernel=5, pool=3,
    lstm_hidden=16, lstm_layers=2, bidirectional=True,
    linear_dims=(16,), num_classes=3,
)


def _numpy_sinc_filters(cfg, low_hz, band_hz):
    """Independent numpy re-derivation of SincConv_fast / ParamSincFB."""
    k, sr = cfg.kernel_size, cfg.sample_rate
    half = (k - 1) // 2
    low = cfg.min_low_hz + np.abs(low_hz)
    high = np.clip(low + cfg.min_band_hz + np.abs(band_hz), cfg.min_low_hz, sr / 2)
    band = (high - low)[:, 0]
    n_lin = np.linspace(0.0, k / 2 - 1, k // 2)
    window = 0.54 - 0.46 * np.cos(2 * np.pi * n_lin / k)
    n_ = 2 * np.pi * np.arange(-half, 0, dtype=np.float64)[None, :] / sr
    ftl, fth = low @ n_, high @ n_
    left_c = ((np.sin(fth) - np.sin(ftl)) / (n_ / 2)) * window
    norm = 2 * band[:, None]
    cos_f = np.concatenate([left_c, norm, left_c[:, ::-1]], axis=1) / norm
    if not cfg.analytic:
        return cos_f.astype(np.float32)
    left_s = ((np.cos(ftl) - np.cos(fth)) / (n_ / 2)) * window
    sin_f = np.concatenate(
        [left_s, np.zeros_like(norm), -left_s[:, ::-1]], axis=1) / norm
    return np.concatenate([cos_f, sin_f], axis=0).astype(np.float32)


def _random_state_dict(cfg, rng):
    """pyannote-named tensors for the TINY config."""
    rows = cfg.n_filters // 2 if cfg.analytic else cfg.n_filters
    sd = {
        "sincnet.wav_norm1d.weight": rng.randn(1) * 0.2 + 1.0,
        "sincnet.wav_norm1d.bias": rng.randn(1) * 0.1,
        "sincnet.conv1d.0.filterbank.low_hz_": rng.uniform(20, 900, (rows, 1)),
        "sincnet.conv1d.0.filterbank.band_hz_": rng.uniform(20, 400, (rows, 1)),
        "sincnet.norm1d.0.weight": rng.randn(cfg.n_filters) * 0.2 + 1.0,
        "sincnet.norm1d.0.bias": rng.randn(cfg.n_filters) * 0.1,
    }
    cin = cfg.n_filters
    for i, ch in enumerate(cfg.conv_channels, start=1):
        sd[f"sincnet.conv1d.{i}.weight"] = rng.randn(ch, cin, cfg.conv_kernel) * 0.2
        sd[f"sincnet.conv1d.{i}.bias"] = rng.randn(ch) * 0.1
        sd[f"sincnet.norm1d.{i}.weight"] = rng.randn(ch) * 0.2 + 1.0
        sd[f"sincnet.norm1d.{i}.bias"] = rng.randn(ch) * 0.1
        cin = ch
    h = cfg.lstm_hidden
    for layer in range(cfg.lstm_layers):
        in_dim = cin if layer == 0 else 2 * h
        for sfx in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{layer}{sfx}"] = rng.randn(4 * h, in_dim) * 0.2
            sd[f"lstm.weight_hh_l{layer}{sfx}"] = rng.randn(4 * h, h) * 0.2
            sd[f"lstm.bias_ih_l{layer}{sfx}"] = rng.randn(4 * h) * 0.1
            sd[f"lstm.bias_hh_l{layer}{sfx}"] = rng.randn(4 * h) * 0.1
    cin = 2 * h
    for j, dim in enumerate(cfg.linear_dims):
        sd[f"linear.{j}.weight"] = rng.randn(dim, cin) * 0.2
        sd[f"linear.{j}.bias"] = rng.randn(dim) * 0.1
        cin = dim
    sd["classifier.weight"] = rng.randn(cfg.num_classes, cin) * 0.2
    sd["classifier.bias"] = rng.randn(cfg.num_classes) * 0.1
    return {k: v.astype(np.float32) for k, v in sd.items()}


def _torch_forward(cfg, sd, wav):
    """Genuine torch PyanNet forward (modules, not our math)."""
    import torch
    import torch.nn.functional as F

    tt = {k: torch.from_numpy(v) for k, v in sd.items()}
    x = torch.from_numpy(wav).unsqueeze(1)                   # [B, 1, T]
    x = F.instance_norm(x, weight=tt["sincnet.wav_norm1d.weight"],
                        bias=tt["sincnet.wav_norm1d.bias"], eps=1e-5)
    filt = torch.from_numpy(_numpy_sinc_filters(
        cfg, sd["sincnet.conv1d.0.filterbank.low_hz_"],
        sd["sincnet.conv1d.0.filterbank.band_hz_"]))[:, None, :]
    x = F.conv1d(x, filt, stride=cfg.stride)
    x = torch.abs(x)
    x = F.max_pool1d(x, cfg.pool)
    x = F.leaky_relu(F.instance_norm(
        x, weight=tt["sincnet.norm1d.0.weight"],
        bias=tt["sincnet.norm1d.0.bias"], eps=1e-5))
    for i in range(1, 1 + len(cfg.conv_channels)):
        x = F.conv1d(x, tt[f"sincnet.conv1d.{i}.weight"],
                     tt[f"sincnet.conv1d.{i}.bias"])
        x = F.max_pool1d(x, cfg.pool)
        x = F.leaky_relu(F.instance_norm(
            x, weight=tt[f"sincnet.norm1d.{i}.weight"],
            bias=tt[f"sincnet.norm1d.{i}.bias"], eps=1e-5))
    x = x.transpose(1, 2)                                    # [B, T', F]
    lstm = torch.nn.LSTM(x.shape[2], cfg.lstm_hidden, cfg.lstm_layers,
                         batch_first=True, bidirectional=True)
    with torch.no_grad():
        for layer in range(cfg.lstm_layers):
            for sfx in ("", "_reverse"):
                for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                    name = f"{part}_l{layer}{sfx}"
                    getattr(lstm, name).copy_(tt[f"lstm.{name}"])
        x, _ = lstm(x)
        for j in range(len(cfg.linear_dims)):
            x = F.leaky_relu(F.linear(x, tt[f"linear.{j}.weight"],
                                      tt[f"linear.{j}.bias"]))
        x = torch.sigmoid(F.linear(x, tt["classifier.weight"],
                                   tt["classifier.bias"]))
    return x.numpy()


def _save_ckpt(tmp_path, sd, nested: bool):
    import torch

    path = tmp_path / ("pl.ckpt" if nested else "pytorch_model.bin")
    tensors = {k: torch.from_numpy(v) for k, v in sd.items()}
    obj = {"state_dict": tensors} if nested else tensors
    torch.save(obj, str(path))
    return str(path)


@pytest.mark.slow
def test_torch_forward_parity(tmp_path):
    from audio_classification_tpu.models.convert.torch_import import load_pyannet_torch

    rng = np.random.RandomState(0)
    sd = _random_state_dict(TINY, rng)
    path = _save_ckpt(tmp_path, sd, nested=True)
    cfg, params = load_pyannet_torch(path, sample_rate=TINY.sample_rate,
                                     kernel_size=TINY.kernel_size,
                                     stride=TINY.stride)
    assert cfg == TINY

    wav = (0.3 * rng.randn(2, 4000)).astype(np.float32)
    want = _torch_forward(TINY, sd, wav)
    got = np.asarray(PyanNet(cfg).apply(
        params, wav, np.full(2, wav.shape[1], np.int32)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_import_infers_config_non_analytic(tmp_path):
    from audio_classification_tpu.models.convert.torch_import import load_pyannet_torch

    cfg_na = PyanNetConfig(
        sample_rate=8000, n_filters=8, kernel_size=31, stride=5,
        analytic=False, conv_channels=(6,), conv_kernel=5, pool=3,
        lstm_hidden=16, lstm_layers=1, bidirectional=True,
        linear_dims=(16, 16), num_classes=2,
    )
    rng = np.random.RandomState(1)
    sd = _random_state_dict(cfg_na, rng)
    path = _save_ckpt(tmp_path, sd, nested=False)
    cfg, params = load_pyannet_torch(path, sample_rate=8000,
                                     kernel_size=31, stride=5)
    assert cfg == cfg_na
    assert not cfg.analytic and cfg.lstm_layers == 1
    assert len(params["lstm"]) == 1 and "bw" in params["lstm"][0]


def test_padded_vs_solo():
    """Batch padding must not leak — incl. through the backward LSTM."""
    import jax

    model = PyanNet(TINY)
    params = init_pyannet_params(TINY, seed=3)
    rng = np.random.RandomState(4)
    w1 = (0.3 * rng.randn(4000)).astype(np.float32)
    w2 = (0.3 * rng.randn(2600)).astype(np.float32)
    t = 4000
    batch = np.zeros((2, t), np.float32)
    batch[0] = w1
    batch[1, : len(w2)] = w2
    lens = np.asarray([len(w1), len(w2)], np.int32)
    out = np.asarray(jax.jit(model.apply)(params, batch, lens))
    solo2 = np.asarray(model.apply(params, w2[None], lens[1:]))
    n2 = int(TINY.out_frames(len(w2)))
    np.testing.assert_allclose(out[1, :n2], solo2[0, :n2], atol=2e-5, rtol=1e-4)
    # padding region must be exactly zero
    assert np.all(out[1, n2:] == 0.0)


@pytest.mark.slow
def test_out_frames_matches_forward():
    model = PyanNet(TINY)
    params = init_pyannet_params(TINY, seed=5)
    for n in (2000, 3001, 4000):
        wav = np.zeros((1, n), np.float32)
        out = model.apply(params, wav, np.asarray([n], np.int32))
        # forward runs on the full (unpadded) length: frame count must match
        assert out.shape[1] == int(TINY.out_frames(n))


def test_reduce_overlap_channels():
    probs = np.asarray([[[0.9, 0.2, 0.7], [0.1, 0.05, 0.02]]], np.float32)
    red = np.asarray(reduce_overlap_channels(probs))
    np.testing.assert_allclose(red[0, 0], [0.9, 0.7], atol=1e-6)
    np.testing.assert_allclose(red[0, 1], [0.1, 0.05], atol=1e-6)


def test_hysteresis_intervals():
    from audio_classification_tpu.models.pyannet import (
        BinarizeConfig, hysteresis_intervals,
    )

    fs = 0.1
    probs = np.array([0.1, 0.6, 0.7, 0.4, 0.45, 0.8, 0.2, 0.1, 0.9, 0.05])
    iv = hysteresis_intervals(probs, fs, BinarizeConfig(onset=0.5, offset=0.3))
    # opens at frame 1, survives the 0.4/0.45 dip (above offset), closes at
    # frame 6; a second short region at frame 8
    assert len(iv) == 2
    np.testing.assert_allclose(iv[0], (0.15, 0.65), atol=1e-9)
    np.testing.assert_allclose(iv[1], (0.85, 0.95), atol=1e-9)
    iv2 = hysteresis_intervals(
        probs, fs, BinarizeConfig(onset=0.5, offset=0.3, min_duration_off=0.3))
    assert len(iv2) == 1 and abs(iv2[0][1] - 0.95) < 1e-9  # gap filled
    iv3 = hysteresis_intervals(
        probs, fs, BinarizeConfig(onset=0.5, offset=0.3, min_duration_on=0.2))
    assert len(iv3) == 1  # 0.1 s region pruned


def test_build_engine_pyannet_hysteresis(tmp_path):
    """--osd-checkpoint (torch) + --osd-onset wire BinarizeConfig through."""
    import dataclasses

    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    cfg16 = dataclasses.replace(TINY, sample_rate=16000)
    sd = _random_state_dict(cfg16, np.random.RandomState(9))
    path = _save_ckpt(tmp_path, sd, nested=True)
    cfg = Overlap3Config(preset="tiny", seed=0, max_batch=2,
                         osd_checkpoint=path, osd_onset=0.6, osd_min_off=0.2)
    eng = build_engine(cfg)
    bz = eng.pack.osd_binarize
    assert bz is not None and bz.onset == 0.6
    assert bz.offset == 0.5 and bz.min_duration_off == 0.2  # defaults kept
    # kernel/stride come from args (not stored in the ckpt): pyannote 251/10
    assert eng.pack.osd_pyannet.cfg.kernel_size == 251
    wav = (0.3 * np.random.RandomState(10).randn(16000)).astype(np.float32)
    segs = eng.osd_segments_batch([wav], 16000, 0.5, 0.5, 0.1)
    assert segs[0] and segs[0][0][0] == 0.0


def test_engine_osd_pyannet_segments():
    """End-to-end: PyanNet-backed OSD stage through the engine."""
    cfg = PyanNetConfig(
        sample_rate=16000, n_filters=8, kernel_size=31, stride=10,
        analytic=True, conv_channels=(6,), conv_kernel=5, pool=3,
        lstm_hidden=8, lstm_layers=1, bidirectional=True,
        linear_dims=(8,), num_classes=3,
    )
    pack = ModelPack(tiny_preset(), seed=0)
    pack.set_osd_pyannet(cfg, init_pyannet_params(cfg, seed=7))
    eng = StageEngine(pack)
    rng = np.random.RandomState(8)
    wavs = [(0.3 * rng.randn(16000)).astype(np.float32),
            (0.3 * rng.randn(9000)).astype(np.float32)]
    segs = eng.osd_segments_batch(wavs, 16000, threshold=0.5,
                                  win_sec=0.5, hop_sec=0.1)
    assert len(segs) == 2
    for s, wav in zip(segs, wavs):
        assert s, "segments must cover the utterance"
        assert s[0][0] == 0.0
        assert abs(s[-1][1] - len(wav) / 16000) < 1e-6
        for a, b, is_ov in s:
            assert b > a and isinstance(is_ov, (bool, np.bool_))


def test_pyannet_to_onnx_cli(tmp_path):
    """convert_models --pyannet-to-onnx: a pyannote torch checkpoint becomes
    a standard ONNX file whose forward matches the in-framework PyanNet."""
    from audio_classification_tpu.cli.convert_models import main as cm_main
    from audio_classification_tpu.models.convert.onnx_exec import OnnxModel
    from audio_classification_tpu.models.convert.torch_import import (
        load_pyannet_torch)

    rng = np.random.RandomState(5)
    sd = _random_state_dict(TINY, rng)
    ckpt = _save_ckpt(tmp_path, sd, nested=True)
    onnx_path = str(tmp_path / "pn.onnx")
    # TINY is 8 kHz/31-tap; loader infers arch from shapes given sr/kernel/
    # stride hints — the CLI uses defaults, so load explicitly and export
    # via the same path the CLI wraps, then exercise the CLI on defaults
    cfg, params = load_pyannet_torch(ckpt, sample_rate=TINY.sample_rate,
                                     kernel_size=TINY.kernel_size,
                                     stride=TINY.stride)
    from audio_classification_tpu.models.convert.onnx_export import (
        export_pyannet)

    samples = 4000
    export_pyannet(params, cfg, onnx_path, samples=samples)

    import jax.numpy as jnp

    wav = (0.3 * rng.randn(2, samples)).astype(np.float32)
    ref = np.asarray(PyanNet(cfg).apply(params, jnp.asarray(wav),
                                        jnp.asarray([samples, samples])))
    got = np.asarray(OnnxModel(onnx_path)(wav=jnp.asarray(wav))["probs"])
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 2e-4

    # the CLI wrapper end-to-end (16 kHz defaults match pyannote ckpts)
    sd16 = _random_state_dict(PyanNetConfig(), np.random.RandomState(6))
    ckpt16 = tmp_path / "pl16.ckpt"
    import torch

    torch.save({"state_dict": {k: torch.from_numpy(v)
                               for k, v in sd16.items()}}, str(ckpt16))
    out16 = str(tmp_path / "pn16.onnx")
    cm_main(["--pyannet-to-onnx", str(ckpt16), "--onnx-out", out16,
             "--seconds", "0.5"])
    om = OnnxModel(out16)
    assert om.graph.input_names == ["wav"]
