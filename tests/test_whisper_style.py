"""Whisper-style encoder-decoder family tests."""
import jax
import jax.numpy as jnp
import numpy as np

from audio_classification_tpu.models.asr.whisper_style import (
    WhisperStyle,
    WhisperStyleConfig,
    whisper_frontend,
)

TINY = WhisperStyleConfig(vocab_size=32, dim=32, heads=2, enc_layers=1,
                          dec_layers=1, max_decode_len=12)


def test_teacher_forcing_shapes():
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32) * 0.1)
    feats, mask = whisper_frontend(wav, jnp.asarray([8000, 4000]), TINY)
    model = WhisperStyle(TINY)
    tokens = jnp.zeros((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tokens)
    logits = model.apply(params, feats, mask, tokens)
    assert logits.shape == (2, 6, 32)


def test_greedy_decode_shapes_and_eos():
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32) * 0.1)
    feats, mask = whisper_frontend(wav, jnp.asarray([8000, 4000]), TINY)
    model = WhisperStyle(TINY)
    params = model.init(jax.random.PRNGKey(0), feats, mask, method=WhisperStyle.greedy_decode)
    ids, counts = model.apply(params, feats, mask, method=WhisperStyle.greedy_decode)
    assert ids.shape == (2, TINY.max_decode_len - 1)
    c = np.asarray(counts)
    assert (c >= 0).all() and (c <= TINY.max_decode_len - 1).all()
    # once EOS fires everything after stays EOS
    for b in range(2):
        row = np.asarray(ids[b])
        if (row == TINY.eos_id).any():
            first = int(np.argmax(row == TINY.eos_id))
            assert (row[first:] == TINY.eos_id).all()


def test_engine_whisper_family():
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    cfg = Overlap3Config(preset="tiny", seed=0)
    cfg.whisper_encoder = "builtin"  # dynamic attr, mirrors sp-id CLI flag
    engine = build_engine(cfg)
    assert engine.pack.asr_family == "whisper"
    texts = engine.transcribe([np.zeros(4000, np.float32)])
    assert len(texts) == 1 and isinstance(texts[0], str)
