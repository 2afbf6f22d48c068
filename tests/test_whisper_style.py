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


def test_greedy_decode_max_len_override():
    """max_len scales the decode budget without touching params (long-form:
    engine/runtime.transcribe_long) — same checkpoint, longer scan, and the
    emitted prefix matches the default-budget decode."""
    wav = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8000)).astype(np.float32) * 0.1)
    feats, mask = whisper_frontend(wav, jnp.asarray([8000]), TINY)
    model = WhisperStyle(TINY)
    params = model.init(jax.random.PRNGKey(0), feats, mask, method=WhisperStyle.greedy_decode)
    ids, counts = model.apply(params, feats, mask, method=WhisperStyle.greedy_decode)
    ids_long, counts_long = model.apply(params, feats, mask, 3 * TINY.max_decode_len,
                                        method=WhisperStyle.greedy_decode)
    assert ids_long.shape == (1, 3 * TINY.max_decode_len - 1)
    short = TINY.max_decode_len - 1
    # the greedy path is deterministic: the long budget reproduces the short
    # budget's tokens as its prefix (EOS-padded identically)
    np.testing.assert_array_equal(np.asarray(ids)[:, :short],
                                  np.asarray(ids_long)[:, :short])
    assert int(counts_long[0]) >= int(counts[0])


def test_kv_cache_matches_full_recompute():
    """Cached greedy decode must equal argmax decoding with full-prefix
    teacher-forcing logits (the KV cache is an optimization, not a change
    in semantics)."""
    wav = jnp.asarray(np.random.default_rng(3).standard_normal((2, 8000)).astype(np.float32) * 0.1)
    feats, mask = whisper_frontend(wav, jnp.asarray([8000, 5000]), TINY)
    model = WhisperStyle(TINY)
    params = model.init(jax.random.PRNGKey(0), feats, mask, method=WhisperStyle.greedy_decode)
    ids_cached, counts = model.apply(params, feats, mask, method=WhisperStyle.greedy_decode)

    # reference: greedy via repeated full decode_logits
    l = TINY.max_decode_len
    tokens = np.full((2, l), TINY.eos_id, np.int32)
    tokens[:, 0] = TINY.bos_id
    done = np.zeros(2, bool)
    for i in range(l - 1):
        logits = model.apply(params, feats, mask, jnp.asarray(tokens))
        nxt = np.asarray(jnp.argmax(logits[:, i], axis=-1)).astype(np.int32)
        nxt = np.where(done, TINY.eos_id, nxt)
        tokens[:, i + 1] = nxt
        done = done | (nxt == TINY.eos_id)
    np.testing.assert_array_equal(np.asarray(ids_cached), tokens[:, 1:])


def test_engine_whisper_family():
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    cfg = Overlap3Config(preset="tiny", seed=0)
    cfg.whisper_encoder = "builtin"  # dynamic attr, mirrors sp-id CLI flag
    engine = build_engine(cfg)
    assert engine.pack.asr_family == "whisper"
    texts = engine.transcribe([np.zeros(4000, np.float32)])
    assert len(texts) == 1 and isinstance(texts[0], str)
