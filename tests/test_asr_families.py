"""Transducer + Paraformer families: forward shapes, greedy decode, engine wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_classification_tpu.models.asr.paraformer import (
    Paraformer,
    ParaformerConfig,
    cif_integrate,
    paraformer_frontend,
    paraformer_greedy,
)
from audio_classification_tpu.models.asr.transducer import (
    Transducer,
    TransducerConfig,
    transducer_frontend,
)

TINY_T = TransducerConfig(vocab_size=16, dim=32, heads=2, layers=1, pred_dim=32,
                          joiner_dim=32, conv_kernel=3)
TINY_P = ParaformerConfig(vocab_size=16, dim=32, heads=2, enc_layers=1, dec_layers=1,
                          conv_kernel=3, max_tokens=16)


def test_cif_integrate_fires_expected_count():
    # alpha exactly 0.5 per frame over 8 frames -> 4 firings
    h = jnp.ones((1, 8, 4))
    alpha = jnp.full((1, 8), 0.5)
    tokens, counts = cif_integrate(h, alpha, max_tokens=8, threshold=1.0)
    assert int(counts[0]) == 4
    # each fired token integrates weight 1.0 of h -> vector of ones
    np.testing.assert_allclose(np.asarray(tokens[0, :4]), 1.0, atol=1e-5)
    assert np.abs(np.asarray(tokens[0, 4:])).max() < 1e-6


def test_cif_tail_fires_residual():
    h = jnp.ones((1, 4, 2))
    alpha = jnp.full((1, 4), 0.2)  # total 0.8 -> tail fire (>= 0.5)
    tokens, counts = cif_integrate(h, alpha, max_tokens=4, threshold=1.0)
    assert int(counts[0]) == 1


def test_transducer_greedy_shapes():
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 4000])
    feats, mask = transducer_frontend(wav, lengths, TINY_T)
    model = Transducer(TINY_T)
    params = model.init(jax.random.PRNGKey(0), feats, mask, method=Transducer.greedy_decode)
    ids, counts = model.apply(params, feats, mask, method=Transducer.greedy_decode)
    assert ids.shape[0] == 2
    assert (np.asarray(counts) >= 0).all()
    # emitted ids are left-packed: after `count` entries everything is blank
    for b in range(2):
        c = int(counts[b])
        assert (np.asarray(ids[b, c:]) == TINY_T.blank_id).all()


def test_transducer_training_forward():
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32) * 0.1)
    feats, mask = transducer_frontend(wav, jnp.asarray([4000]), TINY_T)
    model = Transducer(TINY_T)
    # token context windows for U=5 target positions
    tokens = jnp.zeros((1, 5, TINY_T.context), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, tokens)
    logits, out_mask = model.apply(params, feats, mask, tokens)
    assert logits.shape[0] == 1 and logits.shape[2] == 5 and logits.shape[3] == 16


def test_paraformer_forward_and_greedy():
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 5000])
    feats, mask = paraformer_frontend(wav, lengths, TINY_P)
    model = Paraformer(TINY_P)
    params = model.init(jax.random.PRNGKey(0), feats, mask)
    logits, counts = model.apply(params, feats, mask)
    assert logits.shape == (2, TINY_P.max_tokens, 16)
    ids, lens = paraformer_greedy(logits, counts)
    assert ids.shape == (2, TINY_P.max_tokens)
    assert (np.asarray(lens) <= TINY_P.max_tokens).all()


def test_transducer_beam1_equals_greedy():
    """beam=1 modified beam search is exactly the greedy argmax recursion."""
    wav = jnp.asarray(np.random.default_rng(1).standard_normal((3, 8000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 5000, 2500])
    feats, mask = transducer_frontend(wav, lengths, TINY_T)
    model = Transducer(TINY_T)
    params = model.init(jax.random.PRNGKey(0), feats, mask, method=Transducer.greedy_decode)
    g_ids, g_n = model.apply(params, feats, mask, method=Transducer.greedy_decode)
    b_ids, b_n = model.apply(params, feats, mask, 1, method=Transducer.beam_decode)
    np.testing.assert_array_equal(np.asarray(g_ids), np.asarray(b_ids))
    np.testing.assert_array_equal(np.asarray(g_n), np.asarray(b_n))


def test_transducer_beam_score_monotone_in_width():
    """A wider beam can only find a hypothesis with >= accumulated
    log-probability (no merging, so scores are directly comparable)."""
    wav = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8000)).astype(np.float32) * 0.3)
    lengths = jnp.asarray([8000, 6000])
    feats, mask = transducer_frontend(wav, lengths, TINY_T)
    model = Transducer(TINY_T)
    params = model.init(jax.random.PRNGKey(3), feats, mask, method=Transducer.greedy_decode)
    _, _, s1 = model.apply(params, feats, mask, 1, True, method=Transducer.beam_decode)
    _, _, s4 = model.apply(params, feats, mask, 4, True, method=Transducer.beam_decode)
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-4).all()


def test_transducer_beam_padded_vs_solo():
    """Padding frames can't change a sample's beam search result (mask
    freezes the beam): decoding a short utterance inside a padded batch
    matches decoding it alone at the same padded length."""
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 4000])
    feats, mask = transducer_frontend(wav, lengths, TINY_T)
    model = Transducer(TINY_T)
    params = model.init(jax.random.PRNGKey(0), feats, mask, method=Transducer.greedy_decode)
    ids_b, n_b = model.apply(params, feats, mask, 3, method=Transducer.beam_decode)
    f1, m1 = feats[1:2], mask[1:2]
    ids_s, n_s = model.apply(params, f1, m1, 3, method=Transducer.beam_decode)
    np.testing.assert_array_equal(np.asarray(ids_b[1]), np.asarray(ids_s[0]))
    assert int(n_b[1]) == int(n_s[0])


@pytest.mark.slow
def test_engine_beam_decoding_method(tmp_path):
    """decoding_method="modified_beam_search" routes the transducer stage to
    beam_decode (reference: src/model.py:47-99 passes the flag to
    sherpa-onnx); non-transducer families reject it loudly."""
    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    cfg = Overlap3Config(preset="tiny", seed=0, encoder="builtin",
                         decoding_method="modified_beam_search",
                         num_active_paths=2)
    engine = build_engine(cfg)
    assert engine.pack.decoding_method == "modified_beam_search"
    texts = engine.transcribe([np.zeros(4000, np.float32),
                               np.ones(4000, np.float32) * 0.1])
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)

    with pytest.raises(ValueError, match="transducer"):
        build_engine(Overlap3Config(preset="tiny", seed=0,
                                    decoding_method="modified_beam_search"))


@pytest.mark.parametrize("family,flag", [("transducer", "encoder"), ("paraformer", "paraformer")])
def test_engine_family_wiring(family, flag, tmp_path):
    import numpy as np

    from audio_classification_tpu.pipelines.offline_overlap3 import build_engine
    from audio_classification_tpu.utils.config import Overlap3Config

    cfg = Overlap3Config(preset="tiny", seed=0)
    setattr(cfg, flag, "builtin")
    engine = build_engine(cfg)
    assert engine.pack.asr_family == family
    texts = engine.transcribe([np.zeros(4000, np.float32), np.ones(4000, np.float32) * 0.1])
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
