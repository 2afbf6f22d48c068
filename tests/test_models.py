"""Model-zoo tests: shapes, masking exactness, decode semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_classification_tpu.models import (
    ConvTasNet,
    ConvTasNetConfig,
    MossFormer,
    MossFormerConfig,
    OSDConfig,
    OSDNet,
    SpeakerBank,
    SpeakerEmbedder,
    SpeakerEmbedderConfig,
    VADConfig,
    VADNet,
    VoiceActivityDetector,
    probs_to_hop_flags,
)
from audio_classification_tpu.models.asr.ctc import ctc_greedy_decode
from audio_classification_tpu.models.asr.sensevoice import (
    SenseVoiceConfig,
    SenseVoiceEncoder,
    sensevoice_frontend,
)
from audio_classification_tpu.models.asr.tokens import TokenTable
from audio_classification_tpu.ops import FbankConfig, log_mel_fbank

TINY_TASNET = ConvTasNetConfig(n_src=3, enc_dim=64, enc_kernel=16, bottleneck=32,
                               hidden=64, n_blocks=2, n_repeats=2)


def test_convtasnet_shapes_and_mask():
    model = ConvTasNet(TINY_TASNET)
    rng = np.random.default_rng(0)
    t = 4000
    wav = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32))
    mask = jnp.asarray(np.stack([np.arange(t) < 3000, np.ones(t)]).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), wav, mask)
    out = model.apply(params, wav, mask)
    assert out.shape == (2, 3, t)
    # padded region of item 0 must be exactly zero
    assert np.abs(np.asarray(out[0, :, 3000:])).max() == 0.0


def test_convtasnet_padded_equals_unpadded():
    # a segment alone vs inside a padded batch must produce identical output
    model = ConvTasNet(TINY_TASNET)
    rng = np.random.default_rng(1)
    short = rng.standard_normal(2000).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)), jnp.ones((1, 2000)))
    solo = model.apply(params, jnp.asarray(short)[None], jnp.ones((1, 2000)))
    padded_wav = np.zeros((1, 3200), np.float32)
    padded_wav[0, :2000] = short
    m = (np.arange(3200) < 2000).astype(np.float32)[None]
    packed = model.apply(params, jnp.asarray(padded_wav), jnp.asarray(m))
    np.testing.assert_allclose(
        np.asarray(packed[0, :, :2000]), np.asarray(solo[0]), atol=2e-4
    )


def test_mossformer_shapes():
    cfg = MossFormerConfig(n_src=2, enc_dim=64, dim=48, qk_dim=32, layers=2)
    model = MossFormer(cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1600)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(params, wav)
    assert out.shape == (1, 2, 1600)
    assert np.isfinite(np.asarray(out)).all()


def test_osdnet_output():
    cfg = OSDConfig(dim=64, heads=2, layers=1)
    model = OSDNet(cfg)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 100, 80)).astype(np.float32))
    fmask = jnp.asarray(np.stack([np.arange(100) < 60, np.ones(100)]).astype(bool))
    params = model.init(jax.random.PRNGKey(0), feats, fmask)
    probs = model.apply(params, feats, fmask)
    assert probs.shape == (2, 25, 2)
    p = np.asarray(probs)
    assert ((p >= 0) & (p <= 1)).all()
    # masked-out frames are zeroed
    assert p[0, 15:].max() == 0.0


def test_probs_to_hop_flags():
    probs = np.array([0.1, 0.9, 0.95, 0.2, 0.1])
    flags = probs_to_hop_flags(probs, 5, dur=0.2, out_frame_sec=0.04,
                               threshold=0.5, win_sec=0.1, hop_sec=0.02)
    # overlap interval is [0.04, 0.12); grid points >= s - win/2
    assert flags.any()
    centers = np.arange(len(flags)) * 0.02
    assert not flags[centers > 0.13].any()


def test_speaker_embedder_and_bank():
    cfg = SpeakerEmbedderConfig(channels=(8, 16), embed_dim=32)
    model = SpeakerEmbedder(cfg)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 80, 80)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats)
    emb = model.apply(params, feats)
    assert emb.shape == (2, 32)

    bank = SpeakerBank(32)
    rng = np.random.default_rng(0)
    v1, v2 = rng.standard_normal(32), rng.standard_normal(32)
    assert bank.add("alice", v1)
    assert bank.add("bob", v2)
    assert not bank.add("alice", v1)  # duplicate name
    assert bank.search(v1, threshold=0.9) == "alice"
    assert bank.search(rng.standard_normal(32), threshold=0.99) == ""
    res = bank.search_batch(np.stack([v1, v2]), threshold=0.9)
    assert [r[0] for r in res] == ["alice", "bob"]
    assert res[0][1] == pytest.approx(1.0, abs=1e-5)


def test_speaker_bank_mesh_sharded_matches_single():
    """A mesh-row-sharded bank returns the same scores/top-1 as the
    single-device bank — XLA partitions the search matmul from the
    NamedSharding; semantics stay exact."""
    from audio_classification_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((13, 32)).astype(np.float32)  # 13 % 8 != 0:
    mesh = make_mesh(8, model_axis=1)       # exercises the zero-row padding
    plain, sharded = SpeakerBank(32), SpeakerBank(32, mesh=mesh)
    for i, v in enumerate(vecs):
        plain.add(f"s{i}", v)
        sharded.add(f"s{i}", v)
    queries = rng.standard_normal((5, 32)).astype(np.float32)
    a = np.asarray(plain.scores(jnp.asarray(queries)))
    b = np.asarray(sharded.scores(jnp.asarray(queries)))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert ([r[0] for r in plain.search_batch(queries, 0.2)]
            == [r[0] for r in sharded.search_batch(queries, 0.2)])


def test_vad_hysteresis():
    cfg = VADConfig(threshold=0.5, min_silence_duration=0.2, min_speech_duration=0.1)
    det = VoiceActivityDetector(cfg)
    probs = np.zeros(300)
    probs[50:120] = 0.9        # speech [0.5, 1.2)
    probs[125:180] = 0.9       # short 50ms gap -> same segment
    probs[250:260] = 0.9       # 100ms speech at 2.5
    segs = det.segments(probs, dur=3.0)
    assert len(segs) == 2
    s, e = segs[0]
    assert abs(s - 0.5) < 0.02 and abs(e - 1.8) < 0.02
    assert abs(segs[1][0] - 2.5) < 0.02


def test_vadnet_shapes():
    cfg = VADConfig(dim=16, layers=2)
    model = VADNet(cfg)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((1, 50, 80)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats)
    p = model.apply(params, feats)
    assert p.shape == (1, 50)
    assert ((np.asarray(p) >= 0) & (np.asarray(p) <= 1)).all()


# ------------------------------------------------------------------- ASR


def test_ctc_greedy_decode():
    # V=4, blank=0; sequence: [1 1 0 2 2 3 0 0 3]
    t, v = 9, 4
    seq = [1, 1, 0, 2, 2, 3, 0, 0, 3]
    logits = np.full((1, t, v), -10.0, np.float32)
    for i, s in enumerate(seq):
        logits[0, i, s] = 10.0
    ids, lengths = ctc_greedy_decode(jnp.asarray(logits), jnp.ones((1, t)))
    assert int(lengths[0]) == 4
    assert list(np.asarray(ids[0, :4])) == [1, 2, 3, 3]


def test_ctc_greedy_decode_respects_mask():
    t, v = 6, 3
    logits = np.full((1, t, v), -10.0, np.float32)
    for i in range(t):
        logits[0, i, 1 + (i % 2)] = 10.0  # alternating 1,2,1,2..
    mask = np.array([[1, 1, 1, 0, 0, 0]], np.float32)
    ids, lengths = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray(mask))
    assert int(lengths[0]) == 3
    assert list(np.asarray(ids[0, :3])) == [1, 2, 1]


def test_token_table_roundtrip(tmp_path):
    p = tmp_path / "tokens.txt"
    p.write_text("<blk> 0\n▁HE 1\nLLO 2\n你 3\n<|zh|> 4\n<unk> 5\n", encoding="utf-8")
    tt = TokenTable.load(p)
    assert tt.blank_id == 0
    assert tt.vocab_size == 6
    assert tt.decode([4, 1, 2, 3]) == "HELLO你"


def test_token_table_whisper_base64(tmp_path):
    """sherpa-onnx whisper tokens.txt: base64 byte fragments per id; a single
    UTF-8 char (CJK, emoji) may span several tokens (sp-id...asr.py:331-345)."""
    import base64 as b64

    # "你好" = e4 bd a0 e5 a5 bd ; split mid-character across tokens.
    frag1, frag2, frag3 = b"\xe4\xbd", b"\xa0\xe5\xa5", b"\xbd"
    emoji = "🚀".encode("utf-8")  # f0 9f 9a 80, split 2+2
    lines = [
        f"{b64.b64encode(b' Hello').decode()} 0",
        f"{b64.b64encode(frag1).decode()} 1",
        f"{b64.b64encode(frag2).decode()} 2",
        f"{b64.b64encode(frag3).decode()} 3",
        f"{b64.b64encode(emoji[:2]).decode()} 4",
        f"{b64.b64encode(emoji[2:]).decode()} 5",
        "<|endoftext|> 6",  # literal special line stays literal
    ]
    p = tmp_path / "tokens.txt"
    p.write_text("\n".join(lines), encoding="utf-8")
    tt = TokenTable.load(p, base64_tokens=True)
    assert tt.is_byte_bpe
    assert tt.decode([0, 1, 2, 3, 4, 5, 6]) == "Hello你好🚀"
    # specials alone decode to empty, not garbage
    assert tt.decode([6]) == ""


def test_token_table_base64_autodetect(tmp_path):
    """Auto-detect must flag a whisper-style table but NOT a plain vocab
    whose symbols happen to look base64-ish (e.g. 'abcd')."""
    import base64 as b64

    whisper = tmp_path / "whisper_tokens.txt"
    whisper.write_text(
        f"{b64.b64encode('你'.encode()).decode()} 0\n"
        f"{b64.b64encode(b' the').decode()} 1\n<|endoftext|> 2\n",
        encoding="utf-8")
    tt = TokenTable.load(whisper)
    assert tt.is_byte_bpe and tt.decode([0, 1]) == "你 the"

    plain = tmp_path / "plain_tokens.txt"
    plain.write_text("<blk> 0\nabcd 1\n你 2\n▁he 3\n", encoding="utf-8")
    tt2 = TokenTable.load(plain)
    assert not tt2.is_byte_bpe
    assert tt2.decode([1, 2]) == "abcd你"


def test_sensevoice_forward_and_decode():
    cfg = SenseVoiceConfig(vocab_size=8, dim=32, heads=2, layers=1, conv_kernel=3)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 4000])
    feats, mask = sensevoice_frontend(wav, lengths, cfg)
    assert feats.shape[-1] == cfg.lfr_m * 80
    model = SenseVoiceEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, mask)
    logits = model.apply(params, feats, mask, language_id=1, use_itn=True)
    assert logits.shape[0] == 2
    assert logits.shape[1] == feats.shape[1] + cfg.num_prompt
    assert logits.shape[2] == 8
    # decode skipping prompt frames
    full_mask = jnp.concatenate([jnp.ones((2, cfg.num_prompt), bool), mask], axis=1)
    ids, lens = ctc_greedy_decode(logits[:, cfg.num_prompt:], mask.astype(jnp.float32))
    assert ids.shape[0] == 2 and int(lens.max()) <= feats.shape[1]
