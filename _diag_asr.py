"""Diag v2: warmup+cosine schedule, gain + residue augmentation, per-speaker
clean CER. Goal: clean CER ~0 and corrupted CER <= 0.15 before re-running
the full quality gate."""
import numpy as np
import jax
import jax.numpy as jnp

from audio_classification_tpu.runtime.device import enable_compilation_cache
enable_compilation_cache()

from audio_classification_tpu.pipelines.quality_gate import (
    say, rand_word, span_truth, SR, ALPHABET, N_SPK, TONE_MS)
from audio_classification_tpu.models.asr.sensevoice import (
    SenseVoiceConfig, SenseVoiceEncoder, sensevoice_frontend)
from audio_classification_tpu.ops import FbankConfig
from audio_classification_tpu.models.asr.tokens import TokenTable
from audio_classification_tpu.models.asr.ctc import ctc_loss, ctc_greedy_decode
from audio_classification_tpu.train.trainer import ModuleTrainer, warmup_cosine
from audio_classification_tpu.parallel.mesh import make_mesh
from audio_classification_tpu.metrics import cer

seed = 0
TOTAL_STEPS = 2400
tokens = TokenTable.char_table(ALPHABET)
asr_cfg = SenseVoiceConfig(vocab_size=tokens.vocab_size, dim=96, heads=4,
                           layers=2, conv_kernel=7,
                           fbank=FbankConfig(frame_length_ms=64.0, num_bins=128))
rng = np.random.default_rng(seed)
mesh = make_mesh(len(jax.devices()), model_axis=1)
max_word, t_asr = 12, int(12 * SR * TONE_MS / 1000)
tone_n = int(SR * TONE_MS / 1000)


def residue(audio, ev, db):
    other = say(ev, int(ev.integers(N_SPK)), rand_word(ev, 12, 12))[: audio.size]
    if other.size < audio.size:
        other = np.pad(other, (0, audio.size - other.size))
    scale = np.linalg.norm(audio) / (np.linalg.norm(other) + 1e-9) * (10 ** (-db / 20))
    return audio + scale * other


def asr_batch(n):
    wavs = np.zeros((n, t_asr), np.float32)
    lens = np.zeros(n, np.int32)
    labels = np.zeros((n, max_word), np.int32)
    lab_lens = np.zeros(n, np.int32)
    for i in range(n):
        w = rand_word(rng, 3, max_word)
        audio = say(rng, rng.integers(N_SPK), w)
        if rng.random() < 0.5:
            a = rng.uniform(0, 0.6 * tone_n / SR) + rng.integers(0, max(len(w) - 2, 1)) * (tone_n / SR)
            b = min(a + rng.uniform(1.5, 2.8), audio.size / SR)
            ia, ib = int(a * SR), int(b * SR)
            if ib - ia > tone_n:
                w = span_truth(w, a, b)
                audio = audio[ia:ib]
        if not w:
            w = "a"
            audio = say(rng, 0, w)
        # separation-artifact augmentation: other-speaker residue at the
        # SI-SDR levels the separator actually delivers (8-20 dB)
        if rng.random() < 0.4:
            audio = residue(audio, rng, rng.uniform(8.0, 20.0))
        # separator output scale is arbitrary (SI-SDR scale-invariant)
        audio = audio * rng.uniform(0.3, 3.0)
        audio = audio + 0.01 * rng.standard_normal(audio.size).astype(np.float32)
        wavs[i, : audio.size] = audio
        lens[i] = audio.size
        ids = tokens.encode(w)
        labels[i, : len(ids)] = ids
        lab_lens[i] = len(ids)
    return dict(wav=jnp.asarray(wavs), lens=jnp.asarray(lens),
                labels=jnp.asarray(labels), lab_lens=jnp.asarray(lab_lens))


asr_model = SenseVoiceEncoder(asr_cfg)
b0 = asr_batch(2)
feats0, mask0 = sensevoice_frontend(b0["wav"], b0["lens"], asr_cfg)
asr_params = asr_model.init(jax.random.PRNGKey(seed), feats0, mask0)


def asr_loss(f, p, b):
    feats, mask = sensevoice_frontend(b["wav"], b["lens"], asr_cfg)
    logits = f(p, feats, mask)[:, asr_cfg.num_prompt:]
    return ctc_loss(logits, mask.astype(jnp.float32), b["labels"], b["lab_lens"],
                    blank_id=tokens.blank_id)


trainer = ModuleTrainer(asr_model, asr_params, asr_loss, mesh=mesh,
                        lr=warmup_cosine(1e-3, TOTAL_STEPS))
import time
t0 = time.time()
ema = None
for step in range(1, TOTAL_STEPS + 1):
    loss = trainer.train_step(asr_batch(16))
    ema = loss if ema is None else 0.95 * ema + 0.05 * loss
    if step % 300 == 0:
        print(f"  asr step {step} ctc {loss:.3f} ema {ema:.3f}  ({time.time()-t0:.0f}s)", flush=True)

params = trainer.state.params


def decode_batch(wavs, lens):
    wavs = jnp.asarray(wavs)
    lens = jnp.asarray(lens)
    feats, mask = sensevoice_frontend(wavs, lens, asr_cfg)
    logits = asr_model.apply(params, feats, mask)[:, asr_cfg.num_prompt:]
    ids, lengths = ctc_greedy_decode(logits, mask, blank_id=tokens.blank_id)
    ids, lengths = np.asarray(ids), np.asarray(lengths)
    return [tokens.decode(ids[i, : lengths[i]]) for i in range(ids.shape[0])]


ev = np.random.default_rng(424242)


def eval_case(name, make, n=24):
    wavs = np.zeros((n, t_asr), np.float32)
    lens = np.zeros(n, np.int32)
    words = []
    for i in range(n):
        w, audio = make(ev)
        wavs[i, : audio.size] = audio[:t_asr]
        lens[i] = min(audio.size, t_asr)
        words.append(w)
    texts = decode_batch(wavs, lens)
    cs = [cer(w, t) for w, t in zip(words, texts)]
    print(f"{name}: CER {np.mean(cs):.3f}   ex: truth={words[0]!r} hyp={texts[0]!r} | truth={words[1]!r} hyp={texts[1]!r}", flush=True)


def clean(ev, spk=None, n=None):
    w = rand_word(ev, 3, 12) if n is None else ("".join(ev.choice(list(ALPHABET)) for _ in range(n)))
    s = int(ev.integers(N_SPK)) if spk is None else spk
    return w, say(ev, s, w)


eval_case("a  clean 3-12 letters, any spk ", lambda ev: clean(ev))
for s in range(N_SPK):
    eval_case(f"b{s} clean 12 letters, spk{s}     ", lambda ev, s=s: clean(ev, spk=s, n=12))
eval_case("c  12 letters spk0 + 12.75dB   ", lambda ev: (lambda w_a: (w_a[0], residue(w_a[1], ev, 12.75)))(clean(ev, spk=0, n=12)))
eval_case("d  3-12 letters + 12.75dB      ", lambda ev: (lambda w_a: (w_a[0], residue(w_a[1], ev, 12.75)))(clean(ev)))
eval_case("f  clean, gain x0.2            ", lambda ev: (lambda w_a: (w_a[0], 0.2 * w_a[1]))(clean(ev)))
eval_case("g  clean, gain x4              ", lambda ev: (lambda w_a: (w_a[0], 4.0 * w_a[1]))(clean(ev)))
