"""Full-system demo: every stage trained in-framework, then the flagship
pipeline end-to-end with REAL speaker gating.

A synthetic world with both linguistic content and speaker identity:
- a speaker is an octave band (base 500*2^spk Hz);
- letters a-h are eighth-octave offsets within the speaker's band;
- an utterance is a word voiced as a 250 ms tone per letter.

Train all four stages on this world (3-src Conv-TasNet PIT, OSD frame-BCE,
speaker AAM-softmax, SenseVoice-CTC), assemble a ModelPack, and run the
flagship Overlap3Pipeline on scenes where the enrolled target speaker talks
throughout while interferers overlap the middle — with a meaningful
sv_threshold, so the SV gate genuinely selects the target's branch.

Reported: the reference's headline metrics (BASELINE.md) —
target_hit_rate_segments, sep SI-SDR/SI-SDRi (PIT), and CER between each
record's emitted text and the target's true words.

Run: python examples/full_system_demo.py

Recorded run (single TPU v5e chip, ~20 min incl. training all stages):
    calibrated sv_threshold=0.222 (target-branch 0.318, best-other 0.127)
    target_hit_rate_segments = 1.0        (reference run log: 0.93)
    sep_sisdr_mean = 12.77, sep_sisdri_mean = +12.77 dB
                                          (reference run log: +13.54 dB)
    emitted transcripts track the target's words with correct prefixes
    (mean CER 0.57; residual errors are greedy-CTC repeat collapse and
    truncation from the lightly-trained 2-layer demo recognizer)
"""
from __future__ import annotations

import dataclasses
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 16000
ALPHABET = "abcdefgh"
TONE_MS = 250
N_SPK = 4


def say(rng, spk: int, word: str, gain=0.25) -> np.ndarray:
    """Speaker = octave band (base 350*2^spk Hz); letter = eighth-octave
    offset within the band (freq = base * 2^(idx/8), so bands stay
    disjoint).

    This factorization makes every stage's task well-posed: separation
    splits disjoint bands, speaker ID reads the band, ASR reads the
    within-band offset, and OSD detects multiple active bands.
    """
    seg = int(SR * TONE_MS / 1000)
    base = 500.0 * (2 ** spk) * rng.uniform(0.995, 1.005)
    out = []
    for ch in word:
        f = base * (2 ** (ALPHABET.index(ch) / 8.0))
        t = np.arange(seg) / SR
        sig = np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
        out.append(gain * sig)
    return np.concatenate(out).astype(np.float32)


def rand_word(rng, lo=3, hi=6) -> str:
    return "".join(rng.choice(list(ALPHABET)) for _ in range(rng.integers(lo, hi + 1)))


def main():
    from audio_classification_tpu.runtime.device import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from audio_classification_tpu.audio_io import write_wav
    from audio_classification_tpu.engine import BucketSpec, ModelPack, StageEngine
    from audio_classification_tpu.engine.bucketing import default_buckets
    from audio_classification_tpu.engine.runtime import EnginePreset
    from audio_classification_tpu.metrics import cer
    from audio_classification_tpu.models.asr.ctc import ctc_loss
    from audio_classification_tpu.models.asr.sensevoice import (
        SenseVoiceConfig, SenseVoiceEncoder, sensevoice_frontend,
    )
    from audio_classification_tpu.models.asr.tokens import TokenTable
    from audio_classification_tpu.models.convtasnet import ConvTasNetConfig
    from audio_classification_tpu.models.osd import OSDConfig, OSDNet
    from audio_classification_tpu.models.speaker import SpeakerEmbedder, SpeakerEmbedderConfig
    from audio_classification_tpu.models.vad import VADConfig
    from audio_classification_tpu.models.mossformer import MossFormerConfig
    from audio_classification_tpu.models.asr.transducer import TransducerConfig
    from audio_classification_tpu.models.asr.paraformer import ParaformerConfig
    from audio_classification_tpu.models.asr.whisper_style import WhisperStyleConfig
    from audio_classification_tpu.ops import FbankConfig, log_mel_fbank
    from audio_classification_tpu.parallel.mesh import make_mesh
    from audio_classification_tpu.pipelines.offline_overlap3 import Overlap3Pipeline
    from audio_classification_tpu.train.losses import aam_softmax_loss, frame_bce_loss
    from audio_classification_tpu.train.trainer import ModuleTrainer, SeparatorTrainer
    from audio_classification_tpu.utils.config import Overlap3Config

    mesh = make_mesh(len(jax.devices()), model_axis=1)
    fb = FbankConfig()
    fbank_batch = jax.jit(lambda w: log_mel_fbank(w, fb))
    tokens = TokenTable.char_table(ALPHABET)
    rng = np.random.default_rng(0)

    # ------------------------------------------------------------- configs
    sep_cfg = ConvTasNetConfig(n_src=3, enc_dim=128, enc_kernel=16, bottleneck=64,
                               hidden=128, n_blocks=4, n_repeats=2)
    osd_cfg = OSDConfig(dim=96, heads=4, layers=2)
    spk_cfg = SpeakerEmbedderConfig(channels=(16, 32, 64), embed_dim=64)
    asr_cfg = SenseVoiceConfig(vocab_size=tokens.vocab_size, dim=96, heads=4,
                               layers=2, conv_kernel=7)

    # ------------------------------------------------------- 1. separator
    print("[1/4] training 3-src separator (PIT SI-SDR)")
    sep_trainer = SeparatorTrainer(sep_cfg, mesh=mesh, lr=5e-4, seed=0)
    t_len = SR
    for step in range(1, 401):
        refs = np.stack([
            np.stack([say(rng, rng.integers(N_SPK), rand_word(rng, 4, 4))[:t_len]
                      for _ in range(3)])
            for _ in range(8)
        ])
        refs = np.pad(refs, ((0, 0), (0, 0), (0, max(0, t_len - refs.shape[-1]))))[:, :, :t_len]
        loss = sep_trainer.train_step(refs.sum(1), refs, np.ones((8, t_len), np.float32))
        if step % 200 == 0:
            print(f"  sep step {step} loss {loss:.2f}")

    # ------------------------------------------------------------- 2. OSD
    print("[2/4] training OSD (frame BCE)")
    osd_model = OSDNet(osd_cfg)
    dur = 3.0
    t3 = int(dur * SR)

    def osd_batch(n):
        wavs = np.zeros((n, t3), np.float32)
        marks = []
        for i in range(n):
            s1 = say(rng, rng.integers(N_SPK), rand_word(rng, 12, 12))[:t3]
            wavs[i, : s1.size] = s1
            a = rng.uniform(0.4, 1.4)
            b = a + rng.uniform(0.7, 1.4)
            s2 = say(rng, rng.integers(N_SPK), rand_word(rng, 6, 6))
            ia = int(a * SR)
            ib = min(ia + s2.size, t3)
            wavs[i, ia:ib] += s2[: ib - ia]
            marks.append((a, ib / SR))
        feats = fbank_batch(jnp.asarray(wavs))
        n_out = int(np.ceil(feats.shape[1] / osd_cfg.subsample))
        centers = (np.arange(n_out) + 0.5) * osd_cfg.out_frame_sec
        labels = np.zeros((n, n_out, 2), np.float32)
        labels[:, :, 0] = 1.0
        for i, (a, b) in enumerate(marks):
            labels[i, :, 1] = (centers >= a) & (centers < b)
        return {"feats": feats, "labels": jnp.asarray(labels)}

    osd_params = osd_model.init(jax.random.PRNGKey(0), osd_batch(1)["feats"])
    osd_trainer = ModuleTrainer(
        osd_model, osd_params,
        lambda f, p, b: frame_bce_loss(f(p, b["feats"]), b["labels"],
                                       jnp.ones(b["labels"].shape[:2])),
        mesh=mesh, lr=3e-4)
    for step in range(1, 251):
        loss = osd_trainer.train_step(osd_batch(8))
        if step % 125 == 0:
            print(f"  osd step {step} bce {loss:.4f}")

    # --------------------------------------------------------- 3. speaker
    print("[3/4] training speaker embedder (AAM)")

    class EmbedderWithHead(nn.Module):
        @nn.compact
        def __call__(self, feats):
            emb = SpeakerEmbedder(spk_cfg, name="embedder")(feats)
            w = self.param("aam_centers", nn.initializers.normal(1.0), (N_SPK, spk_cfg.embed_dim))
            return emb, w

    spk_head = EmbedderWithHead()

    def spk_batch(n):
        labels = rng.integers(0, N_SPK, size=n)
        wavs = np.zeros((n, SR), np.float32)
        for i, s in enumerate(labels):
            u = say(rng, int(s), rand_word(rng, 4, 4))[:SR]
            wavs[i, : u.size] = u
        return {"feats": fbank_batch(jnp.asarray(wavs)), "labels": jnp.asarray(labels)}

    def spk_loss(f, p, b):
        emb, w = f(p, b["feats"])
        return aam_softmax_loss(emb, b["labels"], w, margin=0.2, scale=30.0)

    spk_params = spk_head.init(jax.random.PRNGKey(0), spk_batch(2)["feats"])
    spk_trainer = ModuleTrainer(spk_head, spk_params, spk_loss, mesh=mesh, lr=3e-4)
    for step in range(1, 301):
        loss = spk_trainer.train_step(spk_batch(16))
        if step % 150 == 0:
            print(f"  spk step {step} aam {loss:.4f}")

    # ------------------------------------------------------------- 4. ASR
    print("[4/4] training SenseVoice-CTC")
    asr_model = SenseVoiceEncoder(asr_cfg)
    max_word, t_asr = 12, int(12 * SR * TONE_MS / 1000)

    def asr_batch(n):
        wavs = np.zeros((n, t_asr), np.float32)
        lens = np.zeros(n, np.int32)
        labels = np.zeros((n, max_word), np.int32)
        lab_lens = np.zeros(n, np.int32)
        for i in range(n):
            w = rand_word(rng, 3, max_word)
            audio = say(rng, rng.integers(N_SPK), w)
            # light noise so decoding survives separation artifacts
            audio = audio + 0.01 * rng.standard_normal(audio.size).astype(np.float32)
            wavs[i, : audio.size] = audio
            lens[i] = audio.size
            ids = tokens.encode(w)
            labels[i, : len(ids)] = ids
            lab_lens[i] = len(ids)
        return dict(wav=jnp.asarray(wavs), lens=jnp.asarray(lens),
                    labels=jnp.asarray(labels), lab_lens=jnp.asarray(lab_lens))

    b0 = asr_batch(2)
    feats0, mask0 = sensevoice_frontend(b0["wav"], b0["lens"], asr_cfg)
    asr_params = asr_model.init(jax.random.PRNGKey(0), feats0, mask0)

    def asr_loss(f, p, b):
        feats, mask = sensevoice_frontend(b["wav"], b["lens"], asr_cfg)
        logits = f(p, feats, mask)[:, asr_cfg.num_prompt:]
        return ctc_loss(logits, mask.astype(jnp.float32), b["labels"], b["lab_lens"],
                        blank_id=tokens.blank_id)

    asr_trainer = ModuleTrainer(asr_model, asr_params, asr_loss, mesh=mesh, lr=5e-4)
    for step in range(1, 901):
        loss = asr_trainer.train_step(asr_batch(12))
        if step % 300 == 0:
            print(f"  asr step {step} ctc {loss:.3f}")

    # ------------------------------------------- assemble the model pack
    preset = EnginePreset(
        name="demo", osd=osd_cfg, sep3=sep_cfg,
        sep2=ConvTasNetConfig(n_src=2, enc_dim=64, enc_kernel=16, bottleneck=32,
                              hidden=64, n_blocks=2, n_repeats=1),
        mossformer=MossFormerConfig(n_src=2, enc_dim=64, dim=48, qk_dim=32, layers=2),
        spk=spk_cfg, asr=asr_cfg,
        transducer=TransducerConfig(vocab_size=tokens.vocab_size, dim=32, heads=2,
                                    layers=1, pred_dim=32, joiner_dim=32, conv_kernel=3),
        paraformer=ParaformerConfig(vocab_size=tokens.vocab_size, dim=32, heads=2,
                                    enc_layers=1, dec_layers=1, conv_kernel=3, max_tokens=16),
        whisper=WhisperStyleConfig(vocab_size=tokens.vocab_size, dim=32, heads=2,
                                   enc_layers=1, dec_layers=1, max_decode_len=16),
        vad=VADConfig(dim=16, layers=2),
    )
    pack = ModelPack(preset, seed=0, tokens=tokens)
    pack.load_params("sep3", sep_trainer.state.params)
    pack.load_params("osd", osd_trainer.state.params)
    spk_vars = spk_trainer.state.params
    spk_packed = {"params": spk_vars["params"]["embedder"]}
    if "batch_stats" in spk_vars:  # BatchNorm running stats ride along
        spk_packed["batch_stats"] = spk_vars["batch_stats"]["embedder"]
    pack.load_params("spk", spk_packed)
    pack.load_params("asr", asr_trainer.state.params)
    engine = StageEngine(pack, BucketSpec(lengths=default_buckets(SR, 0.5, 8.0), max_batch=8))

    # ---------------------------------- calibrate sv_threshold on dev scenes
    # (standard practice: pick the operating point from a small dev set; the
    # reference hard-codes 0.6 for its particular checkpoint)
    eval_rng = np.random.default_rng(424242)
    target_spk = 0
    enroll_wav = say(eval_rng, target_spk, rand_word(eval_rng, 6, 6))
    enroll_vec = engine.embed([enroll_wav])[0]
    tgt_scores, other_scores = [], []
    for _ in range(3):
        w_t = rand_word(eval_rng, 6, 6)
        tgt = say(eval_rng, target_spk, w_t)
        intr = say(eval_rng, int(eval_rng.integers(1, N_SPK)), rand_word(eval_rng, 6, 6))
        n = min(tgt.size, intr.size)
        rec = engine.process_overlap([tgt[:n] + intr[:n]], [enroll_vec])[0]
        s = sorted(np.asarray(rec["scores"]), reverse=True)
        tgt_scores.append(s[0])
        other_scores.append(s[1])
    sv_thr = float((np.mean(tgt_scores) + np.mean(other_scores)) / 2)
    print(f"calibrated sv_threshold={sv_thr:.3f} "
          f"(target-branch {np.mean(tgt_scores):.3f}, best-other {np.mean(other_scores):.3f})")
    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        paths, truths, ref_rows = [], {}, []
        for i in range(6):
            w_t = rand_word(eval_rng, 6, 6) + rand_word(eval_rng, 6, 6)
            tgt = say(eval_rng, target_spk, w_t)[: t3]
            scene = np.zeros(t3, np.float32)
            scene[: tgt.size] += tgt
            # interferer overlapping the middle
            intr_spk = int(eval_rng.integers(1, N_SPK))
            w_i = rand_word(eval_rng, 5, 5)
            intr = say(eval_rng, intr_spk, w_i)
            a = int(0.9 * SR)
            b = min(a + intr.size, t3)
            intr_full = np.zeros(t3, np.float32)
            intr_full[a:b] = intr[: b - a]
            scene += intr_full
            mp = tdp / f"scene_{i}.wav"
            write_wav(mp, scene, SR)
            paths.append(str(mp))
            truths[str(mp)] = w_t
            r1 = tdp / f"tref_{i}.wav"; r2 = tdp / f"iref_{i}.wav"
            tgt_full = np.zeros(t3, np.float32); tgt_full[: tgt.size] = tgt
            write_wav(r1, tgt_full, SR); write_wav(r2, intr_full, SR)
            ref_rows.append(f"{mp},{r1},{r2}")
        (tdp / "refs.csv").write_text("mix,ref1,ref2\n" + "\n".join(ref_rows))
        write_wav(tdp / "target.wav", enroll_wav, SR)

        cfg = Overlap3Config(
            input_wavs=paths, target_wav=str(tdp / "target.wav"),
            refs_csv=str(tdp / "refs.csv"),
            sv_threshold=sv_thr,       # REAL gating at the calibrated point
            osd_thr=0.5, min_overlap_dur=0.3, max_segment_sec=8.0,
            eval_separation=True, seed=0, preset="tiny",
        )
        result = Overlap3Pipeline(cfg, engine=engine).run()

        m = result.metrics
        # CER on the concatenated per-wav transcript (records in time order)
        by_wav = {}
        for rec in sorted(result.segments, key=lambda r: (r["wav"], r["start"])):
            by_wav.setdefault(rec["wav"], []).append(rec["text"])
        cers = [cer(truths[w], "".join(ts)) for w, ts in by_wav.items()]
        print("\n==== full-system pipeline metrics ====")
        print(f"segments_total={m['segments_total']} "
              f"seen_clean={m['segments_seen_clean']} seen_overlap={m['segments_seen_overlap']}")
        print(f"target_hit_rate_segments={m['target_hit_rate_segments']}")
        print(f"sep_sisdr_mean={m['sep_sisdr_mean']} sep_sisdri_mean={m['sep_sisdri_mean']}")
        print(f"emitted-text CER vs target words: {np.mean(cers):.3f}" if cers else "no records")
        for rec in result.segments[:4]:
            print(f"  [{rec['kind']}] {rec['start']}-{rec['end']}s sv={rec['sv_score']} "
                  f"text='{rec['text']}' target_src_text='{rec['target_src_text']}' "
                  f"truth='{truths[rec['wav']]}'")
    return m


if __name__ == "__main__":
    main()
