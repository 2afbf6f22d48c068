"""Quality gate: train every stage in-framework, run the flagship pipeline,
emit a committed quality artifact.

The reference's deliverable is correct speech output — its run log records a
93.1% overlap-segment target hit rate and +13.54 dB PIT SI-SDRi
(reference: todo.md:4-11) — so this framework carries an executable quality
gate next to its speed benchmarks: a synthetic world with real linguistic
content and speaker identity, all four stages trained IN-FRAMEWORK on it
(3-src Conv-TasNet PIT, OSD frame-BCE, speaker AAM-softmax, SenseVoice-CTC),
then the flagship ``Overlap3Pipeline`` end-to-end with REAL sv gating at a
dev-calibrated threshold. Metrics come out of the same accumulators the
reference's pipeline reports (overlap3_core.py:842-927).

The world (examples/full_system_demo.py renders the same construction as a
narrated demo):
- a speaker is an octave band (base 500*2^spk Hz);
- letters a-h are eighth-octave offsets within the speaker's band;
- an utterance voices a word as one 250 ms tone per letter.
Separation splits disjoint bands, speaker-ID reads the band, ASR reads the
within-band offsets, OSD detects multiple active bands — every stage's task
is well-posed, so a healthy pipeline scores high and any regression in
training, conversion, gating, or decode drags a number down.

CER accounting: segments are cut on the OSD hop grid, not on letter
boundaries, so a whole-scene concatenation charges the recognizer for
boundary slivers it never saw. The primary ``cer_mean`` is therefore
PER-RECORD: each emitted text is scored against the letters of the target's
word whose 250 ms slots lie (>=50%) inside that record's span — the honest
"did the pipeline transcribe what the target actually said here" metric.
The whole-scene concatenation is still reported as ``cer_concat_mean``.

Gates (write_quality_json sets ``quality_ok``):
  target_hit_rate_segments >= 0.9   and   cer_mean <= 0.2
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

SR = 16000
ALPHABET = "abcdefgh"
TONE_MS = 250
N_SPK = 4


def say(rng, spk: int, word: str, gain=0.25) -> np.ndarray:
    """Speaker = octave band (base 500*2^spk Hz); letter = eighth-octave
    offset within the band (freq = base * 2^(idx/8), so bands stay
    disjoint)."""
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


def span_truth(word: str, start: float, end: float, min_frac: float = 0.5) -> str:
    """Letters of ``word`` whose 250 ms slot overlaps [start, end) by at
    least ``min_frac`` of the slot — the per-record transcript truth."""
    tone = TONE_MS / 1000.0
    out = []
    for i, ch in enumerate(word):
        a, b = i * tone, (i + 1) * tone
        if min(end, b) - max(start, a) >= min_frac * tone:
            out.append(ch)
    return "".join(out)


def world_configs() -> tuple:
    """Single source of truth for the gate's stage configs -> (preset,
    tokens). Shared by the training path and the checkpoint-restore path
    (tools/diag_gate.py) so a restored pack is guaranteed shape-compatible
    with the one training saved."""
    from ..engine.runtime import EnginePreset
    from ..models.asr.paraformer import ParaformerConfig
    from ..models.asr.sensevoice import SenseVoiceConfig
    from ..models.asr.tokens import TokenTable
    from ..models.asr.transducer import TransducerConfig
    from ..models.asr.whisper_style import WhisperStyleConfig
    from ..models.convtasnet import ConvTasNetConfig
    from ..models.mossformer import MossFormerConfig
    from ..models.osd import OSDConfig
    from ..models.speaker import SpeakerEmbedderConfig
    from ..models.vad import VADConfig
    from ..ops import FbankConfig

    tokens = TokenTable.char_table(ALPHABET)
    sep_cfg = ConvTasNetConfig(n_src=3, enc_dim=128, enc_kernel=16, bottleneck=64,
                               hidden=128, n_blocks=4, n_repeats=2)
    osd_cfg = OSDConfig(dim=96, heads=4, layers=2)
    spk_cfg = SpeakerEmbedderConfig(channels=(16, 32, 64), embed_dim=64)
    # The recognizer's frontend is WIDENED for this world: spk0's letters sit
    # 44 Hz apart at a 500 Hz base, under the resolution of the 25 ms/80-mel
    # default (mel filters there are ~40-50 Hz wide) — measured per-speaker
    # clean CER was spk0 0.97 / spk1 0.72 / spk2-3 0.05. A 64 ms window +
    # 128 mels resolves every band (clean CER 0.00-0.04 all speakers); real
    # deployments turn the same knob for narrow-band discrimination tasks.
    # num_mel matches fbank.num_bins so the pack's own init shapes and any
    # onnx_export of this config stay consistent with the real frontend.
    # utt_cmvn: the recognizer sits downstream of an SI-SDR-trained
    # separator whose output scale is arbitrary (r5 diagnostic measured
    # branch RMS 44x the source); per-utterance CMVN makes the frontend
    # exactly scale-invariant instead of hoping gain augmentation covers
    # the range.
    asr_cfg = SenseVoiceConfig(vocab_size=tokens.vocab_size, dim=96, heads=4,
                               layers=2, conv_kernel=7, num_mel=128,
                               utt_cmvn=True,
                               fbank=FbankConfig(frame_length_ms=64.0,
                                                 num_bins=128))
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
        # branch level restoration before branch ASR / requantize (see
        # EnginePreset.asr_branch_norm; pairs with utt_cmvn above)
        asr_branch_norm="peak",
    )
    return preset, tokens


def build_world_engine(seed: int = 0, ckpt_dir: Optional[str] = None) -> tuple:
    """ModelPack + StageEngine over the world preset -> (engine, tokens).
    ``ckpt_dir`` (orbax, written by train_world_pack) restores trained
    params; None gives a random-init pack (plumbing tests)."""
    from ..engine import BucketSpec, ModelPack, StageEngine
    from ..engine.bucketing import default_buckets

    preset, tokens = world_configs()
    pack = ModelPack(preset, seed=seed, tokens=tokens)
    if ckpt_dir is not None:
        from ..train.checkpoint import load_model_pack

        load_model_pack(pack, ckpt_dir)
    engine = StageEngine(pack, BucketSpec(lengths=default_buckets(SR, 0.5, 8.0),
                                          max_batch=8))
    return engine, tokens


def train_world_pack(steps_scale: float = 1.0, seed: int = 0,
                     log=print, ckpt_dir: Optional[str] = None,
                     stages: tuple = ("sep", "osd", "spk", "asr")) -> tuple:
    """Train the listed stages on the synthetic world -> (engine, tokens,
    stage losses dict). Step counts scale with ``steps_scale`` (the plumbing
    test runs at ~0.01; the committed artifact at 1.0). ``ckpt_dir`` saves
    the trained pack (orbax) so eval-side work can iterate without the
    ~20 min retrain (restore via build_world_engine). ``stages`` lets the
    CI CER tripwire train only the recognizer (untrained stages keep their
    seed init; without "sep" the ASR's separation-in-the-loop augmentation
    falls back to additive residue)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ..engine import BucketSpec, ModelPack, StageEngine
    from ..engine.bucketing import default_buckets
    from ..models.asr.ctc import ctc_loss
    from ..models.asr.sensevoice import SenseVoiceEncoder, sensevoice_frontend
    from ..models.osd import OSDNet
    from ..models.speaker import SpeakerEmbedder
    from ..ops import FbankConfig, log_mel_fbank
    from ..parallel.mesh import make_mesh
    from ..train.losses import aam_softmax_loss, frame_bce_loss
    from ..train.trainer import ModuleTrainer, SeparatorTrainer, warmup_cosine

    def n_steps(base: int) -> int:
        return max(1, int(round(base * steps_scale)))

    mesh = make_mesh(len(jax.devices()), model_axis=1)

    def bs(n: int) -> int:
        """Snap a batch size up to the data-axis size (the trainers shard
        batches over the mesh — 8 virtual devices in the CI smoke)."""
        d = mesh.shape["data"]
        return max(d, -(-n // d) * d)
    fb = FbankConfig()
    fbank_batch = jax.jit(lambda w: log_mel_fbank(w, fb))
    preset, tokens = world_configs()
    rng = np.random.default_rng(seed)
    losses: Dict[str, float] = {}
    t_start = time.time()

    sep_cfg = preset.sep3
    osd_cfg = preset.osd
    spk_cfg = preset.spk
    asr_cfg = preset.asr

    # ------------------------------------------------------- 1. separator
    # Recipe notes (r5): the eval scenes always have DISTINCT speaker
    # bands, sources that start/stop inside the segment, and often only
    # two audible sources — train on that shape. The old recipe sampled
    # speakers independently (62% of scenes had a same-band collision, an
    # unseparable task for a band-world separator) and every source filled
    # the whole crop.
    sep_trainer = None
    t_len = SR
    if "sep" in stages:
        log("[1/4] training 3-src separator (PIT SI-SDR)")
        sep_trainer = SeparatorTrainer(sep_cfg, mesh=mesh, lr=5e-4, seed=seed)

    def sep_ref(spk: int, gain_scale: float = 1.0) -> np.ndarray:
        """One source track: a word at a random offset, silence elsewhere."""
        w = say(rng, spk, rand_word(rng, 2, 4)) * gain_scale
        ref = np.zeros(t_len, np.float32)
        off = int(rng.integers(0, max(t_len - min(w.size, t_len) + 1, 1)))
        n = min(w.size, t_len - off)
        ref[off:off + n] = w[:n]
        return ref

    for step in range(1, (n_steps(700) + 1) if sep_trainer else 0):
        b_sep = bs(8)
        refs = []
        for _ in range(b_sep):
            spks = rng.choice(N_SPK, 3, replace=False)
            # 25%: near-silent third source — the 2-active-speaker scenes
            # the flagship pipeline actually feeds the separator
            g3 = 0.05 if rng.random() < 0.25 else 1.0
            refs.append(np.stack([sep_ref(int(spks[0])),
                                  sep_ref(int(spks[1])),
                                  sep_ref(int(spks[2]), g3)]))
        refs = np.stack(refs)
        loss = sep_trainer.train_step(refs.sum(1), refs,
                                      np.ones((b_sep, t_len), np.float32))
        if step % 200 == 0:
            log(f"  sep step {step} loss {loss:.2f}")
    if sep_trainer is not None:
        losses["sep_final_loss"] = float(loss)

    # ------------------------------------------------------------- 2. OSD
    osd_model = OSDNet(osd_cfg)
    if "osd" in stages:
        log("[2/4] training OSD (frame BCE)")
    dur = 3.0
    t3 = int(dur * SR)

    def osd_batch(n):
        # r5 recipe: 30% SOLO scenes (the old recipe put an interferer in
        # EVERY scene — the trained model false-flagged 41-85% of
        # single-speaker frames at eval, collapsing every scene into one
        # whole-length overlap segment), distinct speaker bands, and a
        # wider interferer start/length range than the eval's fixed 0.9 s.
        wavs = np.zeros((n, t3), np.float32)
        marks = []
        for i in range(n):
            spks = rng.choice(N_SPK, 2, replace=False)
            s1 = say(rng, int(spks[0]), rand_word(rng, 12, 12))[:t3]
            wavs[i, : s1.size] = s1
            if rng.random() < 0.3:
                marks.append((-1.0, -1.0))       # solo: overlap label all-0
                continue
            a = rng.uniform(0.2, 2.2)
            s2 = say(rng, int(spks[1]), rand_word(rng, 4, 8))
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

    osd_trainer = None
    if "osd" in stages:
        osd_params = osd_model.init(jax.random.PRNGKey(seed), osd_batch(1)["feats"])
        osd_trainer = ModuleTrainer(
            osd_model, osd_params,
            lambda f, p, b: frame_bce_loss(f(p, b["feats"]), b["labels"],
                                           jnp.ones(b["labels"].shape[:2])),
            mesh=mesh, lr=3e-4)
        for step in range(1, n_steps(400) + 1):
            loss = osd_trainer.train_step(osd_batch(bs(8)))
            if step % 200 == 0:
                log(f"  osd step {step} bce {loss:.4f}")
        losses["osd_final_loss"] = float(loss)

    # --------------------------------------------------------- 3. speaker

    class EmbedderWithHead(nn.Module):
        @nn.compact
        def __call__(self, feats):
            emb = SpeakerEmbedder(spk_cfg, name="embedder")(feats)
            w = self.param("aam_centers", nn.initializers.normal(1.0),
                           (N_SPK, spk_cfg.embed_dim))
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

    spk_trainer = None
    if "spk" in stages:
        log("[3/4] training speaker embedder (AAM)")
        spk_params = spk_head.init(jax.random.PRNGKey(seed), spk_batch(2)["feats"])
        spk_trainer = ModuleTrainer(spk_head, spk_params, spk_loss, mesh=mesh, lr=3e-4)
        for step in range(1, n_steps(300) + 1):
            loss = spk_trainer.train_step(spk_batch(bs(16)))
            if step % 150 == 0:
                log(f"  spk step {step} aam {loss:.4f}")
        losses["spk_final_loss"] = float(loss)

    # ------------------------------------------------------------- 4. ASR
    # The recognizer gets the deepest budget: the committed gate requires
    # CER <= 0.2. Recipe (r5, each item pinned by the CER decomposition /
    # branch diagnostic in tools/diag_gate.py):
    #  - wide frontend (see asr_cfg above): low-band letters are
    #    unresolvable under the 25 ms/80-mel default;
    #  - per-utterance CMVN (asr_cfg.utt_cmvn): the separator's output
    #    scale is arbitrary (measured 44x) — normalization in the frontend,
    #    not hope in gain augmentation;
    #  - warmup+cosine lr (constant 5e-4 Adam bounced 0.27<->1.07 NLL and
    #    over-blanked at decode);
    #  - SUB-WORD WINDOWS: OSD segments start/end mid-word, so a third of
    #    the training samples are segment-shaped crops labeled by
    #    span_truth's rule;
    #  - SEPARATION-IN-THE-LOOP: a third of samples are the TRAINED
    #    separator's actual best branch on a fresh 2-speaker scene (the r4
    #    synthetic-residue model missed the separator's real artifact
    #    distribution: measured branch CER 0.71 vs 0.32 for additive
    #    residue at the same SI-SDR);
    #  - additive-residue + gain augmentation kept for the remainder.
    asr_model = SenseVoiceEncoder(asr_cfg)
    if "asr" in stages:
        log("[4/4] training SenseVoice-CTC")
    max_word, t_asr = 12, int(12 * SR * TONE_MS / 1000)
    tone_n = int(SR * TONE_MS / 1000)
    asr_steps = n_steps(2400)

    # host copies: the trainer's params are mesh-placed; a plain jit over
    # sharded leaves would SPMD-partition this side forward across the
    # virtual mesh (minutes of 1-core compile in the CI smoke)
    if sep_trainer is not None:
        sep_params = jax.tree.map(np.asarray, sep_trainer.state.params)
        sep_fwd = jax.jit(lambda pr, wav, m: sep_trainer.model.apply(pr, wav, m))
    else:
        sep_params = sep_fwd = None   # tripwire mode: residue augmentation only

    def residue(audio, db):
        other = say(rng, int(rng.integers(N_SPK)), rand_word(rng, 12, 12))[: audio.size]
        if other.size < audio.size:
            other = np.pad(other, (0, audio.size - other.size))
        s = np.linalg.norm(audio) / (np.linalg.norm(other) + 1e-9) * (10 ** (-db / 20))
        return audio + s * other

    def asr_batch(n):
        wavs = np.zeros((n, t_asr), np.float32)
        lens = np.zeros(n, np.int32)
        labels = np.zeros((n, max_word), np.int32)
        lab_lens = np.zeros(n, np.int32)
        sep_scene = np.zeros((n, t_asr), np.float32)
        sep_tgt = np.zeros((n, t_asr), np.float32)
        sep_idx = []
        for i in range(n):
            w = rand_word(rng, 3, max_word)
            spks = rng.choice(N_SPK, 2, replace=False)
            audio = say(rng, int(spks[0]), w)
            if rng.random() < 0.35:
                # segment-shaped crop: cut mid-letter on both sides, keep
                # the >=50%-covered letters as the label (span_truth's rule)
                a = rng.uniform(0, 0.6 * tone_n / SR) + rng.integers(0, max(len(w) - 2, 1)) * (tone_n / SR)
                b = min(a + rng.uniform(1.5, 2.8), audio.size / SR)
                ia, ib = int(a * SR), int(b * SR)
                if ib - ia > tone_n:
                    w = span_truth(w, a, b)
                    audio = audio[ia:ib]
            if not w:
                w = "a"
                audio = say(rng, 0, w)
            if (sep_fwd is not None and rng.random() < 0.35
                    and audio.size >= 2 * tone_n and len(sep_idx) < 4):
                # separation-in-the-loop: the sample BECOMES the trained
                # separator's output on a 2-speaker scene (branch chosen by
                # correlation with the true source; batched forward below)
                intr = say(rng, int(spks[1]), rand_word(rng, 3, 8))
                off = int(rng.integers(0, max(audio.size - tone_n, 1)))
                nn_ = min(intr.size, audio.size - off)
                scene = audio.copy()
                scene[off:off + nn_] += intr[:nn_]
                sep_scene[i, : scene.size] = scene
                sep_tgt[i, : audio.size] = audio
                sep_idx.append(i)
            else:
                if rng.random() < 0.4:
                    audio = residue(audio, rng.uniform(8.0, 20.0))
                audio = audio * rng.uniform(0.3, 3.0)
                audio = audio + 0.01 * rng.standard_normal(audio.size).astype(np.float32)
                wavs[i, : audio.size] = audio
            lens[i] = audio.size
            ids = tokens.encode(w)
            labels[i, : len(ids)] = ids
            lab_lens[i] = len(ids)
        if sep_idx:
            # FIXED-size sub-batch forward (<=4 rows, zero-padded): one
            # compiled program for the whole run, bounded per-step cost
            rows = np.asarray(sep_idx)
            sub_scene = np.zeros((4, t_asr), np.float32)
            sub_m = np.zeros((4, t_asr), np.float32)
            sub_scene[: len(rows)] = sep_scene[rows]
            sub_m[: len(rows)] = (np.arange(t_asr)[None, :]
                                  < lens[rows, None]).astype(np.float32)
            est_all = np.asarray(sep_fwd(sep_params, jnp.asarray(sub_scene),
                                         jnp.asarray(sub_m)))   # [4, 3, T]
            m_all = np.zeros((n, t_asr), np.float32)
            m_all[rows] = sub_m[: len(rows)]
            est, tgt = est_all[: len(rows)], sep_tgt[rows]
            # oracle branch pick: highest correlation with the true source
            corr = np.abs(np.einsum("kst,kt->ks", est, tgt))
            best = np.argmax(corr, axis=1)
            br = est[np.arange(len(rows)), best]
            # level restoration exactly as the engine's asr_branch_norm
            peak = np.maximum(np.max(np.abs(br), axis=1, keepdims=True), 1e-6)
            wavs[rows] = br * (0.25 / peak) * m_all[rows]
        return dict(wav=jnp.asarray(wavs), lens=jnp.asarray(lens),
                    labels=jnp.asarray(labels), lab_lens=jnp.asarray(lab_lens))

    asr_trainer = None
    if "asr" in stages:
        b0 = asr_batch(2)
        feats0, mask0 = sensevoice_frontend(b0["wav"], b0["lens"], asr_cfg)
        asr_params = asr_model.init(jax.random.PRNGKey(seed), feats0, mask0)

    def asr_loss(f, p, b):
        feats, mask = sensevoice_frontend(b["wav"], b["lens"], asr_cfg)
        logits = f(p, feats, mask)[:, asr_cfg.num_prompt:]
        return ctc_loss(logits, mask.astype(jnp.float32), b["labels"], b["lab_lens"],
                        blank_id=tokens.blank_id)

    if "asr" in stages:
        asr_trainer = ModuleTrainer(asr_model, asr_params, asr_loss, mesh=mesh,
                                    lr=warmup_cosine(1e-3, asr_steps))
        for step in range(1, asr_steps + 1):
            loss = asr_trainer.train_step(asr_batch(bs(16)))
            if step % 300 == 0:
                log(f"  asr step {step} ctc {loss:.3f}")
        losses["asr_final_loss"] = float(loss)

    # ------------------------------------------- assemble the model pack
    pack = ModelPack(preset, seed=seed, tokens=tokens)
    if sep_trainer is not None:
        pack.load_params("sep3", sep_trainer.state.params)
    if osd_trainer is not None:
        pack.load_params("osd", osd_trainer.state.params)
    if spk_trainer is not None:
        spk_vars = spk_trainer.state.params
        spk_packed = {"params": spk_vars["params"]["embedder"]}
        if "batch_stats" in spk_vars:
            spk_packed["batch_stats"] = spk_vars["batch_stats"]["embedder"]
        pack.load_params("spk", spk_packed)
    if asr_trainer is not None:
        pack.load_params("asr", asr_trainer.state.params)
    if ckpt_dir is not None:
        from ..train.checkpoint import save_model_pack

        save_model_pack(pack, ckpt_dir)
        losses["train_wall_sec"] = round(time.time() - t_start, 1)
        Path(f"{ckpt_dir}.losses.json").write_text(json.dumps(losses))
        log(f"saved world pack -> {ckpt_dir}")
    engine = StageEngine(pack, BucketSpec(lengths=default_buckets(SR, 0.5, 8.0),
                                          max_batch=8))
    return engine, tokens, losses


def run_quality_gate(steps_scale: float = 1.0, n_scenes: int = 6,
                     seed: int = 0, eval_seed: int = 424242,
                     log=print, ckpt_dir: Optional[str] = None,
                     reuse_ckpt: bool = False) -> Dict:
    """Train the world pack, calibrate sv_threshold on dev scenes, run the
    flagship pipeline on held-out scenes -> metrics dict (the reference's
    field names + per-record CER, decomposed per layer: clean recognizer /
    oracle-separated spans / actual pipeline branches).

    ``ckpt_dir`` + ``reuse_ckpt`` skip the ~20 min retrain when a saved
    world pack exists (tools/diag_gate.py uses this to iterate on the
    eval side)."""
    import tempfile

    from ..audio_io import write_wav
    from ..metrics import cer
    from ..utils.config import Overlap3Config
    from .offline_overlap3 import Overlap3Pipeline

    t0 = time.time()
    restored = reuse_ckpt and ckpt_dir is not None and Path(ckpt_dir).exists()
    if restored:
        log(f"restoring world pack from {ckpt_dir} (skipping training)")
        engine, tokens = build_world_engine(seed, ckpt_dir)
        lp = Path(f"{ckpt_dir}.losses.json")
        losses = json.loads(lp.read_text()) if lp.exists() else {}
    else:
        engine, tokens, losses = train_world_pack(steps_scale, seed, log=log,
                                                  ckpt_dir=ckpt_dir)
    t_train = time.time() - t0

    # ------------------------------ calibrate sv_threshold on dev scenes
    # (standard practice: pick the operating point from a small dev set;
    # the reference hard-codes 0.6 for its particular checkpoint)
    eval_rng = np.random.default_rng(eval_seed)
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
    log(f"calibrated sv_threshold={sv_thr:.3f} "
        f"(target-branch {np.mean(tgt_scores):.3f}, "
        f"best-other {np.mean(other_scores):.3f})")

    dur = 3.0
    t3 = int(dur * SR)
    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        paths, truths, ref_rows = [], {}, []
        tgt_refs: Dict[str, np.ndarray] = {}   # oracle target source per scene
        for i in range(n_scenes):
            w_t = rand_word(eval_rng, 6, 6) + rand_word(eval_rng, 6, 6)
            tgt = say(eval_rng, target_spk, w_t)[:t3]
            scene = np.zeros(t3, np.float32)
            scene[: tgt.size] += tgt
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
            r1 = tdp / f"tref_{i}.wav"
            r2 = tdp / f"iref_{i}.wav"
            tgt_full = np.zeros(t3, np.float32)
            tgt_full[: tgt.size] = tgt
            tgt_refs[str(mp)] = tgt_full
            write_wav(r1, tgt_full, SR)
            write_wav(r2, intr_full, SR)
            ref_rows.append(f"{mp},{r1},{r2}")
        (tdp / "refs.csv").write_text("mix,ref1,ref2\n" + "\n".join(ref_rows))
        write_wav(tdp / "target.wav", enroll_wav, SR)

        cfg = Overlap3Config(
            input_wavs=paths, target_wav=str(tdp / "target.wav"),
            refs_csv=str(tdp / "refs.csv"),
            sv_threshold=sv_thr,       # REAL gating at the calibrated point
            osd_thr=0.5, min_overlap_dur=0.3, max_segment_sec=8.0,
            eval_separation=True, seed=seed, preset="tiny",
        )
        t1 = time.time()
        result = Overlap3Pipeline(cfg, engine=engine).run()
        t_pipe = time.time() - t1
        # warm re-run: the first pass pays XLA compiles for every fresh
        # (bucket, batch) shape this world produces — tens of seconds that
        # have nothing to do with steady-state speed. The artifact reports
        # BOTH walls so its rtf is self-explaining next to bench.py's
        # (r4 verdict weak #6: a 1500x rtf discrepancy with no note).
        t2 = time.time()
        result_warm = Overlap3Pipeline(cfg, engine=engine).run()
        t_pipe_warm = time.time() - t2
        result = result_warm       # steady-state timings; records identical

        m = dict(result.metrics)
        # ---- CER decomposition: pin the failing layer by data ----
        # Diagnostic crops carry a -46 dB dither: every training sample has
        # a noise floor (recorded audio always does), so PRISTINE digital
        # tones are out-of-distribution for the recognizer — measured CER
        # 0.205 noiseless vs 0.000 at dither >= 0.002 on the same audio.
        # The dither makes (a)/(b) measure the recognizer, not that gap.
        dit = np.random.default_rng(1234)

        def dither(x):
            return x + 0.005 * dit.standard_normal(x.size).astype(np.float32)

        # (a) clean recognizer: the oracle target source, whole scene
        clean_hyps = engine.transcribe([dither(tgt_refs[p]) for p in paths])
        clean_cers = [cer(truths[p], h) for p, h in zip(paths, clean_hyps)]
        # per-record CER: emitted text vs the letters the target actually
        # voiced (>=50% of the slot) inside the record's span
        span_cers: List[float] = []
        by_wav: Dict[str, List[str]] = {}
        recs = sorted(result.segments, key=lambda r: (r["wav"], r["start"]))
        # (b) oracle separation: the target SOURCE cut on the pipeline's own
        # spans — isolates span algebra + recognizer from separator residue
        oracle_crops, oracle_truths = [], []
        for rec in recs:
            ia, ib = int(rec["start"] * SR), int(rec["end"] * SR)
            oracle_crops.append(dither(tgt_refs[rec["wav"]][ia:ib]))
            oracle_truths.append(span_truth(truths[rec["wav"]], rec["start"], rec["end"]))
        oracle_hyps = engine.transcribe(oracle_crops) if oracle_crops else []
        oracle_cers = [cer(t, h) for t, h in zip(oracle_truths, oracle_hyps) if t]
        # (c) the actual pipeline branches
        for rec, o_hyp in zip(recs, oracle_hyps):
            truth = span_truth(truths[rec["wav"]], rec["start"], rec["end"])
            if truth:
                span_cers.append(cer(truth, rec["text"]))
            by_wav.setdefault(rec["wav"], []).append(rec["text"])
            log(f"  rec {Path(rec['wav']).name} [{rec['start']:.2f},{rec['end']:.2f}] "
                f"kind={'ovl' if rec.get('is_overlap') else 'clean'} "
                f"truth={truth!r} hyp={rec['text']!r} oracle_hyp={o_hyp!r}")
        concat_cers = [cer(truths[w], "".join(ts)) for w, ts in by_wav.items()]

    m.update({
        "cer_mean": round(float(np.mean(span_cers)), 4) if span_cers else None,
        "cer_records": len(span_cers),
        "cer_concat_mean": round(float(np.mean(concat_cers)), 4) if concat_cers else None,
        "cer_clean_mean": round(float(np.mean(clean_cers)), 4) if clean_cers else None,
        "cer_oracle_sep_mean": round(float(np.mean(oracle_cers)), 4) if oracle_cers else None,
        "sv_threshold_calibrated": round(sv_thr, 4),
        "n_scenes": n_scenes,
        "steps_scale": steps_scale,
        # restored runs: train_wall_sec is the RESTORE time; the training
        # wall lives with the run that wrote the checkpoint
        "restored_from_ckpt": bool(restored),
        "train_wall_sec": round(t_train, 1),
        "pipeline_wall_sec": round(t_pipe_warm, 1),
        "pipeline_wall_cold_sec": round(t_pipe, 1),
        "pipeline_wall_note": (
            "cold wall includes first-shape XLA compiles; metrics/rtf come "
            "from the warm pass (records are deterministic and identical)"),
        **{k: round(v, 4) for k, v in losses.items()},
    })
    log("\n==== quality gate metrics ====")
    log(f"target_hit_rate_segments={m['target_hit_rate_segments']}")
    log(f"sep_sisdr_mean={m['sep_sisdr_mean']} sep_sisdri_mean={m['sep_sisdri_mean']}")
    log(f"cer_mean={m['cer_mean']} (per-record, {m['cer_records']} records) "
        f"cer_concat_mean={m['cer_concat_mean']}")
    log(f"decomposition: clean={m['cer_clean_mean']} "
        f"oracle_sep={m['cer_oracle_sep_mean']} pipeline={m['cer_mean']}")
    return m


def write_quality_json(m: Dict, out_path: str, hit_gate: float = 0.9,
                       cer_gate: float = 0.2) -> Dict:
    """Evaluate the gates, stamp the artifact, write JSON -> artifact."""
    import jax

    hit = m.get("target_hit_rate_segments")
    c = m.get("cer_mean")
    artifact = {
        "kind": "quality_gate",
        "world": "synthetic octave-band speakers / eighth-octave letters",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "gates": {"target_hit_rate_segments": f">={hit_gate}",
                  "cer_mean": f"<={cer_gate}"},
        "quality_ok": bool(hit is not None and hit >= hit_gate
                           and c is not None and c <= cer_gate),
        # Why the gate world widens the ASR frontend while the serving
        # preset keeps the 25 ms/80-mel default (r4 verdict #8): this
        # world's spk0 letters sit 44 Hz apart at a 500 Hz base — MEASURED
        # per-speaker clean CER under the default frontend was spk0 0.97 /
        # spk1 0.72 / spk2 0.05 / spk3 0.05 (r4 _diag_asr run), vs
        # 0.00-0.04 for all four speakers under 64 ms/128 mel. Real speech
        # formants are hundreds of Hz apart, which the default frontend
        # resolves — the widening compensates for the synthetic world's
        # band spacing, not for a serving deficiency.
        "frontend_evidence": {
            "default_25ms_80mel_clean_cer_by_spk": [0.97, 0.72, 0.05, 0.05],
            "wide_64ms_128mel_clean_cer_by_spk": [0.04, 0.02, 0.0, 0.0],
            "measured_in": "round-4 _diag_asr per-speaker clean-CER sweep",
        },
        **m,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1))
    return artifact
