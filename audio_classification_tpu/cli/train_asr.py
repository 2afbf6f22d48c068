"""Train / fine-tune the SenseVoice-style CTC recognizer with resume.

New capability over the reference, which never trains any model — its ASR
story is consuming sherpa-onnx exports as-is (reference: src/model.py:37-100
builds OfflineRecognizer objects from .onnx files and that is the whole
lifecycle). Here the CTC training loop from examples/train_asr_demo gets a
product surface:

- data: a manifest of ``{"wav": ..., "text": ...}`` JSONL lines (or
  ``wav<TAB>text``), resampled to 16 kHz through the same polyphase path
  the pipelines use; or ``--synthetic`` tone-language scenes for a
  no-corpus smoke;
- vocab: ``--tokens tokens.txt`` (single-character symbols — label
  encoding is char-level; the reference ships no trainer at all, and BPE
  label encoding is out of scope) or a char vocab auto-built from the
  manifest texts;
- init: fresh from flags, or ``--init-onnx model.onnx`` maps a reference
  SenseVoice export's weights onto the trainable flax encoder
  (models/convert/onnx_graph_map) and CONTINUES TRAINING it — fine-tune
  the reference's own model on TPU;
- checkpoint/resume: ``--ckpt-dir`` + ``--resume`` restore params,
  optimizer moments and step exactly (orbax, same machinery as
  cli/train_separator);
- deployment: ``--export`` writes a params-only orbax dir the serving
  CLIs load via ``--sense-voice <dir>`` (family stays "sensevoice").

Quality gate printed before/after: CER through the same on-device greedy
CTC decode + token table the pipelines use (benchmark CER formula,
reference: scripts/benchmark_pipeline.py:239-249).
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

SR = 16000
_ALPHABET = "abcdefgh"
_TONE_MS = 150


def parse_args(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    d = p.add_argument_group("data")
    d.add_argument("--manifest", default="",
                   help="JSONL {wav,text} or TSV wav<TAB>text training list")
    d.add_argument("--val-manifest", default="",
                   help="Held-out list for CER (default: tail of --manifest)")
    d.add_argument("--synthetic", action="store_true",
                   help="Tone-language smoke (no corpus needed)")
    d.add_argument("--max-seconds", type=float, default=4.0,
                   help="Pad/crop every utterance to this length")
    v = p.add_argument_group("vocab")
    v.add_argument("--tokens", default="",
                   help="tokens.txt (single-char symbols); default: char "
                        "vocab built from the manifest texts")
    t = p.add_argument_group("training")
    t.add_argument("--steps", type=int, default=400)
    t.add_argument("--batch", type=int, default=16, help="Per-data-shard batch")
    t.add_argument("--lr", type=float, default=5e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=100)
    m = p.add_argument_group("model (ignored when --init-onnx sets dims)")
    m.add_argument("--dim", type=int, default=96)
    m.add_argument("--heads", type=int, default=4)
    m.add_argument("--layers", type=int, default=2)
    m.add_argument("--conv-kernel", type=int, default=7,
                   help="Depthwise conv kernel (match the serving preset's "
                        "asr config when exporting: full=7, tiny=3)")
    m.add_argument("--init-onnx", default="",
                   help="SenseVoice .onnx export to map and fine-tune "
                        "(--preset dims; pass the export's --cmvn too so "
                        "training sees the features it was trained on)")
    m.add_argument("--cmvn", default="",
                   help="Kaldi am.mvn stats applied in the frontend "
                        "(match serving's --cmvn; essential with "
                        "--init-onnx fine-tuning)")
    m.add_argument("--preset", default="full", choices=["full", "tiny"],
                   help="Which preset's asr dims --init-onnx maps onto "
                        "(real sherpa exports are full-preset shaped)")
    par = p.add_argument_group("parallelism")
    par.add_argument("--data-parallel", type=int, default=0)
    par.add_argument("--model-parallel", type=int, default=0)
    par.add_argument("--slices", type=int, default=1,
                     help="Multi-slice jobs: DP spans slices x chips, DCN "
                          "factor outermost; TP stays in-slice")
    par.add_argument("--seq-parallel", action="store_true",
                     help="Shard the frame axis over the data axis inside "
                          "every attention block (ring attention; for "
                          "--max-seconds too long for one chip — batch is "
                          "replicated, gradients flow through the ring)")
    c = p.add_argument_group("checkpointing")
    c.add_argument("--ckpt-dir", default="")
    c.add_argument("--save-every", type=int, default=100)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--export", default="",
                   help="Write final params-only orbax dir (serves via "
                        "--sense-voice <dir>)")
    c.add_argument("--export-onnx", default="",
                   help="Also write a standard ONNX export of the trained "
                        "encoder (feats+language -> logits, like the "
                        "reference's sherpa exports; runs on onnxruntime or "
                        "--onnx-exec direct)")
    c.add_argument("--export-quant", default="none", choices=["none", "int8"],
                   help="int8: --export-onnx writes dynamic-quant "
                        "MatMulInteger graphs — the same artifact type as "
                        "the reference's int8 SenseVoice export (~4x "
                        "smaller weights, s8 MXU at serving)")
    return p.parse_args(argv)


def _speak(rng, word: str) -> np.ndarray:
    seg = int(SR * _TONE_MS / 1000)
    out = []
    for ch in word:
        f = 300.0 * (2 ** (_ALPHABET.index(ch) / 4.0))
        tt = np.arange(seg) / SR
        out.append(0.25 * np.sin(2 * np.pi * f * tt).astype(np.float32))
    return np.concatenate(out)


def read_manifest(path: str):
    """-> [(wav_path, text)]; JSONL {wav,text} or TSV wav<TAB>text."""
    from ..train.data import read_manifest as _rm

    return _rm(path, "text")


class ManifestSampler:
    """Random (padded wav, label ids) batches from a manifest, with a
    bounded decode cache so repeated epochs skip re-decoding."""

    def __init__(self, items, tokens, t_max, rng):
        from ..train.data import WavCache

        self.items, self.tokens, self.t_max, self.rng = items, tokens, t_max, rng
        self.max_label = max(
            (len(tokens.encode(txt)) for _, txt in items), default=1) or 1
        self._wav = WavCache()

    def batch(self, n):
        wavs = np.zeros((n, self.t_max), np.float32)
        lens = np.zeros(n, np.int32)
        labels = np.zeros((n, self.max_label), np.int32)
        lab_lens = np.zeros(n, np.int32)
        texts = []
        for i in range(n):
            path, text = self.items[int(self.rng.integers(len(self.items)))]
            audio = self._wav(path)[: self.t_max]
            wavs[i, : audio.size] = audio
            lens[i] = audio.size
            ids = self.tokens.encode(text)[: self.max_label]
            labels[i, : len(ids)] = ids
            lab_lens[i] = len(ids)
            texts.append(text)
        return dict(wav=wavs, lens=lens, labels=labels, lab_lens=lab_lens), texts


class SyntheticSampler:
    def __init__(self, tokens, rng):
        self.tokens, self.rng = tokens, rng
        self.t_max = int(8 * SR * _TONE_MS / 1000)
        self.max_label = 8

    def batch(self, n):
        wavs = np.zeros((n, self.t_max), np.float32)
        lens = np.zeros(n, np.int32)
        labels = np.zeros((n, self.max_label), np.int32)
        lab_lens = np.zeros(n, np.int32)
        texts = []
        for i in range(n):
            w = "".join(self.rng.choice(list(_ALPHABET))
                        for _ in range(self.rng.integers(3, self.max_label + 1)))
            audio = _speak(self.rng, w)
            wavs[i, : audio.size] = audio
            lens[i] = audio.size
            ids = self.tokens.encode(w)
            labels[i, : len(ids)] = ids
            lab_lens[i] = len(ids)
            texts.append(w)
        return dict(wav=wavs, lens=lens, labels=labels, lab_lens=lab_lens), texts


def main(argv=None):
    args = parse_args(argv)
    if not args.synthetic and not args.manifest:
        raise SystemExit("pick a data source: --manifest FILE or --synthetic")

    from ..runtime.device import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ..metrics import cer
    from ..models.asr.ctc import ctc_greedy_decode, ctc_loss
    from ..models.asr.sensevoice import (
        SenseVoiceConfig, SenseVoiceEncoder, sensevoice_frontend,
    )
    from ..models.asr.tokens import TokenTable
    from ..parallel.mesh import make_mesh
    from ..train.trainer import ModuleTrainer

    rng = np.random.default_rng(args.seed)
    if args.synthetic:
        tokens = TokenTable.char_table(_ALPHABET)
        sampler = SyntheticSampler(tokens, rng)
        val_sampler = SyntheticSampler(tokens, np.random.default_rng(123))
    else:
        items = read_manifest(args.manifest)
        if args.tokens:
            tokens = TokenTable.load(args.tokens)
        else:
            charset = "".join(sorted({ch for _, txt in items for ch in txt}))
            tokens = TokenTable.char_table(charset)
        if args.val_manifest:
            val_items = read_manifest(args.val_manifest)
        else:  # hold out the manifest tail
            cut = max(len(items) - max(len(items) // 10, 1), 1)
            items, val_items = items[:cut], items[cut:]
        t_max = int(args.max_seconds * SR)
        sampler = ManifestSampler(items, tokens, t_max, rng)
        val_sampler = ManifestSampler(val_items, tokens, t_max,
                                      np.random.default_rng(123))

    if args.init_onnx:
        import dataclasses

        from ..engine.runtime import EnginePreset, tiny_preset

        base = tiny_preset() if args.preset == "tiny" else EnginePreset()
        cfg = dataclasses.replace(base.asr, vocab_size=tokens.vocab_size)
    else:
        cfg = SenseVoiceConfig(vocab_size=tokens.vocab_size, dim=args.dim,
                               heads=args.heads, layers=args.layers,
                               conv_kernel=args.conv_kernel)
    model = SenseVoiceEncoder(cfg)

    cmvn_mean = cmvn_istd = None
    if args.cmvn:
        from ..models.convert.assets import load_kaldi_cmvn

        shift, scale = load_kaldi_cmvn(args.cmvn)
        cmvn_mean, cmvn_istd = jnp.asarray(shift), jnp.asarray(scale)
        print(f"[train_asr] CMVN stats from {args.cmvn} "
              f"(dim {cmvn_mean.shape[-1]})")

    def frontend(wav, lens):
        return sensevoice_frontend(wav, lens, cfg,
                                   cmvn_mean=cmvn_mean, cmvn_istd=cmvn_istd)

    b0, _ = sampler.batch(2)
    # jitted: eager setup-time device code pays ~90 ms per op through the
    # tunnel (CLAUDE.md)
    feats0, mask0 = jax.jit(frontend)(jnp.asarray(b0["wav"]),
                                      jnp.asarray(b0["lens"]))
    if args.init_onnx:
        from ..models.convert.onnx_graph_map import import_onnx

        params = import_onnx(args.init_onnx, "sensevoice", cfg)
        print(f"[train_asr] fine-tuning mapped weights from {args.init_onnx}")
    else:
        # jit the init: eagerly it dispatches one tunnel round-trip per op
        # (~90 ms each — CLAUDE.md; ModelPack jits inits for the same reason)
        params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), feats0, mask0)

    dp, mp = max(args.data_parallel, 1), max(args.model_parallel, 1)
    n_dev = dp * mp if (args.data_parallel or args.model_parallel) else len(jax.devices())
    mesh = make_mesh(n_dev, model_axis=mp if mp > 1 else 1,
                     slices=max(args.slices, 1))
    sp_mesh = mesh if args.seq_parallel else None

    def loss_fn(apply_fn, p_, b_):
        feats, mask = frontend(b_["wav"], b_["lens"])
        logits = apply_fn(p_, feats, mask, mesh=sp_mesh)[:, cfg.num_prompt:]
        return ctc_loss(logits, mask.astype(jnp.float32), b_["labels"],
                        b_["lab_lens"], blank_id=tokens.blank_id)

    trainer = ModuleTrainer(model, params, loss_fn, mesh=mesh, lr=args.lr,
                            shard_batch=not args.seq_parallel)

    start_step = 0
    if args.resume and args.ckpt_dir and Path(args.ckpt_dir).is_dir():
        start_step = trainer.restore(args.ckpt_dir)
        print(f"[train_asr] resumed {args.ckpt_dir} at step {start_step}")

    @jax.jit
    def _eval_fwd(p_, wav, lens):
        # whole eval forward (frontend + encoder + greedy decode) in ONE
        # program: eager dispatch pays ~90 ms/op through the tunnel
        feats, mask = frontend(wav, lens)
        logits = model.apply(p_, feats, mask)[:, cfg.num_prompt:]
        return ctc_greedy_decode(logits, mask.astype(jnp.float32),
                                 tokens.blank_id)

    def eval_cer(n=24):
        b, texts = val_sampler.batch(n)
        ids, lens_out = _eval_fwd(trainer.state.params,
                                  jnp.asarray(b["wav"]), jnp.asarray(b["lens"]))
        ids, lens_out = np.asarray(ids), np.asarray(lens_out)
        hyps = [tokens.decode(ids[i][: int(lens_out[i])]) for i in range(n)]
        pairs = list(zip(texts, hyps))
        return float(np.mean([cer(r, h) for r, h in pairs])), pairs[0]

    c0, (r0, h0) = eval_cer()
    print(f"[train_asr] CER at step {start_step}: {c0:.3f}  "
          f"(e.g. ref='{r0}' hyp='{h0}')")
    t0 = time.time()
    # seq-parallel spends the data axis on frames; batch stays replicated
    global_batch = args.batch * (1 if args.seq_parallel else mesh.shape["data"])
    for step in range(start_step + 1, args.steps + 1):
        b, _ = sampler.batch(global_batch)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        loss = trainer.train_step(b)
        if step % args.log_every == 0 or step == start_step + 1:
            rate = (time.time() - t0) / max(step - start_step, 1) * 1000
            print(f"step {step:5d}  CTC loss {loss:8.3f}  ({rate:.0f} ms/step)")
        if args.ckpt_dir and args.save_every and step % args.save_every == 0:
            trainer.save(args.ckpt_dir)
            print(f"[train_asr] checkpoint @ step {step} -> {args.ckpt_dir}")
    if args.ckpt_dir and trainer.state.step > start_step:
        trainer.save(args.ckpt_dir)
    c1, (r1, h1) = eval_cer()
    print(f"[train_asr] CER after: {c1:.3f}  (e.g. ref='{r1}' hyp='{h1}')")

    if args.export:
        from ..train.checkpoint import save_params

        save_params(trainer.state.params, args.export)
        print(f"[train_asr] exported serving params -> {args.export} "
              f"(use --sense-voice {args.export}; vocab must match --tokens)")
    if args.export_onnx:
        from ..models.convert.onnx_export import export_sensevoice

        host_params = jax.tree.map(np.asarray, trainer.state.params)
        frames = feats0.shape[1]  # the training bucket's static length
        export_sensevoice(host_params, cfg, args.export_onnx, frames=frames,
                          quant=args.export_quant)
        q = f", {args.export_quant}" if args.export_quant != "none" else ""
        print(f"[train_asr] exported ONNX -> {args.export_onnx} "
              f"(feats [batch,{frames},{cfg.lfr_m * cfg.num_mel}] + "
              f"language [1] -> logits{q})")
    from ..train.data import write_run_manifest

    for d in filter(None, {args.ckpt_dir, args.export}):
        write_run_manifest(d, args, {"cer_before": c0, "cer_after": c1})
    return c0, c1


if __name__ == "__main__":
    main()
