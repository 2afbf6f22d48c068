"""Train the speaker embedder (AAM-softmax) with resume + serving export.

New capability over the reference, whose speaker extractor is a frozen
3D-Speaker ERes2Net ONNX file (reference: src/model.py:103-124 builds a
sherpa SpeakerEmbeddingExtractor and never trains). Here the AAM-softmax
recipe from examples/train_speaker_demo gets a product surface:

- data: a manifest of ``{"wav": ..., "speaker": ...}`` JSONL lines (or
  ``wav<TAB>speaker``), cropped/padded and resampled to 16 kHz through the
  same polyphase path the pipelines use; or ``--synthetic`` harmonic
  "speakers" (fixed timbre + f0 band per identity) for a no-corpus smoke;
- objective: AAM-softmax (additive angular margin) over the manifest's
  speaker set — the class-center matrix trains jointly with the embedder
  and is dropped at export;
- checkpoint/resume: ``--ckpt-dir`` + ``--resume`` restore params,
  optimizer moments and step exactly (orbax, same machinery as the other
  training CLIs);
- deployment: ``--export`` writes an embedder-only orbax dir the serving
  CLIs load via ``--spk-embed-model <dir>`` (the engine's spk stage; the
  SpeakerASRModels facade and SpeakerBank search consume its embeddings
  unchanged).

Quality gate printed before/after: held-out identification accuracy
through the REAL SpeakerBank cosine-search path (the gate the pipelines
use — reference: overlap3_core.py:397,568) plus same/different-speaker
cosine means.

BatchNorm note: the embedder's BN layers run in inference mode
(use_running_average=True) with their init statistics, so they act as
learnable affines during training — matching examples/train_speaker_demo
and keeping the train step a pure params-only program.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

SR = 16000


def parse_args(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    d = p.add_argument_group("data")
    d.add_argument("--manifest", default="",
                   help="JSONL {wav,speaker} or TSV wav<TAB>speaker list")
    d.add_argument("--val-manifest", default="",
                   help="Held-out list for the accuracy gate (default: tail "
                        "of --manifest)")
    d.add_argument("--synthetic", action="store_true",
                   help="Harmonic-speaker smoke (no corpus needed)")
    d.add_argument("--num-speakers", type=int, default=8,
                   help="Synthetic identity count")
    d.add_argument("--max-seconds", type=float, default=2.0,
                   help="Crop/pad every utterance to this length")
    t = p.add_argument_group("training")
    t.add_argument("--steps", type=int, default=300)
    t.add_argument("--batch", type=int, default=16, help="Per-data-shard batch")
    t.add_argument("--lr", type=float, default=3e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=100)
    t.add_argument("--margin", type=float, default=0.2, help="AAM margin")
    t.add_argument("--aam-scale", type=float, default=30.0)
    m = p.add_argument_group("model (match the serving preset when "
                             "exporting: full=32,64,128,256/192, tiny=8,16/32)")
    m.add_argument("--channels", default="8,16",
                   help="Comma-separated Res2Net stage widths")
    m.add_argument("--embed-dim", type=int, default=32)
    m.add_argument("--scale", type=int, default=4)
    m.add_argument("--asp-hidden", type=int, default=128)
    par = p.add_argument_group("parallelism")
    par.add_argument("--data-parallel", type=int, default=0)
    par.add_argument("--model-parallel", type=int, default=0)
    par.add_argument("--slices", type=int, default=1,
                     help="Multi-slice jobs: DP spans slices x chips, DCN "
                          "factor outermost; TP stays in-slice")
    c = p.add_argument_group("checkpointing")
    c.add_argument("--ckpt-dir", default="")
    c.add_argument("--save-every", type=int, default=100)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--export", default="",
                   help="Write embedder-only orbax dir (serves via "
                        "--spk-embed-model <dir>)")
    c.add_argument("--export-onnx", default="",
                   help="Also write a standard ONNX export of the trained "
                        "embedder (fbank feats -> embedding, like the "
                        "reference's 3D-Speaker export; runs on onnxruntime "
                        "or --onnx-exec direct)")
    return p.parse_args(argv)


def synth_utterance(rng, spk: int, dur: float = 1.0) -> np.ndarray:
    """A 'speaker' = a stable harmonic amplitude profile + f0 band (the
    same identity model as examples/train_speaker_demo)."""
    t = int(dur * SR)
    tt = np.arange(t) / SR
    prof = np.random.default_rng(1000 + spk)
    amps = prof.uniform(0.2, 1.0, size=6)
    f0 = prof.uniform(90, 300) * rng.uniform(0.95, 1.05)
    phase = rng.uniform(0, 6.28, size=6)
    env = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * tt
                             + rng.uniform(0, 6.28))
    sig = sum(a * np.sin(2 * np.pi * f0 * (h + 1) * tt + ph)
              for h, (a, ph) in enumerate(zip(amps, phase)))
    return (0.1 * env * sig).astype(np.float32)


def read_manifest(path: str):
    """-> [(wav_path, speaker)]; JSONL {wav,speaker} or TSV."""
    from ..train.data import read_manifest as _rm

    return _rm(path, "speaker")


class ManifestSampler:
    """Random (cropped wav, label id) batches from a manifest."""

    def __init__(self, items, spk2id, t_max, rng):
        from ..train.data import WavCache

        self.items, self.spk2id = items, spk2id
        self.t_max, self.rng = t_max, rng
        self._wav = WavCache()

    def batch(self, n):
        wavs = np.zeros((n, self.t_max), np.float32)
        labels = np.zeros(n, np.int32)
        for i in range(n):
            path, spk = self.items[int(self.rng.integers(len(self.items)))]
            audio = self._wav(path)
            if audio.size > self.t_max:
                off = int(self.rng.integers(audio.size - self.t_max + 1))
                audio = audio[off:off + self.t_max]
            wavs[i, : audio.size] = audio
            labels[i] = self.spk2id[spk]
        return wavs, labels


class SyntheticSampler:
    def __init__(self, n_spk, t_max, rng):
        self.n_spk, self.t_max, self.rng = n_spk, t_max, rng

    def batch(self, n):
        labels = self.rng.integers(0, self.n_spk, size=n).astype(np.int32)
        wavs = np.zeros((n, self.t_max), np.float32)
        for i, s in enumerate(labels):
            u = synth_utterance(self.rng, int(s), self.t_max / SR)[: self.t_max]
            wavs[i, : u.size] = u
        return wavs, labels


def main(argv=None):
    args = parse_args(argv)
    if not args.synthetic and not args.manifest:
        raise SystemExit("pick a data source: --manifest FILE or --synthetic")

    from ..runtime.device import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ..models.speaker import SpeakerBank, SpeakerEmbedder, SpeakerEmbedderConfig
    from ..ops import FbankConfig, log_mel_fbank
    from ..parallel.mesh import make_mesh
    from ..train.losses import aam_softmax_loss
    from ..train.trainer import ModuleTrainer

    cfg = SpeakerEmbedderConfig(
        channels=tuple(int(c) for c in args.channels.split(",")),
        scale=args.scale, embed_dim=args.embed_dim, asp_hidden=args.asp_hidden)
    t_max = int(args.max_seconds * SR)
    rng = np.random.default_rng(args.seed)

    if args.synthetic:
        n_spk = args.num_speakers
        sampler = SyntheticSampler(n_spk, t_max, rng)
        val_sampler = SyntheticSampler(n_spk, t_max, np.random.default_rng(123))
    else:
        items = read_manifest(args.manifest)
        if args.val_manifest:
            val_items = read_manifest(args.val_manifest)
        else:  # hold out the manifest tail
            cut = max(len(items) - max(len(items) // 10, 1), 1)
            items, val_items = items[:cut], items[cut:]
        # ids over the UNION of manifests: a held-out speaker absent from
        # training is fine for the bank-search gate (open-set), it just
        # gets an AAM class the optimizer never visits
        spk2id = {s: i for i, s in enumerate(sorted(
            {s for _, s in items} | {s for _, s in val_items}))}
        n_spk = len(spk2id)
        sampler = ManifestSampler(items, spk2id, t_max, rng)
        val_sampler = ManifestSampler(val_items, spk2id, t_max,
                                      np.random.default_rng(123))
    print(f"[train_speaker] {n_spk} speakers, crop {args.max_seconds}s")

    fb = FbankConfig()
    fbank_batch = jax.jit(lambda w: log_mel_fbank(w, fb))

    class EmbedderWithHead(nn.Module):
        """Embedder + trainable AAM class centers in one module; the
        centers are dropped at export (serving only needs the embedder)."""

        @nn.compact
        def __call__(self, feats):
            emb = SpeakerEmbedder(cfg, name="embedder")(feats)
            w = self.param("aam_centers", nn.initializers.normal(1.0),
                           (n_spk, cfg.embed_dim))
            return emb, w

    model = EmbedderWithHead()
    feats0 = fbank_batch(jnp.zeros((1, t_max)))
    # jitted init: eager dispatch pays ~90 ms/op through the tunnel
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), feats0)
    # the BN layers run in inference mode with their INIT statistics
    # (learnable-affine behavior); keeping batch_stats out of the trainable
    # tree stops Adam from gradient-updating running means/vars (a drifted
    # negative var would NaN rsqrt)
    stats = {k: v for k, v in variables.items() if k != "params"}
    params = {"params": variables["params"]}

    def loss_fn(apply_fn, p_, b_):
        emb, w = apply_fn({**p_, **stats}, b_["feats"])
        return aam_softmax_loss(emb, b_["labels"], w,
                                margin=args.margin, scale=args.aam_scale)

    dp, mp = max(args.data_parallel, 1), max(args.model_parallel, 1)
    n_dev = dp * mp if (args.data_parallel or args.model_parallel) else len(jax.devices())
    mesh = make_mesh(n_dev, model_axis=mp if mp > 1 else 1,
                     slices=max(args.slices, 1))
    trainer = ModuleTrainer(model, params, loss_fn, mesh=mesh, lr=args.lr)

    start_step = 0
    if args.resume and args.ckpt_dir and Path(args.ckpt_dir).is_dir():
        start_step = trainer.restore(args.ckpt_dir)
        print(f"[train_speaker] resumed {args.ckpt_dir} at step {start_step}")

    @jax.jit
    def _embed_fwd(p_, wav):
        emb, _ = model.apply({**p_, **stats}, fbank_batch(wav))
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                                 1e-12)

    def eval_accuracy(n_per_spk=3):
        """Enroll one utterance per speaker, identify n_per_spk held-out
        ones through the real SpeakerBank cosine-search path."""
        k = min(n_spk, 16)
        enroll_w, enroll_l = val_sampler.batch(4 * k)
        trial_w, trial_l = val_sampler.batch(4 * k)
        embs_e = np.asarray(_embed_fwd(trainer.state.params, jnp.asarray(enroll_w)))
        embs_t = np.asarray(_embed_fwd(trainer.state.params, jnp.asarray(trial_w)))
        bank = SpeakerBank(cfg.embed_dim)
        seen = set()
        for e, l in zip(embs_e, enroll_l):
            if int(l) not in seen:
                bank.add(f"spk{int(l)}", e)
                seen.add(int(l))
        correct = total = 0
        same, diff = [], []
        for e, l in zip(embs_t, trial_l):
            if int(l) not in seen:
                continue
            name, score = bank.search_batch(e[None], threshold=-1.0)[0]
            correct += name == f"spk{int(l)}"
            total += 1
            scores = np.asarray(bank.scores(jnp.asarray(e)[None]))[0]
            for j, nm in enumerate(bank.names):
                (same if nm == f"spk{int(l)}" else diff).append(scores[j])
        from ..metrics import eer

        acc = correct / max(total, 1)
        e, thr = eer(same, diff)
        return acc, float(np.mean(same)) if same else float("nan"), \
            float(np.mean(diff)) if diff else float("nan"), e, thr

    a0, s0, d0, e0, _ = eval_accuracy()
    print(f"[train_speaker] held-out id accuracy at step {start_step}: "
          f"{a0:.3f} (same-cos {s0:.3f} / diff-cos {d0:.3f} / EER {e0:.3f})")
    t0 = time.time()
    global_batch = args.batch * mesh.shape["data"]
    for step in range(start_step + 1, args.steps + 1):
        wavs, labels = sampler.batch(global_batch)
        batch = {"feats": fbank_batch(jnp.asarray(wavs)),
                 "labels": jnp.asarray(labels)}
        loss = trainer.train_step(batch)
        if step % args.log_every == 0 or step == start_step + 1:
            rate = (time.time() - t0) / max(step - start_step, 1) * 1000
            print(f"step {step:5d}  AAM loss {loss:8.4f}  ({rate:.0f} ms/step)")
        if args.ckpt_dir and args.save_every and step % args.save_every == 0:
            trainer.save(args.ckpt_dir)
            print(f"[train_speaker] checkpoint @ step {step} -> {args.ckpt_dir}")
    if args.ckpt_dir and trainer.state.step > start_step:
        trainer.save(args.ckpt_dir)
    a1, s1, d1, e1, thr1 = eval_accuracy()
    print(f"[train_speaker] held-out id accuracy after: {a1:.3f} "
          f"(same-cos {s1:.3f} / diff-cos {d1:.3f} / EER {e1:.3f} "
          f"@thr {thr1:.3f} — a calibrated --sv-threshold)")

    # embedder-only tree, shaped exactly like the engine's spk stage params
    # (SpeakerEmbedder.init): drop the AAM centers, unwrap the "embedder"
    # scope; reattach the (frozen) BN statistics
    vars_ = {**trainer.state.params, **stats}
    export_tree = {
        coll: dict(vars_[coll])["embedder"]
        for coll in vars_ if "embedder" in vars_[coll]
    }
    if args.export:
        from ..train.checkpoint import save_params

        save_params(export_tree, args.export)
        print(f"[train_speaker] exported serving params -> {args.export} "
              f"(use --spk-embed-model {args.export})")
    if args.export_onnx:
        from ..models.convert.onnx_export import export_speaker

        frames = int(feats0.shape[1])
        export_speaker(jax.tree.map(np.asarray, export_tree), cfg,
                       args.export_onnx, frames=frames)
        print(f"[train_speaker] exported ONNX -> {args.export_onnx} "
              f"(feats [batch,{frames},{fb.num_bins}] -> emb)")
    from ..train.data import write_run_manifest

    for d in filter(None, {args.ckpt_dir, args.export}):
        write_run_manifest(d, args, {"accuracy_before": a0, "accuracy_after": a1,
                                     "eer_after": e1})
    return a0, a1


if __name__ == "__main__":
    main()
