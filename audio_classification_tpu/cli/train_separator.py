"""Train a Conv-TasNet separator in-framework with checkpoint/resume.

New capability over the reference, which never trains — it only consumes
pretrained torch checkpoints (reference: src/osd/separation.py:105-163) and
its sole persistence story is npz embedding caches (src/model.py:263-339).
Here the PIT SI-SDR training loop from train/trainer.SeparatorTrainer gets
a product surface:

- data: LibriMix on disk (``--librimix-root``, the same tree layout the
  evaluator consumes — reference: src/mossformer/dataset.py) or synthetic
  harmonic scenes (``--synthetic``) when no corpus is present;
- parallelism: ``--data-parallel N`` x ``--model-parallel M`` build the
  ("data", "model") mesh; the train step is ONE pjit-compiled XLA program
  with DP gradient psums and the TCN hidden axis sharded TP;
- checkpoint/resume: ``--ckpt-dir`` saves params + optimizer moments +
  step every ``--save-every`` steps (orbax); an interrupted run restarted
  with the same flags resumes from the last step exactly;
- deployment: ``--export`` writes a params-only orbax dir that the serving
  CLIs load via ``--sep-checkpoint`` (and the Separator facade via
  ``checkpoint=``), closing the train -> serve loop.

Quality gate printed at the end: held-out SI-SDRi through the same PIT
metric the pipelines report (metrics/sisdr).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    d = p.add_argument_group("data")
    d.add_argument("--librimix-root", default="", help="LibriMix tree root")
    d.add_argument("--subset", default="train-100",
                   choices=["train-360", "train-100", "dev", "test"])
    d.add_argument("--synthetic", action="store_true",
                   help="Train on synthetic harmonic scenes (no corpus needed)")
    d.add_argument("--dynamic-mix", action="store_true",
                   help="Remix sources from DIFFERENT LibriMix items with "
                        "random gains every step (fresh mixtures each epoch "
                        "— the standard separation data-augmentation)")
    d.add_argument("--n-src", type=int, default=2, choices=[2, 3])
    d.add_argument("--sample-rate", type=int, default=8000, choices=[8000, 16000])
    d.add_argument("--seconds", type=float, default=1.0,
                   help="Training crop length per example")
    t = p.add_argument_group("training")
    t.add_argument("--steps", type=int, default=300)
    t.add_argument("--batch", type=int, default=8, help="Per-data-shard batch")
    t.add_argument("--lr", type=float, default=5e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=50)
    m = p.add_argument_group("model (tiny by default; raise for quality)")
    m.add_argument("--arch", default="convtasnet",
                   choices=["convtasnet", "mossformer"],
                   help="Separator architecture (both serve via "
                        "--sep-checkpoint / Separator(backend=..., "
                        "checkpoint=...); dims must match the serving "
                        "preset's config to load there)")
    m.add_argument("--enc-dim", type=int, default=128)
    m.add_argument("--bottleneck", type=int, default=64)
    m.add_argument("--hidden", type=int, default=128)
    m.add_argument("--n-blocks", type=int, default=4)
    m.add_argument("--n-repeats", type=int, default=2)
    mf = p.add_argument_group("mossformer model (--arch mossformer)")
    mf.add_argument("--mf-dim", type=int, default=96)
    mf.add_argument("--mf-qk-dim", type=int, default=64)
    mf.add_argument("--mf-layers", type=int, default=4)
    mf.add_argument("--mf-expansion", type=int, default=2)
    par = p.add_argument_group("parallelism")
    par.add_argument("--data-parallel", type=int, default=0)
    par.add_argument("--model-parallel", type=int, default=0)
    par.add_argument("--slices", type=int, default=1,
                     help="Multi-slice jobs: DP spans slices x chips, DCN "
                          "factor outermost; TP stays in-slice")
    par.add_argument("--time-shard", action="store_true",
                     help="Shard each crop's TIME axis over the data axis "
                          "(sequence-parallel training for --seconds too "
                          "long for one chip; batch is replicated)")
    c = p.add_argument_group("checkpointing")
    c.add_argument("--ckpt-dir", default="", help="Resumable train-state dir")
    c.add_argument("--save-every", type=int, default=100)
    c.add_argument("--resume", action="store_true",
                   help="Resume from --ckpt-dir if it holds a checkpoint")
    c.add_argument("--export", default="",
                   help="Write final params-only orbax dir (loads via "
                        "--sep-checkpoint / Separator(checkpoint=...))")
    c.add_argument("--export-onnx", default="",
                   help="Also write a standard ONNX export of the trained "
                        "separator (mix -> est, static --seconds length; "
                        "runs on onnxruntime or --onnx-exec direct)")
    return p.parse_args(argv)


def synthetic_batch(rng, b, n_src, t, sr):
    """Harmonic voices with random f0/envelopes; distinct f0 bands per
    source so the PIT objective has separable structure to learn."""
    bands = [(80, 220), (240, 500), (520, 900)][:n_src]
    refs = np.zeros((b, n_src, t), np.float32)
    tt = np.arange(t) / sr
    for i in range(b):
        for k in range(n_src):
            f0 = rng.uniform(*bands[k])
            env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.3, 1.5) * tt
                                     + rng.uniform(0, 6.28))
            sig = sum(np.sin(2 * np.pi * f0 * (h + 1) * tt + rng.uniform(0, 6.28))
                      / (h + 1) for h in range(4))
            refs[i, k] = 0.25 * env * sig
    return refs.sum(axis=1).astype(np.float32), refs


class LibriMixSampler:
    """Random fixed-length crops of (mix, sources) from a LibriMix tree.

    ``dynamic=True`` composes each training mixture from sources of
    DIFFERENT items with random per-source gains (±5 dB) — dynamic mixing,
    the standard separation augmentation (every step sees a never-before-
    heard mixture instead of the corpus' fixed pairings)."""

    def __init__(self, root, subset, n_src, sr, crop, rng, dynamic=False):
        from ..data.librimix import LibriMixDataset

        self.ds = LibriMixDataset(root, subset=subset, num_speakers=n_src,
                                  sample_rate=sr, task="sep_clean")
        if not len(self.ds):
            raise FileNotFoundError(f"no LibriMix mixtures under {root}")
        self.n_src, self.crop, self.rng = n_src, crop, rng
        self.dynamic = bool(dynamic)

    def _item_sources(self):
        while True:
            _, mix, srcs = self.ds[int(self.rng.integers(len(self.ds)))]
            if srcs is not None:
                return mix, srcs

    def batch(self, b):
        mixes = np.zeros((b, self.crop), np.float32)
        refs = np.zeros((b, self.n_src, self.crop), np.float32)
        for i in range(b):
            if self.dynamic:
                for k in range(self.n_src):
                    _, srcs = self._item_sources()
                    src = srcs[int(self.rng.integers(len(srcs)))]
                    n = min(len(src), self.crop)
                    off = int(self.rng.integers(max(len(src) - self.crop, 0) + 1))
                    gain = 10.0 ** (self.rng.uniform(-5.0, 5.0) / 20.0)
                    refs[i, k, :n] = gain * src[off:off + n]
                mixes[i] = refs[i].sum(axis=0)
            else:
                mix, srcs = self._item_sources()
                n = min(len(mix), self.crop)
                off = int(self.rng.integers(max(len(mix) - self.crop, 0) + 1))
                mixes[i, :n] = mix[off:off + n]
                for k in range(self.n_src):
                    refs[i, k, :n] = srcs[k][off:off + n]
        return mixes, refs


def main(argv=None):
    args = parse_args(argv)
    if not args.synthetic and not args.librimix_root:
        raise SystemExit("pick a data source: --librimix-root DIR or --synthetic")

    from ..runtime.device import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ..metrics import sdr_improvement_pit_2
    from ..models.convtasnet import ConvTasNet, ConvTasNetConfig
    from ..models.mossformer import MossFormer, MossFormerConfig
    from ..parallel.mesh import make_mesh
    from ..train.trainer import SeparatorTrainer

    sr = args.sample_rate
    t = int(args.seconds * sr)
    if args.arch == "mossformer":
        cfg = MossFormerConfig(n_src=args.n_src, enc_dim=args.enc_dim,
                               enc_kernel=16, dim=args.mf_dim,
                               qk_dim=args.mf_qk_dim, layers=args.mf_layers,
                               expansion=args.mf_expansion, sample_rate=sr)
    else:
        cfg = ConvTasNetConfig(n_src=args.n_src, enc_dim=args.enc_dim,
                               enc_kernel=16, bottleneck=args.bottleneck,
                               hidden=args.hidden, n_blocks=args.n_blocks,
                               n_repeats=args.n_repeats, sample_rate=sr)
    dp, mp = max(args.data_parallel, 1), max(args.model_parallel, 1)
    n_dev = dp * mp if (args.data_parallel or args.model_parallel) else len(jax.devices())
    mesh = make_mesh(n_dev, model_axis=mp if mp > 1 else 1,
                     slices=max(args.slices, 1))
    trainer = SeparatorTrainer(cfg, mesh=mesh, lr=args.lr, seed=args.seed,
                               time_shard=args.time_shard)

    start_step = 0
    if args.resume and args.ckpt_dir and Path(args.ckpt_dir).is_dir():
        start_step = trainer.restore(args.ckpt_dir)
        print(f"[train_separator] resumed {args.ckpt_dir} at step {start_step}")
    rng = np.random.default_rng(args.seed + start_step)  # fresh data stream post-resume

    if args.synthetic:
        sample = lambda b: synthetic_batch(rng, b, args.n_src, t, sr)
        held = synthetic_batch(np.random.default_rng(123), 16, args.n_src, t, sr)
    else:
        sampler = LibriMixSampler(args.librimix_root, args.subset, args.n_src,
                                  sr, t, rng, dynamic=args.dynamic_mix)
        sample = sampler.batch
        # held-out on the corpus' REAL mixtures even when training dynamic
        held = LibriMixSampler(args.librimix_root, args.subset, args.n_src,
                               sr, t, np.random.default_rng(123)).batch(16)

    eval_model = trainer.model  # same arch/params layout as the train step
    # one jitted program per eval batch shape — eager apply pays a tunnel
    # round-trip per op (~90 ms each, CLAUDE.md)
    eval_apply = jax.jit(eval_model.apply)

    def eval_sisdri(params, n=16):
        mix, refs = held
        est = np.asarray(eval_apply(params, jnp.asarray(mix),
                                    jnp.ones_like(jnp.asarray(mix))))
        vals = []
        for i in range(min(n, mix.shape[0])):
            # pairwise PIT metric over the first two sources covers both
            # n_src settings (3-src quality still moves this number)
            _, sdri, _, _ = sdr_improvement_pit_2(
                mix[i], refs[i, 0], refs[i, 1], [est[i, 0], est[i, 1]])
            if np.isfinite(sdri):
                vals.append(sdri)
        return float(np.mean(vals)) if vals else float("nan")

    before = eval_sisdri(trainer.state.params)
    print(f"[train_separator] held-out SI-SDRi at step {start_step}: {before:+.2f} dB")
    t0 = time.time()
    # time-sharded crops replicate the batch (the data axis carries T)
    global_batch = args.batch * (1 if args.time_shard else mesh.shape["data"])
    for step in range(start_step + 1, args.steps + 1):
        mix, refs = sample(global_batch)
        loss = trainer.train_step(mix, refs, np.ones_like(mix))
        if step % args.log_every == 0 or step == start_step + 1:
            rate = (time.time() - t0) / max(step - start_step, 1) * 1000
            print(f"step {step:5d}  loss(-SI-SDR) {loss:8.3f}  ({rate:.0f} ms/step)")
        if args.ckpt_dir and args.save_every and step % args.save_every == 0:
            trainer.save(args.ckpt_dir)
            print(f"[train_separator] checkpoint @ step {step} -> {args.ckpt_dir}")
    if args.ckpt_dir and trainer.state.step > start_step:
        trainer.save(args.ckpt_dir)
    after = eval_sisdri(trainer.state.params)
    print(f"[train_separator] held-out SI-SDRi after: {after:+.2f} dB "
          f"(gain {after - before:+.2f} dB)")

    if args.export:
        from ..train.checkpoint import save_params

        save_params(trainer.state.params, args.export)
        print(f"[train_separator] exported serving params -> {args.export} "
              f"(use --sep-checkpoint {args.export})")
    if args.export_onnx:
        from ..models.convert.onnx_export import (export_convtasnet,
                                                  export_mossformer)

        host_params = jax.tree.map(np.asarray, trainer.state.params)
        exporter = (export_mossformer if args.arch == "mossformer"
                    else export_convtasnet)
        exporter(host_params, cfg, args.export_onnx, seconds=args.seconds)
        print(f"[train_separator] exported ONNX -> {args.export_onnx} "
              f"(mix [batch,{t}] -> est [batch,{args.n_src},{t}])")
    from ..train.data import write_run_manifest

    for d in filter(None, {args.ckpt_dir, args.export}):
        write_run_manifest(d, args, {"si_sdri_before": before,
                                     "si_sdri_after": after})
    return before, after


if __name__ == "__main__":
    main()
