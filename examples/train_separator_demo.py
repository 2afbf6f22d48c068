"""End-to-end separator training demo on TPU.

Trains a small Conv-TasNet with the PIT SI-SDR objective on synthetic
2-speaker mixtures (DP+TP sharded train step), then scores SI-SDR/SI-SDRi
through the same PIT evaluation the pipelines use — demonstrating the
training subsystem the reference lacks (SURVEY.md §5.4) producing a
separator that actually separates.

Run: python examples/train_separator_demo.py [--steps 300]

Recorded run (single TPU v5e chip, 200 steps, ~70 s wall):
    SI-SDRi before training: -22.57 dB
    step  200  loss(-SI-SDR)  -8.663  (218 ms/step)
    SI-SDRi after  training: +7.98 dB  (gain +30.56 dB)
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_batch(rng, b, t, sr=8000):
    """Synthetic 2-speaker scenes: harmonic voices with random f0/envelopes."""
    refs = np.zeros((b, 2, t), np.float32)
    tt = np.arange(t) / sr
    for i in range(b):
        for k in range(2):
            f0 = rng.uniform(*(80, 220) if k == 0 else (240, 500))
            env = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.3, 1.5) * tt + rng.uniform(0, 6.28))
            sig = sum(np.sin(2 * np.pi * f0 * (h + 1) * tt + rng.uniform(0, 6.28)) / (h + 1)
                      for h in range(4))
            refs[i, k] = 0.25 * env * sig
    mix = refs.sum(axis=1)
    return mix.astype(np.float32), refs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--save", default="", help="Save trained sep2 params into this orbax dir")
    args = p.parse_args(argv)

    from audio_classification_tpu.runtime.device import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from audio_classification_tpu.metrics import sdr_improvement_pit_2
    from audio_classification_tpu.models.convtasnet import ConvTasNet, ConvTasNetConfig
    from audio_classification_tpu.parallel.mesh import make_mesh
    from audio_classification_tpu.train.trainer import SeparatorTrainer

    sr = 8000
    t = int(args.seconds * sr)
    cfg = ConvTasNetConfig(n_src=2, enc_dim=128, enc_kernel=16, bottleneck=64,
                           hidden=128, n_blocks=4, n_repeats=2, sample_rate=sr)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, model_axis=1)
    trainer = SeparatorTrainer(cfg, mesh=mesh, lr=5e-4, seed=0)
    rng = np.random.default_rng(0)

    def eval_sisdri(params, n=16):
        mix, refs = make_batch(np.random.default_rng(123), n, t, sr)
        model = ConvTasNet(cfg)
        est = np.asarray(model.apply(params, jnp.asarray(mix), jnp.ones_like(jnp.asarray(mix))))
        vals = []
        for i in range(n):
            _, sdri, _, _ = sdr_improvement_pit_2(mix[i], refs[i, 0], refs[i, 1],
                                                  [est[i, 0], est[i, 1]])
            if np.isfinite(sdri):
                vals.append(sdri)
        return float(np.mean(vals))

    before = eval_sisdri(trainer.state.params)
    print(f"SI-SDRi before training: {before:+.2f} dB")
    t0 = time.time()
    for step in range(1, args.steps + 1):
        mix, refs = make_batch(rng, args.batch * max(mesh.shape['data'], 1), t, sr)
        loss = trainer.train_step(mix, refs, np.ones_like(mix))
        if step % 50 == 0 or step == 1:
            print(f"step {step:4d}  loss(-SI-SDR) {loss:8.3f}  ({(time.time()-t0)/step*1000:.0f} ms/step)")
    after = eval_sisdri(trainer.state.params)
    print(f"SI-SDRi after  training: {after:+.2f} dB  (gain {after-before:+.2f} dB)")

    if args.save:
        from audio_classification_tpu.train.checkpoint import save_params

        save_params(trainer.state.params, args.save)
        print(f"saved trained separator params to {args.save}")
    return before, after


if __name__ == "__main__":
    main()
