"""Train the speaker embedder and show SV gating that discriminates.

AAM-softmax training of the ERes2Net-style embedder on synthetic "speakers"
(each speaker = a fixed harmonic timbre + f0 band), then:
  1. verification check: same-speaker cosine >> different-speaker cosine;
  2. bank identification accuracy on held-out utterances (the
     SpeakerBank.search path the pipelines gate with).

Run: python examples/train_speaker_demo.py [--steps 300]

Recorded run (single TPU v5e chip, 300 steps, ~2 min wall):
    step  300  AAM loss 0.0019
    same-speaker cosine mean 0.930, different-speaker mean 0.050
    bank identification accuracy: 40/40 = 1.000
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 16000
N_SPK = 8


def utterance(rng, spk: int, dur=1.0):
    """A 'speaker' is a stable harmonic amplitude profile + f0 band."""
    t = int(dur * SR)
    tt = np.arange(t) / SR
    prof_rng = np.random.default_rng(1000 + spk)
    amps = prof_rng.uniform(0.2, 1.0, size=6)
    f0 = prof_rng.uniform(90, 300) * rng.uniform(0.95, 1.05)
    phase = rng.uniform(0, 6.28, size=6)
    env = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * tt + rng.uniform(0, 6.28))
    sig = sum(a * np.sin(2 * np.pi * f0 * (h + 1) * tt + ph)
              for h, (a, ph) in enumerate(zip(amps, phase)))
    return (0.1 * env * sig).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args(argv)

    from audio_classification_tpu.runtime.device import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from audio_classification_tpu.models.speaker import (
        SpeakerBank, SpeakerEmbedder, SpeakerEmbedderConfig,
    )
    from audio_classification_tpu.ops import FbankConfig, log_mel_fbank
    from audio_classification_tpu.parallel.mesh import make_mesh
    from audio_classification_tpu.train.losses import aam_softmax_loss
    from audio_classification_tpu.train.trainer import ModuleTrainer

    cfg = SpeakerEmbedderConfig(channels=(16, 32, 64), embed_dim=64)
    fb = FbankConfig()

    class EmbedderWithHead(nn.Module):
        """Embedder + trainable AAM class centers in one module."""

        @nn.compact
        def __call__(self, feats):
            emb = SpeakerEmbedder(cfg, name="embedder")(feats)
            w = self.param("aam_centers", nn.initializers.normal(1.0), (N_SPK, cfg.embed_dim))
            return emb, w

    model = EmbedderWithHead()
    rng = np.random.default_rng(0)
    fbank_batch = jax.jit(lambda w: log_mel_fbank(w, fb))

    def batch(n):
        labels = rng.integers(0, N_SPK, size=n)
        wavs = np.stack([utterance(rng, int(s)) for s in labels])
        return {"feats": fbank_batch(jnp.asarray(wavs)), "labels": jnp.asarray(labels)}

    params = model.init(jax.random.PRNGKey(0), batch(2)["feats"])

    def loss_fn(apply_fn, p_, b_):
        emb, w = apply_fn(p_, b_["feats"])
        return aam_softmax_loss(emb, b_["labels"], w, margin=0.2, scale=30.0)

    trainer = ModuleTrainer(model, params, loss_fn,
                            mesh=make_mesh(len(jax.devices()), model_axis=1), lr=3e-4)
    for step in range(1, args.steps + 1):
        loss = trainer.train_step(batch(args.batch))
        if step % 100 == 0 or step == 1:
            print(f"step {step:4d}  AAM loss {loss:.4f}")

    # ---- evaluation through the real bank-search path
    def embed(wavs):
        emb, _ = model.apply(trainer.state.params, fbank_batch(jnp.asarray(np.stack(wavs))))
        e = np.asarray(emb)
        return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    eval_rng = np.random.default_rng(999)
    bank = SpeakerBank(cfg.embed_dim)
    for s in range(N_SPK):
        enroll = embed([utterance(eval_rng, s) for _ in range(3)]).mean(axis=0)
        bank.add(f"spk{s}", enroll)

    same, diff, correct, total = [], [], 0, 0
    for s in range(N_SPK):
        for _ in range(5):
            e = embed([utterance(eval_rng, s)])[0]
            scores = np.asarray(bank.scores(jnp.asarray(e)[None]))[0]
            same.append(scores[s])
            diff.extend(np.delete(scores, s))
            pred, _sc = bank.search_batch(e[None], threshold=0.25)[0]
            correct += pred == f"spk{s}"
            total += 1
    print(f"same-speaker cosine mean {np.mean(same):.3f}, "
          f"different-speaker mean {np.mean(diff):.3f}")
    print(f"bank identification accuracy: {correct}/{total} = {correct/total:.3f}")
    return correct / total


if __name__ == "__main__":
    main()
