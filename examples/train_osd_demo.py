"""Train the OSD segmenter and score it with the evaluator's own metrics.

Trains OSDNet with the frame-BCE objective on synthetic scenes whose
overlap structure is known, then scores predicted segments against the
energy-based ground-truth mask exactly the way cli/evaluate_with_sources
does (P/R/F1/IoU; reference: evaluate_with_sources.py:221-283).

Run: python examples/train_osd_demo.py [--steps 300]

Recorded run (single TPU v5e chip, 250 steps, ~2 min wall):
    step  200  frame BCE 0.0002
    OSD vs energy GT: precision=0.8271 recall=1.0 f1=0.9054
(precision is bounded by the win/hop raster expansion — flagged windows
extend win_sec past the true boundary, exactly as in the reference's
flags->segments algebra)
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SR = 16000


def make_scene(rng, dur=4.0):
    """Two voices, the second active only in a random interior interval."""
    t = int(dur * SR)
    tt = np.arange(t) / SR
    def voice(f0):
        return (0.25 * sum(np.sin(2 * np.pi * f0 * (h + 1) * tt + rng.uniform(0, 6.28)) / (h + 1)
                           for h in range(4))).astype(np.float32)
    s1 = voice(rng.uniform(100, 200))
    s2 = np.zeros(t, np.float32)
    a = rng.uniform(0.5, dur - 1.5)
    b = a + rng.uniform(0.8, min(1.8, dur - a - 0.1))
    ia, ib = int(a * SR), int(b * SR)
    s2[ia:ib] = voice(rng.uniform(260, 500))[ia:ib]
    return s1, s2, (a, b)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    from audio_classification_tpu.runtime.device import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from audio_classification_tpu.engine.segments import segments_to_mask
    from audio_classification_tpu.metrics import build_gt_overlap_mask, compute_osd_metrics
    from audio_classification_tpu.models.osd import OSDConfig, OSDNet, probs_to_hop_flags
    from audio_classification_tpu.engine.segments import flags_to_segments
    from audio_classification_tpu.ops import FbankConfig, log_mel_fbank
    from audio_classification_tpu.parallel.mesh import make_mesh
    from audio_classification_tpu.train.losses import frame_bce_loss
    from audio_classification_tpu.train.trainer import ModuleTrainer

    cfg = OSDConfig(dim=128, heads=4, layers=2)
    fb = FbankConfig()
    model = OSDNet(cfg)
    dur = 4.0
    rng = np.random.default_rng(0)

    fbank_batch = jax.jit(lambda w: log_mel_fbank(w, fb))

    def batch(n):
        wavs, bounds = [], []
        for _ in range(n):
            s1, s2, (a, b) = make_scene(rng, dur)
            wavs.append(s1 + s2)
            bounds.append((a, b))
        feats = fbank_batch(jnp.asarray(np.stack(wavs)))  # one device call
        n_out = int(np.ceil(feats.shape[1] / cfg.subsample))
        centers = (np.arange(n_out) + 0.5) * cfg.out_frame_sec
        labels = np.zeros((n, n_out, 2), np.float32)
        labels[:, :, 0] = 1.0                    # speech everywhere (s1 always on)
        for i, (a, b) in enumerate(bounds):
            labels[i, :, 1] = (centers >= a) & (centers < b)
        return {"feats": feats, "labels": jnp.asarray(labels)}

    params = model.init(jax.random.PRNGKey(0), batch(1)["feats"])

    def loss_fn(apply_fn, p_, b_):
        probs = apply_fn(p_, b_["feats"])
        return frame_bce_loss(probs, b_["labels"], jnp.ones(probs.shape[:2]))

    trainer = ModuleTrainer(model, params, loss_fn,
                            mesh=make_mesh(len(jax.devices()), model_axis=1), lr=3e-4)
    for step in range(1, args.steps + 1):
        loss = trainer.train_step(batch(args.batch))
        if step % 100 == 0 or step == 1:
            print(f"step {step:4d}  frame BCE {loss:.4f}")

    # ---- evaluate with the evaluator's P/R/F1 vs energy ground truth
    win, hop = 0.5, 0.1
    stats = {"tp": 0, "fp": 0, "fn": 0}
    eval_rng = np.random.default_rng(321)
    for _ in range(10):
        s1, s2, _ = make_scene(eval_rng, dur)
        mix = s1 + s2
        f = jnp.asarray(log_mel_fbank(jnp.asarray(mix), fb))[None]
        probs = np.asarray(model.apply(trainer.state.params, f))[0]
        n_out = int(np.ceil(f.shape[1] / cfg.subsample))
        flags = probs_to_hop_flags(probs[:, 1], n_out, dur, cfg.out_frame_sec, 0.5, win, hop)
        segs = flags_to_segments(flags, dur, win, hop)
        pred_mask = segments_to_mask(segs, dur, hop, win)
        gt_mask = build_gt_overlap_mask([s1, s2], SR, win, hop, 0.03)
        n = min(len(gt_mask), len(pred_mask))
        stats["tp"] += int(np.sum(gt_mask[:n] & pred_mask[:n]))
        stats["fp"] += int(np.sum(~gt_mask[:n] & pred_mask[:n]))
        stats["fn"] += int(np.sum(gt_mask[:n] & ~pred_mask[:n]))
    m = compute_osd_metrics(
        np.concatenate([np.ones(stats["tp"] + stats["fn"], bool), np.zeros(stats["fp"], bool)]),
        np.concatenate([np.ones(stats["tp"], bool), np.zeros(stats["fn"], bool), np.ones(stats["fp"], bool)]),
    )
    print(f"OSD vs energy GT: precision={m['precision']} recall={m['recall']} f1={m['f1']}")
    return m


if __name__ == "__main__":
    main()
