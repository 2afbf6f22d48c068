"""OSD distillation/training recipe — the path to reference-quality OSD.

The reference's front gate is pyannote's PRETRAINED OverlappedSpeechDetection
(reference: src/osd/osd.py:64-70); OSDNet is a TPU-native architecture, so
its quality comes from training, not weight conversion. This tool is the
recipe (see examples/OSD_RECIPE.md for the full walkthrough):

1. DISTILLATION TARGET — one of
   - ``--teacher-ckpt``: a pyannote segmentation torch checkpoint run
     IN-FRAMEWORK as the teacher (models/pyannet.PyanNet via
     load_pyannet_torch) — soft labels computed on device per crop, no
     external torch box needed, or
   - ``--teacher-npz``: frame overlap probabilities dumped from pyannote
     offline on any torch box (soft labels; the npz maps each mixture's
     file stem to a [T, 2] {speech, overlap} probability array and carries
     a ``__frame_sec__`` scalar; probabilities are linearly resampled onto
     OSDNet's output grid), or
   - energy ground truth derived from the mixture's true sources — the
     evaluator's own GT definition (reference: evaluate_with_sources.py:
     221-235: a source is active when its frame RMS clears a ratio of its
     peak; overlap = >=2 active) — available for any LibriMix tree.
2. DATASET PLAN — a local LibriMix tree (``--librimix-root``; train-360
   for the real run) with random ``--dur`` crops, or ``--synthetic``
   two-voice scenes for smoke tests.
3. QUALITY BAR — held-out overlap F1 vs energy GT using the evaluator's
   exact mask math; ``--f1-target`` (default 0.90) fails the run loudly
   when unmet. Final acceptance is cli/evaluate_with_sources on Libri2Mix
   test, comparing osd_precision/recall/f1 against a pyannote run.
4. OUTPUT — an orbax params dir every pipeline loads via
   ``--osd-checkpoint``.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

SR = 16000


def parse_args(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--librimix-root", default="", help="Local LibriMix tree (else --synthetic)")
    p.add_argument("--subset", default="train-360")
    p.add_argument("--num-speakers", type=int, default=2)
    p.add_argument("--max-files", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="Train on generated two-voice scenes (smoke/demo)")
    p.add_argument("--teacher-ckpt", default="",
                   help="pyannote segmentation torch checkpoint — the teacher "
                        "runs in-framework (PyanNet) on each crop")
    p.add_argument("--teacher-npz", default="",
                   help="pyannote probability dump (soft labels); else energy GT")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--dur", type=float, default=4.0, help="Crop length (s)")
    p.add_argument("--eval-files", type=int, default=10, help="Held-out scenes for the F1 bar")
    p.add_argument("--f1-target", type=float, default=0.90,
                   help="Quality bar: exit nonzero when held-out overlap F1 is below this")
    p.add_argument("--osd-thr", type=float, default=0.5)
    p.add_argument("--osd-win", type=float, default=0.5)
    p.add_argument("--osd-hop", type=float, default=0.1)
    p.add_argument("--activity-ratio", type=float, default=0.03,
                   help="Energy-GT activity threshold (ratio of peak RMS)")
    p.add_argument("--preset", default="full", choices=["full", "tiny"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", required=True, help="Output orbax dir (--osd-checkpoint input)")
    p.add_argument("--export-onnx", default="",
                   help="Also write a standard ONNX export of the distilled "
                        "OSD head (fbank feats -> per-frame probs; runs on "
                        "onnxruntime or --onnx-exec direct)")
    return p.parse_args(argv)


def make_scene(rng, dur: float) -> Tuple[np.ndarray, np.ndarray]:
    """Two harmonic voices; the second active only in an interior window."""
    t = int(dur * SR)
    tt = np.arange(t) / SR

    def voice(f0):
        return (0.25 * sum(np.sin(2 * np.pi * f0 * (h + 1) * tt + rng.uniform(0, 6.28)) / (h + 1)
                           for h in range(4))).astype(np.float32)

    s1 = voice(rng.uniform(100, 200))
    s2 = np.zeros(t, np.float32)
    a = rng.uniform(0.5, dur - 1.5)
    b = a + rng.uniform(0.8, min(1.8, dur - a - 0.1))
    s2[int(a * SR): int(b * SR)] = voice(rng.uniform(260, 500))[int(a * SR): int(b * SR)]
    return s1, s2


def energy_labels(sources: List[np.ndarray], centers: np.ndarray,
                  activity_ratio: float) -> np.ndarray:
    """[n_out, 2] {speech, overlap} targets from per-source frame activity
    (the evaluator's GT rule on OSDNet's output grid)."""
    from ..metrics.osd_metrics import frame_rms_np

    hop = float(centers[1] - centers[0]) if len(centers) > 1 else 0.04
    active = []
    for s in sources:
        rms = frame_rms_np(s, SR, win=max(hop, 0.025), hop=hop)
        thr = activity_ratio * max(float(rms.max()), 1e-6)
        a = rms > thr
        idx = np.clip((centers / hop).astype(int), 0, len(a) - 1)
        active.append(a[idx])
    active = np.stack(active)  # [n_src, n_out]
    labels = np.zeros((len(centers), 2), np.float32)
    labels[:, 0] = active.any(axis=0)
    labels[:, 1] = active.sum(axis=0) >= 2
    return labels


def teacher_labels(probs: np.ndarray, frame_sec: float, centers: np.ndarray) -> np.ndarray:
    """Linearly resample teacher [T, 2] probabilities onto OSDNet's grid."""
    t_teach = (np.arange(probs.shape[0]) + 0.5) * frame_sec
    out = np.stack([
        np.interp(centers, t_teach, probs[:, c]) for c in range(probs.shape[1])
    ], axis=-1)
    return out.astype(np.float32)


def main(argv=None) -> dict:
    args = parse_args(argv)
    from ..runtime.device import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ..data.librimix import LibriMixDataset
    from ..engine.runtime import EnginePreset, tiny_preset
    from ..engine.segments import flags_to_segments, segments_to_mask
    from ..metrics import build_gt_overlap_mask, compute_osd_metrics
    from ..models.osd import OSDNet, probs_to_hop_flags
    from ..ops import FbankConfig, log_mel_fbank
    from ..parallel.mesh import make_mesh
    from ..train.checkpoint import save_params
    from ..train.losses import frame_bce_loss
    from ..train.trainer import ModuleTrainer

    preset = tiny_preset() if args.preset == "tiny" else EnginePreset()
    cfg = preset.osd
    fb = FbankConfig()
    model = OSDNet(cfg)
    rng = np.random.default_rng(args.seed)
    dur = args.dur
    fbank_batch = jax.jit(lambda w: log_mel_fbank(w, fb))

    teacher = None
    teacher_frame_sec = 0.0
    if args.teacher_npz:
        teacher = dict(np.load(args.teacher_npz))
        teacher_frame_sec = float(teacher.pop("__frame_sec__"))
        print(f"teacher: {len(teacher)} utterances @ {teacher_frame_sec}s frames")

    pyannet_teacher = None
    if args.teacher_ckpt:
        # the real pyannote teacher, running in-framework (exact-parity
        # forward: models/pyannet) — takes precedence over --teacher-npz
        from ..models.convert.torch_import import load_pyannet_torch
        from ..models.pyannet import PyanNet, reduce_overlap_channels

        pn_cfg, pn_params = load_pyannet_torch(args.teacher_ckpt)
        pn = PyanNet(pn_cfg)
        pn_apply = jax.jit(lambda w, l: reduce_overlap_channels(
            pn.apply(pn_params, w, l)))
        pyannet_teacher = (pn_cfg, pn_apply)
        print(f"teacher: PyanNet {args.teacher_ckpt} "
              f"@ {pn_cfg.out_frame_sec:.6f}s frames (in-framework)")

    # ---- data plan
    ds = None
    if args.librimix_root and not args.synthetic:
        ds = LibriMixDataset(args.librimix_root, args.subset,
                             num_speakers=args.num_speakers, sample_rate=SR)
        limit = min(len(ds), args.max_files) if args.max_files else len(ds)
        print(f"LibriMix {args.subset}: {limit} mixtures")

    def draw_scene() -> Tuple[np.ndarray, List[np.ndarray], Optional[np.ndarray]]:
        """-> (mix crop, source crops, teacher probs for the crop or None)."""
        if ds is None:
            s1, s2 = make_scene(rng, dur)
            return s1 + s2, [s1, s2], None
        i = int(rng.integers(0, limit))
        _sr, mix, sources = ds[i]
        t = int(dur * SR)
        off = int(rng.integers(0, max(len(mix) - t, 1)))
        crop = slice(off, off + t)
        probs = None
        if teacher is not None:
            stem = Path(ds.get_metadata(i)[1]).stem
            if stem in teacher:
                # full-utterance teacher probs + the crop's absolute start
                probs = (teacher[stem], off / SR)
        mix_c = np.zeros(t, np.float32)
        m = mix[crop]
        mix_c[: len(m)] = m
        srcs_c = []
        for s in sources or []:
            sc = np.zeros(t, np.float32)
            ss = s[crop]
            sc[: len(ss)] = ss
            srcs_c.append(sc)
        return mix_c, srcs_c, probs

    n_frames = fb.frames_for(int(dur * SR))
    n_out = int(np.ceil(n_frames / cfg.subsample))
    centers = (np.arange(n_out) + 0.5) * cfg.out_frame_sec

    def batch(n):
        wavs, labels = [], []
        for _ in range(n):
            mix, sources, probs = draw_scene()
            wavs.append(mix)
            if pyannet_teacher is not None:
                labels.append(None)  # filled by one batched teacher pass
            elif probs is not None:
                full, t0 = probs
                labels.append(teacher_labels(full, teacher_frame_sec,
                                             centers + t0)[:n_out])
            elif sources:
                labels.append(energy_labels(sources, centers,
                                            args.activity_ratio)[:n_out])
            else:
                raise ValueError("no labels: need sources (energy GT), "
                                 "--teacher-ckpt or --teacher-npz")
        wb = np.stack(wavs)
        if pyannet_teacher is not None:
            pn_cfg, pn_apply = pyannet_teacher
            tprobs = np.asarray(pn_apply(
                jnp.asarray(wb), jnp.full(len(wavs), wb.shape[1], jnp.int32)))
            nt = max(int(pn_cfg.out_frames(wb.shape[1])), 1)
            labels = [teacher_labels(tprobs[i, :nt], pn_cfg.out_frame_sec,
                                     centers)[:n_out] for i in range(len(wavs))]
        feats = fbank_batch(jnp.asarray(wb))
        return {"feats": feats, "labels": jnp.asarray(np.stack(labels))}

    params = model.init(jax.random.PRNGKey(args.seed), batch(1)["feats"])

    def loss_fn(apply_fn, p_, b_):
        probs = apply_fn(p_, b_["feats"])
        n = min(probs.shape[1], b_["labels"].shape[1])
        return frame_bce_loss(probs[:, :n], b_["labels"][:, :n],
                              jnp.ones(probs[:, :n].shape[:2]))

    n_dev = len(jax.devices())
    bsz = ((args.batch + n_dev - 1) // n_dev) * n_dev  # even DP shards
    if bsz != args.batch:
        print(f"batch {args.batch} -> {bsz} (multiple of {n_dev} devices)")
    trainer = ModuleTrainer(model, params, loss_fn,
                            mesh=make_mesh(n_dev, model_axis=1),
                            lr=args.lr)
    for step in range(1, args.steps + 1):
        loss = trainer.train_step(batch(bsz))
        if step == 1 or step % 100 == 0:
            print(f"step {step:5d}  frame BCE {float(loss):.4f}")

    # ---- quality bar: held-out overlap F1 with the evaluator's mask math
    stats = {"tp": 0, "fp": 0, "fn": 0}
    eval_rng = np.random.default_rng(args.seed + 1)
    for _ in range(args.eval_files):
        if ds is None:
            s1, s2 = make_scene(eval_rng, dur)
            mix, sources = s1 + s2, [s1, s2]
        else:
            i = int(eval_rng.integers(0, limit))
            _sr, mix, sources = ds[i]
            mix, sources = mix[: int(dur * SR)], [s[: int(dur * SR)] for s in sources or []]
        if not sources:
            continue
        f = fbank_batch(jnp.asarray(mix)[None])
        probs = np.asarray(model.apply(trainer.state.params, f))[0]
        d = len(mix) / SR
        no = int(np.ceil(f.shape[1] / cfg.subsample))
        flags = probs_to_hop_flags(probs[:, 1], no, d, cfg.out_frame_sec,
                                   args.osd_thr, args.osd_win, args.osd_hop)
        pred = segments_to_mask(flags_to_segments(flags, d, args.osd_win, args.osd_hop),
                                d, args.osd_hop, args.osd_win)
        gt = build_gt_overlap_mask(sources, SR, args.osd_win, args.osd_hop,
                                   args.activity_ratio)
        n = min(len(gt), len(pred))
        stats["tp"] += int(np.sum(gt[:n] & pred[:n]))
        stats["fp"] += int(np.sum(~gt[:n] & pred[:n]))
        stats["fn"] += int(np.sum(gt[:n] & ~pred[:n]))
    tp, fp, fn = stats["tp"], stats["fp"], stats["fn"]
    m = compute_osd_metrics(
        np.concatenate([np.ones(tp + fn, bool), np.zeros(fp, bool)]),
        np.concatenate([np.ones(tp, bool), np.zeros(fn, bool), np.ones(fp, bool)]),
    )
    print(f"held-out OSD vs energy GT: precision={m['precision']} "
          f"recall={m['recall']} f1={m['f1']}")

    save_params(trainer.state.params, args.out)
    print(f"saved OSD params: {args.out} (use --osd-checkpoint {args.out})")
    from ..train.data import write_run_manifest

    write_run_manifest(args.out, args, {"f1": m["f1"],
                                        "precision": m["precision"],
                                        "recall": m["recall"]})
    if args.export_onnx:
        from ..models.convert.onnx_export import export_osdnet

        frames = fb.frames_for(int(dur * SR))
        export_osdnet(jax.tree.map(np.asarray, trainer.state.params), cfg,
                      args.export_onnx, frames=frames)
        print(f"exported ONNX: {args.export_onnx} "
              f"(feats [batch,{frames},{cfg.num_mel}] -> probs)")
    if m["f1"] is not None and m["f1"] < args.f1_target:
        print(f"QUALITY BAR FAILED: f1 {m['f1']} < target {args.f1_target}")
        sys.exit(1)
    return m


if __name__ == "__main__":
    main()
