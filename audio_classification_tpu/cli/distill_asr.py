"""Distill an ONNX SenseVoice teacher into a small trainable CTC encoder.

The reference's recognizer is a frozen ~25k-vocab int8 export consumed
as-is (reference: src/model.py:79-87); this tool compresses such an export
— or one produced by this framework's own `train_asr --export-onnx` — into
a custom-sized in-framework encoder by per-frame logit distillation:

- teacher: any SenseVoice-shaped ONNX file, executed by the in-house graph
  executor through the SAME OnnxStage the serving engine uses (real sherpa
  exports' x/x_length/language/textnorm inputs auto-detected, prompt
  frames skipped); teacher logits are computed once per batch OUTSIDE the
  train step (no gradients through the teacher);
- student: SenseVoiceEncoder at --dim/--heads/--layers (any size);
- data: UNLABELED audio — a wav list/manifest or --synthetic scenes; KD
  needs no transcripts (reference-style deployments rarely have them);
- loss: temperature-scaled KL(teacher ‖ student) over valid frames
  (Hinton KD, τ² compensation), optional CTC on the teacher's own greedy
  labels via --ctc-weight;
- gate: student-vs-teacher greedy-decode agreement CER on held-out audio;
- checkpoint/resume/export: same orbax machinery as cli/train_asr
  (--export serves via --sense-voice <dir> when dims match the preset).
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

SR = 16000


def parse_args(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    tch = p.add_argument_group("teacher")
    tch.add_argument("--teacher-onnx", required=True,
                     help="SenseVoice-shaped .onnx (sherpa export or "
                          "train_asr --export-onnx output)")
    tch.add_argument("--tokens", required=True,
                     help="tokens.txt matching the teacher's vocab")
    tch.add_argument("--cmvn", default="",
                     help="Teacher's am.mvn stats (applied in the shared "
                          "frontend)")
    tch.add_argument("--skip-frames", type=int, default=-1,
                     help="Leading teacher logit frames to drop "
                          "(-1: the sensevoice prompt count, 4)")
    d = p.add_argument_group("data (unlabeled)")
    d.add_argument("--manifest", default="",
                   help="wav list: one path per line, TSV first column, or "
                        "JSONL with a 'wav' field")
    d.add_argument("--synthetic", action="store_true",
                   help="Synthetic tone scenes (no corpus needed)")
    d.add_argument("--max-seconds", type=float, default=4.0)
    t = p.add_argument_group("training")
    t.add_argument("--steps", type=int, default=400)
    t.add_argument("--batch", type=int, default=16)
    t.add_argument("--lr", type=float, default=5e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--log-every", type=int, default=100)
    t.add_argument("--kd-temp", type=float, default=2.0, help="KD temperature")
    t.add_argument("--ctc-weight", type=float, default=0.0,
                   help=">0: add CTC loss on the teacher's greedy labels")
    m = p.add_argument_group("student model")
    m.add_argument("--dim", type=int, default=96)
    m.add_argument("--heads", type=int, default=4)
    m.add_argument("--layers", type=int, default=2)
    m.add_argument("--conv-kernel", type=int, default=7)
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
                   help="Write student params-only orbax dir (serves via "
                        "--sense-voice <dir> when dims match the preset)")
    return p.parse_args(argv)


def read_wav_list(path: str):
    import json

    wavs = []
    for ln in Path(path).read_text(encoding="utf-8").splitlines():
        ln = ln.strip()
        if not ln:
            continue
        if ln.startswith("{"):
            wavs.append(json.loads(ln)["wav"])
        else:
            wavs.append(ln.split("\t", 1)[0])
    if not wavs:
        raise SystemExit(f"empty wav list: {path}")
    return wavs


class WavSampler:
    def __init__(self, wavs, t_max, rng):
        from ..train.data import WavCache

        self.wavs, self.t_max, self.rng = wavs, t_max, rng
        self._wav = WavCache()

    def batch(self, n):
        out = np.zeros((n, self.t_max), np.float32)
        lens = np.zeros(n, np.int32)
        for i in range(n):
            audio = self._wav(self.wavs[int(self.rng.integers(len(self.wavs)))])
            audio = audio[: self.t_max]
            out[i, : audio.size] = audio
            lens[i] = audio.size
        return out, lens


class SyntheticSampler:
    def __init__(self, t_max, rng):
        self.t_max, self.rng = t_max, rng

    def batch(self, n):
        from .train_asr import _ALPHABET, _speak

        out = np.zeros((n, self.t_max), np.float32)
        lens = np.zeros(n, np.int32)
        for i in range(n):
            w = "".join(self.rng.choice(list(_ALPHABET))
                        for _ in range(self.rng.integers(3, 9)))
            audio = _speak(self.rng, w)[: self.t_max]
            out[i, : audio.size] = audio
            lens[i] = audio.size
        return out, lens


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
    from ..models.convert.onnx_exec import OnnxModel
    from ..models.convert.onnx_stage import OnnxStage
    from ..parallel.mesh import make_mesh
    from ..train.trainer import ModuleTrainer

    tokens = TokenTable.load(args.tokens)
    cfg = SenseVoiceConfig(vocab_size=tokens.vocab_size, dim=args.dim,
                           heads=args.heads, layers=args.layers,
                           conv_kernel=args.conv_kernel)
    skip = args.skip_frames if args.skip_frames >= 0 else cfg.num_prompt
    teacher = OnnxStage(OnnxModel(args.teacher_onnx), skip_frames=skip)
    t_params = teacher.model.params
    print(f"[distill_asr] teacher {args.teacher_onnx} "
          f"(skip_frames={skip}, vocab={tokens.vocab_size})")

    cmvn_mean = cmvn_istd = None
    if args.cmvn:
        from ..models.convert.assets import load_kaldi_cmvn

        shift, scale = load_kaldi_cmvn(args.cmvn)
        cmvn_mean, cmvn_istd = jnp.asarray(shift), jnp.asarray(scale)

    def frontend(wav, lens):
        return sensevoice_frontend(wav, lens, cfg,
                                   cmvn_mean=cmvn_mean, cmvn_istd=cmvn_istd)

    rng = np.random.default_rng(args.seed)
    t_max = int(args.max_seconds * SR)
    if args.synthetic:
        sampler = SyntheticSampler(t_max, rng)
        val_sampler = SyntheticSampler(t_max, np.random.default_rng(123))
    else:
        wavs = read_wav_list(args.manifest)
        cut = max(len(wavs) - max(len(wavs) // 10, 1), 1)
        sampler = WavSampler(wavs[:cut], t_max, rng)
        val_sampler = WavSampler(wavs[cut:] or wavs[:1], t_max,
                                 np.random.default_rng(123))

    student = SenseVoiceEncoder(cfg)

    @jax.jit
    def teacher_fwd(wav, lens):
        """ONE program: frontend + the whole teacher graph + greedy ids."""
        feats, mask = frontend(wav, lens)
        logits = teacher(t_params, feats, mask)
        ids, id_lens = ctc_greedy_decode(logits, mask.astype(jnp.float32),
                                         tokens.blank_id)
        return logits, ids, id_lens

    b0w, b0l = sampler.batch(2)
    feats0, mask0 = jax.jit(frontend)(jnp.asarray(b0w), jnp.asarray(b0l))
    params = jax.jit(student.init)(jax.random.PRNGKey(args.seed), feats0, mask0)

    temp = float(args.kd_temp)

    def loss_fn(apply_fn, p_, b_):
        feats, mask = frontend(b_["wav"], b_["lens"])
        s_logits = apply_fn(p_, feats, mask)[:, cfg.num_prompt:]
        t_logits = b_["t_logits"]
        tp = jax.nn.softmax(t_logits / temp, axis=-1)
        ls = jax.nn.log_softmax(s_logits / temp, axis=-1)
        kl = jnp.sum(tp * (jnp.log(jnp.clip(tp, 1e-9, 1.0)) - ls), axis=-1)
        m = mask.astype(kl.dtype)
        loss = temp * temp * jnp.sum(kl * m) / jnp.maximum(jnp.sum(m), 1.0)
        if args.ctc_weight > 0:
            loss = loss + args.ctc_weight * ctc_loss(
                s_logits, m, b_["labels"], b_["lab_lens"],
                blank_id=tokens.blank_id)
        return loss

    dp, mp = max(args.data_parallel, 1), max(args.model_parallel, 1)
    n_dev = dp * mp if (args.data_parallel or args.model_parallel) else len(jax.devices())
    mesh = make_mesh(n_dev, model_axis=mp if mp > 1 else 1,
                     slices=max(args.slices, 1))
    trainer = ModuleTrainer(student, params, loss_fn, mesh=mesh, lr=args.lr)

    start_step = 0
    if args.resume and args.ckpt_dir and Path(args.ckpt_dir).is_dir():
        start_step = trainer.restore(args.ckpt_dir)
        print(f"[distill_asr] resumed {args.ckpt_dir} at step {start_step}")

    @jax.jit
    def student_decode(p_, wav, lens):
        feats, mask = frontend(wav, lens)
        logits = student.apply(p_, feats, mask)[:, cfg.num_prompt:]
        return ctc_greedy_decode(logits, mask.astype(jnp.float32),
                                 tokens.blank_id)

    def agreement(n=16):
        """CER of student greedy decode vs the TEACHER's on held-out audio."""
        wav, lens = val_sampler.batch(n)
        wav_j, lens_j = jnp.asarray(wav), jnp.asarray(lens)
        _, t_ids, t_lens = teacher_fwd(wav_j, lens_j)
        s_ids, s_lens = student_decode(trainer.state.params, wav_j, lens_j)
        t_ids, t_lens = np.asarray(t_ids), np.asarray(t_lens)
        s_ids, s_lens = np.asarray(s_ids), np.asarray(s_lens)
        vals = []
        for i in range(n):
            ref = tokens.decode(t_ids[i][: int(t_lens[i])])
            hyp = tokens.decode(s_ids[i][: int(s_lens[i])])
            if ref:
                vals.append(cer(ref, hyp))
        return float(np.mean(vals)) if vals else float("nan")

    a0 = agreement()
    print(f"[distill_asr] teacher-agreement CER at step {start_step}: {a0:.3f}")
    t0 = time.time()
    global_batch = args.batch * mesh.shape["data"]
    max_label = 32
    for step in range(start_step + 1, args.steps + 1):
        wav, lens = sampler.batch(global_batch)
        wav_j, lens_j = jnp.asarray(wav), jnp.asarray(lens)
        t_logits, t_ids, t_lens = teacher_fwd(wav_j, lens_j)
        batch = {"wav": wav_j, "lens": lens_j, "t_logits": t_logits}
        if args.ctc_weight > 0:
            ids = np.asarray(t_ids)[:, :max_label]
            ll = np.minimum(np.asarray(t_lens), max_label).astype(np.int32)
            labels = np.zeros((global_batch, max_label), np.int32)
            for i in range(global_batch):
                labels[i, : ll[i]] = ids[i, : ll[i]]
            batch["labels"] = jnp.asarray(labels)
            batch["lab_lens"] = jnp.asarray(ll)
        loss = trainer.train_step(batch)
        if step % args.log_every == 0 or step == start_step + 1:
            rate = (time.time() - t0) / max(step - start_step, 1) * 1000
            print(f"step {step:5d}  KD loss {loss:8.4f}  ({rate:.0f} ms/step)")
        if args.ckpt_dir and args.save_every and step % args.save_every == 0:
            trainer.save(args.ckpt_dir)
            print(f"[distill_asr] checkpoint @ step {step} -> {args.ckpt_dir}")
    if args.ckpt_dir and trainer.state.step > start_step:
        trainer.save(args.ckpt_dir)
    a1 = agreement()
    print(f"[distill_asr] teacher-agreement CER after: {a1:.3f}")

    if args.export:
        from ..train.checkpoint import save_params

        save_params(trainer.state.params, args.export)
        print(f"[distill_asr] exported student params -> {args.export} "
              f"(use --sense-voice {args.export}; vocab from --tokens)")
    from ..train.data import write_run_manifest

    for d in filter(None, {args.ckpt_dir, args.export}):
        write_run_manifest(d, args, {"agreement_before": a0,
                                     "agreement_after": a1})
    return a0, a1


if __name__ == "__main__":
    main()
