"""Quality-gate branch-audio diagnostic (round-5).

The r5 CER decomposition pinned the gate failure to the SEPARATED-BRANCH
audio: clean CER 0.0, oracle-span CER 0.0, pipeline CER 0.64 with
deletion-heavy hypotheses. This tool restores the trained world pack
(quality_gate.train_world_pack --ckpt-dir) and characterizes what the
separator actually hands the recognizer: branch scale, per-slot SI-SDR,
and decode under controlled transformations (renormalized gain, synthetic
residue at the measured SI-SDR, raw mixture).

Usage:
    python tools/diag_gate.py --ckpt /root/repo/.ckpt_gate
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def rms(x):
    return float(np.sqrt(np.mean(np.square(x))) + 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/root/repo/.ckpt_gate")
    ap.add_argument("--eval-seed", type=int, default=424242)
    ap.add_argument("--scenes", type=int, default=6)
    args = ap.parse_args()

    from audio_classification_tpu.runtime.device import enable_compilation_cache
    enable_compilation_cache()
    from audio_classification_tpu.metrics import cer
    from audio_classification_tpu.metrics.sisdr import si_sdr
    from audio_classification_tpu.pipelines.quality_gate import (
        N_SPK, SR, build_world_engine, rand_word, say)

    engine, tokens = build_world_engine(0, args.ckpt)

    # ---- replicate run_quality_gate's eval_rng draw order exactly
    eval_rng = np.random.default_rng(args.eval_seed)
    target_spk = 0
    enroll_wav = say(eval_rng, target_spk, rand_word(eval_rng, 6, 6))
    enroll_vec = engine.embed([enroll_wav])[0]
    for _ in range(3):  # calibration scene draws (engine calls skipped)
        w_t = rand_word(eval_rng, 6, 6)
        say(eval_rng, target_spk, w_t)
        say(eval_rng, int(eval_rng.integers(1, N_SPK)), rand_word(eval_rng, 6, 6))

    dur = 3.0
    t3 = int(dur * SR)
    tone = SR // 4
    all_cers = {}
    for i in range(args.scenes):
        w_t = rand_word(eval_rng, 6, 6) + rand_word(eval_rng, 6, 6)
        tgt = say(eval_rng, target_spk, w_t)[:t3]
        scene = np.zeros(t3, np.float32)
        scene[: tgt.size] += tgt
        intr_spk = int(eval_rng.integers(1, N_SPK))
        w_i = rand_word(eval_rng, 5, 5)
        intr = say(eval_rng, intr_spk, w_i)
        a = int(0.9 * SR)
        b_ = min(a + intr.size, t3)
        intr_full = np.zeros(t3, np.float32)
        intr_full[a:b_] = intr[: b_ - a]
        scene += intr_full
        tgt_full = np.zeros(t3, np.float32)
        tgt_full[: tgt.size] = tgt

        rec = engine.process_overlap([scene], [enroll_vec], return_branches=True)[0]
        br = np.asarray(rec["branches"][rec["best"]])
        print(f"\n== scene {i}: truth={w_t!r} best={rec['best']} "
              f"scores={np.round(np.asarray(rec['scores']), 3)}")
        print(f"   rms: tgt={rms(tgt_full):.4f} branch={rms(br):.4f} "
              f"peak branch={np.max(np.abs(br)):.3f}  "
              f"si_sdr(branch|tgt)={si_sdr(br, tgt_full):.2f} dB")
        # per-slot SI-SDR: where does the damage live?
        slots = [round(float(si_sdr(br[k*tone:(k+1)*tone],
                                    tgt_full[k*tone:(k+1)*tone])), 1)
                 for k in range(12)]
        print(f"   slot si_sdr: {slots}")

        # residue at the measured global SI-SDR (the training augmentation)
        g = 10 ** (-si_sdr(br, tgt_full) / 20)
        resid = tgt_full + intr_full * (g * rms(tgt_full) / max(rms(intr_full), 1e-9))

        cases = {
            "branch_as_is": br,
            "branch_rms_norm": br * (rms(tgt_full) / rms(br)),
            "branch_peak_norm": br * (0.25 / max(np.max(np.abs(br)), 1e-9)),
            "mixture_raw": scene,
            "tgt_plus_residue": resid.astype(np.float32),
        }
        hyps = engine.transcribe([np.asarray(v, np.float32) for v in cases.values()])
        for (name, _), h in zip(cases.items(), hyps):
            c = cer(w_t, h)
            all_cers.setdefault(name, []).append(c)
            print(f"   {name:18s} cer={c:.2f} hyp={h!r}")

    print("\n==== mean CER by case ====")
    for name, cs in all_cers.items():
        print(f"  {name:18s} {np.mean(cs):.3f}")


if __name__ == "__main__":
    main()
