"""Quality-gate runner: train-all-stages -> flagship run -> QUALITY JSON.

Emits the committed quality artifact (QUALITY_r*.json at the repo root):
the reference's headline quality metrics — target_hit_rate_segments, PIT
SI-SDR/SI-SDRi (reference run log: todo.md:4-11) — plus per-record CER on
the synthetic world, with explicit pass gates (hit rate >= 0.9, CER <= 0.2).

    python -m audio_classification_tpu.cli.quality_gate --out QUALITY_r04.json

Full scale trains ~20 min on one TPU v5e chip; --steps-scale 0.01 is the
CI plumbing smoke.
"""
from __future__ import annotations

import argparse
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--out", default="QUALITY.json", help="Artifact path")
    p.add_argument("--steps-scale", type=float, default=1.0,
                   help="Scale every stage's training step budget")
    p.add_argument("--scenes", type=int, default=6,
                   help="Held-out evaluation scenes")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-seed", type=int, default=424242)
    p.add_argument("--hit-gate", type=float, default=0.9)
    p.add_argument("--cer-gate", type=float, default=0.2)
    p.add_argument("--no-gate-exit", action="store_true",
                   help="Always exit 0 (report-only mode)")
    p.add_argument("--ckpt-dir", default=None,
                   help="Save the trained world pack here (orbax)")
    p.add_argument("--reuse-ckpt", action="store_true",
                   help="Skip training when --ckpt-dir already exists")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..runtime.device import enable_compilation_cache

    enable_compilation_cache()
    from ..pipelines.quality_gate import run_quality_gate, write_quality_json

    m = run_quality_gate(steps_scale=args.steps_scale, n_scenes=args.scenes,
                         seed=args.seed, eval_seed=args.eval_seed,
                         ckpt_dir=args.ckpt_dir, reuse_ckpt=args.reuse_ckpt)
    artifact = write_quality_json(m, args.out, hit_gate=args.hit_gate,
                                  cer_gate=args.cer_gate)
    print(f"quality gate: {'OK' if artifact['quality_ok'] else 'FAILED'} "
          f"-> {args.out}")
    if not artifact["quality_ok"] and not args.no_gate_exit:
        sys.exit(1)
    return artifact


if __name__ == "__main__":
    main()
