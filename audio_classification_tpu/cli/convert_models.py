"""Convert reference model checkpoints into a framework checkpoint dir.

Migration bridge for users of the reference: point this tool at locally
downloaded reference checkpoints and get an orbax `--checkpoint-dir` every
pipeline here can load.

Supported sources today:
- asteroid Conv-TasNet torch checkpoints (2-src and 3-src; the weights the
  reference's Separator downloads — reference: separation.py:105-163)
  -> exact architecture mapping (models/convert/torch_import).
- any ONNX model (speaker embedder / SenseVoice / silero VAD from the
  reference zoo): initializer tensors are extracted with the built-in
  protobuf reader and dumped to an .npz + a JSON inventory (names, shapes,
  dtypes, int8 scale/zero-point pairing) for architecture-mapping work;
  the reference's ONNX nets differ structurally from this framework's
  JAX modules, so their mapping is inventory-assisted rather than automatic.

Everything not converted stays at seed initialization in the output pack.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Convert reference checkpoints -> orbax checkpoint dir")
    p.add_argument("--out", required=True, help="Output orbax checkpoint directory")
    p.add_argument("--preset", default="full", choices=["full", "tiny"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sep-checkpoint-3", default="", help="asteroid ConvTasNet 3-src torch checkpoint")
    p.add_argument("--sep-checkpoint-2", default="", help="asteroid ConvTasNet 2-src torch checkpoint")
    p.add_argument("--onnx", nargs="*", default=[],
                   help="ONNX files to inventory (weights -> <name>.weights.npz + .inventory.json)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..engine.runtime import EnginePreset, ModelPack, tiny_preset
    from ..train.checkpoint import save_model_pack

    preset = tiny_preset() if args.preset == "tiny" else EnginePreset()
    pack = ModelPack(preset, seed=args.seed)

    if args.sep_checkpoint_3:
        from ..models.convert.torch_import import load_convtasnet_torch

        pack.load_params("sep3", load_convtasnet_torch(args.sep_checkpoint_3, preset.sep3))
        print(f"converted 3-src ConvTasNet from {args.sep_checkpoint_3}")
    if args.sep_checkpoint_2:
        from ..models.convert.torch_import import load_convtasnet_torch

        pack.load_params("sep2", load_convtasnet_torch(args.sep_checkpoint_2, preset.sep2))
        print(f"converted 2-src ConvTasNet from {args.sep_checkpoint_2}")

    for onnx_path in args.onnx:
        from ..models.convert.onnx_import import load_onnx_weights

        weights = load_onnx_weights(onnx_path)
        stem = Path(onnx_path).with_suffix("")
        np.savez_compressed(f"{stem}.weights.npz", **weights)
        inventory = {
            name: {
                "shape": list(w.shape),
                "dtype": str(w.dtype),
                "quantized": f"{name}_scale" in weights,
            }
            for name, w in weights.items()
        }
        Path(f"{stem}.inventory.json").write_text(json.dumps(inventory, indent=2))
        print(f"inventoried {len(weights)} tensors from {onnx_path} -> {stem}.weights.npz")

    save_model_pack(pack, args.out)
    print(f"wrote checkpoint dir: {args.out}")


if __name__ == "__main__":
    main()
