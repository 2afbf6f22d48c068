"""Checkpoint save/load for ModelPack params (orbax).

The reference persists inference-side state as torch checkpoints + npz
embedding caches (reference: separation.py:105-163, model.py:263-339). Here
all model params live in one orbax PyTree checkpoint directory so a whole
pipeline's weights load in one call.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_model_pack(pack, ckpt_dir: str) -> None:
    path = Path(ckpt_dir).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, dict(pack.params), force=True)


def load_model_pack(pack, ckpt_dir: str) -> None:
    path = Path(ckpt_dir).resolve()
    target = jax.tree.map(lambda x: x, dict(pack.params))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    for k, v in restored.items():
        # load_params bumps pack.version, which invalidates any StageEngine's
        # bfloat16 cast-params cache (engine keys exec_params on the version;
        # a raw dict write would keep serving stale casted weights).
        pack.load_params(k, v)


def save_params(params: Any, path: str) -> None:
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).resolve(), params, force=True)


def load_params(template: Any, path: str) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve(), template)
