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


def save_train_state(state, ckpt_dir: str) -> None:
    """Persist a full mid-run trainer state (params + optimizer moments +
    step) so a killed training run resumes exactly — capability the
    reference has no counterpart for (it never trains; its only resume
    story is npz embedding caches, reference: src/model.py:263-339)."""
    import numpy as np

    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": np.asarray(state.step, np.int64)}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(ckpt_dir).resolve(), tree, force=True)


def load_train_state(template_state, ckpt_dir: str):
    """Restore what save_train_state wrote; ``template_state`` (a freshly
    initialized TrainState) supplies the pytree structure/shardings."""
    import numpy as np

    from .trainer import TrainState

    tree = {"params": template_state.params,
            "opt_state": template_state.opt_state,
            "step": np.asarray(template_state.step, np.int64)}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(Path(ckpt_dir).resolve(), tree)
    return TrainState(restored["params"], restored["opt_state"],
                      int(restored["step"]))
