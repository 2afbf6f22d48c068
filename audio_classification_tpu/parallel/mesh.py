"""Device mesh + sharding helpers.

The reference is single-process single-device with zero collectives
(SURVEY.md §2.4); scaling here is mesh-native: a ("data", "model") mesh over
ICI, batch sharded on "data" (DP), wide channel/head dims sharded on
"model" (TP). XLA inserts the psum/all-gather collectives from the
NamedSharding annotations — no hand-written NCCL analog.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_axis: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh.

    model_axis divides n_devices; data axis gets the rest. model_axis=1
    degenerates to pure DP (still a valid 2-D mesh so the same shardings
    apply everywhere).
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_axis != 0:
        raise ValueError(f"model_axis {model_axis} must divide device count {n}")
    arr = np.asarray(devs).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays: [B, ...] split over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of host arrays with batch dim sharded over "data"."""
    return jax.device_put(tree, data_sharding(mesh))


# ---------------------------------------------------------------------------
# Parameter partitioning rules (TP)
# ---------------------------------------------------------------------------

def convtasnet_param_spec(path: tuple, leaf) -> P:
    """TP rules for ConvTasNet: shard the wide TCN hidden dim over "model".

    - in_conv kernels [1, B, H]   -> P(None, None, "model")
    - dw_conv kernels [P, 1, H]   -> P(None, None, "model") (grouped conv:
      channel-sharded depthwise runs locally per shard)
    - res/skip kernels [1, H, B]  -> P(None, "model", None)
    - biases of H width           -> P("model")
    everything else replicated.
    """
    names = [str(p) for p in path]
    joined = "/".join(names)
    shape = getattr(leaf, "shape", ())
    if "in_conv" in joined or "dw_conv" in joined:
        if names[-1] == "kernel" and len(shape) == 3:
            return P(None, None, "model")
        if names[-1] == "bias":
            return P("model")
    if ("res_conv" in joined or "skip_conv" in joined) and names[-1] == "kernel" and len(shape) == 3:
        return P(None, "model", None)
    return P()


def mossformer_param_spec(path: tuple, leaf) -> P:
    """TP rules for MossFormer (models/mossformer.py): megatron-style pair
    around the GAU's expanded gate dim d_e = dim*expansion.

    - to_u/to_v kernels [dim, d_e] -> P(None, "model") (column parallel);
      their biases [d_e] -> P("model")
    - to_out kernel [d_e, dim] -> P("model", None) (row parallel; XLA
      inserts the psum over the contracted shards)
    The attention path (to_qk, gamma/beta) and the elementwise gate
    u ⊙ (attn v) see consistently e-sharded tensors, so no resharding
    happens inside a block. Everything else replicated.
    """
    names = [str(p) for p in path]
    joined = "/".join(names)
    shape = getattr(leaf, "shape", ())
    if "to_u" in joined or "to_v" in joined:
        if names[-1] == "kernel" and len(shape) == 2:
            return P(None, "model")
        if names[-1] == "bias":
            return P("model")
    if "to_out" in joined and names[-1] == "kernel" and len(shape) == 2:
        return P("model", None)
    return P()


def apply_param_specs(mesh: Mesh, params, rule) -> object:
    """Map a rule(path, leaf)->PartitionSpec over a pytree -> shardings tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        NamedSharding(mesh, rule(tuple(k.key for k in path if hasattr(k, "key")), leaf))
        for path, leaf in flat[0]
    ]
    return jax.tree_util.tree_unflatten(flat[1], specs)
