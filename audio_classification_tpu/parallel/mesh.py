"""Device mesh + sharding helpers.

The reference is single-process single-device with zero collectives
(SURVEY.md §2.4); scaling here is mesh-native: a ("data", "model") mesh over
ICI, batch sharded on "data" (DP), wide channel/head dims sharded on
"model" (TP). XLA inserts the psum/all-gather collectives from the
NamedSharding annotations — no hand-written NCCL analog.
"""
from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_axis: int = 1,
    devices: Optional[Sequence] = None,
    slices: int = 1,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh.

    model_axis divides n_devices; data axis gets the rest. model_axis=1
    degenerates to pure DP (still a valid 2-D mesh so the same shardings
    apply everywhere).

    slices > 1 declares a multi-slice (DCN-connected) deployment: the
    "data" axis then spans slices x per-slice-chips with the slice factor
    OUTERMOST, so every DP collective (gradient psum, batch all-gather)
    reduce-scatters over in-slice ICI first and only the per-slice
    partial crosses DCN — the standard hybrid data-parallel layout
    (scaling-book recipe). Axis names are unchanged, so every existing
    P("data")/P("model") spec in the trainers and the serving engine
    works on a hybrid mesh as-is. "model" (TP) stays inside one slice:
    TP collectives are latency-bound and must never ride DCN.
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    slices = max(int(slices), 1)
    if n % (model_axis * slices) != 0:
        raise ValueError(
            f"model_axis {model_axis} x slices {slices} must divide device count {n}")
    if slices > 1:
        # model_axis * slices | n implies model_axis <= n // slices, so TP
        # always fits inside one slice's chips (never crosses DCN)
        per_slice = n // slices
        arr = _hybrid_device_grid(devs, slices, per_slice, model_axis)
    else:
        arr = np.asarray(devs).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def _hybrid_device_grid(devs, slices: int, per_slice: int, model_axis: int):
    """[slices*per_slice/model, model] grid, slice-major on the data axis.

    On real multi-slice TPU jobs, jax.experimental.mesh_utils arranges each
    slice's chips along physical ICI rings (nearest-neighbor collectives);
    process/slice boundaries land on the outer (DCN) factor. Virtual or
    homogeneous-host device lists (CPU tests, the tunneled single chip)
    don't carry coords, so fall back to order-preserving reshape — the
    collective layout (slice outermost) is identical either way.
    """
    try:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_slice // model_axis, model_axis),
            dcn_mesh_shape=(slices, 1),
            devices=devs,
        )  # -> [slices * per_slice/model, model]
        return grid
    except Exception as e:
        # expected on virtual/CPU device lists (no coords — the test mesh);
        # on a REAL accelerator job a silent fallback could put "in-slice"
        # DP rows across DCN, so say which layout is actually in effect
        if getattr(devs[0], "platform", "cpu") != "cpu":
            warnings.warn(
                f"create_hybrid_device_mesh failed ({type(e).__name__}: {e}); "
                "falling back to an order-preserving reshape — correct only "
                "if jax.devices() enumerates slice-major", stacklevel=2)
        arr = np.asarray(devs).reshape(slices, per_slice // model_axis, model_axis)
        return arr.reshape(slices * (per_slice // model_axis), model_axis)


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
