"""Separator training on a ("data", "model") mesh.

New capability over the reference (which only consumes pretrained torch
checkpoints — SURVEY.md §5.4): a pjit-sharded PIT SI-SDR training step for
ConvTasNet/MossFormer. Batch shards over the "data" axis (DP); the TCN's
wide hidden channels shard over "model" (TP); XLA inserts gradient psums
and activation collectives from the NamedSharding annotations.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.convtasnet import ConvTasNet, ConvTasNetConfig
from ..models.mossformer import MossFormer, MossFormerConfig
from ..parallel.mesh import (apply_param_specs, convtasnet_param_spec,
                             data_sharding, make_mesh, mossformer_param_spec)
from .losses import pit_si_sdr_loss


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def make_optimizer(lr=1e-3, clip: float = 5.0) -> optax.GradientTransformation:
    """``lr`` may be a float or any optax schedule (step -> lr)."""
    return optax.chain(optax.clip_by_global_norm(clip), optax.adam(lr))


def warmup_cosine(peak_lr: float, total_steps: int,
                  warmup_frac: float = 0.1, floor_frac: float = 0.05):
    """Linear-warmup + cosine-decay schedule for the in-framework trainers.

    Spiky losses (CTC especially) diverge under a constant Adam lr: the
    quality-gate recognizer at a flat 5e-4 bounced between 0.27 and 1.07
    per-sequence NLL and over-blanked at decode. Warmup tames the early
    steps; the cosine tail anneals into a stable minimum.
    """
    warmup = max(1, int(total_steps * warmup_frac))
    return optax.warmup_cosine_decay_schedule(
        init_value=peak_lr / 25.0, peak_value=peak_lr,
        warmup_steps=warmup, decay_steps=max(total_steps, warmup + 1),
        end_value=peak_lr * floor_frac)


class SeparatorTrainer:
    """pjit-sharded trainer for a separation model.

    `mesh` axes: "data" (DP) x "model" (TP). Params are placed according to
    `param_rule`; inputs shard on batch. The train step is one compiled XLA
    program including loss, grads, optimizer update and the psum collectives.
    """

    def __init__(
        self,
        cfg,
        mesh: Optional[Mesh] = None,
        lr: float = 1e-3,
        seed: int = 0,
        param_rule: Optional[Callable] = None,
        time_shard: bool = False,
    ):
        """cfg picks the architecture: ConvTasNetConfig or MossFormerConfig
        (both models share the [B,T] mix + mask -> [B,n_src,T] contract and
        the PIT SI-SDR objective; each gets its own TP partitioning rule).

        ``time_shard=True`` runs the forward through the sequence-parallel
        separator (parallel/sp_convtasnet) instead of sharding the batch:
        the "data" axis carries each crop's TIME axis (halo-exchanged
        convs; shard_map differentiates, so the backward pass reuses the
        same halos/psums transposed). For crops too long for one chip —
        batch is replicated, params follow `param_rule` as usual.
        """
        self.cfg = cfg
        self.time_shard = bool(time_shard)
        self.mesh = mesh or make_mesh(model_axis=1)
        if isinstance(cfg, MossFormerConfig):
            self.model = MossFormer(cfg)
            param_rule = param_rule or mossformer_param_spec
        elif isinstance(cfg, ConvTasNetConfig):
            # train steps run under pjit with mesh-placed params (TP shards
            # the hidden dim); the fused Pallas masker can't be partitioned
            # by pjit, so the trainer always takes the dense TCN loop
            import dataclasses as _dc
            self.model = ConvTasNet(_dc.replace(cfg, fused_tcn="off"))
            param_rule = param_rule or convtasnet_param_spec
        else:
            raise TypeError(f"unsupported separator config: {type(cfg)}")
        self.tx = make_optimizer(lr)

        # jitted init: eager dispatch through the device tunnel pays ~90 ms
        # per op (CLAUDE.md); one compiled program per config instead
        params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed), jnp.zeros((1, 4000)), jnp.ones((1, 4000)))
        self.param_shardings = apply_param_specs(self.mesh, params, param_rule)
        params = jax.device_put(params, self.param_shardings)
        opt_state = jax.device_put(self.tx.init(params), None)  # optimizer mirrors param placement via init
        self.state = TrainState(params=params, opt_state=opt_state)

        dsh = data_sharding(self.mesh)

        if self.time_shard:
            from ..parallel.sp_convtasnet import sp_separate, sp_separate_mossformer

            sp_fn = (sp_separate_mossformer if isinstance(cfg, MossFormerConfig)
                     else sp_separate)

            def loss_fn(p, mix, refs, mask):
                lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
                ests = sp_fn(p, cfg, mix, lengths, self.mesh, axis="data")
                return pit_si_sdr_loss(ests, refs, mask)
        else:
            def loss_fn(p, mix, refs, mask):
                ests = self.model.apply(p, mix, mask)
                return pit_si_sdr_loss(ests, refs, mask)

        def step_fn(params, opt_state, mix, refs, mask):
            loss, grads = jax.value_and_grad(loss_fn)(params, mix, refs, mask)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        # time-sharded crops keep the batch replicated (the "data" axis
        # carries the time axis inside the shard_map'd forward)
        in_dsh = None if self.time_shard else dsh
        self._step = jax.jit(
            step_fn,
            in_shardings=(self.param_shardings, None, in_dsh, in_dsh, in_dsh),
            out_shardings=(self.param_shardings, None, NamedSharding(self.mesh, P())),
        )

    def train_step(self, mix, refs, mask) -> float:
        """mix [B, T], refs [B, n_src, T], mask [B, T] -> loss (float)."""
        if self.time_shard:  # batch replicated; jit places per in_shardings
            mix = jnp.asarray(mix, jnp.float32)
            refs = jnp.asarray(refs, jnp.float32)
            mask = jnp.asarray(mask, jnp.float32)
        else:
            dsh = data_sharding(self.mesh)
            mix = jax.device_put(jnp.asarray(mix, jnp.float32), dsh)
            refs = jax.device_put(jnp.asarray(refs, jnp.float32), dsh)
            mask = jax.device_put(jnp.asarray(mask, jnp.float32), dsh)
        params, opt_state, loss = self._step(self.state.params, self.state.opt_state, mix, refs, mask)
        self.state = TrainState(params, opt_state, self.state.step + 1)
        return float(loss)

    def save(self, ckpt_dir: str) -> None:
        """Write a resumable mid-run checkpoint (params + opt moments + step)."""
        from .checkpoint import save_train_state

        save_train_state(self.state, ckpt_dir)

    def restore(self, ckpt_dir: str) -> int:
        """Resume from save(); params AND optimizer moments go back onto
        their mesh shardings (orbax restores onto one device otherwise,
        which jit rejects as incompatible with the sharded params).
        Returns the restored step."""
        from .checkpoint import load_train_state

        import numpy as np

        st = load_train_state(self.state, ckpt_dir)
        params = jax.device_put(st.params, self.param_shardings)

        def replace(restored, live):
            sh = getattr(live, "sharding", None)
            if isinstance(sh, NamedSharding):   # adam moments mirror params
                return jax.device_put(restored, sh)
            # orbax commits scalars (adam count, ...) to one device, which
            # jit rejects next to mesh-sharded params; hand it back as an
            # uncommitted host array so jit places it
            return np.asarray(restored)

        opt_state = jax.tree.map(replace, st.opt_state, self.state.opt_state)
        self.state = TrainState(params, opt_state, st.step)
        return st.step


class ModuleTrainer:
    """Generic DP-sharded trainer for any flax module + loss.

    loss_fn(apply_fn, params, batch) -> scalar; batch is a pytree of arrays
    with a leading batch dim, sharded over the mesh "data" axis. Covers the
    non-separator model families (OSD/VAD frame BCE, speaker AAM-softmax,
    ASR CTC via models/asr/ctc.ctc_loss).
    """

    def __init__(self, module, params, loss_fn, mesh: Optional[Mesh] = None,
                 lr: float = 1e-3, shard_batch: bool = True):
        """``shard_batch=False`` keeps the batch replicated — for losses
        that spend the "data" axis on something else (e.g. sequence-
        parallel encoders sharding the frame axis inside the loss)."""
        self.module = module
        self.mesh = mesh or make_mesh(model_axis=1)
        self.shard_batch = bool(shard_batch)
        self.tx = make_optimizer(lr)
        self.state = TrainState(params=params, opt_state=self.tx.init(params))
        dsh = data_sharding(self.mesh) if self.shard_batch else None

        def step_fn(params, opt_state, batch):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(self.module.apply, p, batch)
            )(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = jax.jit(
            step_fn,
            in_shardings=(None, None, dsh),
            out_shardings=(None, None, NamedSharding(self.mesh, P())),
        )

    def train_step(self, batch) -> float:
        if self.shard_batch:
            batch = jax.device_put(batch, data_sharding(self.mesh))
        params, opt_state, loss = self._step(self.state.params, self.state.opt_state, batch)
        self.state = TrainState(params, opt_state, self.state.step + 1)
        return float(loss)

    def save(self, ckpt_dir: str) -> None:
        """Write a resumable mid-run checkpoint (params + opt moments + step)."""
        from .checkpoint import save_train_state

        save_train_state(self.state, ckpt_dir)

    def restore(self, ckpt_dir: str) -> int:
        """Resume from save(). Params here are replicated (in_shardings
        None), so restored leaves come back as uncommitted host arrays and
        jit places them. Returns the restored step."""
        import numpy as np

        from .checkpoint import load_train_state

        st = load_train_state(self.state, ckpt_dir)
        as_host = lambda tree: jax.tree.map(np.asarray, tree)
        self.state = TrainState(as_host(st.params), as_host(st.opt_state), st.step)
        return st.step
