"""Pallas TPU kernels: blockwise streaming (flash) attention family.

The dense MHSA path (models/common.MultiHeadSelfAttention) materializes the
[B, H, T, T] logit tensor in HBM; at long-form lengths (transcribe_long on a
single chip, SP-training crops) that matrix dominates memory traffic and
caps T at sqrt(HBM). These kernels stream K/V blocks through VMEM with the
classic running-max/running-sum softmax rescaling, so attention memory is
O(T * block) and the logits never leave the chip:

  per (batch*head, q-block):  for each k-block:
    s = q @ k^T * scale + key_bias          [block_q, block_k]  (MXU, f32 acc)
    m' = max(m, rowmax(s)); alpha = exp(m - m')
    p = exp(s - m'); l = alpha*l + rowsum(p)
    acc = alpha*acc + p @ v                 (MXU)
  out = acc / l                 (flash_attention)
  out = (acc, m, l)             (flash_attention_stats — ring-attention merge)

Mask semantics match the dense path exactly: an additive key bias
(0 / -1e9) derived from the boolean frame mask — fully-masked (padded)
query rows degrade to the same near-uniform softmax the dense path
produces and are discarded downstream.

Backward runs through a jax.checkpoint'ed blockwise XLA reference (scan
over q blocks), so training gets the same O(T * block) memory without a
hand-written backward kernel; gradients are those of exact softmax
attention.

gau_attention is the softmax-free sibling for MossFormer's gated attention
units: relu(q·kᵀ·scale)² scores accumulate directly (no rescaling state).

Used by MultiHeadSelfAttention / GAUBlock / ring attention when
``flash_enabled`` resolves true (TPU backend and T >= ACT_FLASH_ATTN_MIN_T,
or ACT_FLASH_ATTN=1); the dense einsum paths are the numeric oracles
(tests/test_flash_attention.py).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _FlashCfg(NamedTuple):
    block_q: int
    block_k: int
    scale: float
    heads: int
    interpret: bool


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *rest,
            scale: float, nk: int, emit_stats: bool):
    """Streaming-softmax body. ``emit_stats=False``: normalize in the
    epilogue (out = acc / l). ``emit_stats=True``: emit the UNNORMALIZED
    accumulator plus the running (max, sum) — the ring-attention
    cross-shard merge (parallel/ring_attention._ring_body) rescales and
    normalizes across shards itself."""
    if emit_stats:
        m_out_ref, l_out_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, Dp]
    k = k_ref[0]  # [block_k, Dp]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[0]  # [1, block_k] broadcasts over q rows

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _():
        if emit_stats:
            out_ref[0] = acc_ref[:]
            m_out_ref[0] = m_ref[:]
            l_out_ref[0] = l_ref[:]
        else:
            out_ref[0] = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)


def _flash_fwd_call(cfg: _FlashCfg, q, k, v, bias, emit_stats: bool):
    """Padded [BH, Tq, Dp] q / [BH, Tk, Dp] k,v / [B, 1, Tk] bias ->
    [BH, Tq, Dp] f32 (emit_stats=False) or the (acc, m [BH,Tq,LANE],
    l [BH,Tq,LANE]) triple (emit_stats=True; m/l carry the row value
    broadcast across the lane dim).

    bias rides as rank-3 with a singleton middle dim so its block's last two
    dims are (1, block_k) == (array dim, lane multiple) — Mosaic requires the
    sublane block dim be 8-divisible OR equal to the full array dim."""
    bh, tq, dp = q.shape
    tk = k.shape[1]
    nq, nk = tq // cfg.block_q, tk // cfg.block_k
    heads = cfg.heads
    mem = pl.ANY if cfg.interpret else pltpu.VMEM
    out_block = pl.BlockSpec((1, cfg.block_q, dp), lambda b, i, j: (b, i, 0),
                             memory_space=mem)
    stat_block = pl.BlockSpec((1, cfg.block_q, _LANE), lambda b, i, j: (b, i, 0),
                              memory_space=mem)
    out_shape = jax.ShapeDtypeStruct((bh, tq, dp), jnp.float32)
    stat_shape = jax.ShapeDtypeStruct((bh, tq, _LANE), jnp.float32)
    return pl.pallas_call(
        functools.partial(_kernel, scale=cfg.scale, nk=nk,
                          emit_stats=emit_stats),
        out_shape=(out_shape, stat_shape, stat_shape) if emit_stats else out_shape,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, cfg.block_q, dp), lambda b, i, j: (b, i, 0), memory_space=mem),
            pl.BlockSpec((1, cfg.block_k, dp), lambda b, i, j: (b, j, 0), memory_space=mem),
            pl.BlockSpec((1, cfg.block_k, dp), lambda b, i, j: (b, j, 0), memory_space=mem),
            pl.BlockSpec((1, 1, cfg.block_k), lambda b, i, j: (b // heads, 0, j), memory_space=mem),
        ],
        out_specs=(out_block, stat_block, stat_block) if emit_stats else out_block,
        scratch_shapes=[
            pltpu.VMEM((cfg.block_q, _LANE), jnp.float32),
            pltpu.VMEM((cfg.block_q, _LANE), jnp.float32),
            pltpu.VMEM((cfg.block_q, dp), jnp.float32),
        ],
        interpret=cfg.interpret,
    )(q, k, v, bias)


def _blockwise_ref(cfg: _FlashCfg, q, k, v, bias, emit_stats: bool):
    """Differentiable blockwise XLA oracle on the padded operands; backward
    runs through this under jax.checkpoint (O(T * block_q) live memory
    either way). With emit_stats it returns the exact (o_unnorm, m, l)
    triple — rescaling by m cancels analytically, so autodiff through it
    is the true gradient."""
    bh, tq, dp = q.shape
    b = bias.shape[0]
    nq = tq // cfg.block_q
    kh = k.reshape(b, cfg.heads, -1, dp)
    vh = v.reshape(b, cfg.heads, -1, dp)

    @jax.checkpoint
    def blk(qb):  # [B, H, block_q, Dp]
        s = jnp.einsum("bhqd,bhkd->bhqk", qb, kh,
                       preferred_element_type=jnp.float32) * cfg.scale
        s = s + bias[:, :, None, :]  # [B, 1, Tk] -> broadcasts over heads + q
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vh.dtype), vh,
                       preferred_element_type=jnp.float32)
        if emit_stats:
            return o, m, l
        return o / jnp.maximum(l[..., None], 1e-30)

    qb = q.reshape(b, cfg.heads, nq, cfg.block_q, dp).transpose(2, 0, 1, 3, 4)
    if not emit_stats:
        out = jax.lax.map(blk, qb)  # [nq, B, H, block_q, Dp]
        return out.transpose(1, 2, 0, 3, 4).reshape(bh, tq, dp)
    o, m, l = jax.lax.map(blk, qb)
    o = o.transpose(1, 2, 0, 3, 4).reshape(bh, tq, dp)
    m = m.transpose(1, 2, 0, 3).reshape(bh, tq)
    l = l.transpose(1, 2, 0, 3).reshape(bh, tq)
    return o, m, l


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(cfg: _FlashCfg, q, k, v, bias):
    return _flash_fwd_call(cfg, q, k, v, bias, emit_stats=False)


def _flash_core_fwd(cfg, q, k, v, bias):
    return _flash_core(cfg, q, k, v, bias), (q, k, v, bias)


def _flash_core_bwd(cfg, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda a, b_, c, d: _blockwise_ref(cfg, a, b_, c, d, emit_stats=False),
        q, k, v, bias)
    return vjp(g)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_stats_core(cfg: _FlashCfg, q, k, v, bias):
    o, m, l = _flash_fwd_call(cfg, q, k, v, bias, emit_stats=True)
    return o, m[..., 0], l[..., 0]


def _flash_stats_core_fwd(cfg, q, k, v, bias):
    return _flash_stats_core(cfg, q, k, v, bias), (q, k, v, bias)


def _flash_stats_core_bwd(cfg, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda a, b_, c, d: _blockwise_ref(cfg, a, b_, c, d, emit_stats=True),
        q, k, v, bias)
    return vjp(g)


_flash_stats_core.defvjp(_flash_stats_core_fwd, _flash_stats_core_bwd)


def _pad_softmax_operands(q, k, v, kv_mask, block_q, block_k, scale, interpret):
    """Shared prologue for the softmax wrappers: pad T/D to block/lane
    multiples, flatten heads, build the rank-3 additive key bias.
    -> (cfg, qp [BH,Tqp,Dp], kp, vp, bias [B,1,Tkp], tqp)."""
    b, h, t, d = q.shape
    tk = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))

    block_q = min(block_q, _round_up(t, _LANE))
    block_k = min(block_k, _round_up(tk, _LANE))
    tqp = _round_up(t, block_q)
    tkp = _round_up(tk, block_k)
    dp = _round_up(d, _LANE)

    def pad3(z, tp):
        return jnp.pad(z, ((0, 0), (0, 0), (0, tp - z.shape[2]), (0, dp - d)))

    qp = pad3(q, tqp).reshape(b * h, tqp, dp)
    kp = pad3(k, tkp).reshape(b * h, tkp, dp)
    vp = pad3(v, tkp).reshape(b * h, tkp, dp)
    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), bool)
    mask_p = jnp.pad(kv_mask.astype(bool), ((0, 0), (0, tkp - tk)))
    bias = jnp.where(mask_p, 0.0, -1e9).astype(jnp.float32)[:, None, :]

    cfg = _FlashCfg(block_q=block_q, block_k=block_k, scale=float(scale),
                    heads=h, interpret=bool(interpret))
    return cfg, qp, kp, vp, bias, tqp, dp


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Masked non-causal self-attention, [B, H, T, D] -> [B, H, T, D] f32.

    kv_mask: optional [B, T] boolean; False keys are excluded exactly as the
    dense path's additive -1e9 bias does. ``scale`` defaults to 1/sqrt(D).
    Arbitrary T and D are padded to block/lane multiples internally and
    sliced back.
    """
    b, h, t, d = q.shape
    cfg, qp, kp, vp, bias, tqp, dp = _pad_softmax_operands(
        q, k, v, kv_mask, block_q, block_k, scale, interpret)
    out = _flash_core(cfg, qp, kp, vp, bias)
    return out.reshape(b, h, tqp, dp)[:, :, :t, :d]


def flash_attention_stats(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,
):
    """Streaming-softmax attention WITHOUT the final normalization:
    [B, H, T, D] -> (o_unnorm [B,H,T,D], m [B,H,T], l [B,H,T]) f32 with
    o = Σ_k exp(s-m)·v, l = Σ_k exp(s-m). The ring-attention shard body
    merges these across devices (same m/l contract as its dense
    _local_attn_block) — so each shard's intra-block attention stops
    materializing [B, H, T_shard, T_shard] logits."""
    b, h, t, d = q.shape
    cfg, qp, kp, vp, bias, tqp, dp = _pad_softmax_operands(
        q, k, v, kv_mask, block_q, block_k, scale, interpret)
    o, m, l = _flash_stats_core(cfg, qp, kp, vp, bias)
    o = o.reshape(b, h, tqp, dp)[:, :, :t, :d]
    m = m.reshape(b, h, tqp)[:, :, :t]
    l = l.reshape(b, h, tqp)[:, :, :t]
    return o, m, l


def _gau_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, acc_ref,
                *, scale: float, nk: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, Dqk]
    k = k_ref[0]  # [block_k, Dqk]
    v = v_ref[0]  # [block_k, De]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s * mask_ref[0]  # [1, block_k]: masked keys -> 0 -> relu^2 = 0
    p = jnp.square(jax.nn.relu(s))
    acc_ref[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _():
        out_ref[0] = acc_ref[:]


def _gau_fwd_call(cfg: _FlashCfg, q, k, v, mask):
    """Padded [B, Tq, Dqk] q / [B, Tk, Dqk] k / [B, Tk, De] v /
    [B, 1, Tk] f32 mask -> [B, Tq, De] f32 (no softmax: relu^2 scores
    accumulate directly, so no running-max/sum state is needed)."""
    b, tq, dqk = q.shape
    tk, de = v.shape[1], v.shape[2]
    nq, nk = tq // cfg.block_q, tk // cfg.block_k
    mem = pl.ANY if cfg.interpret else pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_gau_kernel, scale=cfg.scale, nk=nk),
        out_shape=jax.ShapeDtypeStruct((b, tq, de), jnp.float32),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, cfg.block_q, dqk), lambda b, i, j: (b, i, 0), memory_space=mem),
            pl.BlockSpec((1, cfg.block_k, dqk), lambda b, i, j: (b, j, 0), memory_space=mem),
            pl.BlockSpec((1, cfg.block_k, de), lambda b, i, j: (b, j, 0), memory_space=mem),
            pl.BlockSpec((1, 1, cfg.block_k), lambda b, i, j: (b, 0, j), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, cfg.block_q, de), lambda b, i, j: (b, i, 0), memory_space=mem),
        scratch_shapes=[pltpu.VMEM((cfg.block_q, de), jnp.float32)],
        interpret=cfg.interpret,
    )(q, k, v, mask)


def _gau_blockwise_ref(cfg: _FlashCfg, q, k, v, mask):
    """XLA blockwise oracle; backward runs through this under
    jax.checkpoint — [block_q, Tk] logits live per block, never [Tq, Tk]."""
    b, tq, dqk = q.shape
    nq = tq // cfg.block_q

    @jax.checkpoint
    def blk(qb):  # [B, block_q, Dqk]
        s = jnp.einsum("bqd,bkd->bqk", qb, k,
                       preferred_element_type=jnp.float32) * cfg.scale
        s = s * mask  # [B, 1, Tk]
        p = jnp.square(jax.nn.relu(s))
        return jnp.einsum("bqk,bke->bqe", p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    qb = q.reshape(b, nq, cfg.block_q, dqk).transpose(1, 0, 2, 3)
    out = jax.lax.map(blk, qb)  # [nq, B, block_q, De]
    return out.transpose(1, 0, 2, 3).reshape(b, tq, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gau_core(cfg: _FlashCfg, q, k, v, mask):
    return _gau_fwd_call(cfg, q, k, v, mask)


def _gau_core_fwd(cfg, q, k, v, mask):
    return _gau_fwd_call(cfg, q, k, v, mask), (q, k, v, mask)


def _gau_core_bwd(cfg, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda a, b_, c: _gau_blockwise_ref(cfg, a, b_, c, mask),
                     q, k, v)
    # the 0/1 key mask is data, not a parameter: symbolic-zero cotangent
    return (*vjp(g), jnp.zeros_like(mask))


_gau_core.defvjp(_gau_core_fwd, _gau_core_bwd)


def gau_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray],
    scale: float,
    *,
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Blockwise gated-attention-unit scores: relu(q·kᵀ·scale)² @ v.

    q/k: [B, T, Dqk], v: [B, T, De] -> [B, T, De] f32. The [T, T] relu²
    score matrix (models/mossformer.GAUBlock's dense path — ~1 GB/layer at
    16 s of 8 kHz frames) is never materialized; masked keys contribute
    exactly 0 (multiplicative mask, matching the dense path). relu² is not
    a softmax, so blocks accumulate with no rescaling state.
    """
    b, t, dqk = q.shape
    de = v.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")

    block_q = min(block_q, _round_up(t, _LANE))
    block_k = min(block_k, _round_up(t, _LANE))
    tqp = _round_up(t, block_q)
    tkp = _round_up(t, block_k)

    def pad3(z, tp, dp):
        return jnp.pad(z, ((0, 0), (0, tp - z.shape[1]), (0, dp - z.shape[2])))

    qp = pad3(q, tqp, _round_up(dqk, _LANE))
    kp = pad3(k, tkp, _round_up(dqk, _LANE))
    vp = pad3(v, tkp, _round_up(de, _LANE))
    if kv_mask is None:
        kv_mask = jnp.ones((b, t), bool)
    mask_p = jnp.pad(kv_mask.astype(jnp.float32), ((0, 0), (0, tkp - t)))[:, None, :]

    cfg = _FlashCfg(block_q=block_q, block_k=block_k, scale=float(scale),
                    heads=1, interpret=bool(interpret))
    out = _gau_core(cfg, qp, kp, vp, mask_p)
    return out[:, :t, :de]


def flash_enabled(t: int) -> bool:
    """Resolve the auto attn-impl switch for a sequence length.

    ACT_FLASH_ATTN=1 forces flash, =0 forces dense; default: flash on the
    TPU backend once T reaches ACT_FLASH_ATTN_MIN_T (default 512) — short
    segment batches keep the proven fused dense path, long-form stops
    materializing [B, H, T, T] in HBM.
    """
    env = os.environ.get("ACT_FLASH_ATTN", "").strip()
    if env == "1":
        return True
    if env == "0":
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend probe
        return False
    if backend in ("cpu", "gpu"):
        return False
    min_t = int(os.environ.get("ACT_FLASH_ATTN_MIN_T", "512"))
    return t >= min_t
