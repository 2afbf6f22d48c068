"""Pallas TPU kernel: fused Conv-TasNet masker (the separation hot loop).

The dense TCN path (models/convtasnet.TCNBlock) lowers each of the 24
dilated blocks to ~6 HBM round trips of the [B, F, hidden] intermediate:
in_conv out, two gLN stat/apply passes, the depthwise conv, and the
res/skip projections. At hidden=512 that is ~10 KB of HBM traffic per
frame per block against ~400 KFLOPs — deeply HBM-bound (the captured
roofline puts the overlap path at AI ~30 flop/B vs the v5e ridge of 241).

This kernel runs the ENTIRE masker — all n_repeats * n_blocks TCN blocks —
with the bottleneck-width residual stream resident in VMEM:

  grid (batch, block); the block axis is innermost and TPU grids run
  sequentially, so the per-sample scratch carries across blocks:
    x_in   [Fp + 2M, C]  residual stream (M = max dilation margin, zeros)
    skips  [Fp, C]       running skip sum
  per block (three tiled passes over F, hidden stays in VMEM):
    pass A: h1 = prelu1(x @ W_in + b)            -> masked gLN-1 stats
    pass B: recompute h1 (+M halo), apply gLN-1, mask, 3-tap dilated
            depthwise conv, prelu2               -> masked gLN-2 stats
    pass C: recompute, apply gLN-2, res/skip matmuls; x += res (deferred
            M-row carry so later tiles' halo recomputes still read the
            block's ORIGINAL input), skips += skip

HBM traffic per block collapses to the stacked weights (~0.4 MB) — the
[F, hidden] intermediates never leave the chip. The price is recomputing
the pointwise in_conv in each pass (the masker becomes MXU-bound, which
is the point).

Probed-and-rejected: caching h1 in a VMEM scratch so passes B/C skip the
in_conv recompute is SLOWER on hardware (v5e, f=10000/b=8 bf16,
tile=2048: 31.3 ms cached vs 28.4 ms uncached; at tile=512: 38.7 vs
35.2) — the [Fp, H] scratch store + two halo reloads cost more VMEM
bandwidth than the MXU recompute costs time. The kernel is
VMEM-bandwidth-bound, not MXU-bound; recompute wins. Don't re-add it.

Numerics mirror the dense modules op-for-op (models/common.py): matmuls
accumulate f32 and round to the activation dtype exactly where lax.conv
does, gLN statistics are f32 with the mask bounding both mean and count,
biases/PReLU apply in the activation dtype. gLN variance uses
E[x^2] - mean^2 (one fused pass) where the dense path subtracts the mean
first — equal to ~1e-6 relative in f32 (tests bound end-to-end error).

Backward: custom_vjp re-runs a pure-XLA replica (`tcn_masker_reference`,
which IS the dense math on the stacked weights) under jax.vjp, so
training through the fused forward gets exact dense gradients.

Role in the reference stack: this is the compute core of the 3-source
separator the reference calls through asteroid/libtorch
(/root/reference/src/osd/separation.py:66-89); there it is a CUDA library
concern — here the masker is a single fused TPU program.
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
_EPS = 1e-8  # GlobalLayerNorm.eps (models/common.py:27)

# Mosaic's default scoped-VMEM limit is 16 MB; the hardware has far more
# (v5e: 128 MB/core), so the kernel raises its own limit via
# CompilerParams(vmem_limit_bytes=_VMEM_LIMIT). _VMEM_BUDGET is the
# planner's admission bound — _vmem_estimate conservatively counts the
# persistent scratch, double-buffered in/out fp-blocks and streamed
# weights (measured: the compiler's scoped allocation for the flagship
# f=10000/tile=512 shape is 16.51 MB; the estimate gives 22.6 MB), so an
# 8 MB gap to the limit absorbs estimate error + compiler internals.
_VMEM_LIMIT = 64 * 2**20
_VMEM_BUDGET = 56 * 2**20


class _TcnCfg(NamedTuple):
    n_total: int      # n_repeats * n_blocks
    n_per_repeat: int  # dilation cycle length (dilations 1..2^(n-1))
    c: int            # bottleneck channels
    h: int            # hidden channels
    tile: int
    margin: int       # max dilation (static halo size)
    fp: int           # padded frame count (tile multiple)
    interpret: bool
    wq: bool = False  # s8 weight stream: int8 weights + per-out-channel
                      # scales (vecs rows 8/9, cvecs rows 2/3), dequantized
                      # to the activation dtype at block entry


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stack_tcn_params(blocks: list, dtype, weight_quant: bool = False) -> dict:
    """Stack per-block TCNBlock param trees for the kernel.

    ``blocks``: the flax param subtree of each block in repeat-major order
    (tcn_{r}_{x}: in_conv/prelu1/norm1/dw_conv/prelu2/norm2/res_conv/
    skip_conv — models/convtasnet.py TCNBlock). Weight matrices are cast
    to the activation dtype (exactly what the dense Conv1d does); the
    norm/bias/PReLU vector bundle stays f32 and is cast at the same op
    the dense modules cast.

    ``weight_quant``: s8 WEIGHT STREAM — weight matrices are quantized
    symmetric per OUT channel to int8 (ops/quant convention) and their
    f32 scales ride in the vector bundles (vecs rows 8/9 over H, cvecs
    rows 2/3 over C); the kernel dequantizes to the activation dtype at
    block entry. Weight-only quantization: activations keep the float
    path's precision, so accuracy sits between full-float and the dense
    s8 dynamic-activation path. Inference-only (the custom_vjp backward
    rejects int8 stacks). Runs under jit — quantize+stack fuse into the
    surrounding program like the dense path's quantize_weight.
    """
    h = blocks[0]["in_conv"]["kernel"].shape[-1]

    def row(x):  # -> [H] f32
        return jnp.broadcast_to(jnp.asarray(x, jnp.float32).reshape(-1), (h,))

    w_in = jnp.stack([b["in_conv"]["kernel"][0] for b in blocks])
    w_dw = jnp.stack([b["dw_conv"]["kernel"][:, 0, :] for b in blocks])
    w_res = jnp.stack([b["res_conv"]["kernel"][0] for b in blocks])
    w_skip = jnp.stack([b["skip_conv"]["kernel"][0] for b in blocks])
    scales = {}
    if weight_quant:
        from ..quant import quantize_weight

        def q(w):  # [NB, X, OUT] -> int8 values + [NB, OUT] scales
            # quantize per BLOCK (quantize_weight reduces over every
            # non-channel axis, and one block's outliers must not flatten
            # another block's grid)
            qs, ss = [], []
            for i in range(w.shape[0]):
                qi, si = quantize_weight(w[i].astype(jnp.float32), channel_axis=-1)
                qs.append(qi)
                ss.append(si.reshape(-1))
            return jnp.stack(qs), jnp.stack(ss)

        w_in, scales["in"] = q(w_in)
        w_dw, scales["dw"] = q(w_dw)
        w_res, scales["res"] = q(w_res)
        w_skip, scales["skip"] = q(w_skip)
    else:
        w_in, w_dw = w_in.astype(dtype), w_dw.astype(dtype)
        w_res, w_skip = w_res.astype(dtype), w_skip.astype(dtype)
    vec_rows = [
        lambda b: row(b["in_conv"]["bias"]),
        lambda b: row(b["prelu1"]["alpha"]),
        lambda b: row(b["norm1"]["gamma"]),
        lambda b: row(b["norm1"]["beta"]),
        lambda b: row(b["dw_conv"]["bias"]),
        lambda b: row(b["prelu2"]["alpha"]),
        lambda b: row(b["norm2"]["gamma"]),
        lambda b: row(b["norm2"]["beta"]),
    ]
    vecs = jnp.stack([jnp.stack([f(b) for f in vec_rows]) for b in blocks])
    c = blocks[0]["res_conv"]["kernel"].shape[-1]
    cvecs = jnp.stack([
        jnp.stack([
            jnp.broadcast_to(jnp.asarray(b["res_conv"]["bias"], jnp.float32), (c,)),
            jnp.broadcast_to(jnp.asarray(b["skip_conv"]["bias"], jnp.float32), (c,)),
        ]) for b in blocks
    ])  # [NB, 2, C] f32
    if weight_quant:
        vecs = jnp.concatenate(
            [vecs, scales["in"][:, None, :], scales["dw"][:, None, :]], axis=1)
        cvecs = jnp.concatenate(
            [cvecs, scales["res"][:, None, :], scales["skip"][:, None, :]], axis=1)
    return {"w_in": w_in, "w_dw": w_dw, "w_res": w_res, "w_skip": w_skip,
            "vecs": vecs, "cvecs": cvecs}


def _kernel(f_len_ref, x_ref, w_in_ref, w_dw_ref, vecs_ref, w_res_ref,
            w_skip_ref, cvecs_ref, out_ref, x_in, skips, h1n, carry, tap,
            *, cfg: _TcnCfg):
    b = pl.program_id(0)
    k = pl.program_id(1)
    t, m, fp, hh, cc = cfg.tile, cfg.margin, cfg.fp, cfg.h, cfg.c
    n_tiles = fp // t
    dt = x_in.dtype
    f_len = f_len_ref[b]
    # dilation of block k: 2^(k % R). Mosaic cannot index the sublane axis
    # at a DYNAMIC non-8-aligned offset ("cannot statically prove index is a
    # multiple of 8"), so the tap loads below branch over the R static
    # dilation values with pl.when instead of slicing at m +/- d directly.
    d = jax.lax.shift_left(jnp.int32(1), jax.lax.rem(k, jnp.int32(cfg.n_per_repeat)))
    dilations = [2 ** j for j in range(cfg.n_per_repeat)]

    @pl.when(k == 0)
    def _():
        x_in[:] = jnp.zeros_like(x_in)
        x_in[pl.ds(m, fp)] = x_ref[0]
        skips[:] = jnp.zeros_like(skips)

    w_in = w_in_ref[0]                       # [C, H] dt (or int8 under wq)
    w_dw = w_dw_ref[0]                       # [3, H] dt
    w_res = w_res_ref[0]                     # [H, C] dt
    w_skip = w_skip_ref[0]                   # [H, C] dt
    vecs = vecs_ref[0]                       # [8 (10 under wq), H] f32
    if cfg.wq:
        # s8 weight stream: dequantize to the activation dtype at block
        # entry (per-out-channel symmetric scales from stack_tcn_params).
        # Once per (batch, block) grid step — the per-tile passes below
        # read the dequantized copies from registers/VMEM as before.
        cv = cvecs_ref[0]
        w_in = (w_in.astype(jnp.float32) * vecs[8][None, :]).astype(dt)
        w_dw = (w_dw.astype(jnp.float32) * vecs[9][None, :]).astype(dt)
        w_res = (w_res.astype(jnp.float32) * cv[2][None, :]).astype(dt)
        w_skip = (w_skip.astype(jnp.float32) * cv[3][None, :]).astype(dt)
    b_in = vecs[0].astype(dt)
    a1 = vecs[1].astype(dt)
    gamma1, beta1 = vecs[2], vecs[3]
    b_dw = vecs[4].astype(dt)
    a2 = vecs[5].astype(dt)
    gamma2, beta2 = vecs[6], vecs[7]
    cvecs = cvecs_ref[0]                     # [2, C] f32
    b_res = cvecs[0].astype(dt)
    b_skip = cvecs[1].astype(dt)
    count = (f_len * hh).astype(jnp.float32)

    def rmask_f32(rows: int, g0):
        idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + g0
        return ((idx >= 0) & (idx < f_len)).astype(jnp.float32)

    def h1_tile(i, rows: int, x_start):
        """prelu1(x @ W_in + b_in) over ``rows`` frames, dt (dense order:
        f32-accumulated matmul rounded to dt, bias + PReLU in dt)."""
        xs = x_in[pl.ds(x_start, rows)]
        h1 = jax.lax.dot_general(xs, w_in, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).astype(dt)
        h1 = h1 + b_in
        # compare in f32: Mosaic has no vector cmpf for bf16 on this target
        return jnp.where(h1.astype(jnp.float32) >= 0, h1, a1 * h1)

    # --- pass A: gLN-1 statistics of prelu1(in_conv(x)) over valid frames
    def pass_a(i, sums):
        s1, s2 = sums
        h1 = h1_tile(i, t, i * t + m)
        hm = h1.astype(jnp.float32) * rmask_f32(t, i * t)
        return s1 + jnp.sum(hm), s2 + jnp.sum(hm * hm)

    s1, s2 = jax.lax.fori_loop(0, n_tiles, pass_a, (jnp.float32(0), jnp.float32(0)))
    mean1 = s1 / count
    rstd1 = jax.lax.rsqrt(jnp.maximum(s2 / count - mean1 * mean1, 0.0) + _EPS)

    def h2_tile(i):
        """Recompute h1 (+M halo), apply gLN-1 + mask, 3-tap dilated
        depthwise conv (f32 taps, dt round, dt bias — dense conv order),
        prelu2. -> [tile, H] dt for the tile's central rows."""
        h1 = h1_tile(i, t + 2 * m, i * t)
        hf = h1.astype(jnp.float32)
        h1norm = ((hf - mean1) * rstd1 * gamma1 + beta1).astype(dt)
        h1n[:] = h1norm * rmask_f32(t + 2 * m, i * t - m).astype(dt)
        # off-center taps at STATIC offsets m +/- dd, one pl.when branch per
        # dilation (exactly one fires for block k); the center tap is common
        for dd in dilations:
            @pl.when(d == dd)
            def _(dd=dd):
                left = h1n[pl.ds(m - dd, t)].astype(jnp.float32)
                right = h1n[pl.ds(m + dd, t)].astype(jnp.float32)
                tap[:] = (left * w_dw[0].astype(jnp.float32)
                          + right * w_dw[2].astype(jnp.float32))
        mid = h1n[pl.ds(m, t)].astype(jnp.float32)
        acc = tap[:] + mid * w_dw[1].astype(jnp.float32)
        h2 = acc.astype(dt) + b_dw
        return jnp.where(h2.astype(jnp.float32) >= 0, h2, a2 * h2)

    # --- pass B: gLN-2 statistics of the depthwise stage
    def pass_b(i, sums):
        s1b, s2b = sums
        hm = h2_tile(i).astype(jnp.float32) * rmask_f32(t, i * t)
        return s1b + jnp.sum(hm), s2b + jnp.sum(hm * hm)

    s1b, s2b = jax.lax.fori_loop(0, n_tiles, pass_b, (jnp.float32(0), jnp.float32(0)))
    mean2 = s1b / count
    rstd2 = jax.lax.rsqrt(jnp.maximum(s2b / count - mean2 * mean2, 0.0) + _EPS)

    # --- pass C: apply gLN-2, res/skip projections, residual update.
    # x_in rows [i*t+t-m, i*t+t) are still read by tile i+1's halo
    # recompute, so their update is stashed in `carry` (M rows) and applied
    # one iteration later. carry seeds from the left margin (zeros), so the
    # i=0 application rewrites margin zeros — a no-op by construction.
    carry[:] = x_in[pl.ds(0, m)]

    def pass_c(i, _):
        h2 = h2_tile(i)
        h2n = ((h2.astype(jnp.float32) - mean2) * rstd2 * gamma2
               + beta2).astype(dt)
        res = jax.lax.dot_general(h2n, w_res, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32).astype(dt) + b_res
        skp = jax.lax.dot_general(h2n, w_skip, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32).astype(dt) + b_skip
        # all x_in reads for tile i are done: apply the deferred carry
        x_in[pl.ds(i * t, m)] = carry[:]
        upd = x_in[pl.ds(i * t + m, t)] + res
        x_in[pl.ds(i * t + m, t - m)] = upd[: t - m]
        carry[:] = upd[t - m:]
        skips[pl.ds(i * t, t)] = skips[pl.ds(i * t, t)] + skp
        return 0

    jax.lax.fori_loop(0, n_tiles, pass_c, 0)
    x_in[pl.ds(fp, m)] = carry[:]  # rows [Fp-M, Fp) in global frames

    @pl.when(k == cfg.n_total - 1)
    def _():
        out_ref[0] = skips[:]


def _masker_fwd_call(cfg: _TcnCfg, x, f_len, st):
    b = x.shape[0]
    mem = pl.ANY if cfg.interpret else pltpu.VMEM
    dt = x.dtype
    n_vec = 10 if cfg.wq else 8   # +2 scale rows under the s8 weight stream
    n_cvec = 4 if cfg.wq else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, cfg.n_total),
        in_specs=[
            pl.BlockSpec((1, cfg.fp, cfg.c), lambda b_, k, fl: (b_, 0, 0), memory_space=mem),
            pl.BlockSpec((1, cfg.c, cfg.h), lambda b_, k, fl: (k, 0, 0), memory_space=mem),
            pl.BlockSpec((1, 3, cfg.h), lambda b_, k, fl: (k, 0, 0), memory_space=mem),
            pl.BlockSpec((1, n_vec, cfg.h), lambda b_, k, fl: (k, 0, 0), memory_space=mem),
            pl.BlockSpec((1, cfg.h, cfg.c), lambda b_, k, fl: (k, 0, 0), memory_space=mem),
            pl.BlockSpec((1, cfg.h, cfg.c), lambda b_, k, fl: (k, 0, 0), memory_space=mem),
            pl.BlockSpec((1, n_cvec, cfg.c), lambda b_, k, fl: (k, 0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, cfg.fp, cfg.c), lambda b_, k, fl: (b_, 0, 0),
                               memory_space=mem),
        scratch_shapes=[
            pltpu.VMEM((cfg.fp + 2 * cfg.margin, cfg.c), dt),   # x_in
            pltpu.VMEM((cfg.fp, cfg.c), dt),                     # skips
            pltpu.VMEM((cfg.tile + 2 * cfg.margin, cfg.h), dt),  # h1n
            pltpu.VMEM((cfg.margin, cfg.c), dt),                 # carry
            pltpu.VMEM((cfg.tile, cfg.h), jnp.float32),          # tap
        ],
    )
    kwargs = {}
    if not cfg.interpret:
        # Mosaic's default scoped-VMEM limit (16 MB) rejects fp >= ~10k
        # frame shapes the planner admits; the hardware has 128 MB/core
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT)
    return pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cfg.fp, cfg.c), dt),
        interpret=cfg.interpret,
        **kwargs,
    )(f_len.astype(jnp.int32), x, st["w_in"], st["w_dw"], st["vecs"],
      st["w_res"], st["w_skip"], st["cvecs"])


def dequant_stack(st: dict, dtype) -> dict:
    """s8 weight-stream stack -> float stack (the exact grid the kernel's
    in-kernel dequant applies: per-block per-out-channel scales from the
    vector bundles, rounded to the activation dtype)."""
    vecs, cvecs = st["vecs"], st["cvecs"]
    return {
        "w_in": (st["w_in"].astype(jnp.float32) * vecs[:, 8][:, None, :]).astype(dtype),
        "w_dw": (st["w_dw"].astype(jnp.float32) * vecs[:, 9][:, None, :]).astype(dtype),
        "w_res": (st["w_res"].astype(jnp.float32) * cvecs[:, 2][:, None, :]).astype(dtype),
        "w_skip": (st["w_skip"].astype(jnp.float32) * cvecs[:, 3][:, None, :]).astype(dtype),
        "vecs": vecs[:, :8], "cvecs": cvecs[:, :2],
    }


def tcn_masker_reference(x, f_len, st, *, n_per_repeat: int):
    """Pure-XLA replica of the dense TCN loop on the stacked weights.

    Op-for-op the dense modules (models/convtasnet.TCNBlock) including the
    masked-gLN variance formula; the custom_vjp backward differentiates
    THIS, so fused-forward training gets exact dense gradients. An s8
    weight-stream stack is dequantized up front (weight-only quant — the
    rest of the math is the float path).
    """
    if st["w_in"].dtype == jnp.int8:
        st = dequant_stack(st, x.dtype)
    nb = st["w_in"].shape[0]
    f = x.shape[1]
    dt = x.dtype
    mask = (jnp.arange(f)[None, :] < f_len[:, None])  # [B, F] bool
    mf = mask[..., None].astype(jnp.float32)
    count = jnp.maximum(jnp.sum(mf, axis=(1, 2), keepdims=True) * st["w_in"].shape[-1], 1.0)

    def gln(z, gamma, beta):
        zf = z.astype(jnp.float32)
        mean = jnp.sum(zf * mf, axis=(1, 2), keepdims=True) / count
        var = jnp.sum(((zf - mean) * mf) ** 2, axis=(1, 2), keepdims=True) / count
        y = (zf - mean) * jax.lax.rsqrt(var + _EPS)
        return (y * gamma + beta).astype(dt)

    def prelu(z, a):
        return jnp.where(z >= 0, z, a.astype(dt) * z)

    h, skips = x, jnp.zeros_like(x)
    for i in range(nb):
        dil = 2 ** (i % n_per_repeat)
        v = st["vecs"][i]
        h1 = jnp.einsum("bfc,ch->bfh", h, st["w_in"][i],
                        preferred_element_type=jnp.float32).astype(dt)
        h1 = prelu(h1 + v[0].astype(dt), v[1])
        h1 = gln(h1, v[2], v[3]) * mask[..., None]
        h2 = jax.lax.conv_general_dilated(
            h1, st["w_dw"][i][:, None, :], (1,), "SAME", rhs_dilation=(dil,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=st["w_dw"].shape[-1],
            preferred_element_type=jnp.float32).astype(dt)
        h2 = prelu(h2 + v[4].astype(dt), v[5])
        h2 = gln(h2, v[6], v[7])
        res = jnp.einsum("bfh,hc->bfc", h2, st["w_res"][i],
                         preferred_element_type=jnp.float32).astype(dt)
        skp = jnp.einsum("bfh,hc->bfc", h2, st["w_skip"][i],
                         preferred_element_type=jnp.float32).astype(dt)
        h = h + res + st["cvecs"][i, 0].astype(dt)
        skips = skips + skp + st["cvecs"][i, 1].astype(dt)
    return skips


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _masker_core(cfg: _TcnCfg, x, f_len, st):
    return _masker_fwd_call(cfg, x, f_len, st)


def _masker_core_fwd(cfg, x, f_len, st):
    return _masker_fwd_call(cfg, x, f_len, st), (x, f_len, st)


def _masker_core_bwd(cfg, resid, g):
    if cfg.wq:
        raise NotImplementedError(
            "the s8 weight-stream masker is inference-only: train with "
            "quant='none' (the trainer does), then serve quantized")
    x, f_len, st = resid
    _, vjp = jax.vjp(
        lambda xx, ss: tcn_masker_reference(
            xx, f_len, ss, n_per_repeat=cfg.n_per_repeat),
        x, st)
    gx, gst = vjp(g)
    return gx, jnp.zeros_like(f_len), gst


_masker_core.defvjp(_masker_core_fwd, _masker_core_bwd)


def _sublane(itemsize: int) -> int:
    """Native sublane granule: (8, 128) tiles are f32 — 16 rows for bf16,
    32 for int8. margin/tile are rounded to it so every dynamic dim-0
    offset the kernel forms (i*t, i*t+m, fp) is provably aligned."""
    return (4 // itemsize) * 8


def _plan_tile(f: int, c: int, h: int, margin: int, itemsize: int) -> Optional[int]:
    """Cheapest tile in {2048, 1024, 512, 256, 128} whose VMEM plan fits.

    Cost model: passes B/C touch ``round_up(f, tile) * (tile + 2*margin) /
    tile`` rows — larger tiles amortize the halo recompute but pad short
    inputs up to a full tile. Calibrated on a v5e at the flagship
    f=10000/b=8 bf16 shape (35.2 ms/launch at tile=512, 29.3 at 1024,
    28.8 at 2048): the row model predicts the 512->1024 step exactly and
    overpredicts tile=2048 by ~10% (longer MXU ops run more efficiently),
    hence the 0.91 discount. Honors ACT_FUSED_TCN_TILE as a hard
    override. None = nothing fits."""
    env = os.environ.get("ACT_FUSED_TCN_TILE", "").strip()
    a = _sublane(itemsize)
    # tile must exceed margin: pass C stores tile-margin rows per step, and
    # a zero-row vector store fails Mosaic lowering (observed on hardware:
    # "Invalid type" MLIRError at tile == margin == 128)
    floor = max(margin + a, a)
    if env:
        tile = _round_up(max(int(env), floor), a)
        ok = _vmem_estimate(f, c, h, tile, margin, itemsize) <= _VMEM_BUDGET
        return tile if ok else None
    best, best_cost = None, None
    for tile in (2048, 1024, 512, 256, 128):
        if tile < floor:
            continue
        if _vmem_estimate(f, c, h, tile, margin, itemsize) > _VMEM_BUDGET:
            continue
        fp = _round_up(max(f, tile), tile)
        cost = fp * (tile + 2 * margin) / tile * (0.91 if tile >= 2048 else 1.0)
        if best_cost is None or cost < best_cost:
            best, best_cost = tile, cost
    return best


def fused_tcn_masker(x, f_len, st, *, n_per_repeat: int,
                     tile: Optional[int] = None,
                     interpret: Optional[bool] = None):
    """[B, F, C] bottleneck stream + [B] valid-frame counts + stacked
    block weights -> [B, F, C] skip-connection sum (the masker output the
    dense loop feeds to mask_prelu/mask_conv). dt in == dt out."""
    b, f, c = x.shape
    nb = st["w_in"].shape[0]
    h = st["w_in"].shape[-1]
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    itemsize = jnp.dtype(x.dtype).itemsize
    a = _sublane(itemsize)
    margin = _round_up(2 ** (n_per_repeat - 1), a)
    if tile is None:
        tile = _plan_tile(f, c, h, margin, itemsize)
        if tile is None:  # callers gate on fused_tcn_enabled; belt+braces
            return tcn_masker_reference(x, f_len, st, n_per_repeat=n_per_repeat)
    tile = _round_up(max(tile, margin + a), a)
    fp = _round_up(max(f, tile), tile)
    xp = jnp.pad(x, ((0, 0), (0, fp - f), (0, 0)))
    wq = st["w_in"].dtype == jnp.int8   # s8 weight stream (stack_tcn_params)
    cfg = _TcnCfg(n_total=nb, n_per_repeat=n_per_repeat, c=c, h=h, tile=tile,
                  margin=margin, fp=fp, interpret=bool(interpret), wq=bool(wq))
    out = _masker_core(cfg, xp, f_len, st)
    return out[:, :f, :]


def _vmem_estimate(f: int, c: int, h: int, tile: int, margin: int,
                   itemsize: int) -> int:
    fp = _round_up(max(f, tile), tile)
    scratch = (fp + 2 * margin) * c + fp * c + (tile + 2 * margin) * h + margin * c
    weights = 2 * (c * h + 3 * h + 2 * h * c) * itemsize + 2 * (8 * h + 2 * c) * 4
    transients = 3 * (tile + 2 * margin) * h * 4
    tap = tile * h * 4
    # the full-length x in-block and out-block live in VMEM too (grid
    # advances over batch, so count both revolving buffers each)
    io_blocks = 4 * fp * c * itemsize
    return scratch * itemsize + weights + transients + tap + io_blocks


def fused_tcn_enabled(n_frames: int, bottleneck: int, hidden: int,
                      conv_kernel: int, n_blocks: int, dtype) -> bool:
    """Auto-switch for the fused masker (mirrors flash_enabled).

    ACT_FUSED_TCN=1 forces it (interpret-mode on CPU — the test path),
    =0 disables. Default: TPU backend, kernel-compatible dims (lane-
    multiple channels, 3-tap depthwise), and the VMEM plan fits.
    """
    env = os.environ.get("ACT_FUSED_TCN", "").strip()
    if env == "0":
        return False
    structural = (
        conv_kernel == 3
        and bottleneck % _LANE == 0
        and hidden % _LANE == 0
        and n_frames >= 8
    )
    if not structural:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    margin = _round_up(2 ** (n_blocks - 1), _sublane(itemsize))
    fits = _plan_tile(n_frames, bottleneck, hidden, margin, itemsize) is not None
    if env == "1":
        return fits
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend probe
        return False
    return backend not in ("cpu", "gpu") and fits
