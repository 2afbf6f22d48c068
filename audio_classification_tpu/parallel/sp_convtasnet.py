"""Time-sharded Conv-TasNet separation (shard_map + halo exchange).

The reference scales long audio purely by host-side time segmentation
(SURVEY.md §5.7); ring attention (parallel/ring_attention) already lifts
that limit for the O(T²) ASR encoders. This module does the same for the
separation stage: a single arbitrarily long mixture's FRAME axis shards
across the mesh, and every op that looks past a shard edge gets exactly
the data it needs from its neighbors over ICI:

- encoder: each shard holds ``frames_per_shard * stride`` samples and
  fetches the ``enc_kernel - stride`` sample halo from its right neighbor
  (one ppermute; the last shard receives zeros = the dense pad);
- dilated depthwise convs: ``dilation``-frame halos from both neighbors
  per TCN block (ppermute zeros at the global ends reproduce XLA SAME
  padding bit-for-bit);
- gLN: global (time, channel) statistics via psum of masked partial sums;
- decoder overlap-add: each shard's trailing ``enc_kernel - stride``
  samples ride one ppermute to the right neighbor and add into its head.

Semantics match the dense masked forward EXACTLY (models/convtasnet.py
with a sample mask): ``sp_separate(params, cfg, mix, lengths, mesh)`` ==
``ConvTasNet(cfg).apply(params, pad(mix), mask)[..., :t]`` — the dense
path is the numeric oracle in tests/test_sp_convtasnet.py.

Pointwise convs (the FLOPs) stay local matmuls on each shard's MXU; the
only cross-shard traffic is the thin halos and the gLN scalars.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _pointwise(x, scope):
    """Per-frame projection: Conv1d 1x1 kernel [1, Cin, Cout] or nn.Dense
    kernel [Cin, Cout] — both are the same local matmul."""
    k = jnp.asarray(scope["kernel"])
    y = x @ (k[0] if k.ndim == 3 else k)
    if "bias" in scope:
        y = y + jnp.asarray(scope["bias"])
    return y


def _prelu(x, scope):
    a = jnp.asarray(scope["alpha"]).astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _halo_from_right(x, h: int, axis_name: str):
    """First h rows (axis 1) of the RIGHT neighbor; zeros on the last shard."""
    n = jax.lax.psum(1, axis_name)
    perm = [(j, j - 1) for j in range(1, n)]
    return jax.lax.ppermute(x[:, :h], axis_name, perm)


def _halo_from_left(x, h: int, axis_name: str):
    """Last h rows of the LEFT neighbor; zeros on the first shard."""
    n = jax.lax.psum(1, axis_name)
    perm = [(j, j + 1) for j in range(n - 1)]
    return jax.lax.ppermute(x[:, -h:], axis_name, perm)


def _gln_sp(x, mask, scope, axis_name: str, eps: float = 1e-8):
    """models/common.GlobalLayerNorm (masked branch) with psum statistics."""
    gamma = jnp.asarray(scope["gamma"]).astype(jnp.float32)
    beta = jnp.asarray(scope["beta"]).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    m = mask[..., None].astype(jnp.float32)
    count = jax.lax.psum(jnp.sum(m, axis=(1, 2), keepdims=True), axis_name)
    count = jnp.maximum(count * x.shape[-1], 1.0)
    mean = jax.lax.psum(jnp.sum(xf * m, axis=(1, 2), keepdims=True),
                        axis_name) / count
    var = jax.lax.psum(jnp.sum(((xf - mean) * m) ** 2, axis=(1, 2),
                               keepdims=True), axis_name) / count
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(x.dtype)


def _dw_conv_sp(x, scope, dilation: int, axis_name: str):
    """Depthwise SAME conv across the sharded frame axis via halos.

    XLA SAME at stride 1 pads total=(k-1)*dilation split lo=total//2 /
    hi=total-lo — the split is over the TOTAL, not per-tap, which differs
    for even kernels with dilation > 1."""
    k = jnp.asarray(scope["kernel"])                 # [K, 1, C]
    ksz = k.shape[0]
    total = (ksz - 1) * dilation
    lo = total // 2
    hi = total - lo
    parts = []
    if lo:
        parts.append(_halo_from_left(x, lo, axis_name))
    parts.append(x)
    if hi:
        parts.append(_halo_from_right(x, hi, axis_name))
    xa = jnp.concatenate(parts, axis=1)
    y = jax.lax.conv_general_dilated(
        xa, k.astype(x.dtype), window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=x.shape[-1])
    if "bias" in scope:
        y = y + jnp.asarray(scope["bias"]).astype(x.dtype)
    return y


def _body(mix_local, lengths, params, cfg, fs: int, axis_name: str):  # noqa: C901
    """One shard: [B, fs*stride] samples -> [B, n_src, fs*stride]."""
    p = params["params"] if "params" in params else params
    c = cfg
    stride, L = c.stride, c.enc_kernel
    b = mix_local.shape[0]
    i = jax.lax.axis_index(axis_name)

    # --- local sample mask, then the encoder halo (exchanged post-masking
    # so boundary frames see exactly the dense masked signal)
    s_idx = i * fs * stride + jnp.arange(fs * stride)
    smask = (s_idx[None, :] < lengths[:, None]).astype(mix_local.dtype)
    x = mix_local * smask
    halo = _halo_from_right(x, L - stride, axis_name)
    x = jnp.concatenate([x, halo], axis=1)[..., None]   # [B, fs*stride+L-s, 1]

    # --- encoder (convtasnet.py:93-101)
    enc_k = jnp.asarray(p["encoder"]["kernel"]).astype(x.dtype)
    w = jax.lax.conv_general_dilated(
        x, enc_k, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    w = jax.nn.relu(w)                                  # [B, fs, N]
    f_len = jnp.maximum((lengths - L) // stride + 1, 1)
    f_idx = i * fs + jnp.arange(fs)
    fmask = f_idx[None, :] < f_len[:, None]

    # --- masker TCN (convtasnet.py:104-121)
    h = _gln_sp(w, fmask, p["ln_in"], axis_name)
    h = _pointwise(h, p["bottleneck"])
    skips = 0.0
    for r in range(c.n_repeats):
        for xb in range(c.n_blocks):
            blk = p[f"tcn_{r}_{xb}"]
            d = 2 ** xb
            g = _pointwise(h, blk["in_conv"])
            g = _prelu(g, blk["prelu1"])
            g = _gln_sp(g, fmask, blk["norm1"], axis_name)
            g = g * fmask[..., None]
            g = _dw_conv_sp(g, blk["dw_conv"], d, axis_name)
            g = _prelu(g, blk["prelu2"])
            g = _gln_sp(g, fmask, blk["norm2"], axis_name)
            h = h + _pointwise(g, blk["res_conv"])
            skips = skips + _pointwise(g, blk["skip_conv"])
    m = _prelu(skips, p["mask_prelu"])
    m = _pointwise(m, p["mask_conv"]).reshape(b, fs, c.n_src, c.enc_dim)
    if c.mask_act == "relu":
        m = jax.nn.relu(m)
    elif c.mask_act == "sigmoid":
        m = jax.nn.sigmoid(m)
    elif c.mask_act == "softmax":
        m = jax.nn.softmax(m, axis=2)
    else:
        raise ValueError(f"unknown mask_act {c.mask_act}")

    masked = w[:, :, None, :] * m                       # [B, fs, S, N]
    masked = masked * fmask[:, :, None, None].astype(masked.dtype)

    # --- decoder overlap-add (convtasnet.py:129-144): each shard emits its
    # own fs*stride samples; the (L - stride)-sample tail overlaps the right
    # neighbor's head and rides one ppermute there
    dec = jnp.asarray(p["decoder"])
    frames = jnp.einsum("bfsn,kn->bsfk", masked, dec,
                        preferred_element_type=jnp.float32)
    from ..models.convtasnet import _overlap_add_frames

    sig = _overlap_add_frames(frames, stride)           # [B, S, fs*stride+L-s]
    main, tail = sig[..., : fs * stride], sig[..., fs * stride:]
    n = jax.lax.psum(1, axis_name)
    recv = jax.lax.ppermute(tail, axis_name,
                            [(j, j + 1) for j in range(n - 1)])
    main = main.at[..., : L - stride].add(recv)
    return main * smask[:, None, :].astype(main.dtype)


def sp_separate(params, cfg, mix: jnp.ndarray, lengths, mesh: Mesh,
                axis: str = "data") -> jnp.ndarray:
    """Separate [B, T] mixtures with the time axis sharded over ``axis``.

    Numerically identical to the dense masked forward: for every row,
    ``sp_separate(...)[..., :T]`` equals ``ConvTasNet(cfg).apply(params,
    padded_mix, sample_mask)[..., :T]``. ``lengths`` [B] gives each row's
    valid sample count (defaults to T).
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    c = cfg
    if c.quant == "int8":
        raise ValueError("sp_separate: int8 pointwise convs use per-sample "
                         "masked scales that would span shards; run the SP "
                         "path in float/bf16")
    n = mesh.shape[axis]
    stride, L = c.stride, c.enc_kernel
    b, t = mix.shape
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)

    f = max(int(-(-(t - L) // stride)) + 1, 1) if t >= L else 1
    # every real sample must land in some shard's main chunk (the trailing
    # L-stride overhang comes from halos/zeros): f*stride >= t
    f = max(f, int(-(-t // stride)))
    f = n * int(-(-f // n))                    # frames tile the mesh axis
    fs = f // n
    d_max = 2 ** (c.n_blocks - 1)
    # widest one-sided halo = hi side of the largest dilation's SAME pads
    max_halo = -(-(c.conv_kernel - 1) * d_max // 2)
    if fs < max(max_halo, 1):
        raise ValueError(
            f"sp_separate: {fs} frames/shard < the TCN's widest halo "
            f"({max_halo}); use longer audio or fewer shards "
            f"(t={t}, shards={n})")
    t_pad = f * stride
    mix_p = jnp.pad(jnp.asarray(mix, jnp.float32), ((0, 0), (0, t_pad - t)))

    fn = shard_map(
        lambda mx, ln, pr: _body(mx, ln, pr, cfg=c, fs=fs, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(), P()),   # params replicated (P() prefix)
        out_specs=P(None, None, axis),
    )
    out = fn(mix_p, lengths, params)
    return out[..., :t]


# ----------------------------------------------------- MossFormer variant

def _gau_ring_attn(q, k, v, fmask, inv_t: float, axis_name: str):
    """GAU attention with the key axis sharded: out_t = Σ_s relu(q_t·k_s *
    inv_t * m_s)² v_s. No softmax → ring accumulation is a plain partial
    sum; K/V/mask blocks rotate while each shard accumulates its queries'
    sum (models/mossformer.py:73-77 semantics, mask applied pre-relu)."""
    n = jax.lax.psum(1, axis_name)

    def block(k_b, v_b, m_b):
        logits = jnp.einsum("btd,bsd->bts", q, k_b,
                            preferred_element_type=jnp.float32) * inv_t
        logits = logits * m_b[:, None, :].astype(logits.dtype)
        return jnp.einsum("bts,bse->bte", jax.nn.relu(logits) ** 2, v_b,
                          preferred_element_type=jnp.float32)

    acc0 = block(k, v, fmask)

    def step(_, carry):
        acc, k_c, v_c, m_c = carry
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_n = jax.lax.ppermute(k_c, axis_name, perm)
        v_n = jax.lax.ppermute(v_c, axis_name, perm)
        m_n = jax.lax.ppermute(m_c, axis_name, perm)
        return acc + block(k_n, v_n, m_n), k_n, v_n, m_n

    acc, _, _, _ = jax.lax.fori_loop(1, n, step, (acc0, k, v, fmask))
    return acc


def _cln(x, scope, eps: float = 1e-8):
    """models/common.ChannelLayerNorm — per-frame, fully local."""
    gamma = jnp.asarray(scope["gamma"]).astype(jnp.float32)
    beta = jnp.asarray(scope["beta"]).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)


def _moss_body(mix_local, lengths, params, cfg, fs: int, f_dense: int,
               axis_name: str):
    """One shard of the MossFormer forward (models/mossformer.py:90-124)."""
    p = params["params"] if "params" in params else params
    c = cfg
    stride, L = c.stride, c.enc_kernel
    b = mix_local.shape[0]
    i = jax.lax.axis_index(axis_name)

    s_idx = i * fs * stride + jnp.arange(fs * stride)
    smask = (s_idx[None, :] < lengths[:, None]).astype(mix_local.dtype)
    x = mix_local * smask
    halo = _halo_from_right(x, L - stride, axis_name)
    x = jnp.concatenate([x, halo], axis=1)[..., None]

    enc_k = jnp.asarray(p["encoder"]["kernel"]).astype(x.dtype)
    w = jax.nn.relu(jax.lax.conv_general_dilated(
        x, enc_k, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC")))        # [B, fs, N]
    f_len = jnp.maximum((lengths - L) // stride + 1, 1)
    f_idx = i * fs + jnp.arange(fs)
    fmask = f_idx[None, :] < f_len[:, None]
    # frames past the dense tiling (mesh round-up) impersonate the dense
    # forward's SAME zero padding for the conv halos
    tile = (f_idx < f_dense)[None, :]

    h = _pointwise(w, p["in_proj"])                      # [B, fs, dim]
    inv_t = 1.0 / float(f_dense)                         # dense: /x.shape[1]
    for li in range(c.layers):
        blk = p[f"gau_{li}"]
        hn = _cln(h, blk["ln"])
        hc = _dw_conv_sp(hn * tile[..., None].astype(hn.dtype),
                         blk["dwconv"], 1, axis_name)
        hn = hn + jax.nn.silu(hc)
        u = jax.nn.silu(_pointwise(hn, blk["to_u"]))
        v = jax.nn.silu(_pointwise(hn, blk["to_v"]))
        z = _pointwise(hn, blk["to_qk"])
        gamma = jnp.asarray(blk["gamma"])
        beta = jnp.asarray(blk["beta"])
        q = z * gamma[0] + beta[0]
        k = z * gamma[1] + beta[1]
        attn_v = _gau_ring_attn(q, k, v, fmask, inv_t, axis_name)
        out = _pointwise(u * attn_v, blk["to_out"])
        out = out * fmask[..., None]
        h = h + out
    h = _cln(h, p["ln_out"])
    m = _pointwise(h, p["mask_head"]).reshape(b, fs, c.n_src, c.enc_dim)
    m = jax.nn.relu(m)

    # frames past the dense tiling don't exist in the dense forward (which
    # never zeroes its own invalid-but-existing frames — mossformer.py:116);
    # only the mesh round-up frames must vanish
    masked = w[:, :, None, :] * m * tile[..., None, None].astype(w.dtype)
    dec = jnp.asarray(p["decoder"])
    frames = jnp.einsum("bfsn,kn->bsfk", masked, dec,
                        preferred_element_type=jnp.float32)
    from ..models.convtasnet import _overlap_add_frames

    sig = _overlap_add_frames(frames, stride)
    main, tail = sig[..., : fs * stride], sig[..., fs * stride:]
    n = jax.lax.psum(1, axis_name)
    recv = jax.lax.ppermute(tail, axis_name,
                            [(j, j + 1) for j in range(n - 1)])
    main = main.at[..., : L - stride].add(recv)
    return main * smask[:, None, :].astype(main.dtype)


def sp_separate_mossformer(params, cfg, mix: jnp.ndarray, lengths,
                           mesh: Mesh, axis: str = "data") -> jnp.ndarray:
    """MossFormer separation with the frame axis sharded over ``axis``.

    Same contract and exactness guarantee as ``sp_separate``: equals the
    dense masked forward (models/mossformer.py) sliced to T. The GAU's
    relu² attention has no softmax, so the ring pass is a plain partial
    sum over rotating K/V blocks.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    c = cfg
    n = mesh.shape[axis]
    stride, L = c.stride, c.enc_kernel
    b, t = mix.shape
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)

    f_dense = max(int(-(-(t - L) // stride)) + 1, 1) if t >= L else 1
    f = max(f_dense, int(-(-t // stride)))     # cover every real sample
    f = n * int(-(-f // n))
    fs = f // n
    max_halo = -(-(c.conv_kernel - 1) // 2)  # hi side of the SAME pads
    if fs < max(max_halo, 1):
        raise ValueError(
            f"sp_separate_mossformer: {fs} frames/shard < the conv halo "
            f"({max_halo}); use longer audio or fewer shards")
    t_pad = f * stride
    mix_p = jnp.pad(jnp.asarray(mix, jnp.float32), ((0, 0), (0, t_pad - t)))

    fn = shard_map(
        lambda mx, ln, pr: _moss_body(mx, ln, pr, cfg=c, fs=fs,
                                      f_dense=f_dense, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(), P()),
        out_specs=P(None, None, axis),
    )
    return fn(mix_p, lengths, params)[..., :t]
