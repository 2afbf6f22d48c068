"""Sequence-parallel ring attention (shard_map + ppermute over ICI).

The reference handles long audio purely by time-domain segmentation
(SURVEY.md §5.7); this module adds the capability the reference lacks:
when a single segment's attention no longer fits one chip (SenseVoice-style
encoders are O(T^2)), the sequence axis shards across the mesh and K/V
blocks rotate around the ring while each device accumulates its queries'
attention with a numerically stable streaming softmax — compute overlaps
the ICI transfers that XLA schedules for the ppermute.

API: ``ring_attention(q, k, v, mesh, axis)`` with q/k/v [B, T, H, D] and T
divisible by the axis size. Semantics match full softmax attention.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _local_attn_block(q, k, v, scale, kv_mask=None):
    """q [B,Ts,H,D] x k,v [B,Tb,H,D] -> (scores-max, exp-sums, weighted v).

    kv_mask [B,Tb] (True = valid key) masks padded positions of this block.

    On TPU at long per-shard lengths the block routes through the Pallas
    streaming kernel (ops/pallas/attention_kernel.flash_attention_stats):
    identical (m, l, unnormalized o) contract, but the [B,H,Ts,Tb] block
    logits stay in VMEM instead of materializing per ring step.
    """
    from ..ops.pallas.attention_kernel import flash_attention_stats, flash_enabled

    if flash_enabled(q.shape[1]):
        o, m, l = flash_attention_stats(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), kv_mask, scale=scale)
        return m, l, o.transpose(0, 2, 1, 3)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, -1e30)
    m = jnp.max(logits, axis=-1)  # [B,H,Ts]
    p = jnp.exp(logits - m[..., None])
    if kv_mask is not None:
        p = p * kv_mask[:, None, None, :].astype(p.dtype)
    l = jnp.sum(p, axis=-1)  # [B,H,Ts]
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)
    return m, l, o


def _ring_body(q, k, v, kv_mask, axis_name: str):
    scale = 1.0 / np.sqrt(q.shape[-1])
    n_dev = jax.lax.psum(1, axis_name)

    m0, l0, o0 = _local_attn_block(q, k, v, scale, kv_mask)

    def step(i, carry):
        m, l, o, k_cur, v_cur, mask_cur = carry
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        k_new = jax.lax.ppermute(k_cur, axis_name, perm)
        v_new = jax.lax.ppermute(v_cur, axis_name, perm)
        mask_new = (jax.lax.ppermute(mask_cur, axis_name, perm)
                    if mask_cur is not None else None)
        m_b, l_b, o_b = _local_attn_block(q, k_new, v_new, scale, mask_new)
        m_new = jnp.maximum(m, m_b)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(m_b - m_new)
        l_new = l * c_old + l_b * c_new
        o_new = o * c_old.transpose(0, 2, 1)[..., None] + o_b * c_new.transpose(0, 2, 1)[..., None]
        return m_new, l_new, o_new, k_new, v_new, mask_new

    m, l, o, _, _, _ = jax.lax.fori_loop(
        1, n_dev, lambda i, c: step(i, c), (m0, l0, o0, k, v, kv_mask))
    return o / jnp.maximum(l.transpose(0, 2, 1)[..., None], 1e-30)


def ring_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh, axis: str = "data",
    kv_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Full-softmax attention with the sequence axis sharded over ``axis``.

    q, k, v: [B, T, H, D]; T must divide by mesh.shape[axis]. Optional
    kv_mask [B, T] (True = valid key) masks padded positions — the mask
    blocks rotate around the ring alongside K/V. Returns [B, T, H, D] with
    the same sharding.
    """
    from ..ops.pallas.attention_kernel import flash_enabled

    # vma/replication checking must stay ON for the dense path (it catches
    # out_specs/psum mismatches at trace time) but OFF when the shard body
    # routes through the Pallas kernel: pallas_call emits plain
    # ShapeDtypeStructs, which the vma checker rejects inside shard_map.
    check = not flash_enabled(q.shape[1] // mesh.shape[axis])
    spec = P(None, axis, None, None)
    mask_spec = P(None, axis)
    if kv_mask is not None:
        fn = _shard_map(
            partial(_ring_body, axis_name=axis),
            mesh, (spec, spec, spec, mask_spec), spec, check,
        )
        return fn(q, k, v, kv_mask)
    fn = _shard_map(
        lambda q_, k_, v_: _ring_body(q_, k_, v_, None, axis_name=axis),
        mesh, (spec, spec, spec), spec, check,
    )
    return fn(q, k, v)


def _shard_map(f, mesh, in_specs, out_specs, check: bool):
    try:
        from jax import shard_map  # jax >= 0.8
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=check)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as sm
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=check)


def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        kv_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Single-device oracle for tests."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)
