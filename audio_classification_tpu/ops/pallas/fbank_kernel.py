"""Pallas TPU kernel: fused DFT-power + mel + log for the fbank frontend.

The XLA fbank path (ops/fbank.py) runs two MXU matmuls with the power
spectrum materialized between them; this kernel keeps the whole chain —
re/im DFT matmuls, power, mel projection, log — in VMEM per frame tile, so
the [N, 257] power spectrum never round-trips HBM:

  frames[TILE, 512] --MXU--> re, im [TILE, F] --VPU--> power
                    --MXU--> mel [TILE, 80] --VPU--> log

Basis matrices ride along as replicated blocks padded to lane multiples of
128. Grid = frame tiles; used by ops.fbank.log_mel_fbank when the pallas
path is enabled (TPU default), with the XLA path as fallback and numeric
reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _padded_bases(n_fft: int, num_bins: int, sample_rate: int, low_freq: float, high_freq: float):
    """cos/sin [n_fft, Fp] and mel [Fp, Bp] padded to lane multiples."""
    from ..stft import _dft_basis_np
    from ..fbank import mel_filterbank_np

    f = n_fft // 2 + 1
    fp = _round_up(f, _LANE)
    bp = _round_up(num_bins, _LANE)
    cos_b, msin_b = _dft_basis_np(n_fft)
    cos_p = np.zeros((n_fft, fp), np.float32)
    sin_p = np.zeros((n_fft, fp), np.float32)
    cos_p[:, :f] = cos_b
    sin_p[:, :f] = msin_b
    mel = mel_filterbank_np(num_bins, n_fft, sample_rate, low_freq, high_freq)
    mel_p = np.zeros((fp, bp), np.float32)
    mel_p[:f, :num_bins] = mel
    return cos_p, sin_p, mel_p


def _kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, *, log_floor: float):
    f = frames_ref[:]
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im
    mel_e = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[:] = jnp.log(jnp.maximum(mel_e, log_floor))


# Mosaic's default scoped-VMEM budget is 16 MiB; leave headroom for
# compiler stack temporaries beyond the block/temp estimate below.
_VMEM_BUDGET_BYTES = 14 * 2**20
_MIN_TILE = 128


def _vmem_bytes(tile: int, n_fft: int, fp: int, bp: int) -> int:
    """f32 VMEM estimate for one grid step.

    Mosaic DOUBLE-BUFFERS every operand/out block across grid steps (the
    64 ms config measured 19.5 MiB demanded at tile=512 where the
    single-buffer sum is 11.9), so blocks count twice; the re/im/power
    temporaries of the fused chain count once."""
    operands = tile * n_fft + 2 * n_fft * fp + fp * bp + tile * bp
    temps = 3 * tile * fp
    return 4 * (2 * operands + temps)


def choose_tile(n_fft: int, num_bins: int, tile: int = 512):
    """Largest admissible frame tile (<= ``tile``) for the fused kernel, or
    None when even _MIN_TILE busts the scoped-VMEM budget (caller falls back
    to the XLA two-matmul path). Wide frontends (64 ms -> n_fft 1024) carry
    4x the basis bytes of the default 25 ms config."""
    fp = _round_up(n_fft // 2 + 1, _LANE)
    bp = _round_up(num_bins, _LANE)
    while tile >= _MIN_TILE:
        if _vmem_bytes(tile, n_fft, fp, bp) <= _VMEM_BUDGET_BYTES:
            return tile
        tile //= 2
    return None


def fbank_power_mel_pallas(
    frames: jnp.ndarray,
    n_fft: int,
    num_bins: int,
    sample_rate: int,
    low_freq: float,
    high_freq: float,
    log_floor: float,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[..., N, n_fft] windowed frames -> [..., N, num_bins] log-mel.

    Frame count is padded to the tile size; callers mask invalid frames.
    The tile shrinks automatically when the config's basis matrices would
    overflow scoped VMEM (choose_tile); inadmissible configs raise — the
    log_mel_fbank dispatcher checks admissibility first and uses XLA.
    """
    fitted = choose_tile(n_fft, num_bins, tile)
    if fitted is None:
        raise ValueError(
            f"fbank config (n_fft={n_fft}, num_bins={num_bins}) exceeds the "
            f"fused kernel's VMEM budget even at tile={_MIN_TILE}")
    tile = fitted
    cos_p, sin_p, mel_p = _padded_bases(n_fft, num_bins, sample_rate, low_freq, high_freq)
    fp, bp = cos_p.shape[1], mel_p.shape[1]

    lead = frames.shape[:-2]
    n = frames.shape[-2]
    flat = frames.reshape((-1, n_fft)) if lead else frames
    total = flat.shape[0]
    total_pad = _round_up(max(total, tile), tile)
    if total_pad != total:
        flat = jnp.pad(flat, ((0, total_pad - total), (0, 0)))

    grid = (total_pad // tile,)
    out = pl.pallas_call(
        functools.partial(_kernel, log_floor=log_floor),
        out_shape=jax.ShapeDtypeStruct((total_pad, bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, n_fft), lambda i: (i, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((n_fft, fp), lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((n_fft, fp), lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((fp, bp), lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, bp), lambda i: (i, 0), memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(flat.astype(jnp.float32), jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(mel_p))

    out = out[:total, :num_bins]
    return out.reshape(lead + (n, num_bins)) if lead else out
