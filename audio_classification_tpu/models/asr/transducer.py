"""Transducer (RNN-T) ASR: encoder + stateless predictor + joiner.

The reference exposes a transducer recognizer family built from
encoder/decoder/joiner ONNX graphs (reference: src/model.py:88-99,
`OfflineRecognizer.from_transducer`). Here:

- encoder: conv subsample x4 over fbank, then transformer blocks (shared
  building blocks with the other families) -> [B, T', D];
- predictor: stateless (icefall-style) — embeddings of the last
  ``context`` tokens, concatenated and projected; no recurrence, so the
  greedy loop carries only token ids;
- joiner: tanh(enc_proj + pred_proj) -> vocab logits;
- greedy search runs on device as one lax.scan over encoder frames with at
  most one emitted symbol per frame (sherpa/icefall greedy default),
  whole batch at once.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..common import Conv1d, TransformerBlock, lengths_to_mask, sinusoidal_positions
from ...ops.fbank import FbankConfig, log_mel_fbank


@dataclass(frozen=True)
class TransducerConfig:
    vocab_size: int = 512
    dim: int = 256
    heads: int = 4
    layers: int = 6
    ffn_mult: int = 4
    conv_kernel: int = 9
    context: int = 2          # predictor token context
    pred_dim: int = 256
    joiner_dim: int = 256
    num_mel: int = 80
    blank_id: int = 0
    quant: str = "none"       # "int8": encoder projections on the s8 MXU
    fbank: FbankConfig = field(default_factory=FbankConfig)


class TransducerEncoder(nn.Module):
    cfg: TransducerConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None,
                 mesh=None, sp_axis: str = "data") -> tuple[jnp.ndarray, jnp.ndarray]:
        """``mesh`` enables sequence parallelism (ring attention over
        ``sp_axis``, mask-aware) — same switch as the SenseVoice/Whisper
        encoders."""
        c = self.cfg
        if frame_mask is not None:
            # padded fbank frames hold the log-mel floor (nonzero); zero
            # them so sub1's boundary windows match a solo run's SAME pad
            feats = feats * frame_mask[..., None].astype(feats.dtype)
        # kernel-centered explicit padding (torch Conv1d pad=k//2, the
        # convention real sherpa/torch ONNX exports carry) instead of XLA
        # "SAME": SAME's pad split depends on input-length parity under
        # stride 2, which would break cross-bucket padded-vs-solo exactness
        x = jax.nn.gelu(Conv1d(c.dim, 5, stride=2, padding=((2, 2),),
                               name="sub1")(feats))
        if frame_mask is not None:
            # boundary-frame leak guard (CLAUDE.md padded-vs-solo rule):
            # gelu(bias) at padded sub1 positions is nonzero and sub2's
            # stride-2 window at the last valid frame would read it; a
            # solo run sees zero-padding there instead.
            l1 = (jnp.sum(frame_mask.astype(jnp.int32), axis=-1) + 1) // 2
            m1 = jnp.arange(x.shape[1])[None, :] < jnp.maximum(l1, 1)[:, None]
            x = x * m1[..., None].astype(x.dtype)
        x = jax.nn.gelu(Conv1d(c.dim, 5, stride=2, padding=((2, 2),),
                               name="sub2")(x))
        t = x.shape[1]
        if frame_mask is not None:
            lengths = jnp.sum(frame_mask.astype(jnp.int32), axis=-1)
            out_len = jnp.maximum((lengths + 3) // 4, 1)
            mask = jnp.arange(t)[None, :] < out_len[:, None]
        else:
            mask = jnp.ones((x.shape[0], t), bool)
        x = x + jnp.asarray(sinusoidal_positions(t, c.dim))[None]
        blk_mask = mask
        if mesh is not None:
            # warning-clean SP entry/exit (parallel/sp_encoder.sp_seq_shard)
            from ...parallel.sp_encoder import sp_seq_shard, sp_seq_unshard

            x, blk_mask, orig_t = sp_seq_shard(x, mask, mesh, sp_axis)
        for i in range(c.layers):
            x = TransformerBlock(c.dim, c.heads, c.ffn_mult, c.conv_kernel,
                                 quant=c.quant,
                                 name=f"block_{i}")(x, blk_mask, mesh, sp_axis)
        if mesh is not None:
            x = sp_seq_unshard(x, mesh, orig_t)
        return nn.LayerNorm(name="out_ln")(x), mask


class TransducerPredictor(nn.Module):
    """Stateless predictor over the last ``context`` non-blank tokens."""

    cfg: TransducerConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens [..., context] -> [..., pred_dim]."""
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.pred_dim, name="embed")(tokens)
        flat = emb.reshape(emb.shape[:-2] + (c.context * c.pred_dim,))
        return jax.nn.relu(nn.Dense(c.pred_dim, name="proj")(flat))


class TransducerJoiner(nn.Module):
    cfg: TransducerConfig

    @nn.compact
    def __call__(self, enc: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = jnp.tanh(nn.Dense(c.joiner_dim, name="enc_proj")(enc)
                     + nn.Dense(c.joiner_dim, name="pred_proj")(pred))
        return nn.Dense(c.vocab_size, name="out")(h)


class Transducer(nn.Module):
    """Bundled encoder/predictor/joiner with on-device greedy search."""

    cfg: TransducerConfig = TransducerConfig()

    def setup(self):
        self.encoder = TransducerEncoder(self.cfg)
        self.predictor = TransducerPredictor(self.cfg)
        self.joiner = TransducerJoiner(self.cfg)

    def __call__(self, feats, frame_mask, tokens):
        """Training-style forward: joint logits [B, T', U, V]."""
        enc, mask = self.encoder(feats, frame_mask)
        pred = self.predictor(tokens)  # [B, U, pred_dim] from token windows
        logits = self.joiner(enc[:, :, None, :], pred[:, None, :, :])
        return logits, mask

    def greedy_decode(self, feats, frame_mask):
        """[B, T, mel] -> (ids [B, T'], lengths [B]) via scan over frames."""
        c = self.cfg
        enc, mask = self.encoder(feats, frame_mask)
        b, t, _ = enc.shape

        # materialize predictor/joiner params OUTSIDE the scan: flax creates
        # params at first call, and creating them inside lax.scan during init
        # leaks tracers out of the scan scope
        ctx_warm = jnp.full((b, c.context), c.blank_id, jnp.int32)
        _ = self.joiner(enc[:, 0], self.predictor(ctx_warm))

        def step(carry, inputs):
            ctx, count, out_t = carry  # ctx [B, context] int32
            e_t, m_t = inputs          # [B, D], [B]
            pred = self.predictor(ctx)
            logits = self.joiner(e_t, pred)  # [B, V]
            sym = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = (sym != c.blank_id) & m_t
            new_ctx = jnp.where(
                emit[:, None],
                jnp.concatenate([ctx[:, 1:], sym[:, None]], axis=1),
                ctx,
            )
            out_sym = jnp.where(emit, sym, c.blank_id)
            new_count = count + emit.astype(jnp.int32)
            return (new_ctx, new_count, out_t + 1), out_sym

        ctx0 = jnp.full((b, c.context), c.blank_id, jnp.int32)
        (_, counts, _), syms = jax.lax.scan(
            step,
            (ctx0, jnp.zeros((b,), jnp.int32), 0),
            (enc.transpose(1, 0, 2), mask.T),
        )
        from .beam import left_pack_symbols
        packed, _ = left_pack_symbols(syms.T, c.blank_id)
        return packed, counts


    def beam_decode(self, feats, frame_mask, beam: int = 4,
                    return_score: bool = False):
        """Modified beam search on device: ``beam`` hypotheses per utterance,
        at most one emitted symbol per encoder frame.

        The reference's recognizers accept ``decoding_method=
        "modified_beam_search"`` and route it to sherpa-onnx's beam decoder
        with ``num_active_paths`` hypotheses (reference: src/model.py:47-99
        passes the flag through to OfflineRecognizer). The search itself —
        static beam axis, one batched top-k over beam*vocab per frame,
        reverse-scan backtrack — lives in models/asr/beam
        .modified_beam_search, shared with the imported-graph decoder; this
        method only supplies the flax predictor/joiner scoring callback.
        ``beam=1`` reduces exactly to ``greedy_decode``'s argmax recursion.

        Returns ``(ids [B, T'], counts [B])`` like greedy_decode (ids
        left-packed, blank-padded); with ``return_score`` also the best
        hypothesis's accumulated log-probability [B].
        """
        from .beam import modified_beam_search

        c = self.cfg
        enc, mask = self.encoder(feats, frame_mask)
        b = enc.shape[0]

        # materialize predictor/joiner params outside the scan (flax: param
        # creation inside lax.scan during init leaks tracers)
        ctx_warm = jnp.full((b, c.context), c.blank_id, jnp.int32)
        _ = self.joiner(enc[:, 0], self.predictor(ctx_warm))

        def score(e_t, ctx):  # [B, D], [B, K, context] -> [B, K, V]
            return self.joiner(e_t[:, None, :], self.predictor(ctx))

        return modified_beam_search(
            enc, mask, score, blank_id=c.blank_id, context=c.context,
            beam=beam, return_score=return_score)


def transducer_frontend(wav: jnp.ndarray, wav_lengths: jnp.ndarray, cfg: TransducerConfig):
    feats = log_mel_fbank(wav, cfg.fbank)
    n = feats.shape[1]
    f_len = jnp.maximum((wav_lengths - cfg.fbank.frame_length) // cfg.fbank.frame_shift + 1, 1)
    return feats, lengths_to_mask(f_len, n)
