"""SenseVoice-style non-autoregressive CTC ASR encoder.

TPU-native counterpart of the reference's primary recognizer,
`sherpa_onnx.OfflineRecognizer.from_sense_voice` (reference:
src/model.py:79-87; the int8 SenseVoice zh-en-ja-ko-yue ONNX model). Shape
of the computation:

  waveform -> log-mel fbank(80) -> LFR(7,6) stack -> CMVN -> linear to d
  -> 4 prompt frames (language + itn embeddings, SenseVoice convention)
  -> transformer encoder (parallel over time; the original SAN-M's
     FSMN-memory branch appears as a depthwise-conv branch per block)
  -> CTC vocabulary logits (greedy decode in asr/ctc.py)

All stages batch over padded segments with frame masks; one XLA program per
length bucket.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..common import TransformerBlock, lengths_to_mask, sinusoidal_positions
from ...ops.fbank import FbankConfig, apply_lfr, log_mel_fbank

LANGUAGES = ("auto", "zh", "en", "yue", "ja", "ko", "nospeech")


@dataclass(frozen=True)
class SenseVoiceConfig:
    vocab_size: int = 512            # real model: 25055; tests use small vocabs
    dim: int = 512
    heads: int = 8
    layers: int = 12
    ffn_mult: int = 4
    conv_kernel: int = 11            # FSMN-equivalent memory span
    lfr_m: int = 7
    lfr_n: int = 6
    num_mel: int = 80
    num_prompt: int = 4              # language, event, emotion, itn slots
    quant: str = "none"              # "int8": encoder projections on the s8 MXU
    #: per-UTTERANCE CMVN over valid frames (masked mean/var of the LFR
    #: feats). Static-stats CMVN (cmvn_mean/istd args) removes the TRAINING
    #: corpus level; per-utterance removes each input's own level — making
    #: the frontend exactly scale-invariant. Matters when upstream stages
    #: (e.g. an SI-SDR-trained separator, whose output scale is arbitrary)
    #: feed the recognizer directly.
    utt_cmvn: bool = False
    fbank: FbankConfig = field(default_factory=FbankConfig)

    def out_frames(self, n_samples: int) -> int:
        import numpy as np

        n = self.fbank.frames_for(n_samples)
        return int(np.ceil(n / self.lfr_n)) + self.num_prompt


class SenseVoiceEncoder(nn.Module):
    """[B, T_lfr, lfr_m*mel] features (+ mask) -> [B, prompt+T_lfr, vocab]."""

    cfg: SenseVoiceConfig = SenseVoiceConfig()

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        frame_mask: Optional[jnp.ndarray] = None,
        language_id: int = 0,
        use_itn: bool = True,
        mesh=None,
        sp_axis: str = "data",
    ) -> jnp.ndarray:
        """``mesh`` enables sequence parallelism: every block's attention
        runs ring-parallel over ``sp_axis`` with the frame mask rotating the
        ring (same params as the dense path — see models/common.py)."""
        c = self.cfg
        x = nn.Dense(c.dim, name="in_proj")(feats)
        b, t = x.shape[0], x.shape[1]

        lang_emb = self.param("lang_embed", nn.initializers.normal(0.02), (len(LANGUAGES), c.dim))
        itn_emb = self.param("itn_embed", nn.initializers.normal(0.02), (2, c.dim))
        prompt_pad = self.param("prompt_pad", nn.initializers.normal(0.02), (c.num_prompt - 2, c.dim))
        if mesh is not None:
            # pin the tiny prompt params replicated: left to itself the
            # partitioner shards them over the mesh and then full-remats the
            # row slices/concat below (observed spmd_partitioner.cc warnings
            # on SenseVoiceEncoder/slice|concatenate in the round-2 dryrun)
            import jax
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            lang_emb = jax.lax.with_sharding_constraint(lang_emb, rep)
            itn_emb = jax.lax.with_sharding_constraint(itn_emb, rep)
            prompt_pad = jax.lax.with_sharding_constraint(prompt_pad, rep)
        prompt = jnp.concatenate(
            [lang_emb[language_id][None], itn_emb[1 if use_itn else 0][None], prompt_pad], axis=0
        )  # [num_prompt, dim]
        x = jnp.concatenate([jnp.tile(prompt[None], (b, 1, 1)), x], axis=1)
        if frame_mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((b, c.num_prompt), bool), frame_mask.astype(bool)], axis=1
            )
        else:
            mask = None
        pos = jnp.asarray(sinusoidal_positions(t + c.num_prompt, c.dim))
        x = x + pos[None]
        orig_total = None
        if mesh is not None:
            # warning-clean SP: the prompt concat above runs in a REPLICATED
            # prologue; one pinned reshard (padded to the axis size) enters
            # the sharded regime — see parallel/sp_encoder.sp_seq_shard.
            from ...parallel.sp_encoder import sp_seq_shard, sp_seq_unshard

            x, mask, orig_total = sp_seq_shard(x, mask, mesh, sp_axis)
        for i in range(c.layers):
            x = TransformerBlock(c.dim, c.heads, c.ffn_mult, c.conv_kernel,
                                 quant=c.quant,
                                 name=f"block_{i}")(x, mask, mesh, sp_axis)
        if mesh is not None:
            x = sp_seq_unshard(x, mesh, orig_total)
        x = nn.LayerNorm(name="final_ln")(x)
        return nn.Dense(c.vocab_size, name="ctc_head")(x)


def sensevoice_frontend(
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    cfg: SenseVoiceConfig,
    cmvn_mean: Optional[jnp.ndarray] = None,
    cmvn_istd: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, T] padded waveforms + lengths -> (lfr feats [B, T', D'], mask).

    CMVN: y = (x + cmvn_mean) * cmvn_istd, matching the reference model
    dir's ``am.mvn`` (AddShift then Rescale). FunASR/sherpa-onnx apply it
    AFTER LFR stacking (dim = lfr_m * num_mel); per-mel-bin stats
    (dim = num_mel) apply before LFR.
    """
    import numpy as np

    feats = log_mel_fbank(wav, cfg.fbank)
    pre_lfr = cmvn_mean is not None and cmvn_mean.shape[-1] == feats.shape[-1]
    if pre_lfr:
        feats = feats + cmvn_mean
        if cmvn_istd is not None:
            feats = feats * cmvn_istd
    lfr = apply_lfr(feats, cfg.lfr_m, cfg.lfr_n)
    if cmvn_mean is not None and not pre_lfr:
        if cmvn_mean.shape[-1] != lfr.shape[-1]:
            raise ValueError(
                f"CMVN dim {cmvn_mean.shape[-1]} matches neither mel "
                f"({feats.shape[-1]}) nor LFR ({lfr.shape[-1]})")
        lfr = lfr + cmvn_mean
        if cmvn_istd is not None:
            lfr = lfr * cmvn_istd
    n_t = lfr.shape[1]
    shift, flen = cfg.fbank.frame_shift, cfg.fbank.frame_length
    fb_len = jnp.maximum((wav_lengths - flen) // shift + 1, 0)
    lfr_len = jnp.ceil(fb_len / cfg.lfr_n).astype(jnp.int32)
    mask = lengths_to_mask(jnp.maximum(lfr_len, 1), n_t)
    if cfg.utt_cmvn:
        m = mask.astype(lfr.dtype)[..., None]                 # [B, T, 1]
        denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mu = jnp.sum(lfr * m, axis=1, keepdims=True) / denom
        var = jnp.sum(jnp.square(lfr - mu) * m, axis=1, keepdims=True) / denom
        lfr = (lfr - mu) / jnp.sqrt(var + 1e-5) * m
    return lfr, mask
