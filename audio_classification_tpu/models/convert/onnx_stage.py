"""Serve actual reference .onnx checkpoints as engine stages.

The reference's entire model zoo is ONNX executed by onnxruntime sessions
(reference: src/model.py:79-124 builds sherpa-onnx recognizer/extractor
sessions over the files from install.sh:52-61). The graph-aware importers
(onnx_graph_map) translate a graph's weights onto this framework's own flax
modules — exact only when topologies line up. `OnnxStage` removes that
restriction: it wraps models/convert/onnx_exec.OnnxModel so the *exported
graph itself* runs inside the engine's jitted stage programs — exact
topology, exact weights, compiled by XLA for TPU, fused with the fbank
frontend and decode epilogue around it.

Feed mapping is inferred from the graph signature (override via kwargs):

* the float input with the highest declared rank receives the features
  (fbank [B,T,80] for speaker models, LFR+CMVN stacks [B,T,560] for
  SenseVoice — matching what sherpa-onnx's C++ frontend feeds the session),
* an integer input whose name contains ``len`` receives true frame counts
  (mask row-sums), so padded batching stays exact,
* remaining integer vector inputs are prompt scalars broadcast to [B]:
  names containing ``lang`` get the language id, names containing
  ``norm``/``itn`` get the inverse-text-normalization flag (SenseVoice's
  ``language``/``textnorm`` inputs, reference src/model.py:79-87).

Graphs WITHOUT a length input cannot see true lengths; padded frames are
zeroed, which matches exactly at bucket-boundary lengths and approximates
otherwise (the reference runs one utterance per session call, so it never
pads). A loud note is printed once for such graphs.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .onnx_exec import OnnxModel


def _classify_inputs(graph):
    """Graph runtime inputs -> (float_names, int_names, ranks)."""
    ranks: Dict[str, int] = {}
    float_in, int_in = [], []
    for vi in graph.inputs:
        if vi.name in graph.initializers:
            continue
        ranks[vi.name] = len(vi.shape)
        if vi.dtype is not None and np.issubdtype(vi.dtype, np.integer):
            int_in.append(vi.name)
        else:
            float_in.append(vi.name)
    return float_in, int_in, ranks


class OnnxStage:
    """An OnnxModel bound to the engine's (params, feats, mask) calling
    convention.

    ``skip_frames`` drops that many leading output frames before CTC decode
    (the real SenseVoice export emits its 4 prompt positions in the logits;
    sherpa-onnx's decoder skips them the same way).
    """

    family = "generic"

    def __init__(self, model, skip_frames: int = 0,
                 feats_input: Optional[str] = None,
                 length_input: Optional[str] = None,
                 output: Optional[str] = None,
                 n_outputs: int = 1,
                 prompts: Optional[Dict[str, int]] = None,
                 verbose: bool = True):
        self.model = model if isinstance(model, OnnxModel) else OnnxModel(model)
        self.params = self.model.params
        self.skip_frames = int(skip_frames)
        self.prompts = dict(prompts or {})
        g = self.model.graph
        float_inputs, int_inputs, ranks = _classify_inputs(g)

        if feats_input is not None:
            self.feats_input = feats_input
        elif float_inputs:
            self.feats_input = max(float_inputs, key=lambda n: ranks[n])
        elif self.model.input_names:
            self.feats_input = self.model.input_names[0]
        else:
            raise ValueError("ONNX graph declares no runtime inputs")

        if length_input is not None:
            self.length_input = length_input or None
        else:
            lens = [n for n in int_inputs if "len" in n.lower()]
            self.length_input = lens[0] if lens else None
        self.int_inputs = [
            n for n in int_inputs
            if n != self.length_input and n != self.feats_input
        ]
        if output is not None:
            self.outputs = [output]
        else:
            self.outputs = list(g.output_names[: max(1, int(n_outputs))])
        if not self.outputs:
            raise ValueError("ONNX graph declares no outputs")
        self.output = self.outputs[0]
        if self.length_input is None and verbose:
            print(f"[onnx_stage] graph '{g.name or self.feats_input}' has no "
                  f"length input; padded frames are zeroed (exact at bucket-"
                  f"boundary lengths)")

    def _prompt_value(self, name: str, language_id: int, use_itn: bool) -> int:
        low = name.lower()
        if name in self.prompts:
            return self.prompts[name]
        if "lang" in low:
            return int(language_id)
        if "norm" in low or "itn" in low:
            return 1 if use_itn else 0
        return 0

    def __call__(self, params, feats, mask, *, language_id: int = 0,
                 use_itn: bool = True):
        """feats [B, T, D] (+ frame mask [B, T]) -> first graph output, f32.

        Traced inside the engine's stage programs; XLA fuses the whole
        graph with the surrounding frontend/epilogue.
        """
        import jax.numpy as jnp

        feats = jnp.asarray(feats, jnp.float32)
        m = jnp.asarray(mask)
        mf = m.astype(feats.dtype)
        feeds = {
            self.feats_input: feats * (mf[..., None] if feats.ndim == m.ndim + 1
                                       else mf)
        }
        if self.length_input is not None:
            feeds[self.length_input] = jnp.sum(m.astype(jnp.int32), axis=-1)
        for name in self.int_inputs:
            v = self._prompt_value(name, language_id, use_itn)
            # honor a concretely declared shape (e.g. this framework's own
            # exports take language as [1]); symbolic/absent dims -> [B]
            shape = (feats.shape[0],)
            for vi in self.model.graph.inputs:
                if vi.name == name and vi.shape and all(
                        isinstance(d, int) for d in vi.shape):
                    shape = tuple(vi.shape)
                    break
            feeds[name] = jnp.full(shape, v, jnp.int32)
        outs = self.model.raw_fn(params, feeds)
        result = []
        for i, name in enumerate(self.outputs):
            out = jnp.asarray(outs[name], jnp.float32)
            if self.skip_frames and i == 0 and out.ndim >= 2:
                out = out[:, self.skip_frames:]
            result.append(out)
        return tuple(result) if len(result) > 1 else result[0]

    def describe(self) -> str:
        return (f"OnnxStage(feats={self.feats_input!r}, "
                f"lengths={self.length_input!r}, ints={self.int_inputs}, "
                f"out={self.outputs}, skip_frames={self.skip_frames})\n"
                + self.model.describe())


class OnnxTransducerStage:
    """The reference's transducer triple — encoder/decoder/joiner .onnx
    files (src/model.py:88-99, ``OfflineRecognizer.from_transducer``) —
    decoded greedily on device.

    The C++ recognizer loops over encoder frames on the host, calling the
    decoder/joiner sessions per frame. Here the whole search is ONE
    lax.scan inside the engine's jitted ASR program: at most one emitted
    symbol per frame (sherpa/icefall greedy default), stateless-predictor
    context re-fed through the decoder graph only on emission frames.

    Signature heuristics per graph (same rules as OnnxStage):
      encoder: highest-rank float input = features, int ``*len*`` input =
        frame counts; first non-``len`` output = encoder frames, a ``len``
        output (if any) = valid output frames (else scaled from the input).
      decoder: its single int input takes the [B, context] token window
        (context read from the declared shape, default 2).
      joiner: two float inputs matched by name (``enc``/``dec`` substrings),
        falling back to declaration order.
    """

    family = "transducer"

    def __init__(self, encoder, decoder, joiner, blank_id: int = 0,
                 context_size: int = 0):
        self.enc = encoder if isinstance(encoder, OnnxModel) else OnnxModel(encoder)
        self.dec = decoder if isinstance(decoder, OnnxModel) else OnnxModel(decoder)
        self.join = joiner if isinstance(joiner, OnnxModel) else OnnxModel(joiner)
        self.params = {"encoder": self.enc.params, "decoder": self.dec.params,
                       "joiner": self.join.params}
        self.blank_id = int(blank_id)
        self.outputs = ["ids", "lengths"]

        ef, ei, er = _classify_inputs(self.enc.graph)
        if not ef:
            raise ValueError("transducer encoder graph has no float input")
        self.enc_feats = max(ef, key=lambda n: er[n])
        lens = [n for n in ei if "len" in n.lower()]
        self.enc_lens_in = lens[0] if lens else None
        outs = self.enc.graph.output_names
        non_len = [n for n in outs if "len" not in n.lower()]
        self.enc_out = non_len[0] if non_len else outs[0]
        len_outs = [n for n in outs if "len" in n.lower()]
        self.enc_lens_out = len_outs[0] if len_outs else None

        df, di, _ = _classify_inputs(self.dec.graph)
        dec_ins = di or df  # some exports declare y as int64, some leave it untyped
        if not dec_ins:
            raise ValueError("transducer decoder graph has no runtime input")
        self.dec_y = dec_ins[0]
        self.dec_out = self.dec.graph.output_names[0]
        if context_size:
            self.context = int(context_size)
        else:
            shp = next((vi.shape for vi in self.dec.graph.inputs
                        if vi.name == self.dec_y), [])
            last = shp[-1] if shp else None
            self.context = int(last) if isinstance(last, int) and last > 0 else 2

        jf, _, _ = _classify_inputs(self.join.graph)
        if len(jf) < 2:
            raise ValueError("transducer joiner graph needs two float inputs")
        enc_named = [n for n in jf if "enc" in n.lower()]
        dec_named = [n for n in jf if "dec" in n.lower() or "pred" in n.lower()]
        self.join_enc = enc_named[0] if enc_named else jf[0]
        self.join_dec = (dec_named[0] if dec_named
                         else next(n for n in jf if n != self.join_enc))
        self.join_out = self.join.graph.output_names[0]

    def _predict(self, params, ctx):
        outs = self.dec.raw_fn(params["decoder"], {self.dec_y: ctx})
        d = outs[self.dec_out]
        if d.ndim == 3:  # [B, 1, D] exports
            d = d[:, 0]
        return d

    def decode(self, params, feats, mask, beam: int = 0):
        """[B, T, mel] feats + frame mask -> (ids [B, T'], lengths [B]),
        the same contract as Transducer.greedy_decode.

        ``beam > 1`` runs modified beam search over the export's own
        decoder/joiner graphs (reference: src/model.py:47-99 routes
        ``decoding_method="modified_beam_search"`` + ``num_active_paths``
        to sherpa-onnx's beam decoder): the beam axis folds into the
        graphs' batch dim ([B*K] calls), one top-k over beam*vocab
        candidates per frame, backtracked by a reverse scan — the same
        search as models/asr/transducer.Transducer.beam_decode."""
        import jax
        import jax.numpy as jnp

        feats = jnp.asarray(feats, jnp.float32)
        m = jnp.asarray(mask)
        in_len = jnp.sum(m.astype(jnp.int32), axis=-1)
        feeds = {self.enc_feats: feats * m.astype(feats.dtype)[..., None]}
        if self.enc_lens_in is not None:
            feeds[self.enc_lens_in] = in_len
        enc_outs = self.enc.raw_fn(params["encoder"], feeds)
        enc = jnp.asarray(enc_outs[self.enc_out], jnp.float32)  # [B, T', D]
        b, t = enc.shape[0], enc.shape[1]
        if self.enc_lens_out is not None:
            out_len = jnp.asarray(enc_outs[self.enc_lens_out]).astype(jnp.int32)
        else:
            # no declared output lengths: scale by the graph's subsampling
            t_in = max(feats.shape[1], 1)
            out_len = jnp.minimum((in_len * t + t_in - 1) // t_in, t)
        omask = jnp.arange(t)[None, :] < out_len[:, None]

        if beam and beam > 1:
            return self._beam_search(params, enc, omask, int(beam))

        def step(carry, inputs):
            ctx, count = carry
            e_t, m_t = inputs
            logits = self.join.raw_fn(
                params["joiner"],
                {self.join_enc: e_t, self.join_dec: self._predict(params, ctx)},
            )[self.join_out]
            sym = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = (sym != self.blank_id) & m_t
            new_ctx = jnp.where(
                emit[:, None],
                jnp.concatenate([ctx[:, 1:], sym[:, None]], axis=1),
                ctx,
            )
            return (new_ctx, count + emit.astype(jnp.int32)), \
                jnp.where(emit, sym, self.blank_id)

        ctx0 = jnp.full((b, self.context), self.blank_id, jnp.int32)
        (_, counts), syms = jax.lax.scan(
            step, (ctx0, jnp.zeros((b,), jnp.int32)),
            (enc.transpose(1, 0, 2), omask.T),
        )
        from ..asr.beam import left_pack_symbols
        packed, _ = left_pack_symbols(syms.T, self.blank_id)
        return packed, counts

    def _beam_search(self, params, enc, omask, k: int):
        """Modified beam search over the export graphs (see ``decode``):
        the search core is models/asr/beam.modified_beam_search, shared with
        the native flax transducer; this method supplies the scoring
        callback that folds the beam axis into the graphs' batch dim
        ([B*K] raw_fn calls)."""
        import jax.numpy as jnp

        from ..asr.beam import modified_beam_search

        b, _, d = enc.shape

        def score(e_t, ctx):  # [B, D], [B, K, context] -> [B, K, V]
            pred = self._predict(params, ctx.reshape(b * k, self.context))
            e_bk = jnp.broadcast_to(e_t[:, None, :], (b, k, d)).reshape(b * k, d)
            logits = self.join.raw_fn(
                params["joiner"],
                {self.join_enc: e_bk, self.join_dec: pred},
            )[self.join_out]                                  # [B*K, V]
            return logits.reshape(b, k, logits.shape[-1])

        return modified_beam_search(
            enc, omask, score, blank_id=self.blank_id, context=self.context,
            beam=k)

    def describe(self) -> str:
        return (f"OnnxTransducerStage(context={self.context}, "
                f"blank={self.blank_id})\n"
                f"- encoder: {self.enc.describe()}\n"
                f"- decoder: {self.dec.describe()}\n"
                f"- joiner:  {self.join.describe()}")


class OnnxWhisperStage:
    """The reference's Whisper encoder/decoder .onnx pair (reference:
    speaker-identification-...py:316-345, ``from_whisper``), decoded
    greedily on device with the export's own KV caches.

    The C++ recognizer loops the decoder session per output token on the
    host; here the whole autoregressive search is ONE lax.scan inside the
    engine's jitted ASR program. The cache tensors the export threads
    through its IO (``in_*`` -> ``out_*``) become the scan carry, so this
    supports fixed-size-cache exports (sherpa-style); exports that GROW
    their caches per step cannot form a scan carry and fail loudly with a
    shape error.

    Signature heuristics:
      encoder: float input is the mel spectrogram — fed channels-first
        [B, mel, T] when the declared shape has ``num_mel`` second
        (whisper convention), else [B, T, mel]; an integer declared time
        dim (whisper's 3000) pads/trims the features to it.
      decoder: the int input containing ``token`` takes token ids, one
        containing ``offset`` the decode position; float inputs whose
        names match encoder outputs are wired from the encoder
        (cross-attention K/V); remaining float inputs are self-attention
        caches, paired to decoder outputs by the ``in_``->``out_`` naming
        or by position.
    """

    family = "whisper"

    def __init__(self, encoder, decoder, sot_sequence=(1,), eot_id: int = 2,
                 max_decode_len: int = 96, num_mel: int = 80,
                 language: Optional[str] = None, task: str = "transcribe",
                 verbose: bool = True):
        # sherpa whisper exports carry their token ids in the encoder's
        # metadata_props (sot/sot_sequence/eot/no_timestamps/n_mels +
        # language token tables) — exactly what sherpa-onnx's C++ reads to
        # configure itself. When present, metadata WINS over the argument
        # defaults (arguments remain the fallback for plain exports).
        # NOTE: a metadata n_mels must match the engine frontend's
        # whisper_cfg.num_mel — mismatches fail loudly at trace time.
        meta = {}
        if isinstance(encoder, str):
            from .onnx_import import load_onnx_metadata

            meta = load_onnx_metadata(encoder)
        self.enc = encoder if isinstance(encoder, OnnxModel) else OnnxModel(encoder)
        self.dec = decoder if isinstance(decoder, OnnxModel) else OnnxModel(decoder)
        self.params = {"encoder": self.enc.params, "decoder": self.dec.params}
        sot = tuple(int(t) for t in sot_sequence)
        eot, mel = int(eot_id), int(num_mel)
        if meta.get("sot_sequence"):
            sot = tuple(int(t) for t in meta["sot_sequence"].split(",") if t)
        elif meta.get("sot"):
            sot = (int(meta["sot"]),)
        if meta.get("eot"):
            eot = int(meta["eot"])
        if meta.get("n_mels"):
            mel = int(meta["n_mels"])
        if language and meta.get("all_language_codes"):
            codes = meta["all_language_codes"].split(",")
            toks = [int(t) for t in meta.get("all_language_tokens", "").split(",") if t]
            if language in codes and len(toks) == len(codes) and len(sot) >= 2:
                # sot_sequence layout: [sot, language, task]
                sot = (sot[0], toks[codes.index(language)]) + sot[2:]
        if task == "translate" and meta.get("translate") and len(sot) >= 3:
            sot = sot[:2] + (int(meta["translate"]),) + sot[3:]
        if meta.get("no_timestamps"):
            nt = int(meta["no_timestamps"])
            if nt not in sot:
                sot = sot + (nt,)  # sherpa appends it after the task token
        self.sot = sot
        self.eot = eot
        self.max_decode_len = int(max_decode_len)
        self.num_mel = mel
        self.outputs = ["ids", "lengths"]
        if meta and verbose:
            print(f"[onnx_stage] whisper metadata: sot={self.sot} "
                  f"eot={self.eot} n_mels={self.num_mel}")

        ef, _, er = _classify_inputs(self.enc.graph)
        if not ef:
            raise ValueError("whisper encoder graph has no float input")
        self.enc_mel = max(ef, key=lambda n: er[n])
        mel_shape = next((vi.shape for vi in self.enc.graph.inputs
                          if vi.name == self.enc_mel), [])
        self.channels_first = True
        self.static_t = None
        if len(mel_shape) == 3:
            if mel_shape[2] == self.num_mel:
                self.channels_first = False
                if isinstance(mel_shape[1], int):
                    self.static_t = mel_shape[1]
            elif isinstance(mel_shape[2], int) and mel_shape[1] == self.num_mel:
                self.static_t = mel_shape[2]
        enc_out_names = set(self.enc.graph.output_names)

        df, di, _ = _classify_inputs(self.dec.graph)
        toks = [n for n in di if "token" in n.lower()]
        self.tokens_in = toks[0] if toks else (di[0] if di else None)
        if self.tokens_in is None:
            raise ValueError("whisper decoder graph has no int token input")
        offs = [n for n in di if "offset" in n.lower()]
        self.offset_in = offs[0] if offs else None
        self.cross_names = [n for n in df if n in enc_out_names]
        cache_ins = [n for n in df if n not in enc_out_names]
        outs = self.dec.graph.output_names
        logit_outs = [n for n in outs if "logit" in n.lower()]
        self.logits_out = logit_outs[0] if logit_outs else outs[0]
        cache_outs = [n for n in outs if n != self.logits_out]
        self.cache_map: Dict[str, str] = {}
        for cin in cache_ins:
            want = cin.replace("in_", "out_", 1) if cin.startswith("in_") else None
            if want in cache_outs:
                self.cache_map[cin] = want
        unmatched_in = [n for n in cache_ins if n not in self.cache_map]
        unmatched_out = [n for n in cache_outs
                         if n not in self.cache_map.values()]
        for cin, cout in zip(unmatched_in, unmatched_out):
            self.cache_map[cin] = cout
        if len(self.cache_map) != len(cache_ins):
            raise ValueError(
                f"cannot pair decoder cache inputs {cache_ins} with outputs "
                f"{cache_outs}")
        # cache allocation shapes from the declared signature: ints stay,
        # the first symbolic dim is the batch, any other symbolic dim is
        # the cache length (max_decode_len + sot)
        self._cache_decl = {
            n: next((vi.shape for vi in self.dec.graph.inputs if vi.name == n),
                    [])
            for n in cache_ins
        }

    def _cache_shape(self, decl, b: int):
        shape, batch_used = [], False
        for d in decl:
            if isinstance(d, int) and d > 0:
                shape.append(d)
            elif not batch_used:
                shape.append(b)
                batch_used = True
            else:
                shape.append(self.max_decode_len + len(self.sot))
        return tuple(shape)

    def decode(self, params, feats, mask):
        """[B, T, mel] feats + frame mask -> (ids [B, L], lengths [B])."""
        import jax
        import jax.numpy as jnp

        feats = jnp.asarray(feats, jnp.float32)
        m = jnp.asarray(mask).astype(feats.dtype)
        mel = feats * m[..., None]
        b = mel.shape[0]
        if self.channels_first:
            mel = jnp.transpose(mel, (0, 2, 1))  # [B, mel, T]
            t_axis = 2
        else:
            t_axis = 1
        if self.static_t is not None:
            t_now = mel.shape[t_axis]
            if t_now < self.static_t:
                pad = [(0, 0)] * 3
                pad[t_axis] = (0, self.static_t - t_now)
                mel = jnp.pad(mel, pad)
            elif t_now > self.static_t:
                mel = jax.lax.slice_in_dim(mel, 0, self.static_t, axis=t_axis)
        enc_outs = self.enc.raw_fn(params["encoder"], {self.enc_mel: mel})
        cross = {n: jnp.asarray(enc_outs[n]) for n in self.cross_names}

        def dec_call(tokens, offset, caches):
            feeds = {self.tokens_in: tokens}
            if self.offset_in is not None:
                feeds[self.offset_in] = offset
            feeds.update(cross)
            feeds.update(caches)
            outs = self.dec.raw_fn(params["decoder"], feeds)
            logits = jnp.asarray(outs[self.logits_out], jnp.float32)
            new_caches = {cin: jnp.asarray(outs[cout])
                          for cin, cout in self.cache_map.items()}
            return logits, new_caches

        caches0 = {n: jnp.zeros(self._cache_shape(decl, b), jnp.float32)
                   for n, decl in self._cache_decl.items()}
        sot = jnp.tile(jnp.asarray(self.sot, jnp.int32)[None], (b, 1))
        logits, caches = dec_call(sot, jnp.zeros((b,), jnp.int32), caches0)
        cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        done0 = cur == self.eot

        def step(carry, i):
            cur, caches, done, count = carry
            emit = ~done
            out_tok = jnp.where(emit, cur, 0)
            count = count + emit.astype(jnp.int32)
            offset = jnp.full((b,), len(self.sot), jnp.int32) + i
            logits, caches = dec_call(cur[:, None], offset, caches)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            done = done | (nxt == self.eot)
            return (nxt, caches, done, count), out_tok

        (_, _, _, counts), syms = jax.lax.scan(
            step, (cur, caches, done0, jnp.zeros((b,), jnp.int32)),
            jnp.arange(self.max_decode_len),
        )
        return syms.T, counts  # emitted contiguously, 0-padded after EOT

    def describe(self) -> str:
        return (f"OnnxWhisperStage(sot={self.sot}, eot={self.eot}, "
                f"channels_first={self.channels_first}, "
                f"static_t={self.static_t}, caches={self.cache_map})\n"
                f"- encoder: {self.enc.describe()}\n"
                f"- decoder: {self.dec.describe()}")
