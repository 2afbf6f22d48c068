"""L1 wrapper-layer API parity: the reference's model-facade surface.

Drop-in equivalents (same method names/contracts) of the reference's
wrapper layer, backed by the batched TPU StageEngine instead of
sherpa-onnx/pyannote/asteroid C++:

- ``create_asr_model`` / ``create_extractor_model``  (reference: src/model.py:37-124)
- ``SpeakerASRModels``                                (reference: src/model.py:127-374)
- ``OverlapAnalyzer``                                 (reference: src/osd/osd.py:20-147)
- ``Separator``                                       (reference: src/osd/separation.py:14-163)
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..engine.runtime import G_SAMPLE_RATE, EnginePreset, ModelPack, StageEngine, tiny_preset
from ..ops.signal import l2norm
from .speaker import SpeakerBank

_DEFAULT_ENGINE: Optional[StageEngine] = None


def default_engine(preset: str = "full", seed: int = 0) -> StageEngine:
    """Process-wide shared engine so facades reuse compiled programs."""
    global _DEFAULT_ENGINE
    if _DEFAULT_ENGINE is None:
        from ..runtime.device import enable_compilation_cache

        enable_compilation_cache()
        p = tiny_preset() if preset == "tiny" else EnginePreset()
        _DEFAULT_ENGINE = StageEngine(ModelPack(p, seed=seed))
    return _DEFAULT_ENGINE


def set_default_engine(engine: StageEngine) -> None:
    global _DEFAULT_ENGINE
    _DEFAULT_ENGINE = engine


class ASRRecognizer:
    """OfflineRecognizer-equivalent handle bound to a StageEngine."""

    def __init__(self, engine: StageEngine, language: str = "auto", use_itn: bool = True):
        self.engine = engine
        self.language = language
        self.use_itn = use_itn

    def transcribe(self, samples: np.ndarray, sr: int,
                   long_form: bool = False) -> str:
        """``long_form`` routes through StageEngine.transcribe_long: the
        utterance runs as ONE full-attention-context program — its frame
        axis spans the engine's mesh (sequence-parallel ring attention)
        when one is configured, or stays on a single chip via the Pallas
        flash-attention path (O(T·block) memory) without one. On the mesh,
        frame-parallel decoders only (sensevoice CTC, paraformer CIF —
        StageEngine.LONG_FORM_FAMILIES); single-chip, all four in-framework
        families (transducer/whisper scan-decode over the full-context
        encoding). An engine serving a direct-exec ONNX graph falls back
        to segment mode."""
        wav = self.engine.resample(np.asarray(samples, np.float32), sr, G_SAMPLE_RATE)
        if long_form:
            return self.engine.transcribe_long(wav, self.language, self.use_itn)
        return self.engine.transcribe([wav], self.language, self.use_itn)[0]

    def transcribe_batch(self, chunks, sr: int) -> List[str]:
        chunks = [self.engine.resample(np.asarray(c, np.float32), sr, G_SAMPLE_RATE) for c in chunks]
        return self.engine.transcribe(chunks, self.language, self.use_itn)


def create_asr_model(
    *, paraformer: str = "", sense_voice: str = "", encoder: str = "", decoder: str = "",
    joiner: str = "", tokens: str = "", num_threads: int = 1, feature_dim: int = 80,
    decoding_method: str = "greedy_search", debug: bool = False, language: str = "auto",
    provider: str = "tpu", engine: Optional[StageEngine] = None,
) -> ASRRecognizer:
    """One-of factory contract matching the reference (src/model.py:37-100):
    exactly one of paraformer / sense_voice / transducer(enc,dec,joiner) must
    be selected; otherwise ValueError. Model paths select the checkpoint
    family (weights load via engine checkpoints; paths may be empty-string
    placeholders when the engine already holds params)."""
    chosen = [bool(paraformer), bool(sense_voice), bool(encoder)]
    if sum(chosen) == 0:
        raise ValueError("Provide one ASR model (paraformer | sense_voice | transducer)")
    eng = engine or default_engine()
    return ASRRecognizer(eng, language=language, use_itn=bool(sense_voice))


class SpeakerExtractor:
    """SpeakerEmbeddingExtractor-equivalent (compute-only, batched)."""

    def __init__(self, engine: StageEngine):
        self.engine = engine

    @property
    def dim(self) -> int:
        return self.engine.pack.preset.spk.embed_dim

    def compute(self, samples: np.ndarray, sr: int) -> np.ndarray:
        wav = self.engine.resample(np.asarray(samples, np.float32), sr, G_SAMPLE_RATE)
        return self.engine.embed([wav])[0]

    def compute_batch(self, chunks, sr: int) -> np.ndarray:
        chunks = [self.engine.resample(np.asarray(c, np.float32), sr, G_SAMPLE_RATE) for c in chunks]
        return self.engine.embed(chunks)


def create_extractor_model(
    *, model: str = "", num_threads: int = 1, provider: str = "tpu", debug: bool = False,
    engine: Optional[StageEngine] = None,
) -> SpeakerExtractor:
    return SpeakerExtractor(engine or default_engine())


@dataclass
class OverlapAnalyzer:
    """OSD facade (reference: src/osd/osd.py:20-147): analyze(samples, sr)
    -> full-coverage [(start, end, is_overlap)]."""

    threshold: float = 0.5
    win_sec: float = 0.5
    hop_sec: float = 0.1
    device: str = "tpu"
    backend: Optional[str] = None
    auth_token: Optional[str] = None
    engine: Optional[StageEngine] = None

    def __post_init__(self):
        self.backend = self.backend or "osdnet"
        if self.engine is None:
            self.engine = default_engine()

    def analyze(self, samples: np.ndarray, sr: int) -> List[Tuple[float, float, bool]]:
        dur = len(samples) / sr if sr else 0.0
        if dur <= 0:
            return []
        wav = self.engine.resample(np.asarray(samples, np.float32), sr, G_SAMPLE_RATE)
        return self.engine.osd_segments(wav, G_SAMPLE_RATE, self.threshold, self.win_sec, self.hop_sec)


@dataclass
class Separator:
    """Separation facade (reference: src/osd/separation.py:14-163).

    separate(samples, sr) -> list of n_src numpy wavs at the model's sample
    rate; resampling into the model rate uses the same linear-interp
    semantics as the reference (:91-103); raises if the model emits fewer
    than n_src streams.
    """

    backend: Optional[str] = None
    device: str = "tpu"
    sample_rate: int = 16000
    checkpoint: Optional[str] = None
    n_src: int = 2
    engine: Optional[StageEngine] = None

    def __post_init__(self):
        self.backend = self.backend or "convtasnet"
        if self.engine is None:
            self.engine = default_engine()
        if self.checkpoint:
            if os.path.isdir(self.checkpoint):
                # params-only orbax dir from cli/train_separator --export
                from ..train.checkpoint import load_params

                stage = "sep3" if self.n_src == 3 else "sep2"
                if self.backend == "mossformer":
                    stage = "mossformer"
                self.engine.pack.load_params(
                    stage,
                    load_params(self.engine.pack.params[stage], self.checkpoint))
            elif not os.path.isfile(self.checkpoint):
                raise FileNotFoundError(f"Separator checkpoint not found: {self.checkpoint}")
            elif self.backend == "mossformer":
                # ModelScope torch distribution (reference:
                # src/mossformer/infer.py:13-23) — best-effort name-mapped
                # import, loud MossFormerImportError on drift.
                from .convert.torch_import import load_mossformer_torch

                self.engine.pack.load_params(
                    "mossformer",
                    load_mossformer_torch(self.checkpoint,
                                          self.engine.pack.preset.mossformer),
                )
            else:
                from .convert.torch_import import load_convtasnet_torch

                cfg = self.engine.pack.preset.sep3 if self.n_src == 3 else self.engine.pack.preset.sep2
                self.engine.pack.load_params(
                    "sep3" if self.n_src == 3 else "sep2",
                    load_convtasnet_torch(self.checkpoint, cfg),
                )
        if self.backend == "mossformer":
            self.sample_rate = self.engine.pack.preset.mossformer.sample_rate

    def separate(self, samples: np.ndarray, sr: int) -> List[np.ndarray]:
        wav = self._ensure_sr(np.asarray(samples, np.float32), sr)
        out = self.engine.separate([wav], n_src=self.n_src, backend=self.backend)[0]
        if out.shape[0] < self.n_src:
            raise RuntimeError(f"Separation output has < {self.n_src} sources; check model/config.")
        return [out[i] for i in range(self.n_src)]

    def separate_batch(self, chunks, sr: int) -> List[List[np.ndarray]]:
        wavs = [self._ensure_sr(np.asarray(c, np.float32), sr) for c in chunks]
        outs = self.engine.separate(wavs, n_src=self.n_src, backend=self.backend)
        return [[o[i] for i in range(self.n_src)] for o in outs]

    def separate_long(self, samples: np.ndarray, sr: int, mesh,
                      axis: str = "data") -> List[np.ndarray]:
        """One arbitrarily long mixture with its TIME axis sharded over the
        mesh (parallel/sp_convtasnet: halo-exchanged convs; psum gLN for
        ConvTasNet, plain-sum ring passes for MossFormer's relu² GAU
        attention) — the separation counterpart of `transcribe_long`'s
        ring attention. Numerically identical to the dense masked forward
        of the selected backend."""
        import jax.numpy as jnp

        from ..parallel.sp_convtasnet import sp_separate, sp_separate_mossformer

        wav = self._ensure_sr(np.asarray(samples, np.float32), sr)
        pack = self.engine.pack
        if self.backend == "mossformer":
            out = sp_separate_mossformer(
                pack.params["mossformer"], pack.preset.mossformer,
                jnp.asarray(wav)[None], None, mesh, axis=axis)
        else:
            stage = "sep3" if self.n_src == 3 else "sep2"
            cfg = pack.preset.sep3 if self.n_src == 3 else pack.preset.sep2
            out = sp_separate(pack.params[stage], cfg,
                              jnp.asarray(wav)[None], None, mesh, axis=axis)
        out = np.asarray(out)[0]
        if out.shape[0] < self.n_src:  # same contract as separate()
            raise RuntimeError(
                f"Separation output has {out.shape[0]} < {self.n_src} "
                f"sources; the '{self.backend}' preset emits "
                f"{out.shape[0]} streams — check model/config.")
        return [out[i] for i in range(self.n_src)]

    def _ensure_sr(self, samples: np.ndarray, sr: int) -> np.ndarray:
        if sr == self.sample_rate or len(samples) <= 1:
            return samples
        tgt_n = int(round(len(samples) * self.sample_rate / sr))
        if tgt_n <= 1:
            return samples
        old_idx = np.arange(len(samples), dtype=np.float64)
        new_idx = np.linspace(0, len(samples) - 1, tgt_n, dtype=np.float64)
        return np.interp(new_idx, old_idx, samples).astype(np.float32)


class SpeakerASRModels:
    """Unified SID+ASR facade (reference: src/model.py:127-374).

    Reads the same config fields off `args`; enrollment supports per-wav
    .npy caches, aggregate npz save/load, and mean-embedding aggregation.
    `identify` runs bank search + top-1 cosine; `asr_infer` transcribes.
    """

    def __init__(self, args, engine: Optional[StageEngine] = None):
        self.args = args
        self.provider = getattr(args, "provider", "tpu")
        self.using_cuda = False
        self.engine = engine or default_engine(getattr(args, "preset", "full"))
        self.asr = ASRRecognizer(
            self.engine,
            language=getattr(args, "language", "auto"),
            use_itn=bool(getattr(args, "sense_voice", "") or True),
        )
        self.extractor = SpeakerExtractor(self.engine)
        self.manager = SpeakerBank(self.extractor.dim)
        self.enrolled: Dict[str, np.ndarray] = {}
        self.enrolled_norm: Dict[str, np.ndarray] = {}

    @staticmethod
    def _to_numpy_waveform(samples) -> np.ndarray:
        if isinstance(samples, np.ndarray):
            return samples.astype(np.float32, copy=False)
        return np.asarray(samples, dtype=np.float32).reshape(-1)

    def enroll_from_map(self, spk_map: Dict[str, List[str]], load_audio_func):
        args = self.args
        load_npz = getattr(args, "load_speaker_embeds", "")
        if load_npz:
            data = np.load(load_npz, allow_pickle=True)
            for spk in data.files:
                vec = data[spk].astype(np.float32)
                self.enrolled[spk] = vec
                self.enrolled_norm[spk] = np.asarray(l2norm(vec))
                if not self.manager.add(spk, vec):
                    raise RuntimeError(f"Failed to add speaker {spk} from preloaded embeds")
            return

        cache_dir = getattr(args, "emb_cache_dir", "")
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        speaker_means: Dict[str, np.ndarray] = {}

        for spk, wavs in spk_map.items():
            if not wavs:
                continue
            # gather wavs needing fresh embeddings; batch-embed in one call
            cached: Dict[str, np.ndarray] = {}
            to_compute: List[Tuple[str, np.ndarray]] = []
            for w in wavs:
                cache_path = None
                if cache_dir:
                    base = os.path.splitext(os.path.basename(w))[0]
                    cache_path = os.path.join(cache_dir, base + ".npy")
                    if os.path.isfile(cache_path):
                        try:
                            cached[w] = np.asarray(l2norm(np.load(cache_path).astype(np.float32)))
                            continue
                        except (OSError, ValueError):
                            pass
                loaded = load_audio_func(w)
                if isinstance(loaded, tuple):
                    samples, sr = loaded[0], (loaded[1] if len(loaded) >= 2 else G_SAMPLE_RATE)
                else:
                    samples, sr = loaded, G_SAMPLE_RATE
                wav16 = self.engine.resample(self._to_numpy_waveform(samples), sr, G_SAMPLE_RATE)
                to_compute.append((w, wav16))
            if to_compute:
                embs = self.engine.embed([x for _, x in to_compute])
                for (w, _), emb in zip(to_compute, embs):
                    emb = np.asarray(l2norm(emb.astype(np.float32)))
                    cached[w] = emb
                    if cache_dir:
                        try:
                            np.save(os.path.join(cache_dir, os.path.splitext(os.path.basename(w))[0] + ".npy"), emb)
                        except OSError:
                            pass
            acc = None
            for w in wavs:
                emb = cached[w]
                acc = emb if acc is None else acc + emb
            if acc is None:
                raise RuntimeError(f"No embeddings for speaker {spk}")
            mean_emb = (acc / float(len(wavs))).astype(np.float32)
            speaker_means[spk] = mean_emb
            self.enrolled[spk] = mean_emb
            self.enrolled_norm[spk] = np.asarray(l2norm(mean_emb))
            if not self.manager.add(spk, mean_emb):
                raise RuntimeError(f"Failed to add speaker {spk}")

        save_npz = getattr(args, "save_speaker_embeds", "")
        if save_npz:
            try:
                np.savez_compressed(save_npz, **speaker_means)
            except OSError:
                pass

    def identify(self, samples, sr: int, threshold: float) -> Tuple[str, float]:
        emb = self.extractor.compute(self._to_numpy_waveform(samples), sr)
        emb_n = np.asarray(l2norm(emb))
        pred = self.manager.search(emb, threshold=threshold) or "unknown"
        if self.enrolled_norm:
            names = list(self.enrolled_norm.keys())
            mat = np.stack([self.enrolled_norm[n] for n in names])
            scores = mat @ emb_n
            top1 = float(scores[np.argmax(scores)])
        else:
            top1 = float("nan")
        return pred, top1

    def asr_infer(self, samples, sr: int) -> str:
        return self.asr.transcribe(self._to_numpy_waveform(samples), sr)
