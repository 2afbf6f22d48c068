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


class OnnxStage:
    """An OnnxModel bound to the engine's (params, feats, mask) calling
    convention.

    ``skip_frames`` drops that many leading output frames before CTC decode
    (the real SenseVoice export emits its 4 prompt positions in the logits;
    sherpa-onnx's decoder skips them the same way).
    """

    def __init__(self, model, skip_frames: int = 0,
                 feats_input: Optional[str] = None,
                 length_input: Optional[str] = None,
                 output: Optional[str] = None,
                 prompts: Optional[Dict[str, int]] = None,
                 verbose: bool = True):
        self.model = model if isinstance(model, OnnxModel) else OnnxModel(model)
        self.params = self.model.params
        self.skip_frames = int(skip_frames)
        self.prompts = dict(prompts or {})
        g = self.model.graph

        ranks: Dict[str, int] = {}
        int_inputs = []
        float_inputs = []
        for vi in g.inputs:
            if vi.name in g.initializers:
                continue
            ranks[vi.name] = len(vi.shape)
            if vi.dtype is not None and np.issubdtype(vi.dtype, np.integer):
                int_inputs.append(vi.name)
            else:
                float_inputs.append(vi.name)

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
        self.output = output or (g.output_names[0] if g.output_names else None)
        if self.output is None:
            raise ValueError("ONNX graph declares no outputs")
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
            feeds[name] = jnp.full((feats.shape[0],), v, jnp.int32)
        outs = self.model.raw_fn(params, feeds)
        out = jnp.asarray(outs[self.output], jnp.float32)
        if self.skip_frames:
            out = out[:, self.skip_frames:]
        return out

    def describe(self) -> str:
        return (f"OnnxStage(feats={self.feats_input!r}, "
                f"lengths={self.length_input!r}, ints={self.int_inputs}, "
                f"out={self.output!r}, skip_frames={self.skip_frames})\n"
                + self.model.describe())
