"""cli/export_models: one-command ONNX dump of a pack's stages."""
import numpy as np

from audio_classification_tpu.cli import export_models as em
from audio_classification_tpu.models.convert.onnx_exec import OnnxModel
from audio_classification_tpu.models.convert.onnx_import import (
    load_onnx_metadata)


def test_export_all_stages_tiny(tmp_path):
    written = em.main(["--out-dir", str(tmp_path), "--preset", "tiny",
                       "--seconds", "0.5"])
    names = {p.rsplit("/", 1)[-1] for p in written}
    assert names == {"sep3.onnx", "sep2.onnx", "mossformer.onnx",
                     "asr.onnx", "osd.onnx", "spk.onnx", "vad.onnx"}

    # every file parses and runs on the framework's own executor
    for p in written:
        meta = load_onnx_metadata(p)
        om = OnnxModel(p)
        feeds = {}
        for vi in om.graph.inputs:
            shape = [1 if isinstance(d, str) else int(d) for d in vi.shape]
            dt = np.int64 if vi.name == "language" else np.float32
            feeds[vi.name] = np.zeros(shape, dt)
        outs = om(**feeds)
        assert outs, f"{meta.get('model_type')}: no outputs"
        for v in outs.values():
            assert np.all(np.isfinite(np.asarray(v)))


def test_stage_subset_and_nonsensevoice_skip(tmp_path, capsys):
    written = em.main(["--out-dir", str(tmp_path), "--preset", "tiny",
                       "--seconds", "0.5", "--stages", "vad"])
    assert len(written) == 1 and written[0].endswith("vad.onnx")
