#!/bin/bash
# Environment setup (equivalent role of reference scripts/install.sh, which
# installed CPU/CUDA wheels and downloaded ONNX models). This framework's
# compute stack (jax/flax/optax/orbax) ships with the image; the only build
# step is the native host-side codecs.
set -e
cd "$(dirname "$0")/.."

echo "[install] building native components (wav codec, ring buffer)"
make -C audio_classification_tpu/native

echo "[install] running sanity checks"
python -m audio_classification_tpu.cli.version
python -m pytest tests/test_wav.py -q

echo "[install] done. Model weights load via --checkpoint-dir (orbax) or"
echo "          --sep-checkpoint (torch ConvTasNet import)."
echo "[install] optional: 'pip install -e .' installs the package + act-*"
echo "          console scripts (pyproject.toml); running from the repo"
echo "          root works without it."
