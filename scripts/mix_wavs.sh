#!/bin/bash
# Wav mixer launcher (equivalent of reference scripts/tools/mix_wavs.sh).
set -e
cd "$(dirname "$0")/.."
exec python -m audio_classification_tpu.cli.mix_wavs "$@"
