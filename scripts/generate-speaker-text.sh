#!/bin/bash
# <spk> <wav> list generator (equivalent of reference scripts/generate-speaker-text.sh).
set -e
cd "$(dirname "$0")/.."
exec python -m audio_classification_tpu.cli.generate_speaker_list "$@"
