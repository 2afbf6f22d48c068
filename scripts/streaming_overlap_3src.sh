#!/bin/bash
# Streaming app launcher (equivalent of reference
# scripts/osd/streaming_overlap_3src.sh; file-replay by default here).
set -e
cd "$(dirname "$0")/.."
TARGET_WAV=${TARGET_WAV:?set TARGET_WAV}
INPUT_WAV=${INPUT_WAV:-}
ARGS=(
  --target-wav "${TARGET_WAV}"
  --process-seconds "${PROCESS_SECONDS:-2.0}"
  --sv-threshold "${SV_THRESHOLD:-0.6}"
  --preset "${PRESET:-full}"
  --output-dir "${OUTPUT_DIR:-streaming_results}"
)
[ -n "${INPUT_WAV}" ] && ARGS+=(--input-wav "${INPUT_WAV}")
exec python -m audio_classification_tpu.cli.streaming_overlap_3src "${ARGS[@]}"
