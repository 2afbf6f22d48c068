#!/bin/bash
# VAD + SID + ASR runner (equivalent of reference scripts/run.sh).
set -e
cd "$(dirname "$0")/.."
SPEAKER_FILE=${SPEAKER_FILE:?set SPEAKER_FILE (<spk> <wav> list)}
TEST_LIST=${TEST_LIST:?set TEST_LIST (<spk> <wav> list)}
THRESHOLD=${THRESHOLD:-0.5}
PRESET=${PRESET:-full}
exec python -m audio_classification_tpu.cli.speaker_id_vad_asr \
  --speaker-file "${SPEAKER_FILE}" \
  --test-list "${TEST_LIST}" \
  --threshold "${THRESHOLD}" \
  --sense-voice builtin \
  --preset "${PRESET}" \
  --out-dir "${BASE_OUT:-test}"
