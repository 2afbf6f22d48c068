#!/bin/bash
# SID+ASR benchmark smoke run with cached embeddings (equivalent of
# reference scripts/test.sh: generate npz once, reuse on later runs).
set -e
cd "$(dirname "$0")/.."
SPEAKER_FILE=${SPEAKER_FILE:?set SPEAKER_FILE}
TEST_LIST=${TEST_LIST:?set TEST_LIST}
EMB_CACHE=${EMB_CACHE:-cache/emb}
SPK_NPZ=${SPK_NPZ:-cache/speaker_embeds.npz}
PRESET=${PRESET:-full}
mkdir -p "$(dirname "${SPK_NPZ}")" "${EMB_CACHE}"
ARGS=(
  --speaker-file "${SPEAKER_FILE}"
  --test-list "${TEST_LIST}"
  --threshold "${THRESHOLD:-0.5}"
  --preset "${PRESET}"
  --out-dir "${BASE_OUT:-test}"
  --emb-cache-dir "${EMB_CACHE}"
)
if [ -f "${SPK_NPZ}" ]; then
  ARGS+=(--load-speaker-embeds "${SPK_NPZ}")
else
  ARGS+=(--save-speaker-embeds "${SPK_NPZ}")
fi
[ -n "${REF_TEXT_LIST}" ] && ARGS+=(--ref-text-list "${REF_TEXT_LIST}")
exec python -m audio_classification_tpu.cli.benchmark_pipeline "${ARGS[@]}"
