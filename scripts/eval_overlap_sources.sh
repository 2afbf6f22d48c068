#!/bin/bash
# Source-reference evaluator launcher (equivalent of reference
# scripts/osd/eval_overlap_sources.sh).
set -e
cd "$(dirname "$0")/.."
LIBRIMIX_ROOT=${LIBRIMIX_ROOT:?set LIBRIMIX_ROOT}
MAX_FILES=${MAX_FILES:-30}
SEP_NSRC=${SEP_NSRC:-2}
ACTIVITY_THR=${ACTIVITY_THR:-0.03}
PRESET=${PRESET:-full}
ARGS=(
  --librimix-root "${LIBRIMIX_ROOT}"
  --max-files "${MAX_FILES}"
  --sep-nsrc "${SEP_NSRC}"
  --activity-thr "${ACTIVITY_THR}"
  --save-details
  --preset "${PRESET}"
  --out-dir "${BASE_OUT:-test/overlap_eval}"
)
[ -n "${ENABLE_ASR}" ] && ARGS+=(--enable-asr)
exec python -m audio_classification_tpu.cli.evaluate_with_sources "${ARGS[@]}"
