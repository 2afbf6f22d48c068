#!/bin/bash
# 2-src overlap MVP launcher (equivalent of reference scripts/osd/test_overlap.sh).
set -e
cd "$(dirname "$0")/.."
LIBRIMIX_ROOT=${LIBRIMIX_ROOT:?set LIBRIMIX_ROOT to the Libri2Mix parent dir}
MAX_FILES=${MAX_FILES:-10}
PRESET=${PRESET:-full}
exec python -m audio_classification_tpu.cli.offline_overlap_mvp \
  --librimix-root "${LIBRIMIX_ROOT}" \
  --max-files "${MAX_FILES}" \
  --preset "${PRESET}" \
  --enable-metrics \
  --out-dir "${BASE_OUT:-test_overlap}"
