#!/bin/bash
# Env-var -> CLI-flag launcher for the flagship 3-src pipeline
# (equivalent of reference scripts/osd/test_overlap_3src.sh: same knobs,
# file mode vs dataset mode switch).
set -e
echo '[offline_overlap_3src] OSD + Separation + SpeakerRecognition + ASR (LibriMix / Libri3Mix, 3-src, TPU)'
cd "$(dirname "$0")/.."

python -m audio_classification_tpu.cli.version

BASE_OUT=${BASE_OUT:-test/overlap3}
mkdir -p "${BASE_OUT}"

LIBRIMIX_ROOT=${LIBRIMIX_ROOT:-}
SV_THRESHOLD=${SV_THRESHOLD:-0.6}
TOKENS=${TOKENS:-}
CHECKPOINT_DIR=${CHECKPOINT_DIR:-}
PRESET=${PRESET:-full}
MAX_FILES=${MAX_FILES:-100}
SEED=${SEED:-0}
MIN_OVERLAP_DUR=${MIN_OVERLAP_DUR:-0.2}
OSD_THR=${OSD_THR:-0.5}

# File mode: provide INPUT_WAVS (space-separated) and TARGET_WAV
INPUT_WAVS=${INPUT_WAVS:-}
TARGET_WAV=${TARGET_WAV:-}
REFS_CSV=${REFS_CSV:-}
REF_WAVS=${REF_WAVS:-}

ARGS=(
  --subset test --sample-rate 16000 --task sep_clean --mode min
  --max-files "${MAX_FILES}" --seed "${SEED}"
  --osd-thr "${OSD_THR}" --min-overlap-dur "${MIN_OVERLAP_DUR}"
  --sv-threshold "${SV_THRESHOLD}"
  --out-dir "${BASE_OUT}" --enable-metrics --eval-separation --save-sep-details
  --preset "${PRESET}"
)
[ -n "${TOKENS}" ] && ARGS+=(--tokens "${TOKENS}")
[ -n "${CHECKPOINT_DIR}" ] && ARGS+=(--checkpoint-dir "${CHECKPOINT_DIR}")

if [ -n "${INPUT_WAVS}" ]; then
  # shellcheck disable=SC2086
  ARGS+=(--input-wavs ${INPUT_WAVS} --target-wav "${TARGET_WAV}")
  [ -n "${REFS_CSV}" ] && ARGS+=(--refs-csv "${REFS_CSV}")
  # shellcheck disable=SC2086
  [ -n "${REF_WAVS}" ] && ARGS+=(--ref-wavs ${REF_WAVS})
else
  [ -z "${LIBRIMIX_ROOT}" ] && { echo "Set LIBRIMIX_ROOT or INPUT_WAVS/TARGET_WAV"; exit 1; }
  ARGS+=(--librimix-root "${LIBRIMIX_ROOT}")
fi

exec python -m audio_classification_tpu.cli.offline_overlap_3src "${ARGS[@]}"
